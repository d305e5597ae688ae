"""Set-similarity join scale stress (VERDICT r13 #4, carrying r12 #6).

Runs the exact PPJoin (operators/setsim.py) at 10x the sf0.1 corpus
size on a PLANTED corpus where ground truth is exact arithmetic:

* every doc gets 20 md5-distinct tokens derived from its pair-group
  id, so cross-group Jaccard is 0;
* each group of ``PAIR_EVERY`` ids plants ONE twin pair sharing 18 of
  20 tokens (Jaccard = 18/22 = 0.8181..), every other same-group doc
  is token-disjoint from the pair.

At threshold 0.8 the exact result set is therefore precisely the
planted twins — 100% recall is REQUIRED (the prefix + positional
filters are lossless), any miss is a bug, any extra pair is a bug.

Scale-survival evidence: the same join at N/4 gives a wall ratio;
PPJoin's candidate generation is near-linear here (rare-token
prefixes), so wall(N)/wall(N/4) should track ~4x, not the 16x of an
all-pairs stage.

Usage: python tools/stress_setsim.py [n_docs]
  n_docs  corpus size (default 600_000 = 10x the sf0.1 documents)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F

N_DOCS = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1] != "--one"
    else 600_000
)
PAIR_EVERY = 10  # one planted twin pair per 10 docs
THRESHOLD = 0.8
N_TOKENS = 20
SHARED = 18  # twin shares 18 of 20 -> Jaccard 18/22 ~ 0.818


def _corpus(spark: SparkSession, n: int) -> DataFrame:
    """(doc_id, text): ids 2k/2k+1 of each PAIR_EVERY-block's first
    two slots are twins; everyone else is token-disjoint."""
    base = spark.range(n).select(F.col("id").alias("doc_id"))
    in_pair = (F.col("doc_id") % PAIR_EVERY) < 2
    pair_seed = F.concat(
        F.lit("p"), (F.col("doc_id") / PAIR_EVERY).cast("long").cast("string")
    )
    solo_seed = F.concat(F.lit("s"), F.col("doc_id").cast("string"))
    # shared tokens come from the pair seed, private ones from doc_id
    toks = []
    for j in range(N_TOKENS):
        shared_tok = F.md5(F.concat(pair_seed, F.lit(f"_{j}")))
        private_tok = F.md5(
            F.concat(solo_seed, F.lit(f"_{j}"), F.col("doc_id").cast("string"))
        )
        toks.append(
            F.when(in_pair & F.lit(j < SHARED), shared_tok).otherwise(
                private_tok
            )
        )
    return base.select(
        "doc_id", F.concat_ws(" ", *toks).alias("text")
    )


def _run(spark: SparkSession, n: int) -> tuple[float, int, bool]:
    from spark_skew_join_spark.operators.dedup import clear_band_cache
    from spark_skew_join_spark.operators.setsim import set_similarity_join

    docs = _corpus(spark, n)
    t0 = time.perf_counter()
    pairs = set_similarity_join(docs, THRESHOLD).select("id_a", "id_b")
    got = pairs.collect()
    wall = time.perf_counter() - t0
    clear_band_cache()
    expected = {
        (b * PAIR_EVERY, b * PAIR_EVERY + 1)
        for b in range(n // PAIR_EVERY)
        if b * PAIR_EVERY + 1 < n
    }
    gotset = {(r["id_a"], r["id_b"]) for r in got}
    ok = gotset == expected
    if not ok:
        miss = list(expected - gotset)[:5]
        extra = list(gotset - expected)[:5]
        print(f"  MISMATCH missing={miss} extra={extra}")
    return wall, len(gotset), ok


def _one_scale_main(n: int) -> None:
    """Child mode: one scale in its own JVM (same reason bench.py
    segments — a second big job in one session inherits the first's
    heap/codegen history and measured 4x slower on identical code)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-setsim")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    w, np_, ok = _run(spark, n)
    print(f"RESULT {n} {w:.3f} {np_} {int(ok)}", flush=True)
    spark.stop()


def _spawn(n: int) -> tuple[float, int, bool]:
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", str(n)],
        capture_output=True, text=True,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            _, _, w, np_, ok = line.split()
            return float(w), int(np_), bool(int(ok))
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    raise RuntimeError(f"scale {n} child failed")


def main() -> None:
    w_small, n_small_pairs, ok_small = _spawn(N_DOCS // 4)
    w_big, n_big_pairs, ok_big = _spawn(N_DOCS)
    ratio = w_big / max(w_small, 1e-9)
    # near-linear candidate generation: 4x docs should cost ~4x, far
    # below the 16x an all-pairs stage would show; allow 8x slack for
    # shuffle superlinearity before calling it quadratic
    linear_ok = ratio <= 8.0
    print(
        f"small: docs={N_DOCS // 4:,} pairs={n_small_pairs:,} "
        f"wall={w_small:.1f}s {'OK' if ok_small else 'FAIL'}"
    )
    print(
        f"big:   docs={N_DOCS:,} pairs={n_big_pairs:,} "
        f"wall={w_big:.1f}s {'OK' if ok_big else 'FAIL'}"
    )
    print(
        f"4x docs -> {ratio:.2f}x wall (quadratic would be ~16x) | "
        f"exact planted recall+precision | "
        f"{'PASS' if (ok_small and ok_big and linear_ok) else 'FAIL'}"
    )
    sys.exit(0 if (ok_small and ok_big and linear_ok) else 1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _one_scale_main(int(sys.argv[2]))
    else:
        main()
