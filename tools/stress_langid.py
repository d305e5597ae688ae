"""Language-ID training scale stress (VERDICT r13 #4, carrying r12 #6).

Trains the certified softmax trajectory on >= 5M PLANTED multilingual
docs (the langid_planted_multilingual construction: 3 disjoint
15-char alphabets over TRANSLATE'd md5-hex streams — the only class
signal is the text) and verifies the two scale claims the registry
entries assert:

* **the corpus text is touched once** — char_tf_counts is built and
  persisted as its own timed phase; every GD iteration then joins the
  persisted (id, bucket, c, n_gram) table with the (D+1)-row broadcast
  weight relation, never re-reading text. The build wall vs the
  per-iteration wall are reported separately.
* **O(D*C) per iteration** — per-iteration wall is measured as
  (wall[iters=k2] - wall[iters=k1]) / (k2 - k1) on the SAME persisted
  tf table at two corpus sizes; linear scaling means the per-iteration
  ratio tracks the D ratio (quadratic would square it).

The in-run correctness gate is the same as the registry entry's:
per-class recall >= 0.9 on the planted corpus (chance floor 1/3).

Usage: python tools/stress_langid.py [n_docs] [n_small]
  n_docs   large corpus size (default 5_000_000)
  n_small  small corpus for the linearity ratio (default n_docs // 4)
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
    else 5_000_000
)
N_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else N_DOCS // 4
N_BUCKETS = 64
ITERS_A, ITERS_B = 2, 4  # per-iter wall = (wall_B - wall_A) / 2
LR = 4.0


def _planted(spark: SparkSession, n: int) -> DataFrame:
    """In-plan planted 3-language corpus over spark.range — the
    queries.py::_planted_multilingual construction without the
    documents-table dependency."""
    from spark_skew_join_spark.queries import _LANGID_ALPHABETS, _LANGID_HEX

    labels = sorted(_LANGID_ALPHABETS)
    idm = F.col("id") % 3
    hexstream = F.concat(
        F.md5(F.col("id").cast("string")),
        F.md5(F.concat(F.col("id").cast("string"), F.lit("x"))),
        F.md5(F.concat(F.col("id").cast("string"), F.lit("y"))),
    )
    lang = None
    text = None
    for i, lbl in enumerate(labels):
        cond = idm == i
        tr = F.translate(hexstream, _LANGID_HEX, _LANGID_ALPHABETS[lbl])
        lang = F.when(cond, lbl) if lang is None else lang.when(cond, lbl)
        text = F.when(cond, tr) if text is None else text.when(cond, tr)
    return spark.range(n).select(
        F.col("id").alias("doc_id"), text.alias("text"), lang.alias("lang")
    )


def _one_scale(spark: SparkSession, n: int) -> dict:
    from spark_skew_join_spark.operators.langid import (
        char_tf_counts,
        langid_classifier,
    )

    docs = _planted(spark, n)
    t0 = time.perf_counter()
    tf = char_tf_counts(docs, n_buckets=N_BUCKETS, n=2).persist()
    tf_rows = tf.count()  # the ONE corpus-text scan
    t_build = time.perf_counter() - t0

    # throwaway 1-iteration train: absorbs the session's first-GD
    # codegen/broadcast warmup so the measured pair is steady-state
    langid_classifier(
        docs, label_col="lang", n_buckets=N_BUCKETS, iters=1, lr=LR,
        tf_counts=tf,
    ).count()
    def _train_wall(iters: int) -> float:
        nonlocal agg
        t1 = time.perf_counter()
        scored = langid_classifier(
            docs, label_col="lang", n_buckets=N_BUCKETS, iters=iters,
            lr=LR, tf_counts=tf,
        )
        agg = (
            scored.groupBy("y")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum((F.col("pred") == F.col("y")).cast("long")).alias(
                    "tp"
                ),
            )
            .collect()
        )
        return time.perf_counter() - t1

    agg = None
    walls = {it: _train_wall(it) for it in (ITERS_A, ITERS_B)}
    per_iter = (walls[ITERS_B] - walls[ITERS_A]) / (ITERS_B - ITERS_A)
    if per_iter <= 0:
        # a box dip during either point inverts the delta (observed:
        # wall[2it] 337 s > wall[4it] 205 s on identical code under
        # ambient drift) — re-measure both points once, keep min-of-two
        for it in (ITERS_A, ITERS_B):
            walls[it] = min(walls[it], _train_wall(it))
        per_iter = (walls[ITERS_B] - walls[ITERS_A]) / (ITERS_B - ITERS_A)
    recalls = {r["y"]: r["tp"] / r["n"] for r in agg}
    tf.unpersist()
    return {
        "n": n,
        "tf_rows": tf_rows,
        "build_s": t_build,
        "walls": walls,
        "per_iter_s": per_iter,
        "recalls": recalls,
    }


def _one_scale_main(n: int) -> None:
    """Child mode: one scale per JVM (a second big job in one session
    inherits heap/codegen history — bench.py's segmentation lesson)."""
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stress-langid")
        .config("spark.sql.shuffle.partitions", str(cpus * 4))
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    import json as _json

    print("RESULT " + _json.dumps(_one_scale(spark, n)), flush=True)
    spark.stop()


def _spawn(n: int) -> dict:
    import json as _json
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", str(n)],
        capture_output=True, text=True,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            d = _json.loads(line[len("RESULT "):])
            d["walls"] = {int(k): v for k, v in d["walls"].items()}
            d["recalls"] = dict(d["recalls"])
            return d
    sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    raise RuntimeError(f"scale {n} child failed")


def main() -> None:
    small = _spawn(N_SMALL)
    big = _spawn(N_DOCS)

    d_ratio = N_DOCS / N_SMALL
    it_ratio = big["per_iter_s"] / max(small["per_iter_s"], 1e-9)
    # linear O(D*C): per-iteration ratio tracks D ratio; allow 2x slack
    # (fixed overheads help the small run, shuffles help neither).
    # Both per-iteration walls must be POSITIVE — a negative delta
    # means warmup leaked into the measured pair and the run is void.
    linear_ok = (
        small["per_iter_s"] > 0
        and big["per_iter_s"] > 0
        and it_ratio <= 2.0 * d_ratio
    )
    recall_ok = all(
        v >= 0.9 for s in (small, big) for v in s["recalls"].values()
    )
    for tag, s in (("small", small), ("big", big)):
        print(
            f"{tag}: docs={s['n']:,} tf_rows={s['tf_rows']:,} "
            f"build={s['build_s']:.1f}s "
            f"wall[{ITERS_A}it]={s['walls'][ITERS_A]:.1f}s "
            f"wall[{ITERS_B}it]={s['walls'][ITERS_B]:.1f}s "
            f"per_iter={s['per_iter_s']:.1f}s "
            f"recalls={ {k: round(v, 4) for k, v in s['recalls'].items()} }"
        )
    print(
        f"D ratio={d_ratio:.1f}x per-iter ratio={it_ratio:.2f}x "
        f"(linear bound {2.0 * d_ratio:.1f}x) | "
        f"corpus text scanned ONCE per scale (tf build phase) | "
        f"{'PASS' if (linear_ok and recall_ok) else 'FAIL'}"
    )
    sys.exit(0 if (linear_ok and recall_ok) else 1)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _one_scale_main(int(sys.argv[2]))
    else:
        main()
