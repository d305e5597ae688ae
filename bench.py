"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (VERDICT r3 #1 — the driver tail-captures stdout, so the
LAST line must be short enough to survive truncation):
  line 1: the full detailed JSON (per-query timings) — for humans/tools;
          also written to BENCH_DETAIL.json as a sidecar
  line 2 (FINAL): a short JSON summary the driver parses:
          {"metric": "...", "value": total_sec, "unit": "sec",
           "sf": 0.1, "n_queries": N, "queries": {...top 5 slowest...}}

Each query is forced to full materialization through the noop sink (all rows
computed + serialized, nothing written — same methodology as the reference's
timedSaveToDisk, Utils.scala:57-74, minus the parquet write cost).

Repeat-and-min (VERDICT r9 #1): every line executes TWICE and the
recorded timing is the MIN — the r9 record carried ~1.8x environmental
spread on the heaviest lines (four measurements of unchanged code
spanning 12.9-22.9 s) because a single cold execution absorbs
whole-stage-codegen/JIT compile, GC timing, and machine load; min-of-two
strips the one-shot noise while the plan's real cost is the floor.
BENCH_DETAIL.json keeps BOTH runs per line (cold + repeat) so cache-fill
and compile costs stay auditable; the shared family materializations
stay single-run cold lines (their persist cost IS the number), with
dedup_family_build additionally split into its shingle-materialization
and pair-join stages as separate lines (the r9 spread lacked stage
attribution).

Cache-warm exception (ADVICE r10 #1 / VERDICT r10 "what's wrong" #1):
a line that REGISTERS a session cache or spill table during its own
construction/first run (detected by the _session_cache registry delta)
would have a warm-cache repeat, so min-of-two would silently drop its
build cost from the total. Such lines are recorded at their COLD run
(run 1) — the family-build convention — and tagged
``"cache_warm_repeat": true`` in BENCH_DETAIL.json; both runs stay in
runs_cold_then_repeat. Totals are therefore cold-comparable across
rounds for cache-riding lines from r11 on (r10's min-of-two total was
biased low by a few seconds on those lines; BASELINE.md restates the
convention).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_skew_join_spark import queries as q
from spark_skew_join_spark.sources.tables import get_spark

# every registered query is timed (VERDICT r1 #8: regressions in the
# un-benched half must be visible) EXCEPT the all-pairs oracle baselines
# (q.BENCH_EXCLUDE, VERDICT r2 #2) — their scale-path siblings are the
# headline; queries with eager plan-construction jobs (q.EAGER_QUERIES)
# are re-timed construction+execution so that work stays visible
HEADLINE = "ALL"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", cpus=cpus)
    # warm the JVM (codegen paths, parquet footers) so the first timed query
    # doesn't absorb session cold-start — same methodology as skewbench
    from spark_skew_join_spark.sources.tables import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    # warm the Python worker pool too: the FIRST mapInPandas task in a
    # session forks the python daemon + one worker per core (~1-2 s),
    # which otherwise lands on whichever Python-path query happens to be
    # timed first (r4's "multimodal regression" was exactly this — the
    # registry rotation moved multimodal_features to position 1)
    spark.range(0, 32 * 1024, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.mode("overwrite").format("noop").save()
    # the shared family materializations are timed as their OWN lines so
    # member timings stay attributable under registry reordering
    # (VERDICT r4 #3): whichever member runs first would otherwise absorb
    # the persist cost
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    # family builds: single cold runs — the persist cost IS the line;
    # dedup_family split into its two stages (VERDICT r9 #1: the
    # heaviest line's spread had no stage attribution)
    start = time.perf_counter()
    sh, pairs = q._dedup_family(spark, sf_dir)
    t_con = time.perf_counter()
    # construction includes minhash_pairs' eager signature-table spill
    # (_session_cache "auto" saveAsTable) — its own stage so the spill
    # cost stops masquerading as shingle time
    timings["dedup_family_stage_construct"] = round(t_con - start, 3)
    sh.count()
    t_sh = time.perf_counter()
    timings["dedup_family_stage_shingles"] = round(t_sh - t_con, 3)
    pairs.count()
    timings["dedup_family_stage_pairs"] = round(time.perf_counter() - t_sh, 3)
    # combined line kept for round-over-round continuity; the total
    # counts it ONCE (stage lines are informational, excluded from sum)
    timings["dedup_family_build"] = round(time.perf_counter() - start, 3)
    start = time.perf_counter()
    q._winnow_family(spark, sf_dir).count()
    timings["winnow_family_build"] = round(time.perf_counter() - start, 3)
    start = time.perf_counter()
    q._substr_family(spark, sf_dir).count()
    q._substr_clean_family(spark, sf_dir).count()
    timings["substr_family_build"] = round(time.perf_counter() - start, 3)
    start = time.perf_counter()
    q._dsir_family(spark, sf_dir).count()
    timings["dsir_family_build"] = round(time.perf_counter() - start, 3)
    names = (
        [n for n in q.QUERIES if n not in q.BENCH_EXCLUDE]
        if HEADLINE == "ALL"
        else HEADLINE
    )
    from spark_skew_join_spark.operators import dedup as _dd

    def _cache_count() -> int:
        return len(_dd._CACHED_BANDS) + len(_dd._SPILL_TABLES)

    cache_warm: dict[str, bool] = {}
    for name in names:
        if name in q.EAGER_QUERIES:
            continue  # timed below, construction included
        fn = q.QUERIES[name]
        before = _cache_count()
        df = fn(spark, sf_dir)  # plan construction (includes any pre-jobs)
        pair = []
        for _ in range(2):
            start = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            pair.append(round(time.perf_counter() - start, 3))
        runs[name] = pair
        # a cache registered by THIS line makes its repeat warm: record
        # the cold run, not the min (families' single-cold convention)
        warm = _cache_count() > before
        cache_warm[name] = warm
        timings[name] = pair[0] if warm else min(pair)
    for name in q.EAGER_QUERIES:
        before = _cache_count()
        pair = []
        for _ in range(2):
            start = time.perf_counter()
            q.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            pair.append(round(time.perf_counter() - start, 3))
        runs[name] = pair
        warm = _cache_count() > before
        cache_warm[name] = warm
        timings[name] = pair[0] if warm else min(pair)
    q.clear_dedup_cache()  # no persisted blocks left behind (VERDICT r2 #7)

    total = round(
        sum(
            v
            for k, v in timings.items()
            if not k.startswith("dedup_family_stage_")
        ),
        3,
    )
    detail = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs_cold_then_repeat": runs,
        "cache_warm_repeat": sorted(
            k for k, v in cache_warm.items() if v
        ),
        "sf": sf,
        "excluded_allpairs_baselines": list(q.BENCH_EXCLUDE),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    print(json.dumps(detail))
    # FINAL line — short, survives the driver's tail capture (VERDICT r3 #1):
    # keep the contract keys but cap "queries" to the 5 slowest entries.
    top5 = dict(
        sorted(
            (
                (k, v)
                for k, v in timings.items()
                if not k.startswith("dedup_family_stage_")
            ),
            key=lambda kv: -kv[1],
        )[:5]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": sum(
                    1
                    for k in timings
                    if not k.startswith("dedup_family_stage_")
                ),
                "queries": top5,
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
