"""Plan-shape tests: pushdown, pruning, broadcast, UDF-free hot paths.

These encode the 100 TB design requirements as assertions — a regression
that drops a pushed filter or sneaks a Python UDF into skew_join fails CI,
not a production run.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_skew_join_spark import SkewJoinConf, skew_join
from spark_skew_join_spark.plans.explain import (
    has_broadcast_join,
    has_python_udf,
    num_shuffles,
    pushed_filters,
    scan_schemas,
)
from spark_skew_join_spark.sources.tables import load_tables
import pytest

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_parquet(spark):
    li = load_tables(spark, SF)["lineitem"]
    q = li.select("l_orderkey", "l_quantity").where(F.col("l_quantity") > 30)
    pf = pushed_filters(q)
    assert any("l_quantity" in f for f in pf), f"no pushdown: {pf}"


def test_column_pruning(spark):
    li = load_tables(spark, SF)["lineitem"]
    q = li.select("l_orderkey", "l_quantity")
    schemas = scan_schemas(q)
    assert schemas and all(
        "l_extendedprice" not in s for s in schemas
    ), f"scan reads unneeded columns: {schemas}"


def test_skew_join_plan_is_udf_free_and_broadcasts(spark):
    t = load_tables(spark, SF)
    conf = SkewJoinConf(replication_factor=0.01, hot_threshold=100)
    j = skew_join(t["lineitem"], t["supplier"], [("l_suppkey", "s_suppkey")], "inner", conf)
    assert not has_python_udf(j), "skew_join hot path must stay JVM-side"
    assert has_broadcast_join(j), "hot-key map attach should be a broadcast join"


def test_small_dim_join_goes_broadcast(spark):
    t = load_tables(spark, SF)
    j = t["orders"].join(t["customer"], t["orders"].o_custkey == t["customer"].c_custkey)
    assert has_broadcast_join(j)


def test_groupby_single_shuffle(spark):
    li = load_tables(spark, SF)["lineitem"]
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    assert num_shuffles(q) <= 1, "partial aggregation should leave one exchange"


def test_minhash_verify_is_candidate_scoped(spark):
    """The exact-Jaccard verify must run over the LSH candidate set, not all
    pairs: the only join keyed on `shingle` alone would be the all-pairs
    intersection build — in the candidate-scoped plan every shingle join
    also carries a doc id key (id_b)."""
    import re

    from spark_skew_join_spark.operators.dedup import minhash_pairs

    docs = load_tables(spark, SF)["documents"]
    plan = (
        minhash_pairs(docs, threshold=0.5, n=8)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for cond in re.findall(r"Join \w+, \((.*)\)", plan):
        if "shingle" in cond:
            assert "id_b" in cond, f"all-pairs shingle join in verify: {cond}"


def test_embedding_lsh_plan_has_no_cartesian(spark):
    from spark_skew_join_spark.operators.dedup import embedding_near_dup_lsh

    emb = load_tables(spark, SF)["embeddings"]
    plan = (
        embedding_near_dup_lsh(emb, threshold=0.4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


@pytest.mark.slow
def test_no_benched_query_has_cartesian_product(spark):
    """VERDICT r2 #2 done-criterion: after demoting the all-pairs oracle
    baselines to BENCH_EXCLUDE, no TIMED query's physical plan may contain a
    shuffled cartesian product. BroadcastNestedLoopJoin is tolerated only
    for knn_bruteforce, whose designed exact-baseline scan broadcasts the
    tiny query set over the corpus (embarrassingly parallel, no shuffle)."""
    from spark_skew_join_spark import queries as q

    # 1-row scalar-subquery broadcasts (avg/total/max thresholds) are
    # BroadcastNestedLoopJoins by construction — bounded and shuffle-free.
    # The allowlist lives beside the registry (q.SCALAR_BNL_OK) so a new
    # scalar-broadcast query updates gate + metadata in one place
    # (VERDICT r3 #2: the name list here went stale for tfidf_top_terms).
    bnl_ok = set(q.SCALAR_BNL_OK)
    offenders = []
    for name in q.QUERIES:
        if name in q.BENCH_EXCLUDE:
            continue
        plan = (
            q.QUERIES[name](spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoop" in plan and name not in bnl_ok:
            offenders.append((name, "BroadcastNestedLoop"))
    q.clear_dedup_cache()
    assert not offenders, offenders


def test_driver_window_marker():
    """The DRIVER_WINDOW marker cannot rot silently (ADVICE r9 #1 bug
    class): its entries must BE the first `size` keys of QUERIES, the
    composition arithmetic must add up, and the staleness-first
    invariant must hold against the CORRECTNESS_r*.json ledger — no
    entry outside the window may be STALER than a non-debut,
    non-changed entry inside it."""
    import glob
    import json
    import os
    import re

    from spark_skew_join_spark.queries import DRIVER_WINDOW, QUERIES

    win = DRIVER_WINDOW
    entries = list(win["entries"])
    assert len(entries) == win["size"]
    assert sum(win["composition"].values()) == win["size"]
    assert list(QUERIES)[: win["size"]] == entries
    assert set(win["debut"]) <= set(entries)
    assert set(win["changed"]) <= set(entries)
    assert len(win["debut"]) == win["composition"]["debut"]
    assert len(win["changed"]) == win["composition"]["changed"]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        if rnd >= win["round"]:
            continue  # judge staleness AS OF the rotation, not after
        for qname in json.load(open(f)):
            last[qname] = rnd
    if not last:  # ledger absent (fresh checkout) — arithmetic-only
        return
    # debuts must be genuinely never-checked before this round
    for d in win["debut"]:
        assert d not in last, d
    special = set(win["debut"]) | set(win["changed"])
    plain = [e for e in entries if e not in special and e in last]
    # rows-only postures (QUERIES - ORACLES) are skipped by the
    # rotation BY POLICY (VERDICT r11 #5: they certify nothing beyond
    # row counts; their EXACT *_refined siblings carry coverage), so
    # they don't participate in the staleness invariant
    from spark_skew_join_spark.queries import ORACLES

    outside = [
        q
        for q in list(QUERIES)[win["size"]:]
        if q in last and q in ORACLES
    ]
    if plain and outside:
        assert max(last[e] for e in plain) <= min(
            last[q] for q in outside
        ), "an entry outside the window is staler than one inside"


def test_family_consumer_ledger():
    """FAMILY_CONSUMERS (bench.py's release schedule) cannot rot: every
    listed consumer is a registered query, and every registered query
    whose source touches a family helper is listed under that family."""
    import inspect

    from spark_skew_join_spark import queries as q

    pats = {
        "dedup": ("_dedup_family(",),
        "winnow": ("_winnow_family(",),
        "substr": ("_substr_family(", "_substr_clean_family("),
        "dsir": ("_dsir_family(",),
        "langid": ("_langid_family(",),
        "copurchase": ("_copurchase_family(",),
        "quality": ("_quality_family(",),
        "ann": ("_ann_family(",),
        "tok": ("_tok_family(",),
    }
    for fam, consumers in q.FAMILY_CONSUMERS.items():
        for c in consumers:
            assert c in q.QUERIES, (fam, c)
    for name, fn in q.QUERIES.items():
        src = inspect.getsource(fn)
        for fam, needles in pats.items():
            if any(n in src for n in needles):
                assert name in q.FAMILY_CONSUMERS[fam], (name, fam)
