"""SemDeDup (operators/semdedup.py): planted duplicate chains, pruning
rule, cluster cap, and both centroid sources."""

import math
import random

import pytest

from spark_skew_join_spark.operators.semdedup import (
    assign_clusters,
    semdedup,
)

DIM = 8


def _unit(rng):
    v = [rng.gauss(0, 1) for _ in range(DIM)]
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _jitter(v, rng, eps=0.01):
    w = [x + rng.gauss(0, eps) for x in v]
    n = math.sqrt(sum(x * x for x in w))
    return [x / n for x in w]


def _corpus(rng, n_groups=6, group_size=4):
    """n_groups duplicate chains of near-identical unit vectors; ids
    assigned so each group's members are consecutive."""
    rows = []
    vid = 0
    for _ in range(n_groups):
        base = _unit(rng)
        for _ in range(group_size):
            rows.append((vid, _jitter(base, rng)))
            vid += 1
    return rows


def test_min_id_survives_each_duplicate_chain(spark):
    rng = random.Random(5)
    rows = _corpus(rng)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, threshold=0.98, n_clusters=6, dim=DIM).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == len(rows)
    for g in range(6):
        ids = [4 * g + i for i in range(4)]
        verdicts = [by_id[i]["is_kept"] for i in ids]
        # the smallest id of every chain survives; with a high threshold
        # and tight jitter the rest are pruned IF clustered together
        assert verdicts[0] is True
        same_cluster = {by_id[i]["cluster_id"] for i in ids}
        if len(same_cluster) == 1:
            assert verdicts[1:] == [False, False, False]
            for i in ids[1:]:
                assert by_id[i]["n_dups_smaller"] >= 1
                assert by_id[i]["max_sim_smaller"] >= 0.98
    # kept rows carry the empty-stat defaults
    for r in out:
        if r["is_kept"]:
            assert r["n_dups_smaller"] == 0 and r["max_sim_smaller"] is None


def test_pruning_never_crosses_clusters(spark):
    """Two identical vectors FORCED into different clusters must both
    survive — SemDeDup only compares within a cluster."""
    e0 = [1.0] + [0.0] * (DIM - 1)
    e1 = [0.0, 1.0] + [0.0] * (DIM - 2)
    # seeds = ids 0,1 -> clusters are the two axes; ids 2,3 duplicate
    # each seed exactly and land in its cluster
    df = spark.createDataFrame(
        [(0, e0), (1, e1), (2, e0), (3, e1)],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semdedup(df, threshold=0.99, n_clusters=2, dim=DIM).collect()}
    assert out[0]["is_kept"] and out[1]["is_kept"]
    assert not out[2]["is_kept"] and not out[3]["is_kept"]
    assert out[0]["cluster_id"] != out[1]["cluster_id"]
    assert out[2]["cluster_id"] == out[0]["cluster_id"]


def test_cluster_cap_bounds_comparisons_deterministically(spark):
    """With cluster_cap=1 only the smallest-id member of each cluster
    seeds comparisons — verdicts stay deterministic, fan-out bounded."""
    rng = random.Random(9)
    base = _unit(rng)
    rows = [(i, _jitter(base, rng, eps=0.001)) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = semdedup(df, threshold=0.99, n_clusters=1, dim=DIM,
                      cluster_cap=1).collect()
    full = semdedup(df, threshold=0.99, n_clusters=1, dim=DIM).collect()
    # every non-representative is within threshold of id 0, so the cap
    # changes nothing here — but each pruned row credits exactly ONE
    # smaller neighbor (the capped representative)
    kept_capped = {r["vec_id"] for r in capped if r["is_kept"]}
    kept_full = {r["vec_id"] for r in full if r["is_kept"]}
    assert kept_capped == kept_full == {0}
    assert all(r["n_dups_smaller"] == 1 for r in capped if not r["is_kept"])


def test_kmeans_centroid_source_runs(spark):
    rng = random.Random(13)
    rows = _corpus(rng, n_groups=4, group_size=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, threshold=0.98, n_clusters=4, dim=DIM,
                   centroid_source="kmeans", sample_size=12,
                   kmeans_iters=3).collect()
    assert len(out) == 12
    assert sum(1 for r in out if r["is_kept"]) >= 4  # one rep per chain


def test_unknown_centroid_source_raises(spark):
    df = spark.createDataFrame([(0, [1.0] * DIM)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="centroid_source"):
        semdedup(df, centroid_source="nope", dim=DIM)


def test_identical_vectors_tie_to_first_centroid(spark):
    """Exact similarity ties resolve to the smallest centroid index in
    assign_clusters (array_position takes the first max)."""
    v = [1.0] + [0.0] * (DIM - 1)
    df = spark.createDataFrame([(7, v)], "vec_id long, embedding array<double>")
    [r] = assign_clusters(df, [v, v], dim=DIM).collect()
    assert r["cluster_id"] == 0


def test_join_assignment_matches_literal_path(spark):
    """The broadcast-table assignment (scale path for large n_clusters)
    must agree with the literal-expression path vector by vector."""
    from spark_skew_join_spark.operators.semdedup import (
        _seed_centroids,
        assign_clusters,
        assign_clusters_join,
    )

    rng = random.Random(31)
    rows = [(i, _unit(rng)) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = _seed_centroids(df, "vec_id", "embedding", 6)
    lit = {r["vec_id"]: r["cluster_id"]
           for r in assign_clusters(df, cents, dim=DIM).collect()}
    jn = {r["vec_id"]: r["cluster_id"]
          for r in assign_clusters_join(df, cents, dim=DIM).collect()}
    assert lit == jn


def test_semdedup_verdicts_agree_across_assign_methods(spark):
    rng = random.Random(41)
    rows = _corpus(rng, n_groups=5, group_size=3)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {r["vec_id"]: (r["cluster_id"], r["is_kept"]) for r in
         semdedup(df, threshold=0.98, n_clusters=5, dim=DIM,
                  assign_method="literal").collect()}
    b = {r["vec_id"]: (r["cluster_id"], r["is_kept"]) for r in
         semdedup(df, threshold=0.98, n_clusters=5, dim=DIM,
                  assign_method="join").collect()}
    assert a == b
