"""Fixed-iteration PageRank vs a dict-based reference implementation."""

from __future__ import annotations

from spark_skew_join_spark.operators.pagerank import pagerank


def _ref_pagerank(edges, damping=0.85, iterations=10):
    """edges: list of (src, dst, w). Same recurrence, plain Python."""
    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(verts)
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    rank = {v: 1.0 / n for v in verts}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in verts}
        for s, d, w in edges:
            contrib[d] += (w / outw[s]) * rank[s]
        rank = {v: (1 - damping) / n + damping * contrib[v] for v in verts}
    return rank


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    out = pagerank(df, "src", "dst", "w", **kw).collect()
    return {r.vertex: r.rank for r in out}


def test_pagerank_two_node_cycle_stays_uniform(spark):
    got = _run(spark, [(1, 2, 1.0), (2, 1, 1.0)])
    assert abs(got[1] - 0.5) < 1e-12 and abs(got[2] - 0.5) < 1e-12


def test_pagerank_matches_reference_on_weighted_graph(spark):
    edges = [
        (1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0),
    ]
    got = _run(spark, edges, damping=0.85, iterations=10)
    want = _ref_pagerank(edges)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # 4 is a source-only vertex: rank decays to the teleport floor
    assert abs(got[4] - 0.15 / 4) < 1e-12


def test_pagerank_dangling_mass_not_redistributed(spark):
    # 1 -> 2, 2 is a sink: total rank < 1 by design (documented)
    got = _run(spark, [(1, 2, 1.0)], iterations=10)
    assert sum(got.values()) < 1.0
    want = _ref_pagerank([(1, 2, 1.0)])
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


# -- triangle counting -------------------------------------------------

def test_triangle_count_known_graphs(spark):
    from spark_skew_join_spark.operators.pagerank import triangle_count

    # K4: 4 triangles, 6 edges, 12 wedges, clustering 1.0
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    row = triangle_count(
        spark.createDataFrame(k4, "src int, dst int")
    ).collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"],
            row["n_triangles"]) == (4, 6, 12, 4)
    assert row["global_clustering"] == 1.0

    # path graph: no triangles, 2 wedges
    path = [(0, 1), (1, 2), (2, 3)]
    row = triangle_count(
        spark.createDataFrame(path, "src int, dst int")
    ).collect()[0]
    assert row["n_triangles"] == 0 and row["n_wedges"] == 2
    assert row["global_clustering"] == 0.0


def test_triangle_count_canonicalizes_input(spark):
    from spark_skew_join_spark.operators.pagerank import triangle_count

    # duplicates, reversed edges, and self-loops must fold away
    messy = [(0, 1), (1, 0), (0, 1), (1, 2), (2, 0), (2, 2), (0, 0)]
    row = triangle_count(
        spark.createDataFrame(messy, "src int, dst int")
    ).collect()[0]
    assert (row["n_edges"], row["n_triangles"]) == (3, 1)


def test_triangle_count_hub_graph_matches_naive(spark):
    import itertools
    import random

    from spark_skew_join_spark.operators.pagerank import triangle_count

    rng = random.Random(13)
    edges = {(0, i) for i in range(1, 40)}  # hub
    for _ in range(120):
        a, b = rng.sample(range(1, 40), 2)
        edges.add((min(a, b), max(a, b)))
    naive = sum(
        1
        for a, b, c in itertools.combinations(range(40), 3)
        if (a, b) in edges and (b, c) in edges and (a, c) in edges
    )
    row = triangle_count(
        spark.createDataFrame(sorted(edges), "src int, dst int")
    ).collect()[0]
    assert row["n_triangles"] == naive and naive > 0


def test_pagerank_checkpointed_equals_lazy(spark):
    # r14: the default per-iteration localCheckpoint must be a pure
    # materialization change — same ranks as the fully lazy plan
    edges = [
        (1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0),
        (4, 2, 0.5), (2, 4, 1.5),
    ]
    ck = _run(spark, edges, checkpoint_interval=1)
    lazy = _run(spark, edges, checkpoint_interval=None)
    assert set(ck) == set(lazy)
    for v in lazy:
        assert abs(ck[v] - lazy[v]) < 1e-12, (v, ck[v], lazy[v])
