"""Record linkage: blocking, weighted edit-similarity scoring, the
block_cap degenerate-key guard, 1:1 best-match, and transitive entity
resolution."""

from __future__ import annotations

import pytest

from spark_skew_join_spark.operators.linkage import (
    link_records,
    resolve_entities,
)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "alice johnson", "b1"),
            (2, "bob smith", "b1"),
            (3, "carol white", "b2"),
        ],
        "id bigint, name string, blk string",
    )
    right = spark.createDataFrame(
        [
            (101, "alice jonson", "b1"),   # 1 edit from left 1
            (102, "bob smyth", "b1"),      # 1 edit from left 2
            (103, "karol white", "b2"),    # 1 edit from left 3
            (104, "zzzzzzzzzz", "b2"),     # matches nothing
        ],
        "id bigint, name string, blk string",
    )
    return left, right


def test_links_best_match(spark):
    left, right = _frames(spark)
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.7,
    ).collect()
    got = {r["id"]: (r[1], round(r["score"], 4)) for r in out}
    assert set(got) == {1, 2, 3}
    assert got[1][0] == 101 and got[2][0] == 102 and got[3][0] == 103
    # alice johnson (13) vs alice jonson (12): lev 1 → 1 - 1/13
    assert got[1][1] == round(1 - 1 / 13, 4)


def test_blocking_prevents_cross_block_pairs(spark):
    left, right = _frames(spark)
    # carol (b2) would edit-match someone in b1 only via cross-block —
    # verify no pair crosses blocks even at threshold 0
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.0, best_match=False,
    )
    pairs = {(r["id"], r[1]) for r in out.collect()}
    assert (1, 103) not in pairs and (3, 101) not in pairs


def test_block_cap_drops_degenerate_block(spark):
    left = spark.createDataFrame(
        [(i, f"name{i}", "hot") for i in range(40)]
        + [(99, "solo", "cold")],
        "id bigint, name string, blk string",
    )
    right = spark.createDataFrame(
        [(1000 + i, f"name{i}", "hot") for i in range(40)]
        + [(1099, "solo", "cold")],
        "id bigint, name string, blk string",
    )
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.9, block_cap=100,
    ).collect()
    # hot block: 40*40 = 1600 > 100 → excluded; only the cold pair links
    assert [(r["id"], r[1]) for r in out] == [(99, 1099)]


def test_weighted_multi_column_score(spark):
    left = spark.createDataFrame(
        [(1, "abcd", "wxyz", "b")], "id bigint, a string, p string, blk string"
    )
    right = spark.createDataFrame(
        [(2, "abcd", "wxaa", "b")], "id bigint, a string, p string, blk string"
    )
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("a", "a"), ("p", "p")], weights=[3.0, 1.0],
        threshold=0.0,
    ).collect()
    # sims: 1.0 and 1 - 2/4 = 0.5 → weighted (3*1 + 1*0.5)/4 = 0.875
    assert out[0]["score"] == pytest.approx(0.875)
    assert out[0]["sim_a"] == 1.0 and out[0]["sim_p"] == 0.5


def test_null_compare_value_scores_zero(spark):
    left = spark.createDataFrame(
        [(1, None, "b")], "id bigint, name string, blk string"
    )
    right = spark.createDataFrame(
        [(2, "anything", "b")], "id bigint, name string, blk string"
    )
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.0,
    ).collect()
    assert out[0]["score"] == 0.0


def test_param_validation(spark):
    left, right = _frames(spark)
    with pytest.raises(ValueError):
        link_records(left, right, left_id="id", right_id="id",
                     block_left=["blk"], block_right=[],
                     compare=[("name", "name")])
    with pytest.raises(ValueError):
        link_records(left, right, left_id="id", right_id="id",
                     block_left=["blk"], block_right=["blk"], compare=[])
    with pytest.raises(ValueError):
        link_records(left, right, left_id="id", right_id="id",
                     block_left=["blk"], block_right=["blk"],
                     compare=[("name", "name")], weights=[1.0, 2.0])


def test_resolve_entities_transitive(spark):
    # A-B and B-C matched → one entity {A, B, C}; D is a singleton
    links = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_l bigint, id_r bigint"
    )
    vertices = spark.createDataFrame(
        [(1,), (2,), (3,), (4,)], "uid bigint"
    )
    out = resolve_entities(
        links, vertices, id_col="uid", left_id="id_l", right_id="id_r"
    ).collect()
    ent = {r["uid"]: r["entity_id"] for r in out}
    assert ent[1] == ent[2] == ent[3] == 1
    assert ent[4] == 4


def test_phonetic_key_blocks_spelling_variants(spark):
    from pyspark.sql import functions as F

    from spark_skew_join_spark.operators.linkage import (
        link_records,
        phonetic_key,
    )

    left = spark.createDataFrame(
        [(1, "Robert Smith", "94110"), (2, "Catherine Jones", "02139")],
        "id bigint, name string, zip string",
    ).withColumn("blk", phonetic_key("name", F.col("zip")))
    right = spark.createDataFrame(
        [(11, "Rupert Smith", "94110"),     # same soundex R163, same zip
         (12, "Katherine Jones", "02139"),  # C365 vs K365 — different code
         (13, "Robert Smith", "10001")],    # same code, different zip
        "id bigint, name string, zip string",
    ).withColumn("blk", phonetic_key("name", F.col("zip")))
    out = link_records(
        left, right, left_id="id", right_id="id",
        block_left=["blk"], block_right=["blk"],
        compare=[("name", "name")], threshold=0.5, best_match=False,
    )
    pairs = {(r["id"], r[1]) for r in out.collect()}
    assert (1, 11) in pairs       # phonetic variant, same zip → candidate
    assert (1, 13) not in pairs   # zip component prevents cross-region block
    # K/C initial is the documented soundex limitation: first letter kept
    assert (2, 12) not in pairs
