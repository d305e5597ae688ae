"""Chunk-level boilerplate dedup + unigram-LM quality scoring."""

from __future__ import annotations

import hashlib
import math

from spark_skew_join_spark.operators.boilerplate import chunk_dedup_stats, doc_chunks
from spark_skew_join_spark.operators.quality import unigram_logprob


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_doc_chunks_segmentation(spark):
    text = " ".join(f"w{i}" for i in range(25))  # 25 tokens → 10/10/5
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(doc_chunks(df, "doc_id", "text", 10).collect(),
                  key=lambda r: r.pos)
    assert [r.pos for r in rows] == [0, 1, 2]
    assert rows[0].chunk == " ".join(f"w{i}" for i in range(10))
    assert rows[2].chunk == " ".join(f"w{i}" for i in range(20, 25))


def test_chunk_dedup_flags_shared_chunk(spark):
    shared = " ".join(f"s{i}" for i in range(10))
    a_tail = " ".join(f"a{i}" for i in range(10))
    b_tail = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, f"{shared} {a_tail}"),
        (2, f"{shared} {b_tail}"),
        (3, " ".join(f"c{i}" for i in range(15))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_dedup_stats(df, chunk_tokens=10).collect()}
    assert (out[1].n_chunks, out[1].n_dup_chunks) == (2, 1)
    assert (out[2].n_chunks, out[2].n_dup_chunks) == (2, 1)
    assert (out[3].n_chunks, out[3].n_dup_chunks) == (2, 0)
    # reassembly: the shared head chunk is dropped, tails survive
    assert out[1].clean_md5 == _md5(a_tail)
    assert out[2].clean_md5 == _md5(b_tail)
    assert out[3].clean_md5 == _md5(rows[2][1])


def test_chunk_dedup_all_dropped_is_empty_md5(spark):
    same = " ".join(f"x{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, same), (2, same)], "doc_id long, text string"
    )
    out = chunk_dedup_stats(df, chunk_tokens=10).collect()
    assert all(r.n_dup_chunks == 1 and r.clean_md5 == _md5("") for r in out)


def test_unigram_logprob_hand_computed(spark):
    # corpus: "a a b" + "a c" → counts a=3 b=1 c=1, total=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in unigram_logprob(df).collect()}
    ln5 = math.log(5.0)
    exp1 = (2 * (ln5 - math.log(3.0)) + (ln5 - math.log(1.0))) / 3
    exp2 = ((ln5 - math.log(3.0)) + (ln5 - math.log(1.0))) / 2
    assert out[1].n_tokens == 3 and abs(out[1].avg_nll - exp1) < 1e-6
    assert out[2].n_tokens == 2 and abs(out[2].avg_nll - exp2) < 1e-6
    # rarer vocabulary scores strictly higher
    assert out[2].avg_nll > out[1].avg_nll
