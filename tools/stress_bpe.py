"""BPE training stress: corpus-scale word aggregation + merge learning
throughput, driver vs distributed mode parity at scale.

Synthesizes an N-doc corpus (the sf documents text tiled with doc-id
salt words so the vocabulary grows with N), then measures:
  1. word_frequencies wall time (the only corpus-scale pass),
  2. driver-mode merge learning (n_merges on the collected word table),
  3. distributed-mode merge learning (bounded per-round aggregations),
  4. apply_bpe tokenization throughput,
and asserts the two modes learn IDENTICAL merges.

Usage: python tools/stress_bpe.py [n_docs] [n_merges]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.bpe import (
    apply_bpe,
    train_bpe,
    word_frequencies,
)
from spark_skew_join_spark.sources.tables import get_spark, load_tables

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 32


def main():
    spark = get_spark("stress-bpe", cpus=32)
    base = load_tables(spark, "/root/testdata/sf0.01")["documents"].select(
        "doc_id", "text"
    )
    reps = max(1, N_DOCS // 500)
    docs = (
        spark.range(reps)
        .crossJoin(base)
        .select(
            (F.col("id") * 500 + F.col("doc_id")).alias("doc_id"),
            F.concat(
                F.col("text"), F.lit(" w"),
                F.pmod(F.xxhash64("id", "doc_id"), F.lit(200_000))
                .cast("string"),
                F.lit(" w"),
                F.pmod(F.xxhash64("doc_id", "id"), F.lit(200_000))
                .cast("string"),
            ).alias("text"),
        )
        .repartition(64)
        .persist()
    )
    n = docs.count()

    t0 = time.time()
    wf = word_frequencies(docs).persist()
    n_words = wf.count()
    t_wf = time.time() - t0

    t0 = time.time()
    m_driver = train_bpe(docs, N_MERGES, mode="driver", max_vocab_words=5_000_000)
    t_drv = time.time() - t0

    t0 = time.time()
    m_dist = train_bpe(docs, N_MERGES, mode="distributed", checkpoint_every=8)
    t_dist = time.time() - t0
    assert m_driver == m_dist, "mode divergence"

    t0 = time.time()
    n_toks = apply_bpe(docs, m_driver).agg(
        F.sum(F.size("bpe_tokens"))
    ).collect()[0][0]
    t_apply = time.time() - t0

    print(
        f"docs={n:,} distinct_words={n_words:,} | word_freq {t_wf:.1f}s | "
        f"{N_MERGES} merges: driver {t_drv:.1f}s, distributed {t_dist:.1f}s "
        f"(IDENTICAL merge lists) | apply {t_apply:.1f}s "
        f"({n_toks:,} tokens, {n_toks / t_apply / 1e6:.1f}M tok/s)"
    )
    docs.unpersist()
    wf.unpersist()


if __name__ == "__main__":
    main()
