"""WordPiece trainer/apply + Kneser-Ney scorer stress at ~10-50x the
sf0.1 documents volume.

What this certifies at scale (the round-11 tokenizer-triad additions):

* ``train_wordpiece(mode="distributed")`` — training cost is bounded
  by the DISTINCT-WORD table, not the corpus: the synthetic corpus
  keeps a large vocabulary (~50k distinct words) so the per-round
  pair/symbol aggregations and the HOF rewrite run on a word table two
  orders of magnitude bigger than the fixtures', while the corpus
  itself is touched exactly once (word_frequencies).
* ``apply_wordpiece`` — the Arrow word-memo greedy tokenizer over the
  full corpus: per-row cost collapses to a dict hit after a word's
  first occurrence per batch, so wall should scale with corpus size,
  not corpus x vocab.
* ``kneser_ney_logprob`` — the KN smoothing adds two N1+ joins and a
  scalar broadcast on top of bigram_logprob's tf-table shape; the
  corpus is deliberately Zipf (hottest token ~25-30% of positions) to
  confirm the per-doc-distinct join posture absorbs hot bigrams the
  same way the add-k scorer does (tools/stress_bigram.py precedent).

Usage: python tools/stress_wordpiece.py [n_docs] [tokens_per_doc] [vocab]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.quality import kneser_ney_logprob
from spark_skew_join_spark.operators.wordpiece import (
    apply_wordpiece,
    train_wordpiece,
    wordpiece_vocab,
)
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 100
VOCAB = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000


def main() -> None:
    spark = get_spark("stress-wordpiece", cpus=32)
    # Zipf-ish token ids over VOCAB words via a deterministic per-position
    # uniform (the stress_bigram corpus shape); word text "w<id>x<id%97>"
    # varies length 4-12 chars so the symbol table is realistic
    u = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        (F.pow(u(i), 4.0) * VOCAB).cast("int").cast("string"),
        F.lit("x"),
        F.pmod((F.pow(u(i), 4.0) * VOCAB).cast("int"), F.lit(97))
        .cast("string"),
    )
    # 4x-cpus partitions: at 1M docs x ~620 pieces each, 32 fat
    # partitions triple the Arrow apply's per-task GC cost (measured
    # 135.7 s vs 53.7 s at 128 partitions — BASELINE.md round-11); on a
    # real cluster spark.sql.files.maxPartitionBytes provides the same
    # granularity for free
    docs = (
        spark.range(N_DOCS)
        .repartition(128)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(F.sequence(F.lit(1), F.lit(TOKENS)), tok), " "
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .select("w").distinct().count()
    )
    print(f"corpus: {N_DOCS:,} docs x {TOKENS} tokens, "
          f"{n_words:,} distinct words")

    t0 = time.time()
    merges = train_wordpiece(docs, 16, mode="distributed")
    t_train = time.time() - t0
    print(f"train distributed 16 merges: {t_train:.1f}s; "
          f"last merge {merges[-1][1:4]}")

    vocab = wordpiece_vocab(docs, merges)
    t0 = time.time()
    out = apply_wordpiece(docs, vocab)
    agg = out.agg(
        F.count(F.lit(1)), F.sum("n_pieces"), F.sum("n_unk_words")
    ).collect()[0]
    t_apply = time.time() - t0
    print(f"apply over corpus: {t_apply:.1f}s; docs={agg[0]:,} "
          f"pieces={agg[1]:,} unk={agg[2]:,}")
    assert agg[0] == N_DOCS and agg[2] == 0

    walls = []
    for _ in range(2):
        t0 = time.time()
        n = kneser_ney_logprob(docs).count()
        walls.append(time.time() - t0)
    print("kneser_ney_logprob: scored "
          f"{n:,} docs in " + ", ".join(f"{w:.1f}s" for w in walls))
    spark.stop()


if __name__ == "__main__":
    main()
