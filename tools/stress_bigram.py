"""bigram_logprob stress at ~10x the sf0.1 documents volume, Zipf tokens.

VERDICT r9 #5 follow-through: the count joins used to move one row per
bigram OCCURRENCE keyed by the bigram hash — a Zipf-hot bigram ("of
the") funnelled the whole corpus's occurrences of that key into single
shuffle targets. The operator now pre-aggregates to per-doc-distinct
bigrams (the tf-table shape), so the join traffic is bounded by
docs x distinct-bigrams-per-doc regardless of how hot a bigram is.

This stress synthesizes a corpus whose token distribution is
deliberately Zipf (pow(rand, alpha) over a small vocabulary -> the top
bigram appears in nearly every doc) and times the scorer; the
per-occurrence shape would key ~n_docs*len tokens on a handful of hot
bigram hashes.

Usage: python tools/stress_bigram.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.quality import bigram_logprob
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def main() -> None:
    spark = get_spark("stress-bigram", cpus=32)
    # Zipf-ish vocabulary of ~2000 words via a per-element DETERMINISTIC
    # uniform (xxhash64(doc_id, position) -> [0,1)), token id =
    # floor(2000 * u^4): word_0 covers ~25-30% of positions, so the
    # hottest bigram (word_0, word_0) occurs in ~every doc — exactly
    # the per-occurrence-join killer shape
    u = lambda i: (  # noqa: E731
        F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(1_000_000))
        / F.lit(1_000_000.0)
    )
    docs = (
        spark.range(N_DOCS)
        .repartition(32)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.lit(TOKENS)),
                    lambda i: F.concat(
                        F.lit("w"),
                        (F.pow(u(i), 4.0) * 2000).cast("int").cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)  # materialize the synthetic corpus
    )
    n_tok = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    walls = []
    for _ in range(2):
        t0 = time.time()
        out = bigram_logprob(docs)
        n = out.count()
        walls.append(time.time() - t0)
    top = (
        docs.select(F.explode(F.split("text", " ")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    print(
        f"docs={N_DOCS:,} tokens={n_tok:,} hottest-token share="
        f"{top['count'] / n_tok:.2%} | scored {n:,} docs in "
        + ", ".join(f"{w:.1f}s" for w in walls)
    )
    spark.stop()


if __name__ == "__main__":
    main()
