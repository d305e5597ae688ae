"""texteval/doremi stress at ~40x the sf0.1 documents volume, Zipf tokens.

Shape check for the new eval/reweight family: corpus_bleu_rouge's clip
join and domain_reweight's count joins both ride per-doc(-domain)
-distinct tf rows keyed by int64 gram hashes, so a Zipf-hot gram ("w0
w0" lands in nearly every doc here) crosses each join once per
document/domain, never once per occurrence — the same bound
stress_bigram.py pins for the quality scorer.  Wall should scale with
docs x distinct-grams-per-doc, not with the hottest gram's frequency.

Usage: python tools/stress_texteval.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.doremi import (
    domain_reweight,
    domain_reweight_mw,
)
from spark_skew_join_spark.operators.texteval import (
    corpus_bleu_rouge,
    readability,
)
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 100


def main() -> None:
    spark = get_spark("stress-texteval", cpus=32)
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
            F.concat(
                F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")
            ).alias("source"),
        )
        .persist()
    )
    n = docs.count()
    print(f"corpus: {n} docs x {TOKENS} tokens = {n * TOKENS / 1e6:.0f}M tokens")

    for label, fn in [
        ("corpus_bleu_rouge", lambda: corpus_bleu_rouge(docs)),
        ("readability", lambda: readability(docs)),
        ("domain_reweight", lambda: domain_reweight(docs)),
        ("domain_reweight_mw", lambda: domain_reweight_mw(docs)),
    ]:
        t0 = time.time()
        out = fn().collect()
        print(f"{label}: {time.time() - t0:.1f}s rows={len(out)}")
    docs.unpersist()


if __name__ == "__main__":
    main()
