"""Scale stress for the exact-substring dedup pass.

Synthesizes a corpus of N random-token documents (~120 tokens each) with
P planted duplicate pairs sharing an exact 60-token run at random
offsets, runs detection + removal, and checks recall / false positives /
removal accounting.  The window table is the dominant cost
(O(total tokens) rows of (id, pos, hash)) — the same footprint class as
the suffix-array construction the pass approximates, but built with one
explode + equi-join instead of a global sort.

Usage: python tools/stress_substr.py [n_docs] [planted_pairs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_skew_join_spark.operators.substr_dedup import (
    exact_substring_runs,
    remove_duplicate_spans,
)
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
PAIRS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000
DOC_TOKENS, RUN_TOKENS = 120, 60


def main() -> None:
    spark = get_spark("stress-substr", cpus=32)
    # base corpus: 120 random tokens per doc from a 50k vocabulary —
    # generated distributed (no driver-side text)
    tok = lambda c: F.concat(F.lit("w"), F.pmod(c, F.lit(50_000)).cast("string"))  # noqa: E731
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(DOC_TOKENS - 1)),
                lambda i: tok(F.xxhash64(F.col("id") * DOC_TOKENS + i)),
            ),
            " ",
        ).alias("text"),
    )
    # plant: pair p = docs (2p, 2p+1) share run p, spliced at a
    # deterministic pseudo-random offset per member
    run_txt = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(RUN_TOKENS - 1)),
            lambda i: tok(F.xxhash64(F.lit("run"), F.col("__p") * RUN_TOKENS + i)),
        ),
        " ",
    )
    off = F.pmod(F.xxhash64(F.lit("off"), F.col("doc_id")), F.lit(DOC_TOKENS - RUN_TOKENS)).cast("int")
    planted = (
        docs.withColumn("__p", (F.col("doc_id") / 2).cast("long"))
        .withColumn("__tk", F.split("text", " "))
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") < 2 * PAIRS,
                F.array_join(
                    F.concat(
                        F.slice("__tk", 1, off),
                        F.split(run_txt, " "),
                        F.slice(
                            "__tk", off + RUN_TOKENS + 1,
                            DOC_TOKENS - off - RUN_TOKENS,
                        ),
                    ),
                    " ",
                ),
            ).otherwise(F.col("text")).alias("text"),
        )
    )
    planted = planted.persist()
    n = planted.count()

    t0 = time.perf_counter()
    runs = exact_substring_runs(planted, k=16, min_tokens=32).persist()
    n_runs = runs.count()
    t_detect = time.perf_counter() - t0
    planted_found = runs.where(
        (F.col("doc_b") == F.col("doc_a") + 1)
        & (F.col("doc_a") % 2 == 0)
        & (F.col("doc_a") < 2 * PAIRS)
    ).select("doc_a").distinct().count()
    spurious = runs.where(
        ~((F.col("doc_b") == F.col("doc_a") + 1) & (F.col("doc_a") % 2 == 0))
        | (F.col("doc_a") >= 2 * PAIRS)
    ).count()

    t0 = time.perf_counter()
    cleaned = remove_duplicate_spans(planted, runs=runs)
    stats = cleaned.agg(
        F.sum((F.col("n_removed") > 0).cast("int")).alias("docs_cut"),
        F.sum("n_removed").alias("tokens_removed"),
    ).collect()[0]
    t_remove = time.perf_counter() - t0

    print(
        f"substr_dedup {n:,} docs (~{n * DOC_TOKENS / 1e6:.0f}M tokens), "
        f"{PAIRS:,} planted 60-token pairs: detect {t_detect:.1f} s, "
        f"recall {planted_found}/{PAIRS} "
        f"({100 * planted_found / PAIRS:.2f}%), spurious_runs={spurious}, "
        f"remove {t_remove:.1f} s "
        f"(docs_cut={stats['docs_cut']:,}, tokens_removed={stats['tokens_removed']:,})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
