"""cdc_chunks stress at ~10x the sf0.1 documents volume + edit-shift check.

Two claims under load (VERDICT-style evidence for the round-10 debut):
1. Wall scales with token count — the per-position hash is map-side,
   the only shuffle is the per-doc boundary window (bounded by doc
   length) and the per-chunk fold.
2. The content-defined property holds corpus-wide: re-chunking an
   edited corpus (every doc gets a prepended token) preserves the
   vast majority of chunk hashes, while the fixed-window baseline
   preserves almost none.

Usage: python tools/stress_cdc.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from spark_skew_join_spark.functions.text import cdc_chunks, chunk_documents
from spark_skew_join_spark.sources.tables import get_spark

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
TOKENS = int(sys.argv[2]) if len(sys.argv) > 2 else 300


def main() -> None:
    spark = get_spark("stress-cdc", cpus=32)
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
                        (F.pow(u(i), 2.0) * 50000).cast("int").cast("string"),
                    ),
                ),
                " ",
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    walls = []
    for _ in range(2):
        t0 = time.time()
        n_chunks = cdc_chunks(docs, gram=4, avg_tokens=32).count()
        walls.append(time.time() - t0)
    print(
        f"docs={N_DOCS:,} tokens={N_DOCS * TOKENS:,} -> {n_chunks:,} chunks "
        f"in " + ", ".join(f"{w:.1f}s" for w in walls)
    )

    # corpus-wide edit-shift: prepend one token to EVERY doc
    edited = docs.select(
        "doc_id", F.concat(F.lit("EDIT "), F.col("text")).alias("text")
    )
    h = lambda df: df.select(  # noqa: E731
        F.xxhash64("doc_id", "chunk_text").alias("h")
    )
    base = h(cdc_chunks(docs, gram=4, avg_tokens=32))
    after = h(cdc_chunks(edited, gram=4, avg_tokens=32))
    kept = base.join(after, "h", "left_semi").count()
    total = base.count()
    fb = h(chunk_documents(docs, chunk_tokens=32, overlap=0))
    fa = h(chunk_documents(edited, chunk_tokens=32, overlap=0))
    fkept = fb.join(fa, "h", "left_semi").count()
    ftotal = fb.count()
    print(
        f"edit-shift survival: CDC {kept:,}/{total:,} "
        f"({kept / total:.1%}) vs fixed windows {fkept:,}/{ftotal:,} "
        f"({fkept / ftotal:.1%})"
    )
    spark.stop()


if __name__ == "__main__":
    main()
