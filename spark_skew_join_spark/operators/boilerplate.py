"""Corpus-wide boilerplate removal: fixed-width token-chunk deduplication.

The CCNet / RefinedWeb pretraining pipelines drop text units that repeat
verbatim across many documents (shared headers, footers, navigation
chrome).  Those pipelines split on newlines; the fixture corpus is
single-line single-space text, so the unit here is a fixed-width token
chunk (default 10 tokens) — the same cross-document exact-match semantics
on a deterministic segmentation.  The reference library has no text
operators; this is part of the driver-mandated LLM-data-pipeline
extension surface (SURVEY §2b ★).

Scale design (100 TB):
* Chunks are flagged through an ``xxhash64`` int64 key — the frequency
  aggregation and the flag join shuffle 8-byte hashes, not chunk strings
  (same move as operators/contamination.py).  The chunk *text* rides the
  flag join only because the cleaned-document reassembly needs it; a
  flag-only variant would shuffle ``(doc_id, pos, hash)`` and re-derive
  text from the source scan.
* Both aggregations have map-side partial combine; the reassembly
  aggregation is keyed by the unique ``doc_id`` (near-uniform reduce
  keys, no skew).  A pathological chunk shared by millions of documents
  skews only the tiny frequency-count aggregation (8-byte rows, partial
  combine absorbs it map-side), never a row-multiplying join.
* Zero Python UDFs — explode-positions + ``slice``/``array_join`` stay
  inside whole-stage codegen (HOF ``transform()`` lambdas measured ~5×
  slower on the contamination gram builder, see quality.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_chunks(docs: DataFrame, id_col: str, text_col: str,
               chunk_tokens: int = 10) -> DataFrame:
    """(id_col, pos, chunk): the document split into consecutive
    ``chunk_tokens``-word chunks (0-based ``pos``; the final chunk may be
    shorter).  Deterministic segmentation — identical in the SQL oracle."""
    toks = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(chunk_tokens)).cast("int")
    base = docs.select(F.col(id_col), toks.alias("__tk"), n_chunks.alias("__nc"))
    return (
        base.where(F.col("__nc") > 0)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("pos"),
            "__tk",
        )
        .select(
            id_col,
            "pos",
            F.array_join(
                F.slice(F.col("__tk"), F.col("pos") * chunk_tokens + 1, chunk_tokens),
                " ",
            ).alias("chunk"),
        )
    )


def chunk_dedup_stats(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", chunk_tokens: int = 10,
                      max_docs: int = 1) -> DataFrame:
    """Per-document boilerplate-removal audit.

    A chunk is boilerplate when its exact text occurs in more than
    ``max_docs`` distinct documents.  Output per document:

    * ``n_chunks`` — total chunks,
    * ``n_dup_chunks`` — chunks flagged as boilerplate,
    * ``clean_md5`` — md5 of the surviving chunks rejoined in document
      order ('' when everything was dropped), so the *reassembled output*
      is verified end-to-end against the oracle, not just the counts.
    """
    chunks = doc_chunks(docs, id_col, text_col, chunk_tokens)
    hashed = chunks.withColumn("__h", F.xxhash64("chunk"))
    freq = hashed.groupBy("__h").agg(F.countDistinct(id_col).alias("__nd"))
    flagged = hashed.join(freq, "__h").withColumn(
        "__dup", F.col("__nd") > max_docs
    )
    kept = F.when(~F.col("__dup"), F.struct("pos", "chunk"))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.when(F.col("__dup"), 1).otherwise(0)).alias("n_dup_chunks"),
        F.md5(
            F.array_join(
                # collect_list drops the NULLs the when() leaves for dup
                # chunks; struct sort orders by the leading pos field
                F.transform(
                    F.array_sort(F.collect_list(kept)), lambda s: s["chunk"]
                ),
                " ",
            ).cast("binary")
        ).alias("clean_md5"),
    )
