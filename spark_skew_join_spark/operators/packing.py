"""Concat-and-chunk sequence packing for LLM training pipelines.

Documents are concatenated in a deterministic order (per group, by doc id)
and chunked into fixed-capacity token sequences; each document therefore
occupies a contiguous token span ``[start_off, start_off + n_tokens)`` of
its group's stream and maps to the packed sequences
``floor(start_off / cap) .. floor((end_off - 1) / cap)``.  This is the
standard pretraining "pack then split" scheme (documents may straddle a
sequence boundary), chosen over greedy first-fit bin packing because it is
expressible as a running-sum window — one shuffle, no sequential driver
loop — and wastes zero tokens.

Scale design (100 TB): one window aggregation partitioned by the group
column and ordered by doc id.  Within a group the running sum is computed
by a single range-partitioned sort — the same plan Spark uses for any
cumulative metric.  Groups (languages / domains) are the unit of
parallelism; for a single giant group, pre-chunk by a coarse hash of
``id_col`` ranges and offset the per-chunk sums with a second tiny window
over per-chunk totals (two-level scan), the classic distributed
prefix-sum.  Output is all-integer → bit-exact oracle hashing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pack_sequences(docs: DataFrame, token_col, capacity: int,
                   group_col: str = "lang", id_col: str = "doc_id") -> DataFrame:
    """Per-document packed-sequence spans.

    Columns: id_col, group_col, n_tokens, start_off (tokens before this doc
    in its group's stream), first_seq / last_seq (packed-sequence indexes
    this doc lands in), spans_boundary (doc crosses a sequence boundary).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(token_col).over(w)
    start = (cum - token_col).cast("bigint")
    # ints < 2^53: double FLOOR is exact and engine-identical
    first_seq = F.floor(start / F.lit(capacity)).cast("bigint")
    last_seq = F.floor((cum - 1) / F.lit(capacity)).cast("bigint")
    return docs.select(
        F.col(id_col),
        F.col(group_col),
        token_col.cast("bigint").alias("n_tokens"),
        start.alias("start_off"),
        first_seq.alias("first_seq"),
        F.when(token_col == 0, first_seq).otherwise(last_seq).alias("last_seq"),
        F.when(token_col == 0, F.lit(False))
        .otherwise(last_seq > first_seq)
        .alias("spans_boundary"),
    )
