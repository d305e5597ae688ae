"""Training-mix composition operators: temperature sampling + sequence
packing.

Two standard steps between a cleaned corpus and a training run (the
public recipe in GPT-3 / LLaMA / Pile data notes):

* ``temperature_mix`` — re-weight sources by (share)^alpha: low-resource
  sources are UP-sampled relative to their natural share (alpha < 1
  flattens the mixture; alpha = 1 is natural, alpha = 0 uniform).
  Selection is deterministic hash-rank per source (the same md5-rank
  idiom as sampling.py / bottomk.py), so membership is engine- and
  partitioning-independent and the SQL oracle reproduces the exact
  sampled set.
* ``sequence_packing`` — pack documents, in deterministic id order,
  into fixed-capacity token bins (the "pack into 2048-token sequences"
  step).  Bin assignment is sequential greedy: a document starts a new
  bin when it would overflow the current one.  Expressed as a running
  token cumsum + the closed-form bin index, one window pass.

Scale design (100 TB):
* temperature_mix shuffles only (source, n) aggregates plus a per-source
  rank window; the rank window partitions by source — the natural
  parallelism of the mixture, with per-source skew bounded by the
  largest source (same profile as quota_sample).
* sequence_packing's window is a single ordered cumsum per pack-group
  (partition the packing by a grouping column — e.g. source or shard —
  to bound any one window's span; an ungrouped global pack serializes
  one partition, exactly like any total order).

Zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def temperature_mix(
    docs: DataFrame,
    alpha: float,
    total: int,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic temperature-sampled mixture of ``total`` documents.

    Target count per source s: total · n_s^alpha / Σ n^alpha (floored;
    capped at n_s — a low-resource source is never oversampled beyond
    replacement-free capacity).  Members are the target-count smallest
    md5(id) ranks within each source.  Output: the selected documents
    with their source's natural share and target count attached.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n"))
    weighted = counts.withColumn("__w", F.pow(F.col("__n"), F.lit(alpha)))
    norm = weighted.agg(F.sum("__w").alias("__z"))
    targets = weighted.crossJoin(F.broadcast(norm)).select(
        source_col,
        "__n",
        F.least(
            F.floor(F.lit(total) * F.col("__w") / F.col("__z")).cast("int"),
            F.col("__n").cast("int"),
        ).alias("__target"),
    )
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    ranked = docs.withColumn("__rk", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), on=source_col)
        .where(F.col("__rk") <= F.col("__target"))
        .select(
            id_col,
            source_col,
            F.col("__n").cast("long").alias("source_docs"),
            F.col("__target").cast("int").alias("source_target"),
        )
    )


def sequence_packing(
    docs: DataFrame,
    capacity: int,
    group_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy sequential packing of whitespace token counts into bins of
    ``capacity`` tokens.

    Documents are processed in ``id_col`` order (within ``group_col``
    when given); a document longer than ``capacity`` occupies a bin of
    its own.  Returns one row per document:
    (group?, id, n_tokens, bin_id, bin_offset) where bin_offset is the
    token position at which the document starts inside its bin.

    Greedy packing is a sequential recurrence (bin state resets at each
    overflow — no closed form over a plain cumsum), so each pack group
    folds its ordered (id, n_tokens) list with a JVM-side ``aggregate``
    HOF: per-group memory is O(group), the inherent cost of a total
    order, and groups pack in parallel — partition the corpus into
    shard-sized pack groups to bound it (the same advice as any global
    sort).  No Python anywhere.
    """
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    part = [group_col] if group_col else []
    # the accumulator's id field mirrors the caller's id type (string
    # doc ids are as valid as bigint — ADVICE r5 #3)
    id_type = docs.schema[id_col].dataType.simpleString()
    n_tok = F.size(F.split(F.col(text_col), " "))
    packed = (
        docs.select(*part, id_col, n_tok.cast("int").alias("n_tokens"))
        .groupBy(*part)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(id_col, "n_tokens"))
            ).alias("__docs")
        )
        .select(
            *part,
            F.explode(
                F.aggregate(
                    "__docs",
                    F.array().cast(
                        f"array<struct<doc_id:{id_type},n_tokens:int,"
                        "bin_id:int,bin_offset:int>>"
                    ),
                    lambda acc, d: F.concat(
                        acc,
                        F.array(
                            F.struct(
                                d[id_col].alias("doc_id"),
                                d["n_tokens"].alias("n_tokens"),
                                _next_bin(acc, d, capacity).alias("bin_id"),
                                _next_off(acc, d, capacity).alias("bin_offset"),
                            )
                        ),
                    ),
                )
            ).alias("__p"),
        )
        .select(
            *part,
            F.col("__p.doc_id").alias(id_col),
            F.col("__p.n_tokens").alias("n_tokens"),
            F.col("__p.bin_id").alias("bin_id"),
            F.col("__p.bin_offset").alias("bin_offset"),
        )
    )
    return packed


def _tail(acc):
    return F.element_at(acc, -1)


def _next_bin(acc, d, capacity: int):
    """Greedy: stay in the last bin iff the doc fits after its end."""
    last = _tail(acc)
    fits = (last["bin_offset"] + last["n_tokens"] + d["n_tokens"]) <= capacity
    return (
        F.when(F.size(acc) == 0, F.lit(0))
        .when(fits, last["bin_id"])
        .otherwise(last["bin_id"] + 1)
        .cast("int")
    )


def _next_off(acc, d, capacity: int):
    last = _tail(acc)
    fits = (last["bin_offset"] + last["n_tokens"] + d["n_tokens"]) <= capacity
    return (
        F.when(F.size(acc) == 0, F.lit(0))
        .when(fits, last["bin_offset"] + last["n_tokens"])
        .otherwise(F.lit(0))
        .cast("int")
    )
