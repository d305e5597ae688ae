"""Skew-aware aggregation helpers.

Spark's hash aggregation already does map-side partial aggregation, which
defeats key skew for algebraic aggregates (sum/count/min/max) — no operator
needed. The cases that DO break on hot keys:

* ``COUNT(DISTINCT v)`` per key — the shuffle carries every (k, v) pair to
  the key's single reducer. ``count_distinct_skewed`` runs the classic
  two-level plan: pre-distinct on (k, v) (spreads a hot key over
  hash(k, v) partitions, partial dedup map-side), then count per key.
* collect_list / exact median per hot key — ``salted_group_apply`` fans a
  hot key into ``n_salt`` subgroups, applies a partial aggregator per
  subgroup, then merges — usable for any decomposable aggregate.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


def count_distinct_skewed(
    df: DataFrame, keys: list[str] | str, value: str, out: str = "n_distinct"
) -> DataFrame:
    """Per-key exact distinct count that survives hot keys.

    Plan: distinct over (keys..., value) — a shuffle keyed by the whole
    tuple, so a key with 10^9 rows spreads across the cluster — then a
    cheap groupBy(keys).count() over already-unique tuples."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*keys, value)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out))
    )


def salted_aggregate(
    df: DataFrame,
    keys: list[str] | str,
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    n_salt: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates on skewed keys:
    groupBy(keys + salt) computes ``partial_aggs``, then groupBy(keys)
    merges with ``merge_aggs`` (which reference the partial column names).

    Example (exact sum + count → mean):
        partial = [F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")]
        merge   = [(F.sum("s") / F.sum("c")).alias("mean_v")]
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed) * n_salt).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
