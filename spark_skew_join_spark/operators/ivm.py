"""Incremental view maintenance: merge a delta's aggregate into a base
aggregate without recomputing history.

The materialized-view refresh shape a 100 TB warehouse needs: a daily
partition's aggregate folds into the standing rollup by combining
self-decomposable aggregates (count, sum — avg/stddev derive from them)
instead of rescanning every historical partition.  Correct because the
aggregates form a commutative monoid per group; sums use DECIMAL so the
merged result equals the from-scratch recompute BIT-FOR-BIT (double
summation order would differ).

Scale design: the delta aggregation touches only delta rows; the merge
is one full-outer join on the group key between two already-aggregated
(small) frames — cost is O(|groups|), independent of history size.
Zero Python UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def agg_state(df: DataFrame, group_cols: Sequence[str], value_col: str,
              decimal_type: str = "decimal(18,2)") -> DataFrame:
    """Per-group mergeable state: n (count) and s (exact decimal sum of
    ``value_col``)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(decimal_type)).alias("s"),
    )


def merge_agg_states(base: DataFrame, delta: DataFrame,
                     group_cols: Sequence[str]) -> DataFrame:
    """Fold ``delta`` state into ``base`` state: full-outer on the group
    key, component-wise monoid combine (missing side = identity). The
    sum identity is cast to the state's OWN decimal type (taken from the
    base schema) so merging never widens the precision away from what a
    from-scratch recompute would produce."""
    s_type = base.schema["s"].dataType.simpleString()
    b = base.select(*group_cols, F.col("n").alias("__nb"),
                    F.col("s").alias("__sb"))
    d = delta.select(*group_cols, F.col("n").alias("__nd"),
                     F.col("s").alias("__sd"))
    return b.join(d, list(group_cols), "full_outer").select(
        *group_cols,
        (F.coalesce("__nb", F.lit(0)) + F.coalesce("__nd", F.lit(0))).alias(
            "n"
        ),
        (
            F.coalesce(F.col("__sb"), F.lit(0).cast(s_type))
            + F.coalesce(F.col("__sd"), F.lit(0).cast(s_type))
        )
        # addition widens decimal precision by 1; cast back so the merged
        # state has EXACTLY the recompute's type and repeated folds don't
        # walk the precision toward the decimal(38) cap
        .cast(s_type)
        .alias("s"),
    )
