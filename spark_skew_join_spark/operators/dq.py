"""Data-quality audit: null, uniqueness, and referential-integrity checks.

Validation layer for a production pipeline (beyond-reference extension,
SURVEY §2b ★): per-table null counts, duplicate-key counts, and
cross-table orphan detection, each as one declarative plan so the audit
of a 100 TB table costs what one aggregation + one anti-join costs.

Scale design: every per-table metric (row count, per-column null count,
duplicate-key count) comes out of ONE hash aggregation with map-side
partial combine — N columns audited is still one scan, one shuffle of
partial-agg rows.  Orphan detection is a left-anti join keyed on the
foreign key (AQE broadcasts the parent key set when it fits, hash-joins
otherwise) feeding a 1-row count.  Combining the 1-row metric frames is
a lazy scalar cross-join (BroadcastNestedLoopJoin of single rows —
bounded, shuffle-free).  Zero Python UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def dq_metrics(df: DataFrame, key_cols: Sequence[str],
               not_null_cols: Sequence[str]) -> DataFrame:
    """One row: n_rows, n_dup_key (rows beyond the first per distinct
    ``key_cols`` tuple), and n_null_<c> per ``not_null_cols`` entry —
    all from a single aggregation."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    # distinct over a STRUCT of the keys: a tuple containing NULLs is a
    # non-null struct and therefore counted, so a single NULL-key row is
    # NOT a duplicate (bare COUNT(DISTINCT k) would skip it and flag a
    # false positive); the SQL mirror is COUNT(DISTINCT ROW(...))
    aggs.append(
        (
            F.count(F.lit(1))
            - F.count_distinct(F.struct(*[F.col(c) for c in key_cols]))
        )
        .cast("bigint")
        .alias("n_dup_key")
    )
    for c in not_null_cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("int")).cast("bigint").alias(
                f"n_null_{c}"
            )
        )
    return df.agg(*aggs)


def orphan_count(child: DataFrame, parent: DataFrame, fk: str,
                 pk: str) -> DataFrame:
    """One row (n_orphans): child rows whose ``fk`` has no matching
    ``pk`` in parent (NULL fks are not orphans, matching SQL
    NOT-EXISTS semantics)."""
    orphans = child.where(F.col(fk).isNotNull()).join(
        parent.select(F.col(pk).alias(fk)), fk, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
