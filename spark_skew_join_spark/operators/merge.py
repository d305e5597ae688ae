"""Warehouse mutation operators: MERGE (upsert), snapshot diff, SCD2 history.

The reference library is a join-only toolkit (skewjoin.scala); a user
running an analytics engine at 100 TB also needs the standard lakehouse
mutation shapes — MERGE INTO semantics, CDC classification between two
table snapshots, and type-2 slowly-changing-dimension history builds.
These are pure DataFrame compositions (no connector dependency): the same
logical plans Delta/Iceberg MERGE produce, expressed directly so they run
on plain parquet and hash-check against an ANSI-SQL oracle.

Scale design (100 TB):
* ``merge_upsert`` is ``source ∪ (target ⟕̸ source)`` — one left-anti
  join keyed on the merge keys (shuffle or broadcast per AQE; a small
  changeset broadcasts and the target never shuffles) plus a union.  No
  full-outer row multiplication, no whole-target rewrite beyond what any
  copy-on-write MERGE pays.
* ``snapshot_diff`` is one full-outer join on the key — the minimal plan
  for CDC classification; comparison columns ride the join, classification
  is a codegen projection.
* ``scd2_history`` is two window passes over ``(key) ORDER BY (ts, tie)``
  — one shuffle by key, both windows reuse the same sort (Spark collapses
  adjacent windows with identical partitioning/ordering into one sort).
  Hot entities (one key with millions of versions) serialize through a
  single partition — the inherent window semantics; cap version counts
  upstream if a key can be adversarially hot.

Zero Python UDFs anywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: Sequence[str],
                 on_duplicate: str = "error") -> DataFrame:
    """SCD1 MERGE: on key match the source row replaces the target row
    (WHEN MATCHED THEN UPDATE SET *); unmatched source rows are inserted;
    unmatched target rows survive.  Columns are aligned by name and must
    match between the two sides.

    ``on_duplicate`` controls duplicate merge keys in the SOURCE — the
    case where SQL MERGE raises and Delta/Iceberg error out:

    * ``"error"`` (default) — eagerly scan the changeset and raise, the
      standard MERGE contract.  Costs one small job over the source
      (the changeset is the small side by design).
    * ``"keep_all"`` — legacy pass-through: every duplicate source row
      survives into the output.  Only sound when the caller has already
      collapsed per-key (the streaming CDC sink does its own seq-based
      collapse and uses this).
    """
    if set(target.columns) != set(source.columns):
        raise ValueError(
            f"merge_upsert: column sets differ: {sorted(target.columns)} "
            f"vs {sorted(source.columns)}"
        )
    if on_duplicate not in ("error", "keep_all"):
        raise ValueError(f"on_duplicate must be error|keep_all, got {on_duplicate!r}")
    if on_duplicate == "error":
        dup = (
            source.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            key = {c: dup[0][c] for c in key_cols}
            raise ValueError(
                f"merge_upsert: duplicate source merge key {key}; collapse "
                "the changeset per key first or pass on_duplicate='keep_all'"
            )
    survivors = target.join(
        source.select(*key_cols), on=list(key_cols), how="left_anti"
    )
    return source.unionByName(survivors)


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: Sequence[str],
                  compare_cols: Sequence[str]) -> DataFrame:
    """CDC classification between two snapshots of the same table:
    (key_cols..., change_type ∈ {inserted, deleted, updated, unchanged}).
    ``compare_cols`` are checked null-safely (NULL == NULL)."""
    o = old.select(
        *key_cols, *[F.col(c).alias(f"__old_{c}") for c in compare_cols]
    )
    n = new.select(
        *key_cols, *[F.col(c).alias(f"__new_{c}") for c in compare_cols]
    )
    # presence markers survive the outer join even when every compare col
    # is legitimately NULL on one side
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    joined = o.join(n, on=list(key_cols), how="full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("inserted"))
        .when(F.col("__in_new").isNull(), F.lit("deleted"))
        .when(~same, F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *key_cols,
        change.alias("change_type"),
        *[F.col(f"__new_{c}").alias(f"new_{c}") for c in compare_cols],
    )


def scd2_history(df: DataFrame, key_col: str, ts_col: str, tie_col: str,
                 attr_col: str) -> DataFrame:
    """Type-2 history for one tracked attribute: consecutive rows with the
    same ``attr_col`` value collapse into one validity interval
    [valid_from, valid_to); the latest interval per key is open
    (valid_to NULL, is_current true).  Deterministic total order within a
    key via ``(ts_col, tie_col)``."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    # change detection must be NULL-safe (IS DISTINCT FROM): a plain !=
    # evaluates to NULL against a NULL attribute and silently drops the
    # row; rn=1 (not "__prev IS NULL") marks the first version so a
    # leading NULL attribute still opens an interval
    chg = (
        df.select(
            key_col, ts_col, tie_col, attr_col,
            F.row_number().over(w).alias("__rn"),
            F.lag(attr_col).over(w).alias("__prev"),
        )
        .where(
            (F.col("__rn") == 1)
            | ~F.col(attr_col).eqNullSafe(F.col("__prev"))
        )
        .drop("__rn", "__prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tie_col)
    nxt = F.lead(ts_col).over(w2)
    return chg.select(
        key_col,
        attr_col,
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
