"""As-of and range joins — operators Spark lacks natively (SURVEY guide
"common OLAP patterns"), built as compositions of existing DataFrame ops.

* ``asof_join`` — for each left row, the single latest right row with
  ``right.ts <= left.ts`` per key. Implemented as union + window
  (last_value over the interleaved stream) — one shuffle on (key), no
  cross product, no Python. DuckDB's native ``ASOF JOIN`` is the oracle.
* ``range_join`` — equi-key + value-in-[lo, hi] band join via bucketing:
  each right interval is exploded to the buckets it overlaps, the join runs
  on (key, bucket) — turning an O(n*m) theta join into an equi-join with
  bounded fan-out, then exact-filters the band predicate.

Scale: both avoid the naive theta-join; the asof window shuffles each key
group once (hot keys can be pre-filtered through skew_join machinery); the
range bucket width trades replication factor against candidate precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str] | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Backward as-of join (pandas.merge_asof / DuckDB ASOF JOIN semantics).

    Output: all left columns + ``right_vals`` (null when no prior right row,
    or when outside ``tolerance`` — same units as the ts columns).

    Union both sides tagged, sort within key by (ts, side) so right rows
    precede left rows at equal ts (ASOF's ``<=``), then propagate the last
    seen right ROW forward as one struct with a single
    last_value(ignorenulls) — all values and the tolerance ts come from the
    same (latest) right row, so a NULL in a right value column wins over an
    older non-null (pandas.merge_asof / DuckDB semantics). Ties among right
    rows at equal (key, ts) resolve deterministically to the greatest
    (ts, *values) struct.
    """
    right_vals = right_vals or [c for c in right.columns if c not in (on, right_ts)]
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__lrow"),
        F.struct(
            F.col(right_ts).cast("long").alias("__rts"),
            *[F.col(v).alias(v) for v in right_vals],
        ).alias("__r"),
    )
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__lrow"),
        F.lit(None).cast(r_tag.schema["__r"].dataType).alias("__r"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__is_left", "__r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag)
    filled = merged.select(
        "__is_left",
        "__lrow",
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__f"),
        F.col("__ts"),
    ).where(F.col("__is_left") == 1)
    in_tol = (
        F.lit(True)
        if tolerance is None
        else (F.col("__ts").cast("long") - F.col("__f.__rts")) <= tolerance
    )
    out_vals = [
        F.when(in_tol, F.col(f"__f.{v}")).alias(v) for v in right_vals
    ]
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns], *out_vals
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Band join: rows where left.key = right.key AND
    right_lo <= left_val <= right_hi, via bucketed equi-join.

    Right intervals explode into ceil((hi-lo)/width)+1 bucket replicas —
    choose ``bucket_width`` near the typical interval length so fan-out
    stays O(1). Output: left columns + right columns (key deduped)."""
    lb = left.withColumn(
        "__b", F.floor(F.col(left_val) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    joined = lb.join(rb, on=[on, "__b"], how="inner").where(
        (F.col(left_val) >= F.col(right_lo)) & (F.col(left_val) <= F.col(right_hi))
    )
    return joined.drop("__b")
