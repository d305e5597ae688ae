"""Time-series regularization: per-entity calendar spine + LOCF gap fill.

The hypertable-style resample the reference lacks: aggregate an event
stream to a fixed grain, densify each entity onto a complete calendar
spine between its own first and last observation, and fill gaps by
carrying the last observation forward (LOCF).  Deterministic and
oracle-checkable; part of the beyond-reference extension surface
(SURVEY §2b ★).

Scale design (100 TB):
* The grain aggregation sums DECIMAL(18,3) (order-independent — double
  summation order differs between engines and partitionings; the
  tumbling-window oracle taught this) with map-side partial combine.
* The spine is generated per entity from its own [min, max] day — an
  explode of a bounded ``sequence``, no global min/max scalar, no
  driver action, no cross join against a calendar table.
* LOCF is one ``last(value, ignorenulls=True)`` window per entity
  ordered by day — a single hash partition by entity id; the spine join
  and the window share the entity-key partitioning.  An entity spanning
  decades at day grain is ~10k rows — windows over that are trivial;
  the operator never sorts across entities.  Zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

EPOCH = "1970-01-01"


def resample_locf(events: DataFrame, id_col: str, ts_col: str,
                  value_col: str) -> DataFrame:
    """(id_col, day, value, filled): daily sum of ``value_col`` per
    entity on a gap-free daily spine spanning the entity's own observed
    range; missing days carry the previous day's value (LOCF) and are
    marked ``filled``.  ``day`` is days-since-epoch (int — engine- and
    pandas-dtype-stable, unlike date columns)."""
    day = F.datediff(F.to_date(ts_col), F.lit(EPOCH).cast("date"))
    daily = (
        events.select(F.col(id_col), day.alias("day"),
                      F.col(value_col).alias("__v"))
        .groupBy(id_col, "day")
        .agg(
            F.sum(F.round("__v", 3).cast("decimal(18,3)"))
            .cast("double")
            .alias("__dv")
        )
    )
    spine = (
        daily.groupBy(id_col)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            id_col,
            F.explode(F.sequence(F.col("__d0"), F.col("__d1"))).alias("day"),
        )
    )
    joined = spine.join(daily, [id_col, "day"], "left")
    w = (
        Window.partitionBy(id_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        id_col,
        "day",
        F.last("__dv", ignorenulls=True).over(w).alias("value"),
        F.col("__dv").isNull().alias("filled"),
    )
