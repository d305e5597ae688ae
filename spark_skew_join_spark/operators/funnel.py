"""Ordered conversion-funnel analysis over an event stream.

Product-analytics staple the reference's join toolkit cannot express: for
an ordered stage list (e.g. view → click → purchase), find each entity's
first time reaching stage k strictly after its stage-k-1 time, and the
deepest stage reached.  Part of the beyond-reference extension surface
(SURVEY §2b ★) — deterministic, windowless, oracle-checkable.

Scale design (100 TB): one chained aggregation per stage, each keyed by
the entity id (near-uniform reduce keys, map-side partial combine).  The
stage-k pass joins the stage-(k-1) times back to the events — that join
is entity-keyed and the right side is one row per qualifying entity, so
AQE broadcasts it when small and hash-joins otherwise; no row
multiplication, no window sort over whole entities' histories.  Events
are projected to (id, type, ts) before the first shuffle.  Zero Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_stages(events: DataFrame, id_col: str, type_col: str,
                  ts_col: str, stages: Sequence[str]) -> DataFrame:
    """(id_col, reached, t_<stage>... ) — ``t_<stage>`` is the first
    ``ts_col`` of that stage strictly after the previous stage's time
    (NULL once a stage is never reached; later stages are then NULL too),
    ``reached`` counts completed stages.  ``ts_col`` must be a totally
    ordered numeric/timestamp column."""
    if not stages:
        raise ValueError("funnel_stages: need at least one stage")
    ev = events.select(
        F.col(id_col), F.col(type_col).alias("__t"), F.col(ts_col).alias("__ts")
    )
    out = (
        ev.where(F.col("__t") == stages[0])
        .groupBy(id_col)
        .agg(F.min("__ts").alias(f"t_{stages[0]}"))
    )
    for prev, cur in zip(stages, stages[1:]):
        nxt = (
            ev.where(F.col("__t") == cur)
            .join(out.select(id_col, f"t_{prev}"), id_col)
            .where(F.col("__ts") > F.col(f"t_{prev}"))
            .groupBy(id_col)
            .agg(F.min("__ts").alias(f"t_{cur}"))
        )
        out = out.join(nxt, id_col, "left")
    reached = sum(
        (F.col(f"t_{s}").isNotNull().cast("int") for s in stages), F.lit(0)
    )
    return out.select(id_col, reached.alias("reached"),
                      *[f"t_{s}" for s in stages])
