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


def markov_transitions(
    events: DataFrame,
    id_col: str,
    order_cols: list[str],
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for each entity, pair every event with its successor
    (one LEAD window partitioned by the entity — no global sort), then
    count (from_state, to_state) across all entities and normalize per
    from_state.

    The empirical transition probability P(to | from) is the MLE of the
    chain's kernel; "what do users do after X" / next-event-prediction
    baselines read straight off the modal row per from_state.

    Scale: the window shuffles once on the entity key (sequences are
    per-user short); the count is a map-side-combined groupBy over at
    most |states|² rows; the per-from normalizer is a second tiny
    groupBy joined back on from_state — never a driver action.

    Output: (from_state, to_state, n_transitions, n_from, prob).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(*order_cols)
    trans = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .where(F.col("to_state").isNotNull())
        .groupBy("from_state", "to_state")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = trans.groupBy("from_state").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return trans.join(totals, "from_state").select(
        "from_state",
        "to_state",
        "n_transitions",
        "n_from",
        (
            F.col("n_transitions").cast("double") / F.col("n_from")
        ).alias("prob"),
    )
