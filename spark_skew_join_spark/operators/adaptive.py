"""Evidence-based join strategy selection: broadcast vs plain shuffle vs
skew_join, decided from the same bounded statistics the rest of the
library already builds.

At 100 TB the strategy decision is worth more than any single operator:
a dimension that fits in memory must broadcast (no shuffle of the fact
side), a hot-keyed fact must salt (one straggler partition otherwise
holds the job hostage), and everything else should stay on the plain
shuffle path Catalyst already optimizes.  AQE makes these calls from
runtime shuffle statistics; this module makes them BEFORE the join
runs, from two bounded probe jobs — a count-capped right-side probe and
a per-key frequency aggregate over the left keys — so a pipeline can
pick (and log) its plan deterministically, including the salted
strategy AQE cannot synthesize (`BASELINE.md`: AQE's
OptimizeSkewedJoin leaves the hot key unsplit where skew_join holds
skew_ratio at ~1.9).

``plan_equi_join`` returns the decision row; ``adaptive_join`` executes
it.  Both cost: one ``limit(threshold+1).count()`` on the right (never
a full count of a huge table) + one map-side-combined per-key count on
the left keys (the hot-key probe the skew join pays anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..conf import SkewJoinConf
from .skew_join import skew_join

BROADCAST_ROWS = 1_000_000  # ~tens of MB for typical dims — executor-safe


def _normalize(on) -> list[tuple[str, str]]:
    if isinstance(on, str):
        return [(on, on)]
    out = []
    for o in on:
        out.append((o, o) if isinstance(o, str) else (o[0], o[1]))
    return out


def plan_equi_join(
    left: DataFrame,
    right: DataFrame,
    on,
    conf: SkewJoinConf | None = None,
    broadcast_rows: int = BROADCAST_ROWS,
) -> dict:
    """Decide the strategy; returns ``{strategy, n_right_capped,
    n_hot_keys, max_key_freq}``.

    * ``broadcast`` — right side proves ≤ ``broadcast_rows`` rows via a
      capped count (a huge right costs one early-stopped scan, never a
      full count);
    * ``skew`` — some left key's frequency ≥ ``conf.hot_threshold``
      (the probe is the same aggregate skew_join's CMS replaces at
      scale; exact here because the decision doubles as a report);
    * ``shuffle`` — otherwise: Catalyst's sort-merge/shuffle-hash path
      is already right."""
    conf = conf or SkewJoinConf()
    pairs = _normalize(on)
    n_right = right.limit(broadcast_rows + 1).count()
    lkeys = [p[0] for p in pairs]
    freq = (
        left.groupBy(*lkeys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.coalesce(
                F.sum((F.col("n") >= conf.hot_threshold).cast("long")), F.lit(0)
            ).alias("hot"),
            F.coalesce(F.max("n"), F.lit(0)).alias("mx"),
        )
        .collect()[0]
    )
    if n_right <= broadcast_rows:
        strategy = "broadcast"
    elif freq["hot"] > 0:
        strategy = "skew"
    else:
        strategy = "shuffle"
    return {
        "strategy": strategy,
        "n_right_capped": n_right,
        "n_hot_keys": int(freq["hot"]),
        "max_key_freq": int(freq["mx"]),
    }


def adaptive_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    conf: SkewJoinConf | None = None,
    broadcast_rows: int = BROADCAST_ROWS,
    plan: dict | None = None,
) -> DataFrame:
    """Execute the planned strategy.  Output ≡ ``left.join(right, on,
    how)`` with skew_join's USING-style column order on every branch
    (one copy of the key columns under the left names), so callers can
    switch strategies without downstream schema churn.  For join
    types where Spark cannot broadcast the right side (right/full
    outer), a ``broadcast`` decision executes as the plain shuffle
    join — the decision row still reports what the probe found."""
    conf = conf or SkewJoinConf()
    # ``plan`` (r15): callers that already ran plan_equi_join (to report
    # the decision inputs, as adaptive_join_strategies does) pass it in
    # instead of paying the two probe actions a second time (guide
    # §1.2); the dict must be a plan_equi_join result for the same
    # (left, right, on, conf).
    if plan is None:
        plan = plan_equi_join(left, right, on, conf, broadcast_rows)
    pairs = _normalize(on)
    if plan["strategy"] == "skew":
        return skew_join(left, right, on, how, conf)
    # broadcast and shuffle share the plain-join construction; the only
    # difference is the hint
    rhs = right
    for lc, rc in pairs:
        if rc != lc:
            rhs = rhs.withColumnRenamed(rc, lc)
    if plan["strategy"] == "broadcast" and how in ("inner", "left", "left_outer",
                                                   "leftsemi", "left_semi",
                                                   "leftanti", "left_anti"):
        rhs = F.broadcast(rhs)
    keys = [p[0] for p in pairs]
    return left.join(rhs, keys, how)
