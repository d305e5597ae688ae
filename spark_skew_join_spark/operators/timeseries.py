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


def holt_winters(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    max_points: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + linear trend):

        l_1 = y_1,  b_1 = 0
        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    The recurrence is inherently sequential IN TIME but embarrassingly
    parallel ACROSS keys — the standard distributed shape: one shuffle
    groups each key's points, ``array_sort`` orders them, and a single
    ``aggregate`` higher-order-function pass folds the state entirely
    in whole-stage codegen (no Python, no window over a global sort).
    ``max_points`` bounds the folded prefix (and the oracle's recursion
    depth); a key's full history at minute grain for a year is ~0.5M
    points — one array per key, not a cross-key sort.

    Output: (key, n_points, level, trend, forecast) where forecast is
    the 1-step-ahead ``l + b``, all rounded to 6 digits (the recurrence
    itself is bit-deterministic: fixed fold order, same literal
    constants both engines)."""
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    pts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                tb.alias("tb"),
                F.col(value_col).cast("double").alias("y"),
            )
        )
    )
    if max_points is not None:
        pts = F.slice(pts, 1, max_points)
    a, b_ = float(alpha), float(beta)

    def step(acc, p):
        y = p["y"]
        newl = F.lit(a) * y + F.lit(1.0 - a) * (acc["l"] + acc["b"])
        return (
            F.when(
                acc["i"] == 0,
                F.struct(
                    y.alias("l"), F.lit(0.0).alias("b"),
                    F.lit(1).cast("bigint").alias("i"),
                ),
            ).otherwise(
                F.struct(
                    newl.alias("l"),
                    (F.lit(b_) * (newl - acc["l"]) + F.lit(1.0 - b_) * acc["b"])
                    .alias("b"),
                    (acc["i"] + F.lit(1).cast("bigint")).alias("i"),
                )
            )
        )

    init = F.expr(
        "named_struct('l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE), "
        "'i', CAST(0 AS BIGINT))"
    )
    state = F.aggregate(pts, init, step)
    df = df.where(F.col(ts_col).isNotNull() & F.col(value_col).isNotNull())
    return (
        df.groupBy(key_col)
        .agg(state.alias("s"))
        .select(
            key_col,
            F.col("s.i").alias("n_points"),
            F.round("s.l", 6).alias("level"),
            F.round("s.b", 6).alias("trend"),
            F.round(F.col("s.l") + F.col("s.b"), 6).alias("forecast"),
        )
    )


def cusum_scan(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    slack: float = 0.0,
    threshold: float = 0.0,
    max_points: int | None = None,
    tiebreak_col: str | None = None,
    dec: str = "decimal(18,2)",
) -> DataFrame:
    """Per-key one-sided CUSUM change detection (Page 1954):

        s_0 = 0,  s_t = max(0, s_{t−1} + (y_t − target − slack))

    with ``target`` the key's own mean (computed through an EXACT
    decimal sum, so it is accumulation-order independent — ``dec`` must
    cover the value column's precision).  Same distributed shape as
    ``holt_winters``: the scan is sequential in time but parallel
    across keys, folded by one aggregate-HOF pass over the key's sorted
    points in whole-stage codegen.  Emits the running maximum and its
    1-based position — where the cumulative drift peaked — plus an
    ``alarm`` flag against ``threshold``.

    Output: (key, n_points, target, cusum_max, argmax_idx, alarm)."""
    filtered = df.where(
        F.col(ts_col).isNotNull() & F.col(value_col).isNotNull()
    )
    tb = F.col(tiebreak_col) if tiebreak_col else F.lit(0)
    pts = F.array_sort(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                tb.alias("tb"),
                F.col(value_col).cast("double").alias("y"),
            )
        )
    )
    if max_points is not None:
        pts = F.slice(pts, 1, max_points)
    grouped = filtered.groupBy(key_col).agg(pts.alias("__pts"))
    # target = mean of the SAME analyzed window, via an exact decimal
    # fold over the sliced array (order-independent, engine-identical)
    dec_sum = F.aggregate(
        F.col("__pts"),
        F.lit(0).cast("decimal(28,6)"),
        lambda acc, p: (acc + p["y"].cast(dec)).cast("decimal(28,6)"),
    )
    grouped = grouped.withColumn(
        "__mu", dec_sum.cast("double") / F.size("__pts")
    )

    def step(acc, p):
        ns = F.greatest(
            F.lit(0.0), acc["s"] + (p["y"] - F.col("__mu") - F.lit(float(slack)))
        )
        i2 = acc["i"] + F.lit(1).cast("bigint")
        better = ns > acc["smax"]
        return F.struct(
            ns.alias("s"),
            F.when(better, ns).otherwise(acc["smax"]).alias("smax"),
            F.when(better, i2).otherwise(acc["imax"]).alias("imax"),
            i2.alias("i"),
        )

    init = F.expr(
        "named_struct('s', CAST(0.0 AS DOUBLE), 'smax', CAST(0.0 AS DOUBLE), "
        "'imax', CAST(0 AS BIGINT), 'i', CAST(0 AS BIGINT))"
    )
    st = F.aggregate(F.col("__pts"), init, step)
    return grouped.select(
        key_col,
        st["i"].alias("n_points"),
        F.round("__mu", 6).alias("target"),
        F.round(st["smax"], 6).alias("cusum_max"),
        st["imax"].alias("argmax_idx"),
        (st["smax"] > F.lit(float(threshold))).alias("alarm"),
    )


def acf(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    max_lag: int = 3,
) -> DataFrame:
    """Per-key sample autocorrelation at lags 1..max_lag.

    ACF here is the Pearson correlation between the series and its
    k-shifted self over the overlapping pairs (the "corr of (x_t,
    x_{t-k})" estimator — the regression-friendly variant; the
    alternative fixed-denominator estimator divides by the full-series
    variance and is a constant factor away). Rounded to 6 decimals:
    co-moment accumulation order differs between engines and the drift
    sits far below 1e-6 (same posture as corr_stats_lineitem).

    Scale shape: ONE window pass per key computes all ``max_lag``
    lagged columns (windows partitioned by key — no global sort), a
    ``stack`` unpivots them rows-wise, and a map-side-combined groupBy
    finishes. Zero Python, zero driver actions.

    Output: (key, lag, n_pairs, acf) — n_pairs = series length minus
    lag; keys shorter than lag+1 points drop out for that lag.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    lag_cols = [
        F.lag(value_col, k).over(w).alias(f"__lag{k}")
        for k in range(1, max_lag + 1)
    ]
    lagged = df.select(key_col, F.col(value_col).alias("__v"), *lag_cols)
    pairs = ", ".join(f"{k}, __lag{k}" for k in range(1, max_lag + 1))
    stacked = lagged.select(
        key_col,
        "__v",
        F.expr(f"stack({max_lag}, {pairs}) AS (lag, __lv)"),
    ).where(F.col("__lv").isNotNull())
    return (
        stacked.groupBy(key_col, "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("__v", "__lv"), 6).alias("acf"),
        )
    )


def theil_sen(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
    order_cols: list[str] | None = None,
    max_points: int = 300,
) -> DataFrame:
    """Per-key Theil–Sen robust trend line: slope = median of all
    pairwise slopes (y_j − y_i)/(x_j − x_i), intercept = median of
    (y_i − slope·x_i) (Theil 1950, Sen 1968). Breakdown point ~29% —
    a level shift or a burst of outliers that would wreck an OLS fit
    moves the median slope barely at all; pairs with equal x are
    skipped (vertical).

    The pair set is quadratic *per key*, so the analyzed window is
    bounded: the first ``max_points`` rows per key in ``order_cols``
    order (default: x, then y — deterministic and oracle-replayable via
    ROW_NUMBER; the same bounded-window posture as holt_winters /
    cusum_scan). Pairs are generated by a key-equi self-join of the
    numbered rows (rn_i < rn_j) — shuffled once on the key, fan-out
    max_points² per key, never corpus-quadratic. Medians are exact
    sort-based interpolations (engine-stable); displayed slope and
    intercept round to 6.

    Output: (key, n_points, n_pairs, slope, intercept). A key whose
    bounded window has all-equal x (every pairwise slope vertical) is
    NOT dropped: it surfaces as (key, n_points, n_pairs=0, slope=NULL,
    intercept=NULL) via a left join from the point set to the slope
    medians (ADVICE r6 #5).
    """
    if max_points < 2:
        raise ValueError("max_points must be >= 2")
    order_cols = order_cols or [x_col, y_col]
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    pts = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_points)
        .select(
            F.col(key_col).alias("__k"),
            F.col(x_col).cast("double").alias("__x"),
            F.col(y_col).cast("double").alias("__y"),
            "__rn",
        )
    )
    a = pts.select("__k", F.col("__x").alias("xa"), F.col("__y").alias("ya"),
                   F.col("__rn").alias("ra"))
    b = pts.select("__k", F.col("__x").alias("xb"), F.col("__y").alias("yb"),
                   F.col("__rn").alias("rb"))
    slopes = (
        a.join(b, "__k")
        .where((F.col("ra") < F.col("rb")) & (F.col("xa") != F.col("xb")))
        .select(
            "__k",
            ((F.col("yb") - F.col("ya")) / (F.col("xb") - F.col("xa"))).alias(
                "__s"
            ),
        )
    )
    med = slopes.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("percentile(__s, 0.5)").alias("__m"),
    )
    resid = pts.join(med, "__k", "left").groupBy("__k").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.first("n_pairs").alias("__np"),
        F.first("__m").alias("__mm"),
        F.expr("percentile(__y - __m * __x, 0.5)").alias("__b"),
    )
    return resid.select(
        F.col("__k").alias(key_col),
        "n_points",
        F.coalesce(F.col("__np"), F.lit(0)).alias("n_pairs"),
        F.round("__mm", 6).alias("slope"),
        F.round("__b", 6).alias("intercept"),
    )


def ols_trend(
    df: DataFrame,
    key_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-key ordinary-least-squares trend line in ONE aggregation
    pass — the parametric sibling of ``theil_sen`` (which pays a
    per-key quadratic pair join for robustness; OLS is the cheap
    full-data fit a monitoring surface runs everywhere, falling back
    to Theil–Sen on keys it flags):

        slope     = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)²
        intercept = ȳ − slope·x̄
        r2        = corr(x, y)²

    computed from the raw moments (n, Σx, Σy, Σxy, Σx², Σy²) so the
    whole fit is a single map-side-combined groupBy — no window, no
    self-join, no second pass; exactly the shape that scales to any
    key cardinality at 100 TB.  Degenerate keys are kept explicit:
    all-equal x → slope/intercept/r2 NULL (vertical); var(y) = 0 under
    nonzero var(x) → slope 0 with r2 NULL (corr undefined).

    Output: (key, n_points, slope, intercept, r2), rounded to 6.
    """
    pts = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(key_col).alias("__k"),
        F.col(x_col).cast("double").alias("__x"),
        F.col(y_col).cast("double").alias("__y"),
    )
    agg = pts.groupBy("__k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
    )
    ssxx = F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")
    ssyy = F.col("syy") - F.col("sy") * F.col("sy") / F.col("n")
    ssxy = F.col("sxy") - F.col("sx") * F.col("sy") / F.col("n")
    slope = F.when(ssxx > 0, ssxy / ssxx)
    intercept = F.when(
        ssxx > 0, (F.col("sy") - ssxy / ssxx * F.col("sx")) / F.col("n")
    )
    r2 = F.when((ssxx > 0) & (ssyy > 0), ssxy * ssxy / (ssxx * ssyy))
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("n").alias("n_points"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(r2, 6).alias("r2"),
    )
