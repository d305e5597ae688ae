"""Join-output-cardinality estimation from Count-Min sketches.

The classic Cormode–Muthukrishnan result (An Improved Data Stream
Summary: The Count-Min Sketch and its Applications, J. Algorithms 2005,
§4.2): for two frequency vectors a, b sketched with the SAME hash
functions, ``min_d sum_i A[d,i] * B[d,i]`` estimates the inner product
``a·b = sum_k f_a(k) * f_b(k)`` — which IS the row count of the inner
equi-join between the two tables on that key.  The estimate never
undershoots (collision cross-terms are non-negative) and overshoots by
at most ``eps * N_a * N_b`` with probability ``1 - delta``; the
*expected* overshoot of a single row is ``N_a * N_b / width``.

Why this matters at 100 TB: join-size estimation is how a planner picks
a strategy BEFORE paying for the join — broadcast the small side,
pre-aggregate, or route through ``skew_join`` when the size blows up on
hot keys.  The whole computation here touches each input once with a
map-side-combined ``groupBy`` whose result is at most ``depth × width``
rows per side (bounded, independent of data size), then joins those two
tiny aggregates.  The join itself is never executed.

Two hash modes, mirroring ``operators/dsir.py``:

* ``hash_fn="md5"`` (default) — bucket = first 8 hex chars of
  md5(depth || key) mod width, bit-equal in ANSI SQL, so the registry
  query is EXACT-checkable against a DuckDB oracle that replays the
  sketch, estimate included;
* ``hash_fn="xxhash64"`` — cheaper JVM hash for production use.

Reference tie-in: the reference library builds a CMS solely to find hot
keys (``Utils.scala:92-122``); this module exercises the OTHER standard
use of the same summary — cardinality forecasting — so the sketch the
skew-join already pays for can also answer "how big will this join be".
The driver-side ``CountMinSketch.inner_product`` (sketch/cms.py) is the
in-memory twin of this relational form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

KEY_SEP = "\x01"


def _bucket(key_col, depth_col, width: int, hash_fn: str):
    key = F.concat_ws(KEY_SEP, depth_col.cast("string"), key_col.cast("string"))
    if hash_fn == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long"),
            F.lit(width),
        )
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(key), F.lit(width))
    raise ValueError(f"hash_fn must be md5|xxhash64, got {hash_fn!r}")


def bucket_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 5,
    width: int = 65536,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-(depth, bucket) frequency table — the relational form of one
    CMS.  Output is at most ``depth × width`` NONZERO cells (bounded by
    the distinct-key count — widening the sketch is free, and width
    should be ≳ the expected distinct keys for a tight estimate).

    The input is reduced to per-key counts FIRST (map-side combined, so
    the shuffle carries ≤ |distinct keys| aggregates, never rows), and
    only the distinct-key table is exploded ×depth and hashed — at
    100M rows over 1M keys that is 5M hashes instead of 500M.  Null
    keys are skipped (they never equi-match)."""
    per_key = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    rows = per_key.select(
        "k", "cnt",
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        rows.select(
            "d", "cnt",
            _bucket(F.col("k"), F.col("d"), width, hash_fn).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("n"))
    )


def join_size_estimate(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    depth: int = 5,
    width: int = 65536,
    hash_fn: str = "md5",
) -> DataFrame:
    """One-row DataFrame ``(est_join_rows)``: the CMS inner-product
    estimate of ``COUNT(*)`` of the inner equi-join — computed without
    executing the join.

    Plan shape: two bounded groupBys (≤ depth×width NONZERO cells each
    — widening the sketch costs nothing beyond the distinct-key count,
    so width should be generous) → an equi-join OF THE CELL TABLES on
    (d, bucket) → per-depth dot product → min.  A self-join estimate
    (same DataFrame and column twice) is detected and built from ONE
    cell table.

    A depth whose cell tables share NO bucket has dot product 0, but
    the inner cell join drops it entirely — so the final aggregate
    checks the surviving depth count: any missing depth means some
    depth's dot is exactly 0, and the min over depths is 0 (this also
    covers fully-disjoint key sets, where the join is empty and a
    bare ``min`` would return NULL)."""
    a = bucket_counts(left, left_on, depth, width, hash_fn)
    if left is right and left_on == right_on:
        per_depth = a.groupBy("d").agg(
            F.sum(F.col("n") * F.col("n")).alias("dot")
        )
    else:
        b = bucket_counts(
            right, right_on, depth, width, hash_fn
        ).withColumnsRenamed({"n": "m"})
        per_depth = (
            a.join(b, ["d", "bucket"])
            .groupBy("d")
            .agg(F.sum(F.col("n") * F.col("m")).alias("dot"))
        )
    return per_depth.agg(
        F.when(F.count(F.lit(1)) == depth, F.min("dot"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("est_join_rows")
    )


def true_join_size(
    left: DataFrame, right: DataFrame, left_on: str, right_on: str
) -> DataFrame:
    """One-row ``(true_join_rows)``: exact inner-equi-join cardinality
    via per-key count products — Σ_k f_a(k)·f_b(k) — still without
    materializing the join (the count join is ≤ |distinct keys| rows)."""
    a = left.where(F.col(left_on).isNotNull()).groupBy(
        F.col(left_on).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    b = right.where(F.col(right_on).isNotNull()).groupBy(
        F.col(right_on).alias("k")
    ).agg(F.count(F.lit(1)).alias("m"))
    return a.join(b, "k").agg(
        F.coalesce(F.sum(F.col("n") * F.col("m")), F.lit(0))
        .cast("long")
        .alias("true_join_rows")
    )


def join_size_report(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    depth: int = 5,
    width: int = 65536,
    hash_fn: str = "md5",
    slack: float = 6.0,
) -> DataFrame:
    """One-row report ``(true_join_rows, est_join_rows, rel_err,
    within_bound)`` pairing the estimate with ground truth.

    ``within_bound`` gates the CMS contract: the estimate never
    undershoots, and overshoot stays within ``slack ×`` the expected
    collision mass ``N_a · N_b / width`` (slack=6 ≈ a generous
    multiple of the expectation; the hard eps·Na·Nb bound is far
    looser).  In production you would skip ``true_join_size`` — it is
    here so the report is self-certifying."""
    est = join_size_estimate(left, right, left_on, right_on, depth, width, hash_fn)
    ka = left.where(F.col(left_on).isNotNull()).groupBy(
        F.col(left_on).alias("k")
    ).agg(F.count(F.lit(1)).alias("n"))
    if left is right and left_on == right_on:
        # self-join: ground truth Σn², Na and Nb all fold out of ONE
        # aggregation over one per-key count table
        sides = ka.agg(
            F.coalesce(F.sum(F.col("n") * F.col("n")), F.lit(0))
            .cast("long")
            .alias("true_join_rows"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("na"),
            F.coalesce(F.sum("n"), F.lit(0)).alias("nb"),
        )
        return sides.crossJoin(est).select(
            "true_join_rows",
            "est_join_rows",
            F.round(
                (F.col("est_join_rows") - F.col("true_join_rows"))
                / F.greatest(F.col("true_join_rows"), F.lit(1)),
                6,
            ).alias("rel_err"),
            (
                (F.col("est_join_rows") >= F.col("true_join_rows"))
                & (
                    F.col("est_join_rows")
                    <= F.col("true_join_rows")
                    + F.lit(slack) * F.col("na") * F.col("nb") / F.lit(width)
                )
            ).alias("within_bound"),
        )
    kb = right.where(F.col(right_on).isNotNull()).groupBy(
        F.col(right_on).alias("k")
    ).agg(F.count(F.lit(1)).alias("m"))
    # ground truth, Na and Nb all fold out of ONE full-outer count
    # join — each per-key aggregate is built exactly once and the
    # whole report stays LAZY (no driver-side count jobs)
    sides = ka.join(kb, "k", "full_outer").agg(
        F.coalesce(F.sum(F.col("n") * F.col("m")), F.lit(0))
        .cast("long")
        .alias("true_join_rows"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("na"),
        F.coalesce(F.sum("m"), F.lit(0)).alias("nb"),
    )
    return sides.crossJoin(est).select(
        "true_join_rows",
        "est_join_rows",
        F.round(
            (F.col("est_join_rows") - F.col("true_join_rows"))
            / F.greatest(F.col("true_join_rows"), F.lit(1)),
            6,
        ).alias("rel_err"),
        (
            (F.col("est_join_rows") >= F.col("true_join_rows"))
            & (
                F.col("est_join_rows")
                <= F.col("true_join_rows")
                + F.lit(slack) * F.col("na") * F.col("nb") / F.lit(width)
            )
        ).alias("within_bound"),
    )
