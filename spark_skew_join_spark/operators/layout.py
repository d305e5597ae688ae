"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

Lakehouse table maintenance at 100 TB lives or dies on scan pruning:
min/max file statistics only prune when the data is clustered on the
filter columns. A linear sort clusters ONE column; Z-ordering
interleaves the bits of several, so files become axis-aligned
hyper-rectangles and predicates on ANY of the interleaved columns prune
(the technique behind Delta/Iceberg OPTIMIZE ZORDER BY).

Spark shape: the z-value is a pure codegen expression (two rank
normalizations + 2·bits shift/mask/or terms — no UDF, no Python), so
``df.repartitionByRange(n, zvalue).sortWithinPartitions(zvalue)
.write...`` lays files out in z-order with one range shuffle, exactly
like a plain sort-write. Rank normalization (percent_rank quantized to
2^bits buckets) makes the interleave robust to arbitrary column
distributions; for write paths where an extra window pass is unwanted,
``zvalue_fixed`` interleaves pre-quantized ints directly.

The bit arithmetic is engine-portable (shifts/and/or on BIGINT), so the
clustering keys and the per-bucket locality statistics are
oracle-checked against DuckDB bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["zvalue_fixed", "zorder_key", "zorder_bucket_stats"]


def zvalue_fixed(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of pre-quantized non-negative ints (each assumed
    < 2^bits): bit i of column j lands at output bit i*ncols + j. Pure
    shift/mask/or codegen — 2·bits·ncols terms."""
    ncols = len(cols)
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        cl = c.cast("bigint")
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * ncols + j)
            )
    return z


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 16, out_col: str = "zval"
) -> DataFrame:
    """Adds a rank-normalized z-order clustering key over ``cols``.

    Each column is mapped to [0, 2^bits) by percent_rank (distribution-
    free — equal-width quantization collapses under skew), then Morton-
    interleaved. The window runs per column with no partition key; at
    cluster scale substitute a sampled-quantile map (approxQuantile) for
    the exact rank — the interleave itself is unchanged.
    """
    quantized = []
    tmp = df
    for i, c in enumerate(cols):
        w = Window.orderBy(F.col(c))
        q = F.least(
            F.floor(F.percent_rank().over(w) * (1 << bits)).cast("bigint"),
            F.lit((1 << bits) - 1),
        )
        tmp = tmp.withColumn(f"__zq{i}", q)
    z = zvalue_fixed([F.col(f"__zq{i}") for i in range(len(cols))], bits)
    return tmp.withColumn(out_col, z).drop(*[f"__zq{i}" for i in range(len(cols))])


def zorder_bucket_stats(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bucket_bits: int = 5,
) -> DataFrame:
    """Locality evidence for a z-order layout: bucket rows by the top
    ``bucket_bits`` of the z-value (= the file a sorted write would put
    them in) and report per-bucket min/max of each interleaved column —
    the exact statistics a lakehouse reader would prune on. Narrow
    per-bucket ranges on EVERY column is the z-order win; a plain sort
    gives narrow ranges on the leading column only."""
    total_bits = bits * len(cols)
    keyed = zorder_key(df, cols, bits)
    bucket = F.shiftright(F.col("zval"), total_bits - bucket_bits).cast("int")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        keyed.groupBy(bucket.alias("bucket"))
        .agg(*aggs)
    )
