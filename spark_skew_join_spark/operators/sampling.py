"""Sampling and dataset-splitting operators for training-data pipelines.

``hash_split`` assigns each row to a split deterministically from the md5 of
its id — reproducible across runs, engines, and cluster layouts (unlike
``df.sample``/``randomSplit``, whose assignment depends on partitioning).
md5 hex compares identically in Spark and DuckDB (digits sort before
letters in both), so splits are oracle-checkable.

``stratified_sample`` wraps ``sampleBy`` (per-stratum fractions) for
quota-balancing a corpus by language/source.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _hex_prefix(id_col: str | Column) -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.substring(F.md5(c.cast("string").cast("binary")), 1, 2)


def split_bucket(id_col: str | Column) -> Column:
    """Deterministic bucket in [0, 256): first md5 byte of the id."""
    return F.conv(_hex_prefix(id_col), 16, 10).cast("int").alias("bucket")


def hash_split(
    df: DataFrame, id_col: str, train_pct: int = 80, label_col: str = "split"
) -> DataFrame:
    """Add a 'train'/'test' column: row is train iff its first md5 hex byte
    is below ``(256*train_pct)//100`` (80% → 204/256 ≈ 79.7% expected).

    Implemented as a lexicographic compare of the two lowercase hex chars
    against the threshold byte's hex form — identical semantics in any
    engine with md5 (the SQL oracle uses the same expression verbatim)."""
    threshold = (256 * train_pct) // 100
    if threshold >= 256:  # 2-char hex compare breaks beyond 'ff' — clamp
        cond = F.lit(True)
    elif threshold <= 0:
        cond = F.lit(False)
    else:
        cond = _hex_prefix(id_col) < format(threshold, "02x")
    return df.withColumn(
        label_col, F.when(cond, F.lit("train")).otherwise(F.lit("test"))
    )


def cluster_aware_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
    rep_col: str = "cluster_rep",
    train_pct: int = 80,
    label_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/test split: hash the CLUSTER REPRESENTATIVE,
    not the row's own id, so every member of a near-dup cluster lands in
    the same split and no near-duplicate pair straddles train/test (the
    contamination a plain per-doc ``hash_split`` permits — a test doc
    whose near-dup sits in train leaks the answer).

    ``clusters`` is an (id_col, rep_col) map — e.g. the output of
    cluster.connected_components over MinHash-LSH pairs.  Rows absent
    from ``clusters`` (or with NULL rep) are singletons and hash their
    own id, which agrees with CC's rep-of-singleton = self convention.
    Same md5 hex-byte threshold as ``hash_split``, so the assignment is
    engine-reproducible and oracle-checkable.

    Scale: one equi-join on the id (broadcast when the cluster map is
    small; near-dup maps are ≪ corpus because most docs are singletons
    — pass only the non-singleton rows) plus a codegen hash compare.
    """
    threshold = (256 * train_pct) // 100
    joined = df.join(
        clusters.select(
            F.col(id_col).alias(id_col), F.col(rep_col).alias("__rep")
        ),
        on=id_col,
        how="left",
    )
    rep = F.coalesce(F.col("__rep"), F.col(id_col))
    if threshold >= 256:
        cond = F.lit(True)
    elif threshold <= 0:
        cond = F.lit(False)
    else:
        cond = _hex_prefix(rep) < format(threshold, "02x")
    return joined.withColumn(
        label_col, F.when(cond, F.lit("train")).otherwise(F.lit("test"))
    ).drop("__rep")


def stratified_sample(
    df: DataFrame, stratum_col: str, fractions: dict, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sampling (quota balancing by language/source)."""
    return df.sampleBy(stratum_col, fractions=fractions, seed=seed)


def quota_sample(
    df: DataFrame, group_col: str, id_col: str, cap: int
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically by
    md5-hash rank (ties broken by id) — the crawl-pipeline "cap documents
    per domain/source" step. Hash-ranking makes the kept set stable across
    runs, engines, and partitionings (a LIMIT or row_number over an
    unordered window would not be), and is an unbiased uniform draw within
    each group.

    Scale: one shuffle keyed by the group column. A pathologically hot
    group concentrates its window on one task — for those, pre-filter with
    an (approximate) per-group hash-quantile threshold first so the window
    only ranks ~cap survivors; the skew machinery in ``skew_agg`` shows
    the same two-phase pattern."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def shard_id(id_col: str | Column, n_shards: int = 16) -> Column:
    """Deterministic export shard in [0, n_shards) from the id's first md5
    byte — layout-independent (unlike spark_partition_id), so the same row
    lands in the same shard on any cluster, any engine. n_shards ≤ 256;
    powers of two divide the 256 byte values evenly."""
    if not 1 <= n_shards <= 256:
        raise ValueError("n_shards must be in [1, 256] (one md5 byte of entropy)")
    return F.pmod(split_bucket(id_col), F.lit(n_shards)).cast("int")


def write_sharded(
    df: DataFrame, path: str, id_col: str, n_shards: int = 16
) -> None:
    """Training-data export: one directory per deterministic shard.

    ``repartition(n_shards, shard)`` co-locates each shard into one task so
    every shard directory holds one file — the layout training loaders want
    (seekable, shard-parallel). At 100 TB raise n_shards until shard size
    fits the loader; assignment stays stable because it derives from ids,
    not from Spark partitioning."""
    out = df.withColumn("shard", shard_id(id_col, n_shards))
    out.repartition(n_shards, "shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    group_col: str | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep the
    ``k`` rows (per group, if ``group_col``) winning an exponential
    race keyed by the row id (Efraimidis & Spirakis 2006, "Weighted
    random sampling with a reservoir").

    Each row draws e_i = −ln(u_i) / w_i with u_i uniform in (0, 1);
    the k smallest e_i are EXACTLY a weighted sample without
    replacement.  u_i comes from the row's md5 (first 8 hex digits →
    integer → (v+1)/(2^32+1)), the repo's standing engine-portable
    hash idiom — so the selected set is stable across runs, engines,
    and partitionings, and a SQL oracle reproduces it bit-for-bit.
    Rows with weight <= 0 never qualify.

    Scale: a single shuffle keyed by the group column and a top-k
    window per group (or a global ``orderBy ... limit k`` when
    ungrouped — bounded output, the sort is over k survivors per
    partition thanks to Spark's TakeOrdered).  Zero Python, no
    driver-side randomness — the "sample 100k docs per source by
    quality weight" step of a training-mix pipeline at any scale.

    Output: input columns + ``es_key`` (the race variable, kept so
    downstream re-draws can compose / audit)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    u = (v + F.lit(1)).cast("double") / F.lit(4294967297.0)
    es = -F.log(u) / F.col(weight_col).cast("double")
    out = df.where(F.col(weight_col) > 0).withColumn("es_key", es)
    if group_col is None:
        return out.orderBy("es_key").limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy("es_key", id_col)
    return (
        out.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    budget: float,
    weight_col: str,
    order_col: str,
    id_col: str = "doc_id",
    n_buckets: int = 256,
) -> DataFrame:
    """Take rows in (``order_col`` DESC, ``id_col`` ASC) order until the
    cumulative ``weight_col`` reaches ``budget`` — "fill a 1T-token
    training budget from the highest-quality documents down", the
    selection step every curated pretraining mix ends with.  A row is
    included iff the total weight STRICTLY BEFORE it is < budget (so
    the budget-crossing row is included and the cut is deterministic).

    Scale shape — the naive form is a global-order cumulative window,
    which in Spark means ALL rows on one partition; this implementation
    never builds a global order.  Rows bucket by ``n_buckets``
    equal-width ranges of ``order_col`` (range buckets are
    order-consistent: every row of a higher bucket precedes every row
    of a lower one), per-bucket weight totals cumulate on the driver
    (n_buckets rows), whole buckets before the crossing are taken
    as-is, buckets after are dropped unscanned, and ONLY the boundary
    bucket runs a cumulative window — partitioned by bucket, so ~1/256
    of the data sorts, not the corpus.  Degenerate case (all order
    values equal → one bucket) degrades to the global window; pick
    n_buckets ≥ the quality score's resolution.

    Output: the selected rows (original columns), plus
    ``__cum_before`` — the EXACT total weight preceding the row in the
    global order (bucket offset from the driver cumulative + an
    in-bucket window), so the cut is fully auditable and
    SQL-replayable.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    base = df.where(
        F.col(weight_col).isNotNull() & F.col(order_col).isNotNull()
    )
    stats = base.agg(
        F.min(order_col).alias("mn"), F.max(order_col).alias("mx")
    ).collect()[0]
    mn, mx = stats["mn"], stats["mx"]
    if mn is None:
        return base.withColumn("__cum_before", F.lit(0.0)).limit(0)
    # bucket 0 = highest order values (first in the take order)
    if mx > mn:
        width = (mx - mn) / n_buckets
        bucket = F.least(
            F.greatest(
                F.floor((F.lit(mx) - F.col(order_col)) / F.lit(width))
                .cast("int"),
                F.lit(0),
            ),
            F.lit(n_buckets - 1),
        )
    else:
        bucket = F.lit(0)
    b = base.withColumn("__b", bucket)
    totals = {
        r["__b"]: r["w"]
        for r in b.groupBy("__b")
        .agg(F.sum(F.col(weight_col).cast("double")).alias("w"))
        .collect()
    }
    # driver-side cumulative over the (tiny) bucket totals: buckets
    # fully inside the budget + the boundary bucket are scanned, later
    # buckets are dropped without a read; every selected bucket knows
    # the exact weight preceding it (its offset)
    cum = 0.0
    offsets = []  # (bucket, weight_before_bucket)
    for i in range(n_buckets):
        w = totals.get(i)
        if w is None:
            continue
        offsets.append((i, cum))
        cum += w
        if cum >= budget:
            break
    if not offsets:
        return base.withColumn("__cum_before", F.lit(0.0)).limit(0)
    off = F.broadcast(
        df.sparkSession.createDataFrame(
            offsets, "__b int, __off double"
        )
    )
    wspec = (
        Window.partitionBy("__b")
        .orderBy(F.col(order_col).desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(off, "__b")  # inner join drops post-boundary buckets
        .withColumn(
            "__cum_before",
            F.col("__off")
            + F.coalesce(
                F.sum(F.col(weight_col).cast("double")).over(wspec),
                F.lit(0.0),
            ),
        )
        .where(F.col("__cum_before") < F.lit(float(budget)))
        .drop("__b", "__off")
    )
