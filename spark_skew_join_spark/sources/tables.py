"""Table catalog over the driver-provided parquet layout (TESTDATA.md).

One place that knows the physical layout (``{sf_dir}/{table}.parquet``) and
pins the session settings every query needs for oracle parity:

* ``spark.sql.session.timeZone=UTC`` — Spark timestamps are session-TZ,
  DuckDB's are UTC-naive; without this, every timestamp value-hash differs.
* AQE on (runtime re-plan, built-in skew-join available).

At 100 TB this module is where partition discovery / bucketing metadata
would live; parquet scans already give column pruning + predicate pushdown
for free through the DataSource V2 path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


# Partition-count memo keyed by (session id, analyzed-plan semantic hash):
# ``df.rdd`` forces a full logical->physical->RDD conversion, so probing the
# same scan shape repeatedly (shingles / kgram_hashes hot paths) would pay
# that planning cost on every call. ``semanticHash()`` only needs the
# analyzed plan and is stable across re-constructions of the same query.
_NPARTS_MEMO: dict = {}


def fan_out_narrow(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition a NARROW scan up to the cluster's parallelism.

    The test fixtures are single-row-group parquet files, so every scan
    arrives as ONE partition and any explode-heavy stage (shingling,
    tokenization, md5 fingerprints) serializes onto one core until its
    first exchange — `spark.sql.files.maxPartitionBytes` cannot help
    because splits align to row groups. The guard repartitions only
    when the scan is narrower than ``min_fraction`` of
    defaultParallelism; a production corpus (many files / row groups,
    100 TB) already exceeds it, so this is a no-op at scale and the
    added exchange moves only the narrow input's rows (kilobytes to a
    few MB here).

    Spark Connect has no SparkContext and no ``.rdd``; there we derive
    the target width from ``spark.sql.shuffle.partitions`` and assume
    the input is narrow (one extra exchange on a few MB, never a
    failure)."""
    spark = df.sparkSession
    try:
        par = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no SparkContext — conf-derived width
        par = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    floor = max(2, int(par * min_fraction))
    try:
        key = (id(spark), df.semanticHash())
        nparts = _NPARTS_MEMO.get(key)
        if nparts is None:
            nparts = df.rdd.getNumPartitions()
            if len(_NPARTS_MEMO) < 4096:
                _NPARTS_MEMO[key] = nparts
    except Exception:  # .rdd / semanticHash unsupported (Connect) — assume narrow
        nparts = 1
    if nparts < floor:
        return df.repartition(par)
    return df


def configure(spark: SparkSession) -> SparkSession:
    """Pin runtime confs required for deterministic, oracle-comparable runs.

    Safe on a shared session: only runtime-settable keys."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    # ANSI off, deliberately and measured: Spark 4 defaults true, and the
    # runtime overflow/cast checks it injects into EVERY codegen expression
    # cost 10-50% per arithmetic-heavy line (A/B at r11 HEAD, BASELINE.md
    # "Round 11": warm subset 84.4 s ANSI-on vs 56.6 s off — ~1.26x across
    # the suite). Correctness does not ride the flag: every EXACT entry is
    # hash-checked against DuckDB (which always errors on overflow), and
    # the one operator family with a long-accumulator loud-failure contract
    # (embedding_covariance's micro-unit sums) enforces it IN-PLAN with an
    # ANSI-independent raise_error envelope guard (operators/pca.py), so
    # the contract holds on Spark 3.5 (ANSI default off) and 4.x alike.
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # events.parquet carries timestamp[ns]; Spark rejects TIMESTAMP(NANOS)
    # unless told to surface it as bigint (we convert in load_table)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark


def events_ts_is_long(sf_dir: str) -> bool:
    """True when events.parquet stores ts as raw int64 / nanosecond
    timestamps (surfaced as bigint under nanosAsLong); False for
    microsecond parquet timestamps. Fixture generators have shipped both."""
    import pyarrow.parquet as pq

    t = str(pq.read_schema(os.path.join(sf_dir, "events.parquet")).field("ts").type)
    return t == "int64" or t.startswith("timestamp[ns")


def normalize_events_ts(df: DataFrame, raw_is_long: bool) -> DataFrame:
    """Expose both a session-TZ microsecond ``ts`` timestamp and exact
    integer epoch nanos ``ts_ns`` regardless of the fixture encoding."""
    from pyspark.sql import functions as F

    if raw_is_long:
        # integer `div`, NOT floor(x/1000): epoch nanos exceed 2^53, double
        # division silently loses the low microsecond digit
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    # timestamp[us] parquet loads as TIMESTAMP_NTZ; with the session pinned
    # to UTC the cast preserves the instant DuckDB sees
    return df.withColumn("ts", F.col("ts").cast("timestamp")).withColumn(
        "ts_ns", F.unix_micros(F.col("ts")) * 1000
    )


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df, raw_is_long=dict(df.dtypes)["ts"] == "bigint")
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    configure(spark)
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def get_spark(app_name: str = "spark_skew_join_spark", cpus: int | None = None) -> SparkSession:
    """Local session tuned per the build contract (local[N], shuffle
    partitions ≈ cores, AQE on, Arrow on, UTC)."""
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # keep stdout clean for the driver's JSON tail capture (VERDICT r3 #1)
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        # keep forked Python workers warm across Python-path queries —
        # the default 60 s idle kill makes the NEXT mapInPandas query pay
        # a ~1 s pool re-fork (seen as multimodal_frame_sample noise)
        .config("spark.python.worker.idleTimeoutSeconds", "1800")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    _sweep_stale_spill_dirs(spark)
    return configure(spark)


def _sweep_stale_spill_dirs(spark, max_age_sec: int = 90 * 60) -> None:
    """Remove orphaned ``__sgsj_spill_*`` warehouse directories left by
    KILLED sessions (VERDICT r14 #7/#8): a killed JVM drops nothing,
    and the spill names are process-unique, so orphans accumulate
    forever. Age-based (default 90 min — far beyond any live segment's
    lifetime) so a CONCURRENT process's live spill tables are never
    touched; the current process's own tables are seconds old."""
    import shutil
    import time

    try:
        wh = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).replace("file:", "")
        if not os.path.isdir(wh):
            return
        now = time.time()
        for name in os.listdir(wh):
            if not name.startswith("__sgsj_spill_"):
                continue
            p = os.path.join(wh, name)
            try:
                if now - os.path.getmtime(p) > max_age_sec:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue
    except Exception:  # best-effort hygiene — never block session start
        pass
