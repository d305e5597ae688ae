"""Format round-trip helpers beyond parquet (the reference shipped spark-csv
on its classpath, ``pom.xml:44-48``, though never used in code).

Thin, explicit-schema wrappers: at 100 TB a schema inference pass over CSV
is a full extra scan — always pass the schema. Delta/Iceberg/Hudi jars are
auto-detected at call time: present → the writer runs normally; absent →
a clear NotImplementedError instead of an opaque JVM ClassNotFound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LAKEHOUSE_PROBE_CLASS = {
    "delta": "org.apache.spark.sql.delta.sources.DeltaDataSource",
    "iceberg": "org.apache.iceberg.spark.source.IcebergSource",
    "hudi": "org.apache.hudi.DefaultSource",
}


def lakehouse_available(spark: SparkSession, format: str) -> bool:
    """True when the connector's DataSource class is on the session's
    classpath (jar shipped with the image or added via spark.jars)."""
    cls = _LAKEHOUSE_PROBE_CLASS.get(format)
    if cls is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(cls)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def write_table(df: DataFrame, path: str, format: str = "parquet",
                mode: str = "overwrite", partition_by: list[str] | None = None) -> None:
    if format in _LAKEHOUSE_PROBE_CLASS and not lakehouse_available(
        df.sparkSession, format
    ):
        raise NotImplementedError(
            f"{format} connector jars are not on this session's classpath; "
            "add them via spark.jars.packages or use parquet/csv/json/orc"
        )
    w = df.write.mode(mode).format(format)
    if format == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)


def read_table(spark: SparkSession, path: str, format: str = "parquet",
               schema: StructType | str | None = None) -> DataFrame:
    r = spark.read.format(format)
    if schema is not None:
        r = r.schema(schema)
    elif format in ("csv", "json"):
        raise ValueError(
            f"{format} reads require an explicit schema (inference is a full "
            "extra scan at scale)"
        )
    if format == "csv":
        r = r.option("header", "true")
    return r.load(path)


def list_data_files(spark: SparkSession, path: str, suffix: str = ".parquet"):
    """[(path, bytes)] for the data files under ``path`` (Hadoop FS —
    works for any supported filesystem, not just local)."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = []
    it = fs.listFiles(p, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(suffix):
            out.append((name, int(st.getLen())))
    return out


def compaction_report(files: list, target_bytes: int) -> dict:
    """Pure planning half of compaction: given [(path, bytes)], how many
    output files a size-targeted rewrite produces and the small-file
    pressure it removes.  next-fit by listing order — deterministic."""
    small = [(p, b) for p, b in files if b < target_bytes]
    total = sum(b for _, b in files)
    bins, acc = 0, 0
    for _, b in sorted(files, key=lambda x: (-x[1], x[0])):
        if acc + b > target_bytes and acc > 0:
            bins += 1
            acc = 0
        acc += b
    if acc:
        bins += 1
    return {
        "n_files": len(files),
        "n_small": len(small),
        "total_bytes": total,
        "planned_files": max(bins, 1) if files else 0,
    }


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite a parquet directory into ~``target_bytes`` files — the
    small-files fix every long-running CDC/streaming sink eventually
    needs (thousands of KB-sized files make NameNode/listing and task
    scheduling the bottleneck long before data volume does).

    Shape: plan from the REAL file listing (Hadoop FS, no driver
    guessing), rewrite once with ``repartition(planned_files)``
    (row-preserving, no shuffle key needed — size is the only
    objective), stage into a sibling temp dir and swap.  Returns the
    before/after report.  For partitioned layouts run per partition
    directory; transactional table formats (Delta/Iceberg) ship their
    own OPTIMIZE — this is the plain-parquet equivalent.

    The swap is two renames and therefore NOT atomic (plain parquet
    has no manifest to flip; that is exactly what Delta/Iceberg add):
    a crash between them leaves ``path`` absent with the data intact
    in ``path + "_pre_compact"`` (ADVICE r6 #3).  The window is
    defended on every edge that can be: each rename's return value is
    checked (including the rollback rename — ADVICE r7 #3); a failed
    second rename rolls the backup straight back; a failed post-swap
    validation quarantines the bad rewrite and restores the verified
    original to ``path`` before raising (ADVICE r7 #2); and the backup
    is only deleted after the post-swap re-count of the NEW directory
    succeeds, so there is no moment where the sole surviving copy is
    unverified or an unvalidated copy is left live."""
    import uuid

    files = list_data_files(spark, path)
    plan = compaction_report(files, target_bytes)
    if plan["n_files"] <= plan["planned_files"]:
        return {**plan, "rewritten": False, "n_files_after": plan["n_files"]}
    df = spark.read.parquet(path)
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    old = jvm.org.apache.hadoop.fs.Path(path)
    bak = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "_pre_compact")
    # stale-backup guard FIRST: a leftover _pre_compact must not cost a
    # full rewrite pass before being detected (ADVICE r7 #4)
    if fs.exists(bak):
        raise RuntimeError(
            f"backup dir {bak} already exists (crashed prior compaction?); "
            "recover or remove it before compacting"
        )
    tmp = f"{path.rstrip('/')}_compact_{uuid.uuid4().hex[:8]}"
    df.repartition(plan["planned_files"]).write.mode("overwrite").parquet(tmp)
    # verify BEFORE the swap: the rewrite must carry every row
    n_before = df.count()
    n_after = spark.read.parquet(tmp).count()
    if n_after != n_before:
        raise RuntimeError(
            f"compaction rewrite lost rows ({n_before} -> {n_after}); "
            f"staging left at {tmp}"
        )
    if not fs.rename(old, bak):
        raise RuntimeError(
            f"compaction swap: rename {path} -> {bak} failed; "
            f"staging left at {tmp}"
        )
    if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), old):
        # roll the original straight back — nothing was lost — and
        # CHECK that rollback too (ADVICE r7 #3): a failed rollback must
        # not claim 'original restored' while path is absent
        if not fs.rename(bak, old):
            raise RuntimeError(
                f"compaction swap: rename {tmp} -> {path} failed AND the "
                f"rollback {bak} -> {path} failed; {path} is ABSENT, data "
                f"intact at {bak} (and staging at {tmp}) — restore manually"
            )
        raise RuntimeError(
            f"compaction swap: rename {tmp} -> {path} failed; original restored"
        )
    # validate the swapped-in directory BEFORE dropping the only backup
    n_swapped = spark.read.parquet(path).count()
    if n_swapped != n_before:
        # swap the verified original back so readers of `path` never
        # serve unvalidated data (ADVICE r7 #2): set the bad dir aside,
        # restore bak -> path, then raise
        quarantine = jvm.org.apache.hadoop.fs.Path(
            f"{path.rstrip('/')}_compact_invalid_{uuid.uuid4().hex[:8]}"
        )
        if not fs.rename(old, quarantine):
            raise RuntimeError(
                f"post-swap validation failed ({n_before} -> {n_swapped}) "
                f"and quarantining the bad dir failed; UNVALIDATED data is "
                f"live at {path}, verified backup at {bak} — restore manually"
            )
        if not fs.rename(bak, old):
            raise RuntimeError(
                f"post-swap validation failed ({n_before} -> {n_swapped}); "
                f"bad dir moved to {quarantine} but restoring {bak} -> "
                f"{path} failed; {path} is ABSENT — restore manually"
            )
        raise RuntimeError(
            f"post-swap validation failed ({n_before} -> {n_swapped}); "
            f"verified original restored at {path}, bad rewrite kept at "
            f"{quarantine}"
        )
    fs.delete(bak, True)
    after = list_data_files(spark, path)
    return {
        **plan,
        "rewritten": True,
        "n_files_after": len(after),
    }
