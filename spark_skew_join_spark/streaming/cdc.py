"""Streaming CDC upsert sink: MERGE each micro-batch into a keyed
parquet table (the Delta-style ``MERGE INTO`` streaming sink, expressed
on plain parquet).

Each micro-batch is first collapsed to one row per key (latest by a
caller-named sequence column — within-batch CDC ordering), then merged
into the current table state with ``operators/merge.py::merge_upsert``
and written as a NEW version directory ``v=<epoch>``; a ``_LATEST``
pointer file flips last.  Versioned copy-on-write gives the two
properties a non-transactional format can still have:

* **redelivery-idempotent** — a retried epoch writes a FRESH
  attempt-suffixed directory (``v=<epoch>.<attempt>``) with the same
  content and re-flips the pointer (upserts are idempotent given
  per-key latest-wins collapse); the previously-pointed directory is
  never written in place, so a reader resolving the pointer mid-retry
  still sees a complete snapshot;
* **readers never see a torn table** — they resolve ``_LATEST`` and read
  an immutable snapshot.

Scale notes: this is copy-on-write of the whole table per epoch — the
right shape when epochs are minutes and the keyed state is a dimension-
sized table (the classic streaming-dim use).  A fact-sized target needs
a transactional format's file-level MERGE (Delta/Iceberg — jars absent
from this image; sources/io.py autodetects them for the batch writers).
Old versions are pruned, keeping the last ``keep_versions``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window, functions as F

_LATEST = "_LATEST"


def _snapshot_dirs(path: str) -> list[tuple[int, int, str]]:
    """All snapshot directories as (epoch, attempt, dirname), oldest
    first. ``v=<epoch>`` is attempt 0; a redelivered epoch writes
    ``v=<epoch>.<attempt>`` so the previously-pointed directory is never
    rewritten in place."""
    if not os.path.isdir(path):
        return []
    out = []
    for d in os.listdir(path):
        if not d.startswith("v="):
            continue
        epoch, _, attempt = d[2:].partition(".")
        out.append((int(epoch), int(attempt) if attempt else 0, d))
    return sorted(out)


def list_versions(path: str) -> list[int]:
    """Retained snapshot epochs, oldest first (attempts collapsed)."""
    return sorted({e for e, _, _ in _snapshot_dirs(path)})


def read_upsert_table(spark, path: str,
                      version: int | None = None) -> DataFrame | None:
    """Snapshot read: the ``_LATEST`` pointer by default, or a retained
    historical epoch via ``version`` (time travel across the
    ``keep_versions`` window). Returns None before the first commit;
    raises for a pruned/unknown version."""
    if version is not None:
        dirs = [d for e, _, d in _snapshot_dirs(path) if e == version]
        if not dirs:
            raise ValueError(
                f"version {version} not retained; have {list_versions(path)}"
            )
        # highest attempt = the directory the pointer was last flipped to
        return spark.read.parquet(os.path.join(path, dirs[-1]))
    marker = os.path.join(path, _LATEST)
    if not os.path.exists(marker):
        return None
    with open(marker) as f:
        pointed = f.read().strip()
    return spark.read.parquet(os.path.join(path, pointed))


def _prune_versions(path: str, keep_versions: int) -> None:
    """Prune by DISTINCT EPOCH, never by directory count: a
    crash-looping epoch writes one attempt dir per retry, and if
    attempts counted toward the window, keep_versions retries of one
    epoch would evict every predecessor — the next retry would then
    find no prior version and silently rebuild from just the batch
    rows. Keeping the newest ``keep_versions`` EPOCHS (all their
    attempt dirs) preserves the invariant that a retried epoch's
    predecessor always survives pruning (ADVICE r5 #1)."""
    snaps = _snapshot_dirs(path)
    keep_epochs = set(sorted({e for e, _, _ in snaps})[-keep_versions:])
    for epoch, _, stale in snaps:
        if epoch not in keep_epochs:
            shutil.rmtree(os.path.join(path, stale), ignore_errors=True)


def upsert_stream(stream_df: DataFrame, path: str, key_cols: list[str],
                  seq_col: str, query_name: str, keep_versions: int = 3):
    """Start the CDC upsert sink; returns the StreamingQuery (caller
    stops it). ``seq_col`` orders changes within a batch (latest wins).
    ``keep_versions`` is floored at 2: a retried epoch rebuilds from its
    predecessor version, which must therefore survive pruning."""
    keep_versions = max(keep_versions, 2)

    def apply_batch(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # resolve state from the newest version STRICTLY BELOW this epoch,
        # not the _LATEST pointer: on redelivery (crash between the flip
        # and the checkpoint commit) the pointer already names v=<epoch>,
        # and reading that directory while overwriting it would fail or
        # corrupt — the retried epoch must rebuild from its predecessor
        prior = [v for v in list_versions(path) if v < epoch_id]
        current = (
            read_upsert_table(spark, path, version=max(prior))
            if prior
            else None
        )
        combined = (
            batch_df if current is None else current.unionByName(batch_df)
        )
        # seq-aware last-wins across batches: unlike a blind MERGE
        # (merge_upsert — correct for strictly in-order feeds), keeping
        # the max-seq row per key is order-insensitive, so late or
        # re-delivered batches can never roll a key backwards
        w = Window.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
        merged = (
            combined.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        # never rewrite a directory _LATEST may already point to: on
        # redelivery the epoch's attempt-0 dir exists (and is likely
        # pointed), so write a fresh attempt-suffixed sibling and flip
        # the pointer only after the write completes
        attempts = [a for e, a, _ in _snapshot_dirs(path) if e == epoch_id]
        attempt = max(attempts) + 1 if attempts else 0
        vdir = f"v={epoch_id}" if attempt == 0 else f"v={epoch_id}.{attempt}"
        merged.write.mode("overwrite").parquet(os.path.join(path, vdir))
        tmp = os.path.join(path, _LATEST + ".tmp")
        with open(tmp, "w") as f:
            f.write(vdir)
        os.replace(tmp, os.path.join(path, _LATEST))  # atomic flip
        _prune_versions(path, keep_versions)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(apply_batch)
        .queryName(query_name)
        .start()
    )
