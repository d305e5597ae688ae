"""Streaming sinks: idempotent (effectively exactly-once) parquet output via
foreachBatch.

Structured Streaming guarantees at-least-once delivery to foreachBatch; the
same epoch can be re-delivered after a failure. Writing each micro-batch to
its own ``epoch=<id>`` directory with mode=overwrite makes redelivery
idempotent — the retried epoch replaces itself instead of duplicating —
which upgrades the pipeline to effectively-exactly-once without a
transactional table format. (With Delta/Iceberg jars you'd use ``txnVersion``
/ MERGE instead; those are absent from this image.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def write_stream_idempotent(stream_df: DataFrame, path: str, query_name: str):
    """Start a foreachBatch parquet writer with per-epoch overwrite
    directories. Returns the StreamingQuery (caller stops it)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            os.path.join(path, f"epoch={epoch_id}")
        )

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(write_epoch)
        .queryName(query_name)
        .start()
    )
