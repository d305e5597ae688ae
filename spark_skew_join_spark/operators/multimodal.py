"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern (per the build contract): media travels as a ``binary`` column next
to a metadata struct; decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages so bytes never round-trip
through Python row-at-a-time. The actual codec step is STUBBED — the
image/audio libraries are not in this container — behind
``decoder="stub"`` (deterministic fake features derived from the bytes) or
``decoder="pil"``/``"librosa"`` which raise NotImplementedError with a clear
message. Everything Spark-side (schema, batching, partitioning, UDF
signatures) is real and tested.

Scale: mapInPandas streams Arrow batches; per-batch memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Media blobs are the widest
column by far — select them late (column pruning keeps scans metadata-only
until the decode stage).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),       # image/video
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio
        T.StructField("duration_ms", T.LongType()),     # audio/video
    ]
)


def attach_binary(
    df: DataFrame, source_col: str, media_type: str = "image", mime: str = "application/octet-stream"
) -> DataFrame:
    """Demo wrapper: promote a string column to (content binary, meta struct).

    Real pipelines get binary from ``spark.read.format("binaryFile")`` or a
    parquet binary column; this adapter exists so the plumbing is exercisable
    on the text fixtures."""
    return df.withColumn("content", F.encode(F.col(source_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _stub_decode(content: bytes) -> list[float]:
    """Deterministic fake feature vector: FEATURE_DIM floats derived from a
    sha256 of the bytes. Stands in for a real image/audio decoder."""
    h = hashlib.sha256(content).digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Arrow-batched decode + feature extraction over a binary column.

    decoder="stub" → deterministic sha-derived features (tested);
    decoder="pil"/"librosa" → NotImplementedError (libs not in container).
    """
    if decoder not in ("stub", "pil", "librosa"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r} requires media libraries not present in "
            "this container; the Spark plumbing is identical to decoder='stub'"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            feats = pdf[content_col].map(lambda b: _stub_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "byte_len": pdf[content_col].map(len).astype("int32"),
                    "content_sha": pdf[content_col].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "features": feats,
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Arrow-batched image resize over a binary column (1 row in → 1 row
    out, new payload + target dimensions).

    decoder="stub" emits a deterministic 16-byte md5 payload of
    ``r{w}x{h}:`` + content (a real decoder would decode→resample→encode in
    the same batch loop); "pil" raises until the library ships. The
    Spark-side shape — late blob selection, Arrow batch streaming, binary
    output column — is the production plumbing."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r} requires media libraries not present in "
            "this container; the Spark plumbing is identical to decoder='stub'"
        )

    prefix = f"r{width}x{height}:".encode()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": width,
                    "height": height,
                    "resized": pdf[content_col].map(
                        lambda b: hashlib.md5(prefix + bytes(b)).digest()
                    ),
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 100,
    max_frames: int = 8,
    id_col: str = "doc_id",
    content_col: str = "content",
    decoder: str = "stub",
) -> DataFrame:
    """Video frame sampling: 1 row in → up to ``max_frames`` rows out, one
    per sampled timestamp (the explode-shaped mapInPandas stage).

    decoder="stub": duration_ms := byte_len (1 byte ≈ 1 ms) and each frame
    is the 16-byte md5 of ``f{idx}:`` + content — deterministic, so the
    whole fan-out is oracle-checkable; a real decoder would seek+decode at
    ts_ms inside the same loop. Frame count = min(max_frames,
    ceil(duration/every_ms)), at least 1 for non-empty payloads."""
    if decoder != "stub":
        raise NotImplementedError(
            f"decoder={decoder!r} requires media libraries not present in "
            "this container; the Spark plumbing is identical to decoder='stub'"
        )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out_id, out_idx, out_ts, out_frame = [], [], [], []
            for did, b in zip(pdf[id_col], pdf[content_col]):
                content = bytes(b)
                dur = len(content)
                n = min(max_frames, max(1, -(-dur // every_ms))) if dur else 0
                for i in range(n):
                    out_id.append(did)
                    out_idx.append(i)
                    out_ts.append(i * every_ms)
                    out_frame.append(
                        hashlib.md5(f"f{i}:".encode() + content).digest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_id, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "ts_ms": pd.Series(out_ts, dtype="int64"),
                    "frame": out_frame,
                }
            )

    return df.select(id_col, content_col).mapInPandas(batches, FRAMES_SCHEMA)
