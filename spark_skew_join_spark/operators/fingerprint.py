"""Document fingerprinting: winnowing over rolling character k-gram hashes.

The winnowing scheme (Schleimer, Wilkerson, Aiken, SIGMOD 2003 — the MOSS
algorithm) selects a guaranteed-coverage subset of a document's k-gram
hashes: in every window of ``w`` consecutive k-gram hashes keep the
minimum. Any shared substring of length >= w + k - 1 between two
documents is then guaranteed to surface as at least one shared
fingerprint, at a density of ~2/(w+1) of all positions — the standard
sublinear sketch for plagiarism / overlap / near-dup detection.

Spark shape (design vs the reference's single-node C-style loop; parity
target only, see /root/reference/README.md:1-27 — the reference library
itself ships no text operators, this module is part of the mandated
LLM-pipeline extension surface):

- k-gram hashes are built by exploding character positions and hashing
  the ``substring(text, pos, k)`` — every expression (``sequence`` /
  ``explode`` / ``substring`` / ``md5`` / ``conv``) is JVM codegen; no
  Python touches the text. The hash is the first 60 bits of md5, which
  DuckDB reproduces bit-for-bit (``CAST('0x' || SUBSTR(MD5(g),1,15) AS
  BIGINT)``), making the whole operator oracle-checkable — fingerprint
  VALUES, not just counts.
- window minima use one bounded-frame window function partitioned by
  doc_id. Per-doc partitions are fine at 100 TB: a "partition" here is
  one document's gram list (documents are KBs–MBs, not TBs), and the
  shuffle key (doc_id) is uniform. There is no corpus-wide skew point.
- the overlap join is an equi-join on the 8-byte fingerprint value.
  Discriminativeness cap: a fingerprint shared by more than
  ``max_docs_per_fp`` documents (boilerplate headers, license blurbs)
  would create a quadratic hot bucket — such fingerprints are dropped
  on BOTH sides before the self-join (deterministic, mirrored in the
  oracle), the same idiom as the dedup family's band_bucket_cap but
  exactly expressible in SQL.

At 100 TB the per-position md5 costs O(k) per character; a true O(1)
Karp-Rabin rolling hash is provided as ``rolling=True`` (vectorized
numpy over Arrow batches). Its hash values differ from the md5 path, so
the winnowed SET differs, but the coverage guarantee is identical —
the md5 path is the oracle-parity formulation, the rolling path is the
compute-optimal one. Both select ~2/(w+1) of positions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["kgram_hashes", "winnow_fingerprints", "fingerprint_overlap_pairs"]

# Karp-Rabin parameters for the rolling path: multiplier chosen odd so it
# is invertible mod 2^61-1; the Mersenne prime keeps reductions cheap.
_KR_BASE = 257
_KR_MOD = (1 << 61) - 1


def kgram_hashes(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    rolling: bool = False,
) -> DataFrame:
    """(id, pos, h): 60-bit hash of the character k-gram at each position.

    Documents shorter than ``k`` characters contribute nothing. ``pos``
    is 1-based. ``rolling=True`` switches to the Karp-Rabin path (same
    output shape, different hash values — see module docstring).
    """
    if rolling:
        return _kgram_hashes_rolling(df, k, text_col, id_col)
    from ..sources.tables import fan_out_narrow

    c = F.col(text_col)
    base = (
        # narrow single-row-group scans would serialize the per-position
        # md5 onto one core (no-op at production partition counts)
        fan_out_narrow(df.where(F.length(c) >= k).select(F.col(id_col), c.alias("__txt")))
        .select(
            id_col,
            F.explode(
                F.sequence(F.lit(1), F.length("__txt") - (k - 1))
            ).alias("pos"),
            "__txt",
        )
    )
    gram = F.substring(F.col("__txt"), F.col("pos"), k)
    h = F.conv(F.substring(F.md5(gram.cast("binary")), 1, 15), 16, 10).cast("bigint")
    return base.select(id_col, "pos", h.alias("h"))


def _kgram_hashes_rolling(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """Karp-Rabin rolling hash, O(1) per position, vectorized per Arrow
    batch with numpy (object-dtype Python ints: values exceed uint64
    mid-multiply; correctness over micro-speed — the batch loop is still
    columnar and the text crosses to Python exactly once)."""
    import numpy as np

    out_schema = f"{id_col} long, pos int, h long"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pow_k = pow(_KR_BASE, k - 1, _KR_MOD)
        for pdf in batches:
            ids, poss, hs = [], [], []
            for doc_id, text in zip(pdf[id_col].values, pdf[text_col].values):
                if text is None or len(text) < k:
                    continue
                cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
                n = len(cp)
                if n < k:
                    continue
                h = 0
                for j in range(k):
                    h = (h * _KR_BASE + int(cp[j])) % _KR_MOD
                vals = [h]
                for j in range(k, n):
                    h = (
                        (h - int(cp[j - k]) * pow_k) * _KR_BASE + int(cp[j])
                    ) % _KR_MOD
                    vals.append(h)
                ids.extend([doc_id] * (n - k + 1))
                poss.extend(range(1, n - k + 2))
                hs.extend(vals)
            yield pd.DataFrame({id_col: ids, "pos": poss, "h": hs})

    cols = df.select(id_col, text_col)
    return cols.mapInPandas(gen, schema=out_schema)


def winnow_fingerprints(
    df: DataFrame,
    k: int = 8,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    rolling: bool = False,
) -> DataFrame:
    """Distinct winnowed fingerprints per document: (id, fp).

    fp is the minimum k-gram hash in each complete window of ``w``
    consecutive positions, de-duplicated per document. Guarantees: any
    substring match of length >= w + k - 1 between two documents yields
    at least one shared fp.
    """
    grams = kgram_hashes(df, k, text_col, id_col, rolling=rolling)
    win = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    n_pos = Window.partitionBy(id_col)
    return (
        grams.withColumn("__wmin", F.min("h").over(win))
        .withColumn("__npos", F.count(F.lit(1)).over(n_pos))
        # only complete windows: a window starting at pos needs w grams
        .where(F.col("pos") <= F.col("__npos") - (w - 1))
        .select(F.col(id_col), F.col("__wmin").alias("fp"))
        .distinct()
    )


def fingerprint_overlap_pairs(
    fps: DataFrame,
    min_shared: int = 2,
    max_docs_per_fp: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Document pairs sharing >= min_shared winnowed fingerprints:
    (id_a, id_b, n_shared), id_a < id_b.

    Fingerprints present in more than ``max_docs_per_fp`` documents are
    dropped before the self-join (non-discriminative boilerplate; also
    the quadratic hot bucket at scale — a fp in d docs yields d^2 join
    rows). The filter is deterministic and mirrored in the SQL oracle.
    """
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("__nd"))
        .where(F.col("__nd") <= max_docs_per_fp)
        .select("fp")
    )
    kept = fps.join(rare, "fp")
    a = kept.select(F.col("fp"), F.col(id_col).alias("id_a"))
    b = kept.select(F.col("fp"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
