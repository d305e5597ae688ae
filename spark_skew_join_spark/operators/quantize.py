"""Symmetric int8 embedding quantization with reconstruction-error audit.

At 100 TB an `array<float>` embedding store is the single largest
column; symmetric per-vector int8 codes (scale = max|x|/127) cut it 4×
and are what IVF/HNSW serving stacks ingest.  This operator emits the
quantization parameters + audit metrics as a pure projection; the codes
themselves are a `transform()` away using the same expressions.

Determinism: every step is IEEE-exact and engine-identical — float →
double cast, max, x/scale, floor(·+0.5) (round-half-up without the
engine-specific ROUND tie rules), code*scale — so the audit
hash-matches the DuckDB oracle bit-for-bit, unrounded.

Scale notes: one pass over the store, no shuffle, no Python.  The
expressions use higher-order functions (interpreted, outside
whole-stage codegen) — fine for a one-pass store rewrite; for a hot
O(pairs) path unroll per dimension like functions/vectors.py does for
dot products.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.vectors import to_double_array


def _scale(v: Column) -> Column:
    return F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)


def _code(x: Column, scale: Column) -> Column:
    # round-half-up via floor(x/scale + 0.5): identical in Spark and
    # DuckDB, unlike ROUND() whose tie behavior is engine-specific
    return F.floor(x / scale + F.lit(0.5))


def quantize_audit(emb: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id_col, n_dims, scale, code_sum, max_abs_err): per-vector int8
    quantization parameters, code checksum, and worst-dimension
    reconstruction error.  Zero vectors quantize to all-zero codes with
    scale 0 (guarded, no division)."""
    v = to_double_array(vec_col)
    s = _scale(v)
    codes = F.when(s == 0, F.transform(v, lambda x: F.lit(0).cast("bigint"))
                   ).otherwise(F.transform(v, lambda x: _code(x, s)))
    errs = F.when(
        s == 0, F.transform(v, lambda x: F.lit(0.0))
    ).otherwise(F.transform(v, lambda x: F.abs(x - _code(x, s) * s)))
    return emb.select(
        F.col(id_col),
        F.size(vec_col).alias("n_dims"),
        s.alias("scale"),
        F.aggregate(
            codes, F.lit(0).cast("bigint"), lambda acc, c: acc + c
        ).alias("code_sum"),
        F.array_max(errs).alias("max_abs_err"),
    )
