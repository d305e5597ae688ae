"""Vector column functions over array<float> embeddings.

JVM-side expressions (``zip_with`` + ``aggregate``) — no Python UDF, so the
dot product runs inside codegen and scales linearly with corpus size. The
accumulation is sequential left-to-right over array positions, which the SQL
oracle mirrors (list_transform + list_sum in DuckDB) so double results are
bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-sum dot product of two equal-length double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (guarded, no NaN)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


# -- fixed-dimension unrolled variants ------------------------------------
# Spark's higher-order functions (transform/zip_with/aggregate) run
# INTERPRETED, outside whole-stage codegen — on an O(pairs) similarity scan
# they dominate wall-clock. When the dimension is known, unroll the dot
# product into a left-associated add chain over getItem()s: identical
# values in the identical sequential order (bit-parity with the DuckDB
# list_sum oracle is preserved), but fully codegen-able. Inputs are the RAW
# float-array columns (each element is cast individually — wrapping the
# array in transform() first would re-evaluate the lambda per access).


def _elem(c: Column, i: int) -> Column:
    return c.getItem(i).cast("double")


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    e = _elem(a, 0) * _elem(b, 0)
    for i in range(1, dim):
        e = e + _elem(a, i) * _elem(b, i)
    return e


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    d = dot_fixed(a, b, dim)
    na = F.sqrt(dot_fixed(a, a, dim))
    nb = F.sqrt(dot_fixed(b, b, dim))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def dot_literal(a: Column, weights: list[float]) -> Column:
    """Unrolled sequential dot product against a Python-literal vector
    (LSH hyperplane projections)."""
    e = _elem(a, 0) * F.lit(weights[0])
    for i in range(1, len(weights)):
        e = e + _elem(a, i) * F.lit(weights[i])
    return e
