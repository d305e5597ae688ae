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
