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


# Passing a column NAME (str) instead of a Column builds the whole
# unrolled chain as ONE SQL string handed to F.expr — a single py4j
# round-trip instead of ~6/dim (at dim=64 the Column route costs ~380
# py4j calls per dot; semdedup's plan construction spent 3+ s in that
# chatter). The parser yields the identical left-associated tree (SQL
# `+` is left-associative, `*` binds tighter), so values and the DuckDB
# bit-parity are unchanged.


def _elem_sql(name: str, i: int) -> str:
    return f"CAST(`{name}`[{i}] AS DOUBLE)"


def _dot_sql(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"{_elem_sql(a, i)} * {_elem_sql(b, i)}" for i in range(dim)
    )


def dot_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b, dim))
    e = _elem(a, 0) * _elem(b, 0)
    for i in range(1, dim):
        e = e + _elem(a, i) * _elem(b, i)
    return e


def cosine_fixed(a: Column | str, b: Column | str, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        d = _dot_sql(a, b, dim)
        na = f"SQRT({_dot_sql(a, a, dim)})"
        nb = f"SQRT({_dot_sql(b, b, dim)})"
        return F.expr(
            f"CASE WHEN ({na} = 0.0D) OR ({nb} = 0.0D) THEN 0.0D "
            f"ELSE ({d}) / ({na} * {nb}) END"
        )
    d = dot_fixed(a, b, dim)
    na = F.sqrt(dot_fixed(a, a, dim))
    nb = F.sqrt(dot_fixed(b, b, dim))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(d / (na * nb))


def dot_literal(a: Column | str, weights: list[float]) -> Column:
    """Unrolled sequential dot product against a Python-literal vector
    (LSH hyperplane projections). repr() round-trips Python floats
    exactly, so the string-cast literals are bit-equal to F.lit."""
    if isinstance(a, str):
        return F.expr(" + ".join(
            f"{_elem_sql(a, i)} * CAST('{w!r}' AS DOUBLE)"
            for i, w in enumerate(weights)
        ))
    e = _elem(a, 0) * F.lit(weights[0])
    for i in range(1, len(weights)):
        e = e + _elem(a, i) * F.lit(weights[i])
    return e
