"""int8 quantization audit: hand-checked codes, zero-vector guard."""

from __future__ import annotations

import math

from spark_skew_join_spark.operators.quantize import quantize_audit


def _run(spark, rows):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {r.vec_id: r for r in quantize_audit(df).collect()}


def test_quantize_hand_checked(spark):
    out = _run(spark, [(1, [1.0, -0.5, 0.25, 0.0])])
    r = out[1]
    scale = 1.0 / 127.0
    assert r.n_dims == 4
    assert abs(r.scale - scale) < 1e-15
    # codes: 127, floor(-63.5+0.5)=-63, floor(31.75+0.5)=32, 0 → sum 96
    assert r.code_sum == 127 - 63 + 32 + 0
    # worst err: dim 2 reconstructs 32*scale = 0.2519... vs 0.25
    worst = max(
        abs(1.0 - 127 * scale),
        abs(-0.5 - (-63) * scale),
        abs(0.25 - 32 * scale),
        0.0,
    )
    assert abs(r.max_abs_err - worst) < 1e-15
    # int8 error bound: half a quantization step
    assert r.max_abs_err <= scale / 2 + 1e-15


def test_quantize_zero_vector_guard(spark):
    out = _run(spark, [(1, [0.0, 0.0, 0.0])])
    r = out[1]
    assert (r.scale, r.code_sum, r.max_abs_err) == (0.0, 0, 0.0)


def test_quantize_error_bound_random(spark):
    import random

    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-2, 2) for _ in range(16)]) for i in range(50)
    ]
    out = _run(spark, rows)
    for i, _vec in rows:
        r = out[i]
        assert r.max_abs_err <= r.scale / 2 + 1e-12
        assert not math.isnan(r.max_abs_err)
