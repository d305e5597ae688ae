"""Spark Connect compatibility gate (VERDICT r11 #6).

The static inventory test pins every classic-session escape
(.rdd / _jvm / _jdf / _jsc / sparkContext) to the documented matrix in
spark_skew_join_spark/connect_compat.py — new Connect-incompatible code
fails the suite until it is classified. The live smoke test drives the
package under a real Connect session when grpcio is available (not in
this sandbox — Spark ships the connect jars but not the Python client
deps, so it skips with the reason recorded).
"""

from __future__ import annotations

import os
import re

import pytest

from spark_skew_join_spark.connect_compat import (
    CONNECT_ESCAPES,
    ESCAPE_PATTERNS,
)

PKG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "spark_skew_join_spark",
)


def _source_escapes() -> set[str]:
    """Repo-relative module paths whose CODE (comments/docstrings
    stripped line-wise) touches a classic-session API."""
    found = set()
    for root, _dirs, files in os.walk(PKG):
        for fname in files:
            if not fname.endswith(".py") or fname == "connect_compat.py":
                continue  # the matrix lists the patterns it tracks
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, os.path.dirname(PKG))
            in_doc = False
            for line in open(path, encoding="utf-8"):
                stripped = line.strip()
                # crude but effective docstring/comment filter: the
                # escape patterns we track never appear mid-string in
                # code lines
                if stripped.count('"""') % 2 == 1:
                    in_doc = not in_doc
                    continue
                if in_doc or stripped.startswith("#"):
                    continue
                code = line.split("#", 1)[0]
                if any(p in code for p in ESCAPE_PATTERNS):
                    # ``key.rdd`` style false positives: require the
                    # pattern attached to an identifier boundary
                    if re.search(
                        r"(\.rdd\b|\._jvm\b|\._jdf\b|\._jsc\b|"
                        r"\.sparkContext\b|\._sc\.)",
                        code,
                    ):
                        found.add(rel.replace(os.sep, "/"))
    return found


def test_connect_escape_inventory_matches_matrix():
    got = _source_escapes()
    documented = set(CONNECT_ESCAPES)
    undocumented = got - documented
    assert not undocumented, (
        "Connect-incompatible API use outside the documented matrix — "
        f"classify these in connect_compat.CONNECT_ESCAPES: {sorted(undocumented)}"
    )
    stale = documented - got
    assert not stale, (
        "matrix rows whose module no longer touches a classic API — "
        f"prune these: {sorted(stale)}"
    )


def test_matrix_classes_are_valid():
    for mod, (cls, why) in CONNECT_ESCAPES.items():
        assert cls in (
            "graceful-fallback",
            "loud-error",
            "classic-only-helper",
        ), mod
        assert len(why) > 20, mod


try:  # pragma: no cover - environment probe
    import grpc as _grpc  # noqa: F401

    _HAS_GRPC = True
except Exception:
    _HAS_GRPC = False


@pytest.mark.skipif(
    not _HAS_GRPC,
    reason="grpcio not installed in this sandbox — Spark Connect client "
    "cannot start (connect jars are present; pip installs are "
    "disallowed here)",
)
def test_connect_live_smoke():
    """Under a real Connect session: DataFrame-only surfaces (skew_join,
    dedup, text ops) must run; documented loud-error surfaces must
    raise PySpark's unsupported-operation error, never return wrong
    results."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.remote("local[2]").appName("connect-smoke")
        .getOrCreate()
    )
    try:
        from pyspark.sql import functions as F

        from spark_skew_join_spark import SkewJoinConf, skew_join
        from spark_skew_join_spark.operators.diagnostics import (
            count_per_partition,
        )

        left = spark.range(0, 1000).select(
            (F.col("id") % 7).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(0, 7).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        sj = skew_join(left, right, ["k"], "inner", SkewJoinConf())
        assert sj.count() == 1000
        with pytest.raises(Exception):
            count_per_partition(sj)
    finally:
        spark.stop()
