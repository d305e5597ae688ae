"""Physical-plan introspection + AQE helpers.

The reference has no optimizer of its own (SURVEY §4) — all rewrites are
inherited from Catalyst. This module is the rebuild's window into those
rewrites: assert that filters reached the parquet scan, that a dimension
join went broadcast, count exchanges (each is a shuffle), and flip the AQE
skew-join flags that are the built-in alternative to skew_join.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan; forces planning but not execution."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = plan_string(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", plan)


def scan_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — verifies column pruning (a scan reading
    all columns for a 2-column projection is wrong)."""
    plan = plan_string(df)
    return re.findall(r"ReadSchema: (struct<[^\n]*)", plan)


def num_shuffles(df: DataFrame) -> int:
    """Count of Exchange operators in the pre-execution physical plan."""
    return plan_string(df, "simple").count("Exchange")


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple")


def has_python_udf(df: DataFrame) -> bool:
    s = plan_string(df, "simple")
    return "BatchEvalPython" in s or "ArrowEvalPython" in s


def codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better."""
    return len(re.findall(r"WholeStageCodegen \(\d+\)", plan_string(df, "simple")))


def set_aqe(spark: SparkSession, enabled: bool = True) -> None:
    spark.conf.set("spark.sql.adaptive.enabled", str(enabled).lower())


def set_aqe_skew_join(
    spark: SparkSession,
    enabled: bool = True,
    skewed_factor: int | None = None,
    skewed_threshold: str | None = None,
) -> None:
    """Built-in alternative to skew_join: AQE OptimizeSkewedJoin splits
    oversized post-shuffle partitions of sort-merge joins at runtime.
    Recommended default at scale; skew_join covers the cases AQE can't
    (broadcast-ineligible hot keys known up front, non-SMJ plans)."""
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
    if skewed_factor is not None:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", str(skewed_factor)
        )
    if skewed_threshold is not None:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            skewed_threshold,
        )
