"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship skew-join + aggregation at sf0.001;
queries()/oracle_sql() expose every implemented operator from SURVEY §2
plus the LLM-pipeline extensions, hash-checked against DuckDB at sf0.01.
Implementations live in spark_skew_join_spark.queries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from spark_skew_join_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: skew_join(orders, customer) → revenue by market segment."""
    return _q.flagship(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
