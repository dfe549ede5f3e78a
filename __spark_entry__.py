"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are assembled from
``filda_spark.relational`` (SQL-expressible operators from SURVEY.md §2,
each with a DuckDB oracle) plus pipeline-level entries registered by the
fire-detection engine (rows-only where not SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from filda_spark import relational  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return relational.REGISTRY["broadcast_lookup"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return relational.queries()


def oracle_sql() -> dict[str, str]:
    return relational.oracles()
