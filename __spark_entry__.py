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

from filda_spark import fire_queries, relational  # noqa: E402
from filda_spark import training  # noqa: E402,F401  (registers training-data ops)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full fire-detection pipeline (decode -> detect ->
    enrich -> kNN dedup) on the synthetic granule corpus."""
    return fire_queries.fire_detections(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(relational.queries())
    q.update(fire_queries.QUERIES)  # rows-only (oracle: tests/test_pipeline.py)
    return q


def oracle_sql() -> dict[str, str]:
    o = dict(relational.oracles())
    # pipeline entries: DuckDB oracles over materialized deterministic
    # inputs / the reference-mirroring numpy-oracle outputs (exactness
    # against the Spark pipeline is separately pinned by pytest)
    o.update(fire_queries.oracles())
    return o
