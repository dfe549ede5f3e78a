"""SparkSession factory tuned for this engine.

Scale posture (targets a 1000-executor cluster; tested on local[N]):
- AQE on: runtime coalescing, skew-join splitting.
- Arrow execution for every pandas UDF / applyInPandas kernel.
- shuffle partitions sized to cores locally; on a real cluster this is
  set to ~2-3x total cores via spark-submit conf.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "filda_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard conf."""
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # pyspark's own Arrow serializer trips a pandas FutureWarning when a
    # kernel yields an empty frame (serializers.py concat); it floods worker
    # stderr on every run. Scoped to that exact message; local-mode python
    # workers inherit the driver env.
    _noise = "ignore:The behavior of DataFrame concatenation:FutureWarning"
    pw = os.environ.get("PYTHONWARNINGS", "")
    if _noise not in pw:
        os.environ["PYTHONWARNINGS"] = f"{pw},{_noise}".strip(",")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # media payloads are MBs/row: smaller scan splits keep the granule
        # decode scan parallel instead of one fat task per 128MB
        .config("spark.sql.files.maxPartitionBytes", str(16 * 1024 * 1024))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
