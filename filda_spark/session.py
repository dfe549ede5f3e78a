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
    # under spark-submit the JVM gateway already exists and carries the
    # launcher's --master / cluster conf; setting .master() here would
    # silently override the cluster manager with local mode. Only default
    # the master when we are the ones about to launch the JVM.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    # under spark-submit only an explicit `master` arg (a caller's
    # deliberate choice) is honored; the SPARK_GRAFT_MASTER profile lever
    # must not override --master either
    if not under_submit:
        master = master or os.environ.get("SPARK_GRAFT_MASTER")
        if master is None:
            master = f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    # one BLAS thread per python worker: with 32 workers in flight a
    # 32-thread OpenBLAS pool per worker oversubscribes 1024x, and the pool
    # spawn itself is the dominant import cost on this host (3.4 s sys-time
    # per import with the default pool vs 0.02 s pinned — the r3 "import
    # canary" pathology was this, not filesystem). Kernels do their own
    # batch-level parallelism via Spark tasks; per-task BLAS must be serial.
    for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(_v, "1")
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
    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    b = (
        builder
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
    # preloading worker daemon (filda_spark/daemon.py): forked workers
    # inherit numpy/pandas/pyarrow/pyspark.worker copy-on-write instead
    # of re-importing per worker — measured 4.2 s -> ~1 s for the first
    # Arrow UDF stage at local[32] on this host (import sys-time 10x
    # degraded, BASELINE.md host canary). The daemon launches via
    # `python -m filda_spark.daemon` BEFORE --py-files lands on the worker
    # path, so it is enabled only when (a) we launched the JVM ourselves —
    # under spark-submit the executor env is already fixed and exporting
    # PYTHONPATH here reaches only the driver process — and (b) the package
    # resolves from a plain directory we can export on PYTHONPATH. Any
    # deployment path (tests/test_submit.py) uses Spark's stock daemon —
    # the preload is a cold-JVM lever that long-lived cluster executors do
    # not need.
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not under_submit and os.path.isdir(pkg_dir):
        b = b.config("spark.python.daemon.module", "filda_spark.daemon")
        repo_root = os.path.dirname(pkg_dir)
        env_pp = os.environ.get("PYTHONPATH", "")
        if repo_root not in env_pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{env_pp}".rstrip(os.pathsep)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
