"""Preloading PySpark worker daemon.

Stock ``pyspark.daemon`` forks a bare interpreter per worker; each worker
then imports numpy/pandas/pyarrow on its first Arrow batch. On hosts with
a slow page-fault/mmap path (the degraded boots documented in BASELINE.md,
where a fresh ``import numpy, pandas, pyarrow`` burns 3+ s of sys-time vs
~0.3 s healthy) that import storm serializes across every spawned worker
and dominates the first UDF stage of every job (~4 s at local[32]).

This daemon imports the heavy libraries ONCE before calling the stock
manager loop, so every forked worker inherits the loaded modules
copy-on-write for free. Wired via ``spark.python.daemon.module`` in
``session.get_spark`` (public Spark conf; spark-core:
``org.apache.spark.internal.config.Python.PYTHON_DAEMON_MODULE``).

Keep this module import-light at module level apart from the deliberate
preloads: it runs inside every executor's daemon process.
"""

# deliberate preloads — every Arrow UDF worker needs these
import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

# the worker entrypoint itself (pulls in pyspark.serializers, cloudpickle,
# pyspark.sql.pandas.serializers — the other half of the worker's import bill)
import pyspark.worker  # noqa: F401

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
