#!/usr/bin/env python
"""spark-submit primary resource for the checkpointed incremental ingest.

spark-submit takes a script file (not a module), so this thin launcher is
the deploy entry point; the engine itself ships via --py-files:

    python scripts/package_pyfiles.py
    spark-submit --master <cluster> \
        --py-files dist/filda_spark.zip \
        --conf spark.sql.shuffle.partitions=2048 \
        scripts/run_ingest.py --corpus <dir> --out <dir>

The launcher imports everything from the zip (no repo checkout needed on
the cluster) and delegates to filda_spark.runner.main, which runs one
incremental batch: frontier from the lineage checkpoint, decode/detect/
enrich/append, neighborhood-bounded dedup+tiles reconcile, lineage +
snapshot commit.
"""

from filda_spark.runner import main

if __name__ == "__main__":
    main()
