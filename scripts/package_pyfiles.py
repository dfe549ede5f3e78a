#!/usr/bin/env python
"""Build the spark-submit artifact: zip the filda_spark package so the
pipeline runs on a real multi-executor cluster via --py-files.

    python scripts/package_pyfiles.py           # -> dist/filda_spark.zip
    spark-submit --py-files dist/filda_spark.zip \
        --conf spark.sql.shuffle.partitions=2048 \
        scripts/run_ingest.py --corpus <dir> --out <dir>

(spark-submit takes a primary script file, not a -m module path;
scripts/run_ingest.py is that file and imports the engine from the zip.)
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "filda_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(ROOT, "filda_spark")
        for dirpath, _dirnames, filenames in os.walk(pkg):
            if "__pycache__" in dirpath:
                continue
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
