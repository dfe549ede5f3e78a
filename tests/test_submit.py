"""The north rule's launch mode, end to end: `spark-submit --py-files
dist/filda_spark.zip scripts/run_ingest.py` must run a checkpointed
incremental batch with the engine imported FROM THE ZIP (no repo on
PYTHONPATH), and a second submit must resume to an empty frontier.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str | None:
    for cand in (
        shutil.which("spark-submit"),
        "/opt/spark/bin/spark-submit",
    ):
        if cand and os.path.exists(cand):
            return cand
    return None


@pytest.mark.skipif(_spark_submit() is None, reason="spark-submit not on this host")
def test_spark_submit_pyfiles_ingest(corpus, tmp_path):
    subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "package_pyfiles.py")],
        check=True,
        capture_output=True,
    )
    zip_path = os.path.join(ROOT, "dist", "filda_spark.zip")
    assert os.path.exists(zip_path)

    out_dir = str(tmp_path / "store")
    env = dict(os.environ)
    # the engine must come from --py-files, not a repo checkout on the path
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "8"
    env["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = "8"
    cmd = [
        _spark_submit(),
        "--py-files",
        zip_path,
        os.path.join(ROOT, "scripts", "run_ingest.py"),
        "--corpus",
        corpus["dir"],
        "--out",
        out_dir,
        "--dyn-win-dim",
        "31",
    ]
    # run from a neutral cwd so `import filda_spark` cannot resolve from
    # the repo directory implicitly
    first = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert first.returncode == 0, first.stderr[-4000:]
    m = re.search(r"'new_docs': (\d+)", first.stdout)
    assert m and int(m.group(1)) > 0, first.stdout[-2000:]
    assert os.path.isdir(f"{out_dir}/detections")
    assert os.path.isdir(f"{out_dir}/lineage")

    # exact resume: the second submit finds nothing new
    second = subprocess.run(
        cmd, cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600
    )
    assert second.returncode == 0, second.stderr[-4000:]
    m2 = re.search(r"'new_docs': (\d+)", second.stdout)
    assert m2 and int(m2.group(1)) == 0, second.stdout[-2000:]
