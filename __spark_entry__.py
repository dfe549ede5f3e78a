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


# The driver's correctness gate verifies only the FIRST 50 registered
# queries (VERDICT.md r3 finding), so registration order decides what gets
# an official correctness row. Rather than hand-rotating a priority list
# each round, order queries least-recently-verified first, computed from
# the CORRECTNESS_r{N}.json files the driver itself writes: never-checked
# queries lead, then the stalest round, ties in registration order. Every
# query therefore earns a fresh driver row within ceil(n_queries/50)
# rounds with no per-round governance.


def _last_checked() -> dict[str, int]:
    """query name -> most recent round with a green driver row (absent =
    never checked)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                rows = json.load(f)
        except Exception:
            continue
        for name, row in rows.items():
            # A row only counts as "checked" if it was GREEN: a hash
            # mismatch (r4: tile_pyramid, snap_to_segments) means the op
            # must re-earn its driver row next round, so treat it as
            # never-checked rather than fresh. hash_match is absent for
            # rows-only entries; those count on rows_match alone.
            if isinstance(row, dict) and row.get("rows_match") and row.get(
                "hash_match", True
            ):
                seen[name] = max(seen.get(name, 0), rnd)
    return seen


# VERDICT r4 pins: the two r4 hash-FAILs (oracle-encoding bugs fixed this
# round — they must re-earn a green driver row) lead, followed by the ten
# ops the r4 verdict explicitly named as never driver-checked. With >50
# never-checked entries in the registry the plain LRU rule would push some
# of them past the 50-row window, so they are pinned ahead of the
# never-checked tier (checked queries are unaffected: a pin never evicts a
# staler row from rotation, only reorders within the never-checked group).
_PINNED = (
    "tile_pyramid",
    "snap_to_segments",
    "winnowing_fingerprint",
    "edit_distance_pairs",
    "ann_pq_search",
    "image_phash",
    "phash_neardup",
    "audio_segments",
    "contamination_check",
    "boilerplate_chunks",
    "vector_quantize",
    "stream_sessions",
)


def _ordered(d: dict) -> dict:
    seen = _last_checked()
    reg = {k: i for i, k in enumerate(d)}
    pin = {k: i for i, k in enumerate(_PINNED)}
    names = sorted(
        d, key=lambda k: (seen.get(k, -1), pin.get(k, len(pin)), reg[k])
    )
    return {k: d[k] for k in names}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = dict(relational.queries())
    q.update(fire_queries.QUERIES)  # rows-only (oracle: tests/test_pipeline.py)
    return _ordered(q)


def oracle_sql() -> dict[str, str]:
    o = dict(relational.oracles())
    # pipeline entries: DuckDB oracles over materialized deterministic
    # inputs / the reference-mirroring numpy-oracle outputs (exactness
    # against the Spark pipeline is separately pinned by pytest)
    o.update(fire_queries.oracles())
    return _ordered(o)
