"""Checkpointed incremental runner: documents -> detections -> tiles with a
per-partition lineage table and exact resume (north rule: "checkpoints
per-partition lineage and rows/sec metrics ... for exact resume").

Layout under ``--out``:
- ``detections/`` parquet partitioned by ``tile_id`` (the granule-level
  spatial partition; on Iceberg this is the partition transform) —
  append-only, one commit per run.
- ``tiles/`` parquet — recomputed from the full detections store each run
  (dedup is global, so late-arriving granules can change tile rollups).
- ``lineage/`` parquet — one row per (run_id, stage, partition_key=doc_id):
  rows_out, wall_s, rows_per_sec, status. The set of doc_ids with
  status='done' at stage 'detect' is the resume frontier: a re-run skips
  them BEFORE decode (metadata-only pruning), so resume-after-kill equals a
  fresh run modulo row order.

Scale posture: the frontier is a broadcast anti-join (doc_id count ~= 1e6/day
at production scale — still broadcastable; beyond that it becomes an Iceberg
snapshot diff). The only full-table pass is the dedup+tiles rebuild; its
shuffle is keyed by the level-14 neighborhood cell with AQE skew splitting.

CLI (spark-submit friendly):
    spark-submit --py-files filda_spark.zip -m filda_spark.runner \
        --corpus /data/corpus --out /data/fires
    (locally: python -m filda_spark.runner --corpus ... --out ...)
"""

from __future__ import annotations

import argparse
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filda_spark import pipeline
from filda_spark.namelist import make_namelist


def _lineage_path(out_dir: str) -> str:
    return f"{out_dir}/lineage"


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    p = _lineage_path(out_dir)
    try:
        return spark.read.parquet(p)
    except Exception:
        return None


def done_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    lin = read_lineage(spark, out_dir)
    if lin is None:
        return None
    return (
        lin.filter((F.col("stage") == "detect") & (F.col("status") == "done"))
        .select("partition_key")
        .distinct()
    )


def process_doc_ids(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    doc_ids: list[str],
    nl: dict,
    run_id: str,
    t0: float | None = None,
) -> None:
    """Detect + enrich + append one batch of granules, then record lineage.
    Shared by the incremental runner and the streaming ingest."""
    t0 = t0 or time.perf_counter()
    det = pipeline.detect_detections(spark, corpus_dir, nl)
    det = det.filter(F.col("doc_id").isin(doc_ids))
    # stage the raw detections once: enrich + dedup re-reference the
    # detections several times (semi-join reductions, self-join) and
    # must not re-run the decode+detect kernel per reference
    stage = f"{out_dir}/_stage/{run_id}"
    det.write.mode("overwrite").parquet(stage)
    det = pipeline.enrich(spark, spark.read.parquet(stage), corpus_dir)
    det.write.mode("append").partitionBy("tile_id").parquet(f"{out_dir}/detections")
    wall = time.perf_counter() - t0
    # per-partition row counts from the (small) staging parquet — avoids
    # re-scanning the partitioned store
    counts = {
        r.doc_id: r.n
        for r in spark.read.parquet(stage).groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    per_doc_wall = wall / max(len(doc_ids), 1)
    lineage_rows = [
        (
            run_id,
            "detect",
            d,
            int(counts.get(d, 0)),
            round(per_doc_wall, 4),
            round(counts.get(d, 0) / per_doc_wall, 2) if per_doc_wall > 0 else 0.0,
            "done",
        )
        for d in doc_ids
    ]
    spark.createDataFrame(
        lineage_rows,
        "run_id string, stage string, partition_key string, rows_out long, wall_s double, rows_per_sec double, status string",
    ).write.mode("append").parquet(_lineage_path(out_dir))


def run_incremental(
    spark: SparkSession, corpus_dir: str, out_dir: str, nl: dict | None = None
) -> dict:
    """One incremental batch: detect any granule not yet in the lineage
    frontier, append detections, rebuild dedup+tiles over the full store."""
    nl = nl or make_namelist()
    run_id = uuid.uuid4().hex[:12]
    t0 = time.perf_counter()

    docs = pipeline.night_documents(pipeline.load_documents(spark, corpus_dir)).select("doc_id")
    done = done_doc_ids(spark, out_dir)
    todo = docs if done is None else docs.join(
        F.broadcast(done), docs.doc_id == done.partition_key, "left_anti"
    )
    todo_ids = [r.doc_id for r in todo.collect()]  # frontier is small by design
    if todo_ids:
        process_doc_ids(spark, corpus_dir, out_dir, todo_ids, nl, run_id, t0)

    # global dedup + tiles over the full store (late granules can demote
    # earlier detections to duplicates)
    full = spark.read.parquet(f"{out_dir}/detections")
    full = pipeline.dedup(full)
    tiles = pipeline.tiles(full)
    tiles.write.mode("overwrite").parquet(f"{out_dir}/tiles")
    return dict(run_id=run_id, new_docs=len(todo_ids))


def read_results(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    det = pipeline.dedup(spark.read.parquet(f"{out_dir}/detections"))
    return dict(detections=det, tiles=spark.read.parquet(f"{out_dir}/tiles"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dyn-win-dim", type=int, default=None)
    args = ap.parse_args()
    from filda_spark.session import get_spark

    spark = get_spark("filda-runner")
    nl = make_namelist(**({"dyn_win_dim": args.dyn_win_dim} if args.dyn_win_dim else {}))
    os.makedirs(args.out, exist_ok=True)
    res = run_incremental(spark, args.corpus, args.out, nl)
    print(res)
    spark.stop()


if __name__ == "__main__":
    main()
