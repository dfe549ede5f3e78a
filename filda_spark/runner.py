"""Checkpointed incremental runner: documents -> detections -> tiles with a
per-partition lineage table and exact resume (north rule: "checkpoints
per-partition lineage and rows/sec metrics ... for exact resume").

Layout under ``--out``:
- ``detections/`` parquet partitioned by ``tile_id`` (the granule-level
  spatial partition; on Iceberg this is the partition transform) —
  append-only, one commit per run; ``compact_detections`` is the
  small-file maintenance pass (the ``rewrite_data_files`` analogue).
- ``dedup_state/`` parquet partitioned by ``tile_id`` — one row per
  detection: (doc_id, FP_Line, FP_Sample, is_dup, dup_of, _cell). Updated
  INCREMENTALLY: a batch can only change verdicts for detections within the
  dedup radius of its own rows, so each run recomputes the kRing
  neighborhood of the batch's level-14 cells and dynamic-partition-
  overwrites only the affected tiles (no full-store shuffle per batch).
- ``tiles/`` parquet partitioned by ``tile_id`` — fire-density rollup,
  same affected-tiles-only dynamic overwrite.
- ``lineage/`` parquet — one row per (run_id, stage, partition_key=doc_id):
  rows_out, wall_s, rows_per_sec, status. The set of doc_ids with
  status='done' at stage 'detect' is the resume frontier: a re-run prunes
  them BEFORE decode (broadcast semi-join below the cogroup kernel), so
  resume-after-kill equals a fresh run modulo row order.
- ``_snapshots/log.jsonl`` — the commit log (seq, run_id, docs, rows),
  one record per landed batch; ``read_detections_as_of(run_id)`` is the
  time-travel read (granule-membership snapshots, compaction-proof).

Scale posture: the frontier is a broadcast semi/anti-join (doc_id count
~= 1e6/day at production scale — still broadcastable; beyond that it
becomes an Iceberg snapshot diff). Per batch, the only non-map work is the
neighborhood dedup shuffle, sized by the batch's spatial footprint — NOT by
the store: O(|batch neighborhood|), constant as the store grows.

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

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filda_spark import grids, pipeline, spatial
from filda_spark.namelist import make_namelist

STATE_KEY = ["doc_id", "FP_Line", "FP_Sample"]
_CELL_H_DEG = 180.0 / (1 << pipeline.DEDUP_CELL_LEVEL)


def _lineage_path(out_dir: str) -> str:
    return f"{out_dir}/lineage"


def _parquet_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """First-run probe: a local path that does not exist yet is expected
    state, not an error — checking existence keeps the py4j
    AnalysisException stack trace out of bench/driver logs. Non-local URIs
    (s3a:// etc. on a real deployment) fall through to the read + except."""
    if "://" not in path and not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _parquet_or_none(spark, _lineage_path(out_dir))


def done_doc_ids(spark: SparkSession, out_dir: str) -> DataFrame | None:
    lin = read_lineage(spark, out_dir)
    if lin is None:
        return None
    return (
        lin.filter((F.col("stage") == "detect") & (F.col("status") == "done"))
        .select("partition_key")
        .distinct()
    )


def _det_cell(lat_col: str = "FP_Latitude", lon_col: str = "FP_Longitude"):
    return grids.cell_encode(F.col(lat_col), F.col(lon_col), pipeline.DEDUP_CELL_LEVEL)


def _expand_cells(cells: DataFrame, eps: float = spatial.DEDUP_EPS_DEG) -> DataFrame:
    """All cells that can hold a detection within ``eps`` of a detection in
    one of the input cells: latitude-aware kRing of the cell set (margin =
    half a cell height, since the source row can sit anywhere in its cell;
    lon_ring_halfwidth adds the +eps partner-latitude margin itself)."""
    lat_c = F.abs(grids.cell_center_lat(F.col("_cell"))) + F.lit(_CELL_H_DEG / 2.0)
    kx = grids.lon_ring_halfwidth(lat_c, eps, pipeline.DEDUP_CELL_LEVEL)
    return (
        cells.select(F.explode(grids.cell_kring_dyn(F.col("_cell"), kx)).alias("_cell"))
        .distinct()
    )


def _cell_tiles(cells: DataFrame) -> DataFrame:
    """Candidate hXXvYY tiles containing any point of each cell (all four
    corners — a cell can straddle a 10-deg tile edge)."""
    lvl = grids.cell_level(F.col("_cell"))
    x, y = grids.cell_xy(F.col("_cell"))
    n = F.pow(F.lit(2.0), lvl.cast("double"))
    eps = F.lit(1e-9)
    lat_n = F.lit(90.0) - y.cast("double") / n * F.lit(180.0) - eps
    lat_s = F.lit(90.0) - (y.cast("double") + 1) / n * F.lit(180.0) + eps
    lon_w = x.cast("double") / n * F.lit(360.0) - F.lit(180.0) + eps
    lon_e = (x.cast("double") + 1) / n * F.lit(360.0) - F.lit(180.0) - eps
    corners = [
        grids.pc_tile_name(la, lo)
        for la in (lat_n, lat_s)
        for lo in (lon_w, lon_e)
    ]
    return cells.select(F.explode(F.array(*corners)).alias("t"))


def _read_state(spark: SparkSession, out_dir: str) -> DataFrame | None:
    return _parquet_or_none(spark, f"{out_dir}/dedup_state")


def _swap_tile_partitions(src: str, dst: str) -> list[str]:
    """Replace ``dst``'s ``tile_id=...`` partition directories with
    ``src``'s and return the swapped tile ids. Driver-side metadata commit
    bounded by the affected-tile count (<=648 10-degree tiles globally),
    single-writer like every other metadata commit here — the
    parquet-layout analogue of an Iceberg manifest swap (on an object
    store this is the manifest pointer update, not a data move)."""
    import shutil

    swapped: list[str] = []
    for d in sorted(os.listdir(src)):
        if not d.startswith("tile_id="):
            continue
        cur = os.path.join(dst, d)
        shutil.rmtree(cur, ignore_errors=True)
        os.replace(os.path.join(src, d), cur)
        swapped.append(d.split("=", 1)[1])
    shutil.rmtree(src, ignore_errors=True)
    return swapped


def update_dedup_incremental(
    spark: SparkSession, out_dir: str, batch: DataFrame, _maybe_empty: bool = False
) -> None:
    """Reconcile dedup_state + tiles after appending ``batch`` (enriched
    detection rows) to the store.

    A new detection can only change is_dup/dup_of verdicts for detections
    within the dedup radius of itself, i.e. in the kRing (ring1) of the
    batch's cells; recomputing those verdicts needs candidate dominators one
    ring further out (ring2). So:

      1. ring1 = expand(batch cells); ring2 = expand(ring1)
      2. run pipeline.dedup on store rows in ring2 cells — verdicts for
         ring1 rows are exact (all their within-eps partners are present)
      3. dedup_state := carried-forward rows (affected tiles, outside
         ring1) + recomputed ring1 rows, dynamic-overwriting ONLY the
         affected tile partitions
      4. tiles := rollup of the affected tiles from store JOIN state,
         dynamic-overwriting the same partitions

    Cost is O(|batch neighborhood|) regardless of store size — the full
    rebuild the north rule's resume semantics would otherwise force on
    every micro-batch."""
    old = _read_state(spark, out_dir)
    if old is None:
        # bulk load (no prior state): every cell is "touched" — the ring
        # machinery would select the whole store anyway, so dedup it
        # directly and skip the expansion/pruning jobs (they only pay for
        # themselves once the store outgrows the batch)
        # no prior state on disk -> no self-read hazard: write the state
        # partitions directly and reuse the materialized parquet for tiles
        store = spark.read.parquet(f"{out_dir}/detections").withColumn("_cell", _det_cell())
        new_state = pipeline.dedup(store).select(
            "tile_id", *STATE_KEY, "is_dup", "dup_of", "_cell"
        )
        new_state.write.mode("overwrite").partitionBy("tile_id").parquet(f"{out_dir}/dedup_state")
        state = spark.read.parquet(f"{out_dir}/dedup_state")
        joined = store.join(state.select(*STATE_KEY, "is_dup"), STATE_KEY, "inner")
        pipeline.tiles(joined).write.mode("overwrite").partitionBy("tile_id").parquet(
            f"{out_dir}/tiles"
        )
        return

    touched = batch.select(_det_cell().alias("_cell")).distinct()
    ring1 = _expand_cells(touched)
    ring2 = _expand_cells(ring1)

    # static partition pruning: the store is partitioned by tile_id (10-deg
    # Plate-Carree), so the candidate tiles of the ring2 cells — a small,
    # geography-bounded set (<= 648 globally) — prune the scan to the
    # batch's spatial footprint before any row is read. Collected as
    # literals deliberately: unlike the doc_id frontier this set cannot
    # grow with data volume.
    tiles_aff = sorted(
        r.t for r in _cell_tiles(ring2).select(F.col("t")).distinct().collect()
    )
    store = (
        spark.read.parquet(f"{out_dir}/detections")
        .filter(F.col("tile_id").isin(tiles_aff))
        .withColumn("_cell", _det_cell())
    )
    sub = store.join(F.broadcast(ring2), "_cell", "left_semi")
    sub_dd = pipeline.dedup(sub)
    new_state = sub_dd.join(F.broadcast(ring1), "_cell", "left_semi").select(
        "tile_id", *STATE_KEY, "is_dup", "dup_of", "_cell"
    )
    # only the delete path can produce an empty touched neighborhood (an
    # append's new_state always contains the batch's own rows); the guard
    # re-executes the neighborhood plan, so it must stay off the per-batch
    # append/streaming hot path
    if _maybe_empty and new_state.isEmpty():
        # nothing survives in the touched neighborhood (a pure delete with
        # no remaining neighbors): no verdict can change, and staging an
        # empty frame would write a schema-less parquet dir
        return

    affected_tiles = new_state.select("tile_id").distinct()
    keep = (
        old.join(F.broadcast(affected_tiles), "tile_id", "left_semi")
        .join(F.broadcast(ring1), "_cell", "left_anti")
        .select("tile_id", *STATE_KEY, "is_dup", "dup_of", "_cell")
    )
    merged = keep.unionByName(new_state)

    # ONE partitioned stage write, then a driver-side per-tile directory
    # swap into dedup_state. This replaces the former two-write chain
    # (unpartitioned stage + dynamic-partition-overwrite re-write): the
    # merged plan reads dedup_state so Spark cannot overwrite it in place,
    # but the swap is bounded metadata work (<=648 tile dirs globally) —
    # the parquet-layout analogue of an Iceberg manifest swap, under the
    # same single-writer commit discipline as the snapshot log. The
    # tile_id repartition keeps ~one file per tile (same reasoning as the
    # detections append) on a shuffle of only the neighborhood rows.
    stage = f"{out_dir}/_stage/state_{uuid.uuid4().hex[:8]}"
    merged.repartition("tile_id").write.mode("overwrite").partitionBy("tile_id").parquet(stage)
    swapped = _swap_tile_partitions(stage, f"{out_dir}/dedup_state")
    if not swapped:
        return
    merged = spark.read.parquet(f"{out_dir}/dedup_state").filter(
        F.col("tile_id").isin(swapped)  # partition-pruned: only swapped dirs read
    )
    det_aff = store.filter(F.col("tile_id").isin(swapped))
    joined = det_aff.join(merged.select(*STATE_KEY, "is_dup"), STATE_KEY, "inner")
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        pipeline.tiles(joined).write.mode("overwrite").partitionBy("tile_id").parquet(
            f"{out_dir}/tiles"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)


def _mark(timings: dict | None, key: str, t0: float) -> float:
    """Phase-split instrumentation for the per-batch driver tail (the fixed
    cost a 100x scale-up multiplies by batch count)."""
    now = time.perf_counter()
    if timings is not None:
        timings[key] = round(timings.get(key, 0.0) + (now - t0), 3)
    return now


def process_docs(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    todo: DataFrame,
    nl: dict,
    run_id: str,
    n_docs: int | None = None,
    timings: dict | None = None,
) -> None:
    """Detect + enrich + append one batch of granules, reconcile dedup/tiles
    incrementally, then record lineage. Shared by the incremental runner and
    the streaming ingest. ``todo`` is a doc_id DataFrame (the frontier);
    granules outside it are pruned before decode. ``n_docs``, when the
    caller already counted the frontier (both call sites do), skips a
    recount job.

    Lineage wall_s/rows_per_sec are TRUE per-granule detect-kernel timings
    measured inside the cogroup task (_detect_wall_s), not batch averages
    (north rule: per-partition rows/sec metrics)."""
    t = time.perf_counter()
    pre = pipeline.detect_pre_metrics(spark, corpus_dir, nl, doc_filter=todo, n_docs=n_docs)
    # stage the pre-fit detections once: the fit, enrich and dedup stages
    # re-reference them several times (semi-join reductions, self-join) and
    # must not re-run the decode+detect kernel per reference
    pre_stage = f"{out_dir}/_stage/{run_id}_pre"
    pre.write.mode("overwrite").parquet(pre_stage)
    pre = spark.read.parquet(pre_stage)
    t = _mark(timings, "decode_detect", t)
    det = pipeline.fit_detections(
        spark, pre.filter(F.col("FP_Line") >= 0).drop("_detect_wall_s")
    )
    stage = f"{out_dir}/_stage/{run_id}"
    # enrich join keys are persisted WITH the staged fit output: enrich's
    # two semi-join key-set jobs then read 4 pruned int columns from this
    # parquet instead of re-running the sinusoidal pandas UDF per job
    pipeline.enrich_keys(det).write.mode("overwrite").parquet(stage)
    t = _mark(timings, "fit", t)
    enriched = pipeline.enrich(spark, spark.read.parquet(stage), corpus_dir)
    # cluster by tile before the partitioned append: without this every task
    # writes a file into every tile directory it touches (tasks x tiles
    # small files per batch — the commit, not the data, becomes the tail);
    # one small shuffle of the detection rows yields ~one file per tile
    enriched.repartition("tile_id").write.mode("append").partitionBy("tile_id").parquet(
        f"{out_dir}/detections"
    )
    t = _mark(timings, "enrich_append", t)

    batch = spark.read.parquet(stage)
    # row-group-metadata count: one cheap job that both gates the dedup
    # reconcile AND supplies the snapshot row count (it used to take a
    # limit(1) probe plus a separate lineage aggregate — two extra jobs in
    # the fixed per-batch tail)
    n_rows = batch.count()
    if n_rows > 0:
        update_dedup_incremental(spark, out_dir, batch)
        t = _mark(timings, "dedup_tiles", t)
        _update_manifest(spark, out_dir, batch)
        t = _mark(timings, "manifest", t)

    # per-granule metrics off the staged pre-fit rows (sentinel rows carry
    # the timing for zero-detection granules and count 0 toward rows_out);
    # Day-pruned granules in the frontier never decode -> wall_s 0.0
    metrics = pre.groupBy("doc_id").agg(
        F.max("_detect_wall_s").alias("_wall"),
        F.sum(F.when(F.col("FP_Line") >= 0, 1).otherwise(0)).alias("_n"),
    )
    lineage = (
        todo.select("doc_id")
        .join(metrics, "doc_id", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit("detect").alias("stage"),
            F.col("doc_id").alias("partition_key"),
            F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("rows_out"),
            F.round(F.coalesce(F.col("_wall"), F.lit(0.0)), 4).alias("wall_s"),
            (
                F.coalesce(F.col("_n"), F.lit(0))
                / F.greatest(
                    F.round(F.coalesce(F.col("_wall"), F.lit(0.0)), 4), F.lit(1e-9)
                )
            ).alias("rows_per_sec"),
            F.lit("done").alias("status"),
        )
    )
    lineage.write.mode("append").parquet(_lineage_path(out_dir))
    # snapshot stats come free: docs == the frontier count the caller
    # already has; rows == the staged-batch count above (sum of per-doc
    # rows_out by construction) — no lineage re-aggregation job
    if n_docs is None:
        n_docs = todo.count()
    _commit_snapshot(spark, out_dir, run_id, docs=int(n_docs), rows=int(n_rows))
    t = _mark(timings, "lineage_snapshot", t)
    # staging is consumed (all writes above are actions) — leave no residue
    import shutil

    shutil.rmtree(pre_stage, ignore_errors=True)
    shutil.rmtree(stage, ignore_errors=True)
    try:
        os.rmdir(f"{out_dir}/_stage")  # parent, if this was its last run
    except OSError:
        pass


# ---------------------------------------------------------------------------
# Partition-stats manifest + data-skipping reads (the Iceberg manifest
# analogue on the parquet layout)
# ---------------------------------------------------------------------------


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/_manifest/partition_stats.parquet"


def _update_manifest(spark: SparkSession, out_dir: str, batch: DataFrame) -> None:
    """Merge the batch's per-tile column bounds into the partition-stats
    manifest: (tile_id, lat/lon min-max, rows). One agg over the staged
    batch (<=648 result rows globally), then a driver-side atomic replace —
    the same single-writer metadata commit the snapshot log uses. On the
    APPEND path bounds are merge-only (compaction preserves rows), so they
    only ever widen; the one shrinking operation, ``delete_detections``,
    recomputes the rows of exactly the tiles it rewrites."""
    lat, lon = F.col("FP_Latitude"), F.col("FP_Longitude")
    stats = (
        batch.withColumn("tile_id", grids.pc_tile_name(lat, lon))
        .groupBy("tile_id")
        .agg(
            F.min(lat).alias("lat_min"),
            F.max(lat).alias("lat_max"),
            F.min(lon).alias("lon_min"),
            F.max(lon).alias("lon_max"),
            F.count("*").alias("rows"),
        )
        .toPandas()
    )
    if stats.empty:
        return
    path = _manifest_path(out_dir)
    if os.path.exists(path):
        prev = pd.read_parquet(path)
        both = pd.concat([prev, stats], ignore_index=True)
        stats = both.groupby("tile_id", as_index=False).agg(
            lat_min=("lat_min", "min"),
            lat_max=("lat_max", "max"),
            lon_min=("lon_min", "min"),
            lon_max=("lon_max", "max"),
            rows=("rows", "sum"),
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    stats.to_parquet(tmp, index=False)
    os.replace(tmp, path)


def read_detections_bbox(
    spark: SparkSession,
    out_dir: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """Data-skipping bbox read of the detections store: the manifest's
    per-tile bounds prune partitions without touching data (finer than raw
    tile arithmetic — a tile populated only in one corner keeps its actual
    bounds), the surviving tiles become a bounded literal isin (static
    partition pruning, <=648 ids), and the residual lat/lon predicate is
    pushed into the parquet scan where row-group min/max stats skip pages.
    Exactly the Iceberg manifest -> partition prune -> row-group skip
    ladder, on the plain-parquet layout."""
    path = _manifest_path(out_dir)
    root = f"{out_dir}/detections"
    lat, lon = F.col("FP_Latitude"), F.col("FP_Longitude")
    pred = (
        (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)
    )
    det = spark.read.parquet(root)
    if not os.path.exists(path):
        return det.filter(pred)
    man = pd.read_parquet(path)
    keep = man[
        (man.lat_max >= lat_min)
        & (man.lat_min <= lat_max)
        & (man.lon_max >= lon_min)
        & (man.lon_min <= lon_max)
    ].tile_id.tolist()
    return det.filter(F.col("tile_id").isin(keep)).filter(pred)


# ---------------------------------------------------------------------------
# Snapshot log + time travel (the Iceberg commit-log analogue)
# ---------------------------------------------------------------------------


def _snap_log(out_dir: str) -> str:
    return f"{out_dir}/_snapshots/log.jsonl"


def _commit_snapshot(
    spark: SparkSession,
    out_dir: str,
    run_id: str,
    docs: int | None = None,
    rows: int | None = None,
) -> None:
    """Append one commit record after a batch lands: (seq, run_id, new
    granules, rows appended). Driver-side single-writer append — the same
    role Iceberg's metadata commit plays; granule (doc_id) granularity
    instead of file granularity, which is what the exact-resume frontier
    already keys on.

    Crash repair: a kill between the lineage append and this commit leaves
    a run whose granules are in the store and marked done (never re-landed)
    but in no snapshot — permanently invisible to time travel. Each commit
    therefore folds any such orphaned lineage run_ids into itself
    (``also_runs``): the next snapshot's membership equals the store
    content again. Detection is one column-pruned DISTINCT over the
    lineage run_id column; counts are passed in by the caller so the
    commit no longer re-scans the full lineage store per batch."""
    import json

    if docs is None or rows is None:
        lin = spark.read.parquet(_lineage_path(out_dir)).filter(
            F.col("run_id") == run_id
        )
        agg = lin.agg(
            F.count("*").alias("docs"), F.sum("rows_out").alias("rows")
        ).collect()[0]
        docs, rows = int(agg.docs), int(agg.rows or 0)
    os.makedirs(f"{out_dir}/_snapshots", exist_ok=True)
    # max-seq + 1, not count + 1: expiration removes old records but must
    # never let sequence numbers collide
    base, prior = _snap_entries(out_dir)
    seq = (prior[-1]["seq"] if prior else base.get("last_seq", 0)) + 1
    known = set(base.get("run_ids", [])) | {run_id}
    for s in prior:
        known.add(s["run_id"])
        known.update(s.get("also_runs", []))
    lin_runs = {
        r["run_id"]
        for r in spark.read.parquet(_lineage_path(out_dir))
        .select("run_id")
        .distinct()
        .collect()
    }
    rec = dict(seq=seq, run_id=run_id, docs=int(docs), rows=int(rows))
    orphans = sorted(lin_runs - known)
    if orphans:
        rec["also_runs"] = orphans
    with open(_snap_log(out_dir), "a") as f:
        f.write(json.dumps(rec) + "\n")


def _snap_entries(out_dir: str) -> tuple[dict, list[dict]]:
    """(base record, commit records oldest first). The base record (seq 0)
    carries run_ids folded in by expire_snapshots — implicit members of
    every surviving snapshot."""
    import json

    path = _snap_log(out_dir)
    if not os.path.exists(path):
        return {}, []
    with open(path) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    base = next((r for r in rows if r.get("base")), {})
    return base, [r for r in rows if not r.get("base")]


def snapshots(out_dir: str) -> list[dict]:
    """Commit log, oldest first (expired commits omitted)."""
    return _snap_entries(out_dir)[1]


def read_detections_as_of(spark: SparkSession, out_dir: str, run_id: str) -> DataFrame:
    """Time-travel read of the append-only detections store: the rows as of
    the commit ``run_id`` (inclusive). The snapshot membership is the union
    of the committed runs' granule frontiers, applied as a broadcast
    semi-join on the lineage table — granule-level time travel, the
    logical analogue of Iceberg reading an older snapshot's file set (the
    detections store is append-only per granule, so doc_id membership IS
    the snapshot content). dedup_state/tiles are latest-only materialized
    views and have no history by design."""
    base, snaps = _snap_entries(out_dir)
    seqs = [s["seq"] for s in snaps if s["run_id"] == run_id]
    if not seqs:
        raise ValueError(f"unknown snapshot run_id {run_id!r}")
    # copy-on-write deletes rewrite data files in place; snapshots at or
    # before the newest delete can no longer reproduce the deleted rows
    max_del = max(
        [base.get("deletes_through_seq", 0)]
        + [s["seq"] for s in snaps if s.get("delete")]
    )
    if seqs[0] < max_del:
        raise ValueError(
            f"snapshot {run_id!r} (seq {seqs[0]}) predates a row-level delete "
            f"(seq {max_del}); its data files were rewritten copy-on-write"
        )
    run_ids = list(base.get("run_ids", []))
    for s in snaps:
        if s["seq"] <= seqs[0]:
            run_ids.append(s["run_id"])
            run_ids.extend(s.get("also_runs", []))
    members = (
        spark.read.parquet(_lineage_path(out_dir))
        .filter(F.col("run_id").isin(run_ids) & (F.col("stage") == "detect"))
        .select(F.col("partition_key").alias("doc_id"))
        .distinct()
    )
    det = spark.read.parquet(f"{out_dir}/detections")
    return det.join(F.broadcast(members), "doc_id", "left_semi")


def expire_snapshots(out_dir: str, keep_last: int = 10) -> dict:
    """Snapshot-retention maintenance (the Iceberg ``expire_snapshots``
    analogue): drop commit records older than the newest ``keep_last``,
    atomically rewriting the log. Expired run_ids fold into a cumulative
    base record (seq 0) so surviving snapshots keep their exact membership
    — base runs are part of EVERY remaining snapshot — while uncommitted
    orphan lineage (a crash between lineage append and snapshot commit)
    stays excluded. Time travel to an expired commit raises. Expiration
    itself needs no data-file cleanup: committed granules remain members
    of every surviving snapshot (compaction handles file-count hygiene;
    crashed-job debris is ``remove_orphan_files``' job, and row removal is
    ``delete_detections``', each with its own accounting)."""
    import json

    base, snaps = _snap_entries(out_dir)
    if len(snaps) <= keep_last:
        return dict(total=len(snaps), expired=0)
    # explicit split point: snaps[:-0] would be the empty list, silently
    # turning keep_last=0 ("expire everything") into a no-op
    cut = len(snaps) - keep_last if keep_last > 0 else len(snaps)
    drop, keep = snaps[:cut], snaps[cut:]
    folded = set(base.get("run_ids", []))
    for s in drop:
        folded.add(s["run_id"])
        folded.update(s.get("also_runs", []))
    new_base = dict(seq=0, base=True, run_ids=sorted(folded))
    # expire-everything must not reset the sequence: remember the highest
    # expired seq so the next commit continues after it
    new_base["last_seq"] = max(
        [base.get("last_seq", 0)] + [s["seq"] for s in drop]
    )
    # an expired delete record must keep poisoning older snapshots
    del_through = max(
        [base.get("deletes_through_seq", 0)] + [s["seq"] for s in drop if s.get("delete")]
    )
    if del_through:
        new_base["deletes_through_seq"] = del_through
    base = new_base
    tmp = f"{_snap_log(out_dir)}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write(json.dumps(base) + "\n")
        for s in keep:
            f.write(json.dumps(s) + "\n")
    os.replace(tmp, _snap_log(out_dir))
    return dict(total=len(snaps), expired=len(drop))


def run_incremental(
    spark: SparkSession,
    corpus_dir: str,
    out_dir: str,
    nl: dict | None = None,
    timings: dict | None = None,
) -> dict:
    """One incremental batch: detect any granule not yet in the lineage
    frontier, append detections, reconcile dedup+tiles over the batch's
    spatial neighborhood only. Pass ``timings={}`` to collect the per-phase
    wall split (bench.py --phases)."""
    nl = nl or make_namelist()
    run_id = uuid.uuid4().hex[:12]
    t0 = time.perf_counter()

    docs = pipeline.night_documents(pipeline.load_documents(spark, corpus_dir)).select("doc_id")
    done = done_doc_ids(spark, out_dir)
    todo = docs if done is None else docs.join(
        F.broadcast(done), docs.doc_id == done.partition_key, "left_anti"
    )
    n_new = todo.count()
    _mark(timings, "frontier", t0)
    if n_new:
        process_docs(
            spark, corpus_dir, out_dir, todo, nl, run_id, n_docs=n_new, timings=timings
        )
    return dict(run_id=run_id, new_docs=n_new)


def detection_file_stats(out_dir: str) -> dict[str, int]:
    """Per-tile data-file counts of the detections store: driver-side
    directory listing, bounded by the tile-partition count (<=648
    10-degree tiles globally) — the same bounded-metadata planning a
    table-format maintenance job does from manifests (Iceberg
    ``rewrite_data_files``)."""
    root = f"{out_dir}/detections"
    stats: dict[str, int] = {}
    if not os.path.isdir(root):
        return stats
    for d in os.listdir(root):
        if not d.startswith("tile_id="):
            continue
        full = f"{root}/{d}"
        stats[d.split("=", 1)[1]] = sum(
            1 for f in os.listdir(full) if f.endswith(".parquet")
        )
    return stats


def compact_detections(
    spark: SparkSession,
    out_dir: str,
    max_files_per_tile: int = 1,
    target_rows_per_file: int = 5_000_000,
) -> dict:
    """Small-file maintenance for the append-only detections store (the
    Iceberg ``rewrite_data_files`` analogue on the parquet layout). Every
    incremental batch appends ~one file per touched tile, so a tile
    accumulates one file per batch; at production batch rates the store's
    read amplification comes from file COUNT, not bytes.

    Plan shape (scale posture): the driver listing picks only tiles over
    ``max_files_per_tile``; ONLY those partitions are read (bounded-literal
    static pruning, same as the incremental dedup), staged once, and
    dynamic-partition-overwritten clustered by tile. Under-threshold tiles
    are never read or rewritten. A tile larger than
    ``target_rows_per_file`` splits into ceil(rows/target) files via a
    deterministic hash bucket, so compaction cannot itself create an
    unsplittable mega-file. Single-writer maintenance op; row content is
    exactly preserved (pinned by test)."""
    import shutil

    stats = detection_file_stats(out_dir)
    result = dict(
        tiles_total=len(stats),
        tiles_compacted=0,
        files_before=sum(stats.values()),
        files_after=sum(stats.values()),
    )
    todo = sorted(t for t, n in stats.items() if n > max_files_per_tile)
    if not todo:
        return result
    root = f"{out_dir}/detections"
    det = spark.read.parquet(root).filter(F.col("tile_id").isin(todo))
    # stage: the rewrite reads the same partitions it overwrites
    stage = f"{out_dir}/_stage/compact_{uuid.uuid4().hex[:12]}"
    det.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    counts = {
        r["tile_id"]: r["n"]
        for r in staged.groupBy("tile_id").agg(F.count("*").alias("n")).collect()
    }
    n_out = {t: max(1, -(-c // target_rows_per_file)) for t, c in counts.items()}
    if all(n == 1 for n in n_out.values()):
        clustered = staged.repartition("tile_id")  # one task -> one file per tile
    else:
        mod_map = F.create_map(
            *[x for t, n in n_out.items() for x in (F.lit(t), F.lit(n))]
        )
        bucket = F.pmod(F.xxhash64(*STATE_KEY), mod_map[F.col("tile_id")])
        clustered = (
            staged.withColumn("_bk", bucket)
            .repartition(4 * sum(n_out.values()), "tile_id", "_bk")
            .drop("_bk")
        )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        clustered.write.mode("overwrite").partitionBy("tile_id").parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    shutil.rmtree(stage, ignore_errors=True)
    after = detection_file_stats(out_dir)
    result.update(tiles_compacted=len(todo), files_after=sum(after.values()))
    return result


def zorder_detections(
    spark: SparkSession,
    out_dir: str,
    tiles: list[str] | None = None,
    target_rows_per_file: int = 5_000_000,
) -> dict:
    """Z-order clustering of the detections store (the Iceberg
    ``rewrite_data_files(strategy => 'sort', sort_order => zorder(lat,lon))``
    analogue): rewrite tile partitions with rows sorted by the Morton
    interleave of (FP_Latitude, FP_Longitude), so parquet row-group min/max
    stats become spatially tight and ``read_detections_bbox``'s residual
    predicate skips row groups instead of merely pages within loose ones.

    Scale posture mirrors ``compact_detections``: only the requested (or
    all) tiles are read via bounded-literal partition pruning, staged once,
    and dynamic-partition-overwritten; ``sortWithinPartitions`` keeps the
    sort per output task (no global sort — tile partitioning already gives
    spatial locality across files; z-order adds it within them). Row
    content exactly preserved (pinned by test)."""
    import shutil

    from filda_spark.functions.bits import morton_key

    stats = detection_file_stats(out_dir)
    todo = sorted(stats) if tiles is None else sorted(t for t in tiles if t in stats)
    result = dict(tiles_total=len(stats), tiles_zordered=len(todo))
    if not todo:
        return result
    root = f"{out_dir}/detections"
    det = spark.read.parquet(root).filter(F.col("tile_id").isin(todo))
    stage = f"{out_dir}/_stage/zorder_{uuid.uuid4().hex[:12]}"
    det.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    total = staged.count()
    n_parts = max(len(todo), -(-total // target_rows_per_file))
    clustered = (
        staged.withColumn(
            "_zk", morton_key(F.col("FP_Latitude"), F.col("FP_Longitude"))
        )
        # range partitioning on (tile, z) keeps each output file a contiguous
        # z-range within its tile — oversized tiles split into disjoint
        # z-bands instead of hash-interleaved files
        .repartitionByRange(n_parts, "tile_id", "_zk")
        .sortWithinPartitions("tile_id", "_zk")
        .drop("_zk")
    )
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        clustered.write.mode("overwrite").partitionBy("tile_id").parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    shutil.rmtree(stage, ignore_errors=True)
    return result


def delete_detections(
    spark: SparkSession, out_dir: str, predicate: str
) -> dict:
    """Row-level DELETE on the detections store (the Iceberg copy-on-write
    ``DELETE FROM ... WHERE`` analogue on the parquet layout) — e.g. retract
    detections later identified as gas-flare false positives.

    Plan shape (scale posture): one bounded agg over the predicate's matches
    finds the affected tiles (<=648 rows to the driver — the same planning
    compaction does); ONLY those partitions are read, staged once, and
    dynamic-partition-overwritten with the surviving rows. Tiles whose rows
    are all deleted are emptied explicitly (dynamic overwrite cannot replace
    a partition with zero rows). Cost is O(bytes in affected tiles), never
    O(store). The manifest rows for rewritten tiles are recomputed from the
    surviving rows (bounds stay tight; pruning correctness never depended on
    them being tight).

    Time-travel semantics: copy-on-write rewrites data files in place and
    this layout retains no historical files, so commits at or before the
    delete can no longer reproduce the deleted rows — exactly an Iceberg
    table's state after DELETE + expire_snapshots + remove_orphan_files.
    The delete appends its own commit record; ``read_detections_as_of``
    raises for snapshots that predate the newest delete.

    Derived views stay exact: a deleted detection may have been the
    dominator of a surviving near-duplicate, so the dedup_state/tiles
    views are reconciled with the SAME neighborhood recompute an append
    uses (``update_dedup_incremental`` with the deleted rows as the
    touched set — ring1 verdicts recomputed from the post-delete store),
    followed by a bounded scrub that removes deleted keys from any state
    partition the recompute did not overwrite. Cost stays O(delete
    neighborhood), and a full-rebuild-equality test pins the semantics.
    """
    import json
    import shutil

    root = f"{out_dir}/detections"
    # SQL DELETE semantics under three-valued logic: a row is deleted iff
    # the predicate is TRUE; NULL-predicate rows must SURVIVE (a bare ~pred
    # filter would silently drop them without scrubbing their state keys)
    pred = F.coalesce(F.expr(predicate), F.lit(False))
    det = spark.read.parquet(root)
    affected = [
        r["tile_id"]
        for r in det.filter(pred).select("tile_id").distinct().collect()
    ]
    if not affected:
        return dict(rows_deleted=0, tiles_rewritten=0, tiles_emptied=0)

    sub = det.filter(F.col("tile_id").isin(affected))
    stage = f"{out_dir}/_stage/delete_{uuid.uuid4().hex[:12]}"
    sub.write.mode("overwrite").parquet(stage)
    staged = spark.read.parquet(stage)
    survivors = staged.filter(~pred)
    n_before = staged.count()
    n_after = survivors.count()

    live = [r["tile_id"] for r in survivors.select("tile_id").distinct().collect()]
    emptied = sorted(set(affected) - set(live))
    prev_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        if live:
            survivors.repartition("tile_id").write.mode("overwrite").partitionBy(
                "tile_id"
            ).parquet(root)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev_mode)
    for t in emptied:
        shutil.rmtree(f"{root}/tile_id={t}", ignore_errors=True)
    store_emptied = not detection_file_stats(out_dir)

    # reconcile the derived views from the post-delete store: the deleted
    # rows are the touched set (their neighbors' verdicts may change). If
    # the delete emptied the ENTIRE store there is nothing to reconcile
    # (and the detections root is no longer readable) — the views are
    # simply dropped with their tiles by the scrub below.
    if os.path.isdir(f"{out_dir}/dedup_state") and n_after < n_before:
        deleted = staged.filter(pred)
        if not store_emptied:
            update_dedup_incremental(spark, out_dir, deleted, _maybe_empty=True)
        _scrub_deleted_state(spark, out_dir, deleted, affected, emptied)
    shutil.rmtree(stage, ignore_errors=True)

    # manifest repair for exactly the rewritten tiles
    mpath = _manifest_path(out_dir)
    if os.path.exists(mpath):
        man = pd.read_parquet(mpath)
        man = man[~man.tile_id.isin(affected)]
        if live:
            lat, lon = F.col("FP_Latitude"), F.col("FP_Longitude")
            fresh = (
                spark.read.parquet(root)
                .filter(F.col("tile_id").isin(live))
                .groupBy("tile_id")
                .agg(
                    F.min(lat).alias("lat_min"),
                    F.max(lat).alias("lat_max"),
                    F.min(lon).alias("lon_min"),
                    F.max(lon).alias("lon_max"),
                    F.count("*").alias("rows"),
                )
                .toPandas()
            )
            man = pd.concat([man, fresh], ignore_index=True)
        tmp = f"{mpath}.tmp-{uuid.uuid4().hex[:8]}"
        man.to_parquet(tmp, index=False)
        os.replace(tmp, mpath)

    # delete commit: its own snapshot record; prior snapshots become
    # unreadable (enforced in read_detections_as_of)
    dbase, prior = _snap_entries(out_dir)
    seq = (prior[-1]["seq"] if prior else dbase.get("last_seq", 0)) + 1
    os.makedirs(f"{out_dir}/_snapshots", exist_ok=True)
    with open(_snap_log(out_dir), "a") as f:
        f.write(
            json.dumps(
                dict(
                    seq=seq,
                    run_id=f"delete-{uuid.uuid4().hex[:12]}",
                    docs=0,
                    rows=-(n_before - n_after),
                    delete=True,
                )
            )
            + "\n"
        )
    return dict(
        rows_deleted=n_before - n_after,
        tiles_rewritten=len(live),
        tiles_emptied=len(emptied),
    )


def reprocess_granules(
    spark: SparkSession, corpus_dir: str, out_dir: str, doc_ids: list[str], nl: dict | None = None
) -> dict:
    """Granule-level backfill (the MERGE-style replace a reprocessing
    campaign needs, e.g. after a codec fix or namelist change): replace the
    stored rows of ``doc_ids`` with a fresh detect of the current corpus
    payloads. Copy-on-write delete of the granules' rows first
    (``delete_detections``: views reconciled, manifest repaired, pre-delete
    snapshots poisoned), then the lineage frontier rows for those granules
    are dropped so the normal incremental path re-detects exactly them —
    the re-ingest is a plain ``run_incremental`` and therefore also picks
    up any genuinely new granules, with full lineage/snapshot accounting.
    The lineage rewrite is driver-bounded metadata (one row per granule);
    beyond ~1e7 granules the same Iceberg-snapshot-diff out applies as for
    the resume frontier."""
    import shutil

    ids = sorted(set(doc_ids))
    if not ids:
        return dict(reprocessed=0)
    quoted = ", ".join("'" + i.replace("'", "''") + "'" for i in ids)
    delete_detections(spark, out_dir, f"doc_id IN ({quoted})")
    lin_path = _lineage_path(out_dir)
    keep = spark.read.parquet(lin_path).filter(~F.col("partition_key").isin(ids))
    tmp = f"{out_dir}/_stage/lineage_{uuid.uuid4().hex[:12]}"
    keep.write.mode("overwrite").parquet(tmp)
    # rename-aside swap: the exposure window is two directory renames, not
    # an O(files) rmtree of the live frontier (losing lineage would make
    # the next run re-append every granule as duplicates)
    old = f"{out_dir}/_stage/lineage_old_{uuid.uuid4().hex[:12]}"
    os.rename(lin_path, old)
    os.rename(tmp, lin_path)
    shutil.rmtree(old)
    res = run_incremental(spark, corpus_dir, out_dir, nl)
    return dict(reprocessed=len(ids), run=res)


def _scrub_deleted_state(
    spark: SparkSession,
    out_dir: str,
    deleted: DataFrame,
    affected: list[str],
    emptied: list[str],
) -> None:
    """Post-delete view hygiene: remove deleted keys from the state
    partitions of every tile that held a deleted row (the neighborhood
    recompute overwrites only tiles with surviving ring1 rows), recompute
    the tiles rollup for those tiles, and drop partitions of emptied tiles.
    Bounded by the delete's tile footprint (<=648), never by the store."""
    import shutil

    state_root = f"{out_dir}/dedup_state"
    tiles_root = f"{out_dir}/tiles"
    live_tiles = sorted(set(affected) - set(emptied))
    keys = deleted.select(*STATE_KEY).distinct()
    if live_tiles:
        st = spark.read.parquet(state_root).filter(F.col("tile_id").isin(live_tiles))
        clean = st.join(F.broadcast(keys), STATE_KEY, "left_anti")
        stage = f"{out_dir}/_stage/scrub_{uuid.uuid4().hex[:12]}"
        clean.write.mode("overwrite").parquet(stage)
        clean = spark.read.parquet(stage)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            clean.write.mode("overwrite").partitionBy("tile_id").parquet(state_root)
            det = spark.read.parquet(f"{out_dir}/detections").filter(
                F.col("tile_id").isin(live_tiles)
            )
            joined = det.join(clean.select(*STATE_KEY, "is_dup"), STATE_KEY, "inner")
            pipeline.tiles(joined).write.mode("overwrite").partitionBy(
                "tile_id"
            ).parquet(tiles_root)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        shutil.rmtree(stage, ignore_errors=True)
    for t in emptied:
        shutil.rmtree(f"{state_root}/tile_id={t}", ignore_errors=True)
        shutil.rmtree(f"{tiles_root}/tile_id={t}", ignore_errors=True)


_ORPHAN_GRACE_S = 3600.0


def remove_orphan_files(out_dir: str, grace_s: float = _ORPHAN_GRACE_S, dry_run: bool = False) -> dict:
    """Orphan-file maintenance (the Iceberg ``remove_orphan_files``
    analogue): collect the debris a crashed job can leave on this layout —
    (a) ``_stage/*`` run dirs (a kill between staging and cleanup),
    (b) Spark's ``_temporary`` job-attempt dirs under any table root
    (a kill mid-write), (c) ``*.tmp-*`` leftovers of the manifest /
    snapshot-log atomic replaces. Committed data is never touched: every
    class is identified by layout position, not by diffing file listings
    against a manifest, because the parquet layout tracks membership at
    granule granularity (lineage), not file granularity. A grace period
    (mtime older than ``grace_s``) protects concurrently-running jobs,
    exactly like Iceberg's ``older_than``. Driver-side walk bounded by
    partition/metadata counts, not data size."""
    import shutil

    now = time.time()
    victims: list[str] = []

    def aged(path: str) -> bool:
        try:
            return now - os.path.getmtime(path) >= grace_s
        except OSError:
            return False

    def aged_tree(path: str) -> bool:
        # a stage dir's own mtime is set at creation; in-flight Spark task
        # files land deeper and keep updating leaf mtimes, so a long-running
        # staged write must be judged by its NEWEST entry, not its root
        newest = 0.0
        try:
            newest = os.path.getmtime(path)
            for dirpath, dirnames, filenames in os.walk(path):
                for e in dirnames + filenames:
                    newest = max(newest, os.path.getmtime(os.path.join(dirpath, e)))
        except OSError:
            return False
        return now - newest >= grace_s

    stage_root = f"{out_dir}/_stage"
    if os.path.isdir(stage_root):
        victims += [
            f"{stage_root}/{d}"
            for d in os.listdir(stage_root)
            if aged_tree(f"{stage_root}/{d}")
        ]
    for table in ("detections", "dedup_state", "tiles", "lineage"):
        troot = f"{out_dir}/{table}"
        if not os.path.isdir(troot):
            continue
        for dirpath, dirnames, _ in os.walk(troot):
            if "_temporary" in dirnames and aged_tree(f"{dirpath}/_temporary"):
                victims.append(f"{dirpath}/_temporary")
                dirnames.remove("_temporary")
    for meta in ("_manifest", "_snapshots"):
        mroot = f"{out_dir}/{meta}"
        if os.path.isdir(mroot):
            victims += [
                f"{mroot}/{fn}"
                for fn in os.listdir(mroot)
                if ".tmp-" in fn and aged(f"{mroot}/{fn}")
            ]

    removed = 0
    if not dry_run:
        for v in victims:
            if os.path.isdir(v):
                shutil.rmtree(v, ignore_errors=True)
            else:
                try:
                    os.remove(v)
                except OSError:
                    continue
            removed += 1
    return dict(orphans=sorted(victims), removed=removed, dry_run=dry_run)


def read_results(spark: SparkSession, out_dir: str) -> dict[str, DataFrame]:
    det = spark.read.parquet(f"{out_dir}/detections")
    state = _read_state(spark, out_dir)
    if state is not None:
        det = det.join(state.select(*STATE_KEY, "is_dup", "dup_of"), STATE_KEY, "left")
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
