#!/usr/bin/env python
"""Benchmark runner: executes the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Each query is forced end-to-end with a noop sink (full physical plan, no
driver-side collect). Add ``--scaling`` to run the same suite at two
parallelism levels (local[8] vs local[32]) and report scaling efficiency —
the sandbox stand-in for the N vs 4N executor criterion.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline queries: the flagship fire pipeline entries are added to this list
# as they land; relational entries exercise each operator family at sf scale.
HEADLINE = [
    "cell_knn_count",
    "broadcast_lookup",
    "bottom_pct_threshold",
    "exact_median_mad",
    "stencil_adjacency",
    "window_host_count",
    "priority_paint",
    "group_stats_gamma",
    "planck_bt",
    "union_candidates_dedup",
    # training-data ops
    "exact_dedup",
    "minhash_lsh_pairs",
    "simhash_docs",
    "text_analysis",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
]


def run_suite(master: str, shuffle_partitions: int) -> tuple[dict[str, float], dict]:
    from filda_spark import fire_queries
    from filda_spark.session import get_spark

    # build the synthetic granule corpus before any timing starts
    geom = fire_queries._geom_for(SF_DIR)
    fire_queries.corpus_dir(geom)

    spark = get_spark("filda-bench", master=master, shuffle_partitions=shuffle_partitions)
    try:
        import __spark_entry__ as entrymod

        qmap = entrymod.queries()
        times: dict[str, float] = {}
        for name in HEADLINE:
            if name not in qmap:
                continue
            df = qmap[name](spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            times[name] = round(time.perf_counter() - t0, 3)

        # headline fire pipeline, production path: decode -> detect ->
        # enrich -> write detections -> global kNN dedup -> tiles
        # (the BASELINE.json metric: granules/hour, detections/sec)
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from filda_spark import runner

        out = tempfile.mkdtemp(prefix="filda_bench_out_")
        try:
            t0 = time.perf_counter()
            runner.run_incremental(spark, fire_queries.corpus_dir(geom), out, fire_queries._nl(geom))
            agg = (
                spark.read.parquet(f"{out}/detections")
                .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("docs"))
                .collect()[0]
            )
            fire_wall = time.perf_counter() - t0
        finally:
            shutil.rmtree(out, ignore_errors=True)
        times["fire_pipeline"] = round(fire_wall, 3)
        fire = dict(
            granules=int(agg.docs),
            detections=int(agg.n),
            granules_per_hour=round(agg.docs * 3600.0 / fire_wall, 1),
            detections_per_sec=round(agg.n / fire_wall, 1),
        )
        return times, fire
    finally:
        spark.stop()


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    if "--scaling" in sys.argv:
        # N vs 4N parallelism on the same input — the sandbox stand-in for
        # the two-cluster-size scaling criterion (north rule)
        lo_n, hi_n = 8, int(CPUS)
        t_lo, f_lo = run_suite(f"local[{lo_n}]", lo_n)
        t_hi, f_hi = run_suite(f"local[{hi_n}]", hi_n)
        tot_lo, tot_hi = sum(t_lo.values()), sum(t_hi.values())
        eff = (tot_lo / tot_hi) / (hi_n / lo_n)
        fire_eff = (
            f_hi["granules_per_hour"] / f_lo["granules_per_hour"] / (hi_n / lo_n)
            if f_lo["granules_per_hour"]
            else 0.0
        )
        print(
            json.dumps(
                {
                    "metric": f"headline suite local[{lo_n}] vs local[{hi_n}]",
                    "value": round(tot_hi, 3),
                    "unit": "sec",
                    "queries": t_hi,
                    "sf": sf,
                    "fire": f_hi,
                    "scaling": {
                        f"local[{lo_n}]_sec": round(tot_lo, 3),
                        f"local[{hi_n}]_sec": round(tot_hi, 3),
                        "efficiency": round(eff, 3),
                        f"fire_granules_per_hour_local[{lo_n}]": f_lo["granules_per_hour"],
                        f"fire_granules_per_hour_local[{hi_n}]": f_hi["granules_per_hour"],
                        "fire_scaling_efficiency": round(fire_eff, 3),
                    },
                }
            )
        )
        return
    times, fire = run_suite(f"local[{CPUS}]", int(CPUS))
    print(
        json.dumps(
            {
                "metric": "headline operator suite wall time (incl. fire pipeline)",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "fire": fire,
            }
        )
    )


if __name__ == "__main__":
    main()
