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
]


def run_suite(master: str, shuffle_partitions: int) -> dict[str, float]:
    from filda_spark import relational
    from filda_spark.session import get_spark

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
        return times
    finally:
        spark.stop()


def main() -> None:
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0
    if "--scaling" in sys.argv:
        lo_n, hi_n = 8, int(CPUS)
        t_lo = run_suite(f"local[{lo_n}]", lo_n)
        t_hi = run_suite(f"local[{hi_n}]", hi_n)
        tot_lo, tot_hi = sum(t_lo.values()), sum(t_hi.values())
        eff = (tot_lo / tot_hi) / (hi_n / lo_n)
        print(
            json.dumps(
                {
                    "metric": f"headline suite local[{lo_n}] vs local[{hi_n}]",
                    "value": round(tot_hi, 3),
                    "unit": "sec",
                    "queries": t_hi,
                    "sf": sf,
                    "scaling": {
                        f"local[{lo_n}]_sec": round(tot_lo, 3),
                        f"local[{hi_n}]_sec": round(tot_hi, 3),
                        "efficiency": round(eff, 3),
                    },
                }
            )
        )
        return
    times = run_suite(f"local[{CPUS}]", int(CPUS))
    print(
        json.dumps(
            {
                "metric": "headline operator suite wall time",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
