"""Auxiliary sinks beyond the parquet stores (reference: writeCSV /
dict2csv, FILDA_IO.py:1613-1624 / MCBEF_IO.py:564-574 — pandas CSV dumps of
the detection and State tables).

NetCDF sinks (write_nc, FILDA_IO.py:1475-1563; dict2nc, MCBEF_IO.py:588-697)
remain a documented seam: this container ships no netCDF4, and the engine's
canonical store is partitioned parquet — the typed column dictionary the
NetCDF writer would consume is `oracle.DET_COLUMNS` / `mcbef.STATE_FIELDS`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header, deterministic column order (sorted — CSV
    consumers diff these files), nulls as empty. ``single_file`` coalesces
    to one part for the reference's one-file-per-granule layout; leave
    False at scale (one file per task)."""
    out = df.select(*sorted(df.columns))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
