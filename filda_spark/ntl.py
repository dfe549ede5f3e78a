"""NTL (nighttime-light) climatology builder — the reference's second entry
point (`FILDA_Gen_NTL_main.py`, gen_NTL_climatology at FILDA_NTL.py:152-277)
as a pure DataFrame aggregation.

Semantics mirrored:
- 90-day window ending 7 days before the target month's first day
  (FILDA_NTL.py:152-173), with the mission-start special case (window start
  clamped to the mission epoch, FILDA_NTL.py:118-149);
- per-file pixel validity: cloud-mask bits decoded from a packed QF
  (clear = bits 0-1 == 0) AND five band-QF zeros (FILDA_NTL.py:94-115,
  210-219) — here a single packed uint ``qf`` column with the same bit
  layout: bits 0-1 cloud state, bits 2-6 band flags;
- coverage floor: a pixel series with fewer than 20% of window days present
  yields no climatology row (FILDA_NTL.py:199-202 inverted to per-pixel);
- outputs per (tile, y, x): mean, std (ddof=1), gamma method-of-moments
  alpha/beta via D = ln(mean) - mean(ln x):
  alpha = (1 + sqrt(1 + 4D/3)) / (4D), beta = mean/alpha
  (FILDA_NTL.py:226-271).

Scale: one shuffle on the (tile, y, x) key — high-cardinality, skew-free;
partial aggregation is map-side (sum/count/sum-of-logs), so the 90-day x
global-tile input reduces before the exchange.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MISSION_EPOCH = dt.date(2012, 1, 19)  # VIIRS DNB first light (public)
WINDOW_DAYS = 90
LAG_DAYS = 7
MIN_COVERAGE = 0.2


def window_for_month(year: int, month: int) -> tuple[dt.date, dt.date]:
    """[start, end) day window: 90 days ending 7 days before the 1st of the
    target month; start clamped to the mission epoch."""
    first = dt.date(year, month, 1)
    end = first - dt.timedelta(days=LAG_DAYS)
    start = end - dt.timedelta(days=WINDOW_DAYS)
    if start < MISSION_EPOCH:
        start = MISSION_EPOCH
    return start, end


def valid_mask(qf: F.Column) -> F.Column:
    """Packed-QF validity: cloud bits 0-1 clear AND band bits 2-6 zero."""
    return (qf.bitwiseAND(F.lit(0b1111111)) == 0).cast("int")


def climatology(daily: DataFrame, year: int, month: int) -> DataFrame:
    """daily: (tile string, y int, x int, day date, rad double, qf int)."""
    start, end = window_for_month(year, month)
    n_days = (end - start).days
    win = daily.filter((F.col("day") >= F.lit(start)) & (F.col("day") < F.lit(end)))
    win = win.filter(valid_mask(F.col("qf")) == 1).filter(F.col("rad") > 0)
    mean = F.avg("rad")
    d = F.log(mean) - F.avg(F.log("rad"))
    alpha = (F.lit(1.0) + F.sqrt(F.lit(1.0) + F.lit(4.0) * d / F.lit(3.0))) / (F.lit(4.0) * d)
    return (
        win.groupBy("tile", "y", "x")
        .agg(
            F.count("*").alias("n_days"),
            mean.alias("dnb_mean"),
            F.stddev_samp("rad").alias("dnb_std"),
            alpha.alias("gamma_alpha"),
            (mean / alpha).alias("gamma_beta"),
        )
        .filter(F.col("n_days") >= F.lit(int(np.ceil(n_days * MIN_COVERAGE))))
    )


def climatology_pdf(daily: pd.DataFrame, year: int, month: int) -> pd.DataFrame:
    """Single-node numpy twin (oracle)."""
    start, end = window_for_month(year, month)
    n_days = (end - start).days
    w = daily[(daily.day >= start) & (daily.day < end)]
    w = w[((w.qf.to_numpy() & 0b1111111) == 0) & (w.rad > 0)]
    rows = []
    for (tile, y, x), g in w.groupby(["tile", "y", "x"]):
        n = len(g)
        if n < int(np.ceil(n_days * MIN_COVERAGE)):
            continue
        r = g.rad.to_numpy()
        mean = r.mean()
        d = np.log(mean) - np.log(r).mean()
        alpha = (1.0 + np.sqrt(1.0 + 4.0 * d / 3.0)) / (4.0 * d)
        rows.append(
            dict(
                tile=tile,
                y=y,
                x=x,
                n_days=n,
                dnb_mean=mean,
                dnb_std=r.std(ddof=1),
                gamma_alpha=alpha,
                gamma_beta=mean / alpha,
            )
        )
    return pd.DataFrame(rows)


def synthetic_daily_pdf(n_tiles: int = 2, cells: int = 16, year: int = 2019, month: int = 8) -> pd.DataFrame:
    """Deterministic daily Black-Marble-like table covering the climatology
    window for (year, month): seeded per-pixel gamma-ish radiances, ~15%
    cloudy days (qf bit 0), a few band-flagged days (qf bit 3). Pure numpy
    (Knuth multiplicative hash) so the same table materializes identically
    with or without a Spark session — the DuckDB oracle reads the parquet
    this produces."""
    start, end = window_for_month(year, month)
    days = (end - start).days
    n = n_tiles * cells * cells * days
    i = np.arange(n, dtype=np.int64)
    day = np.array(start, dtype="datetime64[D]") + (i % days).astype("timedelta64[D]")
    pix = i // days
    tile = np.char.add(
        np.char.add("h", np.char.zfill((pix % n_tiles).astype(str), 2)), "v05"
    )
    y = (pix // n_tiles) % cells
    x = (pix // (n_tiles * cells)) % cells
    h = (i * np.int64(2654435761)) % np.int64(2**31)
    rad = (h % 1000).astype(np.float64) / 100.0 + 0.1
    qf = np.where(h % 7 == 0, 1, np.where(h % 31 == 0, 8, 0))
    return pd.DataFrame(
        dict(
            tile=tile,
            y=y.astype(np.int32),
            x=x.astype(np.int32),
            day=pd.to_datetime(day).date,
            rad=rad,
            qf=qf.astype(np.int32),
        )
    )


def synthetic_daily(spark, n_tiles: int = 2, cells: int = 16, year: int = 2019, month: int = 8) -> DataFrame:
    return spark.createDataFrame(synthetic_daily_pdf(n_tiles, cells, year, month))
