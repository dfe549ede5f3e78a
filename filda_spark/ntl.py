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
# special_handling (FILDA_NTL.py:118-149)
MISSION_START_YEAR = {"VNP": 2012, "VJ1": 2018}
HIGH_LAT_VID_MAX = 3  # Plate-Carree v < 3: permanent summer daylight


def effective_month(year: int, month: int, vid: int, sat: str = "VNP") -> tuple[int, int]:
    """The reference's special_handling (FILDA_NTL.py:118-149):
    - mission-start months (Jan-Apr of the satellite's first year) borrow
      the May climatology of that year;
    - high-latitude northern tiles (v < 3) have no darkness around summer,
      so every month borrows the December window (Sep/Oct/Nov data) of the
      previous year (clamped to the mission-start year)."""
    cut = MISSION_START_YEAR.get(sat)
    if cut is not None and year == cut and 1 <= month <= 4:
        month = 5
    if vid < HIGH_LAT_VID_MAX and cut is not None:
        year = cut if year <= cut else year - 1
        month = 12
    return year, month


def tile_vid(tile: str) -> int:
    """hXXvYY -> YY (FILDA_NTL.py:136 `int(tile[4:])`)."""
    return int(tile[4:6])


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


def climatology(daily: DataFrame, year: int, month: int, sat: str = "VNP") -> DataFrame:
    """daily: (tile string, y int, x int, day date, rad double, qf int).
    The day window is PER TILE: high-latitude tiles (v < 3) borrow the
    previous December's window (special_handling, FILDA_NTL.py:136-148)."""
    n_start, n_end = window_for_month(*effective_month(year, month, 99, sat))
    h_start, h_end = window_for_month(*effective_month(year, month, 0, sat))
    n_min = int(np.ceil((n_end - n_start).days * MIN_COVERAGE))
    h_min = int(np.ceil((h_end - h_start).days * MIN_COVERAGE))
    vid = F.substring("tile", 5, 2).cast("int")
    highlat = vid < HIGH_LAT_VID_MAX
    in_win = F.when(
        highlat, (F.col("day") >= F.lit(h_start)) & (F.col("day") < F.lit(h_end))
    ).otherwise((F.col("day") >= F.lit(n_start)) & (F.col("day") < F.lit(n_end)))
    min_days = F.when(highlat, F.lit(h_min)).otherwise(F.lit(n_min))
    win = daily.filter(in_win).filter(valid_mask(F.col("qf")) == 1).filter(F.col("rad") > 0)
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
        .filter(F.col("n_days") >= min_days)
    )


def climatology_pdf(daily: pd.DataFrame, year: int, month: int, sat: str = "VNP") -> pd.DataFrame:
    """Single-node numpy twin (oracle)."""
    n_start, n_end = window_for_month(*effective_month(year, month, 99, sat))
    h_start, h_end = window_for_month(*effective_month(year, month, 0, sat))
    vids = daily.tile.map(tile_vid)
    hl = (vids < HIGH_LAT_VID_MAX).to_numpy()
    day = daily.day.to_numpy()
    in_win = np.where(
        hl, (day >= h_start) & (day < h_end), (day >= n_start) & (day < n_end)
    )
    w = daily[in_win]
    w = w[((w.qf.to_numpy() & 0b1111111) == 0) & (w.rad > 0)]
    rows = []
    for (tile, y, x), g in w.groupby(["tile", "y", "x"]):
        n = len(g)
        days_span = (h_end - h_start).days if tile_vid(tile) < HIGH_LAT_VID_MAX else (n_end - n_start).days
        if n < int(np.ceil(days_span * MIN_COVERAGE)):
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


def synthetic_daily_pdf(
    n_tiles: int = 2, cells: int = 16, year: int = 2019, month: int = 8, sat: str = "VNP"
) -> pd.DataFrame:
    """Deterministic daily Black-Marble-like table: seeded per-pixel
    gamma-ish radiances, ~15% cloudy days (qf bit 0), a few band-flagged
    days (qf bit 3). Pure numpy (Knuth multiplicative hash) so the same
    table materializes identically with or without a Spark session — the
    DuckDB oracle reads the parquet this produces. Every other tile is a
    high-latitude v02 tile whose rows cover ITS effective (December)
    window, exercising special_handling."""
    frames = []
    gid = 0
    for t in range(n_tiles):
        v = 5 if t % 2 == 0 else 2
        tile_name = f"h{t:02d}v{v:02d}"
        start, end = window_for_month(*effective_month(year, month, v, sat))
        days = (end - start).days
        n = cells * cells * days
        j = np.arange(n, dtype=np.int64)
        i = j + gid
        gid += n
        day = np.array(start, dtype="datetime64[D]") + (j % days).astype("timedelta64[D]")
        pix = j // days
        y = pix % cells
        x = (pix // cells) % cells
        h = (i * np.int64(2654435761)) % np.int64(2**31)
        rad = (h % 1000).astype(np.float64) / 100.0 + 0.1
        qf = np.where(h % 7 == 0, 1, np.where(h % 31 == 0, 8, 0))
        frames.append(
            pd.DataFrame(
                dict(
                    tile=tile_name,
                    y=y.astype(np.int32),
                    x=x.astype(np.int32),
                    day=pd.to_datetime(day).date,
                    rad=rad,
                    qf=qf.astype(np.int32),
                )
            )
        )
    return pd.concat(frames, ignore_index=True)


def synthetic_daily(
    spark, n_tiles: int = 2, cells: int = 16, year: int = 2019, month: int = 8, sat: str = "VNP"
) -> DataFrame:
    return spark.createDataFrame(synthetic_daily_pdf(n_tiles, cells, year, month, sat))
