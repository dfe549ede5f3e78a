"""NTL climatology builder vs its numpy twin + window-date semantics."""

import datetime as dt

import numpy as np
import pandas as pd

from filda_spark import ntl


def test_window_semantics():
    start, end = ntl.window_for_month(2019, 8)
    assert end == dt.date(2019, 7, 25)  # 1 Aug - 7 days
    assert (end - start).days == 90
    # mission-start clamp
    start2, end2 = ntl.window_for_month(2012, 3)
    assert start2 == ntl.MISSION_EPOCH


def test_climatology_matches_numpy(spark):
    daily = ntl.synthetic_daily(spark, n_tiles=2, cells=8, year=2019, month=8)
    got = (
        ntl.climatology(daily, 2019, 8)
        .toPandas()
        .sort_values(["tile", "y", "x"])
        .reset_index(drop=True)
    )
    ref = (
        ntl.climatology_pdf(daily.toPandas(), 2019, 8)
        .sort_values(["tile", "y", "x"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ref) > 0
    for c in ("n_days", "dnb_mean", "dnb_std", "gamma_alpha", "gamma_beta"):
        rv = ref[c].to_numpy(dtype=float)
        gv = got[c].to_numpy(dtype=float)
        assert np.allclose(gv, rv, rtol=1e-12, atol=0), c


def test_coverage_floor(spark):
    daily = ntl.synthetic_daily(spark, n_tiles=1, cells=4, year=2019, month=8)
    # drop most days for pixel (0, 0): it must fall below 20% coverage
    from pyspark.sql import functions as F

    sparse = daily.filter(~((F.col("y") == 0) & (F.col("x") == 0)) | (F.dayofmonth("day") == 1))
    out = ntl.climatology(sparse, 2019, 8).toPandas()
    assert not ((out.y == 0) & (out.x == 0)).any()


def test_special_handling_months():
    """special_handling (FILDA_NTL.py:118-149): mission-start months borrow
    May; high-latitude v<3 tiles borrow the previous December."""
    # mission start: Jan-Apr 2012 (VNP) -> May 2012
    assert ntl.effective_month(2012, 2, vid=5) == (2012, 5)
    assert ntl.effective_month(2012, 5, vid=5) == (2012, 5)
    assert ntl.effective_month(2019, 8, vid=5) == (2019, 8)
    # high latitude: December of the PREVIOUS year (Sep/Oct/Nov window)
    assert ntl.effective_month(2019, 8, vid=2) == (2018, 12)
    assert ntl.effective_month(2012, 8, vid=0) == (2012, 12)  # clamped
    # VJ1 epoch
    assert ntl.effective_month(2018, 3, vid=5, sat="VJ1") == (2018, 5)
    assert ntl.effective_month(2019, 8, vid=1, sat="VJ1") == (2018, 12)


def test_high_latitude_tile_uses_december_window(spark):
    """A v02 tile's climatology rows must come from the borrowed December
    window while v05 rows use the normal window — and the Spark build must
    equal the numpy twin for both."""
    daily = ntl.synthetic_daily(spark, n_tiles=2, cells=4, year=2019, month=8)
    pdf = daily.toPandas()
    hl_days = pdf[pdf.tile.str.endswith("v02")].day
    n_days = pdf[pdf.tile.str.endswith("v05")].day
    h_start, h_end = ntl.window_for_month(2018, 12)
    n_start, n_end = ntl.window_for_month(2019, 8)
    assert hl_days.min() >= h_start and hl_days.max() < h_end
    assert n_days.min() >= n_start and n_days.max() < n_end

    got = (
        ntl.climatology(daily, 2019, 8)
        .toPandas()
        .sort_values(["tile", "y", "x"])
        .reset_index(drop=True)
    )
    ref = ntl.climatology_pdf(pdf, 2019, 8).sort_values(["tile", "y", "x"]).reset_index(drop=True)
    assert got.tile.str.endswith("v02").any() and got.tile.str.endswith("v05").any()
    assert len(got) == len(ref) > 0
    for c in ("n_days", "dnb_mean", "gamma_alpha"):
        assert np.allclose(got[c].to_numpy(float), ref[c].to_numpy(float), rtol=1e-12), c
