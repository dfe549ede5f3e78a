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
