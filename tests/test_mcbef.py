"""MCBEF stage: the distributed Metropolis estimator must reproduce the
single-node twin draw-for-draw (deterministic per-fire seeding), and the
sampler semantics must hold (model gating, HDI, failure QA)."""

import numpy as np
import pandas as pd
import pytest

from filda_spark import mcbef


def test_deterministic_and_gating():
    row = pd.DataFrame(
        dict(
            doc_id=["VNP.A2019213.0200"],
            FP_Line=[10],
            FP_Sample=[20],
            FP_M11_Rad=[0.5],
            FP_M12_Rad=[0.8],
            FP_M13_Rad=[1.2],
            FP_M13_Rad_Mean=[0.6],
            FP_Power=[25.0],
            FP_Gas_Flaring=[0],
            FP_Area_mod=[562500.0],
        )
    )
    a = mcbef.estimate_pdf(row)
    b = mcbef.estimate_pdf(row)
    pd.testing.assert_frame_equal(a, b)  # fully deterministic
    assert a.iloc[0].QA == 0  # biphasic accepted
    assert a.iloc[0].t_f_mean > a.iloc[0].t_s_mean
    assert a.iloc[0].FP_Power_T == a.iloc[0].FP_Power_S + a.iloc[0].FP_Power_F

    row2 = row.assign(FP_Power=[0.2])  # below biphasic threshold
    c = mcbef.estimate_pdf(row2)
    assert c.iloc[0].QA == 101
    assert c.iloc[0].FP_Power_F == 0.0

    row3 = row.assign(FP_M12_Rad=[np.nan])
    d = mcbef.estimate_pdf(row3)
    assert d.iloc[0].QA == 100
    assert np.isnan(d.iloc[0].t_s_mean)


def test_hdi_and_mode():
    x = np.concatenate([np.random.default_rng(0).normal(0, 1, 900), np.full(100, 10.0)])
    lo, up = mcbef.hdi_95(x)
    assert lo < 3 and up <= 10.0  # narrowest 95% window
    assert abs(mcbef.mode_of(np.random.default_rng(1).normal(5, 0.1, 5000)) - 5) < 0.2


def test_spark_matches_single_node(spark, corpus, nl, oracle_res):
    from filda_spark import mcbef as M

    odet = oracle_res["detections"]
    ref = M.estimate_pdf(odet).sort_values(["doc_id", "FP_Line", "FP_Sample"]).reset_index(drop=True)
    sdf = spark.createDataFrame(odet)
    got = (
        M.estimate(sdf, n_parts=8)
        .toPandas()
        .sort_values(["doc_id", "FP_Line", "FP_Sample"])
        .reset_index(drop=True)
    )
    for c in ref.columns:
        rv, gv = ref[c].to_numpy(), got[c].to_numpy()
        if rv.dtype.kind == "f":
            assert np.array_equal(rv, gv, equal_nan=True), c
        else:
            assert (pd.Series(rv).astype(str) == pd.Series(gv).astype(str)).all(), c
