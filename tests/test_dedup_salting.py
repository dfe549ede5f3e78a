"""Hotspot salting in the dedup shuffle: forcing every cell hot
(salt_threshold=0) must leave the relation unchanged — the salted two-phase
join computes exactly what the unsalted join and the O(n^2) numpy reference
compute."""

import numpy as np
import pandas as pd

from filda_spark import pipeline, spatial


def _toy_detections(spark, n=200):
    rng = np.random.default_rng(11)
    # two "overpasses" of one hotspot: half the points are shifted copies
    lat = np.concatenate([rng.uniform(9.99, 10.01, n // 2)] * 2)
    lon = np.concatenate([rng.uniform(-50.01, -49.99, n // 2)] * 2)
    lat[n // 2 :] += 0.001
    pdf = pd.DataFrame(
        dict(
            doc_id=["A"] * (n // 2) + ["B"] * (n // 2),
            FP_Line=np.arange(n, dtype=np.int32),
            FP_Sample=np.arange(n, dtype=np.int32) * 2,
            FP_Latitude=lat,
            FP_Longitude=lon,
            FP_Power=rng.uniform(1, 50, n),
        )
    )
    return spark.createDataFrame(pdf), pdf


def test_salted_equals_unsalted_equals_numpy(spark):
    df, pdf = _toy_detections(spark)
    unsalted = (
        pipeline.dedup(df, salt_threshold=10**9)
        .select("doc_id", "FP_Line", "FP_Sample", "is_dup", "dup_of")
        .toPandas()
        .sort_values(["doc_id", "FP_Line"])
        .reset_index(drop=True)
    )
    salted = (
        pipeline.dedup(df, salt_threshold=0, n_salt=4)
        .select("doc_id", "FP_Line", "FP_Sample", "is_dup", "dup_of")
        .toPandas()
        .sort_values(["doc_id", "FP_Line"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(unsalted, salted)

    is_dup, dup_of = spatial.knn_dedup_np(
        pdf.doc_id.to_numpy(),
        pdf.FP_Latitude.to_numpy(),
        pdf.FP_Longitude.to_numpy(),
        pdf.FP_Power.to_numpy(),
        pdf.FP_Line.to_numpy(),
        pdf.FP_Sample.to_numpy(),
    )
    ref = (
        pd.DataFrame(
            dict(
                doc_id=pdf.doc_id,
                FP_Line=pdf.FP_Line,
                FP_Sample=pdf.FP_Sample,
                is_dup=is_dup,
                dup_of=dup_of,
            )
        )
        .sort_values(["doc_id", "FP_Line"])
        .reset_index(drop=True)
    )
    assert ref.is_dup.sum() > 0  # the toy data really contains duplicates
    assert (salted.is_dup.to_numpy() == ref.is_dup.to_numpy()).all()
    assert (salted.dup_of.to_numpy() == ref.dup_of.to_numpy()).all()


def test_high_latitude_ring_coverage(spark):
    """Above ~68.6N one eps of cos-corrected distance spans >1 level-14 cell
    of raw longitude; the latitude-aware ring must still find the pairs the
    O(n^2) numpy reference finds (a fixed k=1 ring misses them)."""
    # pairs at lat 75 and 84.5 separated by ~0.0075 deg corrected distance,
    # purely in longitude => 0.0075/cos(lat) raw degrees (2-4 cells apart)
    rows = []
    for i, lat in enumerate([75.0, 80.0, 84.5]):
        dlon = 0.0075 / np.cos(np.radians(lat))
        lon0 = -40.0 + i
        rows.append(("A", i, 0, lat, lon0, 30.0 + i))
        rows.append(("B", i, 1, lat, lon0 + dlon, 10.0 + i))
    pdf = pd.DataFrame(
        rows,
        columns=["doc_id", "FP_Line", "FP_Sample", "FP_Latitude", "FP_Longitude", "FP_Power"],
    )
    got = (
        pipeline.dedup(spark.createDataFrame(pdf))
        .select("doc_id", "FP_Line", "FP_Sample", "is_dup", "dup_of")
        .toPandas()
        .sort_values(["doc_id", "FP_Line"])
        .reset_index(drop=True)
    )
    is_dup, dup_of = spatial.knn_dedup_np(
        pdf.doc_id.to_numpy(),
        pdf.FP_Latitude.to_numpy(),
        pdf.FP_Longitude.to_numpy(),
        pdf.FP_Power.to_numpy(),
        pdf.FP_Line.to_numpy(),
        pdf.FP_Sample.to_numpy(),
    )
    ref = (
        pd.DataFrame(
            dict(
                doc_id=pdf.doc_id,
                FP_Line=pdf.FP_Line,
                FP_Sample=pdf.FP_Sample,
                is_dup=is_dup,
                dup_of=dup_of,
            )
        )
        .sort_values(["doc_id", "FP_Line"])
        .reset_index(drop=True)
    )
    assert ref.is_dup.sum() == 3  # every B point dominated by its A partner
    assert (got.is_dup.to_numpy() == ref.is_dup.to_numpy()).all()
    assert (got.dup_of.to_numpy() == ref.dup_of.to_numpy()).all()
