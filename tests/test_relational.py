"""Every registered relational operator must match its DuckDB oracle
exactly (the driver's correctness gate, run here at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from filda_spark import relational
from filda_spark import training  # noqa: F401  (registers training-data ops)
from filda_spark.compare import compare, duckdb_con

NAMES = sorted(relational.REGISTRY)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = relational.REGISTRY[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0
        return
    sdf = spec.fn(spark, sf_dir)
    odf = con.sql(spec.oracle).df()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: {issues}"


def test_spatiotemporal_salting_mirrors_pairs(spark):
    """Hot-key salting must be result-invariant: a degenerate (cell,
    time-bucket) — everything co-located at one flare during one bucket —
    split n_salt ways returns EXACTLY the pair set of the unsalted plan
    (round-3 VERDICT next-step #4; same contract as pipeline.dedup's
    (cell, salt) repartition)."""
    from pyspark.sql import functions as F

    # the op derives lat/lon from event_id (id*7919%2000, id*104729%2400):
    # ids congruent mod 12000 map to the IDENTICAL point, so 60 of them in
    # one time bucket make one degenerate (cell, bucket) with 1770 pairs;
    # plus a scattered cold tail that must keep salt 0
    rows = [(7 + k * 12_000, k * 1000) for k in range(60)] + [
        (1_000 + j, 40_000_000 + j * 100_000) for j in range(25)
    ]
    ev = spark.createDataFrame(rows, "event_id long, ms long").select(
        "event_id", F.timestamp_millis(F.col("ms")).alias("ts")
    )
    salted = relational._spatiotemporal_pairs(
        spark, "", salt_threshold=10, n_salt=4, events=ev
    )
    unsalted = relational._spatiotemporal_pairs(
        spark, "", salt_threshold=1 << 30, events=ev
    )
    a = sorted(map(tuple, salted.collect()))
    b = sorted(map(tuple, unsalted.collect()))
    assert len(a) > 0 and a == b


def test_ann_bucket_cap_bounds_degenerate_cluster(spark):
    """A duplicate-embedding cluster larger than ANN_BUCKET_CAP lands in ONE
    bucket per hash table; without the cap the pair join is quadratic in the
    cluster size. The cap must drop those buckets entirely while keeping
    normal-sized buckets intact (round-2 VERDICT weak #2)."""
    import math

    from pyspark.sql import functions as F

    dup = [(i, [0.1] * training.DIM) for i in range(training.ANN_BUCKET_CAP + 50)]
    # distinct unit-ish vectors, one per id, far from the duplicate cluster
    normal = [
        (10_000 + j, [math.sin(0.7 * j + 0.13 * i) for i in range(training.DIM)])
        for j in range(20)
    ]
    df = spark.createDataFrame(dup + normal, "vec_id long, embedding array<double>")
    b = training._bucket_long(df)
    capped = training._cap_buckets(b)
    # every duplicate-cluster row occupies the same bucket in every table ->
    # all its buckets exceed the cap and are dropped
    dup_left = capped.filter(F.col("vec_id") < 10_000).count()
    assert dup_left == 0
    # the normal vectors survive in (most of) their tables — a normal vector
    # that happens to share a hot bucket in one table is dropped only there
    n_normal = capped.filter(F.col("vec_id") >= 10_000).count()
    assert 20 <= n_normal <= 20 * training.N_TABLES
    # and the candidate pair count is bounded: pairs only among survivors
    a = capped.select(F.col("vec_id").alias("vec_a"), "tbl", "bucket")
    c = capped.select(F.col("vec_id").alias("vec_b"), "tbl", "bucket")
    n_pairs = (
        a.join(c, ["tbl", "bucket"]).filter(F.col("vec_a") < F.col("vec_b")).count()
    )
    assert n_pairs <= training.N_TABLES * (20 * 19) // 2


def test_embedding_neardup_seeds_nonvacuous(spark, sf_dir):
    """The seeded near-dup pairs must actually emit (the round-2 oracle was
    hash-parity on an empty result)."""
    from pyspark.sql import functions as F

    out = relational.REGISTRY["embedding_neardup"].fn(spark, sf_dir).collect()
    assert len(out) >= training.NEARDUP_SEEDS
    for r in out:
        assert r.cos >= 0.95
    seeded = {r.vec_a for r in out}
    assert set(range(training.NEARDUP_SEEDS)) <= seeded


def test_hll_estimator_accuracy(spark, sf_dir):
    """The HLL estimate reconstructed from the register output tracks the
    exact distinct count within the p=8 error envelope (~1.04/sqrt(256) =
    6.5% relative standard error; assert 3 sigma)."""
    import numpy as np
    from pyspark.sql import functions as F

    m = relational._HLL_M
    regs = relational.REGISTRY["hll_registers"].fn(spark, sf_dir).collect()
    exact = {
        r.event_type: r.n
        for r in relational._t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    by_group: dict = {}
    for r in regs:
        by_group.setdefault(r.event_type, np.zeros(m, dtype=np.int64))[r.register] = r.max_rho
    alpha = 0.7213 / (1 + 1.079 / m)
    for et, M in by_group.items():
        est = alpha * m * m / np.sum(np.power(2.0, -M.astype(np.float64)))
        zeros = int(np.sum(M == 0))
        if est <= 2.5 * m and zeros > 0:  # small-range (linear counting) correction
            est = m * np.log(m / zeros)
        assert abs(est - exact[et]) / exact[et] < 0.20, (et, est, exact[et])
