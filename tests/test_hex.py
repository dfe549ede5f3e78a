"""Property tests for the aperture-7 hexagonal index (filda_spark.hex):
roundtrip containment, 6-neighbour symmetry, exactly-7 children, sqrt(7)
edge scaling, and bit-parity of the numpy / PySpark-Column / DuckDB-SQL
triplets."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from filda_spark import hex as hx


def _pts(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-85.0, 85.0, n)
    lon = rng.uniform(-179.0, 179.0, n)
    return lat, lon


def test_roundtrip_within_circumradius():
    lat, lon = _pts()
    for res in (3, hx.HEX_R7, hx.HEX_R8, hx.HEX_R9):
        cell = hx.encode_np(lat, lon, res)
        clat, clon = hx.center_np(cell)
        d = np.hypot(clat - lat, clon - lon)
        assert d.max() <= hx.edge_deg(res) * (1 + 1e-9)
        # re-encoding the center returns the same cell
        assert (hx.encode_np(clat, clon, res) == cell).all()


def test_edge_scaling_sqrt7():
    for res in range(hx.MAX_RES):
        assert hx.edge_deg(res) / hx.edge_deg(res + 1) == pytest.approx(math.sqrt(7.0))
    assert hx.edge_deg(0) == pytest.approx(10.0)
    assert hx.edge_deg(7) == pytest.approx(0.011019, abs=1e-5)


def test_kring_symmetric_six_neighbors():
    lat, lon = _pts(500)
    cell = hx.encode_np(lat, lon, hx.HEX_R8)
    ring = hx.kring_np(cell, 1)
    assert ring.shape == (500, 7)
    # all distinct, self included, all at hex distance <= 1, symmetric
    for i in range(50):
        ids = ring[i]
        assert len(set(ids.tolist())) == 7
        assert cell[i] in ids
        d = hx.hex_distance_np(np.full(7, cell[i]), ids)
        assert set(d.tolist()) == {0, 1}
        for n in ids:
            back = hx.kring_np(np.array([n]), 1)[0]
            assert cell[i] in back
    # k=2 ring: 1 + 3k(k+1) = 19 cells
    assert hx.kring_np(cell[:5], 2).shape == (5, 19)


def test_every_parent_has_exactly_seven_children():
    # enumerate a solid patch of res-8 cells, map to parents, count
    res = hx.HEX_R8
    base = hx.encode_np(np.array([12.0]), np.array([33.0]), res)[0]
    _, q0, r0 = hx.unpack_np(np.array([base]))
    qs, rs = np.meshgrid(np.arange(-40, 41), np.arange(-40, 41))
    cells = hx._pack_np(q0[0] + qs.ravel(), r0[0] + rs.ravel(), res)
    parents = hx.parent_np(cells)
    counts = pd.Series(parents).value_counts()
    # interior parents (away from the patch boundary) have exactly 7 children
    interior = counts[counts == 7]
    assert len(interior) >= len(counts) * 0.7
    assert counts.max() == 7
    # parent center is within the parent circumradius of each child center
    clat, clon = hx.center_np(cells)
    plat, plon = hx.center_np(parents)
    d = np.hypot(plat - clat, plon - clon)
    assert d.max() <= hx.edge_deg(res - 1) * (1 + 1e-9)


def test_parent_chain_reaches_res0():
    lat, lon = _pts(200)
    cell = hx.encode_np(lat, lon, hx.HEX_R9)
    for res in range(hx.HEX_R9, 0, -1):
        assert (hx.unpack_np(cell)[0] == res).all()
        cell = hx.parent_np(cell)
    assert (hx.unpack_np(cell)[0] == 0).all()


def test_spark_column_twin_bit_parity(spark):
    lat, lon = _pts(3000)
    pdf = pd.DataFrame(dict(lat=lat, lon=lon))
    df = spark.createDataFrame(pdf)
    from pyspark.sql import functions as F

    for res in (hx.HEX_R7, hx.HEX_R8):
        got = (
            df.select(hx.encode(F.col("lat"), F.col("lon"), res).alias("c"))
            .toPandas()["c"]
            .to_numpy()
        )
        want = hx.encode_np(lat, lon, res)
        assert (got == want).all()
    # parent + kring twins
    c8 = hx.encode_np(lat, lon, hx.HEX_R8)
    df8 = spark.createDataFrame(pd.DataFrame(dict(cell=c8)))
    gp = (
        df8.select(hx.parent(F.col("cell"), hx.HEX_R8).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    assert (gp == hx.parent_np(c8)).all()
    gr = (
        df8.select(hx.kring(F.col("cell"), hx.HEX_R8, 1).alias("ring"))
        .toPandas()["ring"]
    )
    want_ring = hx.kring_np(c8, 1)
    assert all(sorted(gr[i]) == sorted(want_ring[i].tolist()) for i in range(200))


def test_duckdb_sql_twin_bit_parity():
    lat, lon = _pts(3000, seed=11)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame(dict(lat=lat, lon=lon)))
    for res in (hx.HEX_R7, hx.HEX_R9):
        sql = hx.encode_sql("lat", "lon", res)
        got = con.sql(f"SELECT {sql} AS c FROM pts").df()["c"].to_numpy()
        assert (got == hx.encode_np(lat, lon, res)).all()
    # parent twin from integer axial coords
    c8 = hx.encode_np(lat, lon, hx.HEX_R8)
    _, q, r = hx.unpack_np(c8)
    con.register("cells", pd.DataFrame(dict(q=q, r=r)))
    psql = hx.parent_sql("q", "r", hx.HEX_R8)
    got = con.sql(f"SELECT {psql} AS p FROM cells").df()["p"].to_numpy()
    assert (got == hx.parent_np(c8)).all()
