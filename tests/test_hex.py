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


def test_exact_unpack_matches_float_unpack(spark):
    """cell_qr_exact / parent_exact (bit ops) agree with the float-division
    originals over the coordinate domain, and with numpy ground truth; the
    DuckDB twin qr_sql_exact agrees bit-for-bit too."""
    lat, lon = _pts(3000, seed=13)
    from pyspark.sql import functions as F

    for res in (hx.HEX_R7, hx.HEX_R8, hx.HEX_R9):
        c = hx.encode_np(lat, lon, res)
        df = spark.createDataFrame(pd.DataFrame(dict(cell=c)))
        qe, re_ = hx.cell_qr_exact(F.col("cell"))
        qf, rf = hx.cell_qr(F.col("cell"))
        out = df.select(
            qe.alias("qe"), re_.alias("re"), qf.alias("qf"), rf.alias("rf"),
            hx.parent_exact(F.col("cell"), res).alias("pe"),
            hx.parent(F.col("cell"), res).alias("pf"),
        ).toPandas()
        _, qn, rn = hx.unpack_np(c)
        assert (out["qe"].to_numpy() == qn).all()
        assert (out["re"].to_numpy() == rn).all()
        assert (out["qe"] == out["qf"]).all() and (out["re"] == out["rf"]).all()
        assert (out["pe"] == out["pf"]).all()
        assert (out["pe"].to_numpy() == hx.parent_np(c)).all()
        # DuckDB twin
        con = duckdb.connect()
        con.register("cells", pd.DataFrame(dict(cell=c)))
        qs, rs = hx.qr_sql_exact("cell")
        got = con.sql(f"SELECT {qs} AS q, {rs} AS r FROM cells").df()
        assert (got["q"].to_numpy() == qn).all()
        assert (got["r"].to_numpy() == rn).all()


def test_children_inverse_of_parent():
    """children(P) = center child + 6 neighbours is exactly parent^-1(P):
    all 7 map back to P, and no cell outside the set does (completeness
    follows from the exactly-7-children property test)."""
    lat, lon = _pts(2000, seed=17)
    for res in (3, hx.HEX_R7, hx.HEX_R8):
        cells = np.unique(hx.encode_np(lat, lon, res))
        kids = hx.children_np(cells)
        assert kids.shape == (len(cells), 7)
        par = hx.parent_np(kids.ravel()).reshape(kids.shape)
        assert (par == cells[:, None]).all()
        # children are distinct within and across parents
        assert len(np.unique(kids)) == kids.size


def test_uncompact_roundtrip_identity():
    """uncompact(compact(S), r9) == S for a lattice-structured set that
    exercises promotions at both levels (numpy ground truth of the
    hex_compact / hex_uncompact driver queries)."""
    ev = np.arange(0, 10000, dtype=np.int64)
    lat = (ev * 7919 % 1200).astype(np.float64) / 10000.0
    lon = (ev * 104729 % 1193).astype(np.float64) / 10000.0 + 10.0
    s9 = np.unique(hx.encode_np(lat, lon, 9))

    # compact: promote complete 7-child sets, two levels
    def compact(cells):
        out = []
        cur = cells
        for res in (9, 8):
            par = hx.parent_np(cur)
            uniq, counts = np.unique(par, return_counts=True)
            promoted = uniq[counts == 7]
            keep = ~np.isin(par, promoted)
            out.append(cur[keep])
            cur = promoted
        out.append(cur)
        return out  # [surv9, surv8, prom7]

    surv9, surv8, prom7 = compact(s9)
    assert len(prom7) > 0 and len(surv8) > 0  # both levels exercised

    # uncompact back to res 9
    back = [surv9]
    lvl8 = np.concatenate([surv8, hx.children_np(prom7).ravel()])
    back.append(hx.children_np(lvl8).ravel())
    got = np.sort(np.concatenate(back))
    assert (got == np.sort(s9)).all()


def test_line_path_properties():
    """Grid paths: start/end exactly on the endpoint cells, consecutive
    cells are hex-distance-1 neighbours, and length = hex_distance + 1."""
    ids = np.arange(300)
    a_lat = (ids * 7919 % 5000) / 1e4 + 30.0
    a_lon = (ids * 104729 % 5000) / 1e4 + 10.0
    b_lat = (ids * 31 % 5000) / 1e4 + 30.0
    b_lon = (ids * 57 % 5000) / 1e4 + 10.0
    offs, cells = hx.line_np(a_lat, a_lon, b_lat, b_lon, 7)
    ca = hx.encode_np(a_lat, a_lon, 7)
    cb = hx.encode_np(b_lat, b_lon, 7)
    assert (cells[offs[:-1]] == ca).all()
    assert (cells[offs[1:] - 1] == cb).all()
    d = hx.hex_distance_np(ca, cb)
    assert ((offs[1:] - offs[:-1]) == d + 1).all()
    for i in range(300):
        seg = cells[offs[i] : offs[i + 1]]
        if len(seg) > 1:
            assert (hx.hex_distance_np(seg[:-1], seg[1:]) == 1).all()
    # empty input
    o2, c2 = hx.line_np(np.array([]), np.array([]), np.array([]), np.array([]), 7)
    assert len(c2) == 0 and list(o2) == [0]
