"""From-scratch classic NetCDF-3 (CDF-1) encoder: golden header bytes pinned
to the public file-format spec, full round-trip through our own reader, and
the write_nc-shaped detections sink over real pipeline output."""

import struct

import numpy as np
import pandas as pd

from filda_spark import netcdf3, sinks


def test_golden_header_bytes(tmp_path):
    """A minimal file's byte layout against the spec: magic CDF\\x01,
    numrecs, NC_DIMENSION list, ABSENT gatts, NC_VARIABLE list with
    big-endian type/vsize/begin, 4-byte-aligned data."""
    p = str(tmp_path / "tiny.nc")
    netcdf3.write(
        p,
        dims={"n": 3},
        variables={"v": dict(data=np.array([1, 2, 3], dtype=np.int16), dims=("n",))},
    )
    buf = open(p, "rb").read()
    assert buf[:4] == b"CDF\x01"
    assert struct.unpack_from(">i", buf, 4)[0] == 0  # numrecs
    # dim list: tag NC_DIMENSION(10), nelems 1, name "n" (len 1 + pad), size 3
    assert struct.unpack_from(">ii", buf, 8) == (10, 1)
    assert struct.unpack_from(">i", buf, 16)[0] == 1  # name length
    assert buf[20:21] == b"n" and buf[21:24] == b"\x00\x00\x00"  # padded to 4
    assert struct.unpack_from(">i", buf, 24)[0] == 3  # dim size
    # gatts ABSENT (0, 0); var list tag NC_VARIABLE(11), 1 var
    assert struct.unpack_from(">ii", buf, 28) == (0, 0)
    assert struct.unpack_from(">ii", buf, 36) == (11, 1)
    # var: name "v", 1 dim (id 0), ABSENT atts, NC_SHORT(3), vsize 8 (6->pad), begin
    off = 44
    assert struct.unpack_from(">i", buf, off)[0] == 1
    assert buf[off + 4 : off + 5] == b"v"
    assert struct.unpack_from(">ii", buf, off + 8) == (1, 0)  # ndims, dimid
    assert struct.unpack_from(">ii", buf, off + 16) == (0, 0)  # ABSENT atts
    t, vsize, begin = struct.unpack_from(">iii", buf, off + 24)
    assert t == 3 and vsize == 8  # NC_SHORT, 3*2 rounded up to 4
    assert begin == len(buf) - 8
    # data: big-endian shorts + 2 pad bytes
    assert buf[begin:] == b"\x00\x01\x00\x02\x00\x03\x00\x00"


def test_roundtrip_types_and_atts(tmp_path):
    p = str(tmp_path / "rt.nc")
    rng = np.random.default_rng(5)
    f8 = rng.normal(size=(4, 5))
    u4 = rng.integers(0, 2**32, size=6, dtype=np.uint32)
    netcdf3.write(
        p,
        dims={"a": 4, "b": 5, "n": 6},
        variables={
            "grid": dict(data=f8, dims=("a", "b"), atts=dict(units="K", scale=np.float64(2.5))),
            "qa": dict(data=u4, dims=("n",), atts=dict(long_name="packed")),
            "flag": dict(data=np.array([-3, 7, 120, -128, 127, 0], dtype=np.int8), dims=("n",)),
        },
        global_atts=dict(title="filda test", version=np.int32(2)),
    )
    back = netcdf3.read(p)
    assert back["dims"] == {"a": 4, "b": 5, "n": 6}
    assert back["global_atts"]["title"] == "filda test"
    assert int(back["global_atts"]["version"][0]) == 2
    assert np.array_equal(back["variables"]["grid"]["data"], f8)  # f8 lossless
    assert back["variables"]["grid"]["atts"]["units"] == "K"
    # u4 stored as NC_INT bit-reinterpret: lossless through .view
    assert np.array_equal(back["variables"]["qa"]["data"].view(np.uint32), u4)
    assert np.array_equal(
        back["variables"]["flag"]["data"],
        np.array([-3, 7, 120, -128, 127, 0], dtype=np.int8),
    )


def test_write_nc_detections_product(tmp_path, oracle_res):
    """The write_nc-shaped product (FILDA_IO.py:1475-1563) over a real
    granule: typed nFire variables, 2-D masks, bit-reinterpreted QA, crs."""
    doc_id, per = next(iter(oracle_res["per_doc"].items()))
    det = oracle_res["detections"]
    one = det[det.doc_id == doc_id].reset_index(drop=True)
    p = str(tmp_path / "product.nc")
    sinks.write_nc_detections(
        one,
        p,
        mask_img=per["mask_img"],
        mask_mod=per["mask_mod"],
        qa=per["qa"],
        global_atts=dict(doc_id=doc_id, DayNightFlag="Night"),
    )
    back = netcdf3.read(p)
    assert back["dims"]["nFire"] == len(one)
    assert back["global_atts"]["doc_id"] == doc_id
    # f4 variables round-trip at float32 precision
    assert np.allclose(
        back["variables"]["FP_Latitude"]["data"],
        one.FP_Latitude.to_numpy(dtype=np.float32),
        rtol=0,
        atol=0,
    )
    assert back["variables"]["FP_Power"]["atts"]["units"] == "MW"
    # i2 line/sample exact
    assert np.array_equal(
        back["variables"]["FP_Line"]["data"], one.FP_Line.to_numpy(dtype=np.int16)
    )
    # masks byte-exact; QA bits lossless through the NC_INT reinterpret
    assert np.array_equal(back["variables"]["Fire_mask"]["data"], per["mask_img"].astype(np.int8))
    assert np.array_equal(
        back["variables"]["Algorithm_QA"]["data"].view(np.uint32), per["qa"].astype(np.uint32)
    )
    assert back["variables"]["crs"]["atts"]["epsg_code"] == "EPSG:4326"


def test_reader_rejects_non_cdf(tmp_path):
    p = tmp_path / "junk.nc"
    p.write_bytes(b"HDF\x01 not classic")
    import pytest

    with pytest.raises(ValueError, match="CDF-1"):
        netcdf3.read(str(p))


def test_write_nc_store_distributed(spark, corpus, nl, tmp_path):
    """Executor-side per-granule NetCDF writing over the Spark pipeline
    outputs: one file per night granule, contents matching the store."""
    from filda_spark import pipeline

    out = str(tmp_path / "nc_products")
    import os

    os.makedirs(out)
    det = pipeline.detect_detections(spark, corpus["dir"], nl)
    masks = pipeline.detect_masks(spark, corpus["dir"], nl)
    manifest = sinks.write_nc_store(det, masks, out).toPandas()
    assert len(manifest) == 7  # 8 docs - 1 Day granule
    assert manifest.n_fire.sum() > 0
    row = manifest.sort_values("doc_id").iloc[0]
    back = netcdf3.read(row.path)
    assert back["dims"]["nFire"] == row.n_fire
    assert back["global_atts"]["doc_id"] == row.doc_id
    assert back["variables"]["Fire_mask"]["data"].shape == (
        back["dims"]["nRow"],
        back["dims"]["nCol"],
    )


def test_write_nc_mcbef(tmp_path):
    """dict2nc-shaped MCBEF State + Sample files (output.rc layout): draws
    pivot losslessly from the long Sample table into (nFire, nSample)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    from test_mcbef import make_row

    from filda_spark import mcbef

    rows = pd.concat([make_row(), make_row(FP_Line=11, FP_Gas_Flaring=1)], ignore_index=True)
    state = mcbef.estimate_pdf(rows)
    samples = mcbef.estimate_samples_pdf(rows)
    sp, pp = str(tmp_path / "state.nc"), str(tmp_path / "sample.nc")
    sinks.write_nc_mcbef(state, samples, sp, pp)
    s_back = netcdf3.read(sp)
    assert s_back["dims"]["nFire"] == 2
    assert np.allclose(
        s_back["variables"]["t_f_mean"]["data"],
        state.t_f_mean.to_numpy(dtype=np.float32),
        equal_nan=True,
    )
    assert np.array_equal(s_back["variables"]["QA"]["data"], state.QA.to_numpy(dtype=np.int32))
    v_back = netcdf3.read(pp)
    assert v_back["dims"] == {"nFire": 2, "nSample": mcbef.N_SAMPLES}
    d = v_back["variables"]["t_f"]["data"]
    ref_row0 = samples[
        (samples.FP_Line == int(state.iloc[0].FP_Line))
    ].sort_values("draw").t_f.to_numpy(dtype=np.float32)
    assert np.array_equal(d[0], ref_row0)


def test_write_nc_ntl_layout(tmp_path):
    """write_nc_NTL layout (FILDA_IO.py:1627-1737): 1-D coordinate vars +
    2-D climatology rasters, unset pixels NaN."""
    from filda_spark import ntl

    daily = ntl.synthetic_daily_pdf(n_tiles=1, cells=8)
    clim = ntl.climatology_pdf(daily, 2019, 8)
    tile = clim.tile.iloc[0]
    p = str(tmp_path / "ntl.nc")
    sinks.write_nc_ntl(clim, tile, cells=8, path=p)
    back = netcdf3.read(p)
    assert back["dims"] == {"lat": 8, "lon": 8}
    assert back["variables"]["latitude"]["data"].shape == (8,)
    grid = back["variables"]["dnb_mean"]["data"]
    row = clim.iloc[0]
    assert np.isclose(grid[int(row.y), int(row.x)], np.float32(row.dnb_mean))
    assert back["global_atts"]["tile"] == tile
