"""Auxiliary sinks beyond the parquet stores:

- CSV (reference: writeCSV / dict2csv, FILDA_IO.py:1613-1624 /
  MCBEF_IO.py:564-574);
- NetCDF detections file (reference: write_nc + aux_infor_dict,
  FILDA_IO.py:1475-1563, 1337-1471) via the from-scratch classic CDF-1
  encoder in `filda_spark.netcdf3` (the container ships no netCDF4/HDF5;
  classic-format deviations documented there). The engine's canonical
  store remains partitioned parquet — this sink exists for file-level
  product parity.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from filda_spark import netcdf3


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """CSV sink with header, deterministic column order (sorted — CSV
    consumers diff these files), nulls as empty. ``single_file`` coalesces
    to one part for the reference's one-file-per-granule layout; leave
    False at scale (one file per task)."""
    out = df.select(*sorted(df.columns))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)


# Typed output dictionary for the NetCDF product — (dtype, units, long name)
# per emitted column, mirroring aux_infor_dict (FILDA_IO.py:1337-1471):
# i1/i2 counters+flags, f4 geophysical values, u4 packed QA.
AUX_INFO = {
    "FP_Line": ("i2", "none", "Granule line of fire pixel"),
    "FP_Sample": ("i2", "none", "Granule sample of fire pixel"),
    "FP_Latitude": ("f4", "degrees_north", "Latitude of fire pixel"),
    "FP_Longitude": ("f4", "degrees_east", "Longitude of fire pixel"),
    "FP_Status": ("i1", "none", "Contextual-test status (bit-packed, +pass)"),
    "FP_confidence": ("i1", "none", "Detection confidence class"),
    "FP_WinSize": ("i2", "none", "Background window size"),
    "FP_Power": ("f4", "MW", "Fire radiative power"),
    "FP_VE": ("f4", "W", "Visible energy"),
    "FP_VEF": ("f4", "none", "Visible energy fraction"),
    "FP_MCE": ("f4", "none", "Modified combustion efficiency"),
    "FP_Area_mod": ("f4", "m2", "M-band pixel area"),
    "FP_Num_Fire": ("i2", "none", "I-band detections sharing the M host"),
    "FP_Bowtie": ("f4", "none", "Bowtie overlap fraction"),
    "FP_Land_Type": ("i1", "none", "Land cover type (MCD12Q1; 17=water)"),
    "FP_Peatland": ("i1", "none", "Peatland flag"),
    "FP_Gas_Flaring": ("i1", "none", "Gas flaring flag"),
    "FP_SAA_flag": ("i1", "none", "South Atlantic Anomaly flag"),
}
_NP_OF = {"i1": np.int8, "i2": np.int16, "f4": np.float32, "u4": np.uint32}


def write_nc_detections(
    det: pd.DataFrame,
    path: str,
    mask_img: np.ndarray | None = None,
    mask_mod: np.ndarray | None = None,
    qa: np.ndarray | None = None,
    global_atts: dict | None = None,
) -> None:
    """One granule's detection product as a classic NetCDF file: nFire
    variables typed per AUX_INFO, optional 2-D Fire_mask (i1, nRow x nCol),
    M-band mask and Algorithm_QA (u4 -> NC_INT bits), plus an EPSG:4326 crs
    variable — the write_nc layout (FILDA_IO.py:1475-1563)."""
    n = len(det)
    dims: dict[str, int] = {"nFire": n}
    variables: dict[str, dict] = {}
    for col, (dt, units, long_name) in AUX_INFO.items():
        if col not in det.columns:
            continue
        vals = det[col].to_numpy()
        npdt = _NP_OF[dt]
        if np.issubdtype(npdt, np.integer):
            vals = np.nan_to_num(vals.astype(np.float64), nan=-999).astype(npdt)
        else:
            vals = vals.astype(npdt)
        variables[col] = dict(
            data=vals, dims=("nFire",), atts=dict(units=units, long_name=long_name)
        )
    if mask_img is not None:
        dims["nRow"], dims["nCol"] = mask_img.shape
        variables["Fire_mask"] = dict(
            data=mask_img.astype(np.int8),
            dims=("nRow", "nCol"),
            atts=dict(long_name="Fire mask", legend="3 water 4 cloud 5 land 7/8/9 fire"),
        )
    if mask_mod is not None:
        dims["nRow_M"], dims["nCol_M"] = mask_mod.shape
        variables["Fire_mask_mod"] = dict(
            data=mask_mod.astype(np.int8),
            dims=("nRow_M", "nCol_M"),
            atts=dict(long_name="M-band fire mask"),
        )
    if qa is not None:
        dims["nRow_QA"], dims["nCol_QA"] = qa.shape
        variables["Algorithm_QA"] = dict(
            data=qa.astype(np.uint32),
            dims=("nRow_QA", "nCol_QA"),
            atts=dict(long_name="Algorithm QA (32-bit packed, bit-reversed)"),
        )
    variables["crs"] = dict(
        data=np.array(0, dtype=np.int32),
        dims=(),
        atts=dict(
            grid_mapping_name="latitude_longitude",
            epsg_code="EPSG:4326",
        ),
    )
    netcdf3.write(path, dims, variables, global_atts or {})


def write_nc_store(det: DataFrame, masks: DataFrame, out_dir: str) -> DataFrame:
    """Distributed per-granule NetCDF product writer: cogroup detections
    with the mask blobs by doc_id and write one classic file per granule
    ON THE EXECUTORS (out_dir must be a shared filesystem at cluster
    scale — the same contract as any file sink). Returns one manifest row
    per written file."""
    import os

    def write_one(ddf: pd.DataFrame, mdf: pd.DataFrame) -> pd.DataFrame:
        if mdf.empty:
            return pd.DataFrame(dict(doc_id=[], path=[], n_fire=[]))
        m = mdf.iloc[0]
        doc_id = m["doc_id"]
        nrow, ncol = int(m["nrow"]), int(m["ncol"])
        mask_img = np.frombuffer(m["mask_img"], dtype=np.int8).reshape(nrow, ncol)
        mask_mod = np.frombuffer(m["mask_mod"], dtype=np.int8).reshape(nrow // 2, ncol // 2)
        qa = np.frombuffer(m["qa"], dtype=np.uint32).reshape(nrow, ncol)
        path = os.path.join(out_dir, f"{doc_id}.nc")
        write_nc_detections(
            ddf.reset_index(drop=True),
            path,
            mask_img=mask_img,
            mask_mod=mask_mod,
            qa=qa,
            global_atts=dict(doc_id=doc_id),
        )
        return pd.DataFrame(dict(doc_id=[doc_id], path=[path], n_fire=[len(ddf)]))

    return (
        det.groupBy("doc_id")
        .cogroup(masks.groupBy("doc_id"))
        .applyInPandas(write_one, "doc_id string, path string, n_fire int")
    )


def write_nc_mcbef(state: pd.DataFrame, samples: pd.DataFrame, state_path: str, sample_path: str) -> None:
    """MCBEF State + Sample NetCDF files (dict2nc, MCBEF_IO.py:588-697;
    schema src/MCBEF/output.rc): State carries the per-fire summary columns
    (f4) + QA (u4-style -> NC_INT); Sample carries the full posterior draws
    as (nFire, nSample) 2-D variables for t_s/p_s/t_f/p_f."""
    from filda_spark import mcbef

    n_fire = len(state)
    svars: dict[str, dict] = {}
    for c in state.columns:
        if c == "doc_id":
            continue
        vals = state[c].to_numpy()
        if c in ("FP_Line", "FP_Sample", "QA", "overpass", "FP_combined_land_type"):
            data = np.nan_to_num(vals.astype(np.float64), nan=-999).astype(np.int32)
        else:
            data = vals.astype(np.float32)
        svars[c] = dict(data=data, dims=("nFire",), atts={})
    netcdf3.write(state_path, {"nFire": n_fire}, svars, dict(product="MCBEF State"))

    # Sample: long-format draws pivoted to (nFire, nSample) in State row order
    key = ["doc_id", "FP_Line", "FP_Sample"]
    order = {tuple(r): i for i, r in enumerate(state[key].itertuples(index=False, name=None))}
    n_samp = mcbef.N_SAMPLES
    mats = {p: np.full((n_fire, n_samp), np.nan, dtype=np.float32) for p in ("t_s", "p_s", "t_f", "p_f")}
    if len(samples):
        idx = np.array([order[t] for t in samples[key].itertuples(index=False, name=None)])
        draw = samples["draw"].to_numpy()
        for p in mats:
            mats[p][idx, draw] = samples[p].to_numpy(dtype=np.float32)
    vvars = {
        p: dict(data=m, dims=("nFire", "nSample"), atts=dict(long_name=f"posterior draws of {p}"))
        for p, m in mats.items()
    }
    vvars["QA_flag"] = dict(
        data=np.nan_to_num(state["QA"].to_numpy(dtype=np.float64), nan=254).astype(np.int32),
        dims=("nFire",),
        atts={},
    )
    netcdf3.write(
        sample_path, {"nFire": n_fire, "nSample": n_samp}, vvars, dict(product="MCBEF Sample")
    )


def write_nc_ntl(clim: pd.DataFrame, tile: str, cells: int, path: str) -> None:
    """NTL climatology file for one Plate-Carree tile (write_nc_NTL,
    FILDA_IO.py:1627-1737): 1-D lat/lon coordinate variables + 2-D
    mean/std/gamma rasters on the tile grid; pixels without a climatology
    row stay NaN."""
    from filda_spark import ntl as _ntl  # noqa: F401  (layout provenance)

    hid = int(tile[1:3])
    vid = int(tile[4:6])
    lat_max = (9 - vid) * 10.0
    lon_min = (hid - 18) * 10.0
    resol = 10.0 / cells
    lats = (lat_max - (np.arange(cells) + 0.5) * resol).astype(np.float32)
    lons = (lon_min + (np.arange(cells) + 0.5) * resol).astype(np.float32)
    sub = clim[clim.tile == tile]
    rasters = {}
    for col in ("dnb_mean", "dnb_std", "gamma_alpha", "gamma_beta", "n_days"):
        grid = np.full((cells, cells), np.nan, dtype=np.float32)
        grid[sub.y.to_numpy(dtype=np.int64), sub.x.to_numpy(dtype=np.int64)] = sub[
            col
        ].to_numpy(dtype=np.float32)
        rasters[col] = grid
    variables = {
        "latitude": dict(data=lats, dims=("lat",), atts=dict(units="degrees_north")),
        "longitude": dict(data=lons, dims=("lon",), atts=dict(units="degrees_east")),
    }
    for col, grid in rasters.items():
        variables[col] = dict(data=grid, dims=("lat", "lon"), atts={})
    netcdf3.write(
        path, {"lat": cells, "lon": cells}, variables, dict(tile=tile, product="NTL climatology")
    )
