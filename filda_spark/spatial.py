"""Spatial layer: point-in-polygon against broadcast polygon sets, detection
cell encoding (qcell r7/r8/r9 + token + reference tile ids), kNN-style
cross-granule dedup, and 3x3 adjacency counts.

All functions are numpy (shared by oracle and Spark kernels). The Spark side
broadcasts the polygon set and runs these inside Arrow-batched UDFs; the
north rule's "broadcast polygon R-tree" is realized as a two-level filter:
bounding-box prefilter (vectorized, the R-tree role at fixture scale — at
production scale the boxes are bucketed by qcell parent) then exact
ray-casting.
"""

from __future__ import annotations

import numpy as np

from filda_spark.grids import LEVEL_R7, LEVEL_R8, LEVEL_R9, cell_encode_np, pc_tile_np


def point_in_polygon_np(lat, lon, poly_lat, poly_lon):
    """Even-odd ray casting (vectorized over points, loop over edges)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    inside = np.zeros(lat.shape, dtype=bool)
    n = len(poly_lat)
    j = n - 1
    for i in range(n):
        yi, xi = poly_lat[i], poly_lon[i]
        yj, xj = poly_lat[j], poly_lon[j]
        cross = (yi > lat) != (yj > lat)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = (xj - xi) * (lat - yi) / (yj - yi) + xi
        inside ^= cross & (lon < x_at)
        j = i
    return inside


def assign_polygons_np(lat, lon, polys: list[dict], id_key: str):
    """Point-in-polygon-set: returns the matching polygon id or -1.
    Bounding-box prefilter before exact test (broadcast R-tree role)."""
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    out = np.full(lat.shape, -1, dtype=np.int32)
    for p in polys:
        pla, plo = np.asarray(p["lat"]), np.asarray(p["lon"])
        cand = (
            (lat >= pla.min())
            & (lat <= pla.max())
            & (lon >= plo.min())
            & (lon <= plo.max())
            & (out < 0)
        )
        if not cand.any():
            continue
        hit = point_in_polygon_np(lat[cand], lon[cand], pla, plo)
        idx = np.nonzero(cand)[0] if lat.ndim == 1 else None
        if idx is not None:
            out[idx[hit]] = p[id_key]
        else:
            tmp = out[cand]
            tmp[hit] = p[id_key]
            out[cand] = tmp
    return out


S2_TOKEN_LEVEL = 14  # ~600 m edge, the r8-equivalent resolution


def encode_cells_np(det: dict) -> dict:
    """Add qcell r7/r8/r9 ids, the S2 cell token (level 14, filda_spark.s2),
    and the reference Plate-Carree tile id to a detections dict of 1-D
    arrays."""
    from filda_spark import s2

    lat, lon = det["FP_Latitude"], det["FP_Longitude"]
    det["cell_r7"] = cell_encode_np(lat, lon, LEVEL_R7)
    det["cell_r8"] = cell_encode_np(lat, lon, LEVEL_R8)
    det["cell_r9"] = cell_encode_np(lat, lon, LEVEL_R9)
    det["s2_token"] = s2.token(s2.cell_id(lat, lon, S2_TOKEN_LEVEL))
    hid, vid, _, _ = pc_tile_np(lat, lon)
    det["tile_id"] = np.array([f"h{h:02d}v{v:02d}" for h, v in zip(hid, vid)])
    return det


DEDUP_EPS_DEG = 0.008  # ~ one M pixel across the re-observation shift


def knn_dedup_np(doc_id, lat, lon, power, line, sample, eps: float = DEDUP_EPS_DEG):
    """Cross-granule kNN dominance dedup.

    A detection is a duplicate iff another detection from a DIFFERENT granule
    lies within ``eps`` (equirectangular degrees, cos-lat corrected) and has
    strictly higher priority, where priority orders by (FP_Power desc — NaN
    lowest, doc_id, line, sample). Returns (is_dup bool[], dup_of str[]).

    Single-node reference implementation (O(n^2), fine at fixture scale);
    the engine computes the identical relation with a cell-neighborhood
    shuffle join (kRing duplicate -> per-cell pairs) — see pipeline.dedup.
    """
    doc_id = np.asarray(doc_id)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    power = np.asarray(power, dtype=np.float64)
    n = lat.size
    pw = np.where(np.isnan(power), -np.inf, power)
    keys = list(zip(doc_id.tolist(), np.asarray(line).tolist(), np.asarray(sample).tolist()))
    is_dup = np.zeros(n, dtype=bool)
    dup_of = np.array([""] * n, dtype=object)
    coslat = np.cos(np.radians(lat))
    for i in range(n):
        dlat = lat - lat[i]
        dlon = (lon - lon[i]) * coslat[i]
        near = (dlat * dlat + dlon * dlon) <= eps * eps
        near &= doc_id != doc_id[i]
        if not near.any():
            continue
        cand = np.nonzero(near)[0]
        # strictly higher priority than i?
        best = None
        for j in cand:
            a = (-pw[j], str(doc_id[j]), keys[j][1], keys[j][2])
            b = (-pw[i], str(doc_id[i]), keys[i][1], keys[i][2])
            if a < b and (best is None or a < best[0]):
                best = (a, j)
        if best is not None:
            is_dup[i] = True
            j = best[1]
            dup_of[i] = f"{doc_id[j]}:{keys[j][1]}:{keys[j][2]}"
    return is_dup, dup_of.astype(str)


def adjacency_counts_np(cm_img: np.ndarray, lwm_img: np.ndarray, line, sample):
    """3x3 neighbor counts of cloudy (CM<=0) and water (lwm!=1) pixels around
    each detection (FILDA.py:2179-2254 stencil semantics, window clamped at
    granule edges)."""
    h, w = cm_img.shape
    line = np.asarray(line)
    sample = np.asarray(sample)
    n_cloud = np.zeros(line.size, dtype=np.int8)
    n_water = np.zeros(line.size, dtype=np.int8)
    for k in range(line.size):
        l0, l1 = max(line[k] - 1, 0), min(line[k] + 2, h)
        s0, s1 = max(sample[k] - 1, 0), min(sample[k] + 2, w)
        cl = cm_img[l0:l1, s0:s1] <= 0
        wa = lwm_img[l0:l1, s0:s1] != 1
        # exclude the centre pixel itself
        cl_n = int(cl.sum()) - int(cm_img[line[k], sample[k]] <= 0)
        wa_n = int(wa.sum()) - int(lwm_img[line[k], sample[k]] != 1)
        n_cloud[k] = cl_n
        n_water[k] = wa_n
    return n_cloud, n_water
