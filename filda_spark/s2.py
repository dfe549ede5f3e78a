"""S2 cell ids from scratch (vectorized numpy + Arrow UDF wrapper).

Implements the public S2 geometry cell-id structure (s2geometry.io docs):
- lat/lon -> unit xyz -> cube face (0..5, largest |axis| component);
- face (u,v) -> (s,t) via the quadratic projection
  s = 1/2*sqrt(1+3u) for u>=0, 1 - 1/2*sqrt(1-3u) otherwise;
- (s,t) -> 30-bit (i,j) leaf coordinates;
- (i,j) -> position along a face-filling Hilbert curve;
- 64-bit id = face(3 bits) | curve position | trailing marker bit
  (the id of a level-k cell has its lowest set bit at position 2*(30-k));
- token = 16-hex-digit id with trailing zeros stripped.

The Hilbert traversal uses the classic rotate/reflect recurrence; cell ids
therefore carry the full S2 *structure* (hierarchy by bit truncation,
spatial locality, face partition) — byte-for-byte parity with the official
library's per-face curve orientation is untestable in this container (no s2
package to compare against) and is documented as unverified. All engine
invariants (determinism, parent containment, level arithmetic) are tested.

No external code was copied; written from the published algorithm
description.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_N = 1 << MAX_LEVEL


def _latlon_to_xyz(lat, lon):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    with np.errstate(divide="ignore", invalid="ignore"):
        for f, (ue, ve, de) in enumerate(
            [
                (lambda: y / x, lambda: z / x, None),  # face 0: +x
                (lambda: -x / y, lambda: z / y, None),  # face 1: +y
                (lambda: -x / z, lambda: -y / z, None),  # face 2: +z
                (lambda: z / x, lambda: y / x, None),  # face 3: -x
                (lambda: z / y, lambda: -x / y, None),  # face 4: -y
                (lambda: -y / z, lambda: -x / z, None),  # face 5: -z
            ]
        ):
            m = face == f
            if m.any():
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face, u, v


def _uv_to_st(u):
    """S2 quadratic projection (area-uniformizing)."""
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # np.where evaluates both branches
        return np.where(
            u >= 0.0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_ij(s):
    return np.clip((np.asarray(s) * _N).astype(np.int64), 0, _N - 1)


def _hilbert_pos(i, j, order: int = MAX_LEVEL):
    """(i, j) -> distance along a 2^order x 2^order Hilbert curve
    (classic rotate/reflect recurrence, vectorized)."""
    x = np.array(i, dtype=np.int64)
    y = np.array(j, dtype=np.int64)
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def cell_id(lat, lon, level: int):
    """S2 cell id(s) at ``level`` for lat/lon arrays (or scalars)."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError("level out of range")
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    pos = _hilbert_pos(i, j)
    leaf = (
        (face.astype(np.uint64) << np.uint64(61))
        | (pos.astype(np.uint64) << np.uint64(1))
        | np.uint64(1)
    )
    # truncate to the requested level: clear everything below the level's
    # lsb position and set the marker bit there (S2 id hierarchy)
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return (leaf & ~(new_lsb - np.uint64(1))) | new_lsb


def parent(cid, steps: int = 1):
    """Parent cell id ``steps`` levels up (bit-truncation hierarchy)."""
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    new_lsb = lsb << np.uint64(2 * steps)
    return (cid & ~(new_lsb - np.uint64(1))) | new_lsb


def level_of(cid):
    cid = np.asarray(cid, dtype=np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # lsb = 2^(2*(30-level)); level = 30 - log2(lsb)/2
    return (MAX_LEVEL - (np.log2(lsb.astype(np.float64)) / 2.0)).astype(np.int64)


def token(cid):
    """Hex token: 16 hex digits with trailing zeros stripped (S2 format)."""
    cid = np.atleast_1d(np.asarray(cid, dtype=np.uint64))
    return np.array([format(int(c), "016x").rstrip("0") or "0" for c in cid])
