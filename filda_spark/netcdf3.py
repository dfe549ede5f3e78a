"""From-scratch NetCDF-3 (classic, CDF-1) encoder/decoder.

The reference sinks are NetCDF (write_nc, FILDA_IO.py:1475-1563; dict2nc,
MCBEF_IO.py:588-697) via the netCDF4/HDF5 stack, which this container does
not ship. Rather than leave the sink a stub, this module implements the
classic NetCDF-3 container from the public file-format specification
(the CDF-1 variant: magic ``CDF\\x01``, big-endian, dim/gatt/var lists,
4-byte-aligned data section) — enough to write and read back every fixed-
dimension variable the reference's writers emit.

Documented deviations from the reference's NetCDF-4 output:
- classic format has no unsigned types: ``u4`` variables (Algorithm_QA)
  are stored bit-reinterpreted as NC_INT (lossless; consumers view back);
- no zlib chunk compression (classic has none);
- record (unlimited) dimensions are not needed by the reference layouts
  (every dim is fixed per granule) and are not implemented.

Spec constants: NC_BYTE=1, NC_CHAR=2, NC_SHORT=3, NC_INT=4, NC_FLOAT=5,
NC_DOUBLE=6; tags NC_DIMENSION=10, NC_VARIABLE=11, NC_ATTRIBUTE=12;
ABSENT = two zero words.
"""

from __future__ import annotations

import struct

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
NC_DIMENSION, NC_VARIABLE, NC_ATTRIBUTE = 10, 11, 12

_TYPE_OF_DTYPE = {
    np.dtype(np.int8): NC_BYTE,
    np.dtype(np.int16): NC_SHORT,
    np.dtype(np.int32): NC_INT,
    np.dtype(np.float32): NC_FLOAT,
    np.dtype(np.float64): NC_DOUBLE,
}
_DTYPE_OF_TYPE = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_SIZE_OF_TYPE = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}


def _coerce(arr: np.ndarray) -> np.ndarray:
    """Map input dtypes onto classic-representable ones (u4 -> i4 bit
    reinterpret, u1 -> i1 bit reinterpret, i8 -> i4 checked)."""
    a = np.asarray(arr)
    if a.dtype == np.uint32:
        return a.view(np.int32)
    if a.dtype == np.uint8:
        return a.view(np.int8)
    if a.dtype == np.int64:
        if a.size and (a.max() > 2**31 - 1 or a.min() < -(2**31)):
            raise ValueError("int64 variable exceeds NC_INT range")
        return a.astype(np.int32)
    if a.dtype == np.uint16:
        return a.view(np.int16)
    if a.dtype not in _TYPE_OF_DTYPE:
        return a.astype(np.float64)
    return a


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode()
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _att_value(v) -> bytes:
    """Attribute payload: nc_type + nelems + padded values."""
    if isinstance(v, str):
        raw = v.encode()
        return struct.pack(">ii", NC_CHAR, len(raw)) + _pad4(raw)
    a = _coerce(np.atleast_1d(v))
    t = _TYPE_OF_DTYPE[a.dtype if a.dtype in _TYPE_OF_DTYPE else np.dtype(np.float64)]
    return struct.pack(">ii", t, a.size) + _pad4(a.astype(_DTYPE_OF_TYPE[t]).tobytes())


def _att_list(atts: dict) -> bytes:
    if not atts:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = struct.pack(">ii", NC_ATTRIBUTE, len(atts))
    for k, v in atts.items():
        out += _name(k) + _att_value(v)
    return out


def encode(dims: dict[str, int], variables: dict[str, dict], global_atts: dict | None = None) -> bytes:
    """Encode a classic (CDF-1) NetCDF file to bytes.

    dims: ordered {name: size} (all fixed).
    variables: ordered {name: {"data": ndarray, "dims": (dim names...),
    "atts": {...}}}; data shape must match the named dims.
    """
    dim_ids = {n: i for i, n in enumerate(dims)}
    header = b"CDF\x01" + struct.pack(">i", 0)  # numrecs = 0 (no record dim)
    header += struct.pack(">ii", NC_DIMENSION, len(dims)) if dims else struct.pack(">ii", 0, 0)
    for n, size in dims.items():
        header += _name(n) + struct.pack(">i", size)
    header += _att_list(global_atts or {})

    prepared = []
    for n, spec in variables.items():
        data = _coerce(spec["data"])
        vdims = tuple(spec.get("dims", ()))
        shape = tuple(dims[d] for d in vdims)
        if data.shape != shape:
            raise ValueError(f"{n}: data shape {data.shape} != dims {vdims} {shape}")
        t = _TYPE_OF_DTYPE[data.dtype]
        vsize = int(np.prod(shape, dtype=np.int64)) * _SIZE_OF_TYPE[t] if shape else _SIZE_OF_TYPE[t]
        vsize += -vsize % 4
        prepared.append((n, vdims, spec.get("atts", {}), t, vsize, data))

    # var_list needs begin offsets -> compute header length with a dry pass
    def var_list(begin_of: list[int]) -> bytes:
        out = struct.pack(">ii", NC_VARIABLE, len(prepared)) if prepared else struct.pack(">ii", 0, 0)
        for (n, vdims, atts, t, vsize, _d), begin in zip(prepared, begin_of):
            out += _name(n) + struct.pack(">i", len(vdims))
            for d in vdims:
                out += struct.pack(">i", dim_ids[d])
            out += _att_list(atts)
            out += struct.pack(">iii", t, vsize, begin)
        return out

    hdr_len = len(header) + len(var_list([0] * len(prepared)))
    begins = []
    off = hdr_len
    for _n, _vd, _a, _t, vsize, _d in prepared:
        begins.append(off)
        off += vsize
    blob = header + var_list(begins)
    for _n, _vd, _a, t, vsize, data in prepared:
        raw = data.astype(_DTYPE_OF_TYPE[t]).tobytes()
        blob += raw + b"\x00" * (vsize - len(raw))
    return blob


def write(path: str, dims: dict[str, int], variables: dict[str, dict], global_atts: dict | None = None) -> None:
    """Write a classic (CDF-1) NetCDF file (see ``encode``)."""
    with open(path, "wb") as f:
        f.write(encode(dims, variables, global_atts))


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def name(self) -> str:
        n = self.i4()
        s = self.buf[self.pos : self.pos + n].decode()
        self.pos += n + (-n % 4)
        return s

    def att_value(self):
        t, n = self.i4(), self.i4()
        size = _SIZE_OF_TYPE[t] * n
        raw = self.buf[self.pos : self.pos + size]
        self.pos += size + (-size % 4)
        if t == NC_CHAR:
            return raw.decode()
        a = np.frombuffer(raw, dtype=_DTYPE_OF_TYPE[t])
        return a.astype(a.dtype.newbyteorder("="))  # native-endian copy

    def att_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        out = {}
        for _ in range(n if tag == NC_ATTRIBUTE else 0):
            k = self.name()
            out[k] = self.att_value()
        return out


def decode(buf: bytes) -> dict:
    """Decode a classic (CDF-1) byte payload written by ``encode`` (fixed
    dims only). Returns {dims, global_atts, variables: {name: {data, dims,
    atts}}}."""
    if buf[:4] != b"CDF\x01":
        raise ValueError("not a CDF-1 classic NetCDF file")
    r = _Reader(buf)
    r.pos = 4
    r.i4()  # numrecs
    tag, ndims = r.i4(), r.i4()
    dims: dict[str, int] = {}
    for _ in range(ndims if tag == NC_DIMENSION else 0):
        n = r.name()
        dims[n] = r.i4()
    dim_names = list(dims)
    gatts = r.att_list()
    tag, nvars = r.i4(), r.i4()
    variables = {}
    for _ in range(nvars if tag == NC_VARIABLE else 0):
        n = r.name()
        nd = r.i4()
        vdims = tuple(dim_names[r.i4()] for _ in range(nd))
        atts = r.att_list()
        t, _vsize, begin = r.i4(), r.i4(), r.i4()
        shape = tuple(dims[d] for d in vdims)
        count = int(np.prod(shape, dtype=np.int64)) if shape else 1
        raw = buf[begin : begin + count * _SIZE_OF_TYPE[t]]
        data = np.frombuffer(raw, dtype=_DTYPE_OF_TYPE[t]).reshape(shape)
        data = data.astype(data.dtype.newbyteorder("="))  # native-endian copy
        variables[n] = dict(data=data, dims=vdims, atts=atts)
    return dict(dims=dims, global_atts=gatts, variables=variables)


def read(path: str) -> dict:
    """Read back a classic file written by ``write`` (see ``decode``)."""
    with open(path, "rb") as f:
        return decode(f.read())
