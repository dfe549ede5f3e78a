"""From-scratch PNG and WAV codecs (stdlib ``zlib``/``struct`` only).

The reference treats compressed media as opaque payloads handed to codec
libraries; this container ships none (no Pillow/ffmpeg/soundfile), so —
same pattern as ``netcdf3.py`` — the two formats whose public specifications
are implementable with the stdlib are implemented here from the spec:

- PNG (RFC 2083 / W3C PNG spec): 8/16-bit greyscale and 8-bit RGB,
  non-interlaced; all five scanline filter types (None/Sub/Up/Average/
  Paeth) on both the encode and decode side; zlib-compressed IDAT;
  CRC-32-checked chunks.
- WAV (RIFF/WAVE, MS multimedia spec): integer PCM (8/16-bit) and IEEE
  float32, any channel count; unknown RIFF chunks are skipped per spec.

Video remains the single documented codec seam in
``multimodal.decode_media`` (inter-frame codecs are not realistically
implementable from scratch here).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colour type -> samples per pixel
_CHANNELS = {0: 1, 2: 3}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_row(ftype: int, row: bytearray, prev: bytearray, bpp: int) -> bytes:
    """Apply filter ``ftype`` to a raw scanline (encode direction).
    Fully vectorized: filtering reads only the ORIGINAL row/prev bytes, so
    there is no sequential dependency (unlike unfiltering)."""
    x = np.frombuffer(bytes(row), np.uint8).astype(np.int16)
    a = np.zeros_like(x)
    a[bpp:] = x[:-bpp]
    b = np.frombuffer(bytes(prev), np.uint8).astype(np.int16)
    c = np.zeros_like(b)
    c[bpp:] = b[:-bpp]
    if ftype == 0:
        out = x
    elif ftype == 1:
        out = x - a
    elif ftype == 2:
        out = x - b
    elif ftype == 3:
        out = x - (a + b) // 2
    else:  # Paeth predictor, vectorized
        p = a + b - c
        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
        pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
        out = x - pred
    return (out & 0xFF).astype(np.uint8).tobytes()


def _unfilter_row(ftype: int, row: bytearray, prev: bytearray, bpp: int) -> bytearray:
    """Reverse filter ``ftype`` in place (decode direction). None/Up have no
    intra-row dependency (vectorized); Sub is a per-lane prefix sum mod 256
    (vectorized via cumsum); Average/Paeth carry a true sequential
    dependency along x — the per-byte loop is inherent to the format (real
    decoders do it in C)."""
    n = len(row)
    if ftype == 0:
        return row
    if ftype == 2:  # Up
        out = (np.frombuffer(bytes(row), np.uint8).astype(np.int16)
               + np.frombuffer(bytes(prev), np.uint8)) & 0xFF
        return bytearray(out.astype(np.uint8).tobytes())
    if ftype == 1:  # Sub: out[i] = raw[i] + out[i-bpp]  == lane-wise cumsum
        raw = np.frombuffer(bytes(row), np.uint8)
        out = np.empty(n, np.uint8)
        for lane in range(bpp):
            out[lane::bpp] = (np.cumsum(raw[lane::bpp], dtype=np.int64) & 0xFF).astype(np.uint8)
        return bytearray(out.tobytes())
    for i in range(n):
        a = row[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return row


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode a (H, W) uint8/uint16 greyscale or (H, W, 3) uint8 RGB array.

    Filter type cycles 0..4 by row so every decoder path is exercised by
    any image taller than four rows.
    """
    a = np.asarray(arr)
    if a.ndim == 2 and a.dtype in (np.uint8, np.uint16):
        colour, channels = 0, 1
    elif a.ndim == 3 and a.shape[2] == 3 and a.dtype == np.uint8:
        colour, channels = 2, 3
    else:
        raise ValueError(f"unsupported array for PNG: shape={a.shape} dtype={a.dtype}")
    depth = a.dtype.itemsize * 8
    h, w = a.shape[0], a.shape[1]
    bpp = channels * a.dtype.itemsize
    # PNG 16-bit samples are big-endian within the scanline
    raw_rows = np.ascontiguousarray(a.astype(a.dtype.newbyteorder(">"))).reshape(h, -1)
    prev = bytearray(w * bpp)
    stream = bytearray()
    for y in range(h):
        row = bytearray(raw_rows[y].tobytes())
        ftype = y % 5
        stream.append(ftype)
        stream += _filter_row(ftype, row, prev, bpp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, depth, colour, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(stream), level))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced greyscale/RGB PNG to an ndarray
    ((H, W) uint8/uint16 or (H, W, 3) uint8)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, idat = 8, None, bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, colour, comp, filt, interlace = ihdr
    if comp or filt or interlace:
        raise ValueError("unsupported PNG: non-zero compression/filter/interlace method")
    if colour not in _CHANNELS or depth not in (8, 16) or (colour == 2 and depth != 8):
        raise ValueError(f"unsupported PNG colour={colour} depth={depth}")
    channels = _CHANNELS[colour]
    bpp = channels * depth // 8
    stride = w * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    prev = bytearray(stride)
    out = bytearray()
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = _unfilter_row(ftype, row, prev, bpp)
        out += prev
    dt = np.dtype(">u2") if depth == 16 else np.dtype(np.uint8)
    arr = np.frombuffer(bytes(out), dtype=dt)
    arr = arr.astype(arr.dtype.newbyteorder("="))
    if channels == 1:
        return arr.reshape(h, w)
    return arr.reshape(h, w, channels)


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

_WAVE_PCM, _WAVE_FLOAT = 1, 3


def wav_encode(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode (n,) or (n, channels) int16/uint8/float32 samples as RIFF/WAVE."""
    a = np.asarray(samples)
    if a.ndim == 1:
        a = a[:, None]
    if a.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    if a.dtype == np.int16:
        fmt, bits = _WAVE_PCM, 16
    elif a.dtype == np.uint8:
        fmt, bits = _WAVE_PCM, 8
    elif a.dtype == np.float32:
        fmt, bits = _WAVE_FLOAT, 32
    else:
        raise ValueError(f"unsupported WAV dtype {a.dtype}")
    n, ch = a.shape
    block = ch * bits // 8
    payload = np.ascontiguousarray(a.astype(a.dtype.newbyteorder("<"))).tobytes()
    fmt_chunk = struct.pack("<HHIIHH", fmt, ch, rate, rate * block, block, bits)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt_chunk))
        + fmt_chunk
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode RIFF/WAVE to ((n, channels) ndarray, sample_rate). Integer PCM
    8/16-bit and IEEE float32; unknown chunks skipped (word-aligned)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + length + (length % 2)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, ch, rate, _byterate, _block, bits = fmt
    if audio_fmt == _WAVE_PCM and bits == 16:
        dt = np.dtype("<i2")
    elif audio_fmt == _WAVE_PCM and bits == 8:
        dt = np.dtype(np.uint8)
    elif audio_fmt == _WAVE_FLOAT and bits == 32:
        dt = np.dtype("<f4")
    else:
        raise ValueError(f"unsupported WAV format={audio_fmt} bits={bits}")
    arr = np.frombuffer(payload, dtype=dt)
    arr = arr.astype(arr.dtype.newbyteorder("="))
    return arr.reshape(-1, ch), rate
