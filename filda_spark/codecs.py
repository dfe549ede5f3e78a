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

Round 3 closes the video seam with two more from-spec codecs:

- APNG (W3C PNG 3rd ed. animation chunks: acTL/fcTL/fdAT): true
  inter-frame compression — each frame after the first stores only the
  zlib+filtered bounding rectangle of pixels that changed, composited
  over the previous canvas (dispose NONE / blend SOURCE). Lossless.
- Baseline JPEG (ITU-T T.81, Annex K standard tables): greyscale
  sequential DCT — level shift, 8x8 2-D DCT, quality-scaled
  quantisation, zigzag, DC DPCM + AC run-length Huffman with byte
  stuffing — wrapped per frame in an AVI/RIFF MJPEG container
  (``vids``/``MJPG`` stream, ``00dc`` movi chunks). Lossy but
  bit-deterministic both directions.

Motion-compensated transform codecs (H.264-class) remain out of scope —
they are not implementable from a spec with the stdlib; the plumbing in
``multimodal.decode_media`` treats them like any other kind, so a library
decoder drops straight in.
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


def _png_layout(a: np.ndarray) -> tuple[int, int]:
    """(colour_type, channels) for a supported array, else ValueError."""
    if a.ndim == 2 and a.dtype in (np.uint8, np.uint16):
        return 0, 1
    if a.ndim == 3 and a.shape[2] == 3 and a.dtype == np.uint8:
        return 2, 3
    raise ValueError(f"unsupported array for PNG: shape={a.shape} dtype={a.dtype}")


def _filter_image(a: np.ndarray) -> bytes:
    """Serialize an image region to the PNG filtered-scanline stream
    (big-endian samples; filter type cycles 0..4 by row so every decoder
    path is exercised by any region taller than four rows)."""
    channels = a.shape[2] if a.ndim == 3 else 1
    bpp = channels * a.dtype.itemsize
    h, w = a.shape[0], a.shape[1]
    raw_rows = np.ascontiguousarray(a.astype(a.dtype.newbyteorder(">"))).reshape(h, -1)
    prev = bytearray(w * bpp)
    stream = bytearray()
    for y in range(h):
        row = bytearray(raw_rows[y].tobytes())
        ftype = y % 5
        stream.append(ftype)
        stream += _filter_row(ftype, row, prev, bpp)
        prev = row
    return bytes(stream)


def _unfilter_image(raw: bytes, h: int, w: int, channels: int, depth: int) -> np.ndarray:
    """Inverse of :func:`_filter_image`: filtered-scanline stream -> array
    ((h, w) or (h, w, channels), native byte order)."""
    bpp = channels * depth // 8
    stride = w * bpp
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
    arr = np.frombuffer(bytes(out), dtype=dt).astype(dt.newbyteorder("="))
    return arr.reshape(h, w) if channels == 1 else arr.reshape(h, w, channels)


def png_encode(arr: np.ndarray, level: int = 6) -> bytes:
    """Encode a (H, W) uint8/uint16 greyscale or (H, W, 3) uint8 RGB array."""
    a = np.asarray(arr)
    colour, _channels = _png_layout(a)
    depth = a.dtype.itemsize * 8
    h, w = a.shape[0], a.shape[1]
    stream = _filter_image(a)
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
    raw = zlib.decompress(bytes(idat))
    return _unfilter_image(raw, h, w, channels, depth)


# ---------------------------------------------------------------------------
# APNG — animated PNG, W3C PNG 3rd ed. §12 (acTL/fcTL/fdAT)
# ---------------------------------------------------------------------------

# dispose/blend ops written by the encoder: keep the previous canvas and
# overwrite the frame rectangle with the new samples
_APNG_DISPOSE_NONE = 0
_APNG_BLEND_SOURCE = 0


def _diff_bbox(prev: np.ndarray, cur: np.ndarray) -> tuple[int, int, int, int]:
    """(y0, x0, h, w) bounding rectangle of changed pixels; the minimal
    legal 1x1 rect at the origin when the frames are identical (the spec
    requires fcTL width/height >= 1)."""
    changed = cur != prev
    if changed.ndim == 3:
        changed = changed.any(axis=2)
    ys, xs = np.nonzero(changed)
    if ys.size == 0:
        return 0, 0, 1, 1
    y0, x0 = int(ys.min()), int(xs.min())
    return y0, x0, int(ys.max()) - y0 + 1, int(xs.max()) - x0 + 1


def apng_encode(frames: np.ndarray, level: int = 6, delay: tuple[int, int] = (1, 10)) -> bytes:
    """Encode a (T, H, W[, 3]) frame stack as an animated PNG.

    Inter-frame compression: frame 0 is stored whole (IDAT); every later
    frame stores only the zlib+filtered bounding rectangle of pixels that
    differ from the previous frame (fcTL offsets + fdAT), composited with
    dispose NONE / blend SOURCE. Lossless for uint8/uint16 grey and uint8
    RGB — the same sample formats as :func:`png_encode`.
    """
    f = np.asarray(frames)
    if f.ndim not in (3, 4) or f.shape[0] < 1:
        raise ValueError(f"frames must be (T, H, W[, 3]), got {f.shape}")
    colour, _channels = _png_layout(f[0])
    depth = f.dtype.itemsize * 8
    t_n, h, w = f.shape[0], f.shape[1], f.shape[2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, colour, 0, 0, 0)
    actl = struct.pack(">II", t_n, 0)  # num_frames, num_plays (0 = loop)
    seq = 0

    def fctl(fh: int, fw: int, y0: int, x0: int) -> bytes:
        nonlocal seq
        body = struct.pack(
            ">IIIIIHHBB", seq, fw, fh, x0, y0, delay[0], delay[1],
            _APNG_DISPOSE_NONE, _APNG_BLEND_SOURCE,
        )
        seq += 1
        return _chunk(b"fcTL", body)

    out = bytearray(PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"acTL", actl))
    out += fctl(h, w, 0, 0)
    out += _chunk(b"IDAT", zlib.compress(_filter_image(f[0]), level))
    for t in range(1, t_n):
        y0, x0, fh, fw = _diff_bbox(f[t - 1], f[t])
        rect = np.ascontiguousarray(f[t][y0 : y0 + fh, x0 : x0 + fw])
        out += fctl(fh, fw, y0, x0)
        seq_hdr = struct.pack(">I", seq)
        seq += 1
        out += _chunk(b"fdAT", seq_hdr + zlib.compress(_filter_image(rect), level))
    out += _chunk(b"IEND", b"")
    return bytes(out)


def apng_decode(data: bytes) -> np.ndarray:
    """Decode an animated PNG to the full (T, H, W[, 3]) frame stack,
    compositing each frame rectangle over the running canvas (dispose NONE /
    blend SOURCE — the subset the encoder writes; anything else raises)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG file")
    pos, ihdr, actl = 8, None, None
    frames_meta: list[dict] = []  # one per fcTL: rect + its data chunks
    expected_seq = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"acTL":
            actl = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            s, fw, fh, x0, y0, _dn, _dd, dispose, blend = struct.unpack(">IIIIIHHBB", body)
            if s != expected_seq:
                raise ValueError(f"APNG sequence number {s}, expected {expected_seq}")
            expected_seq += 1
            if dispose != _APNG_DISPOSE_NONE or blend != _APNG_BLEND_SOURCE:
                raise ValueError("unsupported APNG dispose/blend op")
            frames_meta.append(dict(w=fw, h=fh, x0=x0, y0=y0, data=bytearray()))
        elif ctype == b"IDAT":
            if not frames_meta:
                raise ValueError("APNG IDAT before first fcTL (static-first not supported)")
            frames_meta[0]["data"] += body
        elif ctype == b"fdAT":
            (s,) = struct.unpack(">I", body[:4])
            if s != expected_seq:
                raise ValueError(f"APNG sequence number {s}, expected {expected_seq}")
            expected_seq += 1
            frames_meta[-1]["data"] += body[4:]
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or actl is None or not frames_meta:
        raise ValueError("APNG missing IHDR/acTL/fcTL")
    w, h, depth, colour, comp, filt, interlace = ihdr
    if comp or filt or interlace:
        raise ValueError("unsupported PNG: non-zero compression/filter/interlace method")
    if colour not in _CHANNELS or depth not in (8, 16) or (colour == 2 and depth != 8):
        raise ValueError(f"unsupported PNG colour={colour} depth={depth}")
    if actl[0] != len(frames_meta):
        raise ValueError(f"acTL declares {actl[0]} frames, found {len(frames_meta)}")
    channels = _CHANNELS[colour]
    first = frames_meta[0]
    if (first["w"], first["h"], first["x0"], first["y0"]) != (w, h, 0, 0):
        raise ValueError("first APNG frame must cover the whole canvas")
    out = []
    canvas = None
    for fm in frames_meta:
        rect = _unfilter_image(zlib.decompress(bytes(fm["data"])), fm["h"], fm["w"], channels, depth)
        if canvas is None:
            canvas = rect.copy()
        else:
            canvas = canvas.copy()
            canvas[fm["y0"] : fm["y0"] + fm["h"], fm["x0"] : fm["x0"] + fm["w"]] = rect
        out.append(canvas)
    return np.stack(out)


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


# ---------------------------------------------------------------------------
# Baseline JPEG — ITU-T T.81, greyscale sequential DCT, Annex K tables
# ---------------------------------------------------------------------------

# Annex K.1 luminance quantisation table, zigzag order flattened row-major
_JPEG_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3: luminance DC code lengths (BITS) and symbols (HUFFVAL)
_JPEG_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPEG_DC_VALS = list(range(12))
# Annex K.5: luminance AC
_JPEG_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPEG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# zigzag scan order: _JPEG_ZIGZAG[k] = flat index (row*8+col) of the k-th
# coefficient in zigzag order
def _zigzag_order() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(s + 1) if s < 8 else range(s - 7, 8)
        diag = [(i, s - i) for i in rng]
        if s % 2 == 0:
            diag.reverse()
        idx.extend(r * 8 + c for r, c in diag)
    return np.array(idx, dtype=np.int64)


_JPEG_ZIGZAG = _zigzag_order()

# orthonormal 8-point DCT-II matrix (float64): forward D = C @ X @ C.T
def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    c = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    c[0] /= np.sqrt(2.0)
    return c


_JPEG_DCT = _dct_matrix()


def _jpeg_quality_table(quality: int) -> np.ndarray:
    """Annex-K luminance table scaled by libjpeg's public quality formula."""
    if not 1 <= quality <= 100:
        raise ValueError("JPEG quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    tbl = (_JPEG_QUANT_LUMA * scale + 50) // 100
    return np.clip(tbl, 1, 255).astype(np.int64)


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): symbol -> (code, length)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, built from the same canonical assignment."""
    return {(ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-coded-segment reader with FF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
            if nxt == 0x00:
                self.pos += 1
            else:  # a marker: treat as end padding
                byte = 0xFF
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: size-bit magnitude bits -> signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Signed value -> (size category, size-bit code)."""
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def jpeg_encode(arr: np.ndarray, quality: int = 90) -> bytes:
    """Encode an (H, W) uint8 greyscale image as baseline sequential JPEG
    (single component, Annex-K standard tables, deterministic)."""
    a = np.asarray(arr)
    if a.ndim != 2 or a.dtype != np.uint8:
        raise ValueError(f"jpeg_encode wants (H, W) uint8, got {a.shape} {a.dtype}")
    h, w = a.shape
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad JPEG dimensions")
    qt = _jpeg_quality_table(quality)
    # pad to 8x8 blocks by edge replication, level shift, blockwise 2-D DCT
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(a.astype(np.float64) - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ij,bjk,lk->bil", _JPEG_DCT, blocks, _JPEG_DCT)
    quant = np.round(coeffs / qt).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, _JPEG_ZIGZAG]

    dc_tab = _huff_encode_table(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_tab = _huff_encode_table(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        size, code = _magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        hc, hl = dc_tab[size]
        bw.write(hc, hl)
        if size:
            bw.write(code, size)
        run = 0
        nz = np.nonzero(blk[1:])[0]
        last_nz = nz[-1] + 1 if nz.size else 0
        for k in range(1, last_nz + 1):
            v = int(blk[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                hc, hl = ac_tab[0xF0]  # ZRL
                bw.write(hc, hl)
                run -= 16
            size, code = _magnitude(v)
            hc, hl = ac_tab[run * 16 + size]
            bw.write(hc, hl)
            bw.write(code, size)
            run = 0
        if last_nz < 63:
            hc, hl = ac_tab[0x00]  # EOB
            bw.write(hc, hl)

    dqt = bytes([0x00]) + bytes(int(x) for x in qt.reshape(-1)[_JPEG_ZIGZAG])
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
    dht_ac = bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (
        b"\xff\xd8"  # SOI
        + _seg(0xFFDB, dqt)
        + _seg(0xFFC0, sof)
        + _seg(0xFFC4, dht_dc)
        + _seg(0xFFC4, dht_ac)
        + _seg(0xFFDA, sos)
        + bw.flush()
        + b"\xff\xd9"  # EOI
    )


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline greyscale JPEG (as written by :func:`jpeg_encode`;
    any single-component 8-bit sequential stream with 8-bit quant tables)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG file")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    sof = None
    comp_spec = None
    scan_data = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = struct.unpack(">H", data[pos : pos + 2])[0]
        if marker == 0xFFD9:
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[_JPEG_ZIGZAG] = np.frombuffer(b[1:65], np.uint8)
                qts[tq] = tbl.reshape(8, 8)
                b = b[65:]
            pos += 2 + length
        elif marker == 0xFFC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline JPEG supported")
            comp_spec = body[6:9]  # id, sampling, quant table id
            if comp_spec[1] != 0x11:
                raise ValueError("subsampled JPEG unsupported")
            sof = (h, w)
            pos += 2 + length
        elif marker == 0xFFC4:
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                nvals = sum(bits)
                vals = list(b[17 : 17 + nvals])
                huff[(tc, th)] = _huff_decode_table(bits, vals)
                b = b[17 + nvals :]
            pos += 2 + length
        elif marker == 0xFFDA:
            ncomp = body[0]
            if ncomp != 1:
                raise ValueError("multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0xF
            scan_data = data[pos + 2 + length :]
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            break
        elif marker in (0xFFC2, 0xFFC1, 0xFFC3):
            raise ValueError("progressive/extended JPEG unsupported")
        else:  # APPn/COM/etc: skip
            pos += 2 + length
    if sof is None or scan_data is None or comp_spec is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w = sof
    qt = qts[comp_spec[2]]
    br = _BitReader(scan_data)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    nby, nbx = -(-h // 8), -(-w // 8)
    zz = np.zeros((nby * nbx, 64), dtype=np.int64)
    prev_dc = 0
    for b_i in range(nby * nbx):
        size = read_symbol(dc_tab)
        diff = _extend(br.read(size), size) if size else 0
        prev_dc += diff
        zz[b_i, 0] = prev_dc
        k = 1
        while k < 64:
            sym = read_symbol(ac_tab)
            if sym == 0x00:  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("bad AC symbol")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            zz[b_i, k] = _extend(br.read(size), size)
            k += 1
    blocks = np.zeros((nby * nbx, 64), dtype=np.int64)
    blocks[:, _JPEG_ZIGZAG] = zz
    deq = blocks.reshape(-1, 8, 8).astype(np.float64) * qt
    pix = np.einsum("ji,bjk,kl->bil", _JPEG_DCT, deq, _JPEG_DCT) + 128.0
    img = (
        pix.reshape(nby, nbx, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(nby * 8, nbx * 8)
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


# ---------------------------------------------------------------------------
# AVI/RIFF MJPEG container (MS multimedia spec: hdrl/avih/strl/strh/strf,
# movi list of 00dc chunks — one baseline JPEG per frame)
# ---------------------------------------------------------------------------


def _riff_chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) % 2 else b"")


def _riff_list(ltype: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", ltype + body)


def avi_encode(frames: np.ndarray, quality: int = 90, fps: int = 10) -> bytes:
    """Encode a (T, H, W) uint8 frame stack as an AVI/MJPEG file: each frame
    an independent baseline JPEG in a ``00dc`` movi chunk."""
    f = np.asarray(frames)
    if f.ndim != 3 or f.dtype != np.uint8:
        raise ValueError(f"avi_encode wants (T, H, W) uint8, got {f.shape} {f.dtype}")
    t_n, h, w = f.shape
    payloads = [jpeg_encode(f[t], quality) for t in range(t_n)]
    max_size = max(len(p) for p in payloads) if payloads else 0
    avih = struct.pack(
        "<10I", 1_000_000 // fps, max_size * fps, 0, 0x10, t_n, 0, 1, max_size, w, h
    ) + b"\x00" * 16
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0, 1, fps, 0, t_n, max_size, -1, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih) + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi = _riff_list(b"movi", b"".join(_riff_chunk(b"00dc", p) for p in payloads))
    return b"RIFF" + struct.pack("<I", len(b"AVI " + hdrl + movi)) + b"AVI " + hdrl + movi


def avi_decode(data: bytes) -> np.ndarray:
    """Decode an AVI/MJPEG file to the (T, H, W) uint8 frame stack (every
    ``00dc``/``00db`` chunk in the movi list through :func:`jpeg_decode`)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    frames: list[np.ndarray] = []

    def walk(buf: bytes) -> None:
        pos = 0
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (length,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            if cid == b"LIST":
                walk(body[4:])
            elif cid in (b"00dc", b"00db") and length:
                frames.append(jpeg_decode(body))
            pos += 8 + length + (length % 2)

    walk(data[12:])
    if not frames:
        raise ValueError("AVI contains no video frames")
    if any(fr.shape != frames[0].shape for fr in frames):
        raise ValueError("AVI frames disagree on dimensions")
    return np.stack(frames)
