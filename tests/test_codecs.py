"""From-scratch PNG/WAV codecs and the CDF-1 (NetCDF-3) ingest path.

The PNG golden bytes are hand-assembled from the W3C spec (independent of
the encoder); the WAV cross-check uses the stdlib ``wave`` module as an
independent reference decoder. The ingest test proves the fire pipeline
produces bit-identical detections when a granule arrives as ONE real
NetCDF-3 file payload instead of raw raster buffers (reference reads
NetCDF granules: FILDA_IO.py:570-950).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from filda_spark import codecs, fixtures, multimodal, netcdf3


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,dtype",
    [((7, 13), np.uint8), ((9, 5), np.uint16), ((16, 16), np.uint16), ((6, 4, 3), np.uint8)],
)
def test_png_roundtrip(shape, dtype):
    rng = np.random.default_rng(hash(shape) % 2**31)
    hi = np.iinfo(dtype).max + 1
    arr = rng.integers(0, hi, shape).astype(dtype)
    dec = codecs.png_decode(codecs.png_encode(arr))
    assert dec.dtype == arr.dtype and dec.shape == arr.shape
    np.testing.assert_array_equal(dec, arr)


def test_png_golden_bytes():
    """Hand-built PNG per spec: 2x2 gray8, one filter-0 row, one filter-2
    (Up) row — decoder must reproduce the exact samples."""

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    # row0: filter 0, samples 10,20 ; row1: filter 2 (Up), deltas 20,20
    raw = bytes([0, 10, 20, 2, 20, 20])
    blob = (
        codecs.PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(
        codecs.png_decode(blob), np.array([[10, 20], [30, 40]], np.uint8)
    )


def test_png_all_filters_exercised():
    """The encoder cycles filters 0..4 by row; a 10-row image therefore uses
    every filter twice, and the decoder reverses each."""
    arr = (np.arange(10 * 6, dtype=np.uint16) * 773 % 65536).reshape(10, 6).astype(np.uint16)
    blob = codecs.png_encode(arr)
    # pull the filter bytes back out of the decompressed stream
    pos, idat = 8, bytearray()
    while pos < len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        if blob[pos + 4 : pos + 8] == b"IDAT":
            idat += blob[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 6 * 2
    filters = [raw[y * (stride + 1)] for y in range(10)]
    assert filters == [0, 1, 2, 3, 4, 0, 1, 2, 3, 4]
    np.testing.assert_array_equal(codecs.png_decode(blob), arr)


def test_png_crc_checked():
    blob = bytearray(codecs.png_encode(np.zeros((4, 4), np.uint8)))
    blob[40] ^= 0xFF  # corrupt a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        codecs.png_decode(bytes(blob))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "samples",
    [
        np.arange(-500, 500, dtype=np.int16),
        (np.arange(100, dtype=np.uint8) * 3 % 256).astype(np.uint8).reshape(50, 2),
        np.linspace(-1, 1, 64).astype(np.float32),
    ],
)
def test_wav_roundtrip(samples):
    dec, rate = codecs.wav_decode(codecs.wav_encode(samples, rate=12345))
    want = samples[:, None] if samples.ndim == 1 else samples
    assert rate == 12345 and dec.shape == want.shape
    np.testing.assert_array_equal(dec, want)


def test_wav_stdlib_cross_check():
    """stdlib ``wave`` is an independent RIFF reader: it must parse our
    encoder's output, and our decoder must parse bytes it acknowledges."""
    samples = np.round(3000 * np.sin(np.arange(200) * 0.2)).astype(np.int16)
    blob = codecs.wav_encode(samples, rate=22050)
    w = wave.open(io.BytesIO(blob))
    assert (w.getframerate(), w.getnchannels(), w.getsampwidth()) == (22050, 1, 2)
    np.testing.assert_array_equal(
        np.frombuffer(w.readframes(200), "<i2"), samples
    )


def test_wav_skips_unknown_chunks():
    blob = codecs.wav_encode(np.arange(4, dtype=np.int16))
    # splice a LIST chunk between fmt and data per RIFF spec
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    spliced = blob[:fmt_end] + extra + blob[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    dec, _ = codecs.wav_decode(spliced)
    np.testing.assert_array_equal(dec[:, 0], np.arange(4, dtype=np.int16))


# ---------------------------------------------------------------------------
# decode_media routing
# ---------------------------------------------------------------------------


def test_decode_media_routing():
    img = (np.arange(24, dtype=np.uint16) * 999 % 65536).reshape(4, 6).astype(np.uint16)
    out = multimodal.decode_media("image", codecs.png_encode(img), "uint16", [4, 6])
    np.testing.assert_array_equal(out, img)

    au = np.arange(-8, 8, dtype=np.int16)
    out = multimodal.decode_media("audio", codecs.wav_encode(au), "int16", [16])
    np.testing.assert_array_equal(out, au)

    arr = np.array([1.5, -2.5], dtype=np.float64)
    payload = netcdf3.encode(
        {"x_d0": 2}, {"x": dict(data=arr, dims=("x_d0",), atts={"_np_dtype": "float64"})}
    )
    out = multimodal.decode_media("netcdf", payload, "float64", [2], var="x")
    np.testing.assert_array_equal(out, arr)

    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_media("video", b"\x00", "uint8", [1])
    with pytest.raises(ValueError):
        multimodal.decode_media("bogus", b"\x00", "uint8", [1])


def test_netcdf_dtype_restore_roundtrip():
    """uint8/uint16/uint32 survive the classic-type reinterpret through
    encode -> decode -> _np_dtype restore."""
    rng = np.random.default_rng(3)
    arrays = {
        "a_u8": rng.integers(0, 256, (5, 4)).astype(np.uint8),
        "b_u16": rng.integers(0, 65536, (3, 7)).astype(np.uint16),
        "c_u32": rng.integers(0, 2**32, 6, dtype=np.uint64).astype(np.uint32),
        "d_f32": rng.random((2, 2)).astype(np.float32),
    }
    dims, variables = {}, {}
    for name, arr in arrays.items():
        vdims = tuple(f"{name}_d{i}" for i in range(arr.ndim))
        dims.update(dict(zip(vdims, arr.shape)))
        variables[name] = dict(data=arr, dims=vdims, atts={"_np_dtype": str(arr.dtype)})
    out = multimodal.decode_netcdf(netcdf3.encode(dims, variables))
    for name, arr in arrays.items():
        assert out[name].dtype == arr.dtype
        np.testing.assert_array_equal(out[name], arr)


# ---------------------------------------------------------------------------
# NetCDF-3 ingest path: detections parity raw-corpus vs netcdfified corpus
# ---------------------------------------------------------------------------


def test_netcdf_ingest_detection_parity(spark, corpus, tmp_path):
    """One corpus stored as real CDF-1 granule files must flow
    decode->detect with detections bit-identical to the raw-buffer corpus
    (N parity; closes the 'engine never reads a real file format on
    ingest' gap with zero new dependencies)."""
    from filda_spark import pipeline
    from filda_spark.namelist import make_namelist

    src = corpus["dir"]
    nc_dir = fixtures.netcdfify_corpus(src, str(tmp_path / "nc_corpus"))
    nl = make_namelist(dyn_win_dim=31)
    cols = ["doc_id", "FP_Line", "FP_Sample"]
    raw = pipeline.detect_detections(spark, src, nl).orderBy(*cols).toPandas()
    nc = pipeline.detect_detections(spark, nc_dir, nl).orderBy(*cols).toPandas()
    assert len(raw) > 0
    assert list(raw.columns) == list(nc.columns)
    for c in raw.columns:
        np.testing.assert_array_equal(raw[c].to_numpy(), nc[c].to_numpy(), err_msg=c)


# ---------------------------------------------------------------------------
# APNG (inter-frame compression: acTL/fcTL/fdAT)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape,dtype",
    [((5, 12, 9), np.uint8), ((3, 7, 11), np.uint16), ((4, 6, 5, 3), np.uint8)],
)
def test_apng_roundtrip(shape, dtype):
    rng = np.random.default_rng(hash(shape) % 2**31)
    frames = [rng.integers(0, np.iinfo(dtype).max + 1, shape[1:]).astype(dtype)]
    for _ in range(shape[0] - 1):  # localized edits: the inter-frame case
        nxt = frames[-1].copy()
        nxt[1:4, 2:5] = rng.integers(0, np.iinfo(dtype).max + 1, nxt[1:4, 2:5].shape).astype(dtype)
        frames.append(nxt)
    stack = np.stack(frames)
    dec = codecs.apng_decode(codecs.apng_encode(stack))
    assert dec.dtype == stack.dtype and dec.shape == stack.shape
    np.testing.assert_array_equal(dec, stack)


def test_apng_is_interframe_compressed():
    """Frames differing in a small rectangle must encode far smaller than
    the same count of independently random frames — i.e. the encoder
    genuinely stores per-frame deltas, not whole frames."""
    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (32, 48), dtype=np.uint8)
    delta_frames = [base]
    for _ in range(7):
        nxt = delta_frames[-1].copy()
        nxt[10:14, 20:26] = rng.integers(0, 256, (4, 6), dtype=np.uint8)
        delta_frames.append(nxt)
    indep = np.stack([rng.integers(0, 256, (32, 48), dtype=np.uint8) for _ in range(8)])
    sz_delta = len(codecs.apng_encode(np.stack(delta_frames)))
    sz_indep = len(codecs.apng_encode(indep))
    assert sz_delta < sz_indep / 2, (sz_delta, sz_indep)


def test_apng_identical_frames():
    """A static animation still decodes to T distinct (equal) frames."""
    frame = (np.arange(30) * 7 % 256).astype(np.uint8).reshape(5, 6)
    stack = np.repeat(frame[None], 4, axis=0)
    dec = codecs.apng_decode(codecs.apng_encode(stack))
    np.testing.assert_array_equal(dec, stack)


def test_apng_sequence_numbers_checked():
    blob = bytearray(codecs.apng_encode(np.zeros((3, 4, 4), np.uint8)))
    # find the first fdAT chunk and corrupt its sequence number field
    i = bytes(blob).index(b"fdAT")
    blob[i + 7] ^= 0x40  # keep CRC consistent by recomputing
    body_len = struct.unpack(">I", bytes(blob[i - 4 : i]))[0]
    body = bytes(blob[i + 4 : i + 4 + body_len])
    blob[i + 4 + body_len : i + 8 + body_len] = struct.pack(
        ">I", zlib.crc32(b"fdAT" + body)
    )
    with pytest.raises(ValueError, match="sequence"):
        codecs.apng_decode(bytes(blob))


# ---------------------------------------------------------------------------
# Baseline JPEG (T.81) + AVI/MJPEG container
# ---------------------------------------------------------------------------


def test_jpeg_constant_block_exact():
    """A constant image is pure DC; quantised DC reconstructs it exactly."""
    img = np.full((16, 24), 130, np.uint8)
    np.testing.assert_array_equal(codecs.jpeg_decode(codecs.jpeg_encode(img, 90)), img)


def test_jpeg_smooth_image_bounded_error():
    y, x = np.mgrid[0:33, 0:47]  # non-multiple-of-8 dims: edge padding path
    img = ((np.sin(x / 8.0) + np.cos(y / 9.0) + 2) / 4 * 255).astype(np.uint8)
    dec = codecs.jpeg_decode(codecs.jpeg_encode(img, 95))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 6


def test_jpeg_deterministic_and_stable():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (17, 19), dtype=np.uint8)
    blob = codecs.jpeg_encode(img, 50)
    assert codecs.jpeg_encode(img, 50) == blob  # encoder bit-deterministic
    dec = codecs.jpeg_decode(blob)
    np.testing.assert_array_equal(codecs.jpeg_decode(blob), dec)  # decoder too


def test_jpeg_golden_bytes():
    """Pin the marker layout of a fixed encode: SOI, DQT, SOF0 (8-bit,
    single component, no subsampling), two DHTs (Annex-K), SOS, EOI."""
    blob = codecs.jpeg_encode(np.zeros((8, 8), np.uint8), 90)
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert blob[2:4] == b"\xff\xdb"  # DQT first
    i_sof = blob.index(b"\xff\xc0")
    prec, h, w, ncomp = struct.unpack(">BHHB", blob[i_sof + 4 : i_sof + 10])
    assert (prec, h, w, ncomp) == (8, 8, 8, 1)
    assert blob[i_sof + 11] == 0x11  # 1x1 sampling
    assert blob.count(b"\xff\xc4") >= 2  # DC + AC tables


def test_jpeg_byte_stuffing():
    """An image whose entropy stream contains 0xFF bytes must round-trip
    (F.1.2.3 stuffing); exercised statistically with high-entropy input."""
    rng = np.random.default_rng(99)
    for seed in range(4):
        img = rng.integers(0, 256, (24, 24), dtype=np.uint8)
        blob = codecs.jpeg_encode(img, 25)
        dec = codecs.jpeg_decode(blob)
        assert dec.shape == img.shape


def test_avi_mjpeg_roundtrip():
    rng = np.random.default_rng(21)
    y, x = np.mgrid[0:24, 0:32]
    frames = np.stack(
        [((np.sin(x / 5.0 + t) + 1) * 120).astype(np.uint8) for t in range(5)]
    )
    blob = codecs.avi_encode(frames, quality=90, fps=6)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"AVI "
    dec = codecs.avi_decode(blob)
    per_frame = np.stack(
        [codecs.jpeg_decode(codecs.jpeg_encode(frames[t], 90)) for t in range(5)]
    )
    np.testing.assert_array_equal(dec, per_frame)
    assert np.abs(dec.astype(int) - frames.astype(int)).mean() < 3.0


def test_avi_header_fields():
    frames = np.zeros((3, 16, 16), np.uint8)
    blob = codecs.avi_encode(frames, fps=10)
    i = blob.index(b"avih")
    us_per_frame, _, _, _, total = struct.unpack("<5I", blob[i + 8 : i + 28])
    assert us_per_frame == 100_000 and total == 3
    assert b"vidsMJPG" in blob and b"MJPG" in blob
