"""Multimodal plumbing: binary payload decode/feature/resize kernels over
mapInPandas. All codecs real (PNG/WAV/CDF-1/APNG/MJPEG-AVI); only
H.264-class motion-compensated video remains a stubbed seam."""

import numpy as np
import pytest

from filda_spark import multimodal, pipeline


def test_media_features_match_reference(spark, corpus):
    media = pipeline.load_media(spark, corpus["dir"]).limit(50)
    feats = multimodal.media_features(media).toPandas().set_index("media_ref")
    src = media.toPandas()
    assert len(feats) == len(src)
    r = src.iloc[0]
    arr = np.frombuffer(bytes(r["data"]), dtype=r["dtype"]).reshape(tuple(r["shape"])).astype(np.float64)
    got = feats.loc[r["media_ref"]]
    finite = arr[np.isfinite(arr)]
    assert got.n_values == arr.size
    assert got.v_mean == finite.mean()
    assert got.n_nan == arr.size - finite.size
    assert got.n_bytes == len(bytes(r["data"]))


def test_media_resize_block_mean(spark, corpus):
    media = pipeline.load_media(spark, corpus["dir"]).filter("var = 'latitude'").limit(1)
    out = multimodal.media_resize(media, factor=2).toPandas()
    src = media.toPandas().iloc[0]
    arr = np.frombuffer(bytes(src["data"]), dtype=src["dtype"]).reshape(tuple(src["shape"]))
    got = np.frombuffer(out.iloc[0]["data"], dtype=np.float32).reshape(
        (int(out.iloc[0]["h"]), int(out.iloc[0]["w"]))
    )
    ref = arr.astype(np.float64).reshape(arr.shape[0] // 2, 2, arr.shape[1] // 2, 2).mean(axis=(1, 3))
    assert np.allclose(got, ref, rtol=1e-6)


def test_stub_kinds_raise():
    # image/audio are REAL decoders now (codecs.py): garbage bytes are a
    # format error, not a stub
    with pytest.raises(ValueError, match="not a PNG"):
        multimodal.decode_media("image", b"\x00", "uint8", [1])
    with pytest.raises(ValueError, match="not a RIFF"):
        multimodal.decode_media("audio", b"\x00", "int16", [1])
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_media("video", b"\x00", "uint8", [1])  # the one seam
    with pytest.raises(ValueError):
        multimodal.decode_media("bogus", b"\x00", "uint8", [1])


def test_frame_sample_raw_video(spark, corpus):
    media = pipeline.load_media(spark, corpus["dir"])
    out = multimodal.frame_sample(media, every_n=2).toPandas()
    vids = media.filter("var = 'DNB_video'").toPandas()
    assert len(vids) > 0
    raw_rows = out[out.media_ref.str.endswith("DNB_video")]
    # 6 frames sampled every 2 -> frames 0, 2, 4 per raw video payload
    assert len(raw_rows) == 3 * len(vids)
    assert sorted(raw_rows.frame_idx.unique()) == [0, 2, 4]
    r = vids.iloc[0]
    arr = np.frombuffer(bytes(r["data"]), dtype=r["dtype"]).reshape(tuple(r["shape"]))
    got = out[(out.media_ref == r["media_ref"]) & (out.frame_idx == 2)].iloc[0]
    assert got.f_mean == arr[2].astype(np.float64).mean()
    assert (got.h, got.w) == arr.shape[1:]


def test_frame_sample_compressed_video(spark, corpus):
    """APNG (5 frames, lossless) and MJPEG/AVI (4 frames, lossy) payloads
    flow through the same frame_sample plumbing; stats must equal the
    single-node decode of the same payload (shared-decoder parity)."""
    from filda_spark import codecs

    media = pipeline.load_media(spark, corpus["dir"])
    out = multimodal.frame_sample(media, every_n=2).toPandas()
    src = media.toPandas()

    apng = src[src["var"] == "DNB_anim_apng"]
    assert len(apng) > 0
    apng_rows = out[out.media_ref.str.endswith("DNB_anim_apng")]
    assert len(apng_rows) == 3 * len(apng)  # frames 0, 2, 4 of 5
    r = apng.iloc[0]
    frames = codecs.apng_decode(bytes(r["data"]))
    got = out[(out.media_ref == r["media_ref"]) & (out.frame_idx == 2)].iloc[0]
    assert got.f_mean == frames[2].astype(np.float64).mean()

    avi = src[src["var"] == "M13_clip_avi"]
    assert len(avi) > 0
    avi_rows = out[out.media_ref.str.endswith("M13_clip_avi")]
    assert len(avi_rows) == 2 * len(avi)  # frames 0, 2 of 4
    r = avi.iloc[0]
    frames = codecs.avi_decode(bytes(r["data"]))
    assert list(frames.shape) == list(r["shape"])  # metadata = decoded shape
    got = out[(out.media_ref == r["media_ref"]) & (out.frame_idx == 2)].iloc[0]
    assert got.f_mean == frames[2].astype(np.float64).mean()
