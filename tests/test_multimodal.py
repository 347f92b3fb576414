"""Multimodal stages: REAL BMP/WAV/AVI codec round trips, task-pool vs
actor-pool parity, and the row-expanding frame sampler's semantics."""

import math

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.stages import multimodal as M


def test_bmp_roundtrip_and_padding():
    """Real 24bpp BMP: encode→decode is identity, including the widths
    whose rows need 4-byte padding (w*3 % 4 != 0)."""
    rng = np.frombuffer(b"0123456789abcdef" * 64, np.uint8)
    for w in (1, 2, 3, 4, 5, 7, 16):
        for h in (1, 2, 5):
            pix = rng[:h * w * 3].reshape(h, w, 3).copy()
            data = M.encode_bmp(pix)
            assert data[:2] == b"BM"
            out = M.decode_bmp(data)
            assert np.array_equal(out, pix), (w, h)
    with pytest.raises(ValueError):
        M.decode_bmp(b"NOPE" + b"\x00" * 60)


def test_wav_roundtrip():
    s = (np.arange(-500, 500, 7)).astype(np.int16)
    data = M.encode_wav(s, rate=8000)
    out, rate = M.decode_wav(data)
    assert rate == 8000
    assert np.array_equal(out, s)
    with pytest.raises(ValueError):
        M.decode_wav(b"RIFFxxxxNOPE")


def test_avi_roundtrip():
    frames = [np.full((3, 5, 3), i, np.uint8) for i in range(4)]
    data = M.encode_avi(frames)
    w, h, out = M.decode_avi(data)
    assert (w, h) == (5, 3)
    assert len(out) == 4
    for i, f in enumerate(out):
        # each frame is a standalone decodable BMP
        assert np.array_equal(M.decode_bmp(f), frames[i])
    with pytest.raises(ValueError):
        M.decode_avi(b"RIFFxxxxWAVE")


def test_codec_probe_dispatch():
    c = M.MediaCodec()
    img = M.encode_bmp(np.zeros((2, 2, 3), np.uint8))
    wav = M.encode_wav(np.zeros(10, np.int16))
    avi = M.encode_avi([np.zeros((2, 2, 3), np.uint8)] * 3)
    assert c.header(img) == ("image", 2, 2, 1)
    assert c.header(wav) == ("audio", 10, 1, 1)
    assert c.header(avi) == ("video", 2, 2, 3)


def test_resize_real_resample():
    pix = np.arange(16 * 12 * 3, dtype=np.uint8).reshape(12, 16, 3)
    small = M._resize_nn(pix, 8)
    assert small.shape == (6, 8, 3)           # 12x16 → fit 8 → scale 0.5
    # nearest-neighbor: sampled pixels come from the source grid
    assert small[0, 0, 0] == pix[0, 0, 0]
    assert M._resize_nn(small, 8).shape == small.shape  # no-op when small


def test_task_and_actor_modes_identical(ray_session, monkeypatch):
    sf = "/root/testdata/sf0.001"
    monkeypatch.delenv("MIRU_MEDIA_ACTORS", raising=False)
    task_out = M.media_decode_dims(sf)
    monkeypatch.setenv("MIRU_MEDIA_ACTORS", "1")
    actor_out = M.media_decode_dims(sf)
    assert task_out.equals(actor_out)
    assert task_out.num_rows == 500


def test_frame_sampler_expansion():
    batch = M.build_payloads(pa.table({
        "doc_id": pa.array([2, 5, 14], pa.int64()),   # 2,5,14 → video
        "text": pa.array(["a", "b", "c"])}))
    out = M.FrameSampler()(batch)
    # every doc_id % 3 == 2 is a video with 2 + doc_id % 7 frames,
    # sampled every FRAME_STEP frames
    want = {d: math.ceil((2 + d % 7) / M.FRAME_STEP)
            for d in (2, 5, 14) if d % 3 == 2}
    got = {}
    for mid in out["media_id"].to_pylist():
        got[mid] = got.get(mid, 0) + 1
    assert got == want
    # frame payloads are standalone real BMPs with the formula dims
    f0 = out["frame_payload"][0].as_py()
    pix = M.decode_bmp(f0)
    assert pix.shape == (4 + 2 % 17, 4 + 2 % 29, 3)


def test_feature_extractor_real_statistics():
    batch = M.build_payloads(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),  # image, audio, video
        "text": pa.array(["x", "y", "z"])}))
    out = M.FeatureExtractor()(batch).to_pandas()
    assert list(out["media_id"]) == [0, 1, 2]
    for f in out["feature"]:
        assert len(f) == 16
    # image features: per-channel stats are real (mean within [min, max])
    img = np.array(out["feature"][0])
    assert (img[6:9] <= img[0:3]).all() and (img[0:3] <= img[9:12]).all()
    # audio: rms > 0 for non-silent samples, n == n_samples formula
    aud = np.array(out["feature"][1])
    assert aud[0] > 0 and aud[4] == 64 + 1 % 193 and aud[5] == M.WAV_RATE
