"""Multimodal stage plumbing: task-pool vs actor-pool parity, and the
row-expanding frame sampler's semantics."""

import math

import pyarrow as pa

from miru_ray.stages import multimodal as M


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
        "doc_id": pa.array([2, 5, 14], pa.int64()),   # 2,14 video; 5 video
        "text": pa.array(["a", "b", "c"])}))
    out = M.FrameSampler()(batch)
    # every doc_id % 3 == 2 is a video with 8 + doc_id % 24 frames,
    # sampled every FRAME_STEP frames
    want = {d: math.ceil((8 + d % 24) / M.FRAME_STEP)
            for d in (2, 5, 14) if d % 3 == 2}
    got = {}
    for mid in out["media_id"].to_pylist():
        got[mid] = got.get(mid, 0) + 1
    assert got == want
    # frame indices are the stride positions
    idx = [f for m, f in zip(out["media_id"].to_pylist(),
                             out["frame_idx"].to_pylist()) if m == 2]
    assert idx == list(range(0, 8 + 2 % 24, M.FRAME_STEP))
