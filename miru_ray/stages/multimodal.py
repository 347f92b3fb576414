"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Ray-side plumbing is REAL and tested — schema (binary payload + typed
metadata columns), actor-pool stages with small batches, row-expanding frame
sampling, feature extraction to ``list<float>`` — while the actual codecs
are STUBS: this container has no image/audio libraries, so each decoder
class tries the real library in ``__init__`` and falls back to a clearly
marked deterministic fake that parses our synthetic payload header.

Payload format (synthetic, deterministic):
    magic(4) = b"FKE0" | kind(1) 'i'/'a'/'v' | w(4 LE) | h(4 LE) |
    n_frames(4 LE) | body bytes (content-derived filler)

Derivation from the ``documents`` testdata table is formula-based on
``doc_id`` so dimension metadata has a pure-SQL oracle: decoding the binary
header back must reproduce the formula exactly (proves the binary round
trip through Arrow/Ray preserved the payload).
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..util import read_parquet_clean

MAGIC = b"FKE0"
KINDS = ["image", "audio", "video"]
FRAME_STEP = 4  # frame sampling stride


# ---------------------------------------------------------------------------
# synthetic media table (deterministic, SQL-mirrorable metadata formulas)
# ---------------------------------------------------------------------------

def media_dims(doc_id: np.ndarray):
    """Formula shared with the SQL oracle: dims as functions of doc_id."""
    kind_idx = doc_id % 3
    width = 16 + doc_id % 97
    height = 16 + doc_id % 53
    n_frames = np.where(kind_idx == 2, 8 + doc_id % 24, 1)
    return kind_idx, width, height, n_frames


MEDIA_DIMS_SQL = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(16 + doc_id % 97 AS BIGINT) AS width,
       CAST(16 + doc_id % 53 AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 3 = 2 THEN 8 + doc_id % 24 ELSE 1 END AS BIGINT)
         AS n_frames
FROM documents
""".strip()


def build_payloads(batch: pa.Table) -> pa.Table:
    """documents batch → media table (binary payload + kind)."""
    doc_id = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pandas()
    kind_idx, width, height, n_frames = media_dims(doc_id)
    payloads, kinds = [], []
    for i, d in enumerate(doc_id):
        k = KINDS[int(kind_idx[i])]
        body = hashlib.blake2b(str(texts[i]).encode(),
                               digest_size=32).digest()
        payloads.append(MAGIC + k[0].encode()
                        + struct.pack("<III", int(width[i]), int(height[i]),
                                      int(n_frames[i])) + body)
        kinds.append(k)
    return pa.table({"media_id": pa.array(doc_id.astype(np.int64)),
                     "kind": pa.array(kinds, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})


def media_dataset(sf_dir: str) -> "ray.data.Dataset":
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    # binary payloads: keep batches small so batch × concurrency fits the
    # worker heap (the multimodal batch-size rule — real images would be MBs)
    return ds.map_batches(build_payloads, batch_format="pyarrow",
                          batch_size=1024)


# ---------------------------------------------------------------------------
# decode / resize / frame-sample / feature-extract stages
# ---------------------------------------------------------------------------

def _use_actors() -> bool:
    """Actor pools vs stateless task pools for the media stages.

    An actor pool amortizes an EXPENSIVE ``__init__`` (real codec /model
    load) across a stage's lifetime — the right shape for production
    multimodal decode.  The stub codec has zero load cost, so paying a
    fresh actor-pool launch per query (~1.2 s fixed on a 32-CPU box —
    the entirety of the round-2 media bench regression, BENCH.md) buys
    nothing: by default the stages run the same callable classes as
    stateless tasks (instance pickled per task, ``__init__`` still the
    only place codec state lives).  Set ``MIRU_MEDIA_ACTORS=1`` — or
    swap in a real codec — to flip every stage to actor pools; nothing
    else changes."""
    return os.environ.get("MIRU_MEDIA_ACTORS", "0") == "1"


def media_stage(ds: "ray.data.Dataset", cls, batch_size: int = 1024,
                **init_kw) -> "ray.data.Dataset":
    if _use_actors():
        return ds.map_batches(cls, fn_constructor_kwargs=init_kw or None,
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=(1, 4))
    return ds.map_batches(cls(**init_kw), batch_format="pyarrow",
                          batch_size=batch_size)

class _FakeCodec:
    """STUB decoder for the synthetic payload format (no PIL/ffmpeg in this
    container).  Parsing failures raise ValueError like a real codec."""

    def decode_header(self, payload: bytes):
        if payload[:4] != MAGIC:
            raise ValueError("bad magic")
        kind = {"i": "image", "a": "audio", "v": "video"}[chr(payload[4])]
        w, h, n_frames = struct.unpack("<III", payload[5:17])
        return kind, w, h, n_frames

    def body(self, payload: bytes) -> bytes:
        return payload[17:]


class ImageDecoder:
    """Actor-pool stage: decode → (media_id, kind, width, height, n_frames).

    ``__init__`` (once per actor) is where a real deployment loads its
    codec; this container has no image libraries, so the stage is
    UNCONDITIONALLY the clearly-marked stub codec for the synthetic
    payload format — swapping in a real codec is replacing ``self.codec``
    here, nothing else changes."""

    def __init__(self):
        self.codec = _FakeCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["media_id"].to_numpy()
        rows = {"media_id": [], "kind": [], "width": [], "height": [],
                "n_frames": []}
        for i, payload in enumerate(b["payload"].to_pylist()):
            kind, w, h, nf = self.codec.decode_header(payload)
            rows["media_id"].append(int(ids[i]))
            rows["kind"].append(kind)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["n_frames"].append(nf)
        return pa.table({"media_id": pa.array(rows["media_id"], pa.int64()),
                         "kind": pa.array(rows["kind"], pa.string()),
                         "width": pa.array(rows["width"], pa.int64()),
                         "height": pa.array(rows["height"], pa.int64()),
                         "n_frames": pa.array(rows["n_frames"], pa.int64())})


class Resizer:
    """Actor-pool stage: 'resize' to max_side, emitting a new payload with
    updated header (stub transform — real resize is a PIL call here)."""

    def __init__(self, max_side: int = 32):
        self.max_side = max_side
        self.codec = _FakeCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        out = []
        for payload in b["payload"].to_pylist():
            kind, w, h, nf = self.codec.decode_header(payload)
            scale = min(1.0, self.max_side / max(w, h))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            out.append(MAGIC + kind[0].encode()
                       + struct.pack("<III", nw, nh, nf)
                       + self.codec.body(payload))
        return b.set_column(b.schema.get_field_index("payload"), "payload",
                            pa.array(out, pa.binary()))


class FrameSampler:
    """Row-expanding stage: video → every FRAME_STEP-th frame as its own
    row (media_id, frame_idx, frame_payload)."""

    def __init__(self, step: int = FRAME_STEP):
        self.step = step
        self.codec = _FakeCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["media_id"].to_numpy()
        rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
        for i, payload in enumerate(b["payload"].to_pylist()):
            kind, w, h, nf = self.codec.decode_header(payload)
            if kind != "video":
                continue
            body = self.codec.body(payload)
            for f in range(0, nf, self.step):
                rows["media_id"].append(int(ids[i]))
                rows["frame_idx"].append(f)
                rows["frame_payload"].append(
                    hashlib.blake2b(body + f.to_bytes(4, "little"),
                                    digest_size=16).digest())
        return pa.table({"media_id": pa.array(rows["media_id"], pa.int64()),
                         "frame_idx": pa.array(rows["frame_idx"], pa.int64()),
                         "frame_payload": pa.array(rows["frame_payload"],
                                                   pa.binary())})


class FeatureExtractor:
    """Actor-pool stage: payload → 16-dim float feature vector
    (deterministic hash-derived stand-in for a vision/audio model; the model
    load belongs in __init__, the batched forward pass in __call__)."""

    DIM = 16

    def __init__(self):
        self.codec = _FakeCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        for payload in b["payload"].to_pylist():
            _, w, h, _ = self.codec.decode_header(payload)
            widths.append(w)
            heights.append(h)
            d = hashlib.blake2b(payload, digest_size=self.DIM * 4).digest()
            v = np.frombuffer(d, np.uint32).astype(np.float64)
            v = (v / 2**32) * 2.0 - 1.0
            feats.append(v.astype(np.float32))
        return pa.table({
            "media_id": b["media_id"],
            "width": pa.array(widths, pa.int64()),
            "height": pa.array(heights, pa.int64()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32()))})


# ---------------------------------------------------------------------------
# driver-visible query callables
# ---------------------------------------------------------------------------

def media_decode_dims(sf_dir: str) -> pa.Table:
    """Decode metadata out of the binary payloads (proves the binary column
    round-trips through Ray/Arrow intact — SQL oracle recomputes the dims
    formula directly)."""
    ds = media_stage(media_dataset(sf_dir), ImageDecoder)
    out = ds.to_pandas().sort_values("media_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def media_frame_sample_counts(sf_dir: str) -> pa.Table:
    """Frames sampled per video (every FRAME_STEP-th frame).  The count
    is aggregated PER BATCH before collection — the driver never sees the
    expanded frame rows, only one row per video (a video's frames never
    span batches: expansion happens inside one map_batches call)."""
    def counts(b: pa.Table) -> pa.Table:
        g = b.select(["media_id"]).group_by("media_id").aggregate(
            [("media_id", "count")])
        return g.rename_columns(["media_id", "n_sampled"])

    frames = media_stage(media_dataset(sf_dir), FrameSampler).map_batches(
        counts, batch_format="pyarrow", batch_size=65536)
    pdf = frames.to_pandas().groupby("media_id", as_index=False).agg(
        n_sampled=("n_sampled", "sum"))  # batch partials → per-video total
    pdf["n_sampled"] = pdf["n_sampled"].astype(np.int64)
    return pa.Table.from_pandas(pdf.sort_values("media_id").reset_index(drop=True),
                                preserve_index=False)


def media_pipeline_features(sf_dir: str) -> pa.Table:
    """decode → resize → feature-extract chained stages; returns the
    RESIZED dims (decoded back out of the transformed payload headers —
    proving the resize math and the binary round-trip) + feature
    dimensionality.  The feature VALUES are hash-derived (non-SQL) but
    the resized dims and dim count are formula-exact, so the whole output
    is oracle-checkable."""
    resized = media_stage(media_dataset(sf_dir), Resizer)
    feats = media_stage(resized, FeatureExtractor)
    pdf = feats.to_pandas()
    pdf["feature_dim"] = pdf["feature"].map(len).astype(np.int64)
    pdf = pdf[["media_id", "width", "height", "feature_dim"]] \
        .sort_values("media_id")
    return pa.Table.from_pandas(pdf.reset_index(drop=True),
                                preserve_index=False)


SQL = {
    "media_decode_dims": MEDIA_DIMS_SQL + " ORDER BY media_id",
    "media_frame_sample_counts": f"""
SELECT doc_id AS media_id,
       CAST(ceil((8 + doc_id % 24) * 1.0 / {FRAME_STEP}) AS BIGINT) AS n_sampled
FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id
""".strip(),
    # resize formula mirrored op-for-op (scale = min(1, 32/max(w,h));
    # trunc == floor since everything is positive) so doubles agree bitwise
    "media_pipeline_features": """
WITH m AS (
  SELECT doc_id,
         CAST(16 + doc_id % 97 AS DOUBLE) AS w,
         CAST(16 + doc_id % 53 AS DOUBLE) AS h
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(greatest(1, floor(w * least(1.0, 32.0 / greatest(w, h))))
         AS BIGINT) AS width,
       CAST(greatest(1, floor(h * least(1.0, 32.0 / greatest(w, h))))
         AS BIGINT) AS height,
       CAST(16 AS BIGINT) AS feature_dim
FROM m ORDER BY media_id
""".strip(),
}
