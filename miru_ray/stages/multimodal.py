"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The payloads are REAL container formats parsed by REAL (pure
numpy/struct) codecs — no external media libraries needed:

- image: 24-bit uncompressed **BMP** (BITMAPFILEHEADER + BITMAPINFOHEADER,
  bottom-up padded BGR rows) — any standard 24bpp BMP decodes here;
- audio: **WAV** RIFF PCM16 mono (fmt + data chunks);
- video: **AVI-style RIFF** (`RIFF('AVI ') → LIST(hdrl){avih} →
  LIST(movi){00db…}`) whose frames are full BMP files — the decoder walks
  the actual RIFF chunk structure.

The Ray-side plumbing is the production shape: binary payload + typed
metadata schema, actor-pool-capable stages with small batches (payload
bytes × batch × concurrency bounds the worker heap), row-expanding frame
sampling, real pixel/sample statistics as the feature vector.  A real
deployment swaps the codec classes for PIL/ffmpeg; every stage boundary
stays identical.

Payload CONTENT is deterministic (pixels/samples derived from a blake2b
of the document text) and payload DIMENSIONS are formulas of ``doc_id``,
so the metadata decoded back out of the real containers has a pure-SQL
oracle: a mismatch means the binary round-trip through Arrow/Ray/the
codec broke somewhere.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa

import ray.data

from ..util import read_parquet_clean

KINDS = ["image", "audio", "video"]
FRAME_STEP = 4   # frame sampling stride
WAV_RATE = 8000
RESIZE_MAX_SIDE = 8


# ---------------------------------------------------------------------------
# real codecs (pure numpy/struct)
# ---------------------------------------------------------------------------

def encode_bmp(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 BGR → standard 24bpp bottom-up BMP."""
    h, w, _ = pix.shape
    row = w * 3
    pad = (-row) % 4
    body = np.zeros((h, row + pad), np.uint8)
    body[:, :row] = pix[::-1].reshape(h, row)   # bottom-up
    data = body.tobytes()
    off = 14 + 40
    header = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(data), 2835, 2835, 0, 0))
    return header + data


def decode_bmp(data: bytes) -> np.ndarray:
    """Standard 24bpp BMP → (h, w, 3) uint8 BGR (top-down)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (missing 'BM' magic)")
    off = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h, planes, bpp = struct.unpack_from("<IiiHH", data, 14)
    if hsize < 40 or planes != 1 or bpp != 24:
        raise ValueError(f"unsupported BMP (header={hsize} bpp={bpp})")
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0:
        raise ValueError("compressed BMP not supported")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    body = np.frombuffer(data, np.uint8, count=h * stride, offset=off)
    pix = body.reshape(h, stride)[:, :w * 3].reshape(h, w, 3)
    return pix[::-1] if flip else pix


def encode_wav(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """1-D int16 mono → RIFF/WAVE PCM16."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono → (samples int16, rate)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (RIFF/WAVE magic missing)")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos:pos + 4], struct.unpack_from("<I", data,
                                                          pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if audio_fmt != 1 or ch != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(body, "<i2")
        pos += 8 + size + (size & 1)   # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return samples, rate


def encode_avi(frames: list[np.ndarray], us_per_frame: int = 100_000
               ) -> bytes:
    """BMP frames → minimal RIFF AVI ('00db' = uncompressed DIB chunks)."""
    h, w, _ = frames[0].shape
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10, len(frames), 0,
                       1, 0, w, h, 0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack(
        "<I", 4 + 8 + len(avih)) + b"hdrl" + b"avih" + struct.pack(
        "<I", len(avih)) + avih
    movi = b"movi"
    for f in frames:
        chunk = encode_bmp(f)
        movi += b"00db" + struct.pack("<I", len(chunk)) + chunk
        if len(chunk) & 1:
            movi += b"\x00"
    movi = b"LIST" + struct.pack("<I", len(movi)) + movi
    return (b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi))
            + b"AVI " + hdrl + movi)


def decode_avi(data: bytes) -> tuple[int, int, list[bytes]]:
    """Minimal RIFF AVI walk → (width, height, frame BMP byte strings)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' magic missing)")
    pos, w = 12, None
    h = None
    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h
        p = lo
        while p + 8 <= hi:
            cid = data[p:p + 4]
            size = struct.unpack_from("<I", data, p + 4)[0]
            body_lo = p + 8
            if cid == b"LIST":
                walk(body_lo + 4, body_lo + size)   # skip the list type
            elif cid == b"avih":
                vals = struct.unpack_from("<14I", data, body_lo)
                w, h = vals[8], vals[9]
            elif cid == b"00db":
                frames.append(data[body_lo:body_lo + size])
            p = body_lo + size + (size & 1)

    walk(12, len(data))
    if w is None:
        raise ValueError("AVI missing avih header")
    return w, h, frames


# ---------------------------------------------------------------------------
# synthetic media table (real containers, SQL-mirrorable dimension formulas)
# ---------------------------------------------------------------------------

def media_dims(doc_id: np.ndarray):
    """Dimension formulas shared with the SQL oracle.  For audio,
    (width, height) carries (n_samples, 1)."""
    kind_idx = doc_id % 3
    w_img = 4 + doc_id % 29
    h_img = 4 + doc_id % 17
    width = np.where(kind_idx == 1, 64 + doc_id % 193, w_img)
    height = np.where(kind_idx == 1, 1, h_img)
    n_frames = np.where(kind_idx == 2, 2 + doc_id % 7, 1)
    return kind_idx, width, height, n_frames


MEDIA_DIMS_SQL = """
SELECT doc_id AS media_id,
       CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image'
            WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 64 + doc_id % 193
                 ELSE 4 + doc_id % 29 END AS BIGINT) AS width,
       CAST(CASE WHEN doc_id % 3 = 1 THEN 1
                 ELSE 4 + doc_id % 17 END AS BIGINT) AS height,
       CAST(CASE WHEN doc_id % 3 = 2 THEN 2 + doc_id % 7 ELSE 1 END
         AS BIGINT) AS n_frames
FROM documents
""".strip()


def _pix_from_seed(seed: bytes, h: int, w: int) -> np.ndarray:
    n = h * w * 3
    reps = -(-n // len(seed))
    return np.frombuffer((seed * reps)[:n], np.uint8).reshape(h, w, 3)


def build_payloads(batch: pa.Table) -> pa.Table:
    """documents batch → media table (REAL BMP/WAV/AVI payloads)."""
    doc_id = batch["doc_id"].to_numpy()
    texts = batch["text"].to_pandas()
    kind_idx, width, height, n_frames = media_dims(doc_id)
    payloads, kinds = [], []
    for i, d in enumerate(doc_id):
        k = KINDS[int(kind_idx[i])]
        seed = hashlib.blake2b(str(texts[i]).encode(),
                               digest_size=32).digest()
        w, h, nf = int(width[i]), int(height[i]), int(n_frames[i])
        if k == "image":
            payloads.append(encode_bmp(_pix_from_seed(seed, h, w)))
        elif k == "audio":
            reps = -(-w * 2 // len(seed))
            samples = np.frombuffer((seed * reps)[:w * 2], "<i2")
            payloads.append(encode_wav(samples))
        else:
            frames = [_pix_from_seed(
                hashlib.blake2b(seed + f.to_bytes(4, "little"),
                                digest_size=32).digest(), h, w)
                for f in range(nf)]
            payloads.append(encode_avi(frames))
        kinds.append(k)
    return pa.table({"media_id": pa.array(doc_id.astype(np.int64)),
                     "kind": pa.array(kinds, pa.string()),
                     "payload": pa.array(payloads, pa.binary())})


def media_dataset(sf_dir: str) -> "ray.data.Dataset":
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    # binary payloads: keep batches small so batch × concurrency fits the
    # worker heap (the multimodal batch-size rule — images are KBs-MBs)
    return ds.map_batches(build_payloads, batch_format="pyarrow",
                          batch_size=1024)


# ---------------------------------------------------------------------------
# decode / resize / frame-sample / feature-extract stages
# ---------------------------------------------------------------------------

def _use_actors() -> bool:
    """Actor pools vs stateless task pools for the media stages.

    An actor pool amortizes an EXPENSIVE ``__init__`` (heavy codec/model
    load) across a stage's lifetime.  These pure-numpy codecs have zero
    load cost, so paying a fresh actor-pool launch per query (~1.2 s
    fixed on a 32-CPU box — the round-2 media bench regression,
    BENCH.md) buys nothing: by default the stages run the same callable
    classes as stateless tasks.  Set ``MIRU_MEDIA_ACTORS=1`` — or swap
    in a heavyweight codec — to flip every stage to actor pools;
    nothing else changes."""
    return os.environ.get("MIRU_MEDIA_ACTORS", "0") == "1"


def media_stage(ds: "ray.data.Dataset", cls, batch_size: int = 1024,
                **init_kw) -> "ray.data.Dataset":
    if _use_actors():
        return ds.map_batches(cls, fn_constructor_kwargs=init_kw or None,
                              batch_format="pyarrow", batch_size=batch_size,
                              concurrency=(1, 4))
    return ds.map_batches(cls(**init_kw), batch_format="pyarrow",
                          batch_size=batch_size)


class MediaCodec:
    """Dispatching decoder over the three REAL container formats.
    ``probe`` sniffs the magic; per-kind decode raises ValueError on a
    malformed payload exactly like a production codec."""

    def probe(self, payload: bytes) -> str:
        if payload[:2] == b"BM":
            return "image"
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return "audio"
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            return "video"
        raise ValueError("unknown container magic")

    def header(self, payload: bytes) -> tuple[str, int, int, int]:
        """(kind, width, height, n_frames) — metadata-only parse."""
        kind = self.probe(payload)
        if kind == "image":
            pix = decode_bmp(payload)        # full decode validates rows
            return kind, pix.shape[1], pix.shape[0], 1
        if kind == "audio":
            samples, _rate = decode_wav(payload)
            return kind, len(samples), 1, 1
        w, h, frames = decode_avi(payload)
        return kind, w, h, len(frames)


class ImageDecoder:
    """Stage: payload → (media_id, kind, width, height, n_frames), read
    back out of the REAL containers (``__init__`` is where a heavyweight
    codec would load — once per actor in actor mode)."""

    def __init__(self):
        self.codec = MediaCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["media_id"].to_numpy()
        rows = {"media_id": [], "kind": [], "width": [], "height": [],
                "n_frames": []}
        for i, payload in enumerate(b["payload"].to_pylist()):
            kind, w, h, nf = self.codec.header(payload)
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


def _resize_nn(pix: np.ndarray, max_side: int) -> np.ndarray:
    """REAL nearest-neighbor resample to fit max_side (no-op if small)."""
    h, w, _ = pix.shape
    scale = min(1.0, max_side / max(w, h))
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    if (nw, nh) == (w, h):
        return pix
    ri = np.minimum((np.arange(nh) / scale).astype(np.int64), h - 1)
    ci = np.minimum((np.arange(nw) / scale).astype(np.int64), w - 1)
    return pix[ri][:, ci]


class Resizer:
    """Stage: REAL nearest-neighbor resize of images and of every video
    frame, re-encoded into the same container; audio passes through."""

    def __init__(self, max_side: int = RESIZE_MAX_SIDE):
        self.max_side = max_side
        self.codec = MediaCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        out = []
        for payload in b["payload"].to_pylist():
            kind = self.codec.probe(payload)
            if kind == "image":
                out.append(encode_bmp(_resize_nn(decode_bmp(payload),
                                                 self.max_side)))
            elif kind == "video":
                _, _, frames = decode_avi(payload)
                out.append(encode_avi(
                    [_resize_nn(decode_bmp(f), self.max_side)
                     for f in frames]))
            else:
                out.append(payload)
        return b.set_column(b.schema.get_field_index("payload"), "payload",
                            pa.array(out, pa.binary()))


class FrameSampler:
    """Row-expanding stage: video → every FRAME_STEP-th REAL frame (a
    standalone decodable BMP) as its own row."""

    def __init__(self, step: int = FRAME_STEP):
        self.step = step
        self.codec = MediaCodec()

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = b["media_id"].to_numpy()
        rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
        for i, payload in enumerate(b["payload"].to_pylist()):
            if self.codec.probe(payload) != "video":
                continue
            _, _, frames = decode_avi(payload)
            for f in range(0, len(frames), self.step):
                rows["media_id"].append(int(ids[i]))
                rows["frame_idx"].append(f)
                rows["frame_payload"].append(frames[f])
        return pa.table({"media_id": pa.array(rows["media_id"], pa.int64()),
                         "frame_idx": pa.array(rows["frame_idx"], pa.int64()),
                         "frame_payload": pa.array(rows["frame_payload"],
                                                   pa.binary())})


class FeatureExtractor:
    """Stage: payload → 16-dim REAL statistics vector (per-channel pixel
    mean/std/min/max for images and first video frames; RMS / mean /
    std / zero-crossing-rate for audio) — the batched-model-forward
    slot in a production pipeline."""

    DIM = 16

    def __init__(self):
        self.codec = MediaCodec()

    def _img_feats(self, pix: np.ndarray, nf: int) -> np.ndarray:
        p = pix.reshape(-1, 3).astype(np.float64)
        v = np.concatenate([p.mean(axis=0) / 255.0, p.std(axis=0) / 255.0,
                            p.min(axis=0) / 255.0, p.max(axis=0) / 255.0,
                            [pix.shape[1], pix.shape[0], nf, 0.0]])
        return v.astype(np.float32)

    def __call__(self, b: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        for payload in b["payload"].to_pylist():
            kind = self.codec.probe(payload)
            if kind == "image":
                pix = decode_bmp(payload)
                widths.append(pix.shape[1])
                heights.append(pix.shape[0])
                feats.append(self._img_feats(pix, 1))
            elif kind == "video":
                w, h, frames = decode_avi(payload)
                pix = decode_bmp(frames[0])
                widths.append(pix.shape[1])
                heights.append(pix.shape[0])
                feats.append(self._img_feats(pix, len(frames)))
            else:
                s, rate = decode_wav(payload)
                x = s.astype(np.float64) / 32768.0
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
                            ) if len(x) > 1 else 0.0
                v = np.zeros(self.DIM, np.float64)
                v[:6] = [np.sqrt(np.mean(x * x)), x.mean(), x.std(),
                         zcr, len(x), rate]
                widths.append(len(s))
                heights.append(1)
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
    """Decode metadata out of the REAL binary containers (proves the
    binary column round-trips through Ray/Arrow and the codecs intact —
    the SQL oracle recomputes the dims formulas directly)."""
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
    return pa.Table.from_pandas(
        pdf.sort_values("media_id").reset_index(drop=True),
        preserve_index=False)


def media_pipeline_features(sf_dir: str) -> pa.Table:
    """decode → resize → feature-extract chained stages; returns the
    RESIZED dims (decoded back out of the re-encoded containers —
    proving the real resample math and the binary round-trip) + feature
    dimensionality.  The feature VALUES are real pixel/sample statistics
    (non-SQL); the resized dims and dim count are formula-exact, so the
    whole output is oracle-checkable."""
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
       CAST(ceil((2 + doc_id % 7) * 1.0 / {FRAME_STEP}) AS BIGINT)
         AS n_sampled
FROM documents WHERE doc_id % 3 = 2 ORDER BY media_id
""".strip(),
    # resize formula mirrored op-for-op (scale = min(1, 8/max(w,h));
    # trunc == floor since everything is positive); audio untouched
    "media_pipeline_features": f"""
WITH m AS (
  SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS kind_idx,
         CAST(4 + doc_id % 29 AS DOUBLE) AS w,
         CAST(4 + doc_id % 17 AS DOUBLE) AS h
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(CASE WHEN kind_idx = 1 THEN 64 + doc_id % 193
            ELSE greatest(1, floor(w * least(1.0,
                                   {RESIZE_MAX_SIDE}.0 / greatest(w, h))))
            END AS BIGINT) AS width,
       CAST(CASE WHEN kind_idx = 1 THEN 1
            ELSE greatest(1, floor(h * least(1.0,
                                   {RESIZE_MAX_SIDE}.0 / greatest(w, h))))
            END AS BIGINT) AS height,
       CAST(16 AS BIGINT) AS feature_dim
FROM m ORDER BY media_id
""".strip(),
}
