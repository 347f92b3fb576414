"""Posting-list codec: delta-gap + varint compression with block-max metadata.

The reference stores posting lists as Roaring bitmaps, "atomized" per 16-bit
container key to bound write amplification for huge terms
(``miru-service/.../index/lab/LabInvertedIndex.java:268-292``).  Our engine
stores sorted doc_id runs as delta-gap varints chunked into fixed-size blocks
whose per-block (last_doc, max_tf) metadata powers block-max WAND pruning —
the BASELINE.json north-rule encoding.

All encode/decode paths are NumPy-vectorized: the per-byte loops below run at
most ``ceil(64/7)=10`` iterations regardless of array length.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

BLOCK_SIZE = 128  # postings per block (block-max granularity)

_U7 = np.uint64(7)
_MASK7 = np.uint64(0x7F)


def _varint_nbytes(a: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding (vectorized)."""
    nb = np.ones(len(a), np.int64)
    v = a >> _U7
    while True:
        m = v > 0
        if not m.any():
            break
        nb[m] += 1
        v = v >> _U7
    return nb


def varint_encode(values: np.ndarray, return_nbytes: bool = False):
    """LEB128-encode a uint64 array (vectorized over values).

    ``return_nbytes=True`` also returns the per-value byte lengths —
    callers that split the blob per group need them and should not pay
    the length scan twice."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(a)
    if n == 0:
        return (b"", np.empty(0, np.int64)) if return_nbytes else b""
    nb = _varint_nbytes(a)
    total = int(nb.sum())
    out = np.zeros(total, np.uint8)
    pos = np.zeros(n, np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    cur = a.copy()
    idx = pos
    remaining = nb.copy()
    while True:
        m = remaining > 0
        if not m.any():
            break
        byte = (cur[m] & _MASK7).astype(np.uint8)
        cont = (remaining[m] > 1).astype(np.uint8) << 7
        out[idx[m]] = byte | cont
        cur[m] >>= _U7
        idx[m] += 1
        remaining[m] -= 1
    return (out.tobytes(), nb) if return_nbytes else out.tobytes()


def varint_decode(buf: bytes | memoryview, count: int | None = None) -> np.ndarray:
    """Decode a LEB128 byte buffer back to a uint64 array."""
    b = np.frombuffer(buf, np.uint8)
    if len(b) == 0:
        return np.empty(0, np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    if len(ends) == 0 or ends[-1] != len(b) - 1:
        # every-continuation-bit or truncated trailing varint: raise a
        # diagnosable corruption error, never IndexError / silent drop
        raise ValueError("malformed varint buffer: unterminated value")
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    data = (b & 0x7F).astype(np.uint64)
    vals = np.zeros(len(ends), np.uint64)
    for j in range(int(lengths.max())):
        m = lengths > j
        vals[m] |= data[starts[m] + j] << np.uint64(7 * j)
    if count is not None and len(vals) != count:
        raise ValueError(f"decoded {len(vals)} varints, expected {count}")
    return vals


@dataclass(frozen=True)
class EncodedPostings:
    """One term's encoded posting list (the unit stored per segment row)."""

    doc_bytes: bytes      # varint: [first_doc, gap, gap, ...]
    tf_bytes: bytes       # varint: tf per posting, same order
    df: int               # number of postings (docs containing the term)
    cf: int               # collection frequency = sum(tf)  (reference: the
    #                       docId=-1 "globalCardinality" row,
    #                       LabFieldIndex.java:474-476)
    block_last_doc: np.ndarray  # int64, last doc_id of each BLOCK_SIZE block
    block_max_tf: np.ndarray    # int32, max tf within each block


def encode_postings(doc_ids: np.ndarray, tfs: np.ndarray) -> EncodedPostings:
    """Encode one term's (sorted doc_ids, tfs) into gap-varint + block-max."""
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    if len(doc_ids) == 0:
        raise ValueError("empty posting list")
    if len(doc_ids) > 1 and not (np.diff(doc_ids) > 0).all():
        order = np.argsort(doc_ids, kind="stable")
        doc_ids, tfs = doc_ids[order], tfs[order]
        if not (np.diff(doc_ids) > 0).all():
            raise ValueError("duplicate doc_id in posting list")
    gaps = np.empty(len(doc_ids), np.uint64)
    gaps[0] = doc_ids[0]
    np.subtract(doc_ids[1:], doc_ids[:-1], out=gaps[1:], casting="unsafe")
    nblocks = (len(doc_ids) + BLOCK_SIZE - 1) // BLOCK_SIZE
    last_idx = np.minimum(np.arange(1, nblocks + 1) * BLOCK_SIZE, len(doc_ids)) - 1
    block_last_doc = doc_ids[last_idx]
    block_max_tf = np.maximum.reduceat(
        tfs, np.arange(0, len(tfs), BLOCK_SIZE)
    ).astype(np.int32)
    return EncodedPostings(
        doc_bytes=varint_encode(gaps),
        tf_bytes=varint_encode(tfs.astype(np.uint64)),
        df=int(len(doc_ids)),
        cf=int(tfs.sum()),
        block_last_doc=block_last_doc.astype(np.int64),
        block_max_tf=block_max_tf,
    )


def decode_doc_ids(doc_bytes: bytes, df: int) -> np.ndarray:
    """Decode gap-varints back to sorted int64 doc_ids."""
    gaps = varint_decode(doc_bytes, df)
    return np.cumsum(gaps.astype(np.int64))


def decode_tfs(tf_bytes: bytes, df: int) -> np.ndarray:
    return varint_decode(tf_bytes, df).astype(np.int64)


def _encode_and_split(values: np.ndarray, starts: np.ndarray,
                      return_offsets: bool = False):
    """Varint-encode a flat array once, then slice per-group byte ranges.

    ``return_offsets=True`` also returns the per-VALUE byte-offset array
    (len(values)+1) so callers can compute sub-group seek points (the
    positional block-seek metadata) without re-encoding."""
    blob, nb = varint_encode(values, return_nbytes=True)
    byte_off = np.zeros(len(values) + 1, np.int64)
    np.cumsum(nb, out=byte_off[1:])
    bounds = np.append(starts, len(values))
    mv = memoryview(blob)
    blobs = [bytes(mv[byte_off[bounds[i]]:byte_off[bounds[i + 1]]])
             for i in range(len(starts))]
    return (blobs, byte_off) if return_offsets else blobs


def bulk_encode_postings(doc_ids: np.ndarray, tfs: np.ndarray,
                         term_starts: np.ndarray) -> dict:
    """Encode MANY terms' postings in one vectorized pass.

    ``doc_ids``/``tfs`` are flat arrays sorted by (term, doc_id);
    ``term_starts[i]`` is the start offset of term i.  Every step below is a
    whole-array NumPy op — the only Python-level loop is the final byte-blob
    slicing.  Returns columns for the segment table:
    ``doc_bytes, tf_bytes, df, cf, block_last_doc (offsets, values),
    block_max_tf (values)``.
    """
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    n = len(doc_ids)
    starts = np.ascontiguousarray(term_starts, dtype=np.int64)
    nterms = len(starts)
    bounds = np.append(starts, n)
    df = np.diff(bounds)
    if (df <= 0).any():
        raise ValueError("empty term group")
    cf = np.add.reduceat(tfs, starts)

    # delta-gap: every position is doc - prev, except each term's first
    # position which stores the absolute doc_id
    gaps = np.empty(n, np.uint64)
    gaps[1:] = (doc_ids[1:] - doc_ids[:-1]).astype(np.uint64)
    gaps[starts] = doc_ids[starts].astype(np.uint64)

    doc_blobs = _encode_and_split(gaps, starts)
    tf_blobs = _encode_and_split(tfs.astype(np.uint64), starts)

    # block-max metadata, vectorized across all terms at once
    nblocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    block_term = np.repeat(np.arange(nterms), nblocks)
    block_off = np.zeros(nterms + 1, np.int64)
    np.cumsum(nblocks, out=block_off[1:])
    within = np.arange(len(block_term)) - block_off[block_term]
    bstart = starts[block_term] + within * BLOCK_SIZE
    bend = np.minimum(bstart + BLOCK_SIZE, bounds[block_term + 1]) - 1
    block_last_doc = doc_ids[bend]
    block_max_tf = np.maximum.reduceat(tfs, bstart).astype(np.int32) \
        if len(bstart) else np.empty(0, np.int32)

    return {
        "doc_bytes": doc_blobs,
        "tf_bytes": tf_blobs,
        "df": df.astype(np.int64),
        "cf": cf.astype(np.int64),
        "block_offsets": block_off,         # int64 (nterms+1,) → ListArray offsets
        "block_last_doc": block_last_doc,   # int64 flat values
        "block_max_tf": block_max_tf,       # int32 flat values
    }


# ---------------------------------------------------------------------------
# positional postings (opt-in; Lucene-style within-doc position deltas)
# ---------------------------------------------------------------------------

def position_gaps(pos: np.ndarray, run_starts: np.ndarray) -> np.ndarray:
    """Delta-encode token positions for varint storage.

    ``pos`` is the flat array of within-doc token positions in (term,
    doc_id) order; ``run_starts[i]`` is the offset where posting i's
    positions begin (one run per (term, doc) posting).  Each run stores
    its first position absolute and the rest as gaps — the same scheme
    the doc-id stream uses across terms (reference analogue: Lucene's
    .prx position deltas, which miru defers to via
    ``LuceneBackedQueryParser``).
    """
    pos = np.ascontiguousarray(pos, dtype=np.int64)
    gaps = np.empty(len(pos), np.uint64)
    if len(pos):
        gaps[1:] = (pos[1:] - pos[:-1]).astype(np.uint64)
        # zero-length runs share the next run's start (or sit past the end
        # when they close the stream) — clip before the absolute overwrite
        rs = run_starts[run_starts < len(pos)]
        gaps[rs] = pos[rs].astype(np.uint64)
    return gaps


def decode_positions(pos_bytes: bytes, counts: np.ndarray) -> np.ndarray:
    """Decode one term's position stream back to flat within-doc positions.

    ``counts[i]`` = number of positions of posting i (== tf for tokenized
    terms — the build asserts that invariant).  Returns the flat int64
    position array; split points are ``np.cumsum(counts)``.
    """
    counts = np.ascontiguousarray(counts, dtype=np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64)
    gaps = varint_decode(pos_bytes, total).astype(np.int64)
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    c = np.cumsum(gaps)
    # zero-count runs at the stream end index past it — clip; their base
    # is repeated 0 times so the value never matters
    idx = np.minimum(starts, total - 1)
    base = c[idx] - gaps[idx]   # cumsum immediately BEFORE each run
    return c - np.repeat(base, counts)
