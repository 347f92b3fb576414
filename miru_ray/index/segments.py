"""Immutable segment files: term dictionary + compressed postings.

One segment = all terms of one (doc-partition, term-shard) cell, term-sorted,
stored as a Parquet file.  This is the Ray-Data-native analogue of the
reference's per-partition LAB field index (term → Roaring bitmap + tf store,
``miru-service/.../index/lab/LabFieldIndex.java`` /
``LabInvertedIndex.java``): postings here are delta-gap varint doc-id runs
with per-block (last_doc, max_tf) block-max metadata instead of atomized
bitmap containers.

Layout inside ``index_dir``::

    segments/p{pid:05d}_s{shard:03d}.parquet

Files are written atomically (tmp + rename) with deterministic content, so a
retried/resumed task that finds the file present can skip the write — the
checkpoint/resume unit of the postings stage.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..codec import (BLOCK_SIZE, _encode_and_split, bulk_encode_postings,
                     decode_doc_ids, decode_positions, decode_tfs,
                     position_gaps)
from ..util import md5_64

SEGMENT_SCHEMA = pa.schema([
    ("term", pa.string()),
    ("df", pa.int64()),
    ("cf", pa.int64()),
    # first/last doc per term, captured at INDEX time in the same encode
    # pass (zero extra shuffle) — the reference's latest/first index
    # families (``miru-service/.../stream/MiruIndexLatest.java:25``,
    # ``MiruIndexFirst.java``): "latest doc per term" without a query-time
    # groupby.  Global first/last = min/max across segments.
    ("first_doc", pa.int64()),
    ("last_doc", pa.int64()),
    ("doc_bytes", pa.binary()),
    ("tf_bytes", pa.binary()),
    ("block_last_doc", pa.list_(pa.int64())),
    ("block_max_tf", pa.list_(pa.int32())),
])

#: positional-index variant: per-term within-doc position stream, delta-gap
#: varints with one run per posting (run length == tf — the implied-split
#: invariant the build asserts), plus per-BLOCK byte offsets into that
#: stream for candidate-only decode (block-seek).  Only present when the
#: index was built with ``IndexConfig.positional_fields``; default
#: segments stay byte-identical to pre-positional builds.
SEGMENT_SCHEMA_POS = (SEGMENT_SCHEMA
                      .append(pa.field("pos_bytes", pa.binary()))
                      .append(pa.field("pos_block_bytes",
                                       pa.list_(pa.int64()))))


def empty_pos_column(n: int) -> pa.ListArray:
    """All-empty ``pos`` runs for n posting rows — pads parts that carry
    no positions (keyword/numeric/bigram terms, upgrade deltas) so they
    concat-align with positional parts.  THE one definition: the encoder
    keys its implied-split invariant off these lengths."""
    return pa.ListArray.from_arrays(
        pa.array(np.zeros(n + 1, np.int32)), pa.array([], pa.int32()))


def segment_rel_path(pid: int, shard: int) -> str:
    return f"segments/p{pid:05d}_s{shard:03d}.parquet"


def encode_segment_table(group: pa.Table,
                         with_doclen: bool = False):
    """(term, doc_id, tf) rows for ONE (partition, shard) → segment table.

    Sorts by (term, doc_id); every encode step is vectorized across all terms
    at once (:func:`miru_ray.codec.bulk_encode_postings`).

    ``with_doclen=True`` additionally returns the (doc_id, dl) partial —
    Σ tf per doc over TOKENIZED terms (no ``:``) — computed from the
    already-deduped sorted arrays, i.e. for free relative to the encode.
    """
    import pandas as pd

    terms = group["term"].combine_chunks() if isinstance(group["term"], pa.ChunkedArray) else group["term"]
    term_np = np.asarray(terms.to_pandas(), dtype=object)
    doc_np = group["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    tf_np = group["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
    has_pos = "pos" in group.column_names
    if has_pos:
        pos_col = group["pos"]
        if isinstance(pos_col, pa.ChunkedArray):
            pos_col = pos_col.combine_chunks()
        pos_flat = pos_col.flatten().to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos_len = pc.list_value_length(pos_col).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pos_src_starts = np.zeros(len(pos_len) + 1, np.int64)
        np.cumsum(pos_len, out=pos_src_starts[1:])

    # sort by (term, doc_id) via integer codes — lexsort over object-dtype
    # strings is ~10× slower than factorize + int lexsort on big groups
    codes, uniques = pd.factorize(term_np, sort=False)
    uniq_order = np.argsort(uniques, kind="stable")  # small: one per term
    rank = np.empty(len(uniques), np.int64)
    rank[uniq_order] = np.arange(len(uniques))
    order = np.lexsort((doc_np, rank[codes]))
    sel = order  # original-row index per FINAL posting (drives pos gather)
    doc_np, tf_np = doc_np[order], tf_np[order]
    sorted_ranks = rank[codes][order]
    # drop exact-duplicate (term, doc) rows — idempotence insurance against
    # re-executed upstream tasks double-writing postings (cheap mask, not a
    # hash aggregate)
    if len(doc_np) > 1:
        dup = (sorted_ranks[1:] == sorted_ranks[:-1]) & (doc_np[1:] == doc_np[:-1])
        if dup.any():
            keep = np.ones(len(doc_np), bool)
            keep[1:] = ~dup
            doc_np, tf_np, sorted_ranks = (doc_np[keep], tf_np[keep],
                                           sorted_ranks[keep])
            sel = sel[keep]
    is_start = np.empty(len(sorted_ranks), bool)
    is_start[0] = True
    np.not_equal(sorted_ranks[1:], sorted_ranks[:-1], out=is_start[1:])
    starts = np.flatnonzero(is_start)
    sorted_terms = uniques[uniq_order]  # == term at each start, ascending

    enc = bulk_encode_postings(doc_np, tf_np, starts)
    boff = enc["block_offsets"]
    ends = np.append(starts[1:], len(doc_np))
    doclen = None
    if with_doclen:
        is_kw = np.fromiter((":" in t for t in sorted_terms), bool,
                            count=len(sorted_terms))
        keep = ~is_kw[sorted_ranks]
        d, inv = np.unique(doc_np[keep], return_inverse=True)
        dls = np.bincount(inv, weights=tf_np[keep]).astype(np.int64)
        doclen = pa.table({"doc_id": pa.array(d), "dl": pa.array(dls)})
    cols = {
        "term": pa.array(sorted_terms, type=pa.string()),
        "df": pa.array(enc["df"]),
        "cf": pa.array(enc["cf"]),
        "first_doc": pa.array(doc_np[starts]),
        "last_doc": pa.array(doc_np[ends - 1]),
        "doc_bytes": pa.array(enc["doc_bytes"], type=pa.binary()),
        "tf_bytes": pa.array(enc["tf_bytes"], type=pa.binary()),
        "block_last_doc": pa.ListArray.from_arrays(
            pa.array(boff, type=pa.int32()) if boff[-1] < 2**31 else pa.array(boff, type=pa.int64()),
            pa.array(enc["block_last_doc"], type=pa.int64())),
        "block_max_tf": pa.ListArray.from_arrays(
            pa.array(boff, type=pa.int32()) if boff[-1] < 2**31 else pa.array(boff, type=pa.int64()),
            pa.array(enc["block_max_tf"], type=pa.int32())),
    }
    schema = SEGMENT_SCHEMA
    if has_pos:
        # gather each final posting's position run from the pre-sort flat
        # stream (ONE fancy-index pass), then varint the delta-gapped
        # stream split per TERM — decode splits runs by tf, so assert the
        # invariant len(pos) == tf for every bare-token posting here
        run_len = pos_len[sel]
        is_kw_post = np.fromiter((":" in t for t in sorted_terms), bool,
                                 count=len(sorted_terms))[sorted_ranks]
        if not (np.array_equal(run_len[~is_kw_post], tf_np[~is_kw_post])
                and not run_len[is_kw_post].any()):
            raise ValueError("positional invariant violated: position "
                             "count != tf for a tokenized posting")
        out_starts = np.zeros(len(run_len) + 1, np.int64)
        np.cumsum(run_len, out=out_starts[1:])
        gather = (np.repeat(pos_src_starts[sel] - out_starts[:-1], run_len)
                  + np.arange(out_starts[-1], dtype=np.int64))
        flat = pos_flat[gather]
        gaps = position_gaps(flat, out_starts[:-1])
        # per-term split points in the flat position stream
        term_pos_starts = out_starts[starts]
        blobs, byte_off = _encode_and_split(gaps, term_pos_starts,
                                            return_offsets=True)
        cols["pos_bytes"] = pa.array(blobs, type=pa.binary())
        # block-seek metadata (DERIVED at encode time — compaction's
        # decode→re-encode recomputes it): byte offset of each
        # BLOCK_SIZE-posting block's position runs, relative to the
        # term's pos_bytes start.  Every run starts with an absolute
        # position and blocks are posting-aligned, so a reader can
        # decode ONLY the blocks holding candidate postings instead of
        # a hot term's whole per-partition stream.
        boff2 = enc["block_offsets"]
        nblocks = np.diff(boff2)
        block_term = np.repeat(np.arange(len(term_pos_starts)), nblocks)
        within = np.arange(len(block_term)) - boff2[block_term]
        bpost = starts[block_term] + within * BLOCK_SIZE  # first posting
        rel = (byte_off[out_starts[bpost]]
               - byte_off[term_pos_starts[block_term]])
        cols["pos_block_bytes"] = pa.ListArray.from_arrays(
            pa.array(boff2, type=pa.int32()) if boff2[-1] < 2**31
            else pa.array(boff2, type=pa.int64()),
            pa.array(rel, type=pa.int64()))
        schema = SEGMENT_SCHEMA_POS
    seg = pa.table(cols).cast(schema)
    return (seg, doclen) if with_doclen else seg


BLOOM_K = 4          # probes per term
_BLOOM_MAX_BITS = 1 << 23  # 1 MiB of bits per segment, cap


def _bloom_params(n_terms: int) -> int:
    """Bit-array size: ~10 bits/term rounded to a power of two (k=4 →
    ≈2% false-positive rate), capped."""
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n_terms) * 10))))
    return min(m, _BLOOM_MAX_BITS)


def _bloom_probes(hashes: np.ndarray, m: int) -> np.ndarray:
    """(n,) uint64 term hashes → (n, BLOOM_K) bit positions (double
    hashing: h1 + i·h2 mod m)."""
    h1 = (hashes & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((hashes >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    i = np.arange(BLOOM_K, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m


def build_term_bloom(terms: np.ndarray) -> tuple[int, bytes]:
    """Bloom filter over a segment's term set (zero false negatives by
    construction — reference: per-field bloom index,
    ``miru-service/.../stream/MiruIndexBloom.java:28``,
    ``miru-plugin/.../index/BloomIndex.java``)."""
    m = _bloom_params(len(terms))
    bits = np.zeros(m, bool)
    pos = _bloom_probes(md5_64(terms), m)
    bits[pos.reshape(-1)] = True
    return m, np.packbits(bits).tobytes()


def bloom_may_contain(m: int, packed: np.ndarray, term: str) -> bool:
    pos = _bloom_probes(md5_64(np.array([term], dtype=object)), m)[0]
    return bool((packed[pos >> 3] & (1 << (7 - (pos & 7)))).all())


def read_segment_bloom(path: str) -> tuple[int, np.ndarray] | None:
    """Read ONLY the parquet footer: (m, packed bit bytes) or None for
    segments written before blooms existed.  A footer read costs ~KB — the
    point is skipping the full segment load for absent terms."""
    import base64
    md = pq.read_metadata(path).metadata or {}
    if b"bloom_m" not in md:
        return None
    return (int(md[b"bloom_m"]),
            np.frombuffer(base64.b64decode(md[b"bloom_b64"]), np.uint8))


def write_segment(table: pa.Table, path: str) -> None:
    import base64
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    m, packed = build_term_bloom(
        np.asarray(table["term"].to_pandas(), dtype=object))
    meta = dict(table.schema.metadata or {})
    meta[b"bloom_m"] = str(m).encode()
    meta[b"bloom_b64"] = base64.b64encode(packed)
    pq.write_table(table.replace_schema_metadata(meta), tmp,
                   compression="zstd")
    os.replace(tmp, path)


def segment_rows_table(t: pa.Table) -> pa.Table:
    """Decode term-dict rows (term, df, doc_bytes, tf_bytes) into flat
    (term, doc_id, tf) posting rows — THE segment decode primitive.  Both
    whole-file decode (:func:`segment_to_rows`) and the compaction stream
    (``index.compact``) go through here, so a postings-codec or schema
    change has exactly one decode site to update."""
    dfs = t["df"].to_numpy()
    terms = np.asarray(t["term"].to_pandas(), dtype=object)
    has_pos = "pos_bytes" in t.column_names
    docs_out, tfs_out, pos_out, plen_out = [], [], [], []
    for i in range(t.num_rows):
        df = int(dfs[i])
        docs_out.append(decode_doc_ids(t["doc_bytes"][i].as_py(), df))
        tfs = decode_tfs(t["tf_bytes"][i].as_py(), df)
        tfs_out.append(tfs)
        if has_pos:
            if ":" in terms[i]:  # keyword/bigram terms store no positions
                pos_out.append(np.empty(0, np.int64))
                plen_out.append(np.zeros(df, np.int64))
            else:
                pos_out.append(decode_positions(
                    t["pos_bytes"][i].as_py(), tfs))
                plen_out.append(tfs)
    cols = {
        "term": pa.array(np.repeat(terms, dfs), pa.string()),
        "doc_id": pa.array(np.concatenate(docs_out) if docs_out
                           else np.empty(0, np.int64)),
        "tf": pa.array(np.concatenate(tfs_out) if tfs_out
                       else np.empty(0, np.int64)),
    }
    if has_pos:
        plen = (np.concatenate(plen_out) if plen_out
                else np.empty(0, np.int64))
        off = np.zeros(len(plen) + 1, np.int64)
        np.cumsum(plen, out=off[1:])
        if len(off) and int(off[-1]) >= 2 ** 31:
            # ListArray offsets are int32 — a silent astype wrap would
            # re-encode GARBAGE position runs into the compacted index.
            # Decode batches are 2048 term-dict rows; hitting this means
            # pathological position volume per batch — fail loudly.
            raise ValueError(
                f"decode batch carries {int(off[-1])} positions — "
                "exceeds int32 list offsets; lower the decode batch "
                "size (compact._make_decode_fn)")
        cols["pos"] = pa.ListArray.from_arrays(
            pa.array(off.astype(np.int32)),
            pa.array((np.concatenate(pos_out) if pos_out
                      else np.empty(0, np.int64)).astype(np.int32)))
    return pa.table(cols)


def segment_to_rows(path: str) -> pa.Table:
    """Decode a whole segment back to (term, doc_id, tf) rows — the input
    side of a segment merge/compaction (reference: LAB compaction,
    ``compactOnClosedWriters``)."""
    cols = ["term", "df", "doc_bytes", "tf_bytes"]
    if "pos_bytes" in pq.read_schema(path).names:
        cols.append("pos_bytes")
    return segment_rows_table(pq.read_table(path, columns=cols))


class SegmentReader:
    """In-memory view of one segment file: sorted term dict + lazy postings."""

    def __init__(self, path: str):
        self.table = pq.read_table(path)
        self.terms = np.asarray(self.table["term"].to_pandas(), dtype=object)
        self._df = self.table["df"].to_numpy()
        self._cf = self.table["cf"].to_numpy()

    def lookup(self, term: str) -> int | None:
        i = np.searchsorted(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return int(i)
        return None

    def prefix_range(self, prefix: str) -> tuple[int, int]:
        """[lo, hi) rows of terms starting with ``prefix`` (terms are sorted).

        Reference: prefix wildcard expansion via term-range scan
        (``MiruAggregateUtil.java:1154-1167``,
        ``MiruTermComposer.prefixLowerInclusive/UpperExclusive``).
        """
        lo = int(np.searchsorted(self.terms, prefix))
        # upper bound: append the MAX code point, side='right' — plain
        # '￿' would exclude terms whose next char is outside the BMP
        hi = int(np.searchsorted(self.terms, prefix + chr(0x10FFFF),
                                 side="right"))
        return lo, hi

    def stats(self, row: int) -> tuple[int, int]:
        return int(self._df[row]), int(self._cf[row])

    def first_last(self, row: int) -> tuple[int, int]:
        """(first_doc, last_doc) for a term — the index-time latest/first
        family (``MiruIndexLatest.java:25``, ``MiruIndexFirst.java``)."""
        return (int(self.table["first_doc"][row].as_py()),
                int(self.table["last_doc"][row].as_py()))

    def postings(self, row: int) -> tuple[np.ndarray, np.ndarray]:
        df = int(self._df[row])
        docs = decode_doc_ids(self.table["doc_bytes"][row].as_py(), df)
        tfs = decode_tfs(self.table["tf_bytes"][row].as_py(), df)
        return docs, tfs

    @property
    def has_positions(self) -> bool:
        return "pos_bytes" in self.table.column_names

    def positions(self, row: int, tfs: np.ndarray | None = None) -> np.ndarray:
        """Flat within-doc positions for one BARE-TOKEN term (split points
        = cumsum of its tfs).  Keyword/bigram terms store no positions."""
        term = self.terms[row]
        if ":" in term:
            return np.empty(0, np.int64)
        if tfs is None:
            tfs = decode_tfs(self.table["tf_bytes"][row].as_py(),
                             int(self._df[row]))
        return decode_positions(self.table["pos_bytes"][row].as_py(), tfs)

    def positions_at(self, row: int, tfs: np.ndarray,
                     idx: np.ndarray) -> np.ndarray:
        """Block-seek decode: flat positions for ONLY the postings in
        ``idx`` (sorted posting indices), concatenated in order (split
        points = cumsum of ``tfs[idx]``).  Decodes just the BLOCK_SIZE-
        posting blocks containing ``idx`` via the per-block byte offsets
        — a hot term's whole per-partition stream never leaves disk for
        a sparse candidate set.  Bit-identical to slicing the full
        :meth:`positions` decode."""
        if ":" in self.terms[row] or not len(idx):
            return np.empty(0, np.int64)
        if "pos_block_bytes" not in self.table.column_names:
            # positional segment from before block-seek metadata existed:
            # slice the full decode instead
            run_starts = np.zeros(len(tfs) + 1, np.int64)
            np.cumsum(tfs, out=run_starts[1:])
            flat = self.positions(row, tfs)
            take = np.concatenate([
                np.arange(run_starts[j], run_starts[j + 1]) for j in idx])
            return flat[take]
        pos_bytes = self.table["pos_bytes"][row].as_py()
        bo = np.asarray(self.table["pos_block_bytes"][row].as_py(),
                        dtype=np.int64)
        run_starts = np.zeros(len(tfs) + 1, np.int64)
        np.cumsum(tfs, out=run_starts[1:])
        out = []
        mv = memoryview(pos_bytes)
        for b in np.unique(idx // BLOCK_SIZE):
            p0 = int(b) * BLOCK_SIZE
            p1 = min(p0 + BLOCK_SIZE, len(tfs))
            count = int(run_starts[p1] - run_starts[p0])
            if count == 0:
                continue
            end = int(bo[b + 1]) if b + 1 < len(bo) else len(pos_bytes)
            flat = decode_positions(mv[int(bo[b]):end], tfs[p0:p1])
            # select the wanted runs inside this block
            sel = idx[(idx >= p0) & (idx < p1)] - p0
            local = run_starts[p0:p1 + 1] - run_starts[p0]
            take = np.concatenate([
                np.arange(local[j], local[j] + tfs[p0 + j])
                for j in sel]) if len(sel) else np.empty(0, np.int64)
            out.append(flat[take])
        return (np.concatenate(out) if out else np.empty(0, np.int64))

    def block_meta(self, row: int) -> tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.table["block_last_doc"][row].as_py(), dtype=np.int64),
                np.asarray(self.table["block_max_tf"][row].as_py(), dtype=np.int64))
