"""Deduplication operators over the ``documents`` table.

Large-scale training-data dedup, Ray-Data-first (the reference's only dedup
is exact ingest dedup by timestamp keeping max version,
``MiruPartitionAccessor.handleActivities:563-578`` — the hash-partition +
per-group-first pattern here is its batch analogue; near-dup operators are
the explicit-design extensions SURVEY.md §2.8 calls for):

- exact          — content-hash → groupby(hash) → keep min doc_id
- minhash LSH    — word-shingle → minhash(128) → band buckets → DISTRIBUTED
                   bucket-count → colliding buckets only → candidate pairs →
                   exact-Jaccard verify (shingle hashes gathered by
                   candidate-id semi-join) → min-label clusters
- simhash        — 64-bit simhash, 4-band blocking (EXACT for Hamming ≤ 3
                   by pigeonhole), distributed collision detection
- ngram Jaccard  — exact pairwise Jaccard (guarded brute-force verifier)
- embedding      — cosine ≥ τ near-dup pairs over the embeddings table
                   (batch × broadcast-matrix matmul)

Scale shape: signature computation and bucket counting are distributed
(map_batches partials → one small groupby); ONLY rows inside colliding
buckets ever reach the driver (bounded by the corpus duplication mass, with
an explicit hot-bucket cap — the analogue of the reference's atomized
posting containers, ``LabInvertedIndex.java:268-292``).  The one
corpus-bounded driver collect is the GUARDED exact-Jaccard verifier
(:func:`ngram_jaccard_pairs` — its collision-mass guard now runs from
distributed df partials BEFORE the collect).  Token/shingle hashing is
``md5_number_lower``-compatible (:func:`miru_ray.util.md5_64`) so DuckDB
oracles reproduce simhash signatures bit-for-bit.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Min, Sum

from ..tokenize import explode_tokens, py_tokenize
from ..util import (broadcast_get, input_fingerprint, md5_64,
                    md5_64_bulk, md5_128, read_parquet_clean,
                    rowgroup_block_plan, sorted_lookup)

# ------------------------------ helpers ------------------------------------


def _documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    """The dup-planted documents table (fixtures.DOCS_DUP_SQL equivalent) —
    the raw documents table has zero duplicate texts, so the dedup family
    runs over a deterministic derivation with planted exact + near copies.
    The expansion rule is row-local, so it composes with map_batches."""
    import pyarrow.parquet as pq

    from ..fixtures import derive_docs_dup
    path = os.path.join(sf_dir, "documents.parquet")
    n = pq.read_metadata(path).num_rows
    _ = derive_docs_dup  # whole-table reference implementation (tests)
    if columns is not None and set(columns) != {"doc_id", "text"}:
        raise ValueError("the dup derivation emits exactly (doc_id, "
                         f"text); cannot serve columns={columns!r}")
    ds = read_parquet_clean(path, columns=["doc_id", "text"])
    # capture expand_docs_dup at DRIVER scope: a runtime relative import
    # inside the worker-side body would need miru_ray importable on the
    # worker, breaking the arbitrary-cwd driver contract (the function
    # object ships by value via the package's register_pickle_by_value)
    from ..fixtures import expand_docs_dup
    fn = expand_docs_dup
    return ds.map_batches(lambda b: fn(b, n),
                          batch_format="pyarrow", batch_size=8192)


def _shingles(tokens: list[str], n: int = 3) -> set[str]:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


#: optional hot-bucket cap for :func:`_colliding_rows` (``max_bucket``):
#: a band bucket with more members is SKIPPED for pair expansion — the
#: quadratic-blowup guard for pathological duplication groups at true
#: scale (reference precedent: atomized containers bound single-value
#: size, LabInvertedIndex.java:268-292).  None (default) = exact: every
#: colliding bucket expands, matching the SQL oracles bit-for-bit.  When
#: a cap drops buckets it is LOGGED, never silent.
MAX_BUCKET_DEFAULT = None


def _colliding_rows(bands: "ray.data.Dataset", key_col: str,
                    max_bucket: int | None = MAX_BUCKET_DEFAULT,
                    driver_merge_rows: int | None = None) -> pd.DataFrame:
    """Distributed collision detection: per-batch partial counts →
    groupby(key).sum → keys with global count > 1 (≤ ``max_bucket`` if
    capped) → broadcast key set → filter the bands stream → ONLY colliding
    rows reach the driver (bounded by duplication mass).

    ``bands`` is MATERIALIZED first: the count pass and the filter pass
    both consume it, and a lazy Dataset would re-run the whole signature
    computation per consumer.  The banded table is post-shrink (a few
    ints per doc×band); Ray spills blocks to disk if it outgrows the
    object store."""
    bands = bands.materialize()

    def partial_counts(t: pa.Table) -> pa.Table:
        # select by NAME: pyarrow's key-vs-aggregate column ORDER has
        # changed across releases (the same trap mixing.py documents) —
        # a positional rename would silently swap keys and counts
        g = t.group_by(key_col).aggregate([(key_col, "count")])
        return pa.table({key_col: g[key_col],
                         "c": g[f"{key_col}_count"]})

    partials = bands.map_batches(partial_counts, batch_format="pyarrow",
                                 batch_size=65536)
    # merging the count PARTIALS (16 bytes/row of pure ints, one row per
    # distinct key per block) is a reduce, not a shuffle: below the
    # threshold a vectorized driver merge wins by ~40× over a Ray sort
    # groupby's per-block scheduling overhead; above it (true 100-TB
    # runs) the distributed groupby path engages.
    cap = np.iinfo(np.int64).max if max_bucket is None else int(max_bucket)
    if driver_merge_rows is None:
        driver_merge_rows = _DRIVER_MERGE_ROWS
    if bands.count() <= driver_merge_rows:
        pc_df = partials.to_pandas()
        if pc_df.empty:  # zero bands (all-empty corpus): no collisions —
            #              and an all-empty to_pandas has no column names
            keys = np.array([], np.int64)
            n_skipped = 0
        else:
            agg = pc_df.groupby(key_col, sort=False)["c"].sum()
            cvals = agg.to_numpy()
            keys = agg.index.to_numpy()[(cvals > 1) & (cvals <= cap)]
            n_skipped = int((cvals > cap).sum())
    else:
        counts = partials.groupby(key_col).aggregate(Sum("c", alias_name="c"))
        cdf = counts.map_batches(
            lambda t: t.filter(pc.greater(t["c"], 1)),
            batch_format="pyarrow", batch_size=65536).to_pandas()
        if cdf.empty:  # zero COLLIDING buckets: the all-empty filtered
            #            stream loses its column names (same guard as
            #            the driver-merge branch above)
            keys = np.array([], np.int64)
            n_skipped = 0
        else:
            keys = cdf[key_col].to_numpy()[cdf["c"].to_numpy() <= cap]
            n_skipped = int((cdf["c"].to_numpy() > cap).sum())
    if n_skipped:  # no silent caps: dropped coverage must be visible
        import logging
        logging.getLogger(__name__).warning(
            "collision detection skipped %d buckets over max_bucket=%d — "
            "pairs inside them are NOT expanded", n_skipped, cap)
    key_ref = ray.put(np.sort(keys))

    def keep_colliding(t: pa.Table) -> pa.Table:
        ks = ray.get(key_ref)
        hit, _ = sorted_lookup(ks, t[key_col].to_numpy(
            zero_copy_only=False))
        return t.filter(pa.array(hit))

    out = bands.map_batches(keep_colliding, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
    cols = bands.schema().names
    if out.empty and not set(cols) <= set(out.columns):
        out = pd.DataFrame({c: pd.Series([], dtype="int64")
                            for c in cols})
    return out


_DRIVER_MERGE_ROWS = 20_000_000  # swap point: driver count-merge vs
#                                  distributed groupby of count partials


def _expand_pairs(coll: pd.DataFrame, key_col: str) -> set[tuple[int, int]]:
    """Vectorized pair expansion over colliding-bucket rows (driver; input
    is collision-bounded, buckets capped if max_bucket set).  Groups are processed
    per distinct SIZE so expansion is pure reshape+triu numpy — no Python
    loop over the (possibly many) buckets."""
    df = coll[[key_col, "doc_id"]].drop_duplicates()
    df = df.sort_values([key_col, "doc_id"], kind="mergesort")
    keys = df[key_col].to_numpy()
    docs = df["doc_id"].to_numpy().astype(np.int64)
    if not len(keys):
        return set()
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, len(keys)])
    packed = []
    # pack as UNSIGNED 64-bit: doc ids fit 32 bits in every supported
    # corpus, but an id in [2^31, 2^32) would overflow a signed int64
    # shift (a<<32 wraps negative, >>32 sign-extends) — reachable at the
    # design scale, and the dup derivation triples ids
    shift = np.uint64(32)
    for s in np.unique(sizes):
        if s < 2:
            continue
        gsel = starts[sizes == s]
        M = docs[gsel[:, None] + np.arange(s)[None, :]].astype(np.uint64)
        i, j = np.triu_indices(int(s), k=1)
        packed.append((M[:, i].ravel() << shift) | M[:, j].ravel())
    if not packed:
        return set()
    uniq = np.unique(np.concatenate(packed))
    a = (uniq >> shift).astype(np.int64).tolist()
    b = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64).tolist()
    return set(zip(a, b))


# ------------------------------ exact dedup --------------------------------


_EXACT_CACHE: dict = {}


def _exact_survivor_ds(sf_dir: str) -> "ray.data.Dataset":
    """Distributed survivor computation: hash-partition by content hash,
    per-group first (min doc_id) as an AGGREGATE — map_groups over one
    tiny pandas group per distinct text is orders slower.  Nothing
    materializes on the driver here; consumers either write the stream
    (``out_path``) or collect it as the query RESULT."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        lo, hi = md5_128(b["text"].to_pandas())
        return pa.table({"h": pa.array(lo.view(np.int64)),
                         "h2": pa.array(hi.view(np.int64)),
                         "doc_id": b["doc_id"]})

    # the FULL 128-bit pair is the group key: 64 bits expect birthday
    # collisions at 10^11 docs, silently merging distinct texts
    return (ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
            .groupby(["h", "h2"])
            .aggregate(Min("doc_id", alias_name="doc_id")))


def exact_dedup(sf_dir: str, out_path: str | None = None):
    """Keep the smallest doc_id per distinct text (the §2.8 pattern).

    ``out_path``: write the survivor ids as partitioned Parquet straight
    from the grouped stream — the 100-TB sink; NOTHING reaches the driver.
    Without it, returns the survivors sorted — the survivor list is the
    query RESULT (inherently O(N_distinct) output), which is the only
    collect in the exact-dedup family; the curation pipeline
    (``pipelines/curate.py``) gates inside the same shuffle instead and
    never takes this path.  Process-cached per input FINGERPRINT (content,
    not path — regenerating the parquet in place invalidates) since the
    count query re-asks."""
    surv = _exact_survivor_ds(sf_dir)
    if out_path is not None:
        surv.map_batches(lambda t: t.select(["doc_id"]),
                         batch_format="pyarrow",
                         batch_size=65536).write_parquet(out_path)
        return None
    ck = input_fingerprint([os.path.join(sf_dir, "documents.parquet")])
    if ck in _EXACT_CACHE:
        return _EXACT_CACHE[ck]
    out = surv.to_pandas()
    if "doc_id" not in out.columns:  # empty documents table: Ray's
        #  empty groupby stream loses column names
        import pandas as pd
        out = pd.DataFrame({"doc_id": np.array([], np.int64)})
    out = out[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    _EXACT_CACHE[ck] = pa.Table.from_pandas(out, preserve_index=False)
    return _EXACT_CACHE[ck]


def exact_dedup_count(sf_dir: str) -> pa.Table:
    n = exact_dedup(sf_dir).num_rows
    return pa.table({"n_distinct": pa.array([n], type=pa.int64())})


# ------------------------------ minhash LSH --------------------------------

MINHASH_PERMS = 128
LSH_BANDS = 32          # 32 bands × 4 rows
_ROWS_PER_BAND = MINHASH_PERMS // LSH_BANDS
_MERSENNE = (1 << 61) - 1
_rng = np.random.default_rng(12345)
_A = _rng.integers(1, _MERSENNE, MINHASH_PERMS, dtype=np.uint64)
_B = _rng.integers(0, _MERSENNE, MINHASH_PERMS, dtype=np.uint64)

# fixed odd mixing constants per (band, row): vectorized band-bucket hash
# (band index folded into the constants, so the bucket key alone identifies
# (band, contents) — no per-doc Python hashing loop)
_BAND_MIX = (np.arange(LSH_BANDS * _ROWS_PER_BAND, dtype=np.uint64)
             .reshape(LSH_BANDS, _ROWS_PER_BAND)
             * np.uint64(0x9E3779B97F4A7C15) | np.uint64(1))


def _band_keys(sigs: np.ndarray) -> np.ndarray:
    """(n, MINHASH_PERMS) signatures → (n, LSH_BANDS) int64 bucket keys."""
    with np.errstate(over="ignore"):
        m = sigs.reshape(len(sigs), LSH_BANDS, _ROWS_PER_BAND)
        h = (m * _BAND_MIX[None, :, :]).sum(axis=2, dtype=np.uint64)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return h.view(np.int64)


def _doc_shingle_hashes(texts, n: int = 3):
    """Per-doc distinct-shingle hashes, doc-contiguous: (flat uint64,
    counts, real_counts).  Fully vectorized via
    :func:`_make_shingle_rows`; zero-token docs carry one sentinel hash
    for array alignment — ``real_counts`` (0 for them) lets callers
    exclude them from banding/pairing (they must never near-dup-match
    each other, matching the SQL oracles where token-less docs have no
    shingle rows at all)."""
    texts = list(texts)
    nd = len(texts)
    b = pa.table({"doc_id": pa.array(np.arange(nd, dtype=np.int64)),
                  "text": pa.array(texts, pa.string())})
    rows = _make_shingle_rows(n)(b)
    doc = rows["doc_id"].to_numpy()
    h = md5_64_bulk(np.asarray(rows["shingle"].to_pandas(), dtype=object))
    cnt0 = np.bincount(doc, minlength=nd).astype(np.int64)
    cnt = np.maximum(cnt0, 1)
    starts = np.r_[np.int64(0), np.cumsum(cnt)[:-1]]
    sentinel = md5_64(np.array(["\x00empty"], dtype=object))[0]
    flat = np.full(int(cnt.sum()), sentinel, np.uint64)
    within = np.arange(len(doc)) - np.r_[np.int64(0), np.cumsum(cnt0)[:-1]][doc]
    flat[starts[doc] + within] = h
    return flat, cnt, cnt0


#: shingle-row chunk so (chunk × 128 perms) fits comfortably in RAM;
#: module-level so the chunk-boundary pytest can shrink it
_MINHASH_CHUNK = 200_000

#: per-process reusable permutation buffer (Fortran order).  Two measured
#: effects: (1) reusing one buffer across batches avoids re-paying the
#: first-touch page faults of a fresh ~50 MB allocation per batch (1.39 s
#: → 0.05 s per 1024-doc batch); (2) column-major layout makes the
#: per-doc ``minimum.reduceat`` along axis 0 walk contiguous memory
#: (0.08 s → 0.01 s).  Bounded by _MINHASH_CHUNK × 128 × 8 B.
_PERM_BUF: dict = {}


def _perm_buffer(n: int) -> np.ndarray:
    buf = _PERM_BUF.get("buf")
    if buf is None or buf.shape[0] < n:
        buf = np.empty((n, MINHASH_PERMS), np.uint64, order="F")
        _PERM_BUF["buf"] = buf
    return buf[:n]


def _minhash_bands_batch(b: pa.Table) -> pa.Table:
    """doc → LSH_BANDS rows (band_key, doc_id).

    Vectorized: distinct shingles hashed once (md5 bulk), permutations in
    one chunked pass, per-doc minima via ``np.minimum.reduceat`` over
    document boundaries, band keys via the fixed numpy mix.  Zero-token
    docs get NO bands (they have no shingles to be similar by — the SQL
    oracle likewise gives them no pairs)."""
    docs = b["doc_id"].to_numpy()
    flat, counts, real = _doc_shingle_hashes(b["text"].to_pandas())
    nonempty = real > 0
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((len(counts), MINHASH_PERMS), np.uint64)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    for lo in range(0, len(flat), _MINHASH_CHUNK):
        seg = flat[lo:lo + _MINHASH_CHUNK]
        hv = _perm_buffer(len(seg))
        with np.errstate(over="ignore"):
            np.multiply(seg[:, None], _A[None, :], out=hv)
            hv += _B[None, :]
            np.mod(hv, np.uint64(_MERSENNE), out=hv)
        seg_docs = doc_of[lo:lo + _MINHASH_CHUNK]
        boundaries = np.flatnonzero(np.diff(seg_docs)) + 1
        red_starts = np.concatenate(([0], boundaries))
        mins = np.minimum.reduceat(hv, red_starts, axis=0)
        touched = seg_docs[red_starts]
        first_chunk = lo <= starts[touched]
        sigs[touched[first_chunk]] = mins[first_chunk]
        if (~first_chunk).any():
            # fancy-index ASSIGNMENT (not out=sigs[t2], which writes
            # into a temporary copy and is discarded) — a doc straddling
            # the chunk boundary must fold its later chunks' minima in
            t2 = touched[~first_chunk]
            sigs[t2] = np.minimum(sigs[t2], mins[~first_chunk])
    keys = _band_keys(sigs[nonempty])
    return pa.table({
        "band_key": pa.array(keys.reshape(-1)),
        "doc_id": pa.array(np.repeat(docs[nonempty].astype(np.int64),
                                     LSH_BANDS))})


def minhash_candidates(sf_dir: str) -> list[tuple[int, int]]:
    """Candidate pairs = docs sharing an LSH band bucket.

    Banding is distributed; bucket counts are a distributed groupby; only
    rows in colliding buckets (count > 1) come back to the driver, where
    pair expansion is one vectorized pass (see :func:`_colliding_rows`)."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(_minhash_bands_batch, batch_format="pyarrow",
                           batch_size=1024)
    coll = _colliding_rows(bands, "band_key")
    return sorted(_expand_pairs(coll, "band_key"))


#: (input fingerprint, threshold) → (keys, roots) label arrays; the
#: near-dup curation re-asks for the labels minhash_dedup just computed
_LABELS_CACHE: dict = {}


def _minhash_labels(sf_dir: str,
                    threshold: float = 0.8) -> tuple[np.ndarray, np.ndarray]:
    """Verified near-dup cluster labels as parallel sorted arrays
    (keys, roots) — only docs in a verified pair appear, so the broadcast
    is duplication-bounded.  Shared by :func:`minhash_dedup` and the
    near-dup curation pipeline: LSH candidates (distributed banding +
    bucket groupby) → exact-Jaccard verification over shingle-hash sets
    gathered by a DISTRIBUTED candidate-id semi-join (never the full
    corpus) → union-find over verified pairs (driver; graph is
    duplication-bounded).  Memoized per (input fingerprint, threshold)."""
    ck = (input_fingerprint([os.path.join(sf_dir, "documents.parquet")]),
          float(threshold))
    if ck in _LABELS_CACHE:
        return _LABELS_CACHE[ck]
    cands = minhash_candidates(sf_dir)
    if not cands:  # no LSH collisions anywhere: every doc is its own
        #            cluster — skip the gather pass (whose all-empty
        #            result would lose its column names via to_pandas)
        lk = lv = np.array([], np.int64)
        _LABELS_CACHE[ck] = (lk, lv)
        return lk, lv
    cand_ids = np.array(sorted({d for p in cands for d in p}), np.int64)
    cand_ref = ray.put(cand_ids)

    def candidate_shingles(b: pa.Table) -> pa.Table:
        """Semi-join gather: shingle hashes for candidate docs only."""
        ids = ray.get(cand_ref)
        doc = b["doc_id"].to_numpy()
        hit = np.isin(doc, ids)
        if not hit.any():
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sh": pa.array([], pa.uint64())})
        sub = b.filter(pa.array(hit))
        flat, counts, _real = _doc_shingle_hashes(sub["text"].to_pandas())
        return pa.table({
            "doc_id": pa.array(np.repeat(sub["doc_id"].to_numpy(), counts)),
            "sh": pa.array(flat)})

    sh_rows = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        candidate_shingles, batch_format="pyarrow",
        batch_size=1024).to_pandas()  # bounded: candidates only
    toks: dict[int, set] = {
        int(d): set(g["sh"].to_numpy().tolist())
        for d, g in sh_rows.groupby("doc_id", sort=False)}

    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in cands:
        sa, sb = toks.get(a), toks.get(b)
        if sa is None or sb is None:
            continue
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    # labels as parallel sorted arrays: assignment is one searchsorted
    # substitution per batch (duplication-bounded broadcast, no row loop)
    lk = np.array(sorted(parent), np.int64)
    lv = np.array([find(int(k)) for k in lk], np.int64)
    _LABELS_CACHE[ck] = (lk, lv)
    return lk, lv


def label_roots(ids: np.ndarray, lk: np.ndarray,
                lv: np.ndarray) -> np.ndarray:
    """Cluster root per id via the shared sorted-membership idiom
    (:func:`miru_ray.util.sorted_lookup`); ids absent from the labels
    are their own root.  The ONE definition shared by cluster
    assignment and the near-dup curation gate."""
    hit, pos = sorted_lookup(lk, ids)
    return np.where(hit, lv[pos], ids)


def minhash_dedup(sf_dir: str, threshold: float = 0.8,
                  out_path: str | None = None):
    """MinHash-LSH near-dup clusters (see :func:`_minhash_labels` for the
    candidate → verify → union-find pipeline).  Cluster labels broadcast
    back and mapped over the corpus as a streaming ``map_batches``.
    Returns a ``ray.data.Dataset`` of (doc_id, cluster_id); pass
    ``out_path`` to ``write_parquet`` instead of returning rows (the
    100-TB shape)."""
    lk, lv = _minhash_labels(sf_dir, threshold)
    lab_ref = ray.put((lk, lv))

    def assign(b: pa.Table) -> pa.Table:
        lk, lv = broadcast_get(lab_ref)  # once per worker, not per batch
        doc = b["doc_id"].to_numpy().astype(np.int64)
        cl = label_roots(doc, lk, lv)
        return pa.table({"doc_id": pa.array(doc), "cluster_id": pa.array(cl)})

    out = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        assign, batch_format="pyarrow", batch_size=8192)
    if out_path is not None:
        out.write_parquet(out_path)
        return None
    # deterministic row order: the conformance gate may hash rows in the
    # order a Dataset materializes them
    return out.sort("doc_id")


def incremental_dedup_counts(sf_dir: str) -> pa.Table:
    """Incremental exact dedup: a DELTA batch deduped against an existing
    CORPUS without re-emitting corpus survivors — the production shape for
    appending a new crawl shard to a 100-TB deduped store.  Corpus = the
    original documents (doc_id < n); delta = the planted copies the dup
    derivation appends (doc_id ≥ n).

    One distributed ``groupby(hash)`` over the union, with per-batch
    partials carrying (min corpus doc | sentinel, n_delta) per hash — at
    scale the existing store is already hash-partitioned parquet, so this
    shuffle is a co-partitioned join, and the corpus side ships one row
    per distinct hash, not its text.  Output: (n_delta, n_new_kept,
    n_dup_vs_corpus, n_dup_within_delta) where kept = first delta doc of
    a hash the corpus has never seen."""
    import pyarrow.parquet as pq
    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    _SENTINEL = np.int64(1) << np.int64(62)

    def partial(b: pa.Table) -> pa.Table:
        lo, hi = md5_128(b["text"].to_pandas())
        did = b["doc_id"].to_numpy().astype(np.int64)
        is_delta = did >= n
        t = pa.table({
            "h": pa.array(lo.view(np.int64)),
            "h2": pa.array(hi.view(np.int64)),
            "c_min": pa.array(np.where(is_delta, _SENTINEL, did)),
            "nd": pa.array(is_delta.astype(np.int64))})
        g = t.group_by(["h", "h2"]).aggregate([("c_min", "min"),
                                               ("nd", "sum")])
        return pa.table({"h": g["h"], "h2": g["h2"],
                         "c_min": g["c_min_min"], "nd": g["nd_sum"]})

    grouped = (_documents(sf_dir, ["doc_id", "text"])
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=8192)
               .groupby(["h", "h2"]).aggregate(
                   Min("c_min", alias_name="c_min"),
                   Sum("nd", alias_name="nd")))

    def gate(t: pa.Table) -> pa.Table:
        c_min = t["c_min"].to_numpy().astype(np.int64)
        nd = t["nd"].to_numpy().astype(np.int64)
        in_corpus = c_min < _SENTINEL
        new = ~in_corpus & (nd > 0)
        return pa.table({
            "n_delta": pa.array([int(nd.sum())]),
            "n_new_kept": pa.array([int(new.sum())]),
            "n_dup_vs_corpus": pa.array([int(nd[in_corpus].sum())]),
            "n_dup_within_delta": pa.array([int((nd[new] - 1).sum())])})

    agg = grouped.map_batches(gate, batch_format="pyarrow",
                              batch_size=8192).aggregate(
        Sum("n_delta", alias_name="n_delta"),
        Sum("n_new_kept", alias_name="n_new_kept"),
        Sum("n_dup_vs_corpus", alias_name="n_dup_vs_corpus"),
        Sum("n_dup_within_delta", alias_name="n_dup_within_delta"))
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("n_delta", "n_new_kept", "n_dup_vs_corpus",
                               "n_dup_within_delta")})


# ------------------------------ simhash ------------------------------------


def _simhash_batch(b: pa.Table) -> pa.Table:
    """Batch-vectorized 64-bit simhash over md5_64 token hashes (duplicate
    tokens kept — identical to the SQL oracle's unnest), emitted as 4
    16-bit band rows per doc.  Zero-token docs are excluded (they have no
    signature, matching the oracle)."""
    docs_all = b["doc_id"].to_numpy()
    # one vectorized tokenize pass (identical token stream to the former
    # per-row py_tokenize loop — same Arrow kernels, duplicates kept)
    terms, _rows, dl = explode_tokens(b["text"])
    nonempty = dl > 0
    docs = docs_all[nonempty]
    if not len(docs):
        return pa.table({"band_key": pa.array([], pa.int64()),
                         "doc_id": pa.array([], pa.int64()),
                         "sig": pa.array([], pa.int64())})
    counts = dl[nonempty].astype(np.int64)
    flat = md5_64_bulk(np.asarray(terms.to_pandas(), dtype=object))
    bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)).astype(np.int32) * 2 - 1
    starts = np.zeros(len(counts), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    acc = np.add.reduceat(bits, starts, axis=0)
    sig_bits = (acc > 0).astype(np.uint64)
    sigs = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
        axis=1, dtype=np.uint64)
    n = len(docs)
    band_ids = np.tile(np.arange(4, dtype=np.int64), n)
    shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))
    band_vals = ((sigs[:, None] >> shifts[None, :])
                 & np.uint64(0xFFFF)).astype(np.int64).reshape(-1)
    return pa.table({
        "band_key": pa.array(band_vals | (band_ids << 16)),
        "doc_id": pa.array(np.repeat(docs.astype(np.int64), 4)),
        "sig": pa.array(np.repeat(sigs.view(np.int64), 4))})


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash: 4-band blocking then exact Hamming verify.

    With 4 bands of 16 bits, any pair within Hamming ≤ 3 shares ≥ 1 exact
    band (pigeonhole), so blocking is EXACT — the result equals the full
    all-pairs Hamming ≤ 3 set, which is what the SQL oracle computes
    directly from md5-reproduced signatures.  Collision detection is the
    distributed bucket-count path (:func:`_colliding_rows`)."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    bands = ds.map_batches(_simhash_batch, batch_format="pyarrow",
                           batch_size=1024)
    coll = _colliding_rows(bands, "band_key")
    if not len(coll):
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    popcnt8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)

    def _hamming(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        z = (x ^ y).view(np.uint8).reshape(len(x), 8)
        return popcnt8[z].sum(axis=1)

    # size-grouped vectorized expansion (the _expand_pairs pattern, with
    # the signature column riding along): buckets of equal size expand as
    # one reshape + triu + XOR-popcount pass — no per-bucket Python loop
    df = coll[["band_key", "doc_id", "sig"]].drop_duplicates(
        ["band_key", "doc_id"]).sort_values(["band_key", "doc_id"],
                                            kind="mergesort")
    keys = df["band_key"].to_numpy()
    docs = df["doc_id"].to_numpy().astype(np.int64)
    sigs = df["sig"].to_numpy().astype(np.int64).view(np.uint64)
    starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
    sizes = np.diff(np.r_[starts, len(keys)])
    packed = []
    shift = np.uint64(32)  # unsigned: ids in [2^31, 2^32) must not wrap
    for s in np.unique(sizes):
        if s < 2:
            continue
        gsel = starts[sizes == s]
        idx = gsel[:, None] + np.arange(s)[None, :]
        M, Sg = docs[idx].astype(np.uint64), sigs[idx]
        i, j = np.triu_indices(int(s), k=1)
        keep = _hamming(Sg[:, i].ravel(), Sg[:, j].ravel()) <= max_hamming
        a, bb = M[:, i].ravel()[keep], M[:, j].ravel()[keep]
        packed.append((a << shift) | bb)
    if not packed:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    uniq = np.unique(np.concatenate(packed))
    return pa.table({"a": pa.array((uniq >> shift).astype(np.int64)),
                     "b": pa.array((uniq & np.uint64(0xFFFFFFFF))
                                   .astype(np.int64))})


# ------------------------------ ngram jaccard ------------------------------


def _make_shingle_rows(n: int = 3):
    """Batch fn: distinct (doc_id, shingle) rows, fully vectorized —
    tokens via explode_tokens, shingles by shifted elementwise joins,
    per-doc dedupe via lexsort + shift-compare.  Semantics identical to
    :func:`_shingles` per doc (including the short-doc whole-text
    shingle)."""

    def shingle_rows(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy().astype(np.int64)
        terms, rows, dl = explode_tokens(b["text"])
        t_np = np.asarray(terms.to_pandas(), dtype=object)
        parts_docs, parts_sh = [], []
        if n == 1:  # unigram shingles: every token is its own shingle
            parts_docs.append(ids[rows])
            parts_sh.append(t_np)
        elif len(t_np) >= n:
            same = rows[: -(n - 1)] == rows[n - 1:]
            grams = t_np[: -(n - 1)][same]
            for k in range(1, n):
                tail = t_np[k: len(t_np) - (n - 1) + k]
                grams = grams + " " + tail[same]
            parts_docs.append(ids[rows[: -(n - 1)][same]])
            parts_sh.append(grams)
        short = (dl > 0) & (dl < n)  # whole text as the single shingle
        if short.any():
            tok_sel = short[rows]  # only the short docs' tokens join
            joined = pd.Series(t_np[tok_sel]).groupby(
                rows[tok_sel]).agg(" ".join)
            parts_docs.append(ids[joined.index.to_numpy()])
            parts_sh.append(joined.to_numpy(dtype=object))
        if not parts_docs:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "shingle": pa.array([], pa.string())})
        docs = np.concatenate(parts_docs)
        shs = np.concatenate(parts_sh)
        # per-doc distinct (a set in the reference implementation)
        order = np.lexsort((shs, docs))
        docs, shs = docs[order], shs[order]
        keep = np.ones(len(docs), bool)
        keep[1:] = (docs[1:] != docs[:-1]) | (shs[1:] != shs[:-1])
        return pa.table({"doc_id": pa.array(docs[keep]),
                         "shingle": pa.array(shs[keep], pa.string())})

    return shingle_rows


SPAN_WINDOW = 15  # tokens per window for duplicated-span detection


def substring_spans(sf_dir: str, window: int = SPAN_WINDOW) -> pa.Table:
    """Duplicated-substring-span profile: for every doc that shares at
    least one ``window``-token run with another doc, report
    ``(doc_id, n_windows, n_dup_windows)`` — its distinct window count and
    how many of those windows occur in ≥2 docs corpus-wide.

    This is the exact-substring duplication signal (public precedent:
    Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — token-window granularity instead of suffix arrays, which
    don't distribute).  Pipeline shape, all duplication-bounded:

    1. distinct (doc, window-hash) rows via the vectorized shingle maker
       (same short-doc whole-text rule, ``window``-gram strings → md5_64);
    2. duplicated windows via :func:`_colliding_rows` (partial counts →
       count>1 key set — driver-merge below 2e7 rows, distributed groupby
       above);
    3. per-doc dup counts from the colliding rows (duplication-bounded);
       total window counts ONLY for those docs (broadcast doc-id semi-join
       + per-batch partials — never a full per-doc groupby).
    """
    rows = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _make_shingle_rows(window), batch_format="pyarrow",
        batch_size=4096).map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "whash": pa.array(md5_64_bulk(np.asarray(
                t["shingle"].to_pandas(), dtype=object)))}),
        batch_format="pyarrow", batch_size=65536)

    # materialize HERE (not just inside _colliding_rows, whose rebinding is
    # local) so the window-count consumer below doesn't re-tokenize
    rows = rows.materialize()
    # the returned frame holds ONLY (doc, window) rows whose window occurs
    # >= 2 times — duplication mass
    coll = _colliding_rows(rows, "whash")
    if not len(coll):
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_windows": pa.array([], pa.int64()),
                         "n_dup_windows": pa.array([], pa.int64())})
    per_dup = coll.groupby("doc_id").size()
    dup_docs = np.sort(per_dup.index.to_numpy().astype(np.int64))
    doc_ref = ray.put(dup_docs)

    def count_windows(t: pa.Table) -> pa.Table:
        ks = ray.get(doc_ref)
        hit, _ = sorted_lookup(ks, t["doc_id"].to_numpy().astype(np.int64))
        kept = t.filter(pa.array(hit))
        g = kept.group_by("doc_id").aggregate([("whash", "count")])
        return pa.table({"doc_id": g["doc_id"], "nw": g["whash_count"]})

    nw = (rows.map_batches(count_windows, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
          .groupby("doc_id")["nw"].sum())
    out = pd.DataFrame({
        "doc_id": dup_docs,
        "n_windows": nw.reindex(dup_docs).to_numpy().astype(np.int64),
        "n_dup_windows": per_dup.reindex(dup_docs).to_numpy()
                                .astype(np.int64)})
    return pa.Table.from_pandas(out, preserve_index=False)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        n: int = 3) -> pa.Table:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    Shingle extraction is distributed (map_batches); pairwise intersections
    come from a sparse shingle-inverted index — per shingle, every doc pair
    sharing it is expanded (grouped-reshape, no Python loop) and counted.
    Work is Σ_s df_s·(df_s−1)/2, the true collision mass (~2.7e6 at sf0.1
    vs the 1.4e12-flop dense doc×shingle matmul it replaces — 250,000×
    less).  That mass is duplication-bounded, so this stays the exact
    verifier; at real corpus scale run :func:`minhash_dedup` (LSH
    candidates + verify) instead — the guard below enforces that, and a
    skew-heavy shingle df would first hit it.
    """
    ds = _documents(sf_dir, ["doc_id", "text"])
    shingle_rows = _make_shingle_rows(n)
    rows_ds = ds.map_batches(shingle_rows, batch_format="pyarrow",
                             batch_size=4096).materialize()

    # guard BEFORE collecting: per-shingle df from distributed partials
    # (vocab-bounded driver merge), collision mass in PYTHON ints — an
    # np.int64 product can wrap past 2^63 at exactly the skew scales the
    # guard exists to reject
    def df_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(np.asarray(t["shingle"].to_pandas(),
                                    dtype=object), return_counts=True)
        return pa.table({"shingle": pa.array(u, pa.string()),
                         "c": pa.array(c.astype(np.int64))})

    dfp = rows_ds.map_batches(df_partial, batch_format="pyarrow",
                              batch_size=65536).to_pandas()
    if dfp.empty:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    dfc = dfp.groupby("shingle", sort=False)["c"].sum().to_numpy()
    pair_mass = sum(int(s) * (int(s) - 1) // 2 for s in dfc)
    if pair_mass > 2e9:
        raise ValueError("exact Jaccard collision mass too large; "
                         "use minhash_dedup (LSH candidates + verify)")

    rows = rows_ds.to_pandas()
    codes, _uniq = pd.factorize(rows["shingle"], sort=False)
    doc_idn = rows["doc_id"].to_numpy()
    doc_ids, doc_idx = np.unique(doc_idn, return_inverse=True)
    D = len(doc_ids)
    sizes = np.bincount(doc_idx, minlength=D).astype(np.int64)
    order = np.argsort(codes, kind="stable")
    keys, docs = codes[order], doc_idx[order].astype(np.int64)
    gstarts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]]) \
        if len(keys) else np.array([], np.int64)
    gsizes = np.diff(np.r_[gstarts, len(keys)]).astype(np.int64)
    packed = []
    for s in np.unique(gsizes):
        if s < 2:
            continue
        gsel = gstarts[gsizes == s]
        M = np.sort(docs[gsel[:, None] + np.arange(s)[None, :]], axis=1)
        i, j = np.triu_indices(int(s), k=1)
        packed.append(M[:, i].ravel() * D + M[:, j].ravel())
    if packed:
        uniq, inter = np.unique(np.concatenate(packed), return_counts=True)
    else:
        uniq, inter = np.array([], np.int64), np.array([], np.int64)
    ai, bi = uniq // D, uniq % D
    union = sizes[ai] + sizes[bi] - inter
    # float64 division of exact integer counts — bit-identical to the SQL
    # oracle's len()/len() division
    jac = inter / union
    keep = jac >= threshold
    a, b = doc_ids[ai[keep]], doc_ids[bi[keep]]
    j = np.round(jac[keep].astype(np.float64), 6)
    order = np.lexsort((b, a))
    return pa.table({"a": pa.array(a[order], pa.int64()),
                     "b": pa.array(b[order], pa.int64()),
                     "jaccard": pa.array(j[order], pa.float64())})


# ------------------------------ embedding near-dup -------------------------


_emb_block_plan = rowgroup_block_plan  # shared metadata-only block packer


def _read_emb_block(path: str, row_groups: list[int]):
    import pyarrow.parquet as pq
    t = pq.ParquetFile(path).read_row_groups(
        row_groups, columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy().astype(np.int64)
    M = t["embedding"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False).reshape(len(ids), -1).astype(np.float64)
    # float64 like similarity._matrix AND the SQL oracle's DOUBLE —
    # float32 cosines can flip threshold-borderline pairs
    return ids, M / np.linalg.norm(M, axis=1, keepdims=True)


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """EXACT cosine ≥ threshold pairs: distributed blocked all-pairs.

    Each task reads TWO row-group blocks straight from Parquet (pruned
    columns; the driver ships only row-group indices, never vectors) and
    emits its block-pair's matches — no full-matrix driver read, no
    O(corpus) broadcast.  Total work is inherently O(n²·d/blocks²·...)
    compute with O(n·√tasks) IO; the op exists for thresholds where the
    exact pair set IS the contract.

    Why not the LSH index here (measured on this corpus, see
    :func:`embedding_neardup_lsh`): at τ = 0.4 a random pair collides
    within Hamming ≤ 3 of an 8-bit code in some of 4 tables with
    p ≈ 0.84, i.e. LSH prunes almost nothing, while full recall needs
    ring radius 4 (reads 64 % of every table ≈ 2.5× corpus).  Low-τ
    near-dup is a range scan; LSH pays off at production thresholds
    (τ ≈ 0.9 → ring 1, 3.5 % of buckets/table).  The LSH-served variant
    with its measured-recall contract is the scale path for those.

    Results are memoized per (input fingerprint, threshold) — the recall
    report re-asks for the same ground truth the pairs query just
    computed; the fingerprint (size+mtime) invalidates on rewrite."""
    path = os.path.join(sf_dir, "embeddings.parquet")
    ck = (input_fingerprint([path]), float(threshold))
    if ck in _EXACT_PAIRS_CACHE:
        return _EXACT_PAIRS_CACHE[ck]
    blocks = _emb_block_plan(path)

    @ray.remote(num_cpus=1)
    def block_pair(gi: list[int], gj: list[int], diagonal: bool):
        ia, A = _read_emb_block(path, gi)
        if diagonal:
            ib, B = ia, A
        else:
            ib, B = _read_emb_block(path, gj)
        sims = A @ B.T
        ai, bi = np.nonzero(sims >= threshold)
        a, b = ia[ai], ib[bi]
        if diagonal:
            keep = a < b
            return a[keep], b[keep]
        # off-diagonal: each unordered pair is seen by exactly ONE task
        # (i < j block pairs), so canonicalize instead of filtering —
        # `a < b` would silently drop pairs whenever vec_id order does
        # not follow parquet row-group order
        keep = a != b
        a, b = a[keep], b[keep]
        return np.minimum(a, b), np.maximum(a, b)

    futs = []
    for i in range(len(blocks)):
        for j in range(i, len(blocks)):
            futs.append(block_pair.remote(blocks[i], blocks[j], i == j))
    parts = ray.get(futs)
    if parts:
        a = np.concatenate([p[0] for p in parts])
        b = np.concatenate([p[1] for p in parts])
    else:
        a = b = np.empty(0, np.int64)
    order = np.lexsort((b, a))
    out = pa.table({"a": pa.array(a[order], pa.int64()),
                    "b": pa.array(b[order], pa.int64())})
    _EXACT_PAIRS_CACHE[ck] = out
    return out


#: (input fingerprint, threshold) → exact pair table (tiny; ground truth
#: shared between the pairs query and the recall report in one process)
_EXACT_PAIRS_CACHE: dict = {}


def embedding_neardup_lsh(sf_dir: str, threshold: float = 0.4,
                          max_hamming: int = 3):
    """Near-dup pairs SERVED FROM the bucket-partitioned ANN index
    (similarity.build_ann_index): per-batch ring probe + exact-cosine
    verify on candidates only.  Each worker caches bucket matrices as it
    probes, so a bucket's files are read at most once per actor.

    Returns ``(pairs_table, io_stats)``.  Approximate by construction —
    recall is MEASURED, not assumed (see
    :func:`embedding_neardup_lsh_report`): with 4 tables × 8 planes and
    ring ≤ 3, every τ ≥ 0.4 pair is recovered on all three fixtures
    (sf0.1: 920/920, recall 1.0).  At production thresholds the ring
    shrinks (τ ≈ 0.9 → ring 1 reads 3.5 % of buckets/table) and this is
    the 100-TB path; at τ = 0.4 it reads most of the index (the docstring
    of :func:`embedding_neardup_pairs` has the measured futility bound).
    """
    from .similarity import (_N_PLANES, _N_TABLES, _codes, _planes,
                             _ring, build_ann_index)
    from ..util import read_json
    idx = build_ann_index(sf_dir)
    catalog = {int(c): rels
               for c, rels in read_json(
                   os.path.join(idx, "_DONE.json"))["buckets"].items()}
    cat_ref = ray.put(catalog)

    class RingProber:
        """Bucket-cache probe actor: planes + catalog loaded once.

        When the Hamming ring covers ≥ 25 % of the bucket space (the low-τ
        "LSH prunes nothing" regime measured in
        :func:`embedding_neardup_pairs`'s docstring), per-bucket file
        reads degenerate into ~every file opened individually — so the
        actor PRELOADS the whole index in ONE hive-partitioned dataset
        read instead (a sequential scan, the honest shape of a low-τ range
        query).  High-τ probes keep the lazy per-bucket reads that make
        IO scale with ring mass."""

        def __init__(self):
            self.catalog = ray.get(cat_ref)
            self.planes = None
            self.cache: dict[int, tuple] = {}
            if len(_ring(0, max_hamming)) / (1 << _N_PLANES) >= 0.25:
                self._preload_all()

        def _preload_all(self):
            import pyarrow.dataset as pads
            t = (pads.dataset(idx, format="parquet", partitioning="hive")
                 .to_table(columns=["tcode", "vec_id", "embedding"]))
            tc = t["tcode"].to_numpy().astype(np.int64)
            order = np.argsort(tc, kind="stable")
            tc = tc[order]
            ids = t["vec_id"].to_numpy().astype(np.int64)[order]
            col = t["embedding"].combine_chunks()
            M = col.flatten().to_numpy(zero_copy_only=False).reshape(
                len(ids), -1)[order].astype(np.float64)
            M = M / np.linalg.norm(M, axis=1, keepdims=True)
            starts = np.flatnonzero(np.r_[True, tc[1:] != tc[:-1]])
            ends = np.r_[starts[1:], len(tc)]
            for s, e in zip(starts, ends):
                self.cache[int(tc[s])] = (ids[s:e], M[s:e])
            for c in self.catalog:           # buckets absent from the read
                self.cache.setdefault(int(c), (np.empty(0, np.int64),
                                               np.empty((0, 1))))

        def _bucket(self, tc: int):
            if tc not in self.cache:
                rels = self.catalog.get(tc, ())
                if not rels:
                    self.cache[tc] = (np.empty(0, np.int64),
                                      np.empty((0, 1)))
                else:
                    import pyarrow.parquet as pq
                    ts = [pq.read_table(os.path.join(idx, r),
                                        columns=["vec_id", "embedding"])
                          for r in rels]
                    t = pa.concat_tables(ts)
                    ids = t["vec_id"].to_numpy().astype(np.int64)
                    M = t["embedding"].combine_chunks().flatten().to_numpy(
                        zero_copy_only=False).reshape(len(ids), -1).astype(np.float64)
                    self.cache[tc] = (
                        ids, M / np.linalg.norm(M, axis=1, keepdims=True))
            return self.cache[tc]

        def __call__(self, b: pa.Table) -> pa.Table:
            ids = b["vec_id"].to_numpy().astype(np.int64)
            col = b["embedding"]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            Q = col.flatten().to_numpy(zero_copy_only=False).reshape(
                len(ids), -1).astype(np.float64)
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            if self.planes is None:
                self.planes = _planes(Qn.shape[1])
                # ring = fixed XOR mask set; enumerate once per actor
                self.ring_xor = np.array(_ring(0, max_hamming), np.int64)
            codes = _codes(Qn, self.planes)  # (n, tables)
            # vectorized ring expansion: (n, tables, ring) tcodes in one
            # broadcast XOR — the per-query Python loop here measured as
            # the probe's dominant cost at high ring fractions
            tabs = np.arange(_N_TABLES, dtype=np.int64)[None, :, None]
            ring_codes = (codes.astype(np.int64)[:, :, None]
                          ^ self.ring_xor[None, None, :])
            ring_tcodes = np.unique((tabs << _N_PLANES) | ring_codes)
            cids, cms = [], []
            for tc in ring_tcodes:
                ci, cm = self._bucket(tc)
                if len(ci):
                    cids.append(ci)
                    cms.append(cm)
            if not cids:
                return pa.table({"a": pa.array([], pa.int64()),
                                 "b": pa.array([], pa.int64())})
            cand_ids = np.concatenate(cids)
            # a vector appears once per table (and per touched bucket):
            # verify each candidate once
            cand_ids, first = np.unique(cand_ids, return_index=True)
            C = np.concatenate(cms, axis=0)[first]
            sims = Qn @ C.T
            qi, cj = np.nonzero(sims >= threshold)
            a, bb = ids[qi], cand_ids[cj]
            keep = a < bb
            return pa.table({"a": pa.array(a[keep]),
                             "b": pa.array(bb[keep])})

    pairs = read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).map_batches(
        RingProber, batch_format="pyarrow", batch_size=1024,
        concurrency=(1, 4))
    out = pairs.to_pandas()
    if "a" not in out.columns:  # no pair met the threshold anywhere —
        #  Ray's all-empty block stream loses column names (same guard
        #  as ann_lsh_query)
        import pandas as pd
        out = pd.DataFrame({"a": np.array([], np.int64),
                            "b": np.array([], np.int64)})
    out = out.drop_duplicates(["a", "b"]).sort_values(
        ["a", "b"]).reset_index(drop=True)
    # io accounting from the build catalog: ring mass vs the full index
    n_ring = len(_ring(0, max_hamming))
    io_stats = {
        "buckets_total": 2 ** _N_PLANES * _N_TABLES,
        "ring_buckets_per_query": n_ring * _N_TABLES,
        "ring_fraction": n_ring / 2 ** _N_PLANES,
    }
    return pa.Table.from_pandas(out, preserve_index=False), io_stats


def embedding_neardup_lsh_report(sf_dir: str, threshold: float = 0.4,
                                 max_hamming: int = 3) -> pa.Table:
    """Measured-recall contract for the index-served near-dup path:
    LSH-probed pairs vs the exact blocked all-pairs answer."""
    exact = embedding_neardup_pairs(sf_dir, threshold)
    approx, io = embedding_neardup_lsh(sf_dir, threshold, max_hamming)
    et = set(zip(exact["a"].to_pylist(), exact["b"].to_pylist()))
    at = set(zip(approx["a"].to_pylist(), approx["b"].to_pylist()))
    return pa.table({
        "n_exact": pa.array([len(et)], pa.int64()),
        "n_lsh": pa.array([len(at)], pa.int64()),
        "recall": pa.array([round(len(et & at) / max(1, len(et)), 6)],
                           pa.float64()),
        "ring_fraction": pa.array([round(io["ring_fraction"], 6)],
                                  pa.float64())})


# --------------------------- SQL oracles -----------------------------------

def _sql():
    from ..fixtures import DOCS_DUP_SQL
    dup = f"documents_dup AS ({DOCS_DUP_SQL})"
    # shared shingle CTE (3-token shingles, engine-identical)
    sh = """
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents_dup
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
)""".strip()
    w = SPAN_WINDOW
    # W-token window CTE: same short-doc whole-text rule as the engine's
    # _make_shingle_rows(window); windows counted DISTINCT per doc
    win = f"""
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents_dup
),
win AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < {w} THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(
                     generate_series(1, len(t)-{w - 1}),
                     i -> array_to_string(t[i:i+{w - 1}], ' ')))
         END AS ws
  FROM toks
),
rws AS (SELECT doc_id, unnest(ws) AS win FROM win)""".strip()
    return {
        "dedup_substring_spans": f"""
WITH {dup},
{win},
df AS (SELECT win FROM rws GROUP BY win HAVING count(*) >= 2),
per AS (SELECT doc_id, count(*) AS nw FROM rws GROUP BY doc_id),
dupc AS (
  SELECT r.doc_id, count(*) AS nd FROM rws r JOIN df USING (win)
  GROUP BY r.doc_id)
SELECT d.doc_id, per.nw::BIGINT AS n_windows, d.nd::BIGINT AS n_dup_windows
FROM dupc d JOIN per ON per.doc_id = d.doc_id
ORDER BY d.doc_id
""".strip(),
        "dedup_exact_docs": f"""
WITH {dup}
SELECT min(doc_id) AS doc_id FROM documents_dup GROUP BY text ORDER BY doc_id
""".strip(),
        "dedup_exact_count": f"""
WITH {dup}
SELECT count(DISTINCT text)::BIGINT AS n_distinct FROM documents_dup
""".strip(),
        # delta (planted copies, doc_id >= n) deduped against the corpus
        # (originals, doc_id < n); n = count(documents) keeps the SQL
        # scale-independent
        "dedup_incremental_counts": f"""
WITH {dup},
nn AS (SELECT count(*) AS n FROM documents),
d AS (SELECT doc_id, text, doc_id >= (SELECT n FROM nn) AS is_delta
      FROM documents_dup),
g AS (SELECT text,
             min(CASE WHEN NOT is_delta THEN doc_id END) AS c_min,
             count(*) FILTER (is_delta) AS nd
      FROM d GROUP BY text)
SELECT COALESCE(sum(nd), 0)::BIGINT AS n_delta,
       count(*) FILTER (c_min IS NULL AND nd > 0)::BIGINT AS n_new_kept,
       COALESCE(sum(nd) FILTER (c_min IS NOT NULL), 0)::BIGINT
           AS n_dup_vs_corpus,
       COALESCE(sum(nd - 1) FILTER (c_min IS NULL AND nd > 0), 0)::BIGINT
           AS n_dup_within_delta
FROM g
""".strip(),
        # TRUE shingle-Jaccard pairs, computed independently in SQL
        "dedup_ngram_jaccard_pairs": f"""
WITH {dup},
{sh},
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.s, b.s)) * 1.0 /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a, b, round_even(jac, 6) AS jaccard FROM pairs WHERE jac >= 0.5 ORDER BY a, b
""".strip(),
        # minhash-LSH clusters: the oracle computes TRUE Jaccard ≥ 0.8
        # pairs and their connected components (recursive transitive
        # closure — components are duplication-bounded).  The engine's LSH
        # candidate recall at J ≥ 0.8 is 1 - (1 - 0.8^4)^32 ≈ 1 - 5e-8 per
        # pair, so LSH + exact verify equals the true pair set.
        "dedup_minhash_clusters": f"""
WITH RECURSIVE {dup},
{sh},
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents_dup
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
)
SELECT src AS doc_id, min(dst)::BIGINT AS cluster_id
FROM reach GROUP BY src ORDER BY doc_id
""".strip(),
        # simhash pairs: md5_number_lower token hashes reproduce the
        # engine's signatures bit-for-bit; 4×16-bit banding is exact for
        # Hamming ≤ 3, so the all-pairs SQL equals the banded engine.
        "dedup_simhash_pairs": f"""
WITH {dup},
tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents_dup
),
th AS (SELECT doc_id, md5_number_lower(t) AS h FROM tok),
bits AS (
  SELECT doc_id, b.b,
         sum(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM th, (SELECT unnest(generate_series(0, 63)) AS b) b
  GROUP BY doc_id, b.b
),
sigs AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (1::UBIGINT << b) ELSE 0::UBIGINT END)::UBIGINT AS sig
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
ORDER BY a, b
""".strip(),
        # embedding near-dup: SQL-expressible with list_cosine_similarity
        "embedding_neardup_pairs": """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
ORDER BY a, b
""".strip(),
    }


SQL = _sql()
