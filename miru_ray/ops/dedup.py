"""Deduplication operators over the ``documents`` table.

Large-scale training-data dedup, Ray-Data-first (the reference's only dedup
is exact ingest dedup by timestamp keeping max version,
``MiruPartitionAccessor.handleActivities:563-578`` — the hash-partition +
per-group-first pattern here is its batch analogue; near-dup operators are
the explicit-design extensions SURVEY.md §2.8 calls for):

- exact          — content-hash → groupby(hash) → keep min doc_id
- minhash LSH    — word-shingle → minhash(128) → band buckets → groupby →
                   candidate pairs → exact-Jaccard verify → min-label
                   clusters
- simhash        — 64-bit simhash, 4-band blocking, Hamming ≤ τ pairs
- ngram Jaccard  — exact pairwise Jaccard on candidates from shared rare
                   shingles
- embedding      — cosine ≥ τ near-dup pairs over the embeddings table
                   (batch × broadcast-matrix matmul)

All hashes are deterministic (blake2b with fixed seeds / fixed random
projection planes), so results are stable across runs and partitioning.
Candidate generation is distributed (map_batches + groupby); only the final
pair verification / union-find runs on the driver, over the (small)
candidate set — documented assumption, same shape as the reference's
driver-side answer merging.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..tokenize import py_tokenize

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
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return ds.map_batches(lambda b: _expand_batch(b, n),
                          batch_format="pyarrow", batch_size=8192)


def _expand_batch(b: pa.Table, n: int) -> pa.Table:
    import re
    doc_id = b["doc_id"].to_numpy()
    text = np.asarray(b["text"].to_pandas(), dtype=object)
    m_exact = doc_id % 5 == 3
    m_near = doc_id % 5 == 1
    near_text = np.array([re.sub("^[a-z0-9]+", "xdup", t, count=1)
                          for t in text[m_near]], dtype=object)
    return pa.table({
        "doc_id": pa.array(np.concatenate(
            [doc_id, doc_id[m_exact] + n, doc_id[m_near] + 2 * n]).astype(np.int64)),
        "text": pa.array(np.concatenate([text, text[m_exact], near_text]),
                         type=pa.string()),
    })


def _hash64(strings: "pd.Series") -> np.ndarray:
    """Deterministic 64-bit content hash (vectorized via pandas hash_array
    would be version-dependent; blake2b is stable across everything)."""
    return np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big") for s in strings),
        dtype=np.uint64, count=len(strings))


def _shingles(tokens: list[str], n: int = 3) -> set[str]:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)}


# ------------------------------ exact dedup --------------------------------


def exact_dedup(sf_dir: str) -> pa.Table:
    """Keep the smallest doc_id per distinct text: hash-partition by content
    hash, per-group first (the §2.8 pattern).  Returns survivors sorted."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = _hash64(b["text"].to_pandas())
        return b.append_column("h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)

    # per-group-first as an AGGREGATE (min doc_id per hash) — map_groups
    # over one tiny pandas group per distinct text is orders slower
    from ray.data.aggregate import Min
    kept = hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))
    out = kept.to_pandas()[["doc_id"]].sort_values("doc_id").reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


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


def _minhash(shingle_hashes: np.ndarray) -> np.ndarray:
    """(n_shingles,) uint64 → (MINHASH_PERMS,) uint64 signature."""
    if len(shingle_hashes) == 0:
        return np.full(MINHASH_PERMS, np.uint64(_MERSENNE))
    x = shingle_hashes[:, None]
    hv = (x * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return hv.min(axis=0)


def _minhash_bands_batch(b: pa.Table) -> pa.Table:
    """doc → LSH_BANDS rows (band_id, band_hash, doc_id).

    Vectorized: shingle hashes of the whole batch go through the permutation
    matrix in one chunked pass; per-doc minima via ``np.minimum.reduceat``
    over document boundaries; band hashes via one blake2b per (doc, band)
    (deterministic across workers — never Python ``hash()``).
    """
    docs = b["doc_id"].to_numpy()
    texts = b["text"].to_pandas()
    per_doc = [sorted(_shingles(py_tokenize(t))) for t in texts]
    counts = np.array([max(1, len(s)) for s in per_doc], np.int64)
    flat = np.fromiter(
        (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(),
                        "big")
         for shs in per_doc for s in (shs or ["\x00empty"])),
        dtype=np.uint64, count=int(counts.sum()))
    starts = np.zeros(len(per_doc), np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sigs = np.empty((len(per_doc), MINHASH_PERMS), np.uint64)
    CH = 200_000  # shingle-row chunk so (CH × 128) fits comfortably in RAM
    doc_of = np.repeat(np.arange(len(per_doc)), counts)
    for lo in range(0, len(flat), CH):
        hv = (flat[lo:lo + CH, None] * _A[None, :] + _B[None, :]) \
            % np.uint64(_MERSENNE)
        seg_docs = doc_of[lo:lo + CH]
        boundaries = np.flatnonzero(np.diff(seg_docs)) + 1
        red_starts = np.concatenate(([0], boundaries))
        mins = np.minimum.reduceat(hv, red_starts, axis=0)
        touched = seg_docs[red_starts]
        first_chunk = lo <= starts[touched]
        sigs[touched[first_chunk]] = mins[first_chunk]
        if (~first_chunk).any():
            t2 = touched[~first_chunk]
            np.minimum(sigs[t2], mins[~first_chunk], out=sigs[t2])
    band_hashes = np.empty((len(per_doc), LSH_BANDS), np.int64)
    for i in range(len(per_doc)):
        for band in range(LSH_BANDS):
            chunk = sigs[i, band * _ROWS_PER_BAND:(band + 1) * _ROWS_PER_BAND]
            band_hashes[i, band] = int.from_bytes(
                hashlib.blake2b(chunk.tobytes(), digest_size=8).digest(),
                "big") & 0x7FFFFFFFFFFFFFFF
    n = len(per_doc)
    return pa.table({
        "band_id": pa.array(np.tile(np.arange(LSH_BANDS, dtype=np.int32), n)),
        "band_hash": pa.array(band_hashes.reshape(-1)),
        "doc_id": pa.array(np.repeat(docs.astype(np.int64), LSH_BANDS))})


def minhash_candidates(sf_dir: str) -> list[tuple[int, int]]:
    """Candidate pairs = docs sharing an LSH band bucket.

    Bucket SIZES are computed distributed (groupby count); only rows in
    colliding buckets (count > 1 — rare by construction) come back to the
    driver, where pair expansion is one vectorized pandas pass."""
    ds = _documents(sf_dir, ["doc_id", "text"])
    # banding (tokenize + minhash) is the distributed heavy pass; the bands
    # table itself is tiny (32 rows per doc), so collision/pair extraction
    # is one vectorized driver pass.  (Ray's sort-groupby on 2 keys costs
    # tens of seconds of fixed overhead at this size; at ≥10^8 docs swap
    # this tail for a distributed groupby-count + colliding-key filter.)
    bands = ds.map_batches(_minhash_bands_batch, batch_format="pyarrow",
                           batch_size=1024).to_pandas()
    coll = bands[bands.duplicated(["band_id", "band_hash"], keep=False)]
    out: set[tuple[int, int]] = set()
    for _, g in coll.groupby(["band_id", "band_hash"], sort=False):
        d = np.sort(g["doc_id"].unique())
        if len(d) < 2:
            continue
        i, j = np.triu_indices(len(d), k=1)
        out.update(zip(d[i].tolist(), d[j].tolist()))
    return sorted(out)


def minhash_dedup(sf_dir: str, threshold: float = 0.8) -> pa.Table:
    """MinHash-LSH near-dup clusters: candidates from band collisions,
    verified with exact shingle Jaccard, clustered by union-find (driver —
    candidate set is band-collision-bounded)."""
    cands = minhash_candidates(sf_dir)
    docs = _documents(sf_dir, ["doc_id", "text"]).to_pandas()
    all_ids = docs["doc_id"].astype(int).tolist()
    # exact-Jaccard verification only needs the candidate docs' shingles —
    # rebuilding them for every doc made the driver the bottleneck
    in_cands = {d for pair in cands for d in pair}
    toks = {int(r.doc_id): _shingles(py_tokenize(r.text))
            for r in docs.itertuples() if int(r.doc_id) in in_cands}
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for a, b in cands:
        sa, sb = toks[a], toks[b]
        union = len(sa | sb)
        if union and len(sa & sb) / union >= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    cluster = {d: find(d) for d in all_ids}
    out = pd.DataFrame({"doc_id": sorted(all_ids),
                        "cluster_id": [cluster[d] for d in sorted(all_ids)]})
    return pa.Table.from_pandas(out, preserve_index=False)


# ------------------------------ simhash ------------------------------------


def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, np.int64)
    for t in tokens:
        h = int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    v = 0
    for i in range(64):
        if acc[i] > 0:
            v |= 1 << i
    return v


def simhash_pairs(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Near-dup pairs by SimHash: 4-band blocking (a pair within Hamming ≤ 3
    shares at least one exact 16-bit band) then exact Hamming verify."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def sim_batch(b: pa.Table) -> pa.Table:
        # batch-vectorized simhash: hash every token once, unpack sign bits
        # for all tokens at once, per-doc ±1 sums via np.add.reduceat
        docs = b["doc_id"].to_numpy()
        toks_per_doc = [py_tokenize(t) for t in b["text"].to_pandas()]
        counts = np.array([max(1, len(t)) for t in toks_per_doc], np.int64)
        flat = np.fromiter(
            (int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                            "big")
             for toks in toks_per_doc for t in (toks or ["\x00empty"]))
            , dtype=np.uint64, count=int(counts.sum()))
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int32) * 2 - 1
        starts = np.zeros(len(counts), np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        acc = np.add.reduceat(bits, starts, axis=0)
        sig_bits = (acc > 0).astype(np.uint64)
        sigs = (sig_bits << np.arange(64, dtype=np.uint64)[None, :]).sum(
            axis=1, dtype=np.uint64)
        n = len(docs)
        band_ids = np.tile(np.arange(4, dtype=np.int32), n)
        shifts = (np.arange(4, dtype=np.uint64) * np.uint64(16))
        band_vals = ((sigs[:, None] >> shifts[None, :])
                     & np.uint64(0xFFFF)).astype(np.int64).reshape(-1)
        return pa.table({
            "band_id": pa.array(band_ids),
            "band_val": pa.array(band_vals),
            "doc_id": pa.array(np.repeat(docs.astype(np.int64), 4)),
            "sig": pa.array(np.repeat(sigs.view(np.int64), 4))})

    # the signature pass is the distributed heavy step; the bands table is
    # 4 rows/doc, so collision + Hamming verification is one driver pass
    # (same scale note as minhash_candidates)
    bands = ds.map_batches(sim_batch, batch_format="pyarrow",
                           batch_size=1024).to_pandas()
    coll = bands[bands.duplicated(["band_id", "band_val"], keep=False)]
    if not len(coll):
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64())})
    popcnt8 = np.array([bin(i).count("1") for i in range(256)], np.uint8)

    def _hamming(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        z = (x ^ y).view(np.uint8).reshape(len(x), 8)
        return popcnt8[z].sum(axis=1)

    uniq: set[tuple[int, int]] = set()
    for _, g in coll.groupby(["band_id", "band_val"]):
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        d = g["doc_id"].to_numpy()
        s = g["sig"].to_numpy().astype(np.int64).view(np.uint64)
        if len(d) < 2:
            continue
        i, j = np.triu_indices(len(d), k=1)
        keep = _hamming(s[i], s[j]) <= max_hamming
        uniq.update(zip(d[i][keep].tolist(), d[j][keep].tolist()))
    pairs = sorted(uniq)
    return pa.table({"a": pa.array([p[0] for p in pairs], pa.int64()),
                     "b": pa.array([p[1] for p in pairs], pa.int64())})


# ------------------------------ ngram jaccard ------------------------------


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5,
                        n: int = 3) -> pa.Table:
    """Exact all-pairs n-gram Jaccard ≥ threshold.

    Shingle extraction is distributed (map_batches); the pairwise
    intersection is a blocked doc×shingle boolean matmul (BLAS) — the exact
    brute-force baseline.  This corpus's shingle vocabulary is small; at
    real scale the exact variant is the verifier behind MinHash-LSH
    candidates (:func:`minhash_dedup`), never run all-pairs.
    """
    ds = _documents(sf_dir, ["doc_id", "text"])

    def shingle_rows(b: pa.Table) -> pa.Table:
        docs, shs = [], []
        for d, t in zip(b["doc_id"].to_numpy(), b["text"].to_pandas()):
            for s in _shingles(py_tokenize(t), n):
                docs.append(int(d))
                shs.append(s)
        return pa.table({"doc_id": pa.array(docs, pa.int64()),
                         "shingle": pa.array(shs, pa.string())})

    import ray as _ray
    rows = ds.map_batches(shingle_rows, batch_format="pyarrow",
                          batch_size=4096).to_pandas()
    codes, _uniq = pd.factorize(rows["shingle"], sort=False)
    doc_ids, doc_idx = np.unique(rows["doc_id"].to_numpy(), return_inverse=True)
    D, V = len(doc_ids), codes.max() + 1
    if D * V > 4e9:
        raise ValueError("all-pairs exact Jaccard infeasible at this size; "
                         "use minhash_dedup (LSH candidates + verify)")
    A = np.zeros((D, V), np.float32)
    A[doc_idx, codes] = 1.0
    sizes = A.sum(axis=1)
    ref = _ray.put((doc_ids, A, sizes))  # broadcast once; workers read
    #                                      zero-copy from the object store

    @_ray.remote(num_cpus=1)
    def block_pairs(lo: int, hi: int):
        ids, M, sz = _ray.get(ref)
        inter = (M[lo:hi] @ M[lo:].T).astype(np.float64)  # exact small ints
        union = (sz[lo:hi, None] + sz[None, lo:]).astype(np.float64) - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            # float64 division of exact integer counts — bit-identical to
            # the SQL oracle's len()/len() division
            jac = np.where(union > 0, inter / union, 0.0)
        bi, dj = np.nonzero(jac >= threshold)
        ga, gb = ids[bi + lo], ids[dj + lo]
        keep = ga < gb
        return ga[keep], gb[keep], jac[bi[keep], dj[keep]]

    B = 256
    parts = _ray.get([block_pairs.remote(lo, min(lo + B, D))
                      for lo in range(0, D, B)])
    a = np.concatenate([p[0] for p in parts])
    b = np.concatenate([p[1] for p in parts])
    j = np.round(np.concatenate([p[2] for p in parts]).astype(np.float64), 6)
    order = np.lexsort((b, a))
    return pa.table({"a": pa.array(a[order], pa.int64()),
                     "b": pa.array(b[order], pa.int64()),
                     "jaccard": pa.array(j[order], pa.float64())})


# ------------------------------ embedding near-dup -------------------------


def embedding_neardup_pairs(sf_dir: str, threshold: float = 0.4) -> pa.Table:
    """Cosine ≥ threshold pairs over the embeddings table.  Each batch does
    one matmul against the broadcast L2-normalized matrix — the brute-force
    baseline; the LSH-bucketed variant is the scale path (similarity.py)."""
    import ray
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    full = emb.to_pandas()
    ids = full["vec_id"].to_numpy().astype(np.int64)
    M = np.stack(full["embedding"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, Mn))

    class PairFinder:
        def __init__(self):
            self.ids, self.Mn = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            q_ids = b["vec_id"].to_numpy().astype(np.int64)
            Q = np.stack(b["embedding"].to_numpy())
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            sims = Qn @ self.Mn.T
            qi, mi = np.nonzero(sims >= threshold)
            a = q_ids[qi]
            bb = self.ids[mi]
            keep = a < bb
            # pair membership only — a float similarity column cannot
            # hash-match across different reduce orders, and the threshold
            # boundary is the only float-sensitive decision left
            return pd.DataFrame({"a": a[keep], "b": bb[keep]})

    pairs = emb.map_batches(PairFinder, batch_format="pandas",
                            batch_size=1024, concurrency=(1, 4))
    out = pairs.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --------------------------- SQL oracles -----------------------------------

def _sql():
    from ..fixtures import DOCS_DUP_SQL
    dup = f"documents_dup AS ({DOCS_DUP_SQL})"
    return {
        "dedup_exact_docs": f"""
WITH {dup}
SELECT min(doc_id) AS doc_id FROM documents_dup GROUP BY text ORDER BY doc_id
""".strip(),
        "dedup_exact_count": f"""
WITH {dup}
SELECT count(DISTINCT text)::BIGINT AS n_distinct FROM documents_dup
""".strip(),
        # TRUE shingle-Jaccard pairs, computed independently in SQL
        "dedup_ngram_jaccard_pairs": f"""
WITH {dup},
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
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.s, b.s)) * 1.0 /
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT a, b, round(jac, 6) AS jaccard FROM pairs WHERE jac >= 0.5 ORDER BY a, b
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
