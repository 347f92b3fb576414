"""Distributed k-means over the embedding column — the topic-clustering
stage of a training-data curation pipeline (cluster-balanced sampling /
SemDeDup-style semantic grouping operate on exactly this assignment).

Classic two-pass-per-iteration distributed Lloyd's: centroids are a tiny
broadcast (``ray.put`` of a k×dim int64 matrix, read zero-copy by every
task), each iteration is ONE streaming pass emitting per-cluster partial
sums (k×dim rows per batch — combiner-reduced, no shuffle), and the
driver merge is O(k·dim).  Nothing driver-side scales with the corpus.

EXACT AND DETERMINISTIC BY CONSTRUCTION — the whole computation is fixed
point so a serial SQL oracle hash-matches the distributed run:

- inputs quantize once: ``xq = round_even(float64(x)·4096) + 8192``
  (power-of-two scale ⇒ the float multiply is exact; the offset keeps
  every value positive so integer division truncation == floor in both
  engines);
- centroids live on the ``xq·4096`` grid: seed centroids are
  ``seed_xq·4096``, updated centroids are ``(Σxq·4096) // count``;
- distances are integer: ``Σ_d (xq·4096 − c_fp)²`` — bounded by
  dims·(range·4096)² ≪ 2⁶³ for |x| ≤ 2, dims ≤ 512;
- assignment ties break to the LOWEST cluster id (np.argmin first-hit ==
  SQL ``row_number() OVER (ORDER BY dist, cid)``);
- seeds are the k smallest ``vec_id`` rows; integer sums are
  reduce-order-free, so parallelism cannot change any result.

At 100 TB the final assignment pass writes partitioned Parquet instead of
returning a table; iterations stay two streaming passes regardless of
scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..util import read_parquet_clean

K_CLUSTERS = 8
KM_ITERS = 2
_KM_SCALE = 4096      # 2^12 — exact float64 multiply
_KM_OFFSET = 8192     # shifts xq positive: floor == trunc everywhere


def _embeddings(sf_dir: str) -> "ray.data.Dataset":
    return read_parquet_clean(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])


def _ids_xq(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy().astype(np.int64)
    col = b["embedding"].combine_chunks()
    M = col.flatten().to_numpy(zero_copy_only=False).reshape(len(ids), -1)
    xq = (np.round(M.astype(np.float64) * _KM_SCALE).astype(np.int64)
          + _KM_OFFSET)
    return ids, xq


def _quantized(sf_dir: str) -> "ray.data.Dataset":
    """Materialized (vec_id, xq fixed-size-list<int64>) dataset — quantize
    once, stream it through seeds + every iteration pass."""

    def q(b: pa.Table) -> pa.Table:
        ids, xq = _ids_xq(b)
        return pa.table({
            "vec_id": pa.array(ids),
            "xq": pa.FixedSizeListArray.from_arrays(
                pa.array(xq.ravel()), xq.shape[1])})

    return _embeddings(sf_dir).map_batches(
        q, batch_format="pyarrow", batch_size=8192).materialize()


def _batch_xq(b: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = b["vec_id"].to_numpy().astype(np.int64)
    col = b["xq"].combine_chunks()
    dim = col.type.list_size
    # flatten(), not .values: .values ignores a sliced array's offset
    return ids, col.flatten().to_numpy(zero_copy_only=False) \
        .reshape(len(ids), dim)


_ASSIGN_CHUNK = 1024  # rows per distance block: bounds the (chunk, k,
#                       dim) int64 broadcast temporary to ~tens of MB


def _assign(xq: np.ndarray, cids: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest live centroid per row; ties → lowest cid (cids sorted).
    Distances computed in row chunks — the full (n, k, dim) broadcast
    temporary would be ~0.5 GiB per concurrent task at dim 512."""
    out = np.empty(len(xq), np.int64)
    for lo in range(0, len(xq), _ASSIGN_CHUNK):
        sub = xq[lo:lo + _ASSIGN_CHUNK]
        D = ((sub[:, None, :] * _KM_SCALE - C[None, :, :]) ** 2).sum(axis=2)
        out[lo:lo + _ASSIGN_CHUNK] = cids[np.argmin(D, axis=1)]
    return out


def _learn_centroids(ds: "ray.data.Dataset", k: int,
                     iters: int) -> tuple[np.ndarray, np.ndarray]:
    """Seeds + (iters−1) Lloyd rounds → (live cids, fixed-point centroids).

    Per round: broadcast centroids → one ``map_batches`` pass emitting
    per-cluster (count, Σxq) partials → O(k·dim) driver merge.  A cluster
    that loses all members drops out of the live set (its cid is never
    reassigned), mirroring the SQL oracles' inner join against non-empty
    groups.
    """
    # seeds: k smallest vec_ids — per-batch local top-k partials, merged
    # on the driver (k rows per batch, never the corpus)
    def seed_partial(b: pa.Table) -> pa.Table:
        ids, xq = _batch_xq(b)
        keep = np.argsort(ids)[:k]
        return pa.table({
            "vec_id": pa.array(ids[keep]),
            "xq": pa.FixedSizeListArray.from_arrays(
                pa.array(xq[keep].ravel()), xq.shape[1])})

    sp = ds.map_batches(seed_partial, batch_format="pyarrow",
                        batch_size=65536).take_all()
    if not sp:  # empty embeddings table: no clusters, like the SQL
        return (np.array([], np.int64),  # oracles' empty inner joins
                np.zeros((0, 1), np.int64))
    seed_ids = np.array([r["vec_id"] for r in sp], np.int64)
    seed_xq = np.array([np.asarray(r["xq"]) for r in sp], np.int64)
    order = np.argsort(seed_ids)[:k]
    dim = seed_xq.shape[1]
    cids = np.arange(len(order), dtype=np.int64)
    C = seed_xq[order] * _KM_SCALE            # c_fp grid = xq·4096

    for _ in range(iters - 1):
        c_ref = ray.put((cids, C))

        def stats(b: pa.Table) -> pa.Table:
            live_cids, cent = ray.get(c_ref)
            _, xq = _batch_xq(b)
            a = _assign(xq, live_cids, cent)
            pos = np.searchsorted(live_cids, a)
            sums = np.zeros((len(live_cids), xq.shape[1]), np.int64)
            np.add.at(sums, pos, xq)
            cnt = np.bincount(pos, minlength=len(live_cids)).astype(np.int64)
            return pa.table({
                "cid": pa.array(live_cids),
                "cnt": pa.array(cnt),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.ravel()), xq.shape[1])})

        parts = ds.map_batches(stats, batch_format="pyarrow",
                               batch_size=8192).take_all()
        acc = np.zeros((len(cids), dim), np.int64)
        cnt = np.zeros(len(cids), np.int64)
        for r in parts:
            i = int(np.searchsorted(cids, r["cid"]))
            acc[i] += np.asarray(r["s"], np.int64)
            cnt[i] += int(r["cnt"])
        live = cnt > 0
        # centroid update in PYTHON ints: Σxq for a 10^11-member cluster
        # is ~1.6e15, and ×4096 passes 2^63 — an int64 multiply would
        # wrap SILENTLY and diverge from the HUGEINT-exact SQL oracle.
        # k×dim elements only, so the object-dtype pass is trivial.
        exact = (acc[live].astype(object) * _KM_SCALE
                 ) // cnt[live, None].astype(object)
        cids, C = cids[live], exact.astype(np.int64)
    return cids, C


_CENTROID_CACHE: dict = {}


def _centroids_for(sf_dir: str, k: int, iters: int):
    """Centroids memoized per (embeddings fingerprint, k, iters) — the
    three registered embed_* queries share one clustering, and each
    learn is ≥ 2 full corpus passes (the same re-ask memo pattern as
    dedup's _LABELS_CACHE / similarity's _BRUTE_CACHE)."""
    from ..util import input_fingerprint
    ck = (input_fingerprint([os.path.join(sf_dir, "embeddings.parquet")]),
          int(k), int(iters))
    if ck not in _CENTROID_CACHE:
        while len(_CENTROID_CACHE) >= 4:
            _CENTROID_CACHE.pop(next(iter(_CENTROID_CACHE)))
        _CENTROID_CACHE[ck] = _learn_centroids(_quantized(sf_dir), k,
                                               iters)
    return _CENTROID_CACHE[ck]


def kmeans_assign(sf_dir: str, k: int = K_CLUSTERS,
                  iters: int = KM_ITERS) -> pa.Table:
    """Final (vec_id, cluster) assignment after ``iters`` Lloyd rounds
    (see :func:`_learn_centroids` for the per-round scale shape)."""
    ds = _quantized(sf_dir)
    cids, C = _centroids_for(sf_dir, k, iters)
    c_ref = ray.put((cids, C))

    def final(b: pa.Table) -> pa.Table:
        live_cids, cent = ray.get(c_ref)
        ids, xq = _batch_xq(b)
        return pa.table({"vec_id": pa.array(ids),
                         "cluster": pa.array(_assign(xq, live_cids, cent))})

    out = (ds.map_batches(final, batch_format="pyarrow", batch_size=8192)
           .sort("vec_id").to_pandas())
    return pa.Table.from_pandas(out, preserve_index=False)


CLUSTER_SAMPLE_N = 16  # per-cluster sample size


def cluster_sample(sf_dir: str, k: int = K_CLUSTERS,
                   iters: int = KM_ITERS,
                   n_per: int = CLUSTER_SAMPLE_N) -> pa.Table:
    """Cluster-balanced sampling: the k-means topics each contribute
    their ``n_per`` deterministically-chosen members — the diversity-
    preserving sampler a curation pipeline runs after clustering (the
    skew alternative to uniform sampling: a dominant topic cannot crowd
    out the tail).  Selection is the ``n_per`` smallest
    ``(md5_64(vec_id), vec_id)`` per cluster, so the sample is a stable
    content-independent draw that the SQL oracle reproduces exactly via
    ``md5_number_lower`` + ``row_number()``.

    Scale shape: centroid learning is :func:`_learn_centroids`'s
    streaming passes; the selection is per-batch bounded-top-``n_per``
    partials per cluster (≤ k·n_per rows per batch leave the workers)
    merged on the driver — never the corpus."""
    from ..util import md5_64
    ds = _quantized(sf_dir)
    cids, C = _centroids_for(sf_dir, k, iters)
    c_ref = ray.put((cids, C))

    def sample_partial(b: pa.Table) -> pa.Table:
        live_cids, cent = ray.get(c_ref)
        ids, xq = _batch_xq(b)
        a = _assign(xq, live_cids, cent)
        h = md5_64([str(int(i)) for i in ids]).astype(np.uint64)
        order = np.lexsort((ids, h, a))   # per cluster: (h, vec_id) asc
        a, ids, h = a[order], ids[order], h[order]
        starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
        keep = np.zeros(len(a), bool)
        for s0, e0 in zip(starts, np.r_[starts[1:], len(a)]):
            keep[s0:min(s0 + n_per, e0)] = True
        return pa.table({"cluster": pa.array(a[keep]),
                         "vec_id": pa.array(ids[keep]),
                         "h": pa.array(h[keep])})

    parts = (ds.map_batches(sample_partial, batch_format="pyarrow",
                            batch_size=8192)
             .to_pandas())  # ≤ k·n_per rows PER BATCH — partials only
    if "h" not in parts.columns:  # empty embeddings table: Ray's empty
        #  stream loses column names (matching _learn_centroids' empty
        #  support)
        import pandas as pd
        parts = pd.DataFrame({"cluster": np.array([], np.int64),
                              "vec_id": np.array([], np.int64),
                              "h": np.array([], np.uint64)})
    parts["h"] = parts["h"].astype(np.uint64)
    parts = parts.sort_values(["cluster", "h", "vec_id"])
    out = parts.groupby("cluster", as_index=False).head(n_per)
    out = out[["cluster", "vec_id"]].sort_values(
        ["cluster", "vec_id"]).reset_index(drop=True)
    out["cluster"] = out["cluster"].astype(np.int64)
    out["vec_id"] = out["vec_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def _cluster_sample_sql(k: int = K_CLUSTERS,
                        n_per: int = CLUSTER_SAMPLE_N) -> str:
    base = _kmeans_sql(k)
    chain = base[:base.rindex("SELECT vec_id")].rstrip() + ","
    return f"""
{chain}
ranked AS (
  SELECT vec_id, cid,
         row_number() OVER (
           PARTITION BY cid
           ORDER BY md5_number_lower(CAST(vec_id AS VARCHAR)), vec_id)
           AS rn
  FROM a2)
SELECT cid::BIGINT AS cluster, vec_id
FROM ranked WHERE rn <= {n_per}
ORDER BY cluster, vec_id
""".strip()


SEMDEDUP_TAU = 0.4  # this corpus's max cosine is ~0.51 (TESTDATA)


def semdedup_counts(sf_dir: str, k: int = K_CLUSTERS,
                    iters: int = KM_ITERS,
                    tau: float = SEMDEDUP_TAU) -> pa.Table:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means the
    embedding space, then deduplicate WITHIN each cluster — a vector is
    dropped when an earlier (lower vec_id) same-cluster vector sits
    within cosine ≥ tau.  Returns the per-cluster summary
    (cluster, n_vecs, n_dropped) ordered by cluster.

    Scale shape: the k-means rounds are the streaming passes of
    :func:`_learn_centroids`; the within-cluster all-pairs runs as ONE
    ``groupby(cluster).map_groups`` — in SemDeDup k grows with the
    corpus so a cluster stays task-sized by construction (the paper
    uses ~50k clusters over 5B embeddings; here k=8 over the test
    corpus).  No driver-side state scales with the corpus: the driver
    sees k summary rows.

    Determinism: assignment is the fixed-point integer k-means (bit-
    equal to the SQL oracle); the drop rule 'exists earlier same-cluster
    vector with cos ≥ tau' is order-free (a membership predicate, not an
    iteration), so it is exactly the oracle's EXISTS join."""
    cids, C = _centroids_for(sf_dir, k, iters)
    c_ref = ray.put((cids, C))
    emb = _embeddings(sf_dir)

    def assign_batch(b: pa.Table) -> pa.Table:
        live_cids, cent = ray.get(c_ref)
        ids, xq = _ids_xq(b)
        return b.append_column(
            "cluster", pa.array(_assign(xq, live_cids, cent)))

    def dedup_group(g: pa.Table) -> pa.Table:
        ids = g["vec_id"].to_numpy().astype(np.int64)
        col = g["embedding"].combine_chunks()
        M = col.flatten().to_numpy(zero_copy_only=False)             .reshape(len(ids), -1).astype(np.float64)
        order = np.argsort(ids)
        M = M[order]
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0
        N = M / norms[:, None]
        sims = N @ N.T
        # dropped[j] ⇔ ∃ i < j (vec_id order) with cos(i, j) ≥ tau.
        # Boolean i<j mask, NOT triu-zeroing: triu writes 0 into the
        # masked cells, and with tau ≤ 0 those zeros would satisfy
        # >= tau, marking EVERY vector (even each cluster's first)
        # dropped — diverging from the oracle's EXISTS predicate
        lower = np.tril(np.ones_like(sims, dtype=bool))
        dropped = ((sims >= tau) & ~lower).any(axis=0)
        return pa.table({
            "cluster": pa.array([int(g["cluster"][0].as_py())], pa.int64()),
            "n_vecs": pa.array([len(ids)], pa.int64()),
            "n_dropped": pa.array([int(dropped.sum())], pa.int64())})

    out = (emb.map_batches(assign_batch, batch_format="pyarrow",
                           batch_size=8192)
           .groupby("cluster").map_groups(dedup_group,
                                          batch_format="pyarrow")
           .to_pandas())  # k rows
    out = out.sort_values("cluster").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _semdedup_sql(k: int = K_CLUSTERS, tau: float = SEMDEDUP_TAU) -> str:
    """The k-means oracle's assignment chain + an EXISTS-earlier-neighbor
    drop predicate (same cosine expression as embedding_neardup_pairs)."""
    base = _kmeans_sql(k)
    # reuse everything up to the final SELECT; a2 is the assignment CTE
    chain = base[:base.rindex("SELECT vec_id")].rstrip() + ","
    return f"""
{chain}
drops AS (
  SELECT DISTINCT b.vec_id
  FROM a2 a JOIN a2 b ON a.cid = b.cid AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                               CAST(eb.embedding AS DOUBLE[])) >= {tau})
SELECT cid::BIGINT AS cluster, count(*)::BIGINT AS n_vecs,
       coalesce(sum(CASE WHEN vec_id IN (SELECT vec_id FROM drops)
                         THEN 1 ELSE 0 END), 0)::BIGINT AS n_dropped
FROM a2 GROUP BY cid ORDER BY cluster
""".strip()


def _kmeans_sql(k: int = K_CLUSTERS) -> str:
    """Unrolled 2-iteration Lloyd's in pure SQL over the unnested
    embedding list — same fixed-point grid, same tie rule.  HUGEINT sums
    keep every intermediate exact; only the two output columns hit the
    BIGINT boundary."""
    return f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round_even(CAST(unnest(embedding) AS DOUBLE) * {_KM_SCALE}, 0)
              AS BIGINT) + {_KM_OFFSET} AS xq
  FROM embeddings),
seeds AS (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
  FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {k})),
c0 AS (
  SELECT s.cid, e.dim, e.xq * {_KM_SCALE} AS cfp
  FROM seeds s JOIN e USING (vec_id)),
d1 AS (
  SELECT e.vec_id, c.cid,
         sum((e.xq * {_KM_SCALE} - c.cfp) * (e.xq * {_KM_SCALE} - c.cfp)) AS dist
  FROM e JOIN c0 c USING (dim) GROUP BY e.vec_id, c.cid),
a1 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d1) WHERE rn = 1),
c1 AS (
  SELECT a.cid, e.dim,
         CAST(CAST(sum(e.xq) AS BIGINT) * {_KM_SCALE} // count(*) AS BIGINT) AS cfp
  FROM e JOIN a1 a USING (vec_id) GROUP BY a.cid, e.dim),
d2 AS (
  SELECT e.vec_id, c.cid,
         sum((e.xq * {_KM_SCALE} - c.cfp) * (e.xq * {_KM_SCALE} - c.cfp)) AS dist
  FROM e JOIN c1 c USING (dim) GROUP BY e.vec_id, c.cid),
a2 AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d2) WHERE rn = 1)
SELECT vec_id, cid::BIGINT AS cluster FROM a2 ORDER BY vec_id
""".strip()


SQL = {"embed_kmeans_assign": _kmeans_sql(),
       "embed_semdedup_counts": _semdedup_sql(),
       "embed_cluster_sample": _cluster_sample_sql()}
