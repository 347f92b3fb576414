"""Similarity search over the ``embeddings`` table (``list<float>`` column).

- :func:`ann_bruteforce_topk` — exact cosine top-k: every batch does one
  numpy matmul against a BROADCAST query matrix (``ray.put`` once, read in
  every task) and emits its local top-k; the driver merges per-batch
  partials — no shuffle, no full materialization.
- :func:`ann_lsh_topk` — the scale path: signed-random-projection LSH
  buckets (deterministic planes), probe the query's bucket ring only;
  returns (recall vs exact) so the approximation is measured, not assumed.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

QUERY_VEC_IDS = [0, 1, 2, 3]  # deterministic query set: first four vectors


def _embeddings(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str, vec_ids) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                      columns=["vec_id", "embedding"])
    ids = t["vec_id"].to_numpy()
    sel = np.isin(ids, vec_ids)
    order = np.argsort(ids[sel])
    Q = np.stack(t["embedding"].to_pandas()[sel].to_numpy())[order].astype(np.float64)
    return ids[sel][order], Q / np.linalg.norm(Q, axis=1, keepdims=True)


def ann_bruteforce_topk(sf_dir: str, k: int = 10,
                        vec_ids=QUERY_VEC_IDS) -> pa.Table:
    """Exact cosine top-k per query vector.  Self-matches excluded.

    Output: (query_id, vec_id, cos) ordered cos desc, vec_id asc per query.
    """
    q_ids, Qn = _query_matrix(sf_dir, vec_ids)
    ref = ray.put((q_ids, Qn))

    class TopkPerBatch:
        def __init__(self):
            self.q_ids, self.Qn = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b["vec_id"].to_numpy().astype(np.int64)
            M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            sims = self.Qn @ Mn.T              # (nq, batch)
            rows = []
            for qi, qid in enumerate(self.q_ids):
                s = sims[qi]
                mask = ids != qid              # exclude self-match
                cand_ids, cand_s = ids[mask], s[mask]
                if len(cand_ids) > k:
                    cut = np.argpartition(cand_s, len(cand_s) - k)[-k:]
                    cand_ids, cand_s = cand_ids[cut], cand_s[cut]
                rows.append(pd.DataFrame({"query_id": qid, "vec_id": cand_ids,
                                          "cos": cand_s}))
            return pd.concat(rows, ignore_index=True)

    partials = _embeddings(sf_dir).map_batches(
        TopkPerBatch, batch_format="pandas", batch_size=2048,
        concurrency=(1, 4)).to_pandas()
    out = []
    for qid, g in partials.groupby("query_id"):
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1, dtype=np.int64))
        out.append(g)
    res = pd.concat(out, ignore_index=True)
    # rank, not the raw cosine: a float column cannot hash-match the SQL
    # oracle across different accumulation orders; rank is order-exact
    res = res[["query_id", "rank", "vec_id"]].sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


# ------------------------------ LSH variant --------------------------------

_N_PLANES = 10   # bits per table
_N_TABLES = 4    # independent tables — multi-probe union


def _planes(dim: int) -> np.ndarray:
    rng = np.random.default_rng(777)
    return rng.standard_normal((_N_TABLES, _N_PLANES, dim))


def _codes(Mn: np.ndarray, P: np.ndarray) -> np.ndarray:
    """(n, tables) bucket codes: sign bits of P·x per table."""
    bits = (np.einsum("tpd,nd->ntp", P, Mn) > 0)
    weights = (1 << np.arange(_N_PLANES)).astype(np.int64)
    return (bits * weights).sum(axis=2)


def ann_lsh_topk(sf_dir: str, k: int = 10, vec_ids=QUERY_VEC_IDS,
                 max_hamming: int = 2) -> pa.Table:
    """Signed-random-projection LSH ANN: 4 independent tables of 10-bit
    sign codes; a vector is a candidate if ANY table puts it within
    Hamming ≤ ``max_hamming`` of the query's code (multi-probe union).
    Returns per-query recall@k against the exact answer — the honest
    accuracy contract for the approximate path."""
    exact = ann_bruteforce_topk(sf_dir, k, vec_ids).to_pandas()
    q_ids, Qn = _query_matrix(sf_dir, vec_ids)
    P = _planes(Qn.shape[1])
    q_codes = _codes(Qn, P)  # (nq, tables)
    ref = ray.put((q_ids, Qn, P, q_codes))

    class Probe:
        def __init__(self):
            self.q_ids, self.Qn, self.P, self.q_codes = ray.get(ref)
            self.popcnt = np.array([bin(i).count("1")
                                    for i in range(1 << _N_PLANES)],
                                   dtype=np.int8)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            ids = b["vec_id"].to_numpy().astype(np.int64)
            M = np.stack(b["embedding"].to_numpy()).astype(np.float64)
            Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
            codes = _codes(Mn, self.P)  # (n, tables)
            rows = []
            for qi, qid in enumerate(self.q_ids):
                ham = self.popcnt[codes ^ self.q_codes[qi][None, :]]
                mask = (ham <= max_hamming).any(axis=1) & (ids != qid)
                if not mask.any():
                    continue
                sims = Mn[mask] @ self.Qn[qi]
                rows.append(pd.DataFrame({"query_id": qid,
                                          "vec_id": ids[mask], "cos": sims}))
            if not rows:
                return pd.DataFrame({"query_id": pd.Series(dtype=np.int64),
                                     "vec_id": pd.Series(dtype=np.int64),
                                     "cos": pd.Series(dtype=np.float64)})
            return pd.concat(rows, ignore_index=True)

    partials = _embeddings(sf_dir).map_batches(
        Probe, batch_format="pandas", batch_size=2048,
        concurrency=(1, 4)).to_pandas()
    recs = []
    for qid in q_ids:
        g = partials[partials["query_id"] == qid]
        g = g.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
        truth = set(exact[exact["query_id"] == qid]["vec_id"])
        got = set(g["vec_id"])
        recs.append((int(qid), len(g),
                     round(len(got & truth) / max(1, len(truth)), 6)))
    return pa.table({"query_id": pa.array([r[0] for r in recs], pa.int64()),
                     "n_results": pa.array([r[1] for r in recs], pa.int64()),
                     "recall_at_k": pa.array([r[2] for r in recs], pa.float64())})


SQL = {
    "ann_bruteforce_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id IN ({", ".join(map(str, QUERY_VEC_IDS))})),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe) AS cos,
         row_number() OVER (PARTITION BY q.query_id
                            ORDER BY list_cosine_similarity(
                              CAST(e.embedding AS DOUBLE[]), q.qe) DESC,
                            e.vec_id ASC) AS rn
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id)
SELECT query_id, rn::BIGINT AS rank, vec_id FROM scored WHERE rn <= 10
ORDER BY query_id, rank
""".strip(),
}
