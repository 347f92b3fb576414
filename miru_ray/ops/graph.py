"""Graph analytics over the order history: PageRank on the
customer–part bipartite graph (an edge = customer ordered part).

Everything is FIXED-POINT INTEGER arithmetic (scale ``_PR_SCALE``) with
floor divisions at defined points, so the distributed run is bit-equal
to an unrolled SQL oracle — the same determinism trick as
:mod:`miru_ray.ops.cluster`'s k-means.  The recurrence (damping 85/100,
synchronous updates, ``n`` = customers + parts with ≥ 1 edge):

    r0(v)   = S // n
    base    = (15 * (S // n)) // 100
    r_{k+1}(v) = base + (85 * Σ_{u ∈ nbr(v)} (r_k(u) // deg(u))) // 100

Scale shape: distinct edges come from ONE distributed
``groupby(custkey, partkey)`` (combiner partials first) and stay
materialized as the per-iteration input; degrees and rank vectors are
NODE-bounded driver arrays broadcast via ``ray.put`` (the catwalk-model
bound); each iteration is one streaming ``map_batches`` over the edges
emitting per-batch partial contribution sums.  At node counts beyond a
broadcast, hash-partition edges by node and keep ranks co-partitioned —
same algebra, one extra shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..util import sorted_lookup

_PR_SCALE = 10**12
PR_ITERS = 2
PR_TOP_K = 20


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


def _edges(sf_dir: str) -> "ray.data.Dataset":
    """Distinct (custkey, partkey) edges: broadcast orderkey→custkey
    lookup inside the lineitem scan (orders is the smaller side), then
    per-batch distinct partials and one exact distributed groupby."""
    import pyarrow.parquet as pq
    o = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_orderkey", "o_custkey"])
    ok = o["o_orderkey"].to_numpy().astype(np.int64)
    oc = o["o_custkey"].to_numpy().astype(np.int64)
    order = np.argsort(ok)
    ref = ray.put((ok[order], oc[order]))

    def to_edges(t: pa.Table) -> pa.Table:
        k, c = ray.get(ref)
        lk = t["l_orderkey"].to_numpy().astype(np.int64)
        hit, pos = sorted_lookup(k, lk)
        out = pa.table({"c": pa.array(c[pos[hit]]),
                        "p": pc.cast(t["l_partkey"], pa.int64())
                             .take(pa.array(np.flatnonzero(hit)))})
        return out.group_by(["c", "p"]).aggregate([]) \
                  .rename_columns(["c", "p"])

    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    from ray.data.aggregate import Count
    return (li.map_batches(to_edges, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["c", "p"]).aggregate(Count(alias_name="_n"))
            .map_batches(lambda t: t.select(["c", "p"]),
                         batch_format="pyarrow", batch_size=65536)
            .materialize())


def _node_sums(edges: "ray.data.Dataset", key: str, val_ref,
               other: str):
    """Σ over edges of broadcast per-``other``-node values, grouped by
    ``key`` — one streaming pass, per-batch int64-exact partials."""

    def partial(t: pa.Table) -> pa.Table:
        keys, vals = ray.get(val_ref)
        kcol = t[key].to_numpy().astype(np.int64)
        ocol = t[other].to_numpy().astype(np.int64)
        pos = np.searchsorted(keys, ocol)
        contrib = vals[pos]
        ids, inv = np.unique(kcol, return_inverse=True)
        sums = np.zeros(len(ids), np.int64)
        np.add.at(sums, inv, contrib)
        return pa.table({"id": pa.array(ids), "s": pa.array(sums)})

    df = (edges.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
          .groupby("id", as_index=False)["s"].sum())
    return df


def pagerank_top(sf_dir: str, iters: int = PR_ITERS,
                 k: int = PR_TOP_K) -> pa.Table:
    """Top-k nodes of the bipartite order graph by fixed-point PageRank
    (see module docstring for the exact integer recurrence).  Output:
    (node_type 'c'|'p', node_id, rank) ordered by (rank desc, node_type,
    node_id)."""
    edges = _edges(sf_dir)

    def deg_partial(t: pa.Table) -> pa.Table:
        parts = []
        for kind in ("c", "p"):
            ids, cnt = np.unique(t[kind].to_numpy().astype(np.int64),
                                 return_counts=True)
            parts.append(pa.table({
                "kind": pa.array([kind] * len(ids), pa.string()),
                "id": pa.array(ids),
                "n": pa.array(cnt.astype(np.int64))}))
        return pa.concat_tables(parts)

    # degrees via NODE-bounded partials — the edge set itself never
    # reaches the driver
    degs = (edges.map_batches(deg_partial, batch_format="pyarrow",
                              batch_size=65536).to_pandas())
    if degs.empty:
        return pa.table({"node_type": pa.array([], pa.string()),
                         "node_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    degs = degs.groupby(["kind", "id"], as_index=False)["n"].sum()
    cdeg = degs[degs["kind"] == "c"].sort_values("id")
    pdeg = degs[degs["kind"] == "p"].sort_values("id")
    cu = cdeg["id"].to_numpy().astype(np.int64)
    pu = pdeg["id"].to_numpy().astype(np.int64)
    dc = cdeg["n"].to_numpy().astype(np.int64)
    dp = pdeg["n"].to_numpy().astype(np.int64)
    n = len(cu) + len(pu)
    S = _PR_SCALE
    r0 = S // n
    base = (15 * (S // n)) // 100
    rc = np.full(len(cu), r0, np.int64)
    rp = np.full(len(pu), r0, np.int64)
    for _ in range(iters):
        # synchronous update: both sides read the PREVIOUS iteration
        cref = ray.put((cu, rc // dc))
        pref = ray.put((pu, rp // dp))
        sc = _node_sums(edges, "c", pref, "p")
        sp = _node_sums(edges, "p", cref, "c")
        rc_n = np.full(len(cu), base, np.int64)
        idx = np.searchsorted(cu, sc["id"].to_numpy().astype(np.int64))
        rc_n[idx] += (85 * sc["s"].to_numpy().astype(np.int64)) // 100
        rp_n = np.full(len(pu), base, np.int64)
        idx = np.searchsorted(pu, sp["id"].to_numpy().astype(np.int64))
        rp_n[idx] += (85 * sp["s"].to_numpy().astype(np.int64)) // 100
        rc, rp = rc_n, rp_n
    allr = pd.DataFrame({
        "node_type": ["c"] * len(cu) + ["p"] * len(pu),
        "node_id": np.concatenate([cu, pu]),
        "rank": np.concatenate([rc, rp])})
    out = (allr.sort_values(["rank", "node_type", "node_id"],
                            ascending=[False, True, True]).head(k)
           .reset_index(drop=True))
    return pa.table({"node_type": pa.array(out["node_type"], pa.string()),
                     "node_id": pa.array(out["node_id"].astype("int64")),
                     "rank": pa.array(out["rank"].astype("int64"))})


def _iter_sql(prev_c: str, prev_p: str, i: int) -> str:
    """One unrolled synchronous iteration: rc{i}/rp{i} from {prev}."""
    return f"""
sc{i} AS (
  SELECT e.c AS id, sum({prev_p}.r // degp.dp) AS s
  FROM e JOIN {prev_p} ON {prev_p}.id = e.p
         JOIN degp ON degp.p = e.p
  GROUP BY e.c),
rc{i} AS (
  SELECT degc.c AS id,
         (SELECT base FROM const)
         + (85 * coalesce(sc{i}.s, 0)) // 100 AS r
  FROM degc LEFT JOIN sc{i} ON sc{i}.id = degc.c),
sp{i} AS (
  SELECT e.p AS id, sum({prev_c}.r // degc.dc) AS s
  FROM e JOIN {prev_c} ON {prev_c}.id = e.c
         JOIN degc ON degc.c = e.c
  GROUP BY e.p),
rp{i} AS (
  SELECT degp.p AS id,
         (SELECT base FROM const)
         + (85 * coalesce(sp{i}.s, 0)) // 100 AS r
  FROM degp LEFT JOIN sp{i} ON sp{i}.id = degp.p)""".strip()


def pagerank_sql(iters: int = PR_ITERS, k: int = PR_TOP_K) -> str:
    body = []
    prev_c, prev_p = "r0c", "r0p"
    for i in range(1, iters + 1):
        body.append(_iter_sql(prev_c, prev_p, i))
        prev_c, prev_p = f"rc{i}", f"rp{i}"
    chain = ",\n".join(body)
    return f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
degc AS (SELECT c, count(*) AS dc FROM e GROUP BY c),
degp AS (SELECT p, count(*) AS dp FROM e GROUP BY p),
const AS (
  SELECT ((SELECT count(*) FROM degc) + (SELECT count(*) FROM degp)) AS n,
         {_PR_SCALE} // ((SELECT count(*) FROM degc)
                         + (SELECT count(*) FROM degp)) AS r0,
         (15 * ({_PR_SCALE} // ((SELECT count(*) FROM degc)
                                + (SELECT count(*) FROM degp)))) // 100
             AS base),
r0c AS (SELECT c AS id, (SELECT r0 FROM const) AS r FROM degc),
r0p AS (SELECT p AS id, (SELECT r0 FROM const) AS r FROM degp),
{chain}
SELECT node_type, node_id, rank FROM (
  SELECT 'c' AS node_type, id AS node_id, r::BIGINT AS rank FROM {prev_c}
  UNION ALL
  SELECT 'p', id, r::BIGINT FROM {prev_p})
ORDER BY rank DESC, node_type, node_id LIMIT {k}
""".strip()


SQL = {"graph_pagerank_top": pagerank_sql()}
