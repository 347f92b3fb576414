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

from ..util import broadcast_get, read_parquet_clean, sorted_lookup

_PR_SCALE = 10**12
PR_ITERS = 2
PR_TOP_K = 20


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


#: size gate for the orders-side broadcast: below this many bytes of
#: orders parquet the orderkey→custkey map rides a ``ray.put`` broadcast
#: (read INSIDE a Ray task, never on the driver); above it the edge
#: derivation hands off to a hash-shuffle ``Dataset.join`` — the same
#: broadcast-bound→shuffle-join handoff as ``relational.bigjoin``.
_ORDERS_BROADCAST_BYTES = 256 << 20


def _edge_partials(sf_dir: str,
                   broadcast_bytes: int = _ORDERS_BROADCAST_BYTES
                   ) -> "ray.data.Dataset":
    """Per-batch-distinct (custkey, partkey) edge partials.  NOT globally
    distinct — the caller dedups via the driver composite-unique below the
    threshold or one distributed groupby above it (Ray's groupby fixed
    overhead measured ~15 s on a 600k-row input vs milliseconds for the
    driver unique).

    Dual path on the orders side, gated on file bytes like
    ``relational._shuffle_partitions``: a small orders table becomes a
    sorted orderkey→custkey broadcast consulted inside the lineitem scan
    (built in a Ray TASK — no full-table read on the driver); a large one
    goes through a hash-shuffle ``Dataset.join`` on orderkey, so nothing
    is ever driver- or worker-resident at O(|orders|) beyond the gate."""
    opath = os.path.join(sf_dir, "orders.parquet")
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    if os.path.getsize(opath) <= broadcast_bytes:
        @ray.remote
        def load_orders(path: str):
            import pyarrow.parquet as _pq
            o = _pq.read_table(path, columns=["o_orderkey", "o_custkey"])
            ok = o["o_orderkey"].to_numpy().astype(np.int64)
            oc = o["o_custkey"].to_numpy().astype(np.int64)
            order = np.argsort(ok)
            return ok[order], oc[order]

        ref = load_orders.remote(opath)

        def to_edges(t: pa.Table) -> pa.Table:
            k, c = broadcast_get(ref)  # once per worker
            lk = t["l_orderkey"].to_numpy().astype(np.int64)
            hit, pos = sorted_lookup(k, lk)
            out = pa.table({"c": pa.array(c[pos[hit]]),
                            "p": pc.cast(t["l_partkey"], pa.int64())
                                 .take(pa.array(np.flatnonzero(hit)))})
            return out.group_by(["c", "p"]).aggregate([]) \
                      .rename_columns(["c", "p"])

        return li.map_batches(to_edges, batch_format="pyarrow",
                              batch_size=65536).materialize()

    # distributed branch: pre-reduce lineitem to per-batch-distinct
    # (orderkey, partkey) pairs, hash-shuffle join against pruned orders
    from ..pipelines.relational import _shuffle_partitions
    nparts = _shuffle_partitions(
        os.path.join(sf_dir, "lineitem.parquet"), opath)
    _LI = pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())])
    _O = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())])

    def li_distinct(t: pa.Table) -> pa.Table:
        return (t.select(["l_orderkey", "l_partkey"]).cast(_LI)
                .group_by(["l_orderkey", "l_partkey"]).aggregate([])
                .rename_columns(["l_orderkey", "l_partkey"]))

    li_d = li.map_batches(li_distinct, batch_format="pyarrow",
                          batch_size=65536)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: t.cast(_O), batch_format="pyarrow",
                     batch_size=65536)
    joined = li_d.join(orders, join_type="inner",
                       num_partitions=nparts,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def to_cp(t: pa.Table) -> pa.Table:
        out = pa.table({"c": pc.cast(t["o_custkey"], pa.int64()),
                        "p": pc.cast(t["l_partkey"], pa.int64())})
        return out.group_by(["c", "p"]).aggregate([]) \
                  .rename_columns(["c", "p"])

    return joined.map_batches(to_cp, batch_format="pyarrow",
                              batch_size=65536).materialize()


def _dedup_pairs_driver(parts: "ray.data.Dataset"):
    """Driver-branch edge dedup: composite-key ``np.unique`` (31-bit
    keys; pandas fallback for out-of-range ids)."""
    pdf = parts.to_pandas()
    c = pdf["c"].to_numpy().astype(np.int64)
    p = pdf["p"].to_numpy().astype(np.int64)
    if c.min() < 0 or p.min() < 0 or max(c.max(), p.max()) >= 1 << 31:
        comp = pd.DataFrame({"c": c, "p": p}).drop_duplicates()
        return comp["c"].to_numpy(), comp["p"].to_numpy()
    comp = np.unique((c << np.int64(31)) | p)
    return comp >> np.int64(31), comp & np.int64((1 << 31) - 1)


def _distinct_edges(parts: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed-branch edge dedup: one groupby, count column dropped
    before the materialize that iterations re-scan."""
    from ray.data.aggregate import Count
    return (parts.groupby(["c", "p"])
            .aggregate(Count(alias_name="_n"))
            .map_batches(lambda t: t.select(["c", "p"]),
                         batch_format="pyarrow", batch_size=65536)
            .materialize())


#: swap point between the driver-iterated branch (edge arrays collected
#: ONCE, per-iteration work is two bincounts — no per-pass Ray overhead)
#: and the distributed branch (one fused streaming pass per iteration)
_PR_DRIVER_EDGES = 20_000_000


def _pair_sums(edges: "ray.data.Dataset", cref, pref):
    """One fused streaming pass per iteration: per-batch int64-exact
    contribution partials for BOTH sides (c←p and p←c)."""

    def partial(t: pa.Table) -> pa.Table:
        cu, cvals = broadcast_get(cref)  # per worker,
        pu, pvals = broadcast_get(pref)  # not per 65k-row batch
        c = t["c"].to_numpy().astype(np.int64)
        p = t["p"].to_numpy().astype(np.int64)
        parts = []
        for kind, kcol, ocol, okeys, ovals in (
                ("c", c, p, pu, pvals), ("p", p, c, cu, cvals)):
            contrib = ovals[np.searchsorted(okeys, ocol)]
            ids, inv = np.unique(kcol, return_inverse=True)
            sums = np.zeros(len(ids), np.int64)
            np.add.at(sums, inv, contrib)
            parts.append(pa.table({
                "kind": pa.array([kind] * len(ids), pa.string()),
                "id": pa.array(ids), "s": pa.array(sums)}))
        return pa.concat_tables(parts)

    df = (edges.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536).to_pandas()
          .groupby(["kind", "id"], as_index=False)["s"].sum())
    return (df[df["kind"] == "c"].drop(columns="kind"),
            df[df["kind"] == "p"].drop(columns="kind"))


def pagerank_top(sf_dir: str, iters: int = PR_ITERS, k: int = PR_TOP_K,
                 driver_edges: int = _PR_DRIVER_EDGES,
                 broadcast_bytes: int = _ORDERS_BROADCAST_BYTES
                 ) -> pa.Table:
    """Top-k nodes of the bipartite order graph by fixed-point PageRank
    (see module docstring for the exact integer recurrence).  Output:
    (node_type 'c'|'p', node_id, rank) ordered by (rank desc, node_type,
    node_id).

    Dual path (the ``_colliding_rows`` pattern): below ``driver_edges``
    partial rows the per-batch-distinct pairs come to the driver ONCE,
    dedup is a composite-key ``np.unique`` and every iteration is two
    ``np.add.at`` scatters — Ray's groupby+streaming overhead measured
    ~15 s on a 600k-edge input vs well under a second of useful work;
    above it, a distributed groupby dedups the edges and one fused
    streaming pass runs each iteration.  Both branches run the
    identical integer recurrence and are parity-tested."""
    parts = _edge_partials(sf_dir, broadcast_bytes)
    n_rows = parts.count()
    if n_rows == 0:
        return pa.table({"node_type": pa.array([], pa.string()),
                         "node_id": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64())})
    edges = None
    ec = ep = None
    if n_rows <= driver_edges:
        c, p = _dedup_pairs_driver(parts)
        cu, ec = np.unique(c, return_inverse=True)
        pu, ep = np.unique(p, return_inverse=True)
        dc = np.bincount(ec, minlength=len(cu)).astype(np.int64)
        dp = np.bincount(ep, minlength=len(pu)).astype(np.int64)
    else:
        edges = _distinct_edges(parts)

        def deg_partial(t: pa.Table) -> pa.Table:
            outs = []
            for kind in ("c", "p"):
                ids, cnt = np.unique(t[kind].to_numpy().astype(np.int64),
                                     return_counts=True)
                outs.append(pa.table({
                    "kind": pa.array([kind] * len(ids), pa.string()),
                    "id": pa.array(ids),
                    "n": pa.array(cnt.astype(np.int64))}))
            return pa.concat_tables(outs)

        degs = (edges.map_batches(deg_partial, batch_format="pyarrow",
                                  batch_size=65536).to_pandas()
                .groupby(["kind", "id"], as_index=False)["n"].sum())
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
        if ec is not None:
            contrib_p = (rp // dp)[ep]
            contrib_c = (rc // dc)[ec]
            sc_sum = np.zeros(len(cu), np.int64)
            np.add.at(sc_sum, ec, contrib_p)
            sp_sum = np.zeros(len(pu), np.int64)
            np.add.at(sp_sum, ep, contrib_c)
            rc_n = base + (85 * sc_sum) // 100
            rp_n = base + (85 * sp_sum) // 100
        else:
            cref = ray.put((cu, rc // dc))
            pref = ray.put((pu, rp // dp))
            sc, sp = _pair_sums(edges, cref, pref)
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


CC_ROUNDS = 6
CC_TOP_K = 10


def components_top(sf_dir: str, rounds: int = CC_ROUNDS,
                   k: int = CC_TOP_K,
                   driver_edges: int = _PR_DRIVER_EDGES,
                   broadcast_bytes: int = _ORDERS_BROADCAST_BYTES
                   ) -> pa.Table:
    """Min-label propagation over the bipartite order graph: ``rounds``
    synchronous rounds of l' = min(l, min over neighbors), labels
    initialized to disjoint node ids (customer c → 2c, part p → 2p+1).
    After enough rounds this IS connected components; the op is DEFINED
    as exactly ``rounds`` rounds so the unrolled SQL oracle matches
    bit-for-bit whether or not the graph has converged (the at-scale
    contract: label propagation runs a fixed round budget per sweep).
    Output: top-k labels by member count, (label, n_nodes), ordered
    (n_nodes desc, label asc).

    Same dual path as :func:`pagerank_top`: driver scatters below the
    edge threshold, a fused per-round streaming pass above it."""
    parts = _edge_partials(sf_dir, broadcast_bytes)
    n_rows = parts.count()
    if n_rows == 0:
        return pa.table({"label": pa.array([], pa.int64()),
                         "n_nodes": pa.array([], pa.int64())})
    if n_rows <= driver_edges:
        c, p = _dedup_pairs_driver(parts)
        cu, ec = np.unique(c, return_inverse=True)
        pu, ep = np.unique(p, return_inverse=True)
        lc, lp = 2 * cu, 2 * pu + 1
        for _ in range(rounds):
            mc = np.full(len(cu), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mc, ec, lp[ep])
            mp = np.full(len(pu), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(mp, ep, lc[ec])
            lc, lp = np.minimum(lc, mc), np.minimum(lp, mp)
    else:
        edges = _distinct_edges(parts)

        def ids_partial(t: pa.Table) -> pa.Table:
            outs = []
            for kind in ("c", "p"):
                ids = np.unique(t[kind].to_numpy().astype(np.int64))
                outs.append(pa.table({
                    "kind": pa.array([kind] * len(ids), pa.string()),
                    "id": pa.array(ids)}))
            return pa.concat_tables(outs)

        nd = (edges.map_batches(ids_partial, batch_format="pyarrow",
                                batch_size=65536).to_pandas()
              .drop_duplicates(["kind", "id"]))
        cu = np.sort(nd[nd["kind"] == "c"]["id"].to_numpy()
                     .astype(np.int64))
        pu = np.sort(nd[nd["kind"] == "p"]["id"].to_numpy()
                     .astype(np.int64))
        lc, lp = 2 * cu, 2 * pu + 1
        for _ in range(rounds):
            cref = ray.put((cu, lc))
            pref = ray.put((pu, lp))

            def min_partial(t: pa.Table) -> pa.Table:
                ku, kl = broadcast_get(cref)
                qu, ql = broadcast_get(pref)
                c = t["c"].to_numpy().astype(np.int64)
                p = t["p"].to_numpy().astype(np.int64)
                outs = []
                for kind, kcol, olab in (
                        ("c", c, ql[np.searchsorted(qu, p)]),
                        ("p", p, kl[np.searchsorted(ku, c)])):
                    ids, inv = np.unique(kcol, return_inverse=True)
                    mn = np.full(len(ids), np.iinfo(np.int64).max,
                                 np.int64)
                    np.minimum.at(mn, inv, olab)
                    outs.append(pa.table({
                        "kind": pa.array([kind] * len(ids), pa.string()),
                        "id": pa.array(ids), "m": pa.array(mn)}))
                return pa.concat_tables(outs)

            mins = (edges.map_batches(min_partial, batch_format="pyarrow",
                                      batch_size=65536).to_pandas()
                    .groupby(["kind", "id"], as_index=False)["m"].min())
            mc = mins[mins["kind"] == "c"].sort_values("id")
            mp = mins[mins["kind"] == "p"].sort_values("id")
            lc_new = lc.copy()
            idx = np.searchsorted(cu, mc["id"].to_numpy().astype(np.int64))
            lc_new[idx] = np.minimum(lc_new[idx],
                                     mc["m"].to_numpy().astype(np.int64))
            lp_new = lp.copy()
            idx = np.searchsorted(pu, mp["id"].to_numpy().astype(np.int64))
            lp_new[idx] = np.minimum(lp_new[idx],
                                     mp["m"].to_numpy().astype(np.int64))
            lc, lp = lc_new, lp_new
    labels = np.concatenate([lc, lp])
    uniq, cnt = np.unique(labels, return_counts=True)
    order = np.lexsort((uniq, -cnt))[:k]
    return pa.table({"label": pa.array(uniq[order], pa.int64()),
                     "n_nodes": pa.array(cnt[order].astype(np.int64))})


def _cc_iter_sql(prev_c: str, prev_p: str, i: int) -> str:
    return f"""
mc{i} AS (
  SELECT e.c AS id, min({prev_p}.l) AS m
  FROM e JOIN {prev_p} ON {prev_p}.id = e.p GROUP BY e.c),
lc{i} AS (
  SELECT {prev_c}.id, least({prev_c}.l, coalesce(mc{i}.m, {prev_c}.l)) AS l
  FROM {prev_c} LEFT JOIN mc{i} ON mc{i}.id = {prev_c}.id),
mp{i} AS (
  SELECT e.p AS id, min({prev_c}.l) AS m
  FROM e JOIN {prev_c} ON {prev_c}.id = e.c GROUP BY e.p),
lp{i} AS (
  SELECT {prev_p}.id, least({prev_p}.l, coalesce(mp{i}.m, {prev_p}.l)) AS l
  FROM {prev_p} LEFT JOIN mp{i} ON mp{i}.id = {prev_p}.id)""".strip()


def components_sql(rounds: int = CC_ROUNDS, k: int = CC_TOP_K) -> str:
    body = []
    prev_c, prev_p = "l0c", "l0p"
    for i in range(1, rounds + 1):
        body.append(_cc_iter_sql(prev_c, prev_p, i))
        prev_c, prev_p = f"lc{i}", f"lp{i}"
    chain = ",\n".join(body)
    return f"""
WITH e AS (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
l0c AS (SELECT DISTINCT c AS id, 2 * c AS l FROM e),
l0p AS (SELECT DISTINCT p AS id, 2 * p + 1 AS l FROM e),
{chain}
SELECT l::BIGINT AS label, count(*)::BIGINT AS n_nodes FROM (
  SELECT l FROM {prev_c} UNION ALL SELECT l FROM {prev_p})
GROUP BY l ORDER BY n_nodes DESC, label ASC LIMIT {k}
""".strip()


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


SQL = {"graph_pagerank_top": pagerank_sql(),
       "graph_components_top": components_sql()}
