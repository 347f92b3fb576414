"""Relational pipelines over the TPC-H-ish testdata — the generic
data-processing surface (grouped aggregates, broadcast joins, multi-hop
self-joins) expressed Ray-Data-first.

- :func:`pricing_summary` — classic wide aggregate with per-batch partial
  combine before the groupby shuffle.
- :func:`revenue_by_nation` — broadcast hash join: the small dimension side
  (customer⋈nation) is ``ray.put`` once and joined inside ``map_batches``
  (the §2.5 "broadcast small sides" rule), then a tiny groupby.
- :func:`collaborative_filtering` — the reference's 3-hop reco self-join
  (``miru-reco-plugins/.../CollaborativeFiltering.java:59-233``: my docs →
  other users touching them → their docs, counted, minus mine) re-expressed
  over orders/lineitem: parts my customer ordered → other customers ordering
  those parts (weighted) → their other parts, scored by contributor weight.
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
from ray.data.aggregate import Sum


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, f"{name}.parquet"),
                                 columns=columns)


def pricing_summary(sf_dir: str) -> pa.Table:
    """TPC-H Q1-shaped pricing summary (cutoff 1998-09-02).

    All money math is integer-scaled (cents / basis points) so sums are
    EXACT and independent of float reduce order across workers — the only
    way a distributed sum can hash-match a serial SQL oracle."""
    ds = _t(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity",
                                 "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pa.scalar(np.datetime64("1998-09-02", "us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qty = pc.cast(pc.round(t["l_quantity"]), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        d100 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        disc_e4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()), d100))
        t2 = pa.table({"l_returnflag": t["l_returnflag"],
                       "l_linestatus": t["l_linestatus"],
                       "qty": qty, "cents": cents, "d100": d100,
                       "disc_e4": disc_e4})
        g = t2.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("cents", "sum"), ("disc_e4", "sum"),
             ("d100", "sum"), ("qty", "count", pc.CountOptions(mode="all"))])
        # name-based selection: pyarrow's key-vs-aggregate column ORDER has
        # changed across versions, so positional renames are a trap
        return pa.table({"l_returnflag": g["l_returnflag"],
                         "l_linestatus": g["l_linestatus"],
                         "sq": g["qty_sum"], "sc": g["cents_sum"],
                         "sd4": g["disc_e4_sum"], "sd100": g["d100_sum"],
                         "cnt": g["qty_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sq", alias_name="sq"),
        Sum("sc", alias_name="sc"),
        Sum("sd4", alias_name="sd4"),
        Sum("sd100", alias_name="sd100"),
        Sum("cnt", alias_name="count_order")).to_pandas()
    out["sum_qty"] = out["sq"].astype(np.int64)
    out["sum_base_price"] = (out["sc"] / 100.0).round(2)
    out["sum_disc_price"] = (out["sd4"] / 10000.0).round(4)
    out["avg_qty"] = (out["sq"] / out["count_order"]).round(6)
    out["avg_price"] = (out["sc"] / 100.0 / out["count_order"]).round(6)
    out["avg_disc"] = (out["sd100"] / 100.0 / out["count_order"]).round(6)
    out = out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
               "sum_disc_price", "count_order", "avg_qty", "avg_price",
               "avg_disc"]]
    out = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def revenue_by_nation(sf_dir: str) -> pa.Table:
    """Revenue per customer nation: orders⋈customer⋈nation via a broadcast
    join, then a grouped sum.

    The broadcast side is (sorted custkey int64 array, nation-ID int8
    array) — Arrow/NumPy-native and ~9 bytes/customer, read zero-copy from
    the object store by every task with an ``np.searchsorted`` probe (the
    ``AssignDocIds`` pattern).  Size bound: a broadcast join is right while
    that pair fits comfortably in worker heap (≈1 GB per 10^8 customers);
    beyond it, hash-partition both sides on custkey instead."""
    import pyarrow.parquet as pq
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    n_keys = nation["n_nationkey"].to_numpy()
    n_names = np.asarray(nation["n_name"].to_pandas(), dtype=object)
    n_order = np.argsort(n_keys)  # align names with the sorted key array —
    #                               parquet row order is NOT guaranteed
    hit, pos = sorted_lookup(n_keys[n_order],
                             cust["c_nationkey"].to_numpy())
    if not hit.all():
        # an unguarded searchsorted would IndexError past the max key
        # and silently misattribute in-range misses — a broken nation
        # FK is corrupt input, fail loudly
        raise ValueError("customer.c_nationkey not found in nation")
    n_of_cust = n_names[n_order][pos]
    ckeys = cust["c_custkey"].to_numpy().astype(np.int64)
    order = np.argsort(ckeys)
    # nation strings dictionary-encoded: broadcast carries an int8 code per
    # customer plus the 25-entry name table
    codes = pd.Categorical(n_of_cust[order])
    ref = ray.put((ckeys[order], codes.codes.astype(np.int8),
                   np.asarray(codes.categories, dtype=object)))

    class JoinNation:
        def __init__(self):
            # the closure-captured ObjectRef is DRIVER-owned: it lives
            # exactly as long as the query, so an actor restart can
            # always re-fetch it (Ray's constructor-args-in-object-store
            # warning covers refs that can outlive their owner)
            self.ckeys, self.codes, self.names = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            cust_k = b["o_custkey"].to_numpy()
            # inner-join semantics via the shared empty-key-safe probe:
            # orders whose custkey is missing from customer are DROPPED
            # (matches the SQL oracle's JOIN), and a ZERO-row customer
            # table yields an empty result instead of indexing into an
            # empty key array
            hit, pos = sorted_lookup(self.ckeys, cust_k)
            code = self.codes[pos[hit]]
            cents = np.round(
                b["o_totalprice"].to_numpy()[hit] * 100.0).astype(np.int64)
            sums = np.bincount(code, weights=cents,
                               minlength=len(self.names)).astype(np.int64)
            cnts = np.bincount(code, minlength=len(self.names))
            nz = np.flatnonzero(cnts)
            return pa.table({
                "n_name": pa.array(self.names[nz], pa.string()),
                "cents": pa.array(sums[nz]),
                "cnt": pa.array(cnts[nz].astype(np.int64))})

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(JoinNation, batch_format="pyarrow",
                                  batch_size=65536, concurrency=(1, 4))
    out = partials.groupby("n_name").aggregate(
        Sum("cents", alias_name="cents"),
        Sum("cnt", alias_name="n_orders")).to_pandas()
    if "cents" not in out.columns:  # no order joined any customer —
        #  Ray's all-empty stream loses column names
        out = pd.DataFrame({"n_name": np.array([], object),
                            "cents": np.array([], np.int64),
                            "n_orders": np.array([], np.int64)})
    out["revenue"] = (out["cents"] / 100.0).round(2)
    out = out[["n_name", "revenue", "n_orders"]]
    out = out.sort_values("n_name").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _shuffle_partitions(*paths: str, target_bytes: int = 128 << 20,
                        lo: int = 8, hi: int = 512) -> int:
    """Size a hash-shuffle partition count from input bytes (~128 MB of
    input per partition).  Each partition is one ``HashShuffleAggregator``
    actor — a fixed startup cost — so small inputs must NOT pay for a
    cluster-scale fan-out (32 idle aggregators ≈ +2 s measured at sf0.1),
    while 100-TB inputs need the ``hi`` cap lifted to ~input blocks."""
    total = 0
    for p in paths:
        if os.path.isdir(p):
            for root, _, files in os.walk(p):
                total += sum(os.path.getsize(os.path.join(root, f))
                             for f in files)
        elif os.path.exists(p):
            total += os.path.getsize(p)
    return max(lo, min(hi, -(-total // target_bytes)))


def bigjoin_top_customers(sf_dir: str, k: int = 10,
                          num_partitions: int | None = None) -> pa.Table:
    """Top-k customers by finished-order revenue via a **large×large
    hash-shuffle join** — lineitem ⋈ orders on orderkey with NO broadcast
    side (``Dataset.join`` hash-partitions BOTH inputs on the key), the
    join shape ``revenue_by_nation``'s broadcast bound hands off to at
    scale (its docstring names this fallback).

    Scale shape: lineitem is combiner-reduced per ``l_orderkey`` inside
    ``map_batches`` BEFORE the shuffle (one partial row per order per
    batch), so the all-to-all moves ~|orders| rows, not ~|lineitem|;
    orders is column-pruned and row-filtered at the read.  Money math is
    integer basis points (cents × (100−d100)) so the distributed sum is
    reduce-order-exact against the serial SQL oracle.  ``num_partitions``
    defaults to ~1 per 128 MB of input (see :func:`_shuffle_partitions`);
    at cluster scale that grows to ≈ input blocks automatically.
    """
    if num_partitions is None:
        num_partitions = _shuffle_partitions(
            os.path.join(sf_dir, "lineitem.parquet"),
            os.path.join(sf_dir, "orders.parquet"))
    li = _t(sf_dir, "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], 100.0)),
                        pa.int64())
        d100 = pc.cast(pc.round(pc.multiply(t["l_discount"], 100.0)),
                       pa.int64())
        rev_e4 = pc.multiply(cents, pc.subtract(pa.scalar(100, pa.int64()),
                                                d100))
        t2 = pa.table({"l_orderkey": t["l_orderkey"], "rev_e4": rev_e4})
        g = t2.group_by("l_orderkey").aggregate(
            [("rev_e4", "sum"), ("rev_e4", "count")])
        # name-based selection: pyarrow's key-vs-aggregate column ORDER has
        # changed across versions, so positional renames are a trap
        return pa.table({"l_orderkey": g["l_orderkey"],
                         "rev_e4": g["rev_e4_sum"],
                         "n_items": g["rev_e4_count"]})

    li_part = li.map_batches(li_partial, batch_format="pyarrow",
                             batch_size=65536)
    orders = _t(sf_dir, "orders",
                ["o_orderkey", "o_custkey", "o_orderstatus"])

    _O_SCHEMA = pa.schema([("o_orderkey", pa.int64()),
                           ("o_custkey", pa.int64())])

    def o_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["o_orderstatus"], "F")) \
                .select(["o_orderkey", "o_custkey"]).cast(_O_SCHEMA)

    o_f = orders.map_batches(o_filter, batch_format="pyarrow",
                             batch_size=65536)
    joined = li_part.join(o_f, join_type="inner",
                          num_partitions=num_partitions,
                          on=("l_orderkey",), right_on=("o_orderkey",))

    def cust_partial(t: pa.Table) -> pa.Table:
        g = t.select(["o_custkey", "rev_e4", "n_items"]) \
             .group_by("o_custkey").aggregate(
                 [("rev_e4", "sum"), ("n_items", "sum")])
        return pa.table({"o_custkey": g["o_custkey"],
                         "rev_e4": g["rev_e4_sum"],
                         "n_items": g["n_items_sum"]})

    partials = joined.map_batches(cust_partial, batch_format="pyarrow",
                                  batch_size=65536)
    # top-k on the exact integer key (rounded `revenue` can tie where
    # rev_e4 differs — sorting the rounded float would tie-break wrong).
    # Dual path for the final per-customer reduce: the partials are already
    # per-batch combined (≤ one row per customer per partition), so below
    # the shuffle-worthy size the driver merges them directly (measured
    # 0.07 s vs 2 s for groupby+sort+limit at sf0.1 — Ray's all-to-all
    # fixed cost dwarfs the work); above it, a distributed groupby + sort
    # keeps the reduce off the driver.
    _empty = pa.table({"o_custkey": pa.array([], pa.int64()),
                       "revenue": pa.array([], pa.float64()),
                       "n_items": pa.array([], pa.int64())})
    try:
        if num_partitions <= 16:
            pdf = partials.to_pandas()
            if pdf.empty:  # successful join, zero matches
                return _empty
            agg = pdf.groupby("o_custkey",
                              as_index=False)[["rev_e4", "n_items"]].sum()
            top = agg.sort_values(["rev_e4", "o_custkey"],
                                  ascending=[False, True]).head(k) \
                     .reset_index(drop=True)
        else:
            per_cust = partials.groupby("o_custkey").aggregate(
                Sum("rev_e4", alias_name="rev_e4"),
                Sum("n_items", alias_name="n_items"))
            top = per_cust.sort(["rev_e4", "o_custkey"],
                                descending=[True, False]).limit(k) \
                          .to_pandas()
            if top.empty:
                return _empty
    except Exception:  # Ray's hash join cannot reconstruct the key schema
        #  when EVERY block on one side is empty (all orders filtered).
        #  Confirm the degenerate case by COUNTING the lazy sides (re-runs
        #  the pruned filter scans — rare error path only) rather than
        #  parsing exception text, which breaks across Ray versions and
        #  would swallow unrelated errors.
        if o_f.count() == 0 or li_part.count() == 0:
            return _empty
        raise
    top["revenue"] = (top["rev_e4"] / 10000.0).round(2)
    top["n_items"] = top["n_items"].astype(np.int64)
    out = top[["o_custkey", "revenue", "n_items"]].reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _isin_sorted(values: np.ndarray, sorted_keys: np.ndarray) -> np.ndarray:
    """Vectorized membership against a broadcast SORTED key array
    (thin view over util.sorted_lookup — the ONE probe definition)."""
    return sorted_lookup(sorted_keys, values)[0]


def _semi_join_keys(ds: "ray.data.Dataset", col: str, keys_ref,
                    out_cols: list[str]) -> "ray.data.Dataset":
    """Distributed semi-join: keep rows whose ``col`` hits the broadcast
    sorted key array; per-batch distinct on ``out_cols``."""

    def f(t: pa.Table) -> pa.Table:
        keys = broadcast_get(keys_ref)  # per-worker cache, not per batch
        hit = _isin_sorted(t[col].to_numpy(), keys)
        sub = t.filter(pa.array(hit)).select(out_cols)
        return sub.group_by(out_cols).aggregate([]).select(out_cols)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


#: size gate for hop 2's (orderkey, partkey)→custkey resolution: below
#: this many bytes of lineitem+orders parquet the touched-pair merge runs
#: on the driver (milliseconds at test scale); above it the weights come
#: from :func:`_cf_weights_shuffle` — a distributed distinct-pair
#: aggregate where only the top-``max_contributors`` (weight, custkey)
#: rows ever reach the driver.  Same broadcast-bound→shuffle handoff as
#: ``graph._edge_partials`` / ``bigjoin_top_customers``.
_CF_SHUFFLE_BYTES = 256 << 20


def _cf_weights_shuffle(sf_dir: str, mine_ref, custkey: int,
                        max_contributors: int) -> pd.Series:
    """Hop-2 contributor weights, fully distributed: lineitems touching
    my parts → hash-shuffle join with orders on orderkey → per-batch
    distinct (custkey, partkey) partials → ONE groupby(custkey) counting
    distinct shared parts → distributed sort + limit.  The driver sees
    exactly ``max_contributors`` (custkey, weight) rows — never the
    touched-pair set (O(orders) when one of my parts is a corpus-wide
    best-seller, the reference's MinMaxPriorityQueue case,
    ``CollaborativeFiltering.java:59-233``)."""
    nparts = _shuffle_partitions(
        os.path.join(sf_dir, "lineitem.parquet"),
        os.path.join(sf_dir, "orders.parquet"))
    _LI = pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64())])
    _O = pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())])

    def touch_distinct(t: pa.Table) -> pa.Table:
        mine = broadcast_get(mine_ref)
        hit = _isin_sorted(t["l_partkey"].to_numpy(), mine)
        sub = t.filter(pa.array(hit)) \
            .select(["l_orderkey", "l_partkey"]).cast(_LI)
        return sub.group_by(["l_orderkey", "l_partkey"]).aggregate([]) \
            .rename_columns(["l_orderkey", "l_partkey"])

    li_d = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]) \
        .map_batches(touch_distinct, batch_format="pyarrow",
                     batch_size=65536)
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"]) \
        .map_batches(lambda t: t.cast(_O), batch_format="pyarrow",
                     batch_size=65536)
    joined = li_d.join(orders, join_type="inner", num_partitions=nparts,
                       on=("l_orderkey",), right_on=("o_orderkey",))

    def to_cp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["o_custkey"], custkey))
        out = pa.table({"o_custkey": pc.cast(t["o_custkey"], pa.int64()),
                        "l_partkey": pc.cast(t["l_partkey"], pa.int64())})
        return out.group_by(["o_custkey", "l_partkey"]).aggregate([]) \
            .rename_columns(["o_custkey", "l_partkey"])

    pairs = joined.map_batches(to_cp, batch_format="pyarrow",
                               batch_size=65536)

    def wcount(g: pd.DataFrame) -> pd.DataFrame:
        # partials may repeat a pair across batches — nunique dedups
        return pd.DataFrame({
            "o_custkey": [int(g["o_custkey"].iloc[0])],
            "w": [int(g["l_partkey"].nunique())]})

    wds = pairs.groupby("o_custkey").map_groups(wcount,
                                                batch_format="pandas")
    try:
        top = (wds.sort(["w", "o_custkey"], descending=[True, False])
               .limit(max_contributors).to_pandas())
    except Exception:  # same degenerate case bigjoin_top_customers
        #  guards: Ray's hash join cannot reconstruct the key schema
        #  when EVERY block on one side is empty (a customer with no
        #  parts, or an empty orders table).  Confirm by counting the
        #  lazy side — rare error path only — instead of parsing
        #  version-dependent exception text.
        if li_d.count() == 0 or orders.count() == 0:
            return pd.Series(dtype=np.int64, name="w").rename_axis(
                "o_custkey")
        raise
    if top.empty or "o_custkey" not in top.columns:
        return pd.Series(dtype=np.int64, name="w").rename_axis(
            "o_custkey")
    return top.set_index("o_custkey")["w"].astype(np.int64)


def collaborative_filtering(sf_dir: str, custkey: int = 1,
                            k: int = 10,
                            max_contributors: int = 10_000,
                            shuffle_threshold_bytes: int = _CF_SHUFFLE_BYTES
                            ) -> pa.Table:
    """3-hop reco: parts my customer ordered → other customers who ordered
    those parts (contribution weight = #shared DISTINCT parts) → their
    OTHER parts scored by Σ contributor weight; minus parts I already
    ordered; top-k by (score desc, p_partkey asc).

    ``max_contributors`` bounds the hop-3 neighborhood the way the
    reference bounds it with a contributor heap
    (``CollaborativeFiltering.java:59-233``, ``MinMaxPriorityQueue``):
    only the top-K contributors by (weight desc, custkey asc) feed hop 3,
    so the ``c_orders``/``theirs`` driver merges are explicitly K-bounded
    even when one of my parts is a corpus-wide best-seller.  With the cap
    ≥ the true contributor count the answer is exact (the oracle's case).

    Shape mirrors ``CollaborativeFiltering.java:59-233``: every broadcast
    is MY neighborhood (my orders → my parts → orders touching my parts →
    contributor weights → contributors' orders), each bounded like the
    reference's termCount-capped term sets — never a full-table dict.  The
    heavy passes are pruned-column lineitem scans with per-batch distinct
    partials; the driver merges only those neighborhood-bounded partials
    (the reference's driver-side answer-merge shape).  Hop 2 — the one
    merge NOT bounded by my own neighborhood (the touched-pair set is
    O(orders) when a part of mine is a corpus-wide best-seller) — is
    size-gated: past ``shuffle_threshold_bytes`` of input it runs as the
    distributed aggregate in :func:`_cf_weights_shuffle` and the driver
    only ever receives the capped contributor rows.
    """
    def li():
        return _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    # hop 0+1: my orders → my distinct parts (one orders scan + one
    # lineitem scan; both results are one customer's neighborhood — tiny)
    my_orders = np.unique(
        orders.map_batches(
            lambda t: t.filter(pc.equal(t["o_custkey"], custkey))
            .select(["o_orderkey"]),
            batch_format="pyarrow", batch_size=65536)
        .to_pandas()["o_orderkey"].to_numpy()).astype(np.int64)
    my_orders_ref = ray.put(my_orders)
    mine = np.unique(
        _semi_join_keys(li(), "l_orderkey", my_orders_ref, ["l_partkey"])
        .to_pandas()["l_partkey"].to_numpy()).astype(np.int64)
    mine_ref = ray.put(mine)

    # hop 2: lineitems touching my parts → distinct (orderkey, partkey)
    # → (custkey, partkey) → weight = distinct shared parts per customer,
    # capped to the top-``max_contributors`` by (weight desc, custkey asc)
    # — the reference's MinMaxPriorityQueue bound.  Size-gated: big inputs
    # go through the distributed aggregate (the driver sees only the
    # capped contributor rows), small ones keep the driver merge.
    input_bytes = sum(
        os.path.getsize(os.path.join(sf_dir, f"{t}.parquet"))
        for t in ("lineitem", "orders")
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")))
    if input_bytes > shuffle_threshold_bytes:
        weight = _cf_weights_shuffle(sf_dir, mine_ref, custkey,
                                     max_contributors)
    else:
        touch = (_semi_join_keys(li(), "l_partkey", mine_ref,
                                 ["l_orderkey", "l_partkey"])
                 .to_pandas().drop_duplicates())
        touch_orders = np.unique(
            touch["l_orderkey"].to_numpy()).astype(np.int64)
        o2c = _semi_join_keys(orders, "o_orderkey", ray.put(touch_orders),
                              ["o_orderkey", "o_custkey"]).to_pandas()
        shared = (touch.merge(o2c, left_on="l_orderkey",
                              right_on="o_orderkey")
                  [["o_custkey", "l_partkey"]].drop_duplicates())
        shared = shared[shared["o_custkey"] != custkey]
        weight = shared.groupby("o_custkey").size()
        if len(weight) > max_contributors:
            weight = (weight.reset_index(name="w")
                      .sort_values(["w", "o_custkey"],
                                   ascending=[False, True])
                      .head(max_contributors)
                      .set_index("o_custkey")["w"])

    # hop 3: contributors' orders → their OTHER parts (distinct), scored
    # by Σ contributor weight
    contrib = np.sort(weight.index.to_numpy().astype(np.int64))
    c_orders = _semi_join_keys(orders, "o_custkey", ray.put(contrib),
                               ["o_orderkey", "o_custkey"]).to_pandas()
    ck = c_orders["o_orderkey"].to_numpy()
    corder = np.argsort(ck)
    co_ref = ray.put((ck[corder], c_orders["o_custkey"].to_numpy()[corder]))

    def their_parts(t: pa.Table) -> pa.Table:
        ok_keys, ok_cust = broadcast_get(co_ref)
        parts_mine = broadcast_get(mine_ref)
        hit = _isin_sorted(t["l_orderkey"].to_numpy(), ok_keys) \
            & ~_isin_sorted(t["l_partkey"].to_numpy(), parts_mine)
        sub = t.filter(pa.array(hit))
        pos = np.searchsorted(ok_keys, sub["l_orderkey"].to_numpy())
        out = pa.table({"custkey": pa.array(ok_cust[pos]),
                        "l_partkey": sub["l_partkey"]})
        return out.group_by(["custkey", "l_partkey"]).aggregate([]) \
            .select(["custkey", "l_partkey"])

    theirs = (li().map_batches(their_parts, batch_format="pyarrow",
                               batch_size=65536)
              .to_pandas().drop_duplicates())  # contributors' catalog only
    theirs["w"] = theirs["custkey"].map(weight).astype(np.int64)
    score = (theirs.groupby("l_partkey", as_index=False)["w"].sum()
             .rename(columns={"l_partkey": "p_partkey", "w": "score"}))
    score = score.sort_values(["score", "p_partkey"],
                              ascending=[False, True]).head(k)
    score["score"] = score["score"].astype(np.int64)
    score["p_partkey"] = score["p_partkey"].astype(np.int64)
    return pa.Table.from_pandas(score.reset_index(drop=True),
                                preserve_index=False)


SQL = {
    # integer-scaled (cents / basis points) so the serial SQL sum matches
    # the engine's distributed sum bit-exactly
    "rel_pricing_summary": """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round_even(l_quantity, 0) AS BIGINT) AS qty,
         CAST(round_even(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(round_even(l_discount * 100, 0) AS BIGINT) AS d100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
SELECT l_returnflag, l_linestatus,
       sum(qty)::BIGINT AS sum_qty,
       round_even(sum(cents) / 100.0, 2) AS sum_base_price,
       round_even(sum(cents * (100 - d100)) / 10000.0, 4) AS sum_disc_price,
       count(*)::BIGINT AS count_order,
       round_even(sum(qty) * 1.0 / count(*), 6) AS avg_qty,
       round_even(sum(cents) / 100.0 / count(*), 6) AS avg_price,
       round_even(sum(d100) / 100.0 / count(*), 6) AS avg_disc
FROM li GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip(),
    "rel_revenue_by_nation": """
SELECT n.n_name,
       round_even(sum(CAST(round_even(o.o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
""".strip(),
    "rel_bigjoin_top_customers": """
WITH li AS (
  SELECT l_orderkey,
         CAST(round_even(l_extendedprice * 100, 0) AS BIGINT)
         * (100 - CAST(round_even(l_discount * 100, 0) AS BIGINT)) AS rev_e4
  FROM lineitem)
SELECT o.o_custkey,
       round_even(sum(li.rev_e4) / 10000.0, 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
WHERE o.o_orderstatus = 'F'
GROUP BY o.o_custkey
ORDER BY sum(li.rev_e4) DESC, o.o_custkey ASC LIMIT 10
""".strip(),
    "rel_collaborative_filtering": """
WITH cp AS (
  SELECT DISTINCT o.o_custkey AS custkey, l.l_partkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
mine AS (SELECT l_partkey FROM cp WHERE custkey = 1),
sharers AS (
  SELECT cp.custkey, count(*) AS w
  FROM cp JOIN mine USING (l_partkey)
  WHERE cp.custkey <> 1 GROUP BY cp.custkey),
theirs AS (
  SELECT cp.l_partkey, s.w FROM cp JOIN sharers s ON cp.custkey = s.custkey
  WHERE cp.l_partkey NOT IN (SELECT l_partkey FROM mine))
SELECT l_partkey AS p_partkey, sum(w)::BIGINT AS score
FROM theirs GROUP BY l_partkey
ORDER BY score DESC, p_partkey ASC LIMIT 10
""".strip(),
}
