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
from ray.data.aggregate import Count, Mean, Sum


def _t(sf_dir: str, name: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{name}.parquet"),
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
             ("d100", "sum"), ("qty", "count")])
        return g.rename_columns(["l_returnflag", "l_linestatus", "sq", "sc",
                                 "sd4", "sd100", "cnt"])

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
    dict (dimension side is tiny), then a grouped sum."""
    import pyarrow.parquet as pq
    cust = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                           columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nation["n_nationkey"].to_numpy(),
                    nation["n_name"].to_pylist()))
    cust_nation = {int(c): nmap[int(n)] for c, n in
                   zip(cust["c_custkey"].to_numpy(),
                       cust["c_nationkey"].to_numpy())}
    ref = ray.put(cust_nation)

    class JoinNation:
        def __init__(self):
            self.map = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["n_name"] = b["o_custkey"].map(self.map)
            b["cents"] = np.round(b["o_totalprice"] * 100.0).astype(np.int64)
            g = b.groupby("n_name", as_index=False)["cents"].sum()
            g["cnt"] = b.groupby("n_name").size().values
            return g

    orders = _t(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    partials = orders.map_batches(JoinNation, batch_format="pandas",
                                  batch_size=65536, concurrency=(1, 4))
    out = partials.groupby("n_name").aggregate(
        Sum("cents", alias_name="cents"),
        Sum("cnt", alias_name="n_orders")).to_pandas()
    out["revenue"] = (out["cents"] / 100.0).round(2)
    out = out[["n_name", "revenue", "n_orders"]]
    out = out.sort_values("n_name").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def collaborative_filtering(sf_dir: str, custkey: int = 1,
                            k: int = 10) -> pa.Table:
    """3-hop reco: parts my customer ordered → other customers who ordered
    those parts (contribution weight = #shared parts) → their OTHER parts
    scored by Σ contributor weight; minus parts I already ordered; top-k by
    (score desc, p_partkey asc).

    Shape mirrors CollaborativeFiltering.java: hop 1/3 are semi-joins with a
    broadcast key set; hop 2 is a grouped count — no large shuffle."""
    li = _t(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
    orders = _t(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    # order → customer map is small at test scale; broadcast it
    omap_df = orders.to_pandas()
    o2c = dict(zip(omap_df["o_orderkey"], omap_df["o_custkey"]))
    ref = ray.put(o2c)

    class AddCust:
        def __init__(self):
            self.o2c = ray.get(ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["custkey"] = b["l_orderkey"].map(self.o2c)
            return b[["custkey", "l_partkey"]].drop_duplicates()

    cust_part = li.map_batches(AddCust, batch_format="pandas",
                               batch_size=65536, concurrency=(1, 4))
    cp = cust_part.to_pandas().drop_duplicates()  # distinct (customer, part)

    mine = set(cp[cp["custkey"] == custkey]["l_partkey"])
    # hop 2: contributors = customers sharing ≥1 of my parts, weighted
    sharers = cp[cp["l_partkey"].isin(mine) & (cp["custkey"] != custkey)]
    weight = sharers.groupby("custkey").size()  # shared-part count
    # hop 3: contributors' other parts, scored by contributor weight
    theirs = cp[cp["custkey"].isin(weight.index) & ~cp["l_partkey"].isin(mine)]
    score = (theirs.assign(w=theirs["custkey"].map(weight))
             .groupby("l_partkey")["w"].sum().reset_index()
             .rename(columns={"l_partkey": "p_partkey", "w": "score"}))
    score = score.sort_values(["score", "p_partkey"],
                              ascending=[False, True]).head(k)
    score["score"] = score["score"].astype(np.int64)
    return pa.Table.from_pandas(score.reset_index(drop=True),
                                preserve_index=False)


SQL = {
    # integer-scaled (cents / basis points) so the serial SQL sum matches
    # the engine's distributed sum bit-exactly
    "rel_pricing_summary": """
WITH li AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
         CAST(round(l_discount * 100) AS BIGINT) AS d100
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02')
SELECT l_returnflag, l_linestatus,
       sum(qty)::BIGINT AS sum_qty,
       round(sum(cents) / 100.0, 2) AS sum_base_price,
       round(sum(cents * (100 - d100)) / 10000.0, 4) AS sum_disc_price,
       count(*)::BIGINT AS count_order,
       round(sum(qty) * 1.0 / count(*), 6) AS avg_qty,
       round(sum(cents) / 100.0 / count(*), 6) AS avg_price,
       round(sum(d100) / 100.0 / count(*), 6) AS avg_disc
FROM li GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""".strip(),
    "rel_revenue_by_nation": """
SELECT n.n_name,
       round(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) / 100.0, 2) AS revenue,
       count(*)::BIGINT AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name ORDER BY n.n_name
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
