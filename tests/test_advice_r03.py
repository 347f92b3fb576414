"""Regression tests for the round-3 ADVICE findings (null-source mixture
threshold, degenerate bigjoin empty side, siphon tenant path sanitization)."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.index.siphon import tenant_dirname, tenant_from_dirname
from miru_ray.ops.mixing import RATE_MILLIONTHS, _keep_mask


def test_keep_mask_null_source_uses_else_rate():
    """ADVICE r03 (low): a NULL source must get the SQL CASE ELSE rate
    (RATE_MILLIONTHS[-1]), not thr_u[-1] = whichever unique source happens
    to factorize last in the batch."""
    ids = np.arange(8, dtype=np.int64)
    # mixed batch: null rows interleaved with two real sources — the null
    # threshold must be independent of which source comes last
    for order in (["a", None, "b", None, "a", "b", None, "a"],
                  ["b", None, "a", None, "b", "a", None, "b"]):
        src = pd.Series(order, dtype=object)
        _, thr = _keep_mask(ids, src)
        null_rows = [i for i, s in enumerate(order) if s is None]
        assert all(thr[i] == RATE_MILLIONTHS[-1] for i in null_rows)
    # all-null batch (factorize yields ZERO uniques — must not index [])
    _, thr = _keep_mask(ids[:3], pd.Series([None, None, None], dtype=object))
    assert (thr == RATE_MILLIONTHS[-1]).all()


def test_bigjoin_all_right_side_filtered_returns_empty(tmp_path):
    """ADVICE r03 (low): when every order is filtered out (no status 'F'),
    the join must return the typed empty table — detected by counting the
    lazy side, not by parsing Ray's exception text."""
    from miru_ray.pipelines.relational import bigjoin_top_customers
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2], pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0, 30.0]),
        "l_discount": pa.array([0.0, 0.1, 0.05])}),
        os.path.join(d, "lineitem.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], pa.int64()),
        "o_custkey": pa.array([7, 8], pa.int64()),
        "o_orderstatus": pa.array(["O", "P"])}),
        os.path.join(d, "orders.parquet"))
    out = bigjoin_top_customers(d)
    assert out.num_rows == 0
    assert out.column_names == ["o_custkey", "revenue", "n_items"]


def test_tenant_dirname_sanitizes_path_hazards():
    """ADVICE r03 (low): plugin-supplied tenant values containing '/',
    '..', '=' or '\\' must stay inside out_root and roundtrip exactly."""
    for evil in ("../escape", "a/b", "x=y", "..", "a\\b", "", "t p",
                 "tenant=fake", "ünïcode", "a%2Fb"):
        d = tenant_dirname(evil)
        assert d.startswith("tenant=")
        assert "/" not in d and "\\" not in d
        assert ".." not in d
        assert os.path.basename(d) == d          # no separators survive
        assert d.count("=") == 1                 # split('=', 1) stays exact
        assert tenant_from_dirname(d) == evil    # lossless roundtrip


def test_run_siphon_with_hostile_tenants_stays_in_out_root(xs_index,
                                                           tmp_path):
    """End-to-end: a plugin routing to hostile tenant names writes only
    under out_root, and counts are recoverable via tenant_from_dirname."""
    from miru_ray.index.siphon import SiphonPlugin, run_siphon

    class EvilTenants(SiphonPlugin):
        name = "evil"
        columns = ("conv_id",)

        def schema(self):
            return pa.schema([("doc_id", pa.int64())])

        def siphon(self, batch):
            live = batch.filter(pa.compute.invert(batch["tombstoned"]))
            n = live.num_rows
            tenants = ["../up" if i % 2 else "a/b=c" for i in range(n)]
            return pa.table({"tenant": pa.array(tenants, pa.string()),
                             "doc_id": live["doc_id"]})

    out_root = str(tmp_path / "out")
    res = run_siphon(xs_index, EvilTenants(), out_root)
    assert res.flushed > 0
    # nothing escaped: the only children of tmp_path are out_root itself
    assert sorted(os.listdir(tmp_path)) == ["out"]
    seen = set()
    total = 0
    for d in os.listdir(out_root):
        if not d.startswith("tenant="):
            continue
        p = os.path.join(out_root, d)
        assert os.path.isdir(p)
        seen.add(tenant_from_dirname(d))
        total += sum(pq.read_metadata(os.path.join(p, f)).num_rows
                     for f in os.listdir(p) if f.endswith(".parquet"))
    assert seen == {"../up", "a/b=c"}
    assert total == res.flushed
