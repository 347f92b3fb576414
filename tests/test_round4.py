"""Round-4 tests: collaborative-filtering contributor cap, distributed
graph edge derivation, and the other VERDICT r03 asks."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def cf_dir(tmp_path):
    """Tiny orders/lineitem corpus where contributor weights differ:
    cust 1 (me) ordered parts {100, 101}; cust 2 shares both (weight 2,
    other parts {200}); cust 3 shares one (weight 1, other parts
    {400, 500})."""
    d = str(tmp_path / "sf")
    os.makedirs(d)
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 2, 3], pa.int64())}),
        os.path.join(d, "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2, 2, 3, 3, 3], pa.int64()),
        "l_partkey": pa.array([100, 101, 100, 101, 200, 100, 400, 500],
                              pa.int64())}),
        os.path.join(d, "lineitem.parquet"))
    return d


def test_collaborative_filtering_uncapped(cf_dir):
    from miru_ray.pipelines.relational import collaborative_filtering
    got = collaborative_filtering(cf_dir, custkey=1, k=10).to_pandas()
    # scores: part 200 ← cust2 weight 2; parts 400/500 ← cust3 weight 1
    assert list(got["p_partkey"]) == [200, 400, 500]
    assert list(got["score"]) == [2, 1, 1]


def test_collaborative_filtering_contributor_cap(cf_dir):
    """VERDICT r03 #1: with max_contributors=1 only the top contributor
    by (weight desc, custkey asc) — cust 2 — feeds hop 3, so cust 3's
    parts disappear and the hop-3 driver merges are explicitly 1-bounded."""
    from miru_ray.pipelines.relational import collaborative_filtering
    got = collaborative_filtering(
        cf_dir, custkey=1, k=10, max_contributors=1).to_pandas()
    assert list(got["p_partkey"]) == [200]
    assert list(got["score"]) == [2]


def test_graph_edges_distributed_branch_parity():
    """VERDICT r03 #2: with broadcast_bytes=0 the edge derivation routes
    through the hash-shuffle Dataset.join (no orders broadcast, no
    full-table read anywhere); results must be identical to the
    broadcast branch."""
    from miru_ray.ops.graph import components_top, pagerank_top
    sf = "/root/testdata/sf0.001"
    pr_b = pagerank_top(sf).to_pandas()
    pr_d = pagerank_top(sf, broadcast_bytes=0).to_pandas()
    assert pr_b.equals(pr_d)
    cc_b = components_top(sf).to_pandas()
    cc_d = components_top(sf, broadcast_bytes=0).to_pandas()
    assert cc_b.equals(cc_d)


def test_collaborative_filtering_cap_tiebreak(cf_dir):
    """Equal weights break ties by custkey asc: capping at 2 keeps cust 2
    (weight 2) and cust 3 (weight 1) — same as uncapped here — while a
    cap of 1 proved the bound above.  Add a 4th equal-weight contributor
    to exercise the tie."""
    from miru_ray.pipelines.relational import collaborative_filtering
    # append cust 4 sharing one part (weight 1, same as cust 3)
    li = pq.read_table(os.path.join(cf_dir, "lineitem.parquet"))
    extra = pa.table({"l_orderkey": pa.array([4, 4], pa.int64()),
                      "l_partkey": pa.array([101, 600], pa.int64())})
    pq.write_table(pa.concat_tables([li, extra]),
                   os.path.join(cf_dir, "lineitem.parquet"))
    od = pq.read_table(os.path.join(cf_dir, "orders.parquet"))
    extra_o = pa.table({"o_orderkey": pa.array([4], pa.int64()),
                        "o_custkey": pa.array([4], pa.int64())})
    pq.write_table(pa.concat_tables([od, extra_o]),
                   os.path.join(cf_dir, "orders.parquet"))
    got = collaborative_filtering(
        cf_dir, custkey=1, k=10, max_contributors=2).to_pandas()
    # kept: cust2 (w=2) + cust3 (w=1, lower custkey than cust4)
    assert list(got["p_partkey"]) == [200, 400, 500]
    assert list(got["score"]) == [2, 1, 1]
