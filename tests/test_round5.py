"""Round-5 tests: VERDICT r4 asks — the distributed collaborative-
filtering hop-2 weight path, and friends."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def cf_dir(tmp_path):
    """Same corpus shape as test_round4.cf_dir: cust 1 (me) ordered parts
    {100, 101}; cust 2 shares both (weight 2, other parts {200}); cust 3
    shares one (weight 1, other parts {400, 500})."""
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


def test_cf_distributed_branch_parity(cf_dir):
    """VERDICT r4 #3: with shuffle_threshold_bytes=0 hop 2 routes through
    _cf_weights_shuffle (hash-shuffle join + groupby; the driver receives
    only the capped contributor rows) and must match the driver-merge
    branch exactly."""
    from miru_ray.pipelines.relational import collaborative_filtering
    broadcast = collaborative_filtering(cf_dir, custkey=1, k=10)
    shuffled = collaborative_filtering(cf_dir, custkey=1, k=10,
                                       shuffle_threshold_bytes=0)
    assert broadcast.equals(shuffled)
    got = shuffled.to_pandas()
    assert list(got["p_partkey"]) == [200, 400, 500]
    assert list(got["score"]) == [2, 1, 1]


def test_cf_distributed_branch_respects_cap(cf_dir):
    """The contributor cap applies INSIDE the distributed aggregate
    (sort + limit before collect): max_contributors=1 keeps only cust 2
    by (weight desc, custkey asc)."""
    from miru_ray.pipelines.relational import collaborative_filtering
    got = collaborative_filtering(
        cf_dir, custkey=1, k=10, max_contributors=1,
        shuffle_threshold_bytes=0).to_pandas()
    assert list(got["p_partkey"]) == [200]
    assert list(got["score"]) == [2]


def test_cf_distributed_weights_direct(cf_dir):
    """_cf_weights_shuffle returns exactly the capped (custkey → weight)
    series, excluding me."""
    import numpy as np

    import ray

    from miru_ray.pipelines.relational import _cf_weights_shuffle
    mine_ref = ray.put(np.array([100, 101], np.int64))
    w = _cf_weights_shuffle(cf_dir, mine_ref, custkey=1,
                            max_contributors=10)
    assert dict(w) == {2: 2, 3: 1}
    w1 = _cf_weights_shuffle(cf_dir, mine_ref, custkey=1,
                             max_contributors=1)
    assert dict(w1) == {2: 2}
