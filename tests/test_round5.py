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


# ------------------------------------------------- composite fields (r4 #5)

def test_composer_roundtrip_and_ordering():
    from miru_ray.query.composer import (PART_SEP, compose_part_prefix,
                                         compose_parts, decompose_value)
    v = compose_parts(["user", "tool_01"])
    assert decompose_value(v) == ["user", "tool_01"]
    # the separator sorts below printable chars: terms group by leading
    # parts in the sorted term dict (the reference's length-prefix
    # ordering property, MiruTermComposer.java:35-63)
    assert compose_parts(["a", "z"]) < compose_parts(["ab", "a"])
    assert compose_part_prefix(["user"]) == "user" + PART_SEP
    with pytest.raises(ValueError, match="reserved separator"):
        compose_parts(["bad\x1fpart", "x"])


def test_composer_compose_arrays_rejects_separator():
    import numpy as np

    from miru_ray.query.composer import compose_arrays
    a = np.array(["ok", "bad\x1f"], object)
    b = np.array(["x", "y"], object)
    with pytest.raises(ValueError, match="reserved separator"):
        compose_arrays([a, b])
    out = compose_arrays([np.array(["u"], object),
                          np.array(["t"], object)])
    assert list(out) == ["u\x1ft"]


@pytest.fixture(scope="module")
def composite_index(tmp_path_factory):
    """Tiny index with a composite (role, tool) field."""
    import shutil

    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    import pyarrow.parquet as _pq
    d = tmp_path_factory.mktemp("comp")
    src = str(d / "src")
    os.makedirs(src)
    _pq.write_table(pa.table({
        "conv_id": pa.array(["c0"] * 6, pa.string()),
        "turn_idx": pa.array(list(range(6)), pa.int64()),
        "role": pa.array(["user", "user", "assistant", "assistant",
                          "user", ""], pa.string()),
        "tool": pa.array(["grep", "sed", "grep", "", "grep", "sed"],
                         pa.string()),
        "text": pa.array(["alpha"] * 6, pa.string()),
        "ts": pa.array([1000 + i for i in range(6)],
                       pa.timestamp("us")),
    }), os.path.join(src, "docs.parquet"))
    idir = str(d / "idx")
    shutil.rmtree(idir, ignore_errors=True)
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=("role", "tool"),
                      composite_fields=(("role_tool", ("role", "tool")),))
    build_index(src, idir, cfg)
    return idir


def test_composite_index_exact_and_parts_prefix(composite_index):
    from miru_ray.query.composer import compose_part_prefix, compose_parts
    from miru_ray.query.engine import Searcher
    from miru_ray.query.filter import Prefix, Term
    s = Searcher(composite_index, num_readers=1)
    try:
        # exact: (user, grep) = docs 0 and 4
        assert s.count(Term("role_tool",
                            compose_parts(["user", "grep"]))) == 2
        # parts-prefix: role=user with ANY tool = docs 0, 1, 4
        assert s.count(Prefix("role_tool",
                              compose_part_prefix(["user"]))) == 3
        # doc 3 (assistant, empty tool) and doc 5 (empty role) are NOT
        # indexed — every part must be non-empty
        assert s.count(Prefix("role_tool",
                              compose_part_prefix(["assistant"]))) == 1
        # a part-boundary prefix past the cap fails LOUDLY (complete
        # scan semantics) instead of silently truncating
        with pytest.raises(ValueError, match="parts-prefix"):
            s.count(Prefix("role_tool", compose_part_prefix(["user"]),
                           max_expansion=1))
    finally:
        s.close()


def test_filter_to_ast_composite_values():
    from miru_ray.query.filter import Or, Prefix, Term
    from miru_ray.query.request import filter_to_ast
    comp = {"role_tool": 2}
    f = {"operation": "or",
         "fieldFilters": [{"fieldName": "role_tool",
                           "values": [{"parts": ["user", "grep"]},
                                      {"parts": ["assistant"]}]}]}
    got = filter_to_ast(f, composite_parts=comp)
    assert got == Or((Term("role_tool", "user\x1fgrep"),
                      Prefix("role_tool", "assistant\x1f")))
    with pytest.raises(ValueError, match="has 2 parts"):
        filter_to_ast({"operation": "or", "fieldFilters": [
            {"fieldName": "role_tool",
             "values": [{"parts": ["a", "b", "c"]}]}]},
            composite_parts=comp)


# ------------------------------------- aggregate-counts unread (r4 #6)

def _agg_unread_req(**q):
    base = {"streamId": "s1",
            "streamFilter": {"operation": "or",
                             "fieldFilters": [{"fieldName": "text",
                                               "values": ["alpha"]}]},
            "constraints": {"c": {"aggregateCountAroundField": "conv_id",
                                  "desiredNumberOfDistincts": 10 ** 6}}}
    base.update(q)
    return {"name": "aggregateCounts", "tenantId": "t", "query": base}


def test_aggregate_counts_include_unread_state(xs_searcher, xs_table):
    from miru_ray.query.request import execute_request
    import numpy as np
    # doc-level unread: every 3rd doc
    n = len(xs_table)
    xs_searcher.set_stream_unread("s1", np.arange(0, n, 3, dtype=np.int64))
    res = execute_request(xs_searcher, _agg_unread_req(
        includeUnreadState=True))["answer"]["constraints"]["c"]["results"]
    assert res and all("anyUnread" in r and "latestUnread" in r
                       and "oldestUnread" in r for r in res)
    # brute-force parity over the raw table
    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas().reset_index().rename(
        columns={"index": "doc_id"})
    hit = df[df["text"].map(
        lambda t: "alpha" in set(py_tokenize(t or "")))].copy()
    hit["unread"] = hit["doc_id"] % 3 == 0
    hit["_ts"] = hit["ts"].astype("int64")
    for r in res:
        g = hit[hit["conv_id"] == r["distinctValue"]].sort_values(
            ["_ts", "doc_id"], kind="stable")
        assert r["count"] == len(g)
        assert r["anyUnread"] == bool(g["unread"].any())
        assert r["latestUnread"] == bool(g["unread"].iloc[-1])
        assert r["oldestUnread"] == bool(g["unread"].iloc[0])


def test_aggregate_counts_unread_only(xs_searcher, xs_table):
    from miru_ray.query.request import execute_request
    import numpy as np
    n = len(xs_table)
    xs_searcher.set_stream_unread("s1", np.arange(0, n, 3, dtype=np.int64))
    full = execute_request(xs_searcher, _agg_unread_req())[
        "answer"]["constraints"]["c"]["results"]
    only = execute_request(xs_searcher, _agg_unread_req(unreadOnly=True))[
        "answer"]["constraints"]["c"]["results"]
    # unreadOnly counts <= full counts, and only unread docs counted
    fmap = {r["distinctValue"]: r["count"] for r in full}
    assert only
    for r in only:
        assert r["count"] <= fmap[r["distinctValue"]]
    total_unread = sum(r["count"] for r in only)
    assert 0 < total_unread < sum(r["count"] for r in full)


def test_aggregate_counts_unread_watermark_and_suppress(xs_searcher,
                                                        xs_table):
    """Marker semantics parity with ops/analytics.unread_backfill: a
    READ marker at ts w clears everything <= w; a LATER UNREAD marker
    voids it (re-mark).  suppressUnreadFilter marks matching docs read
    for the request."""
    from miru_ray.query.request import execute_request
    ts = sorted(xs_table.column("ts").cast("int64").to_pylist())
    mid = ts[len(ts) // 2]
    xs_searcher.mark_read("wm", mid)
    res = execute_request(xs_searcher, _agg_unread_req(
        streamId="wm", includeUnreadState=True))[
        "answer"]["constraints"]["c"]["results"]
    assert any(r["anyUnread"] for r in res)
    for r in res:  # watermark: unread iff ts > mid
        assert r["latestUnread"] == (r["latestTimestamp"] > mid)
        assert r["oldestUnread"] == (r["oldestTimestamp"] > mid)
    # an UNREAD marker at the max ts re-marks everything
    xs_searcher.mark_unread("wm", max(ts))
    res2 = execute_request(xs_searcher, _agg_unread_req(
        streamId="wm", includeUnreadState=True))[
        "answer"]["constraints"]["c"]["results"]
    assert all(r["anyUnread"] and r["latestUnread"] and r["oldestUnread"]
               for r in res2)
    # suppressUnreadFilter: user-role docs count as read
    res3 = execute_request(xs_searcher, _agg_unread_req(
        streamId="wm", includeUnreadState=True,
        suppressUnreadFilter={"operation": "or",
                              "fieldFilters": [{"fieldName": "role",
                                                "values": ["user"]}]}))[
        "answer"]["constraints"]["c"]["results"]
    df = xs_table.to_pandas().reset_index().rename(
        columns={"index": "doc_id"})
    from miru_ray.tokenize import py_tokenize
    hit = df[df["text"].map(
        lambda t: "alpha" in set(py_tokenize(t or "")))].copy()
    hit["_ts"] = hit["ts"].astype("int64")
    for r in res3:
        g = hit[hit["conv_id"] == r["distinctValue"]]
        assert r["anyUnread"] == bool((g["role"] != "user").any())


def test_aggregate_counts_unread_needs_stream(xs_searcher):
    from miru_ray.query.request import execute_request
    req = _agg_unread_req(includeUnreadState=True)
    del req["query"]["streamId"]
    with pytest.raises(ValueError, match="streamId"):
        execute_request(xs_searcher, req)


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
