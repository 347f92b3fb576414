"""Regression tests for the round-5 self-review findings (second review
pass over the REPAIR / sync / composite / unread-decoration commits).

Covered here:
  1. mark_read / mark_unread after set_stream_unread must REPLACE the
     doc-level receipt state, not crash (KeyError) on the emptied dict
  2. SyncSender refuses a source index with an interrupted REPAIR
     pending (shipping a mid-repair docstore would be made PERMANENT by
     the receiver's label dedupe)
  3. pButNotQ whose positive AND all negatives dissolve is match-NONE,
     never match-all (MiruAggregateUtil.filter: andNot of an empty
     first bitmap is empty)
  4. suppressUnreadFilter without includeUnreadState/unreadOnly is a
     loud rejection, not a silently dropped knob
  5. Searcher.facet_counts (the batched facet primitive) matches
     per-value Searcher.count
  6. bench's compact summary line stays bounded even when every query
     fails (the driver json-parses a ~2000-char stdout tail)

(The companion repair finding — the version gate surviving a later
version-less append — lives in test_repair.py next to the rest of the
REPAIR suite.)
"""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


# ---------------- 1. receipt -> marker transition ----------------

def test_mark_read_after_doc_level_receipts(xs_searcher, xs_table):
    n = len(xs_table)
    ts = np.asarray(xs_table.column("ts").cast("int64").to_pylist())
    ids = np.arange(n, dtype=np.int64)
    xs_searcher.set_stream_unread("r5b_a", ids[::2])
    flags = xs_searcher.stream_unread_flags("r5b_a", ids, ts)
    assert flags.sum() == len(ids[::2])
    # the documented ids -> watermark transition must not KeyError
    mid = int(np.sort(ts)[n // 2])
    xs_searcher.mark_read("r5b_a", mid)
    flags = xs_searcher.stream_unread_flags("r5b_a", ids, ts)
    assert (flags == (ts > mid)).all()  # receipts fully replaced


def test_mark_unread_after_doc_level_receipts(xs_searcher, xs_table):
    n = len(xs_table)
    ts = np.asarray(xs_table.column("ts").cast("int64").to_pylist())
    ids = np.arange(n, dtype=np.int64)
    xs_searcher.set_stream_unread("r5b_b", ids[:5])
    xs_searcher.mark_unread("r5b_b", int(ts.max()))
    flags = xs_searcher.stream_unread_flags("r5b_b", ids, ts)
    assert flags.all()  # everything re-marked unread
    # and the reverse transition still works too
    xs_searcher.set_stream_unread("r5b_b", ids[:3])
    flags = xs_searcher.stream_unread_flags("r5b_b", ids, ts)
    assert flags.sum() == 3


# ---------------- 2. sync refuses a mid-repair source ----------------

def test_sync_sender_refuses_pending_repair(tmp_path):
    from miru_ray.config import IndexConfig
    from miru_ray.fixtures import generate_transcripts
    from miru_ray.index.build import build_index
    from miru_ray.index.sync import SyncReceiver, SyncSender
    from miru_ray.index.tenants import TenantRegistry
    cfg = IndexConfig(docs_per_partition=500, num_shards=2)
    src_in = str(tmp_path / "src.parquet")
    pq.write_table(generate_transcripts("xs"), src_in)
    idir = str(tmp_path / "idx")
    build_index(src_in, idir, cfg)
    reg = TenantRegistry(str(tmp_path / "reg"))
    reg.register("acme", idir, cfg)
    recv = SyncReceiver(str(tmp_path / "dst"))
    sender = SyncSender(reg, recv, batch_rows=400)
    try:
        # an interrupted REPAIR leaves its sidecar; the sender must
        # refuse (the receiver's label dedupe would make shipped
        # duplicate rows permanent)
        sidecar = os.path.join(idir, "pending_repair.json")
        with open(sidecar, "w") as f:
            json.dump({"tag": "deadbeef", "pids": [0],
                       "applied": 1, "skipped": 0,
                       "applied_doc_ids": [0]}, f)
        with pytest.raises(RuntimeError, match="REPAIR pending"):
            sender.sync_tenant("acme")
        assert recv.progress("acme")["rows_persisted"] == 0  # nothing shipped
        os.remove(sidecar)
        out = sender.sync_tenant("acme")
        assert out["committed_docs"] == out["n_docs"]
    finally:
        reg.close()
        recv.registry.close()


# ---------------- 3. pButNotQ full dissolve ----------------

def test_pbutnotq_all_children_dissolved_is_match_none(xs_searcher):
    from miru_ray.query.filter import MatchNone
    from miru_ray.query.request import execute_request, filter_to_ast
    # positive dissolves (empty values), no negatives at all
    ast = filter_to_ast({"operation": "pButNotQ",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": []}]},
                        ("text",), None)
    assert isinstance(ast, MatchNone)
    # positive AND negative both dissolve
    ast = filter_to_ast({"operation": "pButNotQ",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": []},
                                          {"fieldName": "tool",
                                           "values": []}]},
                        ("text",), None)
    assert isinstance(ast, MatchNone)
    # end-to-end: the request must answer ZERO docs, not every doc
    res = execute_request(xs_searcher, {
        "name": "distinctCount", "tenantId": "t",
        "query": {"streamFilter": {
            "operation": "pButNotQ",
            "fieldFilters": [{"fieldName": "role", "values": []}]},
            "aggregateCountAroundField": "conv_id",
            "desiredNumberOfDistincts": 10}})
    assert res["answer"]["collectedDistincts"] == 0


# ---------------- 4. suppressUnreadFilter is never silent ----------------

def test_suppress_unread_filter_without_unread_knobs_rejects(xs_searcher):
    from miru_ray.query.request import execute_request
    req = {"name": "aggregateCounts", "tenantId": "t",
           "query": {"streamId": "r5b_c",
                     "suppressUnreadFilter": {
                         "operation": "or",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": ["user"]}]},
                     "constraints": {"c": {
                         "aggregateCountAroundField": "conv_id",
                         "desiredNumberOfDistincts": 10}}}}
    with pytest.raises(ValueError, match="suppressUnreadFilter"):
        execute_request(xs_searcher, req)


# ---------------- 5. batched facet == per-value counts ----------------

def test_facet_counts_matches_per_value_count(xs_searcher):
    from miru_ray.query.filter import And, Term
    facet = xs_searcher.facet_counts("role", Term("text", "alpha"))
    assert facet  # the xs fixture has role values
    for v, n in facet.items():
        assert n == xs_searcher.count(
            And((Term("role", v), Term("text", "alpha"))))
    # overflow is loud: role cardinality exceeds a cap of 1
    assert len(facet) > 1
    with pytest.raises(ValueError, match="distinct values"):
        xs_searcher.facet_counts("role", Term("text", "alpha"), cap=1)


# ---------------- 6. bench compact line is bounded ----------------

def test_bench_compact_line_bounded_under_mass_failure(capsys):
    import bench
    out = {"metric": "turns_per_sec", "value": 1.0, "unit": "sec",
           "queries": {f"query_name_{i:03d}": -1.0 for i in range(117)},
           "sf": 0.1, "num_cpus": 32}
    bench._emit(out)
    lines = capsys.readouterr().out.strip().splitlines()
    final = lines[-1]
    assert len(final) < 2000
    parsed = json.loads(final)
    assert parsed["queries_failed_n"] == 117
    assert len(parsed["queries_failed"]) == 8
