"""Regression tests for the round-2 code-review findings."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.query.engine import Searcher


def test_revenue_by_nation_handles_unsorted_nation_table(tmp_path):
    """Nation names must map by KEY, not by row position (the testdata
    happens to be sorted by nationkey; nothing guarantees that)."""
    from miru_ray.pipelines.relational import revenue_by_nation
    d = str(tmp_path / "sf")
    os.makedirs(d)
    # nation table in REVERSED key order
    pq.write_table(pa.table({
        "n_nationkey": pa.array([2, 1, 0], pa.int64()),
        "n_name": pa.array(["CANADA", "BRAZIL", "ALGERIA"])}),
        os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 11, 12], pa.int64()),
        "c_nationkey": pa.array([0, 1, 2], pa.int64())}),
        os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 11, 12], pa.int64()),
        "o_totalprice": pa.array([100.0, 200.0, 300.0])}),
        os.path.join(d, "orders.parquet"))
    out = revenue_by_nation(d).to_pandas().set_index("n_name")
    assert out.loc["ALGERIA", "revenue"] == 100.0   # custkey 10 → nation 0
    assert out.loc["BRAZIL", "revenue"] == 200.0
    assert out.loc["CANADA", "revenue"] == 300.0


def test_rebuild_clears_tombstones(xs_path, tmp_path):
    """A rebuild with different config must not inherit the old index's
    removal mask (stale doc ids belong to the old id space)."""
    d = str(tmp_path / "idx")
    build_index(xs_path, d, IndexConfig(docs_per_partition=1000, num_shards=2))
    s = Searcher(d, num_readers=1, use_actors=False)
    victim = int(s.topk(["alpha"], 1, "bm25")["doc_id"][0].as_py())
    s.remove_docs([victim])
    s.close()
    build_index(xs_path, d,
                IndexConfig(docs_per_partition=1000, num_shards=2,
                            remove_stopwords=True), overwrite=True)
    assert not os.path.exists(os.path.join(d, "tombstones.json"))
    s2 = Searcher(d, num_readers=1, use_actors=False)
    assert victim in s2.match_docs(["alpha"]).tolist() \
        or s2.count(["alpha"]) >= 0  # no stale-mask IndexError either way
    s2.close()


def test_append_retracts_gather_watermark(xs_table, tmp_path):
    """Appending rebuilds touched partitions from the docstore; the gather
    watermark must retract those pids so a re-run re-enriches them."""
    from miru_ray.index.gather import gather_terms
    from miru_ray.query.filter import Term
    cfg = IndexConfig(docs_per_partition=500, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    first = set(convs[: len(convs) // 2])
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b)
    d = str(tmp_path / "idx")
    build_index([a], d, cfg)

    def g(t: pa.Table) -> pa.Table:
        docs = t["doc_id"].to_pylist()
        return pa.table({"term": pa.array(["mark:yes"] * len(docs)),
                         "doc_id": pa.array(docs, pa.int64()),
                         "tf": pa.array(np.ones(len(docs), np.int64))})

    gather_terms(d, g, "mark")
    m = build_index([a, b], d, cfg)  # append
    assert "append" in m["stages"]
    # watermark retracted for rebuilt pids…
    done = set(m["gather"]["mark"]["done_pids"])
    first_pid = min(p["pid"] for p in m["partitions"]
                    if p["pid"] not in done) if len(done) < len(
                        m["partitions"]) else None
    assert len(done) < len(m["partitions"])
    # …and a re-run restores full enrichment
    m2 = gather_terms(d, g, "mark")
    assert set(m2["gather"]["mark"]["done_pids"]) \
        == {p["pid"] for p in m2["partitions"]}
    s = Searcher(d, num_readers=1, use_actors=False)
    assert s.count(Term("mark", "yes")) == m2["n_docs"]
    s.close()
    _ = first_pid


def test_minhash_empty_docs_never_pair(ray_session):
    """Zero-token docs must not cluster with each other (no shingles →
    no similarity; the SQL oracle gives them no pairs)."""
    from miru_ray.ops.dedup import _minhash_bands_batch
    b = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["?!...", "", "real text here", "---"])})
    bands = _minhash_bands_batch(b)
    assert set(bands["doc_id"].to_pylist()) == {3}


def test_ann_ring_any_radius():
    from miru_ray.ops.similarity import _N_PLANES, _ring
    import math
    for r in (0, 1, 2, 3):
        ring = _ring(0b1010, r)
        expect = sum(math.comb(_N_PLANES, i) for i in range(r + 1))
        assert len(set(ring)) == expect
        assert all(bin(c ^ 0b1010).count("1") <= r for c in ring)


def test_verify_sync_unsynced_dir_is_graceful(tmp_path):
    from miru_ray.index.sync import verify_sync
    out = verify_sync(str(tmp_path))
    assert out["ok"] is False and "never synced" in out["error"]


def test_append_commit_window_never_purges_committed_files(xs_table, tmp_path):
    """A crash AFTER the manifest commit but BEFORE sidecar removal leaves
    the committed tag in pending_append.json; the next append must NOT
    purge that committed append's docstore files."""
    from miru_ray.util import atomic_write_json, read_json
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    third = len(convs) // 3
    paths = []
    for i, grp in enumerate((set(convs[:third]), set(convs[third:2 * third]),
                             set(convs[2 * third:]))):
        p = str(tmp_path / f"p{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(grp)],
                                            preserve_index=False), p)
        paths.append(p)
    d = str(tmp_path / "idx")
    build_index([paths[0]], d, cfg)
    m1 = build_index([paths[0], paths[1]], d, cfg)      # append B commits
    assert "append" in m1["stages"] and m1["append_tags"]
    # simulate the crash window: committed tag back in the sidecar
    atomic_write_json(os.path.join(d, "pending_append.json"),
                      {"tags": m1["append_tags"]})
    m2 = build_index(paths, d, cfg)                     # append C
    ds = pq.ParquetDataset(os.path.join(d, "docstore")).read()
    ids = ds["doc_id"].to_numpy()
    assert len(ids) == len(set(ids.tolist())) == m2["n_docs"]
    full = str(tmp_path / "full")
    m3 = build_index(paths, full, cfg)
    assert m2["n_docs"] == m3["n_docs"] and m2["total_len"] == m3["total_len"]


def test_query_side_stopword_parity(xs_path, tmp_path):
    """On a stopword-stripped index, queries containing stopwords drop
    them (analyzer parity) instead of matching nothing."""
    d = str(tmp_path / "idx")
    build_index(xs_path, d, IndexConfig(docs_per_partition=1000, num_shards=2,
                                        remove_stopwords=True))
    s = Searcher(d, num_readers=1, use_actors=False)
    a = s.topk("the alpha", 10, "bm25")
    b = s.topk("alpha", 10, "bm25")
    assert a.equals(b) and len(a) > 0
    assert s.count(["the", "alpha"]) == s.count(["alpha"]) > 0
    # a pure-stopword phrase reduces to nothing → no matches, no crash
    assert s.count('"the of and"') == 0
    s.close()


def test_prefix_range_non_bmp():
    """Prefix upper bound must include terms whose next char is outside
    the BMP (e.g. emoji keyword values)."""
    import numpy as np

    from miru_ray.index.segments import SegmentReader, encode_segment_table, \
        write_segment
    t = pa.table({
        "term": pa.array(["tool:a", "tool:\U0001F600wrench", "tool:z"]),
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "tf": pa.array([1, 1, 1], pa.int64())})
    seg = encode_segment_table(t)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "segments", "p00000_s000.parquet")
        write_segment(seg, p)
        r = SegmentReader(p)
        lo, hi = r.prefix_range("tool:")
        assert set(r.terms[lo:hi]) == {"tool:a", "tool:\U0001F600wrench",
                                       "tool:z"}
