"""Typed siphon contract: WAL → per-tenant activity flush with a durable
cursor (reference: ``MiruSiphonPlugin.java:11-25`` driven by
``AmzaSiphoner.java:111-180`` over an ``AmzaSiphonCursor``)."""

import collections
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.index.siphon import (RoleRouteSiphon, SiphonPlugin, run_siphon)


def _flushed_rows(out_root):
    rows = {}
    for d in sorted(os.listdir(out_root)):
        if not d.startswith("tenant="):
            continue
        t = pq.ParquetDataset(os.path.join(out_root, d)).read()
        rows[d.split("=", 1)[1]] = t.sort_by("doc_id")
    return rows


def test_siphon_routes_per_tenant(ray_session, xs_index, xs_table, tmp_path):
    out = str(tmp_path / "out")
    res = run_siphon(xs_index, RoleRouteSiphon(), out)
    assert res.skipped == 0 and res.siphoned == xs_table.num_rows
    want = collections.Counter(xs_table["role"].to_pylist())
    got = _flushed_rows(out)
    assert {t: v.num_rows for t, v in got.items()} == dict(want)
    assert res.flushed == xs_table.num_rows
    # activity schema is the declared one
    assert got["user"].schema == RoleRouteSiphon().schema()


def test_siphon_cursor_resumes_and_noops(ray_session, xs_index, xs_table,
                                         tmp_path):
    out = str(tmp_path / "out")
    # crash after one partition: cursor holds exactly the flushed pid
    r1 = run_siphon(xs_index, RoleRouteSiphon(), out, _crash_after_pids=1)
    assert r1.called == 1
    # resume finishes the rest — combined output equals a full run
    r2 = run_siphon(xs_index, RoleRouteSiphon(), out)
    assert r1.called + r2.called > 1 and r2.skipped == 1
    assert sum(t.num_rows for t in _flushed_rows(out).values()) \
        == xs_table.num_rows
    # a completed siphon re-invoked is a no-op
    r3 = run_siphon(xs_index, RoleRouteSiphon(), out)
    assert r3.called == 0 and r3.flushed == 0 and r3.skipped > 0


def test_siphon_skips_tombstoned_rows(ray_session, xs_index, xs_table,
                                      tmp_path):
    idx = str(tmp_path / "idx")
    shutil.copytree(xs_index, idx)
    from miru_ray.util import atomic_write_json
    dead = [0, 5, 17]
    atomic_write_json(os.path.join(idx, "tombstones.json"), dead)
    out = str(tmp_path / "out")
    res = run_siphon(idx, RoleRouteSiphon(), out)
    assert res.flushed == xs_table.num_rows - len(dead)
    all_ids = [i for t in _flushed_rows(out).values()
               for i in t["doc_id"].to_pylist()]
    assert set(dead).isdisjoint(all_ids)


def test_siphon_reflushes_rebuilt_boundary_partition(ray_session, xs_table,
                                                     tmp_path):
    """append_index rebuilds the partially-filled boundary partition in
    place; the cursor's per-pid fingerprint must retract it so the
    appended docs reach the export (regression: a bare done-pid set
    silently lost them forever)."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    first = set(convs[: len(convs) // 2])
    a_path, b_path = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a_path)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b_path)
    idx = str(tmp_path / "idx")
    m1 = build_index([a_path], idx, cfg)
    out = str(tmp_path / "out")
    r1 = run_siphon(idx, RoleRouteSiphon(), out)
    assert r1.flushed == m1["n_docs"]
    m2 = build_index([a_path, b_path], idx, cfg)   # incremental append
    assert "append" in m2["stages"]
    r2 = run_siphon(idx, RoleRouteSiphon(), out)
    assert r2.called > 0       # boundary pid re-flushed, not skipped
    got = _flushed_rows(out)
    assert sum(t.num_rows for t in got.values()) == xs_table.num_rows
    assert sorted(i for t in got.values() for i in t["doc_id"].to_pylist()) \
        == list(range(xs_table.num_rows))


def test_siphon_reflushes_on_new_tombstones(ray_session, xs_index, xs_table,
                                            tmp_path):
    """Tombstones added AFTER a completed siphon must retract the affected
    partitions and drop the dead rows (and any now-empty tenant file for
    that pid) from the export."""
    idx = str(tmp_path / "idx")
    shutil.copytree(xs_index, idx)
    out = str(tmp_path / "out")
    run_siphon(idx, RoleRouteSiphon(), out)
    from miru_ray.util import atomic_write_json
    dead = [1, 2, 3]
    atomic_write_json(os.path.join(idx, "tombstones.json"), dead)
    r2 = run_siphon(idx, RoleRouteSiphon(), out)
    assert r2.called > 0 and r2.skipped > 0   # only pid 0's fp changed
    all_ids = [i for t in _flushed_rows(out).values()
               for i in t["doc_id"].to_pylist()]
    assert set(dead).isdisjoint(all_ids)
    assert len(all_ids) == xs_table.num_rows - len(dead)


def test_siphon_output_schema_is_enforced(ray_session, xs_index, tmp_path):
    class Bad(SiphonPlugin):
        name = "bad"
        columns = ("role",)

        def schema(self):
            return pa.schema([("doc_id", pa.int64())])

        def siphon(self, batch):
            return pa.table({"tenant": batch["role"],
                             "wrong": batch["doc_id"]})

    with pytest.raises(Exception, match="declared"):
        run_siphon(xs_index, Bad(), str(tmp_path / "out"))
