"""Tenant-level sync sender/receiver protocol (miru_ray.index.sync).

Reference semantics (MiruSyncSender.java:74,226-280 progress/cursors,
ProgressType initial/forward :67-69; MiruSyncReceiver.java:57-78 —
received batches land in the destination's OWN WAL and the destination
indexes from it):

  1. initial mode bootstraps the whole tenant; the destination registry
     answers identically to the source
  2. an INTERRUPTED initial sync resumes from the receiver's durable
     cursor — re-cut batches dedupe by label, no duplicate rows
  3. forward mode ships only docs past the watermark after the source
     appends; both registries converge again
  4. a no-change re-sync ships nothing
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.fixtures import generate_transcripts
from miru_ray.index.build import build_index
from miru_ray.index.sync import SyncReceiver, SyncSender
from miru_ray.index.tenants import TenantRegistry

CFG = IndexConfig(docs_per_partition=500, num_shards=2)


def _split_convs(table, n_head):
    """First n_head conversations vs the rest (whole convs — the append
    constraint)."""
    convs = sorted(set(table["conv_id"].to_pylist()))
    head = set(convs[:n_head])
    mask = pa.array([c in head for c in table["conv_id"].to_pylist()])
    return table.filter(mask), table.filter(pa.compute.invert(mask))


@pytest.fixture()
def two_clusters(tmp_path):
    """Source registry with one tenant over the head split; the tail
    split is the later 'forward' delivery."""
    # xs has 100 conversations — split 80/20 so the tail is a REAL
    # forward delta (a 400-conv head made the tail empty, turning the
    # forward-sync test vacuous and masking an append_index crash on
    # empty deltas)
    t = generate_transcripts("xs")
    head, tail = _split_convs(t, 80)
    src_in = str(tmp_path / "src_head.parquet")
    pq.write_table(head, src_in)
    idir = str(tmp_path / "src_idx")
    build_index(src_in, idir, CFG)
    src_reg = TenantRegistry(str(tmp_path / "src_registry"))
    src_reg.register("acme", idir, CFG)
    recv = SyncReceiver(str(tmp_path / "dst_cluster"))
    yield src_reg, recv, idir, head, tail, tmp_path
    src_reg.close()
    recv.registry.close()


def _counts(reg, tenant, terms):
    s = reg.searcher(tenant, num_readers=1)
    return {t: s.count(t) for t in terms}


def test_initial_sync_converges(two_clusters):
    src_reg, recv, _idir, head, _tail, _tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    out = sender.sync_tenant("acme")
    assert out["mode"] == "initial"
    assert out["rows"] == head.num_rows
    assert out["committed_docs"] == head.num_rows
    assert "acme" in recv.registry.tenants()
    terms = ["alpha", "merge", "shard"]
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms)
    # doc ids identical on both sides (same corpus, same assignment)
    a = src_reg.searcher("acme", 1).topk("alpha", k=20)
    b = recv.registry.searcher("acme", 1).topk("alpha", k=20)
    assert a.equals(b)


def test_interrupted_sync_resumes_without_duplicates(two_clusters):
    src_reg, recv, _idir, head, _tail, _tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    with pytest.raises(RuntimeError, match="simulated sender crash"):
        sender.sync_tenant("acme", _crash_after_batches=2)
    st = recv.progress("acme")
    assert 0 < st["rows_persisted"] < head.num_rows
    # restart: persisted batches are skipped by label, the rest ship
    out = sender.sync_tenant("acme")
    assert out["batches_skipped"] == 0  # watermark already past them
    assert out["watermark"] == st["rows_persisted"]
    assert out["committed_docs"] == head.num_rows  # NO duplicates
    terms = ["alpha", "merge"]
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms)


def test_retry_same_batches_dedupes_by_label(two_clusters):
    """A re-delivered batch label is acknowledged but not re-persisted
    (at-least-once delivery + idempotent receiver)."""
    src_reg, recv, _idir, head, _tail, _tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    sender.sync_tenant("acme", commit=False)
    st = recv.progress("acme")
    labels = sorted(st["batches"])
    dup = pa.table({"conv_id": pa.array(["x"], pa.string())})
    assert recv.write_activity("acme", labels[0], dup) is False
    assert recv.progress("acme") == st  # cursor unchanged
    again = sender.sync_tenant("acme", commit=True)
    assert again["batches_sent"] == 0 and again["rows"] == 0
    assert sorted(recv.progress("acme")["batches"]) == labels


def test_forward_sync_after_source_append(two_clusters):
    src_reg, recv, idir, head, tail, tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    sender.sync_tenant("acme")
    # source grows: append the tail conversations (whole new convs)
    tail_path = str(tmp / "src_tail.parquet")
    pq.write_table(tail, tail_path)
    build_index([os.path.join(str(tmp), "src_head.parquet"), tail_path],
                idir, CFG)
    out = sender.sync_tenant("acme")
    assert out["mode"] == "forward"
    assert out["rows"] == tail.num_rows      # only the delta ships
    assert out["committed_docs"] == head.num_rows + tail.num_rows
    terms = ["alpha", "merge", "bm25"]
    src_reg.refresh()
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms)
    # third sync: nothing new
    out = sender.sync_tenant("acme")
    assert out["batches_sent"] == 0 and out["rows"] == 0


def _repair_rows_for(idir, doc_ids, text, version):
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    t = pads.dataset(os.path.join(idir, "docstore"),
                     format="parquet").to_table()
    rows = t.filter(pc.is_in(t["doc_id"],
                             value_set=pa.array(doc_ids, pa.int64())))
    rows = rows.sort_by("doc_id")
    rows = rows.drop_columns([c for c in ("doc_id", "version")
                              if c in rows.schema.names])
    ti = rows.schema.get_field_index("text")
    rows = rows.set_column(ti, "text",
                           pa.array([text] * rows.num_rows, pa.string()))
    return rows.append_column(
        "version", pa.array([version] * rows.num_rows, pa.int64()))


def test_repair_replay_after_docs_shipped(two_clusters):
    """Docs repaired at the source AFTER they shipped re-deliver as
    REPAIR batches (the reference replays REPAIR-type WAL entries) and
    both registries converge — the gap the r4 sender documented."""
    from miru_ray.index.repair import repair_index
    src_reg, recv, idir, _head, _tail, _tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    sender.sync_tenant("acme")
    # repair two shipped docs at the source
    repair_index(idir, _repair_rows_for(idir, [3, 700],
                                        "zzreplaymark quartz", 2))
    src_reg.refresh()
    out = sender.sync_tenant("acme")
    assert out["repairs_sent"] == 1 and out["rows"] == 0
    terms = ["zzreplaymark", "alpha", "merge"]
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms)
    assert _counts(recv.registry, "acme", ["zzreplaymark"]) \
        == {"zzreplaymark": 2}
    # replay is idempotent: nothing re-ships, nothing re-applies
    out = sender.sync_tenant("acme")
    assert out["repairs_sent"] == 0 and out["repairs_skipped"] == 1
    st = recv.progress("acme")
    assert len(st["repairs_applied"]) == 1


def test_repair_before_initial_sync_converges(two_clusters):
    """A repair committed BEFORE any sync: the doc batches already carry
    the repaired content (and versions), so the replayed REPAIR batch
    must be a clean DECLINE — same end state, no double-apply."""
    from miru_ray.index.repair import repair_index
    src_reg, recv, idir, head, _tail, _tmp = two_clusters
    repair_index(idir, _repair_rows_for(idir, [5], "zzpremark onyx", 3))
    src_reg.refresh()
    sender = SyncSender(src_reg, recv, batch_rows=300)
    out = sender.sync_tenant("acme")
    assert out["mode"] == "initial" and out["repairs_sent"] == 1
    assert out["committed_docs"] == head.num_rows
    terms = ["zzpremark", "alpha"]
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms)


def test_two_repairs_replay_in_order(two_clusters):
    """Two source repairs of the SAME doc replay under distinct labels;
    the receiver ends at the newest version exactly like the source."""
    from miru_ray.index.repair import repair_index
    src_reg, recv, idir, _head, _tail, _tmp = two_clusters
    sender = SyncSender(src_reg, recv, batch_rows=300)
    sender.sync_tenant("acme")
    repair_index(idir, _repair_rows_for(idir, [9], "zzfirstfix", 2))
    repair_index(idir, _repair_rows_for(idir, [9], "zzsecondfix", 4))
    src_reg.refresh()
    out = sender.sync_tenant("acme")
    assert out["repairs_sent"] == 2
    terms = ["zzfirstfix", "zzsecondfix"]
    assert _counts(recv.registry, "acme", terms) == \
        _counts(src_reg, "acme", terms) == \
        {"zzfirstfix": 0, "zzsecondfix": 1}
