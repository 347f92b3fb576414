"""Round-5 review-pass regressions: doc-space guard, append dispatch,
empty-delta append, repair-batch error discrimination, delivery sink
legacy sweep, naive-datetime serialization."""

import datetime
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.fixtures import generate_transcripts
from miru_ray.index.build import build_index
from miru_ray.index.sync import SyncReceiver, SyncSender
from miru_ray.index.tenants import TenantRegistry

CFG = IndexConfig(docs_per_partition=500, num_shards=2)


def _registry_with(tmp_path, table, name="acme"):
    src_in = str(tmp_path / "src.parquet")
    pq.write_table(table, src_in)
    idir = str(tmp_path / "idx")
    build_index(src_in, idir, CFG)
    reg = TenantRegistry(str(tmp_path / "registry"))
    reg.register(name, idir, CFG)
    return reg, idir, src_in


def test_forward_sync_refuses_doc_space_change(tmp_path):
    """A source REBUILD mints a new doc_space; forward sync against a
    WAL holding old-space rows must refuse loudly, never silently ship
    rows whose ids mean something else (review finding: sync.py had no
    doc-space guard at all)."""
    t = generate_transcripts("xs")
    reg, idir, _src = _registry_with(tmp_path, t)
    recv = SyncReceiver(str(tmp_path / "dst"))
    try:
        SyncSender(reg, recv, batch_rows=500).sync_tenant("acme")
        # rebuild the source from DIFFERENT content → new doc space
        half = t.slice(0, t.num_rows // 2)
        other = str(tmp_path / "other.parquet")
        pq.write_table(half, other)
        build_index(other, idir, CFG, overwrite=True)
        reg.evict("acme")
        with pytest.raises(RuntimeError, match="doc-id spaces"):
            SyncSender(reg, recv, batch_rows=500).sync_tenant("acme")
    finally:
        reg.close()
        recv.registry.close()


def test_commit_reraises_unhealable_repair_error(tmp_path):
    """commit() waits for not-yet-shipped convs but must RE-RAISE any
    other repair failure (review finding: a blanket `except ValueError:
    break` silently blocked repair replay forever)."""
    t = generate_transcripts("xs")
    reg, idir, _src = _registry_with(tmp_path, t)
    recv = SyncReceiver(str(tmp_path / "dst"))
    try:
        SyncSender(reg, recv, batch_rows=500).sync_tenant("acme")
        # a version-less repair batch can never apply — not a waiting
        # condition
        bad = pa.table({"conv_id": pa.array([t["conv_id"][0].as_py()]),
                        "turn_idx": pa.array([0], pa.int32()),
                        "text": pa.array(["x"], pa.string())})
        assert recv.write_repair("acme", "000000-deadbeef", bad)
        with pytest.raises(ValueError, match="version"):
            recv.commit("acme", CFG)
        # whereas an unknown conv stays staged and commit succeeds
        recv2 = SyncReceiver(str(tmp_path / "dst2"))
        try:
            SyncSender(reg, recv2, batch_rows=500).sync_tenant("acme")
            waiting = pa.table({
                "conv_id": pa.array(["conv-never-shipped"]),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(["x"], pa.string()),
                "version": pa.array([5], pa.int64())})
            assert recv2.write_repair("acme", "000000-cafecafe", waiting)
            recv2.commit("acme", CFG)  # no raise — batch stays staged
            st = recv2.progress("acme")
            assert "000000-cafecafe" not in st.get("repairs_applied", [])
        finally:
            recv2.registry.close()
    finally:
        reg.close()
        recv.registry.close()


def test_append_empty_delta_is_noop(tmp_path):
    """Appending files that carry zero rows must no-op (same doc_space,
    same n_docs) — it previously crashed in the docstore staging write,
    and the dispatch's blanket FileNotFoundError handler then silently
    degraded it to a FULL REBUILD with a fresh doc_space (review
    finding), invalidating every delivery cursor downstream."""
    t = generate_transcripts("xs")
    a = str(tmp_path / "a.parquet")
    pq.write_table(t, a)
    idir = str(tmp_path / "idx")
    m1 = build_index(a, idir, CFG)
    b = str(tmp_path / "b_empty.parquet")
    pq.write_table(t.slice(0, 0), b)
    m2 = build_index([a, b], idir, CFG)
    assert m2["doc_space"] == m1["doc_space"]
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["stages"]["append"]["new_docs"] == 0
    # third call: up-to-date fast path (fingerprint committed)
    m3 = build_index([a, b], idir, CFG)
    assert m3["fingerprint"] == m2["fingerprint"]
    assert m3["doc_space"] == m1["doc_space"]


def test_empty_append_after_crashed_append_heals_leftovers(tmp_path):
    """An empty-delta append must flow through the same leftover healing
    as a real one (review finding: an early-return committed the new
    fingerprint while SKIPPING the crashed-append cleanup, durably
    orphaning phantom docs behind the up-to-date fast path)."""
    import numpy as np
    import pyarrow.parquet as pqm

    from miru_ray.index.build import append_index, input_fingerprint
    from miru_ray.util import read_json
    t = generate_transcripts("xs")
    convs = sorted(set(t["conv_id"].to_pylist()))
    head_set = set(convs[:80])
    mask = pa.array([c in head_set for c in t["conv_id"].to_pylist()])
    head, tail = t.filter(mask), t.filter(pa.compute.invert(mask))
    a = str(tmp_path / "a.parquet")
    pq.write_table(head, a)
    idir = str(tmp_path / "idx")
    m1 = build_index(a, idir, CFG)
    # crash a REAL append after its docstore move
    b_real = str(tmp_path / "b.parquet")
    pq.write_table(tail, b_real)
    with pytest.raises(RuntimeError, match="simulated crash"):
        append_index(idir, m1, [b_real],
                     input_fingerprint([a, b_real]), CFG,
                     _crash_after_docstore=True)
    assert os.path.exists(os.path.join(idir, "pending_append.json"))
    # now an EMPTY append: must heal the crashed leftovers, not entomb
    # them behind the committed fingerprint
    b_empty = str(tmp_path / "b_empty.parquet")
    pq.write_table(t.slice(0, 0), b_empty)
    m2 = build_index([a, b_empty], idir, CFG)
    assert m2["n_docs"] == m1["n_docs"]
    assert m2["doc_space"] == m1["doc_space"]
    assert not os.path.exists(os.path.join(idir, "pending_append.json"))
    # offsets hold no phantom rows past the manifest's doc allocation
    off = pqm.read_table(os.path.join(idir, "conv_offsets.parquet"))
    assert int(off["offset"].to_numpy().max()) < m1["n_docs"]
    # docstore holds exactly n_docs rows (crashed files purged)
    import pyarrow.dataset as pads
    ids = pads.dataset(os.path.join(idir, "docstore"),
                       format="parquet").to_table(
                           columns=["doc_id"])["doc_id"].to_numpy()
    assert len(ids) == m1["n_docs"]
    assert int(np.max(ids)) == m1["n_docs"] - 1
    # and the REAL append still lands cleanly afterwards
    m3 = build_index([a, b_empty, b_real], idir, CFG)
    assert m3["n_docs"] == t.num_rows
    assert m3["doc_space"] == m1["doc_space"]
    assert m3["stages"]["append"]["new_docs"] == tail.num_rows


def test_delivery_sink_sweeps_legacy_hi_suffixed_files(tmp_path):
    """deliver() keys files on (space, pid, lo); a legacy file from the
    old hi-suffixed naming for the same key must be superseded, not
    left to double-count the overlap (review finding)."""
    import hashlib

    from miru_ray.index.delivery import ParquetDeliverySink
    sink = ParquetDeliverySink(str(tmp_path / "sink"))
    space = "spaceA"
    tag = hashlib.md5(space.encode()).hexdigest()[:10]
    legacy = os.path.join(sink.out_dir,
                          f"range-{tag}-{0:06d}-{0:012d}-{25:012d}.parquet")
    pq.write_table(pa.table({"doc_space": pa.array([space]),
                             "pid": pa.array([0], pa.int64()),
                             "doc_lo": pa.array([0], pa.int64()),
                             "doc_hi": pa.array([25], pa.int64())}), legacy)
    sink.deliver(0, 0, 40, doc_space=space)
    assert not os.path.exists(legacy)
    got = sink.delivered()
    assert got.num_rows == 1
    assert got["doc_hi"][0].as_py() == 40


def test_py_scalar_naive_datetime_is_utc():
    """_py_scalar must treat naive datetimes as UTC — .timestamp() alone
    re-interprets them in the HOST timezone (review finding)."""
    from miru_ray.query.request import _py_scalar
    old_tz = os.environ.get("TZ")
    os.environ["TZ"] = "America/New_York"
    time.tzset()
    try:
        v = _py_scalar(datetime.datetime(2024, 1, 1))
        assert v == 1_704_067_200_000_000
        # tz-aware values keep their own zone
        aware = datetime.datetime(2024, 1, 1,
                                  tzinfo=datetime.timezone.utc)
        assert _py_scalar(aware) == 1_704_067_200_000_000
    finally:
        if old_tz is None:
            os.environ.pop("TZ", None)
        else:
            os.environ["TZ"] = old_tz
        time.tzset()


def test_repair_leaves_single_file_and_no_swap_dirs(tmp_path):
    """The dir-rename swap must leave exactly the consolidated file per
    touched partition and no .new-/.old- leftovers anywhere under
    docstore/ (recursive docstore readers would count them as extra
    content)."""
    from miru_ray.index.repair import repair_index
    t = generate_transcripts("xs")
    a = str(tmp_path / "a.parquet")
    pq.write_table(t, a)
    idir = str(tmp_path / "idx")
    build_index(a, idir, CFG)
    conv0 = t["conv_id"][0].as_py()
    row0 = t.filter(pa.compute.equal(t["conv_id"], conv0)).slice(0, 1)
    rep = row0.append_column("version", pa.array([7], pa.int64()))
    m = repair_index(idir, rep)
    assert m["stages"]["repair"]["applied"] == 1
    dstore = os.path.join(idir, "docstore")
    for d in os.listdir(dstore):
        assert ".new-" not in d and ".old-" not in d
    touched = [int(p) for p in m["repairs"][-1]["applied_doc_ids"]]
    pid = touched[0] // CFG.docs_per_partition
    files = os.listdir(os.path.join(dstore, f"partition={pid}"))
    assert len(files) == 1 and files[0].startswith("repair-")
    assert not os.path.exists(os.path.join(idir,
                                           "docstore_repair_staging"))
