"""Versioned REPAIR / upsert (miru_ray.index.repair).

Reference semantics under test (MiruIndexer.java:20,105,143;
MiruPartitionAccessor.handleActivities:563-578):
  1. a re-delivered (conv_id, turn_idx) with HIGHER version replaces the
     doc in place — same doc id, queries see only v2
  2. version <= stored is DECLINED
  3. in-batch dedupe keeps the highest version (first delivery wins ties)
  4. repaired index == fresh build over the v2 input (byte-identical
     segments/doclen), and compaction preserves that
  5. repair UNHIDES a previously removed doc
  6. crash between staging and commit is replayable; readers refuse a
     mid-repair index
  7. live readers pick the repair up via Searcher.refresh_partitions
"""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.repair import recover_pending_repair, repair_index
from miru_ray.query.engine import Searcher
from miru_ray.util import read_json

MARK = "zzyzxrepairmark"


def _copy_index(src, tmp_path, name="ridx"):
    dst = str(tmp_path / name)
    shutil.copytree(src, dst)
    return dst


def _docstore_rows(index_dir, doc_ids):
    t = pads.dataset(os.path.join(index_dir, "docstore"),
                     format="parquet").to_table()
    rows = t.filter(pc.is_in(t["doc_id"],
                             value_set=pa.array(doc_ids, pa.int64())))
    return rows.sort_by("doc_id")


def _repair_rows(index_dir, doc_ids, text, version):
    """Repair table: the docs' original rows with text + version swapped
    (a repair replaces the WHOLE doc, so every field column rides)."""
    rows = _docstore_rows(index_dir, doc_ids)
    rows = rows.drop_columns([c for c in ("doc_id", "version")
                              if c in rows.schema.names])
    rows = rows.set_column(rows.schema.get_field_index("text"), "text",
                           pa.array([text] * rows.num_rows, pa.string()))
    return rows.append_column(
        "version", pa.array([version] * rows.num_rows, pa.int64()))


def _seg_hashes(index_dir):
    out = {}
    for sub in ("segments", "doclen"):
        for root, _d, files in os.walk(os.path.join(index_dir, sub)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                        open(p, "rb").read()).hexdigest()
    return out


def test_repair_applies_higher_version(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    before = read_json(os.path.join(idx, "manifest.json"))
    doc_ids = [3, 7, 1500]  # spans two 1000-doc partitions
    m = repair_index(idx, _repair_rows(idx, doc_ids, f"{MARK} alpha", 1))
    assert m["stages"]["repair"]["applied"] == 3
    assert m["stages"]["repair"]["partitions"] == 2
    assert m["n_docs"] == before["n_docs"]       # upsert, not append
    assert m["total_len"] != before["total_len"]  # text changed
    s = Searcher(idx, num_readers=2)
    try:
        assert s.count(MARK) == 3
        hits = s.topk(MARK, k=10)
        assert sorted(hits["doc_id"].to_pylist()) == doc_ids  # ids REUSED
    finally:
        s.close()


def test_repair_declines_stale_and_equal_versions(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    repair_index(idx, _repair_rows(idx, [5], f"{MARK} zzv1", 1))
    # equal version → declined (MiruIndexer.java:143: <= is declined)
    m = repair_index(idx, _repair_rows(idx, [5], f"{MARK} zzequal1", 1))
    assert m["stages"]["repair"]["applied"] == 0
    assert m["stages"]["repair"]["skipped"] == 1
    # lower version → declined
    m = repair_index(idx, _repair_rows(idx, [5], f"{MARK} zzstale0", 0))
    assert m["stages"]["repair"]["applied"] == 0
    # higher version → applied
    m = repair_index(idx, _repair_rows(idx, [5], f"{MARK} zzv2", 2))
    assert m["stages"]["repair"]["applied"] == 1
    s = Searcher(idx, num_readers=1)
    try:
        assert s.count("zzv2") == 1 and s.count("zzequal1") == 0
        assert s.count("zzstale0") == 0 and s.count("zzv1") == 0
    finally:
        s.close()


def test_repair_batch_dedupe_keeps_highest_version_first_wins(
        xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    batch = pa.concat_tables([
        _repair_rows(idx, [9], f"{MARK} zzfirst1 five", 5),
        _repair_rows(idx, [9], f"{MARK} zzsecond2 five", 5),  # tie: first wins
        _repair_rows(idx, [9], f"{MARK} zzthree3", 3),        # lower: dropped
    ])
    m = repair_index(idx, batch)
    assert m["stages"]["repair"]["applied"] == 1
    s = Searcher(idx, num_readers=1)
    try:
        assert s.count("zzfirst1") == 1
        assert s.count("zzsecond2") == 0 and s.count("zzthree3") == 0
    finally:
        s.close()


def test_repair_equals_fresh_build_and_compacts(xs_table, tmp_path):
    """Repaired index is byte-identical (segments + doclen) to a fresh
    build over the v2 input, and compaction preserves the equivalence."""
    from miru_ray.index.compact import compact_index
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    v1_path = str(tmp_path / "v1.parquet")
    pq.write_table(xs_table, v1_path)
    idx = str(tmp_path / "idx_v1")
    build_index(v1_path, idx, cfg)

    doc_ids = [2, 1001]
    rep = _repair_rows(idx, doc_ids, f"{MARK} fresh parity", 7)
    repair_index(idx, rep)

    # fresh build over the SAME logical v2 corpus
    key = pa.table({
        "conv_id": rep["conv_id"],
        "turn_idx": pc.cast(rep["turn_idx"], xs_table["turn_idx"].type)})
    tagged = xs_table.append_column(
        "_row", pa.array(np.arange(xs_table.num_rows)))
    hit = (tagged.select(["conv_id", "turn_idx", "_row"])
           .join(key.append_column("_hit", pa.array([1, 1])),
                 keys=["conv_id", "turn_idx"], join_type="left outer"))
    hit = hit.sort_by("_row")
    mask = pc.is_valid(hit["_hit"])
    texts = pc.if_else(mask, pa.scalar(f"{MARK} fresh parity"),
                       xs_table["text"])
    v2 = xs_table.set_column(xs_table.schema.get_field_index("text"),
                             "text", texts)
    v2_path = str(tmp_path / "v2.parquet")
    pq.write_table(v2, v2_path)
    idx2 = str(tmp_path / "idx_v2")
    build_index(v2_path, idx2, cfg)

    assert _seg_hashes(idx) == _seg_hashes(idx2)
    m1 = read_json(os.path.join(idx, "manifest.json"))
    m2 = read_json(os.path.join(idx2, "manifest.json"))
    for k in ("n_docs", "n_convs", "total_len", "avgdl"):
        assert m1[k] == m2[k], k

    c1, c2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    compact_index(idx, c1)
    compact_index(idx2, c2)
    assert _seg_hashes(c1) == _seg_hashes(c2)


def test_repair_unhides_removed_doc(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    s = Searcher(idx, num_readers=1)
    try:
        s.remove_docs([11])
        assert s.count(MARK) == 0
        repair_index(idx, _repair_rows(idx, [11], f"{MARK} reborn", 1))
        s.refresh_partitions()
        # repairs also unhide (MiruIndexer.java:105)
        assert s.count(MARK) == 1
        assert 11 not in read_json(os.path.join(idx, "tombstones.json"))
    finally:
        s.close()


def test_repair_crash_is_replayable_and_readers_refuse(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    with pytest.raises(RuntimeError, match="simulated crash"):
        repair_index(idx, _repair_rows(idx, [4], f"{MARK} zzcrashy1", 1),
                     _crash_after_staging=True)
    # mid-repair index refuses to serve (duplicated rows risk)
    with pytest.raises(RuntimeError, match="REPAIR pending"):
        Searcher(idx, num_readers=1, use_actors=False)
    m = recover_pending_repair(idx)
    assert m["stages"]["repair"]["applied"] == 1
    s = Searcher(idx, num_readers=1)
    try:
        assert s.count("zzcrashy1") == 1
    finally:
        s.close()
    # replay is idempotent and commit clears the sidecar
    assert recover_pending_repair(idx) is None
    assert len(read_json(os.path.join(idx, "manifest.json"))["repairs"]) == 1


def test_repair_rejects_extension_and_unknown_conv(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    rows = _repair_rows(idx, [0], f"{MARK} nope", 1)
    ti = rows.schema.get_field_index("turn_idx")
    beyond = rows.set_column(ti, "turn_idx",
                             pa.array([10_000_000],
                                      rows["turn_idx"].type))
    with pytest.raises(ValueError, match="outside the conversation"):
        repair_index(idx, beyond)
    ci = rows.schema.get_field_index("conv_id")
    unknown = rows.set_column(ci, "conv_id",
                              pa.array(["conv-nope"], pa.string()))
    with pytest.raises(ValueError, match="unknown conversation"):
        repair_index(idx, unknown)
    with pytest.raises(ValueError, match="version"):
        repair_index(idx, rows.drop_columns(["version"]))


def test_live_refresh_sees_repair(xs_index, tmp_path):
    idx = _copy_index(xs_index, tmp_path)
    s = Searcher(idx, num_readers=2)
    try:
        assert s.count(MARK) == 0
        # warm the driver stats cache on a real term so refresh must
        # invalidate it
        hits_before = s.topk("alpha", k=5)
        repair_index(idx, _repair_rows(idx, [8, 1200], f"{MARK} live", 2))
        n = s.refresh_partitions()
        assert n >= 2  # both touched partitions reloaded (per reader)
        assert s.count(MARK) == 2
        assert sorted(s.topk(MARK, k=5)["doc_id"].to_pylist()) == [8, 1200]
        # a second refresh scoped to the touched pids only also works
        assert s.refresh_partitions([0, 1]) >= 2
        assert hits_before is not None
    finally:
        s.close()


def test_repair_version_gate_survives_later_append(xs_table, tmp_path):
    """Mixed-schema partitions must keep the version gate exact:
    ``ParquetDataset.read()`` takes its schema from the FIRST fragment,
    and an append writes version-less ``append-*`` files (which sort
    before ``repair-*``) into the boundary partition — naive dataset
    reads would silently DROP the repaired versions and let a stale
    re-delivery pass the ``new > stored`` gate (MiruIndexer.java:143)."""
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    first = set(convs[: len(convs) // 2])
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a_path)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b_path)
    idx = str(tmp_path / "idx")
    m0 = build_index([a_path], idx, cfg)
    # repair a doc in the BOUNDARY partition (the one the append will
    # also write into), at version 5
    doc = int(m0["n_docs"]) - 1
    m1 = repair_index(idx, _repair_rows(idx, [doc], f"{MARK} vfive", 5))
    assert m1["stages"]["repair"]["applied"] == 1
    # incremental append lands version-less append-* files there
    build_index([a_path, b_path], idx, cfg)
    pdir = os.path.join(idx, "docstore",
                        f"partition={doc // cfg.docs_per_partition}")
    names = sorted(os.listdir(pdir))
    assert any(n.startswith("append-") for n in names)
    assert any(n.startswith("repair-") for n in names)
    assert names[0].startswith("append-")  # the schema-eating order
    # stale re-delivery (version 1 <= stored 5) must still be DECLINED
    m2 = repair_index(idx, _repair_rows(idx, [doc], f"{MARK} vone", 1))
    assert m2["stages"]["repair"]["applied"] == 0
    assert m2["stages"]["repair"]["skipped"] == 1
    # and a genuinely higher version still applies
    m3 = repair_index(idx, _repair_rows(idx, [doc], f"{MARK} vsix", 6))
    assert m3["stages"]["repair"]["applied"] == 1
    s = Searcher(idx, num_readers=1)
    try:
        assert s.count("vone") == 0
        assert s.count("vsix") == 1 and s.count("vfive") == 0
    finally:
        s.close()
