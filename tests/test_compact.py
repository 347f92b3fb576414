"""Compaction: merge partitions + expunge tombstones into a new index.

Invariants:
  1. No tombstones, same layout → byte-identical segment/doclen files
     (decode → shuffle → re-encode is lossless and deterministic).
  2. Tombstones that are whole conversations or turn SUFFIXES → compacted
     index is byte-identical to a fresh build over the FILTERED input
     (the expunge-deletes oracle).
  3. Larger docs_per_partition → fewer segments, identical answers.
  4. A compacted index stays appendable (the sip path keeps working).
"""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.compact import compact_index
from miru_ray.query.engine import Searcher
from miru_ray.util import read_json


def _parquet_hashes(index_dir):
    out = {}
    for sub in ("segments", "doclen"):
        for root, _dirs, files in os.walk(os.path.join(index_dir, sub)):
            for f in sorted(files):
                if not f.endswith(".parquet"):
                    continue
                p = os.path.join(root, f)
                out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
    return out


def test_compact_noop_is_byte_identical(xs_index, tmp_path):
    dst = str(tmp_path / "noop")
    m = compact_index(xs_index, dst)
    src_m = read_json(os.path.join(xs_index, "manifest.json"))
    assert _parquet_hashes(xs_index) == _parquet_hashes(dst)
    for k in ("n_docs", "n_convs", "total_len", "avgdl", "partitions"):
        assert m[k] == src_m[k], k
    assert m["compaction"]["purged_docs"] == 0
    # conv offsets survive unchanged
    a = pq.read_table(os.path.join(xs_index, "conv_offsets.parquet"))
    b = pq.read_table(os.path.join(dst, "conv_offsets.parquet"))
    assert a.equals(b)


def test_compact_expunge_equals_fresh_build(xs_table, tmp_path):
    """Removing whole convs / turn suffixes then compacting == building
    from scratch over the filtered input (byte-identical files)."""
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    src_path = str(tmp_path / "in.parquet")
    pq.write_table(xs_table, src_path)
    src_idx = str(tmp_path / "src")
    build_index(src_path, src_idx, cfg)

    off = pq.read_table(os.path.join(src_idx, "conv_offsets.parquet"))
    convs = off["conv_id"].to_pylist()
    offs = off["offset"].to_numpy()
    cnts = off["cnt"].to_numpy()
    # whole conversation #3 + last 2 turns of a conversation with >3 turns
    whole = 3
    suffix = next(i for i in range(len(convs))
                  if i != whole and cnts[i] > 3)
    dead = (list(range(int(offs[whole]), int(offs[whole] + cnts[whole])))
            + [int(offs[suffix] + cnts[suffix] - 2),
               int(offs[suffix] + cnts[suffix] - 1)])
    s = Searcher(src_idx, num_readers=1, use_actors=False)
    assert s.remove_docs(dead) == len(dead)
    s.close()

    dst = str(tmp_path / "dst")
    m = compact_index(src_idx, dst)
    assert m["compaction"]["purged_docs"] == len(dead)

    # fresh build over the filtered input
    df = xs_table.to_pandas()
    keep = ~(
        (df["conv_id"] == convs[whole])
        | ((df["conv_id"] == convs[suffix])
           & (df["turn_idx"] >= cnts[suffix] - 2)))
    filt_path = str(tmp_path / "filtered.parquet")
    pq.write_table(pa.Table.from_pandas(df[keep], preserve_index=False),
                   filt_path)
    ref_idx = str(tmp_path / "ref")
    ref_m = build_index(filt_path, ref_idx, cfg)

    assert _parquet_hashes(dst) == _parquet_hashes(ref_idx)
    for k in ("n_docs", "n_convs", "total_len", "avgdl", "partitions"):
        assert m[k] == ref_m[k], k
    # offsets tables agree (the append cursor is consistent)
    a = pq.read_table(os.path.join(dst, "conv_offsets.parquet"))
    b = pq.read_table(os.path.join(ref_idx, "conv_offsets.parquet"))
    assert a.equals(b)
    # and the two indexes answer identically
    sa = Searcher(dst, num_readers=1, use_actors=False)
    sb = Searcher(ref_idx, num_readers=1, use_actors=False)
    for q in (["alpha"], ["query", "search"], "role:user alpha"):
        assert sa.topk(q, 10, "bm25").equals(sb.topk(q, 10, "bm25"))
    assert sa.topk(["alpha"], 5, "time").equals(sb.topk(["alpha"], 5, "time"))
    sa.close()
    sb.close()


def test_compact_merges_partitions(xs_index, xs_searcher, tmp_path):
    """Bigger docs_per_partition: fewer segment files, same answers
    (renumbering is the identity when nothing is tombstoned)."""
    src_m = read_json(os.path.join(xs_index, "manifest.json"))
    dst = str(tmp_path / "merged")
    m = compact_index(xs_index, dst, docs_per_partition=10_000, num_shards=1)
    assert len(m["partitions"]) < len(src_m["partitions"])
    assert len(m["segments"]) < len(src_m["segments"])
    assert m["n_docs"] == src_m["n_docs"]
    assert m["total_len"] == src_m["total_len"]
    s = Searcher(dst, num_readers=1, use_actors=False)
    for q in (["alpha"], ["query", "search"], "role:user alpha"):
        assert s.topk(q, 10, "bm25").equals(xs_searcher.topk(q, 10, "bm25"))
    assert s.count(["alpha"]) == xs_searcher.count(["alpha"])
    s.close()


def test_append_after_compact(xs_table, tmp_path):
    """The compacted index honours the append contract: indexing a
    superset input appends instead of rebuilding, and the result matches
    a one-shot build at the compacted layout."""
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

    half = str(tmp_path / "half")
    build_index([a_path], half, IndexConfig(docs_per_partition=500,
                                            num_shards=2))
    dst = str(tmp_path / "compacted")
    compact_index(half, dst, docs_per_partition=1500, num_shards=1)

    cfg2 = IndexConfig(docs_per_partition=1500, num_shards=1)
    m_incr = build_index([a_path, b_path], dst, cfg2)
    assert "append" in m_incr["stages"]

    ref = str(tmp_path / "ref")
    m_ref = build_index([a_path, b_path], ref, cfg2)
    for k in ("n_docs", "n_convs", "total_len", "avgdl", "partitions"):
        assert m_incr[k] == m_ref[k], k
    assert _parquet_hashes(dst) == _parquet_hashes(ref)


def test_compact_refuses_dirty_destination(xs_index, tmp_path):
    dst = str(tmp_path / "dst")
    compact_index(xs_index, dst)
    import pytest
    with pytest.raises(FileExistsError):
        compact_index(xs_index, dst)
    # overwrite replaces
    m = compact_index(xs_index, dst, overwrite=True)
    assert m["n_docs"] > 0


def test_compact_destination_safety(xs_index, tmp_path):
    """The destination guard never deletes non-index data and never lets
    dst alias/contain the source index it is reading from."""
    import pytest
    # dst == src: refused before anything is touched
    with pytest.raises(ValueError, match="source index"):
        compact_index(xs_index, xs_index, overwrite=True)
    # dst an ancestor of src: refused
    with pytest.raises(ValueError, match="source index"):
        compact_index(xs_index, os.path.dirname(xs_index), overwrite=True)
    # a non-empty directory that is NOT an index: refused even with
    # overwrite=True (it could be anything — a typo'd home directory)
    junk = tmp_path / "precious"
    junk.mkdir()
    (junk / "notes.txt").write_text("do not delete")
    with pytest.raises(FileExistsError, match="not an index"):
        compact_index(xs_index, str(junk), overwrite=True)
    assert (junk / "notes.txt").read_text() == "do not delete"
    # crashed-compaction debris (_COMPACTING marker, no manifest) is this
    # function's own output: a re-run clears it without overwrite
    crashed = tmp_path / "crashed"
    crashed.mkdir()
    (crashed / "_COMPACTING.json").write_text("{}")
    (crashed / "docstore").mkdir()
    m = compact_index(xs_index, str(crashed))
    assert m["n_docs"] > 0
    assert not os.path.exists(crashed / "_COMPACTING.json")


def test_compact_rejects_bad_layout_knobs(xs_index, tmp_path):
    import pytest
    for kw in ({"docs_per_partition": 0}, {"docs_per_partition": -5},
               {"num_shards": 0}, {"num_shards": -1}):
        with pytest.raises(ValueError, match="positive"):
            compact_index(xs_index, str(tmp_path / "x"), **kw)


def test_purged_stages_never_satisfy_full_build(xs_table, tmp_path):
    """Tag contract: compaction stamps tombstone-FILTERED outputs with a
    purge-marked tag, so a later build_index over the FULL input (config
    differing only in an execution knob → full-rebuild path with the same
    content tag) clears them instead of adopting purged segments/offsets
    as a fresh full build."""
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    src_path = str(tmp_path / "in.parquet")
    pq.write_table(xs_table, src_path)
    src_idx = str(tmp_path / "src")
    full_m = build_index([src_path], src_idx, cfg)
    s = Searcher(src_idx, num_readers=1, use_actors=False)
    s.remove_docs([0, 1, 2])
    s.close()

    dst = str(tmp_path / "dst")
    m_comp = compact_index(src_idx, dst)
    assert m_comp["n_docs"] == full_m["n_docs"] - 3

    # io_compression is in to_dict (manifest mismatch → rebuild path) but
    # NOT in content_dict (stage tags would match absent the purge marker)
    import dataclasses
    cfg2 = dataclasses.replace(cfg, io_compression="snappy")
    m2 = build_index([src_path], dst, cfg2)
    assert "append" not in m2.get("stages", {})
    assert m2["n_docs"] == full_m["n_docs"]  # purged docs are BACK
    assert m2["total_len"] == full_m["total_len"]


def test_compact_mid_conversation_removal(xs_index, tmp_path):
    """Mid-conversation tombstones (no fresh-build analogue) still
    compact correctly: answers equal the tombstone-masked source."""
    src = str(tmp_path / "src")
    shutil.copytree(xs_index, src)
    s = Searcher(src, num_readers=1, use_actors=False)
    hot = s.topk(["alpha"], 5, "bm25")["doc_id"].to_pylist()
    dead = sorted(hot[:2])
    s.remove_docs(dead)
    masked_count = s.count(["alpha"])
    masked_docs = set(s.topk(["alpha"], 50, "time")["doc_id"].to_pylist())
    s.close()

    dst = str(tmp_path / "dst")
    m = compact_index(src, dst)
    assert m["n_docs"] == read_json(
        os.path.join(src, "manifest.json"))["n_docs"] - len(dead)
    sc = Searcher(dst, num_readers=1, use_actors=False)
    assert sc.count(["alpha"]) == masked_count
    # doc ids shift down by the number of tombstones below them
    got = set(sc.topk(["alpha"], 50, "time")["doc_id"].to_pylist())
    dead_arr = np.array(dead, np.int64)
    expect = {int(d - np.searchsorted(dead_arr, d)) for d in masked_docs}
    assert got == expect
    sc.close()
