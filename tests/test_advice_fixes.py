"""Regression tests for the round-1 ADVICE findings (stale rebuilds, WAND
tombstone bypass, append crash-retry with a different file set, pure-negative
queries, inline doc-id validation)."""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index, make_postings_fn
from miru_ray.query.engine import Searcher
from miru_ray.query.parser import parse_query


def _seg_hashes(index_dir):
    out = {}
    for root, _dirs, files in os.walk(os.path.join(index_dir, "segments")):
        for f in sorted(files):
            if f.startswith("_"):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                open(p, "rb").read()).hexdigest()
    return out


def test_rebuild_with_changed_config_rewrites_segments(xs_path, tmp_path):
    """ADVICE r01 (high): rebuilding into an existing dir with changed
    config must rewrite segments + docstore, not serve stale bytes."""
    d = str(tmp_path / "idx")
    cfg1 = IndexConfig(docs_per_partition=1000, num_shards=2)
    cfg2 = IndexConfig(docs_per_partition=1000, num_shards=2,
                       remove_stopwords=True)
    build_index(xs_path, d, cfg1)
    stale = _seg_hashes(d)
    build_index(xs_path, d, cfg2, overwrite=True)
    rebuilt = _seg_hashes(d)
    fresh_dir = str(tmp_path / "fresh")
    build_index(xs_path, fresh_dir, cfg2)
    assert rebuilt == _seg_hashes(fresh_dir)
    assert rebuilt != stale
    # and WITHOUT overwrite: a config change is detected via the stage tags
    build_index(xs_path, d, cfg1)
    assert _seg_hashes(d) == stale


def test_wand_respects_tombstones(xs_index, tmp_path):
    """ADVICE r01 (medium): WAND must not return tombstoned docs."""
    d = str(tmp_path / "idx_copy")
    shutil.copytree(xs_index, d)
    s = Searcher(d, num_readers=1, use_actors=False)
    base = s.topk(["alpha", "query"], 10, "bm25", use_wand=True)
    victim = int(base["doc_id"][0].as_py())
    s.remove_docs([victim])
    after = s.topk(["alpha", "query"], 10, "bm25", use_wand=True)
    assert victim not in after["doc_id"].to_pylist()
    # non-WAND path agrees
    plain = s.topk(["alpha", "query"], 10, "bm25", use_wand=False)
    assert after.equals(plain)
    s.close()


def test_append_crash_retry_with_different_fileset(xs_table, tmp_path,
                                                   monkeypatch):
    """ADVICE r01 (medium): a crashed append retried with a DIFFERENT
    (superset) file set must not leave attempt-1 docstore rows behind."""
    from miru_ray.index import build as B
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    third = len(convs) // 3
    parts = [set(convs[:third]), set(convs[third:2 * third]),
             set(convs[2 * third:])]
    paths = []
    for i, grp in enumerate(parts):
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(grp)],
                                            preserve_index=False), p)
        paths.append(p)
    d = str(tmp_path / "idx")
    build_index([paths[0]], d, cfg)

    orig = B.append_index
    monkeypatch.setattr(
        B, "append_index",
        lambda *a, **k: orig(*a, **k, _crash_after_docstore=True))
    with pytest.raises(RuntimeError, match="simulated"):
        build_index([paths[0], paths[1]], d, cfg)  # attempt 1 crashes
    monkeypatch.setattr(B, "append_index", orig)
    # retry with a LARGER file set (different fingerprint than attempt 1)
    m = build_index(paths, d, cfg)

    ds = pq.ParquetDataset(os.path.join(d, "docstore")).read()
    ids = ds["doc_id"].to_numpy()
    assert len(ids) == len(set(ids.tolist())) == m["n_docs"]
    full = str(tmp_path / "full")
    m2 = build_index(paths, full, cfg)
    assert m["n_docs"] == m2["n_docs"] and m["total_len"] == m2["total_len"]
    assert _seg_hashes(d) == _seg_hashes(full)


def test_pure_negative_query_matches_nothing(xs_searcher):
    """ADVICE r01 (low): '-spark' must return no results (Lucene MUST_NOT-
    only semantics), not every non-matching doc."""
    assert xs_searcher.count(parse_query("-alpha")) == 0
    assert xs_searcher.count(parse_query("NOT alpha")) == 0
    assert len(xs_searcher.topk(parse_query("-alpha"), 10, "bm25")) == 0
    # sanity: the positive version still matches
    assert xs_searcher.count(parse_query("alpha")) > 0


def test_inline_doc_id_assignment_validates_conv(xs_path):
    """ADVICE r01 (low): the offsets_ref postings path must raise on a
    conv_id missing from the offsets table, not silently mis-assign."""
    import ray
    cfg = IndexConfig()
    convs = np.array(["conv-a", "conv-b"], dtype=object)
    offs = np.array([0, 5], np.int64)
    fn = make_postings_fn(cfg, ray.put((convs, offs)))
    bad = pa.table({"conv_id": pa.array(["conv-zz"]),
                    "turn_idx": pa.array([0], pa.int32()),
                    "text": pa.array(["hello world"]),
                    "role": pa.array(["user"]),
                    "tool": pa.array([""])})
    with pytest.raises(ValueError, match="missing from offsets"):
        fn(bad)
    ok = pa.table({"conv_id": pa.array(["conv-b"]),
                   "turn_idx": pa.array([1], pa.int32()),
                   "text": pa.array(["hello world"]),
                   "role": pa.array(["user"]),
                   "tool": pa.array([""])})
    t = fn(ok)
    assert set(t["doc_id"].to_pylist()) == {6}
