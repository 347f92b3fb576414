"""Checkpoint/resume + partition invariance (FIXTURES.md §F4 inv. 5-6)."""

import hashlib
import os
import shutil

import numpy as np

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.query.engine import Searcher
from miru_ray.util import read_json


def _file_hashes(index_dir):
    out = {}
    for sub in ("segments", "doclen"):
        for root, _dirs, files in os.walk(os.path.join(index_dir, sub)):
            for f in sorted(files):
                p = os.path.join(root, f)
                out[os.path.relpath(p, index_dir)] = hashlib.sha256(
                    open(p, "rb").read()).hexdigest()
    return out


def test_resume_after_interrupt(xs_path, tmp_path):
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")

    ref = build_index(xs_path, a, cfg)

    # interrupted build: stop after docstore, then resume to completion
    r1 = build_index(xs_path, b, cfg, stop_after_stage="docstore")
    assert r1["incomplete"]
    r2 = build_index(xs_path, b, cfg)
    assert r2["stages"]["offsets"].get("skipped")
    assert r2["stages"]["docstore"].get("skipped")

    # byte-identical segments + identical manifest (minus timings)
    assert _file_hashes(a) == _file_hashes(b)
    for k in ("n_docs", "total_len", "avgdl", "partitions", "segments",
              "fingerprint", "config"):
        assert ref[k] == r2[k], k

    # idempotent re-invocation: manifest match → no-op
    r3 = build_index(xs_path, b, cfg)
    assert r3["n_docs"] == ref["n_docs"]


def test_partition_invariance(xs_path, xs_oracle, tmp_path):
    """Scores/ranks must not depend on partitioning (SURVEY.md §7.3)."""
    results = []
    for dpp, nsh in ((250, 1), (500, 3), (5000, 2)):
        d = str(tmp_path / f"p{dpp}")
        build_index(xs_path, d, IndexConfig(docs_per_partition=dpp,
                                            num_shards=nsh))
        s = Searcher(d, num_readers=2)
        hot = sorted(xs_oracle.df_c, key=lambda t: -xs_oracle.cf_c[t])
        hot = [t for t in hot if not t.startswith(("role:", "tool:"))][:3]
        r = s.topk(hot[:2], 25, "bm25")
        results.append((r["doc_id"].to_pylist(), r["score"].to_pylist()))
        s.close()
        shutil.rmtree(d)
    assert results[0] == results[1] == results[2]


def test_stale_manifest_rebuilds(xs_path, tmp_path):
    d = str(tmp_path / "c")
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    build_index(xs_path, d, cfg)
    m = read_json(os.path.join(d, "manifest.json"))
    cfg2 = IndexConfig(docs_per_partition=1000, num_shards=2,
                       remove_stopwords=True)
    m2 = build_index(xs_path, d, cfg2, overwrite=True)
    assert m2["total_len"] < m["total_len"]  # stopwords removed → shorter


def test_incremental_append(xs_table, tmp_path):
    """Sip-analogue append: index half the conversations, append the rest;
    result must be identical to a one-shot build (byte-identical segments,
    same manifest stats)."""
    import pyarrow.parquet as pq

    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    # split at a conversation boundary, second half sorts after the first
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    first = set(convs[: len(convs) // 2])
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    import pyarrow as pa
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a_path)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b_path)

    full_dir = str(tmp_path / "full")
    incr_dir = str(tmp_path / "incr")
    m_full = build_index([a_path, b_path], full_dir, cfg)
    m_half = build_index([a_path], incr_dir, cfg)
    assert m_half["n_docs"] < m_full["n_docs"]
    m_incr = build_index([a_path, b_path], incr_dir, cfg)
    assert "append" in m_incr["stages"]

    for k in ("n_docs", "n_convs", "total_len", "avgdl", "partitions"):
        assert m_full[k] == m_incr[k], k
    assert ([(s["pid"], s["shard"], s["n_terms"], s["cf_text"])
             for s in m_full["segments"]]
            == [(s["pid"], s["shard"], s["n_terms"], s["cf_text"])
                for s in m_incr["segments"]])
    assert _file_hashes(full_dir) == _file_hashes(incr_dir)

    # query equivalence
    sf = Searcher(full_dir, num_readers=1)
    si = Searcher(incr_dir, num_readers=1)
    for terms in (["alpha"], ["query", "search"]):
        a = sf.topk(terms, 10, "bm25")
        b = si.topk(terms, 10, "bm25")
        assert a.equals(b)
    sf.close()
    si.close()


def test_append_rejects_continued_conversation(xs_table, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"])
    # split one conversation MID-WAY: append must refuse
    conv0 = df["conv_id"].iloc[0]
    g = df[df["conv_id"] == conv0]
    rest = df[df["conv_id"] != conv0]
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(
        pd_concat([rest, g.head(len(g) // 2)]), preserve_index=False), a_path)
    pq.write_table(pa.Table.from_pandas(g.tail(len(g) - len(g) // 2),
                                        preserve_index=False), b_path)
    d = str(tmp_path / "idx")
    build_index([a_path], d, cfg)
    import pytest as _pytest
    # either guard may fire first: continued-conv turn_idx isn't 0-based
    # (contiguity check) or the conv already exists (clash check)
    with _pytest.raises(ValueError, match="contiguous|conversation"):
        build_index([a_path, b_path], d, cfg)


def pd_concat(frames):
    import pandas as pd
    return pd.concat(frames, ignore_index=True)


def test_append_crash_resume(xs_table, tmp_path, monkeypatch):
    """A crashed append retried to completion must equal a clean append
    (no duplicated docstore rows, idempotent segment merge)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.index import build as B
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
    d = str(tmp_path / "idx")
    build_index([a_path], d, cfg)

    orig = B.append_index
    monkeypatch.setattr(
        B, "append_index",
        lambda *a, **k: orig(*a, **k, _crash_after_docstore=True))
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="simulated"):
        build_index([a_path, b_path], d, cfg)
    monkeypatch.setattr(B, "append_index", orig)
    m = build_index([a_path, b_path], d, cfg)  # retry completes

    # no duplicated docstore rows
    import os
    ds = pq.ParquetDataset(os.path.join(d, "docstore")).read()
    ids = ds["doc_id"].to_numpy()
    assert len(ids) == len(set(ids.tolist())) == m["n_docs"]
    # equals a clean one-shot build
    full = str(tmp_path / "full")
    m2 = build_index([a_path, b_path], full, cfg)
    assert m["n_docs"] == m2["n_docs"] and m["total_len"] == m2["total_len"]
    assert _file_hashes(d) == _file_hashes(full)


def test_groupby_shuffle_mode_equivalent(xs_path, tmp_path):
    """The Ray-native groupby shuffle must produce byte-identical segments
    to the default external shuffle."""
    a = str(tmp_path / "ext")
    b = str(tmp_path / "grp")
    build_index(xs_path, a, IndexConfig(docs_per_partition=1000, num_shards=2))
    build_index(xs_path, b, IndexConfig(docs_per_partition=1000, num_shards=2,
                                        shuffle_mode="groupby"))
    assert _file_hashes(a) == _file_hashes(b)
