"""Post-commit gatherer hook + sync/replication tool."""

import hashlib
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

from miru_ray.index.gather import gather_terms
from miru_ray.index.sync import sync_index, verify_sync
from miru_ray.query.engine import Searcher
from miru_ray.query.filter import Term
from miru_ray.util import read_json


def _first_token_gatherer(t: pa.Table) -> pa.Table:
    """Derive `first:<tok>` from the stored text (FullTextTermProvider
    shape: externally-derived (field, value, ids))."""
    docs, terms = [], []
    for d, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = (txt or "").lower().split()
        if toks:
            docs.append(d)
            terms.append("first:" + "".join(c for c in toks[0]
                                            if c.isalnum()))
    return pa.table({"term": pa.array(terms, pa.string()),
                     "doc_id": pa.array(docs, pa.int64()),
                     "tf": pa.array(np.ones(len(docs), np.int64))})


def _seg_hashes(d):
    out = {}
    for root, _dirs, files in os.walk(os.path.join(d, "segments")):
        for f in sorted(files):
            if f.startswith("_"):
                continue
            p = os.path.join(root, f)
            out[os.path.relpath(p, d)] = hashlib.sha256(
                open(p, "rb").read()).hexdigest()
    return out


def test_gather_enriches_and_resumes(xs_index, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    shutil.copytree(xs_index, a)
    shutil.copytree(xs_index, b)

    # full gather on a
    m = gather_terms(a, _first_token_gatherer, "firsttok")
    assert set(m["gather"]["firsttok"]["done_pids"]) \
        == {p["pid"] for p in m["partitions"]}

    # crashed-then-resumed gather on b must converge to the same bytes
    with pytest.raises(RuntimeError, match="simulated"):
        gather_terms(b, _first_token_gatherer, "firsttok",
                     _crash_after_pids=1)
    m2 = gather_terms(b, _first_token_gatherer, "firsttok")
    assert _seg_hashes(a) == _seg_hashes(b)
    assert m["segments"] == m2["segments"]

    # re-running a completed gather is a no-op
    m3 = gather_terms(a, _first_token_gatherer, "firsttok")
    assert _seg_hashes(a) == _seg_hashes(b) and m3["segments"] == m["segments"]

    # gathered terms are queryable through the normal Filter AST and agree
    # with a brute-force scan of the docstore
    s = Searcher(a, num_readers=1, use_actors=False)
    import pyarrow.parquet as pq
    ds = pq.ParquetDataset(os.path.join(a, "docstore")).read(
        columns=["doc_id", "text"])
    firsts = {}
    for d, txt in zip(ds["doc_id"].to_pylist(), ds["text"].to_pylist()):
        toks = (txt or "").lower().split()
        if toks:
            tok = "".join(c for c in toks[0] if c.isalnum())
            firsts.setdefault(tok, []).append(d)
    tok, expect = max(firsts.items(), key=lambda kv: len(kv[1]))
    got = sorted(s.match_docs(Term("first", tok)).tolist())
    assert got == sorted(expect)
    s.close()

    # namespace contract: bare terms are rejected
    def bad(t):
        return pa.table({"term": pa.array(["notnamespaced"]),
                         "doc_id": pa.array([0], pa.int64()),
                         "tf": pa.array([1], pa.int64())})
    c = str(tmp_path / "c")
    shutil.copytree(xs_index, c)
    with pytest.raises(Exception, match="namespaced"):
        gather_terms(c, bad, "bad")


def test_sync_copies_resumes_and_verifies(xs_index, tmp_path):
    dst = str(tmp_path / "replica")
    st = sync_index(xs_index, dst)
    assert st["copied"] > 0 and st["skipped"] == 0
    assert verify_sync(dst)["ok"]
    # replica answers queries identically
    s1 = Searcher(xs_index, num_readers=1, use_actors=False)
    s2 = Searcher(dst, num_readers=1, use_actors=False)
    a = s1.topk(["alpha", "query"], 10, "bm25")
    b = s2.topk(["alpha", "query"], 10, "bm25")
    assert a.equals(b)
    s1.close()
    s2.close()

    # idempotent re-sync copies nothing
    st2 = sync_index(xs_index, dst)
    assert st2["copied"] == 0 and st2["skipped"] == st["copied"]

    # a lost file is re-copied on the next sync; corruption is detected
    victim = next(rel for rel in read_json(
        os.path.join(dst, "sync_progress.json")) if "segments" in rel)
    os.remove(os.path.join(dst, victim))
    st3 = sync_index(xs_index, dst)
    assert st3["copied"] == 1
    with open(os.path.join(dst, victim), "ab") as f:
        f.write(b"corruption")
    v = verify_sync(dst)
    assert not v["ok"] and v["bad"] == [victim]
    sync_index(xs_index, dst)  # detected hash mismatch → re-copied
    assert verify_sync(dst)["ok"]


def test_sync_replicates_gathered_and_tombstoned_state(xs_index, tmp_path):
    """Sync after enrichment + removals: the replica serves identical
    answers including gathered terms and tombstones."""
    import numpy as np
    import pyarrow as pa

    from miru_ray.query.filter import Term
    src = str(tmp_path / "src")
    shutil.copytree(xs_index, src)

    def g(t: pa.Table) -> pa.Table:
        docs = t["doc_id"].to_pylist()
        return pa.table({"term": pa.array(["g:x"] * len(docs)),
                         "doc_id": pa.array(docs, pa.int64()),
                         "tf": pa.array(np.ones(len(docs), np.int64))})

    gather_terms(src, g, "gx")
    s0 = Searcher(src, num_readers=1, use_actors=False)
    victim = int(s0.topk(["alpha"], 1, "bm25")["doc_id"][0].as_py())
    s0.remove_docs([victim])
    s0.close()

    dst = str(tmp_path / "dst")
    sync_index(src, dst)
    assert verify_sync(dst)["ok"]
    s1 = Searcher(src, num_readers=1, use_actors=False)
    s2 = Searcher(dst, num_readers=1, use_actors=False)
    assert s1.count(Term("g", "x")) == s2.count(Term("g", "x")) > 0
    a = s1.topk(["alpha"], 10, "bm25")
    b = s2.topk(["alpha"], 10, "bm25")
    assert a.equals(b)
    assert victim not in b["doc_id"].to_pylist()
    s1.close()
    s2.close()
