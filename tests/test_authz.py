"""Authz composite filter + list-keyword indexing + latest/first columns."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.query.engine import Searcher
from miru_ray.query.filter import And, Authz, Term


def _tiny_table(n_convs=20, turns=5):
    rows = n_convs * turns
    conv = np.repeat([f"conv-{i:04d}" for i in range(n_convs)], turns)
    turn = np.tile(np.arange(turns, dtype=np.int32), n_convs)
    doc = np.arange(rows)
    text = np.array([f"alpha beta doc{d % 7}" if d % 2 else f"alpha gamma doc{d % 5}"
                     for d in doc], dtype=object)
    acl_flat = np.empty(2 * rows, dtype=object)
    acl_flat[0::2] = [f"grp{d % 3}" for d in doc]
    acl_flat[1::2] = [f"team{d % 4}" for d in doc]
    acl = pa.ListArray.from_arrays(
        pa.array(np.arange(0, 2 * rows + 1, 2), pa.int32()),
        pa.array(acl_flat, pa.string()))
    return pa.table({
        "conv_id": pa.array(conv, pa.string()),
        "turn_idx": pa.array(turn, pa.int32()),
        "role": pa.array(np.where(doc % 2, "assistant", "user")),
        "text": pa.array(text, pa.string()),
        "tool": pa.array([""] * rows, pa.string()),
        "ts": pa.array(np.int64(1_704_067_200_000_000) + doc * 1_000_000
                       ).cast(pa.timestamp("us")),
        "acl": acl,
    })


def test_authz_filter_matches_bruteforce(tmp_path):
    t = _tiny_table()
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=30, num_shards=2,
                      list_keyword_fields=("acl",))
    build_index([src], idx, cfg)
    s = Searcher(idx, num_readers=1, use_actors=False)

    # doc ids are the (conv_id, turn_idx) ordinal == construction order here
    acls = {i: {f"grp{i % 3}", f"team{i % 4}"} for i in range(t.num_rows)}
    principal = ("grp1", "team2")
    expect = sorted(i for i in range(t.num_rows)
                    if "beta" in t["text"][i].as_py()
                    and acls[i] & set(principal))
    ast = And((Term("text", "beta"), Authz(principal)))
    got = sorted(s.match_docs(ast).tolist())
    assert got == expect and len(expect) > 0

    # authz gates top-k but does not change scores: the gated result is a
    # sub-ranking of the ungated one restricted to visible docs
    full = s.topk(Term("text", "beta"), 100, "bm25").to_pandas()
    gated = s.topk(ast, 100, "bm25").to_pandas()
    visible = full[full["doc_id"].isin(expect)].reset_index(drop=True)
    assert gated["doc_id"].tolist() == visible["doc_id"].tolist()
    assert gated["score"].tolist() == visible["score"].tolist()

    # a principal with no matching ACL entries sees nothing
    assert s.count(And((Term("text", "beta"), Authz(("grp99",))))) == 0
    s.close()


def test_first_last_doc_columns(tmp_path):
    t = _tiny_table()
    src = str(tmp_path / "src.parquet")
    pq.write_table(t, src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=1000, num_shards=1,
                      list_keyword_fields=("acl",))
    build_index([src], idx, cfg)
    seg = pq.read_table(os.path.join(idx, "segments/p00000_s000.parquet"))
    terms = seg["term"].to_pylist()
    first = dict(zip(terms, seg["first_doc"].to_pylist()))
    last = dict(zip(terms, seg["last_doc"].to_pylist()))
    # 'beta' appears on odd docs only; 'alpha' on every doc
    assert first["alpha"] == 0 and last["alpha"] == t.num_rows - 1
    assert first["beta"] == 1 and last["beta"] == t.num_rows - 1
    assert first["acl:grp1"] == 1  # first doc with d%3==1
    assert last["acl:team3"] == t.num_rows - 1  # 99 % 4 == 3


def test_append_preserves_list_keyword_fields(tmp_path):
    """Incremental append with an ACL list field must equal a one-shot
    build byte-for-byte (the flagship config appends with acl indexed)."""
    import hashlib

    t = _tiny_table(n_convs=30, turns=4)
    df = t.to_pandas()
    convs = sorted(df["conv_id"].unique())
    first = set(convs[:15])
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b)
    cfg = IndexConfig(docs_per_partition=40, num_shards=2,
                      list_keyword_fields=("acl",))
    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    m_full = build_index([a, b], full, cfg)
    build_index([a], incr, cfg)
    m_incr = build_index([a, b], incr, cfg)
    assert "append" in m_incr["stages"]

    def hashes(d):
        out = {}
        for sub in ("segments", "doclen"):
            for root, _dirs, files in os.walk(os.path.join(d, sub)):
                for f in sorted(files):
                    if f.startswith("_"):
                        continue
                    p = os.path.join(root, f)
                    out[os.path.relpath(p, d)] = hashlib.sha256(
                        open(p, "rb").read()).hexdigest()
        return out

    assert hashes(full) == hashes(incr)
    s1 = Searcher(full, num_readers=1, use_actors=False)
    s2 = Searcher(incr, num_readers=1, use_actors=False)
    ast = And((Term("text", "beta"), Authz(("grp1", "team2"))))
    assert s1.match_docs(ast).tolist() == s2.match_docs(ast).tolist()
    assert s1.count(ast) > 0
    s1.close()
    s2.close()
