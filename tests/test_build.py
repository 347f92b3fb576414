import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq

from miru_ray.index.segments import SegmentReader
from miru_ray.tokenize import py_tokenize
from miru_ray.util import read_json


def _docstore(index_dir):
    return pq.ParquetDataset(os.path.join(index_dir, "docstore")).read().to_pandas()


def test_doc_id_assignment(xs_index, xs_table):
    src = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ds = _docstore(xs_index).sort_values("doc_id").reset_index(drop=True)
    assert (ds["doc_id"].to_numpy() == np.arange(len(ds))).all()
    assert (ds["conv_id"].to_numpy() == src["conv_id"].to_numpy()).all()
    assert (ds["turn_idx"].to_numpy() == src["turn_idx"].to_numpy()).all()


def test_per_turn_text_equality(xs_index, xs_table):
    """The input_hint invariant: per-turn text equality under stable order."""
    src = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    ds = _docstore(xs_index).sort_values("doc_id").reset_index(drop=True)
    assert (ds["text"].to_numpy() == src["text"].to_numpy()).all()


def test_doc_len(xs_index, xs_oracle):
    """Doc lengths from the encode-stage doclen sidecars (summed across
    shard partials, zero-filled) must equal the oracle's token counts."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq
    dl = np.zeros(xs_oracle.n_docs, np.int64)
    for p in glob.glob(os.path.join(xs_index, "doclen", "*.parquet")):
        t = pq.read_table(p)
        dl[t["doc_id"].to_numpy()] += t["dl"].to_numpy()
    assert (dl == xs_oracle.doc_len).all()


def test_collection_stats(xs_index, xs_oracle):
    m = read_json(os.path.join(xs_index, "manifest.json"))
    assert m["n_docs"] == xs_oracle.n_docs
    assert m["total_len"] == int(xs_oracle.doc_len.sum())
    assert abs(m["avgdl"] - xs_oracle.avgdl) < 1e-9


def test_global_df_cf_parity(xs_index, xs_oracle):
    m = read_json(os.path.join(xs_index, "manifest.json"))
    got: dict[str, list[int]] = {}
    for s in m["segments"]:
        r = SegmentReader(os.path.join(xs_index, s["path"]))
        for i, term in enumerate(r.terms):
            d, c = r.stats(i)
            a = got.setdefault(term, [0, 0])
            a[0] += d
            a[1] += c
    text_terms = {k: v for k, v in got.items()
                  if not k.startswith(("role:", "tool:"))}
    oracle_text = {k for k in xs_oracle.df_c
                   if not k.startswith(("role:", "tool:"))}
    assert set(text_terms) == oracle_text
    for k, (d, c) in text_terms.items():
        assert d == xs_oracle.df_c[k], k
        assert c == xs_oracle.cf_c[k], k


def test_posting_integrity(xs_index, xs_oracle):
    """Decoded postings == sorted oracle doc lists; tf values match."""
    m = read_json(os.path.join(xs_index, "manifest.json"))
    merged: dict[str, list] = {}
    for s in m["segments"]:
        r = SegmentReader(os.path.join(xs_index, s["path"]))
        for i, term in enumerate(r.terms):
            docs, tfs = r.postings(i)
            assert (np.diff(docs) > 0).all()
            blast, bmax = r.block_meta(i)
            assert blast[-1] == docs[-1]
            assert bmax.max() == tfs.max()
            merged.setdefault(term, []).append((docs, tfs))
    rng = np.random.default_rng(3)
    terms = rng.choice(sorted(xs_oracle.postings), size=200, replace=False)
    for term in terms:
        parts = merged[term]
        docs = np.concatenate([d for d, _ in parts])
        tfs = np.concatenate([t for _, t in parts])
        order = np.argsort(docs)
        docs, tfs = docs[order], tfs[order]
        exp_docs = np.array(xs_oracle.postings[term], np.int64)
        assert (docs == exp_docs).all(), term
        exp_tf = np.array([xs_oracle.tf[d][term] for d in exp_docs])
        assert (tfs == exp_tf).all(), term


def test_keyword_field_postings(xs_index, xs_oracle):
    m = read_json(os.path.join(xs_index, "manifest.json"))
    role_df = Counter()
    for s in m["segments"]:
        r = SegmentReader(os.path.join(xs_index, s["path"]))
        for i, term in enumerate(r.terms):
            if term.startswith("role:"):
                role_df[term] += r.stats(i)[0]
    exp = Counter(f"role:{v}" for v in xs_oracle.df["role"])
    assert role_df == exp
