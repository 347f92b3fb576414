"""Positional postings: within-doc token positions stored per posting.

The reference answers phrase queries through Lucene's positional index
(``LuceneBackedQueryParser.java``); this engine's native rebuild stores
delta-gap varint position runs per posting (one run per (term, doc), run
length == tf) and answers a phrase of ANY length by intersecting
(doc, pos − i) keys across the phrase terms — no docstore gather.

Invariants:
  1. codec roundtrip (positions → gaps → varint → positions), including
     zero-length runs for keyword terms at any point in the stream.
  2. engine parity: every phrase answer from the positional index equals
     the docstore-verified answer from a plain index (random 2/3/4-token
     phrases sampled from the fixture text, plus no-match phrases).
  3. BM25 rank identity: positions change scoring in no way.
  4. compaction with tombstones preserves positions (decode → renumber →
     re-encode keeps phrase answers correct on the survivors).
  5. the build rejects a positional config whose implied-split invariant
     (position count == tf) could break (multiple / mismatched fields).
  6. multi-text-field tf merge: two text fields sharing a term space SUM
     their tf (the duplicate-(term,doc) drop in the encoder must never
     eat a second field's occurrences).
"""

import re
import random

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.codec import (decode_positions, position_gaps, varint_encode)
from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.compact import compact_index
from miru_ray.index.segments import (SegmentReader, encode_segment_table,
                                     segment_rows_table, write_segment)
from miru_ray.query.engine import Searcher
from miru_ray.query.parser import parse_query

POS_CFG = IndexConfig(docs_per_partition=1000, num_shards=2,
                      positional_fields=("text",))
REF_CFG = IndexConfig(docs_per_partition=1000, num_shards=2)


def test_codec_positions_roundtrip():
    rng = np.random.default_rng(7)
    for _ in range(100):
        nrun = int(rng.integers(1, 12))
        runs = [np.sort(rng.choice(5000, size=int(rng.integers(0, 9)),
                                   replace=False)) for _ in range(nrun)]
        pos = (np.concatenate(runs) if runs else np.empty(0)).astype(np.int64)
        counts = np.array([len(r) for r in runs], np.int64)
        rs = np.zeros(nrun, np.int64)
        np.cumsum(counts[:-1], out=rs[1:])
        blob = varint_encode(position_gaps(pos, rs))
        assert np.array_equal(decode_positions(blob, counts), pos)


def test_segment_positional_roundtrip(tmp_path):
    def lst(offsets, vals):
        return pa.ListArray.from_arrays(
            pa.array(np.array(offsets, np.int32)),
            pa.array(np.array(vals, np.int32)))
    rows = pa.table({
        "term": pa.array(["alpha", "alpha", "beta", "role:user", "beta"]),
        "doc_id": pa.array([5, 2, 2, 5, 9], pa.int64()),
        "tf": pa.array([2, 1, 3, 1, 1], pa.int64()),
        "pos": lst([0, 2, 3, 6, 6, 7], [0, 7, 3, 0, 1, 4, 2]),
    })
    seg = encode_segment_table(rows)
    assert "pos_bytes" in seg.schema.names
    seg_path = str(tmp_path / "pos_seg.parquet")
    write_segment(seg, seg_path)
    r = SegmentReader(seg_path)
    assert r.has_positions
    row = r.lookup("alpha")
    docs, tfs = r.postings(row)
    assert list(docs) == [2, 5] and list(tfs) == [1, 2]
    assert list(r.positions(row, tfs)) == [3, 0, 7]
    assert list(r.positions(r.lookup("role:user"))) == []
    back = segment_rows_table(seg)
    assert back["pos"].to_pylist() == [[3], [0, 7], [0, 1, 4], [2], []]


def test_encoder_rejects_misaligned_positions():
    rows = pa.table({
        "term": pa.array(["alpha"]),
        "doc_id": pa.array([1], pa.int64()),
        "tf": pa.array([2], pa.int64()),      # tf=2 but only ONE position
        "pos": pa.ListArray.from_arrays(
            pa.array(np.array([0, 1], np.int32)),
            pa.array(np.array([4], np.int32))),
    })
    with pytest.raises(ValueError, match="positional invariant"):
        encode_segment_table(rows)


@pytest.fixture(scope="module")
def pos_indexes(ray_session, xs_path, tmp_path_factory):
    base = tmp_path_factory.mktemp("positional")
    pos_dir, ref_dir = str(base / "pos"), str(base / "ref")
    build_index(xs_path, pos_dir, POS_CFG)
    build_index(xs_path, ref_dir, REF_CFG)
    return pos_dir, ref_dir


def _sample_phrases(xs_path, n_each=25):
    texts = pq.read_table(xs_path, columns=["text"])["text"].to_pylist()
    grams = {2: set(), 3: set(), 4: set()}
    for s in texts[:2000]:
        ts = re.findall(r"[a-z0-9]+", (s or "").lower())
        for k in grams:
            for i in range(len(ts) - k + 1):
                grams[k].add(tuple(ts[i:i + k]))
    rnd = random.Random(0)
    out = []
    for k, g in grams.items():
        out += rnd.sample(sorted(g), min(n_each, len(g)))
    return out


def test_positional_phrase_parity(pos_indexes, xs_path):
    pos_dir, ref_dir = pos_indexes
    sp = Searcher(pos_dir, num_readers=2)
    sr = Searcher(ref_dir, num_readers=2)
    for terms in _sample_phrases(xs_path):
        ast = parse_query('"' + " ".join(terms) + '"')
        assert sp.count(ast) == sr.count(ast), terms
    # no-match and single-term edges
    for q in ('"zzz qqq www"', '"alpha alpha alpha alpha alpha alpha"'):
        assert sp.count(parse_query(q)) == sr.count(parse_query(q))


def test_positional_bm25_rank_identity(pos_indexes):
    pos_dir, ref_dir = pos_indexes
    sp = Searcher(pos_dir, num_readers=2)
    sr = Searcher(ref_dir, num_readers=2)
    assert sp.topk(parse_query("alpha beta"), k=10) == \
        sr.topk(parse_query("alpha beta"), k=10)


def test_positional_compact_preserves_phrases(pos_indexes, xs_path,
                                              tmp_path):
    pos_dir, _ = pos_indexes
    import shutil
    work = str(tmp_path / "work")
    shutil.copytree(pos_dir, work)
    s0 = Searcher(work, num_readers=2)
    s0.remove_docs([3, 7, 11, 100])
    dst = str(tmp_path / "compacted")
    compact_index(work, dst)
    sc = Searcher(dst, num_readers=2)
    for terms in _sample_phrases(xs_path, n_each=8):
        ast = parse_query('"' + " ".join(terms) + '"')
        assert s0.count(ast) == sc.count(ast), terms


def test_build_rejects_bad_positional_config(xs_path, tmp_path):
    bad = IndexConfig(text_fields=("text",),
                      positional_fields=("text", "title"))
    with pytest.raises(ValueError, match="positional_fields"):
        build_index(xs_path, str(tmp_path / "bad"), bad)


def test_multi_text_field_tf_sums(tmp_path, ray_session):
    """Two text fields sharing a term: tf must SUM, not drop."""
    import os
    src = str(tmp_path / "in.parquet")
    t = pa.table({
        "conv_id": pa.array(["c0", "c0"]),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "agent"]),
        "text": pa.array(["spark spark merge", "merge"]),
        "title": pa.array(["spark note", "other"]),
        "tool": pa.array(["", ""]),
        "ts": pa.array([0, 1], pa.timestamp("us")),
    })
    pq.write_table(t, src)
    cfg = IndexConfig(text_fields=("text", "title"), keyword_fields=(),
                      docs_per_partition=10, num_shards=1)
    idx = str(tmp_path / "idx2f")
    build_index(src, idx, cfg)
    seg_dir = os.path.join(idx, "segments")
    seg_file = sorted(f for f in os.listdir(seg_dir)
                      if f.endswith(".parquet"))[0]
    r = SegmentReader(os.path.join(seg_dir, seg_file))
    row = r.lookup("spark")
    docs, tfs = r.postings(row)
    # doc 0 has spark×2 in text and spark×1 in title → tf must be 3
    assert list(docs) == [0] and list(tfs) == [3]
    row = r.lookup("merge")
    docs, tfs = r.postings(row)
    assert list(docs) == [0, 1] and list(tfs) == [1, 1]


# ---------------------------------------------------------------------------
# sloppy phrases ("a b"~N): ordered proximity within a window
# ---------------------------------------------------------------------------

def test_parser_slop_forms():
    from miru_ray.query.filter import Boost, Phrase
    from miru_ray.query.parser import parse_query
    ast = parse_query('"alpha beta"~3')
    assert isinstance(ast, Phrase) and ast.slop == 3
    b = parse_query('"alpha beta"~2^3')
    assert isinstance(b, Boost) and b.child.slop == 2
    f = parse_query('text:"alpha beta"~1')
    assert isinstance(f, Phrase) and f.slop == 1 and f.field == "text"
    # plain phrase stays slop=0; '~' inside quotes is not slop syntax
    assert parse_query('"alpha beta"').slop == 0


def _brute_near(texts, terms, slop):
    n = 0
    for s in texts:
        ts = re.findall(r"[a-z0-9]+", (s or "").lower())
        pls = [[i for i, t in enumerate(ts) if t == q] for q in terms]
        if any(not p for p in pls):
            continue
        found = False
        for p1 in pls[0]:
            prev, ok = p1, True
            for pl in pls[1:]:
                nxt = [x for x in pl if x > prev]
                if not nxt:
                    ok = False
                    break
                prev = nxt[0]
            if ok and prev - p1 - (len(terms) - 1) <= slop:
                found = True
                break
        n += found
    return n


def test_slop_parity_both_paths(pos_indexes, xs_path):
    """Positional path, docstore path and a brute-force oracle agree on
    ordered-proximity counts for sampled term tuples × slops."""
    pos_dir, ref_dir = pos_indexes
    sp = Searcher(pos_dir, num_readers=2)
    sr = Searcher(ref_dir, num_readers=2)
    texts = pq.read_table(xs_path, columns=["text"])["text"].to_pylist()
    rnd = random.Random(3)
    vocab = sorted({t for s in texts[:200]
                    for t in re.findall(r"[a-z0-9]+", s.lower())})
    cases = [(("alpha", "beta"), 1), (("alpha", "beta"), 4),
             (("beta", "alpha", "merge"), 2)]
    for _ in range(6):
        k = rnd.choice([2, 3])
        cases.append((tuple(rnd.sample(vocab, k)), rnd.choice([1, 2, 5])))
    for terms, slop in cases:
        ast = parse_query('"' + " ".join(terms) + f'"~{slop}')
        want = _brute_near(texts, terms, slop)
        assert sp.count(ast) == want, (terms, slop)
        assert sr.count(ast) == want, (terms, slop)


def test_slop_zero_equals_exact_phrase(pos_indexes):
    pos_dir, _ = pos_indexes
    sp = Searcher(pos_dir, num_readers=2)
    assert sp.count(parse_query('"alpha beta"~0')) == \
        sp.count(parse_query('"alpha beta"'))


def test_positional_build_resumes_byte_identical(xs_path, tmp_path):
    """A positional build interrupted after the docstore stage resumes to
    byte-identical segments (the pos_bytes column flows through the same
    spill/encode checkpoints as the rest of the postings row)."""
    import hashlib
    import os

    def _hashes(d):
        out = {}
        for root, _dirs, files in os.walk(os.path.join(d, "segments")):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out[f] = hashlib.sha256(open(p, "rb").read()).hexdigest()
        return out

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(xs_path, a, POS_CFG)
    r1 = build_index(xs_path, b, POS_CFG, stop_after_stage="docstore")
    assert r1["incomplete"]
    build_index(xs_path, b, POS_CFG)
    assert _hashes(a) == _hashes(b)


def test_ordered_near_matches_bruteforce():
    """Property test: the greedy chain in _ordered_near agrees with an
    exhaustive search over ALL in-order chains, across random position
    sets (the greedy-earliest-minimizes-span argument, checked)."""
    from itertools import product as _product

    from miru_ray.query.engine import _ordered_near

    rng = np.random.default_rng(11)
    for _ in range(400):
        k = int(rng.integers(2, 5))
        pls = [np.unique(rng.integers(0, 14, size=rng.integers(1, 6)))
               for _ in range(k)]
        slop = int(rng.integers(0, 6))
        got = _ordered_near(pls, slop)
        want = any(
            all(c[j] > c[j - 1] for j in range(1, k))
            and c[-1] - c[0] - (k - 1) <= slop
            for c in _product(*pls))
        assert got == want, (pls, slop, got, want)


def test_positions_at_block_seek_parity(pos_indexes):
    """Block-seek decode (positions_at) is bit-identical to slicing the
    full positions decode, across random posting subsets of a real
    segment, including multi-block terms."""
    import os
    pos_dir, _ = pos_indexes
    seg_dir = os.path.join(pos_dir, "segments")
    f = sorted(x for x in os.listdir(seg_dir) if x.endswith(".parquet"))[0]
    r = SegmentReader(os.path.join(seg_dir, f))
    assert "pos_block_bytes" in r.table.column_names
    rng = np.random.default_rng(9)
    rows = [i for i in range(len(r.terms)) if ":" not in r.terms[i]]
    for row in rng.choice(rows, size=min(12, len(rows)), replace=False):
        docs, tfs = r.postings(int(row))
        full = r.positions(int(row), tfs)
        rs = np.zeros(len(tfs) + 1, np.int64)
        np.cumsum(tfs, out=rs[1:])
        k = int(rng.integers(1, min(8, len(tfs)) + 1))
        idx = np.sort(rng.choice(len(tfs), k, replace=False))
        got = r.positions_at(int(row), tfs, idx)
        want = np.concatenate([full[rs[j]:rs[j + 1]] for j in idx])
        assert np.array_equal(got, want), (row, idx)
