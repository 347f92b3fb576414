"""Regression tests for the round-4c engine review findings: mid-append
postings clipping, Filter-gated expansion scoring, per-cap expansion
lists, and TIME-strategy pagination."""
import os

import pyarrow as pa
import pyarrow.parquet as pq

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.query.engine import Searcher
from miru_ray.query.filter import And, Filter, Or, Prefix, Term


def _slab(conv_range, n_turns=8):
    rows = []
    for c in conv_range:
        for t in range(n_turns):
            rows.append((f"c{c:03d}", t, ["user", "assistant"][t % 2],
                         f"alpha merge turn{t} conv{c}",
                         (c * 100 + t) * 1_000_000))
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "text": pa.array([r[3] for r in rows]),
        "ts": pa.array([r[4] for r in rows], pa.timestamp("us")),
    })


def test_postings_clipped_to_committed_extent(ray_session, tmp_path):
    """An append atomically replaces the boundary partition's segments
    BEFORE the manifest commit; a reader on the old manifest must keep
    answering from its own doc range (clip), not IndexError."""
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(_slab(range(2)), str(src / "a.parquet"))
    idir = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=64, num_shards=1,
                      keyword_fields=("role",))
    build_index([str(src / "a.parquet")], idir, cfg)
    old_manifest = open(os.path.join(idir, "manifest.json")).read()
    n_old = 16
    # append rewrites the (single, boundary) partition's segments
    pq.write_table(_slab(range(2, 5)), str(src / "b.parquet"))
    build_index([str(src / "a.parquet"), str(src / "b.parquet")],
                idir, cfg)
    # crash simulation: manifest rolls back, segments stay appended
    with open(os.path.join(idir, "manifest.json"), "w") as f:
        f.write(old_manifest)
    s = Searcher(idir, num_readers=1)
    assert s.count("alpha") == n_old  # phantoms clipped, no IndexError
    top = s.topk("alpha merge", 5, "bm25")
    assert top.num_rows == 5
    assert max(top["doc_id"].to_pylist()) < n_old
    assert s.count(Prefix("text", "turn")) == n_old
    s.close()


def test_filter_gated_expansions_do_not_score(xs_searcher):
    """collect_scoring_terms' contract ('Filter terms never score') now
    holds for expansion nodes too: a Filter-wrapped Prefix gates the doc
    set but leaves every surviving doc's score equal to the bare
    query's."""
    bare = xs_searcher.topk(Term("text", "alpha"), 100000, "bm25")
    bare_scores = dict(zip(bare["doc_id"].to_pylist(),
                           bare["score"].to_pylist()))
    filt = xs_searcher.topk(
        And((Term("text", "alpha"), Filter(Prefix("text", "mer")))),
        100000, "bm25")
    assert 0 < filt.num_rows < len(bare_scores)
    assert all(bare_scores[d] == s
               for d, s in zip(filt["doc_id"].to_pylist(),
                               filt["score"].to_pylist()))
    # the UNWRAPPED prefix does score (sanity: the contrast is live)
    scored = xs_searcher.topk(
        And((Term("text", "alpha"), Prefix("text", "mer"))),
        100000, "bm25")
    assert any(bare_scores[d] != s
               for d, s in zip(scored["doc_id"].to_pylist(),
                               scored["score"].to_pylist()))


def test_expansion_lists_keyed_per_cap(xs_searcher):
    """Two nodes sharing a pattern but different max_expansion must each
    evaluate with their OWN expansion list (the dict is keyed
    (key, cap)); waveforms batches the same way."""
    tight = Prefix("text", "a", max_expansion=1)
    wide = Prefix("text", "a", max_expansion=1000)
    n_tight = xs_searcher.count(tight)
    n_wide = xs_searcher.count(wide)
    assert n_tight < n_wide
    # both in ONE query: the OR must see the wide list, the tight node
    # alone must still be capped
    n_or = xs_searcher.count(Or((tight, wide)))
    assert n_or == n_wide
    # batched waveforms: each ast keeps its own cap
    lo, hi = 0, 2 ** 62
    w = xs_searcher.waveforms([tight, wide], lo, hi, 1)
    assert w[0][0] == n_tight and w[1][0] == n_wide


def test_time_strategy_pagination(xs_searcher):
    """topk_paged(strategy='time') pages through topk_time with a
    (ts, doc_id) cursor; topk(strategy='time', after=...) resumes."""
    full = xs_searcher.topk_time("alpha merge", 30)
    assert full.num_rows == 30
    paged = xs_searcher.topk_paged("alpha merge", page_size=7,
                                   max_pages=5, strategy="time")
    assert paged["doc_id"].to_pylist()[:30] == \
        full["doc_id"].to_pylist()[:len(paged["doc_id"].to_pylist()[:30])]
    assert paged.num_rows == 35  # 5 full pages, no crash
    # topk(after=...) continues strictly below the cursor
    ts_us = full["ts"].cast(pa.int64()).to_pylist()
    docs = full["doc_id"].to_pylist()
    page2 = xs_searcher.topk("alpha merge", 10, "time",
                             after=(ts_us[9], docs[9]))
    assert page2["doc_id"].to_pylist() == docs[10:20]
