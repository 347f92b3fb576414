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


def test_parser_review_fixes(xs_searcher):
    """Round-4c parser findings: stray ')' must not truncate the rest of
    the query; lowercase or/and/not are TERMS (Lucene operators are
    case-sensitive); fuzzy ~0 is exact and >2 rejects."""
    import pytest

    from miru_ray.query.filter import And, Fuzzy
    from miru_ray.query.parser import parse_query
    # truncation: 'foo) bar' must still require bar
    assert parse_query("foo) bar") == And((Term("text", "foo"),
                                           Term("text", "bar")))
    assert xs_searcher.count("alpha) merge") == \
        xs_searcher.count("alpha merge")
    # case-sensitive operators
    assert parse_query("rock or roll") == And((Term("text", "rock"),
                                               Term("text", "or"),
                                               Term("text", "roll")))
    # fuzzy edit distances
    assert parse_query("term~0") == Term("text", "term")
    assert parse_query("term~1") == Fuzzy("text", "term", max_edits=1)
    with pytest.raises(ValueError, match="edit distance"):
        parse_query("term~3")


def test_request_review_fixes(xs_searcher):
    """maxWildcardExpansion must not lower NumericRange's loud-failure
    bound; fractional numeric filter values reject instead of silently
    truncating to the wrong term."""
    import pytest

    from miru_ray.query.filter import NumericRange
    from miru_ray.query.request import (_value_str, execute_request,
                                        request_to_ast)
    req = {"name": "t", "tenantId": "demo",
           "query": {"query": "turn:[0 TO 99999] alpha",
                     "defaultField": "text",
                     "maxWildcardExpansion": 7,
                     "desiredNumberOfResults": 5}}
    ast, _k, _s = request_to_ast(req, IndexConfig())
    ranges = [n for n in ast.children if isinstance(n, NumericRange)]
    assert ranges and ranges[0].max_expansion == 100_000  # untouched
    with pytest.raises(ValueError, match="non-integral"):
        _value_str(2.7)
    assert _value_str(2.0) == "2" and _value_str(3) == "3"
    with pytest.raises(ValueError, match="non-integral"):
        execute_request(xs_searcher, {
            "name": "t", "tenantId": "demo",
            "query": {"streamFilter": {
                          "operation": "and",
                          "fieldFilters": [{"fieldName": "turn_idx",
                                            "values": [2.7]}]},
                      "aggregateCountAroundField": "tool",
                      "desiredNumberOfDistincts": 5}})


def test_aggregate_counts_gather_takes_whole_rows(ray_session, tmp_path):
    """gatherLatestValues must come from the truly newest ROW — a null
    gather column on that row must surface as None, not an older row's
    value (GroupBy.last() skips nulls per column)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    from miru_ray.query.request import execute_request
    t = pa.table({
        "conv_id": pa.array(["c0"] * 4),
        "turn_idx": pa.array([0, 1, 2, 3], pa.int32()),
        "role": pa.array(["user", "assistant"] * 2),
        "text": pa.array(["alpha one", "alpha two",
                          "alpha three", "alpha four"]),
        "tool": pa.array(["grep", "sed", "awk", None]),  # newest: null
        "ts": pa.array([i * 1_000_000 for i in range(4)],
                       pa.timestamp("us")),
    })
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(t, str(src / "t.parquet"))
    d = str(tmp_path / "idx")
    build_index([str(src / "t.parquet")], d,
                IndexConfig(docs_per_partition=8, num_shards=1,
                            keyword_fields=("role", "conv_id")))
    s = Searcher(d, num_readers=1)
    try:
        resp = execute_request(s, {
            "name": "t", "tenantId": "demo",
            "query": {"streamFilter": {
                          "operation": "and",
                          "fieldFilters": [{"fieldName": "text",
                                            "values": ["alpha"]}]},
                      "constraints": {"c": {
                          "aggregateCountAroundField": "conv_id",
                          "desiredNumberOfDistincts": 5,
                          "gatherTermsForFields": ["tool"]}}}})
        [row] = resp["answer"]["constraints"]["c"]["results"]
        assert row["latestTimestamp"] == 3_000_000
        assert row["gatherLatestValues"]["tool"] is None  # NOT 'awk'
        assert row["gatherOldestValues"]["tool"] == "grep"
    finally:
        s.close()


def test_gather_terms_on_positional_index(ray_session, tmp_path):
    """Post-commit enrichment of a POSITIONAL index: gathered keyword
    terms pad empty position runs so segment schemas stay uniform
    (previously ArrowInvalid on merge / a mixed-schema dir on
    delta-only cells) — and phrases still answer afterwards."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.index.build import build_index
    from miru_ray.index.gather import gather_terms
    from miru_ray.query.engine import Searcher
    from miru_ray.query.parser import parse_query
    t = pa.table({
        "conv_id": pa.array(["c0"] * 6),
        "turn_idx": pa.array(list(range(6)), pa.int32()),
        "role": pa.array(["user", "assistant"] * 3),
        "text": pa.array([f"alpha beta turn {i}" for i in range(6)]),
        "ts": pa.array([i * 1_000_000 for i in range(6)],
                       pa.timestamp("us")),
    })
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(t, str(src / "t.parquet"))
    d = str(tmp_path / "idx")
    build_index([str(src / "t.parquet")], d,
                IndexConfig(docs_per_partition=8, num_shards=1,
                            keyword_fields=(),
                            positional_fields=("text",)))

    def gatherer(docs: pa.Table) -> pa.Table:
        return pa.table({
            "term": pa.array([f"parity:{'even' if i % 2 == 0 else 'odd'}"
                              for i in docs["doc_id"].to_pylist()]),
            "doc_id": docs["doc_id"],
            "tf": pa.array([1] * docs.num_rows, pa.int64())})

    gather_terms(d, gatherer, "parity", columns=[])
    s = Searcher(d, num_readers=1)
    try:
        assert s.count(Term("parity", "even")) == 3
        # positions survive the merge: phrases still answer from index
        assert s.count(parse_query('"alpha beta"')) == 6
    finally:
        s.close()


def test_sync_rejects_nested_destination(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from miru_ray.index.build import build_index
    from miru_ray.index.sync import sync_index
    t = pa.table({
        "conv_id": pa.array(["c0"] * 2),
        "turn_idx": pa.array([0, 1], pa.int32()),
        "role": pa.array(["user", "assistant"]),
        "tool": pa.array(["", "grep"]),
        "text": pa.array(["alpha", "beta"]),
        "ts": pa.array([0, 1_000_000], pa.timestamp("us")),
    })
    src = tmp_path / "src"
    os.makedirs(src)
    pq.write_table(t, str(src / "t.parquet"))
    d = str(tmp_path / "idx")
    build_index([str(src / "t.parquet")], d,
                IndexConfig(docs_per_partition=8, num_shards=1))
    with pytest.raises(ValueError, match="nest"):
        sync_index(d, os.path.join(d, "replica"))
    with pytest.raises(ValueError, match="alias"):
        sync_index(d, d)


def test_check_additive_generic_content_guard():
    """ts_field / id_fields (and any future content knob) cannot slip
    through as an exec-knob-only upgrade."""
    import pytest

    from miru_ray.index.upgrade import check_additive
    base = IndexConfig(docs_per_partition=8, num_shards=1)
    with pytest.raises(ValueError, match="id_fields differs"):
        check_additive(base, IndexConfig(
            docs_per_partition=8, num_shards=1,
            id_fields=("session_id", "turn_idx")))
    with pytest.raises(ValueError, match="ts_field differs"):
        check_additive(base, IndexConfig(
            docs_per_partition=8, num_shards=1, ts_field="created_at"))
    # exec knobs stay upgradable (content_dict excludes them)
    assert check_additive(base, IndexConfig(
        docs_per_partition=8, num_shards=1,
        io_compression="snappy"))["power_bits_fields"] == ()
