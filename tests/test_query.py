"""Rank-identity + filter semantics vs the single-process oracle.

Mirrors the reference's end-to-end fulltext test strategy: randomized
conjunctive queries over the fixture vocabulary
(``MiruFullTextNGTest.java:217-225``), extended per FIXTURES.md §F3 with OR,
pButNotQ, prefix, time-range, both scorers, WAND, and TIME ordering.
"""

import numpy as np
import pytest

from miru_ray.query.filter import (And, Not, Or, Prefix, Term, TimeRange,
                                   and_terms, or_terms)


def _vocab(oracle):
    return sorted(t for t in oracle.df_c if not t.startswith(("role:", "tool:")))


def _hot(oracle, n=50):
    v = _vocab(oracle)
    return sorted(v, key=lambda t: (-oracle.cf_c[t], t))[:n]


@pytest.mark.parametrize("strategy", ["bm25", "ref-tfidf"])
def test_random_and_queries(xs_searcher, xs_oracle, strategy):
    rng = np.random.default_rng(7)
    vocab, hot = _vocab(xs_oracle), _hot(xs_oracle)
    for trial in range(20):
        nq = int(rng.integers(1, 6))
        pool = hot if trial % 2 else vocab
        terms = list(rng.choice(pool, size=nq, replace=True))
        for k in (1, 10, 100):
            d_o, s_o = xs_oracle.topk(terms, k, strategy)
            res = xs_searcher.topk(terms, k, strategy)
            assert (res["doc_id"].to_numpy() == d_o).all(), (terms, k)
            assert np.allclose(res["score"].to_numpy(), np.round(s_o, 6),
                               atol=1e-6)


@pytest.mark.parametrize("strategy", ["bm25", "ref-tfidf"])
def test_or_and_wand_queries(xs_searcher, xs_oracle, strategy):
    rng = np.random.default_rng(11)
    hot = _hot(xs_oracle)
    for _ in range(10):
        terms = list(rng.choice(hot, size=int(rng.integers(2, 5)), replace=False))
        d_o, s_o = xs_oracle.topk(terms, 10, strategy, mode="or")
        plain = xs_searcher.topk(or_terms(terms), 10, strategy)
        wand = xs_searcher.topk(or_terms(terms), 10, strategy, use_wand=True)
        assert (plain["doc_id"].to_numpy() == d_o).all()
        assert (wand["doc_id"].to_numpy() == d_o).all()
        assert np.allclose(wand["score"].to_numpy(), np.round(s_o, 6), atol=1e-6)


def test_time_strategy(xs_searcher, xs_oracle):
    rng = np.random.default_rng(13)
    hot = _hot(xs_oracle)
    for _ in range(10):
        terms = list(rng.choice(hot, size=2, replace=False))
        d_o = xs_oracle.topk_time(terms, 10)
        res = xs_searcher.topk(terms, 10, "time")
        assert (res["doc_id"].to_numpy() == d_o).all()


def test_pbutnotq(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 10)
    a, b, c = hot[0], hot[1], hot[2]
    ast = Not(And((Term("text", a), Term("text", b))), (Term("text", c),))
    got = set(xs_searcher.match_docs(ast).tolist())
    exp = (set(xs_oracle.postings[a]) & set(xs_oracle.postings[b])) - set(xs_oracle.postings[c])
    assert got == exp


def test_keyword_filter(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 5)
    ast = And((Term("text", hot[0]), Term("role", "user")))
    got = set(xs_searcher.match_docs(ast).tolist())
    users = set(np.flatnonzero((xs_oracle.df["role"] == "user").to_numpy()).tolist())
    exp = set(xs_oracle.postings[hot[0]]) & users
    assert got == exp


def test_prefix_expansion(xs_searcher, xs_oracle):
    pref = "qu"
    ast = Prefix("text", pref)
    got = set(xs_searcher.match_docs(ast).tolist())
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if t.startswith(pref) and not t.startswith(("role:", "tool:")):
            exp.update(docs)
    assert got == exp


def test_prefix_expansion_cap(xs_searcher, xs_oracle):
    full = xs_searcher.count(Prefix("text", "a"))
    capped = xs_searcher.count(Prefix("text", "a", max_expansion=3))
    exp_terms = sorted(t for t in xs_oracle.postings
                       if t.startswith("a") and not t.startswith(("role:", "tool:")))[:3]
    exp = set()
    for t in exp_terms:
        exp.update(xs_oracle.postings[t])
    assert capped == len(exp)
    assert capped <= full


def test_time_range_filter(xs_searcher, xs_oracle):
    ts = xs_oracle.ts
    lo, hi = int(np.quantile(ts, 0.25)), int(np.quantile(ts, 0.75))
    hot = _hot(xs_oracle, 3)
    ast = And((Term("text", hot[0]), TimeRange(lo, hi)))
    got = set(xs_searcher.match_docs(ast).tolist())
    exp = {d for d in xs_oracle.postings[hot[0]] if lo <= ts[d] <= hi}
    assert got == exp


def test_count_matches_oracle(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 5)
    assert xs_searcher.count([hot[0]]) == len(xs_oracle.postings[hot[0]])
    assert xs_searcher.count(and_terms([hot[0], hot[1]])) == len(
        set(xs_oracle.postings[hot[0]]) & set(xs_oracle.postings[hot[1]]))


def test_gather_roundtrip(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 1)
    docs = xs_searcher.match_docs([hot[0]])[:20]
    t = xs_searcher.gather(docs, ["conv_id", "turn_idx", "text"]).to_pandas()
    t = t.sort_values("doc_id").reset_index(drop=True)
    for _, row in t.iterrows():
        src = xs_oracle.df.iloc[int(row["doc_id"])]
        assert row["text"] == src["text"]
        assert row["conv_id"] == src["conv_id"]


def test_empty_result(xs_searcher):
    res = xs_searcher.topk(["zzzznotaterm"], 10, "bm25")
    assert res.num_rows == 0


def test_pagination_exhaustive(xs_searcher, xs_oracle):
    """Paged retrieval (reference FullTextReport continuation) must equal
    the full ranking, page boundaries exact."""
    hot = _hot(xs_oracle, 4)
    terms = hot[:2]
    full_docs, full_scores = xs_oracle.topk(terms, 10_000, "bm25")
    paged = xs_searcher.topk_paged(terms, page_size=7, max_pages=40,
                                   strategy="bm25")
    n = paged.num_rows
    assert n == min(len(full_docs), 7 * 40)
    assert (paged["doc_id"].to_numpy() == full_docs[:n]).all()
    assert np.allclose(paged["score"].to_numpy(),
                       np.round(full_scores[:n], 6), atol=1e-6)


def test_after_continuation(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 2)
    first = xs_searcher.topk(hot[:1], 5, "bm25")
    # recompute raw score cutoff via a fresh page: use paged API cross-check
    d_o, s_o = xs_oracle.topk(hot[:1], 10, "bm25")
    page2 = xs_searcher.topk(hot[:1], 5, "bm25",
                             after=(float(s_o[4]), int(d_o[4])))
    assert (page2["doc_id"].to_numpy() == d_o[5:10]).all()


def test_stats_cache_consistency(xs_searcher, xs_oracle):
    hot = _hot(xs_oracle, 3)
    a = xs_searcher.topk(hot[:2], 10, "bm25")
    b = xs_searcher.topk(hot[:2], 10, "bm25")  # cached stats path
    assert a.equals(b)


def test_tombstones(xs_index, xs_oracle, tmp_path):
    """REMOVE semantics: tombstoned docs vanish from every answer
    (reference removal index / buildIndexMask)."""
    import os
    import shutil

    from miru_ray.query.engine import Searcher
    idx2 = str(tmp_path / "tomb")
    shutil.copytree(xs_index, idx2)
    s = Searcher(idx2, num_readers=2)
    hot = _hot(xs_oracle, 1)
    before = s.topk(hot[:1], 10, "bm25")["doc_id"].to_pylist()
    removed = before[:3]
    assert s.remove_docs(removed) == 3
    after = s.topk(hot[:1], 10, "bm25")["doc_id"].to_pylist()
    assert not (set(removed) & set(after))
    assert s.count(hot[:1]) == len(xs_oracle.postings[hot[0]]) - 3
    # persisted: a fresh searcher sees the tombstones
    s.close()
    s2 = Searcher(idx2, num_readers=1)
    assert not (set(removed) & set(s2.topk(hot[:1], 10, "bm25")["doc_id"].to_pylist()))
    s2.close()


def test_time_range_partition_pruning(xs_searcher, xs_oracle):
    """Zone-map pruning must not change results for any time window."""
    ts = xs_oracle.ts
    hot = _hot(xs_oracle, 2)
    for q in ((0.0, 0.1), (0.45, 0.55), (0.9, 1.0), (0.0, 1.0)):
        lo = int(np.quantile(ts, q[0]))
        hi = int(np.quantile(ts, q[1]))
        ast = And((Term("text", hot[0]), TimeRange(lo, hi)))
        got = set(xs_searcher.match_docs(ast).tolist())
        exp = {d for d in xs_oracle.postings[hot[0]] if lo <= ts[d] <= hi}
        assert got == exp, q
    # fully out-of-range window → empty, everywhere pruned
    ast = And((Term("text", hot[0]), TimeRange(0, 10)))
    assert xs_searcher.count(ast) == 0


def test_phrase_matches_bruteforce(xs_searcher, xs_table):
    """Phrase = exact token adjacency; engine must equal a brute-force
    scan, and be a strict subset of the AND of its terms."""
    from miru_ray.query.filter import And, Phrase, Term
    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    texts = df["text"].tolist()
    # pick an actually-occurring bigram from the corpus
    from collections import Counter
    big = Counter()
    for t in texts[:500]:
        toks = py_tokenize(t)
        big.update(zip(toks, toks[1:]))
    (a, b), _n = big.most_common(1)[0]
    expect = sorted(i for i, t in enumerate(texts)
                    if f" {a} {b} " in " " + " ".join(py_tokenize(t)) + " ")
    got = sorted(xs_searcher.match_docs(Phrase("text", (a, b))).tolist())
    assert got == expect and len(expect) > 0
    n_and = xs_searcher.count(And((Term("text", a), Term("text", b))))
    assert len(got) <= n_and
    # phrase participates in scoring like an AND of its terms
    r = xs_searcher.topk(Phrase("text", (a, b)), 5, "bm25")
    assert set(r["doc_id"].to_pylist()) <= set(expect)


def test_time_early_exit_visits_fewer_partitions(xs_searcher, xs_oracle):
    """A query satisfiable from the newest partitions must stop the
    newest-first walk early (FullTextAnswerEvaluator semantics) while
    returning the identical answer."""
    hot = _hot(xs_oracle)
    total = len(xs_searcher.manifest["partitions"])
    assert total > 2
    # single hot term: matches everywhere, so the newest wave satisfies k
    res = xs_searcher.topk([hot[0]], 5, "time")
    assert res.num_rows == 5
    assert xs_searcher.last_time_partitions_evaluated < total
    d_o = xs_oracle.topk_time([hot[0]], 5)
    assert (res["doc_id"].to_numpy() == d_o).all()
    # rare enough to need every partition: count stays exhaustive-correct
    for terms in ([hot[0], hot[1]],):
        res = xs_searcher.topk(terms, 10, "time")
        assert (res["doc_id"].to_numpy() == xs_oracle.topk_time(terms, 10)).all()


def test_reader_failure_respawns_and_answers(xs_index, xs_oracle):
    """Killing a reader actor mid-session must not stall the query: the
    fan-out detects the dead actor, respawns it from the manifest, and
    the query answers identically (the reference's replica-racing role)."""
    import ray as _ray

    from miru_ray.query.engine import Searcher
    s = Searcher(xs_index, num_readers=2)
    try:
        hot = _hot(xs_oracle)
        before = s.topk([hot[0], hot[1]], 10, "bm25")
        _ray.kill(s.readers[0])
        after = s.topk([hot[0], hot[1]], 10, "bm25")
        assert after.equals(before)
        # TIME path (per-reader waves) recovers too
        t1 = s.topk([hot[0]], 5, "time")
        _ray.kill(s.readers[1])
        t2 = s.topk([hot[0]], 5, "time")
        assert t2.equals(t1)
    finally:
        s.close()


def test_all_stopword_list_query_matches_none(xs_path, tmp_path):
    """List queries whose every term is a stopword must match NOTHING
    (parser parity: Or(()) not And(())) when the index strips stopwords."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    d = str(tmp_path / "idx_stop")
    build_index(xs_path, d, IndexConfig(docs_per_partition=1000, num_shards=2,
                                        remove_stopwords=True))
    s = Searcher(d, num_readers=1)
    try:
        assert s.count(["the", "and"]) == 0
        assert s.topk(["the"], 5, "bm25").num_rows == 0
    finally:
        s.close()


def test_suggest_empty_prefix_returns_empty():
    """Regression: a prefix with no completions must return 0 rows —
    an all-empty filtered stream used to lose its column names through
    to_pandas and crash with KeyError."""
    from miru_ray.pipelines.flagship import q_suggest
    t = q_suggest("/root/testdata/sf0.001", prefix="zzzzqx")
    assert t.num_rows == 0
    assert t.column_names == ["term", "df"]


def test_spell_correct_edit_distance_rule():
    """The vectorized prefix+suffix distance-1 test vs DuckDB
    levenshtein, across every edit class: identity (dist 0), deletion,
    insertion, substitution — and TRANSPOSITION, which is distance 2 in
    plain Levenshtein and must NOT match."""
    import duckdb

    from miru_ray.pipelines.flagship import q_spell_correct, spell_correct_sql
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * "
                f"FROM '{sf}/documents.parquet'")
    cases = ["spark", "spar", "park", "sparks", "xpark", "spakr", "zz"]
    for word in cases:
        got = q_spell_correct(sf, word).to_pandas()
        want = con.execute(spell_correct_sql(word)).fetchdf()
        for c in ("df", "dist"):
            want[c] = want[c].astype("int64")
        assert got.reset_index(drop=True).equals(
            want.reset_index(drop=True)), (word, got, want)
    assert q_spell_correct(sf, "spark").to_pandas()["dist"].tolist()[0] == 0
    assert len(q_spell_correct(sf, "spakr").to_pandas()
               .query("term == 'spark'")) == 0  # transposition is dist 2
