"""Searcher.explain: per-term score breakdown must reproduce topk's
scores exactly (the MiruSolution / Lucene-explain analogue)."""

import numpy as np
import pytest


def _vocab(oracle):
    return sorted(t for t in oracle.df_c
                  if not t.startswith(("role:", "tool:")))


@pytest.mark.parametrize("strategy", ["bm25", "ref-tfidf"])
def test_explain_total_matches_topk(xs_searcher, xs_oracle, strategy):
    rng = np.random.default_rng(11)
    vocab = _vocab(xs_oracle)
    for trial in range(8):
        terms = list(rng.choice(vocab, size=int(rng.integers(1, 4)),
                                replace=True))
        res = xs_searcher.topk(terms, 10, strategy)
        if res.num_rows == 0:
            continue
        for d, s in zip(res["doc_id"].to_pylist(),
                        res["score"].to_pylist()):
            ex = xs_searcher.explain(terms, d, strategy)
            assert ex["total"] == pytest.approx(s, abs=1e-6), (terms, d)
            t = ex["terms"]
            # contributions re-sum to the total (same ascending order)
            assert sum(t["contribution"].to_pylist()) == pytest.approx(
                s, abs=2e-6)
            assert t["term"].to_pylist() == sorted(t["term"].to_pylist())
            assert ex["alive"] and ex["strategy"] == strategy


def test_explain_reports_per_term_inputs(xs_searcher, xs_oracle):
    """df/cf must equal the oracle's global stats, tf the doc's own term
    frequency, and a term absent from the doc explains as tf=0/0.0."""
    vocab = _vocab(xs_oracle)
    hot = max(vocab, key=lambda t: xs_oracle.cf_c[t])
    rare = min(vocab, key=lambda t: xs_oracle.cf_c[t])
    res = xs_searcher.topk([hot], 1, "bm25")
    d = int(res["doc_id"][0].as_py())
    ex = xs_searcher.explain([hot, rare], d, "bm25")
    t = ex["terms"].to_pandas().set_index("term")
    assert int(t.loc[hot, "df"]) == xs_oracle.df_c[hot]
    assert int(t.loc[hot, "cf"]) == xs_oracle.cf_c[hot]
    assert int(t.loc[hot, "tf"]) >= 1
    if rare in t.index and int(t.loc[rare, "tf"]) == 0:
        assert float(t.loc[rare, "contribution"]) == 0.0


def test_explain_boost_scales_contribution(xs_searcher, xs_oracle):
    vocab = _vocab(xs_oracle)
    hot = max(vocab, key=lambda t: xs_oracle.cf_c[t])
    res = xs_searcher.topk(f"{hot}", 1, "bm25")
    d = int(res["doc_id"][0].as_py())
    plain = xs_searcher.explain(f"{hot}", d, "bm25")
    boosted = xs_searcher.explain(f"{hot}^3", d, "bm25")
    assert boosted["total"] == pytest.approx(3 * plain["total"], abs=1e-5)


def test_explain_outside_index_raises(xs_searcher):
    with pytest.raises(KeyError):
        xs_searcher.explain(["anything"], 10**15)


def test_count_at_least_early_exit(xs_searcher, xs_oracle):
    """Threshold semantics exact at the boundary; an existence check
    (n=1) on a term present in every reader's partitions consumes ONE
    answer, not the full fan-out; an impossible term consumes all."""
    vocab = _vocab(xs_oracle)
    hot = max(vocab, key=lambda t: xs_oracle.cf_c[t])
    true_n = xs_searcher.count([hot])
    assert xs_searcher.count_at_least([hot], true_n) is True
    assert xs_searcher.count_at_least([hot], true_n + 1) is False
    assert xs_searcher.count_at_least([hot], 0) is True
    assert xs_searcher.count_at_least([hot], 1) is True
    assert xs_searcher.last_count_readers_answered == 1  # early exit
    assert xs_searcher.count_at_least(["zzz_not_a_term"], 1) is False
    assert xs_searcher.last_count_readers_answered == len(
        xs_searcher.readers)
