"""Infix/leading wildcard and regexp queries (Lucene WildcardQuery /
RegexpQuery) — parser, expansion, evaluation, boost composition."""

import fnmatch
import re

import pytest

from miru_ray.query.filter import (And, Boost, Prefix, Regexp, Term,
                                   Wildcard)
from miru_ray.query.parser import parse_query


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------

def test_parser_infix_and_leading_wildcards():
    assert parse_query("qu*ry") == Wildcard("text", "qu*ry")
    assert parse_query("q?ery") == Wildcard("text", "q?ery")
    assert parse_query("*ery") == Wildcard("text", "*ery")
    assert parse_query("role:ad*in") == Wildcard("role", "ad*in")
    # a SINGLE trailing '*' stays on the cheaper Prefix path
    assert parse_query("que*") == Prefix("text", "que")
    # trailing '*' with another wildcard is a Wildcard
    assert parse_query("q?e*") == Wildcard("text", "q?e*")
    # TEXT patterns lowercase like analyzed tokens; keyword-field values
    # are indexed verbatim so their patterns keep case
    assert parse_query("Qu*RY") == Wildcard("text", "qu*ry")
    assert parse_query("level:ER*OR") == Wildcard("level", "ER*OR")


def test_parser_wildcard_composition():
    n = parse_query("qu*ry spark")
    assert n == And((Wildcard("text", "qu*ry"), Term("text", "spark")))
    b = parse_query("qu*ry^2")
    assert b == Boost(Wildcard("text", "qu*ry"), 2.0)
    # all-wildcard atoms dissolve (never a silent truncated match-all)
    assert parse_query("* spark") == Term("text", "spark")


# ---------------------------------------------------------------------------
# expansion + evaluation vs brute force
# ---------------------------------------------------------------------------

def _expected_docs(xs_oracle, pat, fields=("role:", "tool:")):
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if ":" in t:
            continue
        if fnmatch.fnmatchcase(t, pat):
            exp.update(docs)
    return exp


@pytest.mark.parametrize("pat", ["qu*ry", "q?ery", "*uery", "s*k", "?????"])
def test_wildcard_matches_brute_force(xs_searcher, xs_oracle, pat):
    got = set(xs_searcher.match_docs(
        Wildcard("text", pat, max_expansion=100_000)).tolist())
    assert got == _expected_docs(xs_oracle, pat)


def test_wildcard_keyword_field(xs_searcher, xs_oracle):
    """Field-scoped wildcard expands only within that field's slice."""
    got = set(xs_searcher.match_docs(
        Wildcard("role", "*er", max_expansion=100_000)).tolist())
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if t.startswith("role:") and fnmatch.fnmatchcase(t[5:], "*er"):
            exp.update(docs)
    assert got == exp
    assert got  # pattern chosen to actually match ('user' etc.)


def test_wildcard_expansion_cap_truncates(xs_searcher):
    """maxWildcardExpansion semantics: the capped match-set is a subset
    of the uncapped one (silent truncation, like the reference)."""
    full = set(xs_searcher.match_docs(
        Wildcard("text", "?*", max_expansion=100_000)).tolist())
    capped = set(xs_searcher.match_docs(
        Wildcard("text", "?*", max_expansion=5)).tolist())
    assert capped <= full
    assert len(capped) < len(full)


def test_parser_field_exists():
    """'field:*' = exists query (empty prefix expands the whole field
    slice); a bare '*' still dissolves."""
    assert parse_query("tool:*") == Prefix("tool", "")
    assert parse_query("tool:* spark") == And((Prefix("tool", ""),
                                               Term("text", "spark")))
    assert parse_query("*") == parse_query("")  # match-none, not exists


def test_exists_matches_docs_with_field(xs_searcher, xs_oracle):
    got = set(xs_searcher.match_docs(
        parse_query("tool:*")).tolist())
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if t.startswith("tool:"):
            exp.update(docs)
    assert got == exp and got


def test_parser_regexp_shapes():
    assert parse_query("/sp.rk/") == Regexp("text", "sp.rk")
    assert parse_query("/s(p|h)ark/") == Regexp("text", "s(p|h)ark")
    assert parse_query("role:/us.r/") == Regexp("role", "us.r")
    # a ':' inside the pattern is NOT a field qualifier
    assert parse_query("/a:b/") == Regexp("text", "a:b")
    # path-like keyword values are NOT hijacked by the /…/ tokenizer
    # alternative (only a delimited /…/ is a regexp)
    assert parse_query("tool:/usr/bin") == Term("tool", "/usr/bin")
    assert parse_query("-/sp.rk/ merge") == parse_query("merge -/sp.rk/")
    assert parse_query("/sp.rk/^2") == Boost(Regexp("text", "sp.rk"), 2.0)


@pytest.mark.parametrize("pat", ["qu.ry", "qu.*", "s(p|h).rk", "[a-d]{4}"])
def test_regexp_matches_brute_force(xs_searcher, xs_oracle, pat):
    got = set(xs_searcher.match_docs(
        Regexp("text", pat, max_expansion=100_000)).tolist())
    rx = re.compile(f"^(?:{pat})$")
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if ":" not in t and rx.match(t):
            exp.update(docs)
    assert got == exp


def test_regexp_pattern_with_colon_reaches_terms(xs_searcher, xs_oracle):
    """A ':' inside the pattern must survive the field/pattern plumbing
    end to end (field and pattern ship as separate fan-out args, never
    re-split from a joined key)."""
    got = set(xs_searcher.match_docs(
        Regexp("text", "qu:?ery", max_expansion=100_000)).tolist())
    exp = set()
    for t, docs in xs_oracle.postings.items():
        if ":" not in t and re.match(r"^(?:qu:?ery)$", t):
            exp.update(docs)
    assert got == exp and got


def test_min_should_rejects_nonpositive_m():
    from miru_ray.query.filter import MinShould
    with pytest.raises(ValueError, match="m must be >= 1"):
        MinShould((Term("text", "a"),), 0)
    with pytest.raises(ValueError, match="m must be >= 1"):
        MinShould((Term("text", "a"),), -1)


def test_regexp_literal_prefix_bound():
    from miru_ray.query.engine import _regex_literal_prefix
    assert _regex_literal_prefix("spark") == "spark"
    assert _regex_literal_prefix("sp.rk") == "sp"
    assert _regex_literal_prefix("spa*k") == "sp"   # 'a' is quantified away
    assert _regex_literal_prefix("ab{2}c") == "a"
    assert _regex_literal_prefix("(a|b)c") == ""
    assert _regex_literal_prefix(".*") == ""
    # alternation voids the bound even with a shared-looking prefix —
    # 'merge' must be found by 'sp.rk|m.rge' despite not starting 'sp'
    assert _regex_literal_prefix("sp.rk|m.rge") == ""


def test_min_should_match_degenerate_and_threshold(xs_searcher, xs_oracle):
    """m-of-k: m=1 == OR, m=k == AND, 1<m<k == per-doc count threshold
    (brute-forced); empty/over-k children match nothing."""
    from miru_ray.query.filter import MinShould, Or, And
    vocab = sorted(t for t in xs_oracle.postings if ":" not in t)
    terms = [t for t in vocab if len(xs_oracle.postings[t]) > 3][:4]
    assert len(terms) == 4
    kids = tuple(Term("text", t) for t in terms)

    or_docs = set(xs_searcher.match_docs(Or(kids)).tolist())
    and_docs = set(xs_searcher.match_docs(And(kids)).tolist())
    assert set(xs_searcher.match_docs(
        MinShould(kids, 1)).tolist()) == or_docs
    assert set(xs_searcher.match_docs(
        MinShould(kids, 4)).tolist()) == and_docs

    got2 = set(xs_searcher.match_docs(MinShould(kids, 2)).tolist())
    from collections import Counter
    c = Counter()
    for t in terms:
        c.update(set(xs_oracle.postings[t]))
    assert got2 == {d for d, n in c.items() if n >= 2}
    assert and_docs <= got2 <= or_docs

    assert xs_searcher.count(MinShould((), 1)) == 0
    assert xs_searcher.count(MinShould(kids, 5)) == 0


def test_min_should_match_composes(xs_searcher):
    """MinShould children may be ANY clause (prefix, wildcard), and the
    node nests inside boolean combinators."""
    from miru_ray.query.filter import And, MinShould, Not
    ms = MinShould((Prefix("text", "qu"), Wildcard("text", "s?ark"),
                    Term("text", "merge")), 2)
    n = xs_searcher.count(ms)
    assert n > 0
    gated = xs_searcher.count(And((ms, Term("text", "merge"))))
    assert 0 < gated <= n
    excl = xs_searcher.count(Not(ms, (Term("text", "merge"),)))
    assert excl < n


def test_wildcard_scores_like_expanded_or(xs_searcher):
    """A wildcard's expansions join the scoring set with multiplicity 1 —
    the parsed query path must give the same top-k as the explicit AST."""
    a = xs_searcher.topk("qu*ry", 10, "bm25")
    b = xs_searcher.topk(Wildcard("text", "qu*ry"), 10, "bm25")
    assert a.equals(b)
