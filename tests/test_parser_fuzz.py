"""Property tests for the query grammar: any composition of the
supported syntax must parse to a well-formed AST (or None-equivalents),
never crash, and always evaluate.  Deterministic (derandomized) so CI
never flakes."""

import hypothesis.strategies as st
from hypothesis import given, settings

from miru_ray.query.filter import (And, Boost, Fuzzy, Node, Not,
                                   NumericRange, Or, Phrase, Prefix, Term,
                                   collect_boosts, collect_expansion_boosts,
                                   collect_fuzzies, collect_prefixes,
                                   collect_ranges, collect_scoring_terms)
from miru_ray.query.parser import parse_query

_WORDS = st.sampled_from(["alpha", "beta", "spark", "merge", "tok1",
                          "x", "café", "a1b2", "the"])
_FIELDS = st.sampled_from(["", "role:", "tool:", "turn_idx:"])


@st.composite
def _atom(draw):
    kind = draw(st.integers(0, 6))
    w = draw(_WORDS)
    f = draw(_FIELDS)
    if kind == 0:
        return f + w
    if kind == 1:
        return f + w + "*"
    if kind == 2:
        return f + w + "~" + draw(st.sampled_from(["", "1", "2"]))
    if kind == 3:
        return (f + '"' + w + " " + draw(_WORDS) + '"'
                + draw(st.sampled_from(["", "^2", "^1.5"])))
    if kind == 4:
        lo, hi = draw(st.integers(-5, 5)), draw(st.integers(-5, 20))
        return f"turn_idx:[{lo} TO {hi}]"
    if kind == 5:
        return f + w + "^" + draw(st.sampled_from(["2", "0.5", "3.25"]))
    return "-" + f + w


@st.composite
def _query(draw, depth=2):
    parts = []
    for _ in range(draw(st.integers(1, 4))):
        if depth > 0 and draw(st.booleans()):
            sub = draw(_query(depth=depth - 1))
            parts.append("(" + sub + ")"
                         + draw(st.sampled_from(["", "^2"])))
        else:
            parts.append(draw(_atom()))
        parts.append(draw(st.sampled_from(["", "OR", "AND", "NOT"])))
    return " ".join(p for p in parts if p)


def _well_formed(node) -> bool:
    if node is None:
        return True
    if isinstance(node, (Term, Prefix, Fuzzy, NumericRange, Phrase)):
        return True
    if isinstance(node, Boost):
        return node.boost > 0 and _well_formed(node.child)
    if isinstance(node, (And, Or)):
        return all(_well_formed(c) for c in node.children)
    if isinstance(node, Not):
        return (_well_formed(node.positive)
                and all(_well_formed(c) for c in node.negatives))
    return False


@settings(max_examples=300, derandomize=True, deadline=None)
@given(_query())
def test_parse_never_crashes_and_is_well_formed(q):
    node = parse_query(q)
    assert isinstance(node, Node)
    assert _well_formed(node)
    # every collector walks any AST without error
    collect_scoring_terms(node)
    collect_prefixes(node)
    collect_fuzzies(node)
    collect_ranges(node)
    collect_boosts(node)
    collect_expansion_boosts(node)


@settings(max_examples=25, derandomize=True, deadline=None)
@given(_query())
def test_parsed_queries_evaluate(xs_searcher, q):
    """A bounded sample of generated queries must run end-to-end through
    count() and topk() on a real index (expansion, gating, scoring)."""
    n = xs_searcher.count(q)
    assert n >= 0
    t = xs_searcher.topk(q, 5)
    assert t.num_rows <= 5
