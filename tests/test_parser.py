from miru_ray.query.filter import And, Not, Or, Prefix, Term
from miru_ray.query.parser import parse_query


def test_default_and():
    assert parse_query("alpha beta") == And((Term("text", "alpha"),
                                             Term("text", "beta")))


def test_single_term():
    assert parse_query("Alpha,") == Term("text", "alpha")


def test_or():
    assert parse_query("alpha OR beta") == Or((Term("text", "alpha"),
                                               Term("text", "beta")))


def test_mixed_and_or():
    q = parse_query("alpha OR beta gamma")
    assert q == And((Or((Term("text", "alpha"), Term("text", "beta"))),
                     Term("text", "gamma")))


def test_not_and_minus():
    q = parse_query("alpha -beta")
    assert q == Not(Term("text", "alpha"), (Term("text", "beta"),))
    q2 = parse_query("alpha NOT beta")
    assert q2 == q


def test_field_term():
    assert parse_query("role:user") == Term("role", "user")


def test_prefix():
    assert parse_query("alph*") == Prefix("text", "alph")
    assert parse_query("tool:tool_0*") == Prefix("tool", "tool_0")


def test_phrase_node():
    from miru_ray.query.filter import Phrase
    q = parse_query('"alpha beta"')
    assert q == Phrase("text", ("alpha", "beta"))
    assert parse_query('"alpha"') == Term("text", "alpha")


def test_parens():
    q = parse_query("(alpha OR beta) gamma")
    assert q == And((Or((Term("text", "alpha"), Term("text", "beta"))),
                     Term("text", "gamma")))


def test_parser_normalizes_case():
    assert parse_query("AlPhA") == Term("text", "alpha")


def test_parser_never_crashes_on_arbitrary_input():
    """Fuzz: parse_query must return an AST (or match-none) for ANY string
    — query strings come from users.  A *controlled* rejection (the
    parser's sole deliberate ValueError: fuzzy edit distance > 2, which
    Lucene also refuses) is a valid outcome; any OTHER exception —
    IndexError, RecursionError, AttributeError, or an unrecognized
    ValueError — is the bug class this hunts.  Scoping the allowance to
    the known rejection keeps a reject-everything regression visible."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from miru_ray.query.filter import Node

    @given(st.text(max_size=80))
    @settings(max_examples=300, deadline=None)
    def run(q):
        try:
            node = parse_query(q)
        except ValueError as e:
            assert "edit distance" in str(e), \
                f"unrecognized parser rejection for {q!r}: {e}"
            return
        assert isinstance(node, Node)

    run()


def test_parser_fuzz_query_shapes_evaluate(xs_searcher):
    """Fuzzed queries built from realistic fragments must parse AND
    evaluate without crashing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.sampled_from(["alpha", "beta", "-gamma", "role:user", "(",
                            ")", "OR", "AND", "NOT", '"alpha beta"',
                            "quer*", "tool:tool_0*", "-", '""', ":",
                            "a:b:c", "-role:tool"])

    @given(st.lists(frag, min_size=1, max_size=6))
    @settings(max_examples=60, deadline=None)
    def run(parts):
        q = " ".join(parts)
        n = xs_searcher.count(q)
        assert n >= 0

    run()


def test_parser_glued_parens_and_prefixed_phrases():
    """Regression set for the tokenizer/scoping fixes: glued ')', field-
    qualified and negated quoted phrases, dissolved groups, dangling OR
    over a negation, multi-token prefix bodies."""
    from miru_ray.query.filter import And, Not, Or, Phrase, Prefix, Term
    from miru_ray.query.parser import parse_query
    n = parse_query("NOT (spark hadoop) flink")
    assert isinstance(n, Not) and n.positive == Term("text", "flink")
    assert n.negatives == (And((Term("text", "spark"),
                                Term("text", "hadoop"))),)
    assert parse_query('title:"foo bar"') == Phrase("title", ("foo", "bar"))
    neg = parse_query('-"foo bar"')
    assert isinstance(neg, Not) and neg.positive == Or(())
    assert neg.negatives == (Phrase("text", ("foo", "bar")),)
    # a group that dissolves to nothing must vanish, not match-ALL
    assert parse_query("spark OR (the of)",
                       stopwords=frozenset({"the", "of"})) \
        == Term("text", "spark")
    # dangling OR must not skip a negated clause onto the next positive
    d = parse_query("x OR -y z")
    assert isinstance(d, Not)
    assert d.positive == And((Term("text", "x"), Term("text", "z")))
    # multi-token prefix keeps the leading tokens as required terms
    assert parse_query("foo-bar*") == And((Term("text", "foo"),
                                           Prefix("text", "bar")))


def test_phrase_field_qualified_keys():
    from miru_ray.query.filter import Phrase
    p = Phrase("title", ("big", "data"))
    assert p.term_keys() == ("title:big", "title:data")
    assert Phrase("text", ("big", "data")).term_keys() == ("big", "data")


def test_fuzzy_syntax():
    """`term~` defaults to 2 edits (Lucene), `term~1` sets 1; field
    scoping and boost composition follow Lucene suffix order."""
    from miru_ray.query.filter import And, Boost, Fuzzy, Term
    from miru_ray.query.parser import parse_query
    assert parse_query("sparc~") == Fuzzy("text", "sparc", max_edits=2)
    assert parse_query("sparc~1") == Fuzzy("text", "sparc", max_edits=1)
    assert parse_query("role:admn~1") == Fuzzy("role", "admn", max_edits=1)
    b = parse_query("sparc~1^3")
    assert b == Boost(Fuzzy("text", "sparc", max_edits=1), 3.0)
    # fuzzy composes with AND clauses
    q = parse_query("merge sparc~1")
    assert q == And((Term("text", "merge"),
                     Fuzzy("text", "sparc", max_edits=1)))


def test_boost_syntax():
    from miru_ray.query.filter import And, Boost, Term, collect_boosts
    from miru_ray.query.parser import parse_query
    q = parse_query("spark^2 merge")
    assert q == And((Boost(Term("text", "spark"), 2.0),
                     Term("text", "merge")))
    assert collect_boosts(q) == {"spark": 2.0}
    q2 = parse_query("title:big^1.5")
    assert q2 == Boost(Term("title", "big"), 1.5)
    assert collect_boosts(q2) == {"title:big": 1.5}


def test_lev_leq_mask():
    import numpy as np
    from miru_ray.query.engine import _lev_leq_mask
    cands = np.array(["spark", "sparc", "spars", "spa", "sparkle",
                      "park", "merge", ""], dtype=object)
    m1 = _lev_leq_mask(cands, "spark", 1)
    assert list(cands[m1]) == ["spark", "sparc", "spars", "park"]
    m2 = _lev_leq_mask(cands, "spark", 2)
    assert list(cands[m2]) == ["spark", "sparc", "spars", "spa",
                               "sparkle", "park"]
    assert not _lev_leq_mask(cands, "zzzzzz", 1).any()
