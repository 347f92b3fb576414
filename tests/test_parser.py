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
