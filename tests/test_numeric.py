"""Numeric term encoding + range queries (reference: numeric prefix terms,
``MiruTermComposer.writePrefixBytes:130-141`` /
``prefixLowerInclusive/prefixUpperExclusive:176-240`` over
``UtilLexMarshaller`` sign-flipped big-endian bytes)."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from miru_ray.lexnum import lex_decode, lex_encode, lex_encode_array
from miru_ray.query.filter import And, NumericRange, Or, Term
from miru_ray.query.parser import parse_query


def test_lex_encoding_is_order_preserving():
    rng = np.random.default_rng(7)
    vals = np.concatenate([
        rng.integers(-(2 ** 62), 2 ** 62, 500),
        np.array([0, -1, 1, np.iinfo(np.int64).min,
                  np.iinfo(np.int64).max], np.int64)])
    enc = lex_encode_array(vals)
    # scalar and vectorized paths agree; decode round-trips
    for v, e in zip(vals[:50], enc[:50]):
        assert lex_encode(int(v)) == str(e)
        assert lex_decode(str(e)) == int(v)
    # string sort order == numeric sort order over the full int64 range
    order_num = np.argsort(vals, kind="stable")
    order_lex = np.argsort(enc, kind="stable")
    assert (vals[order_lex] == vals[order_num]).all()


try:
    from hypothesis import given
    from hypothesis import strategies as st

    @given(st.lists(st.integers(min_value=-(2 ** 63),
                                max_value=2 ** 63 - 1),
                    min_size=2, max_size=50))
    def test_lex_order_property(vals):
        enc = [lex_encode(v) for v in vals]
        assert (sorted(range(len(vals)), key=lambda i: vals[i])
                == sorted(range(len(vals)), key=lambda i: enc[i]))
        assert [lex_decode(e) for e in enc] == vals
except ImportError:  # pragma: no cover
    pass


def test_parser_range_syntax():
    ast = parse_query("spark turn_idx:[2 TO 5]")
    assert ast == And((Term("text", "spark"), NumericRange("turn_idx", 2, 5)))
    # negatives + case-insensitive TO
    ast = parse_query("n:[-3 to 4]")
    assert ast == NumericRange("n", -3, 4)
    # malformed range dissolves the clause (matches none when alone)
    assert parse_query("n:[x TO y]") == Or(())


@pytest.fixture(scope="module")
def num_index(ray_session, xs_path, tmp_path_factory):
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    d = str(tmp_path_factory.mktemp("numidx") / "xs_num")
    build_index(xs_path, d, IndexConfig(docs_per_partition=1000, num_shards=2,
                                        numeric_fields=("turn_idx",)))
    s = Searcher(d, num_readers=2)
    yield s
    s.close()


def _brute(xs_table, lo, hi):
    ti = xs_table["turn_idx"].to_numpy()
    return np.flatnonzero((ti >= lo) & (ti <= hi))


def test_numeric_range_matches_bruteforce(num_index, xs_table):
    hi_all = int(xs_table["turn_idx"].to_numpy().max())
    for lo, hi in [(0, 0), (2, 5), (1, hi_all), (0, hi_all), (3, 3),
                   (hi_all + 1, hi_all + 9), (5, 2)]:
        got = num_index.match_docs(NumericRange("turn_idx", lo, hi))
        want = _brute(xs_table, lo, hi)
        assert (got == want).all(), (lo, hi)
        assert num_index.count(NumericRange("turn_idx", lo, hi)) == len(want)


def test_numeric_range_composes_with_terms(num_index, xs_table):
    got = num_index.match_docs(
        And((Term("text", "spark"), NumericRange("turn_idx", 1, 4))))
    ti = xs_table["turn_idx"].to_numpy()
    txt = xs_table["text"].to_pylist()
    from miru_ray.tokenize import py_tokenize
    want = np.array([i for i in range(len(txt))
                     if 1 <= ti[i] <= 4 and "spark" in py_tokenize(txt[i])],
                    np.int64)
    assert (got == want).all()


def test_numeric_range_overflow_raises(num_index, xs_table):
    """A range whose distinct-term expansion exceeds max_expansion must
    raise, never silently truncate (a truncated range is a silently
    NARROWED filter — regression from review round 3)."""
    hi_all = int(xs_table["turn_idx"].to_numpy().max())
    n_distinct = len(np.unique(xs_table["turn_idx"].to_numpy()))
    assert n_distinct > 3
    with pytest.raises(ValueError, match="max_expansion"):
        num_index.count(NumericRange("turn_idx", 0, hi_all,
                                     max_expansion=2))
    # at exactly the cap it still answers (cap is inclusive)
    ok = NumericRange("turn_idx", 0, hi_all, max_expansion=n_distinct)
    assert num_index.count(ok) == len(_brute(xs_table, 0, hi_all))


def test_numeric_range_is_constant_score_gate(num_index, xs_table):
    """A range covering every doc must leave BM25 ranks AND scores
    untouched — ranges gate, they never score (Lucene constant-score
    numeric ranges; unlike Prefix, whose expansions join the scoring set)."""
    hi_all = int(xs_table["turn_idx"].to_numpy().max())
    base = num_index.topk(["spark", "merge"], k=10)
    gated = num_index.topk(
        And((Term("text", "spark"), Term("text", "merge"),
             NumericRange("turn_idx", 0, hi_all))), k=10)
    assert base.equals(gated)
