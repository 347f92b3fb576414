"""Regression tests for the round-4 ADVICE.md findings.

Each test pins the exact failure mode the advisor verified, so the fix
can never silently regress.
"""
import numpy as np
import pytest

from miru_ray.query.filter import MatchNone, Not, Term
from miru_ray.query.request import filter_to_ast


# ---- ADVICE medium: pButNotQ whose FIRST (positive) operand dissolves
# must match NOTHING, never promote a negative child into positive
# position (reference: MiruAggregateUtil filterInOut keeps the empty
# first bitmap; andNotTx of empty is empty).

def test_pbutnotq_dissolved_positive_matches_nothing():
    f = {"operation": "pButNotQ",
         "subFilters": [
             {"operation": "or"},                      # NO_FILTER positive
             {"operation": "or",
              "fieldFilters": [{"fieldName": "role",
                                "values": ["user"]}]},  # negative
         ]}
    assert filter_to_ast(f) == MatchNone()


def test_pbutnotq_dissolved_positive_fieldfilter():
    # a fieldFilter with zero values dissolves positionally, too
    f = {"operation": "pButNotQ",
         "fieldFilters": [{"fieldName": "role", "values": []},
                          {"fieldName": "tool", "values": ["grep"]}]}
    assert filter_to_ast(f) == MatchNone()


def test_pbutnotq_dissolved_negative_dropped():
    # a dissolved NEGATIVE child subtracts nothing — dropped, and a
    # lone surviving positive collapses to itself
    f = {"operation": "pButNotQ",
         "fieldFilters": [{"fieldName": "role", "values": ["user"]}],
         "subFilters": [{"operation": "or"}]}
    assert filter_to_ast(f) == Term("role", "user")
    f["subFilters"].append(
        {"operation": "or",
         "fieldFilters": [{"fieldName": "tool", "values": ["grep"]}]})
    assert filter_to_ast(f) == Not(Term("role", "user"),
                                   (Term("tool", "grep"),))


def test_pbutnotq_all_dissolved_is_match_none():
    # the empty FIRST bitmap decides alone: andNot(empty, anything) is
    # empty whether or not the negatives also dissolved — falling back
    # to "no filter" (match-ALL) would flip the result to its opposite
    f = {"operation": "pButNotQ",
         "subFilters": [{"operation": "or"}, {"operation": "or"}]}
    assert filter_to_ast(f) == MatchNone()
    f = {"operation": "pButNotQ", "subFilters": [{"operation": "or"}]}
    assert filter_to_ast(f) == MatchNone()


def test_match_none_evaluates_empty(xs_searcher):
    assert xs_searcher.count(MatchNone()) == 0


def test_pbutnotq_request_end_to_end(xs_searcher):
    """A request whose pButNotQ positive operand dissolves returns ZERO
    docs (it used to return exactly the docs it should exclude)."""
    from miru_ray.query.request import execute_request
    base = {"operation": "or",
            "fieldFilters": [{"fieldName": "role", "values": ["user"]}]}
    broken = {"operation": "pButNotQ",
              "subFilters": [{"operation": "or"}, base]}

    def distincts(flt):
        return execute_request(xs_searcher, {
            "name": "distincts", "tenantId": "demo",
            "query": {"constraintsFilter": flt,
                      "timeRange": {"smallestTimestamp": 0,
                                    "largestTimestamp": 2 ** 62},
                      "gatherDistinctsForField": "role"}})["answer"]

    assert distincts(broken)["results"] == []
    # sanity: the negative child alone matches plenty
    assert distincts(base)["results"]


# ---- ADVICE low: gatherTermsForFields may include the around-field
# itself, and ts-typed gather values must serialize to epoch-µs ints.

def test_aggregate_counts_gather_around_field_and_ts(xs_searcher, xs_table):
    import json

    from miru_ray.query.request import execute_request
    resp = execute_request(xs_searcher, {
        "name": "stream", "tenantId": "demo", "query": {
            "streamFilter": {
                "operation": "or",
                "fieldFilters": [{"fieldName": "text",
                                  "values": ["alpha"]}]},
            "constraints": {"c": {
                "aggregateCountAroundField": "conv_id",
                "desiredNumberOfDistincts": 5,
                # the around-field itself + a timestamp-typed field
                "gatherTermsForFields": ["conv_id", "ts"]}}}})
    got = resp["answer"]["constraints"]["c"]["results"]
    assert got
    for r in got:
        assert r["gatherLatestValues"]["conv_id"] == r["distinctValue"]
        # ts serialized as epoch-µs int == the row's latest/oldest ts
        assert r["gatherLatestValues"]["ts"] == r["latestTimestamp"]
        assert r["gatherOldestValues"]["ts"] == r["oldestTimestamp"]
    json.dumps(resp)  # the CLI path must be able to serialize it


# ---- ADVICE low: the field:* EXISTS form must never silently truncate
# its expansion — overflow past max_expansion is a loud error (like
# NumericRange), because a truncated exists query silently drops docs.

def test_exists_query_cap_overflow_raises(xs_searcher):
    from miru_ray.query.filter import Prefix
    # role has 4 distinct values > cap 2 → loud failure, not truncation
    with pytest.raises(ValueError, match="exists query"):
        xs_searcher.count(Prefix("role", "", max_expansion=2))


def test_exists_query_exact_under_cap(xs_searcher, xs_table):
    from miru_ray.query.filter import Prefix
    tools = xs_table.column("tool").to_pylist()
    expect = sum(1 for t in tools if t not in (None, ""))
    got = xs_searcher.count(Prefix("tool", "", max_expansion=1000))
    assert got == expect
    # a true prefix (non-exists) still truncates silently per
    # maxWildcardExpansion semantics — no raise
    assert xs_searcher.count(Prefix("tool", "tool_",
                                    max_expansion=2)) >= 1


def test_py_scalar_units():
    import numpy as np
    import pandas as pd

    from miru_ray.query.request import _py_scalar
    t = pd.Timestamp("2024-01-02T03:04:05.678901")
    assert _py_scalar(t) == t.value // 1000
    assert _py_scalar(pd.NaT) is None
    assert _py_scalar(np.int64(7)) == 7
    assert _py_scalar(float("nan")) is None
    assert _py_scalar("x") == "x"
