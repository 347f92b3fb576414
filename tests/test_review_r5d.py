"""Round-5 focused-review regressions: parser negated groups and
stopword parity, request-surface malformed-value rejection, fan-out
expansion resolution, strut combo/cache edge cases, anomaly
zero-expansion."""

import os
import shutil

import pyarrow as pa
import pytest

from miru_ray.query.filter import And, Not, Prefix, Term
from miru_ray.query.parser import parse_query

TR = {"smallestTimestamp": 1_704_067_200_000_000,
      "largestTimestamp": 1_704_070_800_000_000}


# ---------------------------------------------------------------- parser

def test_negated_group_is_negative():
    """'-(a b)' must negate the group exactly like 'NOT (a b)' — the
    lone '-' token previously dissolved and the group attached as a
    POSITIVE clause, returning exactly the excluded docs."""
    a = parse_query("foo -(bar baz)")
    b = parse_query("foo NOT (bar baz)")
    assert a == b
    assert isinstance(a, Not)
    # and a dissolved negated group leaves just the positive
    assert parse_query('foo -("")') == parse_query("foo")


def test_prefix_and_fuzzy_leading_stopwords_dropped():
    """Analyzer parity: a stopword LEADING term in a multi-token
    prefix/fuzzy atom is dropped (on a stopword-removing index it has
    no postings, so keeping it made the AND match nothing).  The
    prefix/fuzzy body itself is never dropped."""
    stops = frozenset({"to", "the"})
    got = parse_query("to-do*", stopwords=stops)
    assert got == Prefix("text", "do")
    got = parse_query("the-cat~1", stopwords=stops)
    assert not any(isinstance(c, Term) and c.term == "the"
                   for c in (got.children if isinstance(got, And)
                             else (got,)))
    # without stopwords, leads stay required
    got = parse_query("to-do*", stopwords=None)
    assert isinstance(got, And)
    assert Term("text", "to") in got.children


# ------------------------------------------- request malformed documents

def test_fieldfilter_values_string_rejected():
    from miru_ray.query.request import filter_to_ast
    with pytest.raises(ValueError, match="must be a list"):
        filter_to_ast({"operation": "or",
                       "fieldFilters": [{"fieldName": "role",
                                         "values": "user"}]})


def test_authz_expression_malformed_rejected():
    from miru_ray.query.request import authz_clause
    with pytest.raises(ValueError, match="authzExpression"):
        authz_clause({"authzExpression": ["acl_a"]})
    with pytest.raises(ValueError, match="must be a list"):
        authz_clause({"authzExpression": {"values": "abc"}})
    assert authz_clause({"authzExpression": None}) is None
    az = authz_clause({"authzExpression": {"values": ["g1"]}})
    assert az is not None and az.values == ("g1",)


def test_distincts_prefixes_malformed_rejected(xs_searcher):
    from miru_ray.query.request import execute_request

    def req(prefixes):
        return {"tenantId": "t",
                "query": {"gatherDistinctsForField": "role",
                          "timeRange": dict(TR),
                          "prefixes": prefixes}}

    with pytest.raises(ValueError, match="without parts"):
        execute_request(xs_searcher, req([{}]))
    with pytest.raises(ValueError, match="without parts"):
        execute_request(xs_searcher, req([{"parts": []}]))
    with pytest.raises(ValueError, match="multi-part"):
        execute_request(xs_searcher, req([{"parts": ["a", "b"]}]))
    with pytest.raises(ValueError, match="must be a list"):
        execute_request(xs_searcher, req("us"))
    # a well-formed single-part MiruValue prefix still answers
    ans = execute_request(xs_searcher, req([{"parts": ["us"]}]))["answer"]
    assert ans["results"] == ["user"]


# ------------------------------- composite expansion through the fan-outs

@pytest.fixture(scope="module")
def composite_searcher(ray_session, tmp_path_factory):
    """xs index with a composite (role, tool) field (the examples
    fixture's shape)."""
    from miru_ray.config import IndexConfig
    from miru_ray.fixtures import transcripts_path
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    d = str(tmp_path_factory.mktemp("idx") / "xs_comp")
    shutil.rmtree(d, ignore_errors=True)
    build_index(transcripts_path("xs"), d, IndexConfig(
        docs_per_partition=2000, num_shards=1,
        keyword_fields=("role", "tool", "conv_id"),
        composite_fields=(("role_tool", ("role", "tool")),)))
    s = Searcher(d, num_readers=2)
    yield s
    s.close()


def test_catwalk_model_composite_prefix_filter(composite_searcher):
    """A modelFilter carrying a composite parts-PREFIX MiruValue must
    expand before the term_match_counts fan-out — the empty expansions
    dict previously evaluated the Prefix to match-NOTHING, silently
    zeroing the model (review finding)."""
    from miru_ray.query.request import execute_request
    req = {"tenantId": "t", "query": {
        "definition": {"catwalkId": "demo",
                       "gatherField": "conv_id",
                       "numeratorCount": 1,
                       "features": [{"name": "tools",
                                     "featureFields": ["tool"],
                                     "featureScalar": 1.0}]},
        "modelQuery": {
            "desiredNumberOfResults": 10,
            "modelFilters": [
                {"operation": "and",
                 "fieldFilters": [{"fieldName": "role_tool",
                                   "values": [{"parts": ["user"]}]}]}],
            "timeRange": dict(TR)}}}
    ans = execute_request(composite_searcher, req)["answer"]
    assert ans["modelCounts"][0] > 0
    assert any(r["denominator"] > 0 or any(r["numerators"])
               for rows in ans["results"] for r in rows)


def test_strut_combo_feature_includes_gather_field(composite_searcher):
    """A 2-field combo feature whose fields include the gatherField must
    answer, not crash on duplicated pandas columns (review finding)."""
    from miru_ray.query.request import execute_request
    req = {"tenantId": "t", "query": {
        "catwalkDefinition": {
            "catwalkId": "demo", "gatherField": "conv_id",
            "featureStrategy": "UNIT_WEIGHTED",
            "numeratorCount": 1, "scorableField": "conv_id",
            "features": [{"name": "cr",
                          "featureFields": ["conv_id", "role"],
                          "featureScalar": 1.0}]},
        "constraintFilter": {"operation": "and", "fieldFilters": [
            {"fieldName": "role", "values": ["user", "assistant"]}]},
        "desiredNumberOfResults": 5,
        "numeratorScalars": [1.0],
        "numeratorStrategy": "UNIT_WEIGHTED",
        "modelScalars": [{"scalar": 1.0, "catwalkModelQuery": {
            "desiredNumberOfResults": 5,
            "modelFilters": [{"operation": "and", "fieldFilters": [
                {"fieldName": "role", "values": ["user"]}]}],
            "timeRange": dict(TR)}}],
        "timeRange": dict(TR)}}
    ans = execute_request(composite_searcher, req)["answer"]
    assert len(ans["results"]) > 0


def test_strut_cache_hit_still_validates(composite_searcher):
    """Accept/reject must not depend on cache state: an invalid
    numeratorCount is rejected even when a prior request cached the
    same model key (numeratorCount is not in the key)."""
    from miru_ray.query.request import execute_request

    def req(ncount):
        return {"tenantId": "t", "query": {
            "catwalkDefinition": {
                "catwalkId": "demo2", "gatherField": "conv_id",
                "featureStrategy": "UNIT_WEIGHTED",
                "numeratorCount": ncount, "scorableField": "conv_id",
                "features": [{"name": "tools",
                              "featureFields": ["tool"],
                              "featureScalar": 1.0}]},
            "constraintFilter": {"operation": "and", "fieldFilters": [
                {"fieldName": "role", "values": ["user"]}]},
            "desiredNumberOfResults": 5,
            "numeratorScalars": [1.0],
            "numeratorStrategy": "UNIT_WEIGHTED",
            "modelScalars": [{"scalar": 1.0, "catwalkModelQuery": {
                "desiredNumberOfResults": 5,
                "modelFilters": [{"operation": "and", "fieldFilters": [
                    {"fieldName": "role", "values": ["user"]}]}],
                "timeRange": dict(TR)}}],
            "timeRange": dict(TR)}}

    execute_request(composite_searcher, req(1))  # populates the cache
    with pytest.raises(ValueError, match="Numerator count"):
        execute_request(composite_searcher, req(99))  # cache hit path


# --------------------------------------------- anomaly zero expansion

def test_anomaly_zero_expansion_returns_empty_waveforms(
        ray_session, tmp_path_factory):
    """expansionValues that expand to ZERO terms must yield an empty
    waveforms map — never silently fall back to unrestricted
    bare-filter sums under the wrong keys (review finding)."""
    import numpy as np
    import pyarrow.parquet as pq

    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    from miru_ray.query.request import execute_request
    d = tmp_path_factory.mktemp("anom")
    src = str(d / "src")
    os.makedirs(src)
    pq.write_table(pa.table({
        "conv_id": pa.array(["c0"] * 4),
        "turn_idx": pa.array(list(range(4)), pa.int32()),
        "role": pa.array(["user", "assistant"] * 2),
        "text": pa.array(["alpha beta"] * 4),
        "tool": pa.array(["t1", "t2"] * 2),
        "ts": pa.array(np.arange(4) * 1_000_000, pa.timestamp("us")),
        "val": pa.array([5, 3, 2, 7], pa.int64()),
    }), os.path.join(src, "docs.parquet"))
    idir = str(d / "idx")
    build_index(src, idir, IndexConfig(
        docs_per_partition=10, num_shards=1,
        keyword_fields=("role", "tool"),
        power_bits_fields=(("bits", "val"),)))
    s = Searcher(idir, num_readers=1)
    try:
        base = {"tenantId": "t", "query": {
            "powerBitsFieldName": "bits",
            "filters": {"all": {"operation": "or", "fieldFilters": [
                {"fieldName": "role", "values": ["user", "assistant"]}]}},
            "expansionField": "tool",
            "timeRange": {"smallestTimestamp": 0,
                          "largestTimestamp": 4_000_000},
            "divideTimeRangeIntoNSegments": 4}}
        # wildcard matching nothing → EMPTY waveforms, not bare sums
        req = {**base, "query": {**base["query"],
                                 "expansionValues": ["zzz*"]}}
        ans = execute_request(s, req)["answer"]
        assert ans["waveforms"] == {}
        # matching wildcard still answers per-expansion
        req = {**base, "query": {**base["query"],
                                 "expansionValues": ["t*"]}}
        ans = execute_request(s, req)["answer"]
        assert set(ans["waveforms"]) == {"all-t1", "all-t2"}
    finally:
        s.close()
