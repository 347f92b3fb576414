"""Fuzz the JSON request surface: execute_request over hypothesis-built
MiruRequest documents composed from realistic fragments.

Contract under test (a JSON API's error surface IS its behavior): every
document either answers — a JSON-serializable MiruResponse dict — or is
REJECTED with a messaged ValueError.  Any other exception class
(KeyError, TypeError, IndexError, AttributeError, ...) is an
uncontrolled crash leaking implementation detail to the API caller.
"""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FIELDS = st.sampled_from(["role", "tool", "text", "conv_id", "nope",
                          "turn_idx", ""])
VALUES = st.one_of(
    st.sampled_from(["user", "assistant", "alpha", "tool_1", "", "a b"]),
    st.integers(-5, 5),
    st.builds(lambda p: {"parts": p},
              st.lists(st.sampled_from(["user", "x", ""]), max_size=3)),
)

FIELD_FILTER = st.fixed_dictionaries(
    {"fieldName": FIELDS},
    optional={"values": st.lists(VALUES, max_size=3)})

FILTER = st.deferred(lambda: st.fixed_dictionaries(
    {"operation": st.sampled_from(["and", "or", "pButNotQ", "xor", ""])},
    optional={
        "fieldFilters": st.lists(FIELD_FILTER, max_size=3),
        "subFilters": st.lists(FILTER, max_size=2),
    }))

TIME_RANGE = st.one_of(
    st.none(),
    st.fixed_dictionaries({
        "smallestTimestamp": st.integers(-1, 2 * 10 ** 18),
        "largestTimestamp": st.integers(-1, 2 * 10 ** 18)}),
    st.fixed_dictionaries({"smallestTimestamp": st.integers(0, 10)}),
)

QUERY = st.fixed_dictionaries({}, optional={
    "query": st.sampled_from(["alpha", "role:user", '"a b"~1', "t~9",
                              "/bad[/", "*", ""]),
    "streamFilter": FILTER,
    "constraintsFilter": FILTER,
    "timeRange": TIME_RANGE,
    "aggregateCountAroundField": FIELDS,
    "desiredNumberOfDistincts": st.integers(-2, 5),
    "gatherDistinctsForField": FIELDS,
    "gatherUniquesForField": FIELDS,
    "constraints": st.dictionaries(
        st.sampled_from(["c", ""]),
        st.fixed_dictionaries({}, optional={
            "aggregateCountAroundField": FIELDS,
            "desiredNumberOfDistincts": st.integers(-1, 3),
            "gatherTermsForFields": st.lists(FIELDS, max_size=2),
            "constraintsFilter": FILTER}),
        max_size=2),
    "scoreSets": st.lists(st.fixed_dictionaries({}, optional={
        "key": st.sampled_from(["k", ""]),
        "filter": FILTER,
        "timeRange": TIME_RANGE,
        "divideTimeRangeIntoNSegments": st.integers(-1, 4),
        "strategy": st.sampled_from(
            ["LINEAR_REGRESSION", "LEADER", "PEAKS", "bogus"])}),
        max_size=2),
    "streamId": st.sampled_from(["s", ""]),
    "unreadOnly": st.booleans(),
    "includeUnreadState": st.booleans(),
    "suppressUnreadFilter": FILTER,
    "desiredNumberOfResults": st.integers(-1, 5),
    "maxWildcardExpansion": st.integers(-1, 3),
    "authzExpression": st.one_of(
        st.none(), st.lists(st.sampled_from(["acl_a", ""]), max_size=2)),
    # strut / catwalk / stumptown / metrics / anomaly shapes — mostly
    # rejected against a plain-text index, but rejection must be the
    # CONTROLLED kind
    "catwalkDefinition": st.fixed_dictionaries({}, optional={
        "features": st.lists(st.fixed_dictionaries({}, optional={
            "name": st.sampled_from(["f", ""]),
            "featureFields": st.lists(FIELDS, max_size=2)}), max_size=2),
        "gatherField": FIELDS}),
    "definition": st.fixed_dictionaries({}, optional={
        "features": st.lists(st.fixed_dictionaries({}, optional={
            "name": st.sampled_from(["f"]),
            "featureFields": st.lists(FIELDS, max_size=2)}), max_size=1),
        "gatherField": FIELDS}),
    "modelQuery": st.fixed_dictionaries({}, optional={
        "timeRange": TIME_RANGE, "constraintsFilter": FILTER}),
    "stumptownFilters": st.dictionaries(
        st.sampled_from(["w", ""]), FILTER, max_size=2),
    "powerBitsFieldName": FIELDS,
    "expansionField": FIELDS,
    "expansionValues": st.lists(st.sampled_from(["v", "*", ""]),
                                max_size=2),
})

REQUEST = st.fixed_dictionaries(
    {"query": QUERY},
    optional={"name": st.sampled_from(
        ["fullText", "distinctCount", "bogusName", ""]),
        "tenantId": st.sampled_from(["t", ""])})


@pytest.mark.filterwarnings("ignore")
def test_request_surface_rejects_or_answers_cleanly(xs_searcher):
    from miru_ray.query.request import execute_request

    @given(REQUEST)
    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def run(req):
        try:
            res = execute_request(xs_searcher, req)
        except ValueError as e:
            assert str(e), "rejections must carry a message"
            return
        assert isinstance(res, dict)
        json.dumps(res)  # MiruResponse must be JSON-serializable

    run()
