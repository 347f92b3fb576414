"""MiruRequest-shaped JSON query documents (query/request.py).

The reference's public API is a JSON request (MiruRequest.java:14-36
wrapping FullTextQuery.java:19-53); these tests assert the dict→AST
translation exactly and the end-to-end execution's parity with the
direct Searcher calls the rest of the suite already oracles.
"""
import json

import pytest

from miru_ray.config import IndexConfig
from miru_ray.query.filter import (And, Authz, Filter, Not, Or, Prefix,
                                   Term, TimeRange)
from miru_ray.query.request import (execute_request, filter_to_ast,
                                    request_to_ast)

CFG = IndexConfig()


def _req(query_str, **q):
    return {"name": "t", "tenantId": "demo",
            "query": {"query": query_str, "defaultField": "text",
                      "desiredNumberOfResults": 10, **q}}


# ---------------------------------------------------------------- mapping

def test_filter_to_ast_shapes():
    # one fieldFilter, many values = OR within the field
    f = {"operation": "and",
         "fieldFilters": [{"fieldName": "role",
                           "values": ["user", {"parts": ["agent"]}]}]}
    assert filter_to_ast(f) == Or((Term("role", "user"),
                                   Term("role", "agent")))
    # and across field filters + a subFilter
    f = {"operation": "and",
         "fieldFilters": [{"fieldName": "role", "values": ["user"]}],
         "subFilters": [{"operation": "or",
                         "fieldFilters": [{"fieldName": "tool",
                                           "values": ["grep", "sed"]}]}]}
    assert filter_to_ast(f) == And((Term("role", "user"),
                                    Or((Term("tool", "grep"),
                                        Term("tool", "sed")))))
    # pButNotQ: first child minus the rest
    f = {"operation": "pButNotQ",
         "fieldFilters": [{"fieldName": "role", "values": ["user"]},
                          {"fieldName": "tool", "values": ["grep"]}]}
    assert filter_to_ast(f) == Not(Term("role", "user"),
                                   (Term("tool", "grep"),))
    # text-field values lowercase (analyzer parity); keyword keeps case
    f = {"operation": "or",
         "fieldFilters": [{"fieldName": "text", "values": ["Spark"]},
                          {"fieldName": "role", "values": ["User"]}]}
    assert filter_to_ast(f) == Or((Term("text", "spark"),
                                   Term("role", "User")))
    # NO_FILTER degenerates to None
    assert filter_to_ast({"operation": "or"}) is None


def test_filter_to_ast_rejects():
    with pytest.raises(ValueError, match="unsupported filter operation"):
        filter_to_ast({"operation": "xor",
                       "fieldFilters": [{"fieldName": "role",
                                         "values": ["user"]}]})
    with pytest.raises(ValueError, match="multi-part"):
        filter_to_ast({"operation": "or",
                       "fieldFilters": [{"fieldName": "role",
                                         "values": [{"parts": ["a", "b"]}]}]})


def test_request_to_ast_composition():
    req = _req("spark merge",
               constraintsFilter={"operation": "and",
                                  "fieldFilters": [{"fieldName": "role",
                                                    "values": ["user"]}]},
               timeRange={"smallestTimestamp": 100,
                          "largestTimestamp": 200})
    req["authzExpression"] = {"values": ["grp1", "team2"]}
    ast, k, strategy = request_to_ast(req, CFG)
    assert ast == And((And((Term("text", "spark"), Term("text", "merge"))),
                       Filter(Term("role", "user")),
                       TimeRange(100, 200),
                       Authz(("grp1", "team2"), field="acl")))
    assert k == 10
    assert strategy == "ref-tfidf"  # the reference's TF_IDF scorer


def test_request_to_ast_expansion_cap_and_strategy():
    ast, _, strategy = request_to_ast(
        _req("spa*", maxWildcardExpansion=3, strategy="BM25"), CFG)
    assert ast == Prefix("text", "spa", max_expansion=3)
    assert strategy == "bm25"
    _, _, s2 = request_to_ast(_req("a", strategy="TIME"), CFG)
    assert s2 == "time"


def test_request_to_ast_rejects():
    with pytest.raises(ValueError, match="non-empty"):
        request_to_ast(_req("   "), CFG)
    with pytest.raises(ValueError, match="unknown strategy"):
        request_to_ast(_req("a", strategy="LOUDEST"), CFG)
    with pytest.raises(ValueError, match="at least 1"):
        request_to_ast(_req("a", desiredNumberOfResults=0), CFG)


# ---------------------------------------------------------------- execution

def test_execute_bm25_parity(xs_searcher):
    resp = execute_request(xs_searcher, _req("alpha merge",
                                             strategy="BM25"))
    direct = xs_searcher.topk("alpha merge", 10, "bm25")
    got = [(r["docId"], r["score"]) for r in resp["answer"]["results"]]
    want = list(zip(direct["doc_id"].to_pylist(),
                    direct["score"].to_pylist()))
    assert got == want
    assert resp["answer"]["found"] == len(want)
    assert json.dumps(resp)  # the whole response is JSON-serializable


def test_execute_constraints_filter_parity(xs_searcher):
    req = _req("alpha",
               constraintsFilter={"operation": "and",
                                  "fieldFilters": [{"fieldName": "role",
                                                    "values": ["user"]}]})
    resp = execute_request(xs_searcher, req)
    direct = xs_searcher.topk(
        And((Term("text", "alpha"), Filter(Term("role", "user")))),
        10, "ref-tfidf")
    assert [r["docId"] for r in resp["answer"]["results"]] \
        == direct["doc_id"].to_pylist()
    assert resp["answer"]["results"], "filtered query should still match"


def test_filter_node_gates_without_scoring(xs_searcher):
    """The reference's constraintsFilter is bitmap-ANDed but never ranks:
    a Filter-wrapped keyword term must restrict the doc set while leaving
    each surviving doc's score identical to the bare query's."""
    bare = xs_searcher.topk(Term("text", "alpha"), 100000, "bm25")
    bare_scores = dict(zip(bare["doc_id"].to_pylist(),
                           bare["score"].to_pylist()))
    filt = xs_searcher.topk(
        And((Term("text", "alpha"), Filter(Term("role", "user")))),
        100000, "bm25")
    scored = xs_searcher.topk(
        And((Term("text", "alpha"), Term("role", "user"))), 100000, "bm25")
    assert 0 < filt.num_rows < len(bare_scores)
    # same doc set as the scoring AND (the gate is identical) ...
    assert sorted(filt["doc_id"].to_pylist()) \
        == sorted(scored["doc_id"].to_pylist())
    # ... but Filter leaves the bare query's scores untouched, while the
    # unwrapped keyword term adds its own BM25 contribution
    assert all(bare_scores[d] == s
               for d, s in zip(filt["doc_id"].to_pylist(),
                               filt["score"].to_pylist()))
    assert any(bare_scores[d] != s
               for d, s in zip(scored["doc_id"].to_pylist(),
                               scored["score"].to_pylist()))


def test_filter_node_expansion_and_count(xs_searcher):
    # expansion nodes inside a Filter still expand (evaluation concern)
    n_wrapped = xs_searcher.count(
        And((Term("text", "alpha"), Filter(Prefix("text", "mer")))))
    n_plain = xs_searcher.count(
        And((Term("text", "alpha"), Prefix("text", "mer"))))
    assert n_wrapped == n_plain > 0


def test_execute_time_strategy_parity(xs_searcher):
    resp = execute_request(xs_searcher, _req("alpha", strategy="TIME"))
    direct = xs_searcher.topk_time(Term("text", "alpha"), 10)
    assert [r["docId"] for r in resp["answer"]["results"]] \
        == direct["doc_id"].to_pylist()
    # TIME surfaces the ordering key: score == timestamp, descending
    scores = [r["score"] for r in resp["answer"]["results"]]
    assert scores == sorted(scores, reverse=True)
    assert all(r["score"] == float(r["timestamp"])
               for r in resp["answer"]["results"])


def test_execute_gather_and_exhaustion(xs_searcher):
    resp = execute_request(
        xs_searcher,
        _req("alpha", gatherTermsForFields=["conv_id", "text"],
             desiredNumberOfResults=100000))
    res = resp["answer"]["results"]
    assert res and all(set(r["values"]) == {"conv_id", "text"}
                       and "alpha" in r["values"]["text"].lower()
                       and r["timestamp"] > 0 for r in res)
    # asked for more than exist → exhausted; a tight k is not
    assert resp["answer"]["resultsExhausted"]
    assert not execute_request(
        xs_searcher, _req("alpha"))["answer"]["resultsExhausted"]


def test_execute_log_level(xs_searcher):
    assert execute_request(xs_searcher, _req("alpha"))["log"] == []
    req = _req("alpha")
    req["logLevel"] = "INFO"
    log = execute_request(xs_searcher, req)["log"]
    assert log and any("strategy=ref-tfidf" in x for x in log)


def test_execute_tenant_routing(xs_index, tmp_path):
    from miru_ray.index.tenants import TenantRegistry
    reg = TenantRegistry(str(tmp_path / "reg"))
    try:
        cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
        reg.register("acme", xs_index, cfg)
        req = _req("alpha")
        req["tenantId"] = "acme"
        assert execute_request(reg, req)["answer"]["results"]
        req["tenantId"] = "nobody"
        with pytest.raises(KeyError):
            execute_request(reg, req)
        req.pop("tenantId")
        with pytest.raises(ValueError, match="tenantId"):
            execute_request(reg, req)
    finally:
        reg.close()


def test_request_cli(xs_index, capsys):
    from miru_ray.__main__ import main
    req = json.dumps(_req("alpha merge", strategy="BM25"))
    assert main(["request", "--index", xs_index, "--json", req,
                 "--num-readers", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["answer"]["results"] and out["answer"]["found"] > 0


def test_random_filter_documents_vs_brute_force(xs_searcher, xs_table):
    """Equivalence fuzz: random nested MiruFilter documents evaluated by
    the engine (filter_to_ast → match_docs) must equal a brute-force
    pandas evaluation of the same document over the raw table."""
    import numpy as np

    from miru_ray.tokenize import py_tokenize

    df = xs_table.to_pandas()  # already in (conv_id, turn_idx) doc order
    roles = df["role"].to_numpy()
    tools = df["tool"].fillna("").to_numpy()
    token_sets = [frozenset(py_tokenize(t or "")) for t in df["text"]]
    vocab = sorted(set().union(*token_sets))

    def brute(f):
        masks = []
        for ff in f.get("fieldFilters", []):
            vals = ff["values"]
            if ff["fieldName"] == "role":
                masks.append(np.isin(roles, vals))
            elif ff["fieldName"] == "tool":
                masks.append(np.isin(tools, vals))
            else:
                vs = [v.lower() for v in vals]
                masks.append(np.array([any(v in s for v in vs)
                                       for s in token_sets]))
        masks += [brute(sub) for sub in f.get("subFilters", [])]
        op = f["operation"]
        if op == "and":
            out = masks[0]
            for m in masks[1:]:
                out = out & m
            return out
        if op == "or":
            out = masks[0]
            for m in masks[1:]:
                out = out | m
            return out
        neg = np.zeros(len(df), bool)
        for m in masks[1:]:
            neg |= m
        return masks[0] & ~neg

    rng = np.random.default_rng(7)

    def rand_field_filter():
        kind = rng.integers(0, 3)
        if kind == 0:
            vals = list(rng.choice(["user", "assistant", "system", "tool"],
                                   size=rng.integers(1, 3), replace=False))
            return {"fieldName": "role", "values": vals}
        if kind == 1:
            vals = list(rng.choice(sorted(set(tools) - {""}),
                                   size=rng.integers(1, 3), replace=False))
            return {"fieldName": "tool", "values": vals}
        vals = list(rng.choice(vocab[:60], size=rng.integers(1, 3),
                               replace=False))
        return {"fieldName": "text", "values": vals}

    def rand_filter(depth):
        f = {"operation": str(rng.choice(["and", "or", "pButNotQ"])),
             "fieldFilters": [rand_field_filter()
                              for _ in range(rng.integers(1, 3))]}
        if depth > 0 and rng.random() < 0.6:
            f["subFilters"] = [rand_filter(depth - 1)
                               for _ in range(rng.integers(1, 3))]
        return f

    checked = nonempty = 0
    for _ in range(40):
        fdoc = rand_filter(2)
        want = np.flatnonzero(brute(fdoc))
        got = np.sort(xs_searcher.match_docs(filter_to_ast(fdoc)))
        assert got.tolist() == want.tolist(), fdoc
        checked += 1
        nonempty += len(want) > 0
    assert checked == 40 and nonempty >= 20  # the fuzz isn't vacuous


# ------------------------------------------- stream answerers (r4 late)

def _stream_req(**q):
    return {"name": "stream", "tenantId": "demo", "query": q}


def _text_filter(*terms):
    return {"operation": "or",
            "fieldFilters": [{"fieldName": "text", "values": list(terms)}]}


def test_distinct_count_parity(xs_searcher, xs_table):
    """DistinctCountQuery end-to-end vs a brute-force pandas evaluation
    of the same filters over the raw table."""
    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas()
    has = df["text"].map(lambda t: "alpha" in set(py_tokenize(t or "")))
    expect = sorted(set(df.loc[has & (df["role"] == "user"), "tool"])
                    - {"", None})
    resp = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        constraintsFilter={"operation": "and",
                           "fieldFilters": [{"fieldName": "role",
                                             "values": ["user"]}]},
        aggregateCountAroundField="tool",
        desiredNumberOfDistincts=100))
    ans = resp["answer"]
    assert ans["aggregateTerms"] == expect
    assert ans["collectedDistincts"] == len(expect)
    assert ans["resultsExhausted"]
    assert expect  # not vacuous


def test_distinct_count_truncation_flag(xs_searcher):
    full = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        aggregateCountAroundField="tool",
        desiredNumberOfDistincts=100))["answer"]
    assert full["collectedDistincts"] > 1
    one = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        aggregateCountAroundField="tool",
        desiredNumberOfDistincts=1))["answer"]
    # truncated page, full count, not exhausted
    assert one["aggregateTerms"] == full["aggregateTerms"][:1]
    assert one["collectedDistincts"] == full["collectedDistincts"]
    assert not one["resultsExhausted"]


def test_stream_answerers_reject(xs_searcher):
    with pytest.raises(ValueError, match="unreadOnly"):
        execute_request(xs_searcher, _stream_req(
            streamFilter=_text_filter("alpha"), unreadOnly=True,
            aggregateCountAroundField="tool",
            desiredNumberOfDistincts=5))
    with pytest.raises(ValueError, match="at least 1"):
        execute_request(xs_searcher, _stream_req(
            streamFilter=_text_filter("alpha"),
            aggregateCountAroundField="tool",
            desiredNumberOfDistincts=0))
    with pytest.raises(ValueError, match="streamFilter"):
        execute_request(xs_searcher, _stream_req(
            aggregateCountAroundField="tool",
            desiredNumberOfDistincts=5))
    with pytest.raises(ValueError, match="countTimeRange"):
        execute_request(xs_searcher, _stream_req(
            streamFilter=_text_filter("alpha"),
            collectTimeRange={"smallestTimestamp": 0,
                              "largestTimestamp": 10},
            countTimeRange={"smallestTimestamp": 0,
                            "largestTimestamp": 99},
            constraints={"c": {"aggregateCountAroundField": "conv_id",
                               "desiredNumberOfDistincts": 5}}))


def _brute_aggregate(df, tokens, roles):
    """(value, count, latest_ts, oldest_ts, latest_role, oldest_role) in
    newest stream order, ties by (ts, doc order)."""
    from miru_ray.tokenize import py_tokenize
    has = df["text"].map(
        lambda t: bool(set(py_tokenize(t or "")) & set(tokens)))
    sel = df[has & df["role"].isin(roles)]
    out = []
    for conv, g in sel.groupby("conv_id"):
        g = g.sort_values("ts", kind="stable")  # doc order breaks ties
        out.append({"value": conv, "count": len(g),
                    "latest": int(g["ts"].iloc[-1].value),
                    "oldest": int(g["ts"].iloc[0].value),
                    "latest_role": g["role"].iloc[-1],
                    "oldest_role": g["role"].iloc[0]})
    out.sort(key=lambda r: (-r["latest"], r["value"]))
    return out


def test_aggregate_counts_parity_and_paging(xs_searcher, xs_table):
    df = xs_table.to_pandas()
    # pandas Timestamp .value is ns; the engine speaks µs
    brute = _brute_aggregate(df, ["alpha"], ["user", "assistant"])
    for r in brute:
        r["latest"] //= 1000
        r["oldest"] //= 1000
    assert len(brute) >= 5  # the paging below isn't vacuous
    start, desired = 1, 3
    resp = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        constraints={"inbox": {
            "constraintsFilter": {
                "operation": "or",
                "fieldFilters": [{"fieldName": "role",
                                  "values": ["user", "assistant"]}]},
            "aggregateCountAroundField": "conv_id",
            "startFromDistinctN": start,
            "desiredNumberOfDistincts": desired,
            "gatherTermsForFields": ["role"]}}))
    ans = resp["answer"]
    con = ans["constraints"]["inbox"]
    assert con["collectedDistincts"] == len(brute)
    assert con["skippedDistincts"] == start
    assert not ans["resultsExhausted"]
    want = brute[start:start + desired]
    got = con["results"]
    assert [r["distinctValue"] for r in got] == [w["value"] for w in want]
    assert [r["count"] for r in got] == [w["count"] for w in want]
    assert [r["latestTimestamp"] for r in got] == [w["latest"] for w in want]
    assert [r["oldestTimestamp"] for r in got] == [w["oldest"] for w in want]
    assert [r["gatherLatestValues"]["role"] for r in got] == \
        [w["latest_role"] for w in want]
    assert [r["gatherOldestValues"]["role"] for r in got] == \
        [w["oldest_role"] for w in want]
    # page past the end: empty results, everything skipped, exhausted
    tail = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        constraints={"inbox": {
            "aggregateCountAroundField": "conv_id",
            "startFromDistinctN": len(brute) + 5,
            "desiredNumberOfDistincts": 3}}))["answer"]
    tcon = tail["constraints"]["inbox"]
    assert tcon["results"] == [] and tail["resultsExhausted"]
    assert tcon["skippedDistincts"] == tcon["collectedDistincts"] == \
        len(brute)


def test_aggregate_counts_collect_time_range(xs_searcher, xs_table):
    """collectTimeRange gates which docs enter the aggregate."""
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    lo, hi = int(ts_us.min()), int(ts_us.quantile(0.5))
    df2 = df[(ts_us >= lo) & (ts_us <= hi)]
    brute = _brute_aggregate(df2, ["alpha"], ["user", "assistant",
                                              "system", "tool"])
    resp = execute_request(xs_searcher, _stream_req(
        streamFilter=_text_filter("alpha"),
        collectTimeRange={"smallestTimestamp": lo, "largestTimestamp": hi},
        constraints={"c": {"aggregateCountAroundField": "conv_id",
                           "startFromDistinctN": 0,
                           "desiredNumberOfDistincts": 10 ** 6}}))
    got = resp["answer"]["constraints"]["c"]["results"]
    assert [r["distinctValue"] for r in got] == [w["value"] for w in brute]
    assert [r["count"] for r in got] == [w["count"] for w in brute]
    assert brute  # not vacuous


# ------------------------------------------------------------- analytics

def test_analytics_waveform_parity(xs_searcher, xs_table):
    """AnalyticsQuery end-to-end vs a brute-force per-segment histogram
    of the same filters over the raw table (half-open [lo, hi), exact
    integer bucketing)."""
    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    lo, hi = int(ts_us.min()), int(ts_us.max()) + 1
    n = 7
    has = df["text"].map(lambda t: "alpha" in set(py_tokenize(t or "")))

    def brute(role):
        sel = ts_us[has & (df["role"] == role)]
        sel = sel[(sel >= lo) & (sel < hi)]
        seg = (sel - lo) * n // (hi - lo)
        return [int((seg == i).sum()) for i in range(n)]

    resp = execute_request(xs_searcher, _stream_req(
        constraintsFilter=_text_filter("alpha"),
        scoreSets=[{"key": "all",
                    "timeRange": {"smallestTimestamp": lo,
                                  "largestTimestamp": hi},
                    "divideTimeRangeIntoNSegments": n}],
        analyticsFilters={
            r: {"operation": "and",
                "fieldFilters": [{"fieldName": "role", "values": [r]}]}
            for r in ("user", "assistant")}))
    rows = {r["id"]: r["waveform"]
            for r in resp["answer"]["waveforms"]["all"]}
    assert rows["user"] == brute("user")
    assert rows["assistant"] == brute("assistant")
    assert sum(rows["user"]) + sum(rows["assistant"]) > 0  # not vacuous
    assert resp["answer"]["resultsExhausted"]


def test_analytics_waveform_rejects(xs_searcher):
    base = dict(constraintsFilter=_text_filter("alpha"),
                analyticsFilters={"u": _text_filter("alpha")})
    with pytest.raises((ValueError, KeyError)):
        # missing timeRange (ScoreSet rejects ALL_TIME)
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k",
                        "divideTimeRangeIntoNSegments": 4}], **base))
    with pytest.raises(ValueError, match="at least 1"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k",
                        "timeRange": {"smallestTimestamp": 0,
                                      "largestTimestamp": 10},
                        "divideTimeRangeIntoNSegments": 0}], **base))
    with pytest.raises(ValueError, match="lo < hi"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k",
                        "timeRange": {"smallestTimestamp": 10,
                                      "largestTimestamp": 10},
                        "divideTimeRangeIntoNSegments": 4}], **base))
    with pytest.raises(ValueError, match="capped"):
        # unbounded n would allocate (filters x n) int64 per reader
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k",
                        "timeRange": {"smallestTimestamp": 0,
                                      "largestTimestamp": 10},
                        "divideTimeRangeIntoNSegments": 10 ** 9}], **base))
    with pytest.raises(ValueError, match="analyticsFilters"):
        execute_request(xs_searcher, _stream_req(
            constraintsFilter=_text_filter("alpha"),
            scoreSets=[{"key": "k",
                        "timeRange": {"smallestTimestamp": 0,
                                      "largestTimestamp": 10},
                        "divideTimeRangeIntoNSegments": 4}]))


# -------------------------------------------------------------- trending

def _brute_trending(df, token, field, lo, hi, n):
    """Per-field-value waveforms + the four strategy ranks, straight off
    the raw table (independent float arithmetic; the engine accumulates
    in exact integers — equal doubles for these magnitudes)."""
    import numpy as np

    from miru_ray.ops.analytics import _peakdet
    from miru_ray.tokenize import py_tokenize
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    has = df["text"].map(lambda t: token in set(py_tokenize(t or "")))
    sel = df[has & (ts_us >= lo) & (ts_us < hi) & (df[field] != "")]
    sel_ts = ts_us[sel.index]
    waves = {}
    for v, g in sel.groupby(field):
        seg = ((sel_ts[g.index] - lo) * n // (hi - lo)).to_numpy()
        w = np.bincount(seg, minlength=n).astype(np.int64)
        if w.any():
            waves[v] = w
    x = np.arange(n, dtype=float)
    sx, sxx = x.sum(), (x * x).sum()
    b95 = float(np.percentile(
        np.array([float(w.max()) for w in waves.values()]), 95))
    ranks = {"LINEAR_REGRESSION": {}, "LEADER": {}, "PEAKS": {},
             "HIGHEST_PEAK": {}}
    for v, w in waves.items():
        y = w.astype(float)
        ranks["LINEAR_REGRESSION"][v] = \
            (n * (x * y).sum() - sx * y.sum()) / (n * sxx - sx * sx)
        ranks["LEADER"][v] = float(y.sum())
        ranks["HIGHEST_PEAK"][v] = float(y.max())
        ranks["PEAKS"][v] = float(_peakdet(y, float(y.max()) / 6
                                           + b95 / 100))
    return waves, ranks


def _trending_req(lo, hi, n, desired, field="tool", token="alpha",
                  n_sets=1, **extra):
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    ss = [{"key": f"k{i}", "strategies": ["LINEAR_REGRESSION", "LEADER",
                                          "PEAKS", "HIGHEST_PEAK"],
           "timeRange": tr, "divideTimeRangeIntoNSegments": n,
           "desiredNumberOfDistincts": desired} for i in range(n_sets)]
    return _stream_req(
        constraintsFilter=_text_filter(token),
        aggregateCountAroundField=field,
        distinctQueries=[[{"timeRange": tr,
                           "gatherDistinctsForField": field}]],
        scoreSets=ss, **extra)


def test_trending_parity(xs_searcher, xs_table):
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    lo, hi, n, desired = int(ts_us.min()), int(ts_us.max()) + 1, 6, 4
    waves, ranks = _brute_trending(df, "alpha", "tool", lo, hi, n)
    assert len(waves) > desired  # the top-k cut below isn't vacuous
    resp = execute_request(xs_searcher, _trending_req(lo, hi, n, desired))
    got = resp["answer"]["scoreSets"]["k0"]["results"]
    for strat, want in ranks.items():
        expect = sorted(((r, v) for v, r in want.items()),
                        key=lambda t: (-t[0], t[1]))[:desired]
        assert [(t["rank"], t["distinctValue"]) for t in got[strat]] \
            == expect, strat
    # retained waveforms match the brute histograms
    wf = {r["id"]: r["waveform"]
          for r in resp["answer"]["waveforms"]["k0"]}
    retained = {t["distinctValue"] for s in got.values() for t in s}
    assert set(wf) == retained
    for v, w in wf.items():
        assert w == list(waves[v]), v


def test_trending_consumed_and_grid(xs_searcher, xs_table):
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    lo, hi, n = int(ts_us.min()), int(ts_us.max()) + 1, 6
    # two identical score sets: the second must skip everything the
    # first retained (consumed semantics)
    resp = execute_request(xs_searcher,
                           _trending_req(lo, hi, n, 3, n_sets=2))
    sets = resp["answer"]["scoreSets"]
    first = {t["distinctValue"] for s in sets["k0"]["results"].values()
             for t in s}
    second = {t["distinctValue"] for s in sets["k1"]["results"].values()
              for t in s}
    assert first and second and not (first & second)
    # AND grid: intersecting with a prefix-restricted gather cuts terms
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    req = _trending_req(lo, hi, n, 10)
    req["query"]["distinctQueries"].append(
        [{"timeRange": tr, "gatherDistinctsForField": "tool",
          "prefixes": ["tool_0"]}])
    got = execute_request(xs_searcher, req)["answer"]["scoreSets"]["k0"]
    vals = {t["distinctValue"] for s in got["results"].values() for t in s}
    assert vals and all(v.startswith("tool_0") for v in vals)
    # constraintsFilter path gathers from the docstore: restricting the
    # gather to user-role docs must yield a subset of the full gather
    req2 = _trending_req(lo, hi, n, 20)
    req2["query"]["distinctQueries"] = [[
        {"timeRange": tr, "gatherDistinctsForField": "tool",
         "constraintsFilter": {"operation": "and",
                               "fieldFilters": [{"fieldName": "role",
                                                 "values": ["user"]}]}}]]
    got2 = execute_request(xs_searcher, req2)["answer"]["scoreSets"]["k0"]
    vals2 = {t["distinctValue"] for s in got2["results"].values()
             for t in s}
    full = execute_request(
        xs_searcher, _trending_req(lo, hi, n, 20))["answer"]["scoreSets"]
    vals_full = {t["distinctValue"]
                 for s in full["k0"]["results"].values() for t in s}
    assert vals2 and vals2 <= vals_full


def test_trending_rejects(xs_searcher):
    tr = {"smallestTimestamp": 0, "largestTimestamp": 10}
    base = dict(constraintsFilter=_text_filter("alpha"),
                aggregateCountAroundField="tool",
                distinctQueries=[[{"timeRange": tr,
                                   "gatherDistinctsForField": "tool"}]])
    with pytest.raises(ValueError, match="at least one strategy"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k", "timeRange": tr,
                        "divideTimeRangeIntoNSegments": 4,
                        "desiredNumberOfDistincts": 5}], **base))
    with pytest.raises(ValueError, match="unknown trending strategy"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k", "strategies": ["SLOPE"],
                        "timeRange": tr,
                        "divideTimeRangeIntoNSegments": 4,
                        "desiredNumberOfDistincts": 5}], **base))
    with pytest.raises(ValueError, match="timeRange"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k", "strategies": ["LEADER"],
                        "divideTimeRangeIntoNSegments": 4,
                        "desiredNumberOfDistincts": 5}], **base))
    with pytest.raises(ValueError, match="at least 1"):
        execute_request(xs_searcher, _stream_req(
            scoreSets=[{"key": "k", "strategies": ["LEADER"],
                        "timeRange": tr,
                        "divideTimeRangeIntoNSegments": 4,
                        "desiredNumberOfDistincts": 0}], **base))
    with pytest.raises(ValueError, match="explicit\\s+timeRange"):
        execute_request(xs_searcher, _stream_req(
            constraintsFilter=_text_filter("alpha"),
            aggregateCountAroundField="tool",
            distinctQueries=[[{"gatherDistinctsForField": "tool"}]],
            scoreSets=[{"key": "k", "strategies": ["LEADER"],
                        "timeRange": tr,
                        "divideTimeRangeIntoNSegments": 4,
                        "desiredNumberOfDistincts": 5}]))


# ------------------------------------------------------------------ reco

def _brute_reco(df, me, lo, hi, desired, rm_prefix=None, role=None):
    """CollaborativeFiltering.java 3-hop, straight off the raw table."""
    ts_us = df["ts"].astype("int64")
    if str(df["ts"].dtype).endswith("[ns]"):
        ts_us = ts_us // 1000
    win = df[(ts_us >= lo) & (ts_us <= hi)]
    if role is not None:
        win = win[win["role"] == role]
    my = win[win["conv_id"] == me]
    parents = set(my["tool"]) - {""}
    other = win[win["tool"].isin(parents) & (win["conv_id"] != me)]
    contrib = sorted(((len(g), c) for c, g in other.groupby("conv_id")),
                     key=lambda t: (-t[0], t[1]))[:desired]
    excl = set(parents)
    if rm_prefix:
        excl |= {t for t in set(win["tool"]) - {""}
                 if t.startswith(rm_prefix)}
    score: dict = {}
    for cnt, c in contrib:
        tools = set(win.loc[win["conv_id"] == c, "tool"]) - {""}
        for t in tools - excl:
            score[t] = score.get(t, 0) + cnt
    top = sorted(((s, t) for t, s in score.items()),
                 key=lambda r: (-r[0], r[1]))[:desired]
    return contrib, [(t, float(s)) for s, t in top]


def _reco_req(me, lo, hi, desired, f2="conv_id", f3="tool", **extra):
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    return _stream_req(
        timeRange=tr,
        constraintsFilter={"operation": "and",
                           "fieldFilters": [{"fieldName": "conv_id",
                                             "values": [me]}]},
        aggregateFieldName1="tool", aggregateFieldName2=f2,
        aggregateFieldName3=f3, desiredNumberOfDistincts=desired, **extra)


def _xs_reco_searcher(xs_path, tmp_path_factory):
    """xs index with conv_id as a keyword field (the reco 'user' axis)."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    d = str(tmp_path_factory.mktemp("idx") / "xs_reco")
    build_index(xs_path, d, IndexConfig(
        docs_per_partition=1000, num_shards=2,
        keyword_fields=("role", "tool", "conv_id")))
    return Searcher(d, num_readers=2)


@pytest.fixture(scope="module")
def reco_searcher(ray_session, xs_path, tmp_path_factory):
    s = _xs_reco_searcher(xs_path, tmp_path_factory)
    yield s
    s.close()


def test_reco_parity(reco_searcher, xs_table):
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    lo, hi = int(ts_us.min()), int(ts_us.quantile(0.6))
    me = "conv-00000008"
    _contrib, want = _brute_reco(df, me, lo, hi, 8, rm_prefix="tool_0")
    assert len(want) >= 3  # not vacuous
    resp = execute_request(reco_searcher, _reco_req(
        me, lo, hi, 8,
        removeDistinctsQuery={
            "timeRange": {"smallestTimestamp": lo, "largestTimestamp": hi},
            "gatherDistinctsForField": "tool",
            "prefixes": ["tool_0"]}))
    ans = resp["answer"]
    got = [(r["distinctValue"], r["rank"]) for r in ans["results"]]
    assert got == want
    assert ans["partitionsVisited"] >= 1
    assert not ans["resultsExhausted"]
    # the exclusion is live: without it, some tool_0* tool ranks
    _c, want_norm = _brute_reco(df, me, lo, hi, 8)
    assert {t for t, _ in want_norm} - {t for t, _ in want}


def test_reco_field2_eq_field3_short_circuit(reco_searcher, xs_table):
    """field2 == field3: the ranked contributors ARE the answer
    (CollaborativeFiltering.java:153-156)."""
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    lo, hi = int(ts_us.min()), int(ts_us.quantile(0.6))
    me = "conv-00000008"
    contrib, _w = _brute_reco(df, me, lo, hi, 6)
    resp = execute_request(reco_searcher, _reco_req(
        me, lo, hi, 6, f2="conv_id", f3="conv_id"))
    got = [(r["distinctValue"], r["rank"]) for r in resp["answer"]["results"]]
    assert got == [(c, float(n)) for n, c in contrib]
    assert got  # not vacuous


def test_reco_scorable_filter_gates_ok(reco_searcher, xs_table):
    """scorableFilter restricts the ok-activity universe
    (RecoQuestion.java:85-95)."""
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    lo, hi = int(ts_us.min()), int(ts_us.max()) + 1
    me = "conv-00000008"
    _c, want = _brute_reco(df, me, lo, hi, 8, role="user")
    resp = execute_request(reco_searcher, _reco_req(
        me, lo, hi, 8,
        scorableFilter={"operation": "and",
                        "fieldFilters": [{"fieldName": "role",
                                          "values": ["user"]}]}))
    got = [(r["distinctValue"], r["rank"]) for r in resp["answer"]["results"]]
    assert got == want and got


def test_reco_rejects(reco_searcher):
    tr = {"smallestTimestamp": 0, "largestTimestamp": 10}
    with pytest.raises(ValueError, match="timeRange"):
        execute_request(reco_searcher, _stream_req(
            constraintsFilter=_text_filter("alpha"),
            aggregateFieldName1="tool", aggregateFieldName2="conv_id",
            aggregateFieldName3="tool", desiredNumberOfDistincts=5))
    with pytest.raises(ValueError, match="at least 1"):
        execute_request(reco_searcher, _reco_req("c", 0, 10, 0))
    with pytest.raises(ValueError, match="constraintsFilter"):
        execute_request(reco_searcher, _stream_req(
            timeRange=tr, aggregateFieldName1="tool",
            aggregateFieldName2="conv_id", aggregateFieldName3="tool",
            desiredNumberOfDistincts=5))
    with pytest.raises(ValueError, match="keyword field"):
        execute_request(reco_searcher, _reco_req(
            "c", 0, 10, 5, f2="nosuchfield"))


# -------------------------------------------------- distincts / uniques

def test_distincts_and_uniques_parity(xs_searcher, xs_table):
    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas()
    ts_us = df["ts"].astype("int64")
    lo, hi = int(ts_us.min()), int(ts_us.quantile(0.5))
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    has = df["text"].map(lambda t: "alpha" in set(py_tokenize(t or "")))
    win = df[has & (ts_us >= lo) & (ts_us <= hi)]
    want = sorted(set(win["tool"]) - {""})
    assert want  # not vacuous
    got = execute_request(xs_searcher, _stream_req(
        timeRange=tr, gatherDistinctsForField="tool",
        constraintsFilter=_text_filter("alpha")))["answer"]
    assert got["results"] == want
    assert got["collectedDistincts"] == len(want)
    # uniques = the same gather, cardinality only (JSON name
    # 'constraints' per UniquesQuery.java:28)
    uq = execute_request(xs_searcher, _stream_req(
        timeRange=tr, gatherUniquesForField="tool",
        constraints=_text_filter("alpha")))["answer"]
    assert uq["uniques"] == len(want)
    # prefixes restrict the filtered gather
    pre = execute_request(xs_searcher, _stream_req(
        timeRange=tr, gatherDistinctsForField="tool",
        constraintsFilter=_text_filter("alpha"),
        prefixes=["tool_0"]))["answer"]
    assert pre["results"] == [v for v in want if v.startswith("tool_0")]
    # dictionary path (no filter): every indexed value of the field
    full = execute_request(xs_searcher, _stream_req(
        timeRange=tr, gatherDistinctsForField="tool"))["answer"]
    assert full["results"] == sorted(set(df["tool"]) - {""})


# ------------------------------------------- stumptown / metrics / anomaly

def _seg(ts_us, lo, hi, n):
    import numpy as np
    ts_us = np.asarray(ts_us, np.int64)
    return (ts_us - lo) * n // (hi - lo)


def test_stumptown_parity(xs_searcher, xs_table):
    """Waveform counts + newest-N results vs a brute-force recompute
    (Stumptown.java:38-72: per-segment cardinalities, newest docs
    chronologically descending)."""
    import numpy as np

    from miru_ray.tokenize import py_tokenize
    df = xs_table.to_pandas().reset_index(drop=True)
    df["doc_id"] = np.arange(len(df))
    ts_us = df["ts"].astype("int64").to_numpy()
    lo, hi = int(ts_us.min()), int(np.quantile(ts_us, 0.7))
    n = 8
    has = df["text"].map(lambda t: "alpha" in set(py_tokenize(t or "")))
    resp = execute_request(xs_searcher, {
        "name": "st", "tenantId": "demo",
        "query": {"timeRange": {"smallestTimestamp": lo,
                                "largestTimestamp": hi},
                  "divideTimeRangeIntoNSegments": n,
                  "desiredNumberOfResultsPerWaveform": 4,
                  "constraintsFilter": _text_filter("alpha"),
                  "stumptownFilters": {
                      r: {"operation": "and",
                          "fieldFilters": [{"fieldName": "role",
                                            "values": [r]}]}
                      for r in ("user", "tool")}}})
    waves = resp["answer"]["waveforms"]
    assert set(waves) == {"user", "tool"}
    for role in ("user", "tool"):
        m = has & (df["role"] == role) & (ts_us >= lo) & (ts_us <= hi)
        sub = df[m]
        inwin = sub[sub["ts"].astype("int64") < hi]
        want_wave = np.bincount(
            _seg(inwin["ts"].astype("int64"), lo, hi, n),
            minlength=n).tolist()
        assert waves[role]["waveform"] == want_wave
        newest = sub.sort_values(["ts", "doc_id"],
                                 ascending=[False, False]).head(4)
        assert [r["docId"] for r in waves[role]["results"]] == \
            newest["doc_id"].tolist()
        assert [r["timestamp"] for r in waves[role]["results"]] == \
            newest["ts"].astype("int64").tolist()


@pytest.fixture(scope="module")
def bits_searcher(ray_session, tmp_path_factory):
    """Tiny power-bits index: val column with positive / negative / zero
    / huge / Long.MIN_VALUE entries (SampleTrawl.java:50-67 encoding)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.query.engine import Searcher
    i64 = np.iinfo(np.int64)
    # ts seconds: 0,1,2,3,8,9,10,11 over a [0,12) window of 6 segments
    # → segments 2 (4-5 s) and 3 (6-7 s) are EMPTY (interpolation branch)
    secs = [0, 1, 2, 3, 8, 9, 10, 11]
    vals = [5, -3, 0, 7, i64.min, 2 ** 62, 2 ** 62, 2 ** 62]
    roles = ["user", "assistant"] * 4
    t = pa.table({
        "conv_id": pa.array(["conv-0"] * 8),
        "turn_idx": pa.array(list(range(8)), pa.int32()),
        "role": pa.array(roles),
        "text": pa.array([f"doc number {i}" for i in range(8)]),
        "tool": pa.array([""] * 8),
        "ts": pa.array([s * 1_000_000 for s in secs], pa.timestamp("us")),
        "val": pa.array(vals, pa.int64()),
    })
    src = tmp_path_factory.mktemp("bits") / "t.parquet"
    pq.write_table(t, str(src))
    d = str(tmp_path_factory.mktemp("bits") / "idx")
    build_index(str(src), d, IndexConfig(
        docs_per_partition=4, num_shards=1, keyword_fields=("role",),
        power_bits_fields=(("bits", "val"),)))
    s = Searcher(d, num_readers=2)
    yield s
    s.close()


_I64MAX = (1 << 63) - 1


def test_metrics_avg_interpolation_and_magnitude(bits_searcher):
    """metricingAvg over the bits index: sign IGNORED (magnitudes sum,
    MetricsQuestion.java:147-155 fetches only bit terms), empty segments
    linearly interpolated with flat extension (Anomaly.java:36-100),
    per-segment overflow saturates at Long.MAX_VALUE
    (Anomaly.java:118-123)."""
    resp = execute_request(bits_searcher, {
        "name": "m", "tenantId": "demo",
        "query": {"timeRange": {"smallestTimestamp": 0,
                                "largestTimestamp": 12_000_000},
                  "divideTimeRangeIntoNSegments": 6,
                  "powerBitsFieldName": "bits",
                  "filters": {"all": {
                      "operation": "and",
                      "fieldFilters": [{"fieldName": "role",
                                        "values": ["user",
                                                   "assistant"]}]}}}})
    [w] = resp["answer"]["waveforms"]
    assert w["id"] == "all"
    # magnitudes: 5,3,0,7, i64max, 2^62 ×3; segments of 2 s:
    #   seg0 = (5+3)//2 = 4;  seg1 = (0+7)//2 = 3
    #   seg4 = (i64max + 2^62) → saturates to i64max, //2
    #   seg5 = (2^62 + 2^62) = 2^63 → saturates to i64max, //2
    #   seg2, seg3 empty → interpolate between seg1 (x=1, y=3) and
    #   seg4 (x=4, y=i64max//2): trunc(3 + (y4-3)*k/3), k=1,2
    y4 = _I64MAX // 2
    exp2 = int(3 + (y4 - 3) * 1 / 3)
    exp3 = int(3 + (y4 - 3) * 2 / 3)
    assert w["waveform"] == [4, 3, exp2, exp3, y4, y4]


def test_anomaly_sign_expansion_and_keys(bits_searcher):
    """Anomaly: sign-partitioned sums merged positive − negative
    (AnomalyQuestion.java:210-235), expansion values join each filter as
    `name-value` keys, trailing-* expands from the term dictionary."""
    base = {"operation": "and",
            "fieldFilters": [{"fieldName": "role",
                              "values": ["user", "assistant"]}]}
    q = {"timeRange": {"smallestTimestamp": 0,
                       "largestTimestamp": 12_000_000},
         "divideTimeRangeIntoNSegments": 6,
         "powerBitsFieldName": "bits",
         "filters": {"t": base},
         "expansionField": "role",
         "expansionValues": ["*"]}
    resp = execute_request(bits_searcher, {"name": "a", "tenantId": "demo",
                                           "query": q})
    waves = resp["answer"]["waveforms"]
    assert set(waves) == {"t-user", "t-assistant"}
    # user docs: secs 0,2,8,10 → vals 5,0,min,2^62
    #   seg0 = 5, seg1 = 0, seg4 = −i64max (min flips lossily to max
    #   magnitude, negative sign), seg5 = 2^62
    assert waves["t-user"] == [5, 0, 0, 0, -_I64MAX, 2 ** 62]
    # assistant docs: secs 1,3,9,11 → vals −3,7,2^62,2^62
    assert waves["t-assistant"] == [-3, 7, 0, 0, 2 ** 62, 2 ** 62]
    # literal expansion values behave like the star scan, same keys
    q2 = dict(q, expansionValues=["user"])
    w2 = execute_request(bits_searcher, {"name": "a", "tenantId": "demo",
                                         "query": q2})
    assert w2["answer"]["waveforms"] == {"t-user": waves["t-user"]}
    # empty expansion → bare filter names (AnomalyQuestion.java:186-189;
    # expansionField present keeps the anomaly dispatch — without BOTH
    # knobs the JSON shape is a MetricsQuery, as in the reference where
    # the endpoint URL disambiguates)
    q3 = dict(q, expansionValues=[])
    w3 = execute_request(bits_searcher, {"name": "a", "tenantId": "demo",
                                         "query": q3})
    assert list(w3["answer"]["waveforms"]) == ["t"]
    # bare filter spans both roles: seg4 = 2^62 − i64max (the min flip),
    # seg5 = 2^62 + 2^62 saturating at Long.MAX_VALUE before the merge
    assert w3["answer"]["waveforms"]["t"] == [
        2, 7, 0, 0, 2 ** 62 - _I64MAX, _I64MAX]


def test_waves_rejects(bits_searcher, xs_searcher):
    base = {"name": "r", "tenantId": "demo"}
    with pytest.raises(ValueError, match="timeRange"):
        execute_request(bits_searcher, {
            **base, "query": {"divideTimeRangeIntoNSegments": 4,
                              "powerBitsFieldName": "bits",
                              "filters": {"x": {}}}})
    with pytest.raises(ValueError, match="Segments"):
        execute_request(bits_searcher, {
            **base, "query": {"timeRange": {"smallestTimestamp": 0,
                                            "largestTimestamp": 10},
                              "powerBitsFieldName": "bits",
                              "filters": {"x": {}}}})
    with pytest.raises(ValueError, match="filters"):
        execute_request(bits_searcher, {
            **base, "query": {"timeRange": {"smallestTimestamp": 0,
                                            "largestTimestamp": 10},
                              "divideTimeRangeIntoNSegments": 4,
                              "powerBitsFieldName": "bits"}})
    # an index built WITHOUT the power-bits field fails loudly
    with pytest.raises(ValueError, match="power-bits"):
        execute_request(xs_searcher, {
            **base, "query": {"timeRange": {"smallestTimestamp": 0,
                                            "largestTimestamp": 10},
                              "divideTimeRangeIntoNSegments": 4,
                              "powerBitsFieldName": "bits",
                              "filters": {"x": {
                                  "operation": "and",
                                  "fieldFilters": [{
                                      "fieldName": "role",
                                      "values": ["user"]}]}}}})
    # stumptown requires the filters map too
    with pytest.raises(ValueError, match="stumptownFilters"):
        execute_request(xs_searcher, {
            **base, "query": {"timeRange": {"smallestTimestamp": 0,
                                            "largestTimestamp": 10},
                              "divideTimeRangeIntoNSegments": 4,
                              "stumptownFilters": {}}})


# ----------------------------------------------------- catwalk / strut

def _cw_defn(features, top_n):
    return {"catwalkId": "t", "gatherField": "conv_id",
            "scorableField": "conv_id", "features": features,
            "featureStrategy": "UNIT_WEIGHTED",
            "numeratorCount": 2}


def _cw_model_q(lo, hi, top_n):
    return {"timeRange": {"smallestTimestamp": lo, "largestTimestamp": hi},
            "modelFilters": [
                {"operation": "and",
                 "fieldFilters": [{"fieldName": "role", "values": [r]}]}
                for r in ("user", "assistant")],
            "desiredNumberOfResults": top_n}


def _brute_catwalk(df, lo, hi, top_n, field):
    """Catwalk.java:88-215 recompute: numerator sets = top-N convs by
    doc count under each role filter in the window (count DESC, conv
    ASC); numerators = window doc counts of set members per value;
    denominator = corpus-wide value counts."""
    ts = df["ts"].astype("int64")
    win = df[(ts >= lo) & (ts <= hi)]
    sets = []
    for r in ("user", "assistant"):
        cnt = win[win["role"] == r].groupby("conv_id").size()
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        sets.append({c for c, _n in ranked[:top_n]})
    vis = df[field][df[field] != ""]
    den = vis.groupby(vis).size()
    out = {}
    for v in sorted(den.index):
        nums = []
        for s in sets:
            m = win[(win[field] == v) & win["conv_id"].isin(s)]
            nums.append(len(m))
        out[v] = (nums, int(den[v]))
    return out


def test_catwalk_parity(reco_searcher, xs_table):
    import numpy as np
    df = xs_table.to_pandas().reset_index(drop=True)
    ts = df["ts"].astype("int64")
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    resp = execute_request(reco_searcher, {
        "name": "cw", "tenantId": "demo",
        "query": {"definition": _cw_defn(
                      [{"name": "tools", "featureFields": ["tool"],
                        "featureScalar": 1.0}], 5),
                  "modelQuery": _cw_model_q(lo, hi, 5)}})
    ans = resp["answer"]
    want = _brute_catwalk(df, lo, hi, 5, "tool")
    got = {r["termIds"][0]: (r["numerators"], r["denominator"])
           for r in ans["results"][0]}
    # engine drops never-observed values; every brute row with any
    # signal must match exactly
    for v, (nums, den) in want.items():
        if den or any(nums):
            assert got[v] == (nums, den), v
    assert ans["totalCount"] == len(df)
    assert not ans["destroyed"]


def _strut_req(lo, hi, chi, k, **over):
    q = {"catwalkDefinition": _cw_defn(
             [{"name": "tools", "featureFields": ["tool"],
               "featureScalar": 1.0},
              {"name": "roles", "featureFields": ["role"],
               "featureScalar": 0.5}], 5),
         "modelScalars": [{"catwalkModelQuery": _cw_model_q(lo, hi, 5),
                           "scalar": 1.0}],
         "timeRange": {"smallestTimestamp": lo, "largestTimestamp": chi},
         "constraintFilter": {
             "operation": "and",
             "fieldFilters": [{"fieldName": "role",
                               "values": ["user", "assistant",
                                          "system", "tool"]}]},
         "numeratorStrategy": "REGRESSION_WEIGHTED",
         "numeratorScalars": [0.5, 0.4],
         "desiredNumberOfResults": k}
    q.update(over)
    return {"name": "st", "tenantId": "demo", "query": q}


def _brute_strut(df, lo, hi, chi, k):
    """Strut.java:354-407 recompute (single model, scalar 1.0):
    s_i(v) = clamp(num_i/den ≤ 1); feature score = max over observed
    values of s·featureScalar; UNIT_WEIGHTED finalize = Σ positive / 2;
    REGRESSION_WEIGHTED scale over (0.5, 0.4)."""
    import numpy as np
    ts = df["ts"].astype("int64")
    model = {"tool": _brute_catwalk(df, lo, hi, 5, "tool"),
             "role": _brute_catwalk(df, lo, hi, 5, "role")}
    cand_win = df[(ts >= lo) & (ts <= chi)]
    rows = []
    for conv, sub in cand_win.groupby("conv_id"):
        feat = np.zeros((2, 2))  # [numerator, feature]
        for fi, (field, scalar) in enumerate((("tool", 1.0),
                                              ("role", 0.5))):
            vals = set(sub[field]) - {""}
            for v in vals:
                nums, den = model[field].get(v, ([0, 0], 0))
                s = np.minimum(np.array(nums, float) /
                               max(den, 1) * (den > 0), 1.0)
                upd = s * scalar
                feat[:, fi] = np.maximum(feat[:, fi], upd)
        term = np.array([f[f > 0].sum() / 2 if (f > 0).any() else 0.0
                         for f in feat])
        scaled = term * np.array([0.5, 0.4])
        pos = scaled[scaled > 0]
        score = float(pos.sum()) if len(pos) else 0.0
        sub_ts = sub["ts"].astype("int64")
        rows.append((score, conv, int(sub_ts.max()), len(sub)))
    rows.sort(key=lambda r: (-r[0], r[1]))
    return rows[:k]


def test_strut_parity_and_gather(reco_searcher, xs_table):
    df = xs_table.to_pandas().reset_index(drop=True)
    df["doc_id"] = range(len(df))
    ts = df["ts"].astype("int64")
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    chi = int(ts.quantile(0.25))
    resp = execute_request(reco_searcher, _strut_req(
        lo, hi, chi, 8, includeFeatures=True,
        gatherTermsForFields=["role"]))
    got = resp["answer"]["results"]
    want = _brute_strut(df, lo, hi, chi, 8)
    assert [(r["value"], round(r["score"], 9)) for r in got] == \
        [(v, round(s, 9)) for s, v, _t, _n in want]
    assert [(r["timestamp"], r["count"]) for r in got] == \
        [(t, n) for _s, _v, t, n in want]
    # includeFeatures: some hotness rows surface for a scoring result
    assert any(r["features"] and any(r["features"]) for r in got
               if r["score"] > 0)
    # gatherLatestValues = the NEWEST matching doc's field values
    # (ts order, not doc-id order)
    for r in got:
        sub = df[(df["conv_id"] == r["value"]) & (ts >= lo) & (ts <= chi)]
        newest = sub.sort_values(["ts", "doc_id"],
                                 ascending=False).iloc[0]
        assert r["gatherLatestValues"] == {"role": [newest["role"]]}


def test_strut_model_cache_reused(reco_searcher, xs_table):
    ts = xs_table["ts"].cast("int64").to_pandas()
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    chi = int(ts.quantile(0.25))
    reco_searcher._strut_models = {}
    r1 = execute_request(reco_searcher, _strut_req(lo, hi, chi, 5))
    assert len(reco_searcher._strut_models) == 1
    r2 = execute_request(reco_searcher, _strut_req(lo, hi, chi, 5))
    assert len(reco_searcher._strut_models) == 1  # hit, not rebuilt
    assert r1["answer"]["results"] == r2["answer"]["results"]


def test_strutcat_rejects(reco_searcher, xs_table):
    ts = xs_table["ts"].cast("int64").to_pandas()
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    chi = int(ts.quantile(0.25))
    # numeratorCount must equal modelFilters length
    bad = _cw_model_q(lo, hi, 5)
    bad["modelFilters"] = bad["modelFilters"][:1]
    with pytest.raises(ValueError, match="Numerator count"):
        execute_request(reco_searcher, {
            "name": "cw", "tenantId": "demo",
            "query": {"definition": _cw_defn(
                          [{"name": "t", "featureFields": ["tool"]}], 5),
                      "modelQuery": bad}})
    # desiredNumberOfResults >= 1 (CatwalkModelQuery.java:108)
    with pytest.raises(ValueError, match="at least 1"):
        execute_request(reco_searcher, {
            "name": "cw", "tenantId": "demo",
            "query": {"definition": _cw_defn(
                          [{"name": "t", "featureFields": ["tool"]}], 5),
                      "modelQuery": _cw_model_q(lo, hi, 0)}})
    # ≥3-field combos need an N-way docstore walk — rejected
    with pytest.raises(ValueError, match="1 or 2 featureFields"):
        execute_request(reco_searcher, {
            "name": "cw", "tenantId": "demo",
            "query": {"definition": _cw_defn(
                          [{"name": "x",
                            "featureFields": ["tool", "role",
                                              "conv_id"]}], 5),
                      "modelQuery": _cw_model_q(lo, hi, 5)}})
    # strut: unknown strategy / scalar-length mismatch / unread knob
    with pytest.raises(ValueError, match="Strategy not supported"):
        execute_request(reco_searcher, _strut_req(
            lo, hi, chi, 5, numeratorStrategy="MEAN"))
    with pytest.raises(ValueError, match="same length"):
        execute_request(reco_searcher, _strut_req(
            lo, hi, chi, 5, numeratorScalars=[0.5, 0.4, 0.3]))
    with pytest.raises(ValueError, match="unreadStreamId"):
        execute_request(reco_searcher, _strut_req(
            lo, hi, chi, 5, unreadStreamId="u1"))


def test_anomaly_fuzz_windows(bits_searcher):
    """Randomized windows/segment-counts/filters vs an exact recompute:
    merged[j] = sat(Σ pos magnitudes) − sat(Σ neg magnitudes) per
    segment over the 8-doc bits fixture (sign flip for Long.MIN_VALUE,
    Long.MAX saturation per sign partition)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st
    i64 = np.iinfo(np.int64)
    secs = [0, 1, 2, 3, 8, 9, 10, 11]
    vals = [5, -3, 0, 7, i64.min, 2 ** 62, 2 ** 62, 2 ** 62]
    roles = ["user", "assistant"] * 4

    @settings(max_examples=20, deadline=None)
    @given(lo_s=st.integers(0, 11), width_s=st.integers(1, 13),
           n=st.integers(1, 9),
           fset=st.sampled_from([("user",), ("assistant",),
                                 ("user", "assistant")]))
    def check(lo_s, width_s, n, fset):
        lo, hi = lo_s * 1_000_000, (lo_s + width_s) * 1_000_000
        resp = execute_request(bits_searcher, {
            "name": "f", "tenantId": "demo",
            "query": {"timeRange": {"smallestTimestamp": lo,
                                    "largestTimestamp": hi},
                      "divideTimeRangeIntoNSegments": n,
                      "powerBitsFieldName": "bits",
                      "filters": {"f": {
                          "operation": "and",
                          "fieldFilters": [{"fieldName": "role",
                                            "values": list(fset)}]}},
                      "expansionField": "role",
                      "expansionValues": []}})
        got = resp["answer"]["waveforms"]["f"]
        pos = [0] * n
        neg = [0] * n
        for s, v, r in zip(secs, vals, roles):
            ts = s * 1_000_000
            if r not in fset or not (lo <= ts <= hi) or ts >= hi:
                continue
            seg = (ts - lo) * n // (hi - lo)
            mag = i64.max if v == i64.min else abs(v)
            (neg if v < 0 else pos)[seg] += mag
        want = [min(p, int(i64.max)) - min(q, int(i64.max))
                for p, q in zip(pos, neg)]
        assert got == want, (lo, hi, n, fset)

    check()


def test_strut_cache_scoped_by_authz_and_mutation(reco_searcher, xs_table):
    """Review fixes: the strut model memo is keyed by the caller's
    authzExpression (no cross-ACL reuse) and invalidated by
    remove_docs via the searcher's mutation epoch."""
    ts = xs_table["ts"].cast("int64").to_pandas()
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    chi = int(ts.quantile(0.25))
    reco_searcher._strut_models = {}
    execute_request(reco_searcher, _strut_req(lo, hi, chi, 3))
    req2 = _strut_req(lo, hi, chi, 3)
    req2["authzExpression"] = {"values": ["grp1"], "field": "tool"}
    execute_request(reco_searcher, req2)
    assert len(reco_searcher._strut_models) == 2  # distinct ACL scopes
    # a mutation bumps the epoch; the next strut call rebuilds and
    # purges the pre-mutation entries
    epoch0 = getattr(reco_searcher, "mutation_epoch", 0)
    reco_searcher.remove_docs([])  # no-op removal still bumps the epoch
    assert reco_searcher.mutation_epoch == epoch0 + 1
    execute_request(reco_searcher, _strut_req(lo, hi, chi, 3))
    assert len(reco_searcher._strut_models) == 1
    assert all(k[-1] == epoch0 + 1 for k in reco_searcher._strut_models)


def test_anomaly_star_without_field_rejects(bits_searcher):
    """A bare '*' with no expansionField must raise, not silently scan
    an empty prefix and fall back to bare-filter waveforms."""
    with pytest.raises(ValueError, match="expansionField"):
        execute_request(bits_searcher, {
            "name": "a", "tenantId": "demo",
            "query": {"timeRange": {"smallestTimestamp": 0,
                                    "largestTimestamp": 10_000_000},
                      "divideTimeRangeIntoNSegments": 2,
                      "powerBitsFieldName": "bits",
                      "filters": {"f": {
                          "operation": "and",
                          "fieldFilters": [{"fieldName": "role",
                                            "values": ["user"]}]}},
                      "expansionValues": ["*"]}})


def test_waveform_width_overflow_rejects(xs_searcher):
    """A window wide enough that (ts-lo)*n overflows int64 fails loudly
    instead of wrapping into negative bincount segments."""
    with pytest.raises(ValueError, match="overflows"):
        xs_searcher.waveforms(["alpha"], 0, 2 ** 62, 100_000)


def _brute_catwalk_combo(df, lo, hi, top_n, f1, f2):
    """2-field combo model recompute: value = (v1, v2) per doc (empty
    values never indexed → no combo); numerators = window doc counts of
    numerator-set members per combo; denominator = corpus-wide combo
    counts."""
    ts = df["ts"].astype("int64")
    win = df[(ts >= lo) & (ts <= hi)]
    sets = []
    for r in ("user", "assistant"):
        cnt = win[win["role"] == r].groupby("conv_id").size()
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        sets.append({c for c, _n in ranked[:top_n]})
    vis = df[(df[f1] != "") & (df[f2] != "")]
    den = vis.groupby([f1, f2]).size()
    out = {}
    for vt in den.index:
        nums = []
        for s in sets:
            m = win[(win[f1] == vt[0]) & (win[f2] == vt[1])
                    & win["conv_id"].isin(s)]
            nums.append(len(m))
        out[tuple(vt)] = (nums, int(den[vt]))
    return out


def test_catwalk_combo_feature_parity(reco_searcher, xs_table):
    """2-field combo features: model counts are pairwise postings
    intersections — parity vs a pandas recompute, termIds carries one
    value per featureField."""
    df = xs_table.to_pandas().reset_index(drop=True)
    ts = df["ts"].astype("int64")
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    resp = execute_request(reco_searcher, {
        "name": "cw", "tenantId": "demo",
        "query": {"definition": _cw_defn(
                      [{"name": "combo",
                        "featureFields": ["tool", "role"]}], 5),
                  "modelQuery": _cw_model_q(lo, hi, 5)}})
    rows = resp["answer"]["results"][0]
    want = _brute_catwalk_combo(df, lo, hi, 5, "tool", "role")
    got = {tuple(r["termIds"]): (r["numerators"], r["denominator"])
           for r in rows}
    assert all(len(k) == 2 for k in got)
    for vt, (nums, den) in want.items():
        if den or any(nums):
            assert got[vt] == (nums, den), vt


def test_strut_combo_feature_scoring(reco_searcher, xs_table):
    """Strut over a combo feature: observed combos come from the
    gate-bounded docstore gather; scores recompute from the brute
    combo model."""
    import numpy as np
    df = xs_table.to_pandas().reset_index(drop=True)
    ts = df["ts"].astype("int64")
    lo, hi = int(ts.min()), int(ts.quantile(0.5))
    chi = int(ts.quantile(0.25))
    req = _strut_req(lo, hi, chi, 6)
    req["query"]["catwalkDefinition"] = _cw_defn(
        [{"name": "combo", "featureFields": ["tool", "role"],
          "featureScalar": 1.0}], 5)
    reco_searcher._strut_models = {}
    got = execute_request(reco_searcher, req)["answer"]["results"]

    model = _brute_catwalk_combo(df, lo, hi, 5, "tool", "role")
    cand_win = df[(ts >= lo) & (ts <= chi)]
    rows = []
    for conv, sub in cand_win.groupby("conv_id"):
        vis = sub[(sub["tool"] != "")]
        feat = np.zeros(2)
        for vt in set(zip(vis["tool"], vis["role"])):
            nums, den = model.get(vt, ([0, 0], 0))
            if den > 0:
                s = np.minimum(np.array(nums, float) / den, 1.0)
                upd = s * 1.0
                feat = np.maximum(feat, upd)
        # UNIT_WEIGHTED over ONE feature: sum positives / 1
        term = np.where(feat > 0, feat, 0.0)
        scaled = term * np.array([0.5, 0.4])
        pos = scaled[scaled > 0]
        score = float(pos.sum()) if len(pos) else 0.0
        rows.append((score, conv))
    rows.sort(key=lambda r: (-r[0], r[1]))
    want = rows[:6]
    assert [(r["value"], round(r["score"], 9)) for r in got] == \
        [(v, round(s, 9)) for s, v in want]
