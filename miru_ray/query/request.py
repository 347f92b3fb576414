"""MiruRequest-shaped JSON query documents → engine execution.

The reference's public API surface is a JSON document POSTed to a plugin
endpoint: ``MiruRequest{name, tenantId, actorId, authzExpression, query,
logLevel}`` (``miru-plugin/.../solution/MiruRequest.java:14-36``) wrapping
the per-plugin query — for full text ``FullTextQuery{timeRange,
defaultField, useStopWords, query, maxWildcardExpansion,
constraintsFilter, strategy, desiredNumberOfResults,
gatherTermsForFields}`` (``miru-stream-plugins/.../fulltext/
FullTextQuery.java:19-53``).  The response is ``MiruResponse{answer,
solutions, totalElapsed, missingSchema, incompletePartitionIds, log}``
(``MiruResponse.java:12-17``) whose full-text answer is
``FullTextAnswer{results: [ActivityScore{values, timestamp, score}],
found, resultsExhausted}`` (``FullTextAnswer.java:16-18,66-70``).

This module accepts the same document shape as plain dicts (parsed JSON)
and executes it against a :class:`~miru_ray.query.engine.Searcher`, or
routes by ``tenantId`` through a
:class:`~miru_ray.index.tenants.TenantRegistry` — so a reference client's
request payloads port over unchanged.  Documented deviations:

- ``timeRange`` values are epoch MICROSECONDS (the repo's native ts
  encoding), not the reference's snowflake orderIds.
- ``MiruValue`` is single-part here (composite multi-part field values
  need composite field definitions the transcript schema doesn't have);
  plain JSON strings are accepted wherever a MiruValue object would be.
- ``strategy`` accepts the reference enum (``TIME``, ``TF_IDF`` — the
  rank-identical ref-tfidf scorer) plus ``BM25`` as an extension.
- filter operations supported: ``and``, ``or``, ``pButNotQ`` — exactly
  the reference's "currently supported" set
  (``MiruFilterOperation.java:12-22``); the rest raise.
- ``authzExpression`` may carry an optional ``field`` key naming the
  index's ACL list-keyword column (default ``acl``).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any

import pyarrow as pa

from ..tokenize import EN_STOPWORDS
from .filter import (And, Authz, Boost, Filter, MinShould, Node, Not, Or,
                     Term, TimeRange)
from .parser import parse_query

#: the reference's "currently supported" filter operations
#: (MiruFilterOperation.java:12-22)
_SUPPORTED_OPS = ("and", "or", "pButNotQ")


def _value_str(v: Any) -> str:
    """Coerce a JSON field-filter value — a plain string/number or a
    single-part ``MiruValue{parts: [..]}`` object — to the term string."""
    if isinstance(v, dict):
        parts = v.get("parts")
        if not isinstance(parts, (list, tuple)) or not parts:
            raise ValueError(f"MiruValue without parts: {v!r}")
        if len(parts) != 1:
            raise ValueError(
                "composite multi-part MiruValues are not supported "
                f"(transcript fields are single-valued): {v!r}")
        v = parts[0]
    if isinstance(v, bool):
        raise ValueError(f"boolean is not a term value: {v!r}")
    if isinstance(v, (int, float)):
        v = str(int(v))
    if not isinstance(v, str):
        raise ValueError(f"unsupported field-filter value: {v!r}")
    return v


def filter_to_ast(f: dict, text_fields: tuple = ("text",)) -> Node | None:
    """``MiruFilter{operation, fieldFilters, subFilters}`` → filter AST.

    Semantics follow the reference's filter evaluation
    (``MiruAggregateUtil.filter``): each ``MiruFieldFilter`` is an OR
    across its values' postings, ``operation`` combines the field
    filters and sub-filters, and ``pButNotQ`` is the first child minus
    the union of the rest.  Text-field values are lowercased (analyzer
    parity — the index lowercases at tokenize time); keyword fields
    keep case.  Returns None for a filter with no effective children
    (the reference's NO_FILTER), which callers drop.
    ``inclusiveFilter`` is accepted and ignored (unused by the
    reference's supported operations)."""
    op = f.get("operation", "or")
    if op not in _SUPPORTED_OPS:
        raise ValueError(
            f"unsupported filter operation {op!r} (supported: "
            f"{', '.join(_SUPPORTED_OPS)} — MiruFilterOperation.java:12-22)")
    children: list[Node] = []
    for ff in f.get("fieldFilters") or []:
        fld = ff["fieldName"]
        vals = [_value_str(v) for v in (ff.get("values") or [])]
        if fld in text_fields:
            vals = [v.lower() for v in vals]
        terms: list[Node] = [Term(fld, v) for v in vals]
        if not terms:
            continue
        children.append(terms[0] if len(terms) == 1 else Or(tuple(terms)))
    for sub in f.get("subFilters") or []:
        node = filter_to_ast(sub, text_fields)
        if node is not None:
            children.append(node)
    if not children:
        return None
    if len(children) == 1:
        return children[0]
    if op == "and":
        return And(tuple(children))
    if op == "or":
        return Or(tuple(children))
    return Not(children[0], tuple(children[1:]))


def _recap(node: Node, cap: int) -> Node:
    """Apply the request's ``maxWildcardExpansion`` to every expanding
    node (Prefix/Wildcard/Regexp/Fuzzy all carry ``max_expansion`` — the
    reference threads the same knob into its Lucene query parser)."""
    if hasattr(node, "max_expansion"):
        node = dataclasses.replace(node, max_expansion=cap)
    if isinstance(node, (And, Or)):
        return type(node)(tuple(_recap(c, cap) for c in node.children))
    if isinstance(node, MinShould):
        return MinShould(tuple(_recap(c, cap) for c in node.children),
                         node.m)
    if isinstance(node, Not):
        return Not(_recap(node.positive, cap),
                   tuple(_recap(n, cap) for n in node.negatives))
    if isinstance(node, Boost):
        return Boost(_recap(node.child, cap), node.boost)
    if isinstance(node, Filter):
        return Filter(_recap(node.child, cap))
    return node


def request_to_ast(request: dict, cfg) -> tuple[Node, int, str]:
    """Pure mapping: request document → (AST, k, engine strategy name).

    Split out from :func:`execute_request` so the translation is testable
    without an index."""
    q = request.get("query") or {}
    qstr = q.get("query") or ""
    if not qstr.strip():
        # FullTextQuery.java:46 checkNotNull(query) — the reference
        # requires a query string; filter-only requests have no scoring
        # terms and are not a FullText request
        raise ValueError("request.query.query must be a non-empty string")
    default_field = q.get("defaultField") or "text"
    stop = EN_STOPWORDS if (q.get("useStopWords")
                            or cfg.remove_stopwords) else None
    ast = parse_query(qstr, default_field=default_field, stopwords=stop)
    cap = int(q.get("maxWildcardExpansion") or 0)
    if cap > 0:
        ast = _recap(ast, cap)
    clauses: list[Node] = [ast]
    cf = q.get("constraintsFilter")
    if cf:
        node = filter_to_ast(cf, tuple(cfg.text_fields))
        if node is not None:
            # constraintsFilter gates without ranking (the reference ANDs
            # the filter bitmap; only the parsed query's terms score)
            clauses.append(Filter(node))
    tr = q.get("timeRange")
    if tr:
        clauses.append(TimeRange(int(tr["smallestTimestamp"]),
                                 int(tr["largestTimestamp"])))
    az = request.get("authzExpression")
    if az and az.get("values"):
        clauses.append(Authz(tuple(str(v) for v in az["values"]),
                             field=az.get("field", "acl")))
    ast = clauses[0] if len(clauses) == 1 else And(tuple(clauses))
    k_raw = q.get("desiredNumberOfResults")
    k = 10 if k_raw is None else int(k_raw)
    if k < 1:  # FullTextQuery.java:50 checkArgument(> 0)
        raise ValueError("desiredNumberOfResults must be at least 1")
    strategy = str(q.get("strategy") or "TF_IDF").upper()
    engine_strategy = {"TIME": "time", "TF_IDF": "ref-tfidf",
                       "BM25": "bm25"}.get(strategy)
    if engine_strategy is None:
        raise ValueError(f"unknown strategy {strategy!r} "
                         "(TIME, TF_IDF, or the BM25 extension)")
    return ast, k, engine_strategy


def execute_request(target, request: dict) -> dict:
    """Execute a MiruRequest-shaped document and return a
    MiruResponse-shaped dict (JSON-serializable).

    ``target`` is a Searcher (single index) or a TenantRegistry — with a
    registry the request's ``tenantId`` selects the tenant's index, the
    reference's routing step (``MiruService`` resolves tenantId →
    partitions before solving)."""
    t0 = time.perf_counter()
    from ..index.tenants import TenantRegistry
    if isinstance(target, TenantRegistry):
        tenant = request.get("tenantId")
        if tenant in (None, ""):
            raise ValueError("request.tenantId is required with a "
                             "tenant registry target")
        searcher = target.searcher(str(tenant))
    else:
        searcher = target
    q = request.get("query") or {}
    ast, k, strategy = request_to_ast(request, searcher.cfg)
    if strategy == "time":
        res = searcher.topk_time(ast, k)
        ts_us = res["ts"].cast(pa.int64()).to_pylist()
        doc_ids = res["doc_id"].to_pylist()
        # TIME ranks by recency — surface the ordering key as the score
        # (the reference's TIME strategy scores are the timestamps)
        scores = [float(t) for t in ts_us]
    else:
        res = searcher.topk(ast, k, strategy=strategy)
        doc_ids = res["doc_id"].to_pylist()
        scores = [float(s) for s in res["score"].to_pylist()]

    gather_fields = [str(f) for f in (q.get("gatherTermsForFields") or [])]
    rows: dict[int, dict] = {}
    if doc_ids:
        cols = list(dict.fromkeys(gather_fields + ["ts"]))
        gat = searcher.gather(doc_ids, columns=cols)
        ts_col = gat["ts"].cast(pa.int64()).to_pylist()
        ids_col = gat["doc_id"].to_pylist()
        for i, d in enumerate(ids_col):
            rows[int(d)] = {
                "values": {f: gat[f][i].as_py() for f in gather_fields},
                "timestamp": int(ts_col[i]),
            }
    results = []
    for d, s in zip(doc_ids, scores):
        r = rows.get(int(d), {"values": {}, "timestamp": 0})
        results.append({"docId": int(d), "values": r["values"],
                        "timestamp": r["timestamp"], "score": s})
    elapsed_ms = int((time.perf_counter() - t0) * 1000)
    answer = {"results": results, "found": len(results),
              # all partitions were visited (or provably pruned): fewer
              # than desired means the index has no more
              # (FullTextAnswerEvaluator.java:19-40)
              "resultsExhausted": len(results) < k}
    response = {
        "answer": answer,
        "solutions": [{"usedReaders": len(searcher.readers),
                       "totalElapsed": elapsed_ms}],
        "totalElapsed": elapsed_ms,
        "missingSchema": False,
        "incompletePartitionIds": [],
        "log": [],
    }
    if str(request.get("logLevel") or "NONE").upper() != "NONE":
        response["log"] = [
            f"request name={request.get('name')!r} "
            f"tenant={request.get('tenantId')!r}",
            f"ast={ast!r}",
            f"strategy={strategy} k={k}",
            f"found={len(results)} elapsed_ms={elapsed_ms}",
        ]
    return response
