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

Beyond full text, the request surface dispatches two more of the
reference's stream-plugin endpoints by query shape:
``DistinctCountQuery{streamFilter, constraintsFilter, timeRange,
aggregateCountAroundField, desiredNumberOfDistincts}`` →
``DistinctCountAnswer{aggregateTerms, collectedDistincts,
resultsExhausted}`` (``miru-stream-plugins/.../count/
DistinctCountQuery.java:14-41``, ``DistinctCountAnswer.java:10-26``)
and ``AggregateCountsQuery{streamFilter, collectTimeRange, constraints:
{name → AggregateCountsQueryConstraint{constraintsFilter,
aggregateCountAroundField, startFromDistinctN,
desiredNumberOfDistincts, gatherTermsForFields}}}`` — the inbox /
activity-stream aggregate whose per-value rows are
``AggregateCount{distinctValue, count, latestTimestamp,
oldestTimestamp, gatherLatestValues, gatherOldestValues}``
(``filter/AggregateCountsQuery.java:13-45``,
``AggregateCountsQueryConstraint.java:12-34``,
``AggregateCount.java:11-44``), newest stream order, paged; and
``AnalyticsQuery{scoreSets: [{key, timeRange,
divideTimeRangeIntoNSegments}], constraintsFilter, analyticsFilters:
{name → MiruFilter}}`` → ``AnalyticsAnswer{waveforms: {key →
[{id, waveform}]}}`` (``miru-analytics-plugins/.../
AnalyticsQuery.java:14-28``), per-segment match counts served from
postings + ts arrays with no docstore access.

This module accepts the same document shape as plain dicts (parsed JSON)
and executes it against a :class:`~miru_ray.query.engine.Searcher`, or
routes by ``tenantId`` through a
:class:`~miru_ray.index.tenants.TenantRegistry` — so a reference client's
request payloads port over unchanged.  Documented deviations:

- ``timeRange`` values are epoch MICROSECONDS (the repo's native ts
  encoding), not the reference's snowflake orderIds.
- ``MiruValue`` is multi-part on COMPOSITE fields
  (``IndexConfig.composite_fields``; composition semantics in
  ``query/composer.py`` after ``MiruTermComposer.java:35-63``): full
  parts match exactly, a strict prefix of the parts is a
  complete-or-fail part-boundary range scan.  On non-composite fields
  a multi-part value raises; plain JSON strings are accepted wherever
  a MiruValue object would be.
- ``strategy`` accepts the reference enum (``TIME``, ``TF_IDF`` — the
  rank-identical ref-tfidf scorer) plus ``BM25`` as an extension.
- filter operations supported: ``and``, ``or``, ``pButNotQ`` — exactly
  the reference's "currently supported" set
  (``MiruFilterOperation.java:12-22``); the rest raise.
- ``authzExpression`` may carry an optional ``field`` key naming the
  index's ACL list-keyword column (default ``acl``).
- stream answerers: AggregateCounts supports the unread knobs
  (``unreadOnly``, ``includeUnreadState``, ``suppressUnreadFilter``)
  against per-stream unread state registered on the Searcher
  (``mark_read``/``mark_unread``/``set_stream_unread`` — the
  MiruUnreadTrackingIndex analogue; ``AggregateCounts.java:189-207``);
  the other stream answerers still reject them, and
  ``countTimeRange`` must equal ``collectTimeRange``.
"""
from __future__ import annotations

import dataclasses
import datetime
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

from ..tokenize import EN_STOPWORDS
from .filter import (And, Authz, Boost, Filter, Fuzzy, MatchNone, MinShould,
                     Node, Not, Or, Prefix, Regexp, Term, TimeRange, Wildcard)
from .parser import parse_query

#: the reference's "currently supported" filter operations
#: (MiruFilterOperation.java:12-22)
_SUPPORTED_OPS = ("and", "or", "pButNotQ")


def _value_str(v: Any) -> str:
    """Coerce a JSON field-filter value — a plain string/number or a
    single-part ``MiruValue{parts: [..]}`` object — to the term string.
    (Multi-part values are only meaningful on composite fields; those
    route through :func:`_value_parts` instead.)"""
    if isinstance(v, dict):
        parts = v.get("parts")
        if not isinstance(parts, (list, tuple)) or not parts:
            raise ValueError(f"MiruValue without parts: {v!r}")
        if len(parts) != 1:
            raise ValueError(
                "composite multi-part MiruValues need a composite field "
                f"(IndexConfig.composite_fields): {v!r}")
        v = parts[0]
    if isinstance(v, bool):
        raise ValueError(f"boolean is not a term value: {v!r}")
    if isinstance(v, (int, float)):
        if isinstance(v, float) and not v.is_integer():
            # truncating 2.7 to the term '2' would silently match the
            # wrong postings — terms are strings; send one
            raise ValueError(f"non-integral numeric filter value: {v!r}")
        v = str(int(v))
    if not isinstance(v, str):
        raise ValueError(f"unsupported field-filter value: {v!r}")
    return v


def _req_key(d, key: str, ctx: str):
    """Required-document-key accessor.  A missing key in a MiruRequest
    document is a CALLER error and must surface as a messaged
    ValueError — the request surface's one rejection class — never as a
    KeyError/TypeError leaking the answerer's implementation."""
    if not isinstance(d, dict) or key not in d:
        raise ValueError(f"{ctx} requires {key!r}")
    return d[key]


def _values_list(ff: dict) -> list:
    """A fieldFilter's ``values`` as a LIST — a bare JSON string would
    otherwise iterate per CHARACTER, silently matching an Or of
    single-letter terms instead of rejecting with a messaged error."""
    vals = ff.get("values") or []
    if isinstance(vals, (str, bytes)) or not isinstance(vals,
                                                        (list, tuple)):
        raise ValueError(
            f"fieldFilter 'values' must be a list, got "
            f"{type(vals).__name__}: {vals!r}")
    return list(vals)


def _prefix_str(p) -> str:
    """One ``prefixes`` entry → its prefix string, with the same
    messaged-rejection contract as field-filter values (a malformed
    MiruValue must not leak KeyError/IndexError, and a multi-part value
    must not silently truncate to its first part)."""
    if isinstance(p, dict):
        raw = p.get("parts")
        if not isinstance(raw, (list, tuple)) or not raw:
            raise ValueError(f"prefix MiruValue without parts: {p!r}")
        if len(raw) != 1:
            raise ValueError(
                f"multi-part prefix values are not supported: {p!r}")
        return _value_str(raw[0])
    return _value_str(p)


def _value_parts(v) -> list[str]:
    """A JSON field-filter value for a COMPOSITE field → its part list:
    a ``MiruValue{parts: [...]}`` keeps its parts, a plain scalar is one
    part (``MiruValue.java`` — every request DTO value is multi-part in
    the reference)."""
    if isinstance(v, dict):
        raw = v.get("parts")
        if not isinstance(raw, (list, tuple)) or not raw:
            raise ValueError(f"MiruValue without parts: {v!r}")
        return [_value_str(p) for p in raw]
    return [_value_str(v)]


def composite_parts_of(cfg) -> dict[str, int]:
    """Composite field name → its part count, from an IndexConfig."""
    return {name: len(srcs)
            for name, srcs in getattr(cfg, "composite_fields", ()) or ()}


def filter_to_ast(f: dict, text_fields: tuple = ("text",),
                  composite_parts: dict[str, int] | None = None
                  ) -> Node | None:
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
    # Positional children: a dissolved (NO_FILTER) child stays as None so
    # pButNotQ can tell whether its FIRST (positive) operand survived —
    # promoting a negative child into positive position would return
    # exactly the docs the filter should exclude.
    children: list[Node | None] = []
    for ff in f.get("fieldFilters") or []:
        fld = _req_key(ff, "fieldName", "fieldFilter")
        nparts = (composite_parts or {}).get(fld)
        terms: list[Node] = []
        if nparts:
            # composite field: full parts = one exact term; a strict
            # prefix of the parts = a complete-or-fail part-boundary
            # range scan (MiruTermComposer.prefixLowerInclusive:176-206)
            from .composer import compose_part_prefix, compose_parts
            for v in _values_list(ff):
                parts = _value_parts(v)
                if len(parts) > nparts:
                    raise ValueError(
                        f"composite field {fld!r} has {nparts} parts; "
                        f"got {len(parts)}: {v!r}")
                if len(parts) == nparts:
                    terms.append(Term(fld, compose_parts(parts)))
                else:
                    terms.append(Prefix(fld, compose_part_prefix(parts)))
        else:
            vals = [_value_str(v) for v in _values_list(ff)]
            if fld in text_fields:
                vals = [v.lower() for v in vals]
            terms = [Term(fld, v) for v in vals]
        if not terms:
            children.append(None)
            continue
        children.append(terms[0] if len(terms) == 1 else Or(tuple(terms)))
    for sub in f.get("subFilters") or []:
        children.append(filter_to_ast(sub, text_fields, composite_parts))
    alive = [c for c in children if c is not None]
    if op == "pButNotQ" and children and children[0] is None:
        # Reference parity: filterInOut keeps the empty first bitmap and
        # andNotTx of an empty bitmap is empty (MiruAggregateUtil.filter).
        # This holds even when every NEGATIVE child also dissolved —
        # falling through to the generic not-alive -> None (no filter,
        # match-ALL) path would flip match-none into match-everything.
        return MatchNone()
    if not alive:
        return None
    if len(alive) == 1:
        return alive[0]
    if op == "and":
        return And(tuple(alive))
    if op == "or":
        return Or(tuple(alive))
    return Not(children[0], tuple(c for c in children[1:] if c is not None))


def _recap(node: Node, cap: int) -> Node:
    """Apply the request's ``maxWildcardExpansion`` to every expanding
    node (Prefix/Wildcard/Regexp/Fuzzy — the reference threads the same
    knob into its Lucene query parser).  NumericRange also carries a
    ``max_expansion``, but that one is a loud-failure correctness bound
    (a truncated range silently DROPS matching docs) — the wildcard
    budget must not lower it."""
    if isinstance(node, (Prefix, Wildcard, Regexp, Fuzzy)):
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
        node = filter_to_ast(cf, tuple(cfg.text_fields), composite_parts_of(cfg))
        if node is not None:
            # constraintsFilter gates without ranking (the reference ANDs
            # the filter bitmap; only the parsed query's terms score)
            clauses.append(Filter(node))
    tr = q.get("timeRange")
    if tr:
        clauses.append(TimeRange(
            int(_req_key(tr, "smallestTimestamp", "timeRange")),
            int(_req_key(tr, "largestTimestamp", "timeRange"))))
    az = authz_clause(request)
    if az is not None:
        clauses.append(az)
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


def _resolve_searcher(target, request: dict):
    """Searcher (single index) or TenantRegistry routing by ``tenantId``
    (the reference's ``MiruService`` resolves tenantId → partitions
    before solving)."""
    from ..index.tenants import TenantRegistry
    if isinstance(target, TenantRegistry):
        tenant = request.get("tenantId")
        if tenant in (None, ""):
            raise ValueError("request.tenantId is required with a "
                             "tenant registry target")
        return target.searcher(str(tenant))
    return target


def _respond(request: dict, searcher, answer: dict, t0: float,
             log_lines: list[str]) -> dict:
    """Wrap an answer in the MiruResponse envelope
    (``MiruResponse.java:12-17``)."""
    elapsed_ms = int((time.perf_counter() - t0) * 1000)
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
            *log_lines,
            f"elapsed_ms={elapsed_ms}",
        ]
    return response


def _reject_unread_knobs(q: dict) -> None:
    """The answerers that do NOT implement unread decoration reject the
    knobs loudly rather than silently mis-answer (the reference threads
    per-stream unread bitmaps through DistinctCount too,
    ``DistinctCountQuery.java:22,31``).  AggregateCounts — the one the
    inbox workflow needs — handles them (``AggregateCounts.java:
    189-207``); see :func:`_execute_aggregate_counts`."""
    for knob in ("unreadOnly", "suppressUnreadFilter", "includeUnreadState"):
        if q.get(knob):
            raise ValueError(
                f"{knob} is not supported: read/unread tracking is the "
                "events pipeline's job here (events_unread_backfill), "
                "not an index-side bitmap")


def authz_clause(request: dict) -> Authz | None:
    """The request's authzExpression as an AST clause (ONE definition —
    the answerers must all honor the same custom-field default)."""
    az = request.get("authzExpression")
    if not az:
        return None
    if not isinstance(az, dict):
        # a bare list/string would crash on .get (or iterate per char) —
        # the request surface's one rejection class is a messaged error
        raise ValueError(
            f"authzExpression must be an object with 'values', got "
            f"{type(az).__name__}: {az!r}")
    vals = az.get("values")
    if not vals:
        return None
    if isinstance(vals, (str, bytes)) or not isinstance(vals,
                                                        (list, tuple)):
        raise ValueError(
            f"authzExpression 'values' must be a list, got "
            f"{type(vals).__name__}: {vals!r}")
    return Authz(tuple(str(v) for v in vals),
                 field=az.get("field", "acl"))


def exhausted_before(searcher, lo: int) -> bool:
    """``resultsExhausted = smallestTimestamp > timeIndex.largest`` (the
    per-question check every reference plugin repeats, e.g.
    ``MetricsQuestion.java:77``): the window starts past everything
    indexed."""
    zones = searcher._zone_maps()
    return bool(zones) and int(lo) > max(z[1] for z in zones.values())


def _gate_ast(request: dict, q: dict, cfg,
              time_range: dict | None,
              extra_filter: dict | None = None) -> Node:
    """Non-scoring gate AST for the stream answerers: streamFilter ∧
    constraintsFilter ∧ timeRange ∧ authzExpression.  Nothing here
    scores, so no :class:`Filter` wrapper is needed.  Raises when no
    clause survives — the reference's stream queries are per-user
    scoped (``DistinctCountQuery.java:34-36`` requires the filters),
    and an unfiltered gather would walk the whole corpus; an
    unconstrained value enumeration is the facets operator's job."""
    clauses: list[Node] = []
    for f in (q.get("streamFilter"), q.get("constraintsFilter"),
              extra_filter):
        if f:
            node = filter_to_ast(f, tuple(cfg.text_fields), composite_parts_of(cfg))
            if node is not None:
                clauses.append(node)
    if time_range:
        clauses.append(TimeRange(
            int(_req_key(time_range, "smallestTimestamp", "timeRange")),
            int(_req_key(time_range, "largestTimestamp", "timeRange"))))
    az = authz_clause(request)
    if az is not None:
        clauses.append(az)
    if not clauses:
        raise ValueError(
            "stream answerers need an effective streamFilter / "
            "constraintsFilter (unfiltered value enumeration is the "
            "facet operator, not a stream query)")
    return clauses[0] if len(clauses) == 1 else And(tuple(clauses))


def _py_scalar(v):
    """numpy/pandas scalar → plain Python (JSON-serializable).

    Timestamps become epoch **µs** ints (the index's ts unit) — a raw
    ``pd.Timestamp`` would break ``json.dumps`` in the CLI path; NaT/NaN
    become None."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return int(v.value // 1000)
    item = getattr(v, "item", None)
    v = item() if callable(item) else v
    if isinstance(v, datetime.datetime):
        # naive datetimes are UTC here (the index's ts values are
        # tz-less epoch µs) — .timestamp() alone would re-interpret
        # them in the HOST's timezone, shifting the answer by the UTC
        # offset relative to the pd.Timestamp branch above
        if v.tzinfo is None:
            v = v.replace(tzinfo=datetime.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, float) and v != v:  # NaN
        return None
    return v


def _index_visible(values: list) -> list[str]:
    """Drop nulls and empty strings — the term composer never indexes
    empty field values, so a docstore-side gather must apply the same
    visibility rule the postings side gets for free."""
    return sorted(str(v) for v in values if v not in (None, ""))


def _execute_distinct_count(searcher, request: dict, t0: float) -> dict:
    """DistinctCountQuery → DistinctCountAnswer
    (``DistinctCountQuery.java:14-41``, ``DistinctCountAnswer.java:
    10-26``): among docs matching streamFilter ∧ constraintsFilter ∧
    timeRange, the distinct values of ``aggregateCountAroundField``.

    Shape: one filter evaluation (postings algebra) then ONE docstore
    gather bounded by the filtered candidate set — the same walk the
    reference's question does over its filtered bitmap reading the
    activity index.  The stream filters are per-user selective by
    construction; this is NOT a full-corpus distinct (that's the facet
    operator, postings-only)."""
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    field = str(_req_key(q, "aggregateCountAroundField",
                         "distinctCount"))
    desired = int(q.get("desiredNumberOfDistincts") or 0)
    if desired < 1:  # DistinctCountQuery.java:39-40 checkArgument
        raise ValueError("desiredNumberOfDistincts must be at least 1")
    ast = _gate_ast(request, q, searcher.cfg, q.get("timeRange"))
    ids = searcher.match_docs(ast)
    values: list[str] = []
    if len(ids):
        col = searcher.gather(ids, columns=[field])[field]
        values = _index_visible(col.unique().to_pylist())
    answer = {"aggregateTerms": values[:desired],
              "collectedDistincts": len(values),
              # every partition was visited and the engine is exact, so
              # "exhausted" means the page covers every distinct
              # (DistinctCountAnswerEvaluator keeps solving while
              # collected < desired)
              "resultsExhausted": len(values) <= desired}
    return _respond(request, searcher, answer, t0,
                    [f"distinctCount field={field!r} ast={ast!r}",
                     f"collected={len(values)}"])


def _execute_aggregate_counts(searcher, request: dict, t0: float) -> dict:
    """AggregateCountsQuery → AggregateCountsAnswer
    (``AggregateCountsQuery.java:13-45``, constraint shape
    ``AggregateCountsQueryConstraint.java:12-34``, per-value row
    ``AggregateCount.java:11-44``): the activity-stream / inbox
    aggregate — matching docs grouped by ``aggregateCountAroundField``,
    newest stream order (latest timestamp desc), paged by
    ``startFromDistinctN`` / ``desiredNumberOfDistincts``.

    Per constraint: one filter evaluation + ONE gather of
    (value, ts, gather fields) over the filtered candidates — the
    reference's answerer walks the same filtered bitmap newest-first
    reading the same columns.  ``countTimeRange`` must equal
    ``collectTimeRange`` (single-pass collection; a separate count
    window is a documented deviation).

    Unread decoration (``AggregateCounts.java:189-207,322-330``): with
    a ``streamId``, ``includeUnreadState`` adds per-row ``anyUnread`` /
    ``latestUnread`` / ``oldestUnread`` against the stream's unread
    state (``Searcher.mark_read``/``mark_unread``/``set_stream_unread``
    — the MiruUnreadTrackingIndex analogue), ``unreadOnly`` restricts
    the whole aggregate to unread docs
    (``AggregateCountsCustomQuestion.java:100-126`` ANDs the unread
    bitmap into the answer), and ``suppressUnreadFilter`` marks docs
    matching it as read for this request (the backfill suppression,
    ``MiruJustInTimeBackfillerizer`` filter arg)."""
    q = request.get("query") or {}
    stream_id = q.get("streamId")
    include_unread = bool(q.get("includeUnreadState"))
    unread_only = bool(q.get("unreadOnly"))
    if (include_unread or unread_only) and not stream_id:
        raise ValueError("includeUnreadState/unreadOnly need a streamId "
                         "(the reference requires a non-NULL MiruStreamId"
                         " — AggregateCounts.java:170)")
    if q.get("suppressUnreadFilter") and not (include_unread
                                              or unread_only):
        # reject rather than silently drop the knob (the suppression
        # only participates in unread decoration; every other answerer
        # rejects unread knobs it cannot honor — keep the surface
        # uniform)
        raise ValueError("suppressUnreadFilter requires "
                         "includeUnreadState or unreadOnly (it only "
                         "affects unread decoration)")
    suppress_ids = None
    if stream_id and (include_unread or unread_only):
        sup = q.get("suppressUnreadFilter")
        if sup:
            sup_ast = filter_to_ast(sup, tuple(searcher.cfg.text_fields),
                                    composite_parts_of(searcher.cfg))
            if sup_ast is not None:
                suppress_ids = np.asarray(searcher.match_docs(sup_ast),
                                          np.int64)
    constraints = q.get("constraints")
    if not isinstance(constraints, dict) or not constraints:
        raise ValueError("aggregateCounts requires a non-empty "
                         "constraints map (name → constraint)")
    collect_tr = q.get("collectTimeRange")
    count_tr = q.get("countTimeRange")
    if count_tr and count_tr != collect_tr:
        raise ValueError("countTimeRange differing from collectTimeRange "
                         "is not supported (counts are collected in the "
                         "same pass)")
    answer_constraints: dict[str, dict] = {}
    exhausted = True
    log: list[str] = []
    for cname, c in constraints.items():
        field = str(_req_key(c, "aggregateCountAroundField",
                             "aggregateCounts constraint"))
        start = int(c.get("startFromDistinctN") or 0)
        if start < 0:  # AggregateCountsQueryConstraint.java:29
            raise ValueError("startFromDistinctN must be at least 0")
        desired = int(c.get("desiredNumberOfDistincts") or 0)
        if desired < 1:  # AggregateCountsQueryConstraint.java:31
            raise ValueError("desiredNumberOfDistincts must be at least 1")
        gfields = [str(f) for f in (c.get("gatherTermsForFields") or [])]
        ast = _gate_ast(request, q, searcher.cfg, collect_tr,
                        extra_filter=c.get("constraintsFilter"))
        ids = searcher.match_docs(ast)
        results: list[dict] = []
        total = 0
        if len(ids):
            cols = list(dict.fromkeys([field, "ts"] + gfields))
            gat = searcher.gather(ids, columns=cols)
            pdf = gat.to_pandas()
            # µs via Arrow, not datetime64.astype (whose unit is a
            # pandas-version coin flip)
            pdf["_ts"] = gat["ts"].cast(pa.int64()).to_numpy()
            if stream_id and (include_unread or unread_only):
                flags = searcher.stream_unread_flags(
                    stream_id, pdf["doc_id"].to_numpy(np.int64),
                    pdf["_ts"].to_numpy())
                if suppress_ids is not None and len(suppress_ids):
                    from ..util import sorted_lookup
                    hit, _ = sorted_lookup(
                        suppress_ids, pdf["doc_id"].to_numpy(np.int64))
                    flags = flags & ~hit
                pdf["_unread"] = flags
                if unread_only:
                    # AggregateCountsCustomQuestion.java:112-126 — the
                    # unread bitmap is ANDed into answer AND counter, so
                    # counts reflect unread docs only
                    pdf = pdf[pdf["_unread"]]
            pdf = pdf[~pdf[field].isin(["", None]) & pdf[field].notna()]
            if len(pdf):
                pdf = pdf.sort_values(["_ts", "doc_id"], kind="stable")
                grp = pdf.groupby(field, sort=True)
                counts = grp.size()
                # whole ROWS, not GroupBy.last()/first() — those skip
                # nulls PER COLUMN, so a null gather field on the truly
                # newest doc would silently report an older doc's value
                # against the newest timestamp
                # drop=False keeps the group column addressable so a
                # gatherTermsForFields that includes the around-field
                # itself still resolves via .at[v, field]
                last = pdf.drop_duplicates(field, keep="last") \
                          .set_index(field, drop=False).sort_index()
                first = pdf.drop_duplicates(field, keep="first") \
                           .set_index(field, drop=False).sort_index()
                page = pd.DataFrame({
                    "n": counts, "latest": last["_ts"],
                    "oldest": first["_ts"]}).sort_values(
                        # newest stream order; value breaks ts ties so
                        # paging is deterministic
                        ["latest", field], ascending=[False, True],
                        kind="stable")
                anyu = grp["_unread"].any() if include_unread else None
                total = len(page)
                window = page.iloc[start:start + desired]
                for v, row in window.iterrows():
                    r = {
                        "distinctValue": str(v),
                        "count": int(row["n"]),
                        "latestTimestamp": int(row["latest"]),
                        "oldestTimestamp": int(row["oldest"]),
                        "gatherLatestValues": {
                            f: _py_scalar(last.at[v, f]) for f in gfields},
                        "gatherOldestValues": {
                            f: _py_scalar(first.at[v, f]) for f in gfields},
                    }
                    if include_unread:
                        # AggregateCounts.java:322-330: flags against
                        # unreadAnswer = unread ∩ answer; latest/oldest
                        # are this value's newest/oldest doc in answer
                        r["anyUnread"] = bool(anyu[v])
                        r["latestUnread"] = bool(last.at[v, "_unread"])
                        r["oldestUnread"] = bool(first.at[v, "_unread"])
                    results.append(r)
        answer_constraints[cname] = {
            "results": results,
            "aggregateTerms": [r["distinctValue"] for r in results],
            "skippedDistincts": min(start, total),
            "collectedDistincts": total,
        }
        if start + desired < total:
            exhausted = False
        log.append(f"constraint {cname!r} field={field!r} "
                   f"total={total} page=[{start}:{start + desired}]")
    answer = {"constraints": answer_constraints,
              "resultsExhausted": exhausted}
    return _respond(request, searcher, answer, t0, log)


def _execute_analytics(searcher, request: dict, t0: float) -> dict:
    """AnalyticsQuery → AnalyticsAnswer
    (``miru-analytics-plugins/.../AnalyticsQuery.java:14-28``, score set
    ``AnalyticsQueryScoreSet.java:12-30``, answer
    ``AnalyticsAnswer.java:13-27``): for each score set — an EXPLICIT
    time range split into N equal segments — and each named analytics
    filter, the per-segment count of docs matching constraintsFilter ∧
    that filter.  Served entirely from postings algebra + the readers'
    ts arrays (one int64[n] partial per reader per filter — no docstore
    gather at any point), with partitions outside the window zone-pruned
    before any postings load.  Segments are half-open ``[lo, hi)`` with
    ``segment = (ts - lo) * n // (hi - lo)`` — exact integer bucketing
    (the reference walks per-segment id ranges of its time index; the
    arithmetic form is equivalent and SQL-expressible)."""
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    score_sets = q.get("scoreSets")
    if not isinstance(score_sets, (list, tuple)) or not score_sets:
        raise ValueError("analytics requires a non-empty scoreSets list")
    afilters = q.get("analyticsFilters")
    if not isinstance(afilters, dict) or not afilters:
        raise ValueError("analytics requires a non-empty analyticsFilters "
                         "map (name → MiruFilter)")
    waveforms: dict[str, list[dict]] = {}
    log: list[str] = []
    for ss in score_sets:
        key = str(_req_key(ss, "key", "scoreSet"))
        tr = ss.get("timeRange")
        if not tr:  # AnalyticsQueryScoreSet.java:25 rejects ALL_TIME
            raise ValueError("score set requires an explicit timeRange")
        lo = int(_req_key(tr, "smallestTimestamp", "scoreSet timeRange"))
        hi = int(_req_key(tr, "largestTimestamp", "scoreSet timeRange"))
        n = int(ss.get("divideTimeRangeIntoNSegments") or 0)
        names = list(afilters)
        asts = [_gate_ast(request,
                          {"constraintsFilter": q.get("constraintsFilter")},
                          searcher.cfg, None, extra_filter=afilters[name])
                for name in names]
        waves = searcher.waveforms(asts, lo, hi, n)  # ONE fan-out for all
        waveforms[key] = [{"id": str(name),
                           "waveform": [int(x) for x in wave]}
                          for name, wave in zip(names, waves)]
        log.append(f"scoreSet {key!r} [{lo},{hi})/{n} × "
                   f"{len(afilters)} filters")
    answer = {"waveforms": waveforms, "resultsExhausted": True}
    return _respond(request, searcher, answer, t0, log)


_TRENDING_STRATEGIES = ("LINEAR_REGRESSION", "LEADER", "PEAKS",
                        "HIGHEST_PEAK")


def _gather_distinct_terms(searcher, dq: dict) -> set[str]:
    """One DistinctsQuery (``DistinctsQuery.java:16-38``): the distinct
    values of ``gatherDistinctsForField``, optionally restricted by
    ``prefixes`` and/or a ``constraintsFilter``.

    Two paths, mirroring ``Distincts.gatherDirect``: with a constraints
    filter, one filter evaluation + a docstore gather bounded by the
    filtered candidate set (the reference walks its filtered bitmap
    against the activity index); without one, a term-dictionary
    enumeration by prefix — postings-only, no doc sweep.  The explicit
    ``timeRange`` requirement is the reference's (constructor
    Preconditions); it gates the filtered path and is recorded-but-inert
    on the dictionary path (a term dict has no time axis)."""
    field = str(_req_key(dq, "gatherDistinctsForField",
                         "distinctsQuery"))
    if not dq.get("timeRange"):  # DistinctsQuery.java:32 rejects ALL_TIME
        raise ValueError("distinctQueries entries require an explicit "
                         "timeRange")
    raw_prefixes = dq.get("prefixes") or []
    if isinstance(raw_prefixes, (str, bytes)) \
            or not isinstance(raw_prefixes, (list, tuple)):
        raise ValueError(
            f"'prefixes' must be a list, got "
            f"{type(raw_prefixes).__name__}: {raw_prefixes!r}")
    prefixes = [_prefix_str(p) for p in raw_prefixes]
    cf = dq.get("constraintsFilter")
    if cf:
        ast = _gate_ast({}, {"constraintsFilter": cf}, searcher.cfg,
                        dq.get("timeRange"))
        ids = searcher.match_docs(ast)
        vals: set[str] = set()
        if len(ids):
            col = searcher.gather(ids, columns=[field])[field]
            vals = set(_index_visible(col.unique().to_pylist()))
        if prefixes:
            vals = {v for v in vals
                    if any(v.startswith(p) for p in prefixes)}
        return vals
    cap = 1000  # same loud-failure bound as the facet operator
    found: set[str] = set()
    for pre in (prefixes or [""]):
        for res in searcher._fanout("expand_prefix", f"{field}:{pre}",
                                    cap + 1):
            found.update(res)
    if len(found) > cap:
        raise ValueError(f"distinct gather over {field!r} exceeds {cap} "
                         "values; constrain with prefixes or a filter")
    return {k.split(":", 1)[1] for k in found}


def _trend_slope_num_den(wave) -> tuple[int, int]:
    """Exact-integer simple-regression slope of ``y = wave`` over
    ``x = 0..n-1`` as a (numerator, denominator) pair:
    ``slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`` — algebraically equal
    to ``SimpleRegression.slope()`` (``TrendingInjectable.java:165-168``
    feeds (i, count_i)); integer accumulation + ONE float division makes
    the engine bit-equal to the SQL oracle's same expression."""
    n = len(wave)
    sx = n * (n - 1) // 2
    sxx = (n - 1) * n * (2 * n - 1) // 6
    sy = int(sum(int(y) for y in wave))
    sxy = int(sum(i * int(y) for i, y in enumerate(wave)))
    return n * sxy - sx * sy, n * sxx - sx * sx


def _execute_trending(searcher, request: dict, t0: float) -> dict:
    """TrendingQuery → TrendingAnswer (``TrendingQuery.java:14-47``,
    ``TrendingQueryScoreSet.java:14-41``, scoring
    ``TrendingInjectable.java:117-215``, answer
    ``TrendingAnswer.java:16-27`` / ``Trendy.java:11-28``):

    1. gather distinct terms of ``aggregateCountAroundField`` from the
       ``distinctQueries`` grid (inner lists OR, outer list AND —
       ``TrendingQuery.java:24``);
    2. per score set, ONE batched waveform fan-out — each term becomes
       the analytics filter ``field=term ∧ constraintsFilter``
       (``TrendingQuestion.java:138-199`` drives Analytics.analyze over
       the terms' postings exactly this way);
    3. rank per strategy into top-``desiredNumberOfDistincts`` heaps:
       LINEAR_REGRESSION = regression slope over (segment, count),
       LEADER = Σcount, HIGHEST_PEAK = max count, PEAKS = PeakDet count
       at threshold ``highest/6 + bucket95/100``
       (``TrendingInjectable.java:125-190``).  bucket95 is the 95th
       percentile (linear interpolation, R-7 — a fixed, SQL-expressible
       choice where commons-math's LEGACY estimator is R-6; documented
       divergence) of the per-term highest buckets among terms with any
       count in this score set.

    Determinism the reference leaves to heap order: ties rank by
    (rank DESC, distinctValue ASC); terms consumed by an earlier score
    set's retain set are skipped by later ones (``consumed``,
    ``TrendingInjectable.java:149-151,207``); zero-count terms never
    rank (``hasCounts``, ``TrendingInjectable.java:156-164``)."""
    import numpy as np

    from ..ops.analytics import _peakdet
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    field = str(q["aggregateCountAroundField"])
    score_sets = q.get("scoreSets")
    if not isinstance(score_sets, (list, tuple)) or not score_sets:
        raise ValueError("trending requires a non-empty scoreSets list")
    and_terms: set[str] | None = None
    for inner in (q.get("distinctQueries") or []):
        or_terms: set[str] = set()
        for dq in inner:
            or_terms |= _gather_distinct_terms(searcher, dq)
        and_terms = or_terms if and_terms is None \
            else (and_terms & or_terms)
    # empty distinctQueries grid → no terms → empty waveforms
    # (TrendingQuestion.java:122-126: andTerms null → zero termIds)
    terms = sorted(and_terms or set())
    waveforms_out: dict[str, list[dict]] = {}
    score_out: dict[str, dict] = {}
    consumed: set[str] = set()
    log: list[str] = []
    for ss in score_sets:
        key = str(_req_key(ss, "key", "scoreSet"))
        strategies = [str(s) for s in (ss.get("strategies") or ())]
        if not strategies:  # TrendingQueryScoreSet.java:31
            raise ValueError("Must specify at least one strategy")
        for s in strategies:
            if s not in _TRENDING_STRATEGIES:
                raise ValueError(f"unknown trending strategy {s!r}")
        tr = ss.get("timeRange")
        if not tr:  # TrendingQueryScoreSet.java:34 rejects ALL_TIME
            raise ValueError("score set requires an explicit timeRange")
        lo = int(_req_key(tr, "smallestTimestamp", "scoreSet timeRange"))
        hi = int(_req_key(tr, "largestTimestamp", "scoreSet timeRange"))
        n = int(ss.get("divideTimeRangeIntoNSegments") or 0)
        desired = int(ss.get("desiredNumberOfDistincts") or 0)
        if desired < 1:  # TrendingQueryScoreSet.java:39
            raise ValueError("Number of distincts must be at least 1")
        asts = [_gate_ast(request,
                          {"constraintsFilter": q.get("constraintsFilter")},
                          searcher.cfg, None,
                          extra_filter={"operation": "and",
                                        "fieldFilters": [
                                            {"fieldName": field,
                                             "values": [v]}]})
                for v in terms]
        waves = (searcher.waveforms(asts, lo, hi, n) if terms
                 else np.zeros((0, n), np.int64))
        has = [bool(waves[i].any()) for i in range(len(terms))]
        bucket95 = 0.0
        if "PEAKS" in strategies and any(has):
            highest = [float(waves[i].max())
                       for i in range(len(terms)) if has[i]]
            bucket95 = float(np.percentile(np.array(highest), 95))
        ranked: dict[str, list[tuple[float, str]]] = \
            {s: [] for s in strategies}
        for i, v in enumerate(terms):
            if v in consumed or not has[i]:
                continue
            w = waves[i]
            if "LINEAR_REGRESSION" in ranked:
                num, den = _trend_slope_num_den(w)
                ranked["LINEAR_REGRESSION"].append(
                    (num / den if den else 0.0, v))
            if "LEADER" in ranked:
                ranked["LEADER"].append((float(w.sum()), v))
            if "PEAKS" in ranked:
                thresh = float(w.max()) / 6 + bucket95 / 100
                ranked["PEAKS"].append(
                    (float(_peakdet(w.astype(np.float64), thresh)), v))
            if "HIGHEST_PEAK" in ranked:
                ranked["HIGHEST_PEAK"].append((float(w.max()), v))
        retain: set[str] = set()
        results: dict[str, list[dict]] = {}
        for s, rows in ranked.items():
            rows.sort(key=lambda r: (-r[0], r[1]))
            top = rows[:desired]
            results[s] = [{"distinctValue": v, "rank": r} for r, v in top]
            retain.update(v for _r, v in top)
        idx = {v: i for i, v in enumerate(terms)}
        waveforms_out[key] = [
            {"id": v, "waveform": [int(x) for x in waves[idx[v]]]}
            for v in terms if v in retain]
        score_out[key] = {"results": results}
        consumed |= retain
        log.append(f"scoreSet {key!r} [{lo},{hi})/{n} × {len(terms)} "
                   f"terms → retain {len(retain)}")
    answer = {"waveforms": waveforms_out, "scoreSets": score_out,
              "resultsExhausted": True}
    return _respond(request, searcher, answer, t0, log)


def _expand_field_keys(searcher, field: str, cap: int = 10_000) -> list[str]:
    """All ``field:value`` posting keys of a keyword field, enumerated
    from the term dictionaries (loud failure past ``cap`` — reco/trending
    aggregate fields are enum-cardinality by contract)."""
    found: set[str] = set()
    for res in searcher._fanout("expand_prefix", f"{field}:", cap + 1):
        found.update(res)
    if len(found) > cap:
        raise ValueError(f"field {field!r} exceeds {cap} distinct indexed "
                         "values; reco aggregate fields must be "
                         "enum-cardinality")
    if not found:
        raise ValueError(f"field {field!r} has no indexed values (is it a "
                         "keyword field of this index?)")
    return sorted(found)


def _execute_distincts(searcher, request: dict, t0: float) -> dict:
    """DistinctsQuery → DistinctsAnswer (``DistinctsQuery.java:16-38``,
    ``DistinctsAnswer.java:13-36``): the distinct values of
    ``gatherDistinctsForField`` under prefixes / constraintsFilter /
    timeRange, sorted — the standalone distincts plugin endpoint (the
    same gather trending composes via its distinctQueries grid)."""
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    vals = sorted(_gather_distinct_terms(searcher, q))
    answer = {"results": vals, "collectedDistincts": len(vals),
              "resultsExhausted": True}
    return _respond(request, searcher, answer, t0,
                    [f"distincts {len(vals)} values"])


def _execute_uniques(searcher, request: dict, t0: float) -> dict:
    """UniquesQuery → UniquesAnswer (``UniquesQuery.java:17-41``,
    ``UniquesAnswer.java:12-33``): the COUNT of distinct values of
    ``gatherUniquesForField`` under prefixes / ``constraints`` filter /
    timeRange (the uniques plugin answers cardinality-only — its
    answerer ORs per-term bitmaps and takes the cardinality; counting
    the gathered value set is the same number)."""
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    vals = _gather_distinct_terms(
        searcher, {"gatherDistinctsForField": q["gatherUniquesForField"],
                   "timeRange": q.get("timeRange"),
                   # @JsonProperty("constraints") — UniquesQuery.java:28
                   "constraintsFilter": q.get("constraints"),
                   "prefixes": q.get("prefixes")})
    answer = {"uniques": len(vals), "resultsExhausted": True}
    return _respond(request, searcher, answer, t0,
                    [f"uniques {len(vals)}"])


def _execute_reco(searcher, request: dict, t0: float) -> dict:
    """RecoQuery → RecoAnswer (``RecoQuery.java:12-41``,
    ``CollaborativeFiltering.java:56-240``, ``RecoAnswer.java:13-70``):
    *"I have viewed these things; among others who have also viewed
    these things, what have they viewed that I have not?"*

    1. ``myOk = constraintsFilter ∧ ok`` where ``ok = scorableFilter ∧
       timeRange ∧ authz ∧ alive`` (``RecoQuestion.java:85-124``);
    2. ``distinctParents`` = field-1 values in myOk (hop 1);
    3. ``otherOk = (⋁ field1=parent) ∧ ok ∧ ¬myOk``; contributors =
       top-K field-2 values by otherOk doc count (hop 2, the
       ``MinMaxPriorityQueue`` bound, ``CollaborativeFiltering.java:
       131-151``);
    4. each contributor's full ok activity gathered for distinct
       field-3 values, minus ``distinctParents`` and the
       ``removeDistinctsQuery`` gather; each surviving value scores
       the contributor's count (hop 3, ``.java:178-207``);
       ``field2 == field3`` short-circuits to the contributors
       themselves (``.java:153-156``).

    Exactness divergence (documented): the reference solves per
    partition and merges per-partition heaps
    (``RecoAnswerMerger.java``), which can drop cross-partition mass at
    heap boundaries; here every hop merges globally across readers
    BEFORE the top-K cut, so counts are exact over the whole index.
    Ties rank (count DESC, value ASC) where the reference's heap order
    is unspecified."""
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    tr = q.get("timeRange")
    if not tr:  # RecoQuery.java:32 rejects ALL_TIME
        raise ValueError("reco requires an explicit timeRange")
    f1 = str(_req_key(q, "aggregateFieldName1", "reco"))
    f2 = str(_req_key(q, "aggregateFieldName2", "reco"))
    f3 = str(_req_key(q, "aggregateFieldName3", "reco"))
    desired = int(q.get("desiredNumberOfDistincts") or 0)
    if desired < 1:  # RecoQuery.java:39
        raise ValueError("Number of distincts must be at least 1")
    cf = q.get("constraintsFilter")
    my_ast = filter_to_ast(cf, tuple(searcher.cfg.text_fields), composite_parts_of(searcher.cfg)) \
        if cf else None
    if my_ast is None:  # RecoQuery.java:35 checkNotNull
        raise ValueError("reco requires an effective constraintsFilter "
                         "(the 'my activity' scope)")
    ok_clauses: list[Node] = []
    sf = q.get("scorableFilter")
    if sf:
        node = filter_to_ast(sf, tuple(searcher.cfg.text_fields), composite_parts_of(searcher.cfg))
        if node is not None:
            ok_clauses.append(node)
    ok_clauses.append(TimeRange(
        int(_req_key(tr, "smallestTimestamp", "reco timeRange")),
        int(_req_key(tr, "largestTimestamp", "reco timeRange"))))
    az = authz_clause(request)
    if az is not None:
        ok_clauses.append(az)
    ok_ast = ok_clauses[0] if len(ok_clauses) == 1 \
        else And(tuple(ok_clauses))
    myok_ast = And((my_ast, ok_ast))
    log: list[str] = []

    def _merged_counts(ast, keys: list[str]) -> dict[str, int]:
        # expansion nodes (composite parts-prefix values, wildcards)
        # must be resolved BEFORE the fan-out — readers look expansions
        # up by key and an empty dict silently evaluates the clause to
        # match-nothing
        exp, _tc, _st = searcher._prepare(ast, need_stats=False)
        tot: dict[str, int] = {k: 0 for k in keys}
        for part in searcher._fanout("term_match_counts", ast, keys, exp):
            for k, c in part.items():
                tot[k] += c
        return tot

    n_zones = len(searcher._zone_maps())
    exhausted = exhausted_before(
        searcher, int(_req_key(tr, "smallestTimestamp", "reco timeRange")))

    def _answer(rows: list[tuple[str, float]]) -> dict:
        results = [{"distinctValue": v, "rank": float(r)}
                   for v, r in rows]
        answer = {"results": results, "partitionsVisited": n_zones,
                  "resultsExhausted": exhausted}
        return _respond(request, searcher, answer, t0, log)

    # resolve every aggregate field upfront (schema.getFieldId throws
    # before any bitmap work in the reference, RecoQuestion.java:78-80)
    keys1 = _expand_field_keys(searcher, f1)
    keys2 = keys1 if f2 == f1 else _expand_field_keys(searcher, f2)
    keys3 = keys2 if f3 == f2 else (
        keys1 if f3 == f1 else _expand_field_keys(searcher, f3))
    # hop 1: my distinct parents <field1>
    parents = {k for k, c in _merged_counts(myok_ast, keys1).items()
               if c > 0}
    log.append(f"hop1 {len(parents)}/{len(keys1)} parents")
    if not parents:
        return _answer([])
    # hop 2: contributors <field2> ranked by otherOk counts
    or1 = Or(tuple(Term(f1, k.split(":", 1)[1]) for k in sorted(parents)))
    otherok_ast = Not(And((or1, ok_ast)), (myok_ast,))
    counts2 = _merged_counts(otherok_ast, keys2)
    ranked2 = sorted(((c, k) for k, c in counts2.items() if c > 0),
                     key=lambda t: (-t[0], t[1]))[:desired]
    log.append(f"hop2 {len(ranked2)} contributors")
    if f2 == f3:  # CollaborativeFiltering.java:153-156 special case
        return _answer([(k.split(":", 1)[1], float(c))
                        for c, k in ranked2])
    # exclusions: my parents (+ the removeDistinctsQuery gather).  The
    # reference removes distinctParents from the field-3 sets by RAW
    # TermId regardless of field (MiruTermId carries no field prefix,
    # CollaborativeFiltering.java:158-166,201) — so parent VALUES are
    # excluded even when field1 != field3
    excl = {k.split(":", 1)[1] for k in parents}
    rdq = q.get("removeDistinctsQuery")
    if rdq:
        excl |= _gather_distinct_terms(searcher, rdq)
    # hop 3: contributors' distinct parents <field3>, scored by count
    contrib_keys = [k for _c, k in ranked2]
    rows: dict[str, set] = {k: set() for k in contrib_keys}
    exp_ok, _tc, _st = searcher._prepare(ok_ast, need_stats=False)
    for part in searcher._fanout("term_pair_rows", ok_ast, contrib_keys,
                                 keys3, exp_ok):
        for k, vs in part.items():
            rows[k] |= vs
    scored: dict[str, int] = {}
    for c, k in ranked2:
        for v3 in rows[k]:
            val = v3.split(":", 1)[1]
            if val not in excl:
                scored[val] = scored.get(val, 0) + c
    top = sorted(((c, v) for v, c in scored.items()),
                 key=lambda t: (-t[0], t[1]))[:desired]
    log.append(f"hop3 {len(scored)} scored parents")
    return _answer([(v, float(c)) for c, v in top])


def execute_request(target, request: dict) -> dict:
    """Execute a MiruRequest-shaped document and return a
    MiruResponse-shaped dict (JSON-serializable).

    ``target`` is a Searcher (single index) or a TenantRegistry — with a
    registry the request's ``tenantId`` selects the tenant's index, the
    reference's routing step (``MiruService`` resolves tenantId →
    partitions before solving).

    The wrapped query dispatches on shape, mirroring the reference's
    per-plugin endpoints (which disambiguate by URL — the shapes are
    distinct except metrics/anomaly, split on the expansion knobs):
    ``catwalkDefinition`` → Strut; ``definition`` + ``modelQuery`` →
    Catwalk; ``stumptownFilters`` → Stumptown; ``powerBitsFieldName`` →
    Anomaly when ``expansionField``/``expansionValues`` present else
    Metrics; ``aggregateFieldName1`` → Reco; ``gatherUniquesForField``
    → Uniques; ``gatherDistinctsForField`` → Distincts; ``scoreSets``
    + ``aggregateCountAroundField`` → Trending; bare
    ``aggregateCountAroundField`` → DistinctCount; a ``constraints``
    map → AggregateCounts; bare ``scoreSets`` → Analytics; anything
    else is a FullTextQuery (which requires ``query.query``)."""
    t0 = time.perf_counter()
    searcher = _resolve_searcher(target, request)
    q = request.get("query") or {}
    if "catwalkDefinition" in q:
        from .strutcat import execute_strut
        return execute_strut(searcher, request, t0)
    if "definition" in q and "modelQuery" in q:
        from .strutcat import execute_catwalk
        return execute_catwalk(searcher, request, t0)
    if "stumptownFilters" in q:
        from .waves import execute_stumptown
        return execute_stumptown(searcher, request, t0)
    if "powerBitsFieldName" in q:
        from .waves import execute_anomaly, execute_metrics
        if q.get("expansionField") or q.get("expansionValues"):
            return execute_anomaly(searcher, request, t0)
        return execute_metrics(searcher, request, t0)
    if "aggregateFieldName1" in q:
        return _execute_reco(searcher, request, t0)
    if "gatherUniquesForField" in q:
        return _execute_uniques(searcher, request, t0)
    if "gatherDistinctsForField" in q:
        return _execute_distincts(searcher, request, t0)
    if "scoreSets" in q and "aggregateCountAroundField" in q:
        return _execute_trending(searcher, request, t0)
    if "aggregateCountAroundField" in q:
        return _execute_distinct_count(searcher, request, t0)
    if "constraints" in q:
        return _execute_aggregate_counts(searcher, request, t0)
    if "scoreSets" in q or "analyticsFilters" in q:
        return _execute_analytics(searcher, request, t0)
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
    answer = {"results": results, "found": len(results),
              # all partitions were visited (or provably pruned): fewer
              # than desired means the index has no more
              # (FullTextAnswerEvaluator.java:19-40)
              "resultsExhausted": len(results) < k}
    return _respond(request, searcher, answer, t0,
                    [f"ast={ast!r}", f"strategy={strategy} k={k}",
                     f"found={len(results)}"])
