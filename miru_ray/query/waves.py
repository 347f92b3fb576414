"""Stumptown / Metrics / Anomaly request answerers — the reference's
three waveform-family plugin endpoints that were still undispatched.

Reference shapes:

- ``StumptownQuery{timeRange, divideTimeRangeIntoNSegments,
  desiredNumberOfResultsPerWaveform, constraintsFilter,
  stumptownFilters: {name → MiruFilter}}`` →
  ``StumptownAnswer{waveforms: {name → Waveform{waveform: long[],
  results: [activity]}}, resultsExhausted}``
  (``miru-stumptown-plugins/.../StumptownQuery.java:15-37``,
  ``StumptownAnswer.java:16-70``, answerer ``Stumptown.java:38-72``:
  per-segment cardinalities + the newest ``desiredNumberOfResults``
  matching docs, returned chronologically DESCENDING).

- ``MetricsQuery{timeRange, divideTimeRangeIntoNSegments,
  powerBitsFieldName, constraintsFilter, filters: {name → MiruFilter}}``
  → ``MetricsAnswer{waveforms: [Waveform], resultsExhausted}``
  (``miru-analytics-plugins/.../metrics/MetricsQuery.java:17-41``,
  ``MetricsQuestion.java:60-200``: per named filter, AND the
  constrained answer with each power-bit's postings, per-segment
  bit-plane cardinalities → ``metricingAvg`` = bit-weighted sum / raw
  cardinality, ``Metrics.java:33-50,83-97``).

- ``AnomalyQuery{timeRange, divideTimeRangeIntoNSegments,
  powerBitsFieldName, constraintsFilter, filters, expansionField,
  expansionValues}`` → ``AnomalyAnswer{waveforms: {key → long[]},
  resultsExhausted}`` (``miru-anomaly-plugins/.../AnomalyQuery.java:
  18-48``, ``AnomalyQuestion.java:120-260``: each expansion value —
  trailing ``*`` expands via the term dictionary — joins each named
  filter as key ``name-value``; ``metricingSum`` per sign partition,
  merged = positive − negative, ``Anomaly.java:22-34,103-135``).

Power-bits encoding: ``IndexConfig.power_bits_fields`` indexes an int64
column as its SET BITS (`field:<i>` per bit + `field:+`/`field:-` sign,
``SampleTrawl.java:50-67``), so a per-segment SUM is pure postings
algebra: ``Σ_i 2^i · card(answer ∧ bit_i, segment)``.

Deliberate deviations (each loud or documented):

- Bit weight is ``2^i`` (the anomaly family's self-consistent
  convention: ``Anomaly.sum`` multiplies by ``1L << i`` and
  ``AnomalyQueryPluginRegion`` rebuilds values the same way).
  ``Metrics.sum``'s ``1 << (numBits - 1 - i)`` is an *int* shift with
  numBits=64 — Java masks the shift amount mod 32, scrambling the
  weights of bits 0..31 — a reference bug we do not reproduce.
- ``Metrics.metricingAvg`` divides by the raw per-segment cardinality
  unconditionally (``waveform[i] /= rawCardinalities[i]`` — an
  ArithmeticException on an empty segment); we emit 0 for empty
  segments.  When only SOME segments are empty the anomaly-style avg
  interpolates (``Anomaly.metricingAvg:36-100``: degree-1 spline with
  flat endpoint extension, values truncated to long) — metrics avg
  here applies the same interpolation, exercised by pytest; the gate
  query uses a window where every segment is non-empty so its SQL
  oracle stays a plain integer division.
- Metrics ignores the sign terms exactly like ``MetricsQuestion``
  (only ``String.valueOf(i)`` bit terms are fetched): negative values
  contribute their magnitude.  Anomaly is sign-correct.
- Per-segment sums saturate at ``Long.MAX_VALUE`` (the reference's
  ``checkedAdd`` catch, ``Anomaly.java:118-123``) — but we accumulate
  exact big-ints first, so the UNCHECKED Java multiply
  ``rawCardinalities[j] * multiplier`` (which silently wraps when
  ≥2 docs share bit 62 in a segment) cannot poison the total: a
  reference overflow bug we do not reproduce.
"""

from __future__ import annotations

import numpy as np

from .filter import And, Node, Term
from .request import _req_key  # cycle-free: request imports waves lazily


def _gate(request: dict, q: dict, cfg, lo: int, hi: int,
          extra: dict | None = None) -> Node:
    """constraintsFilter ∧ [extra filter] ∧ timeRange ∧ authz — the
    stream answerers' gate builder with the window always effective, so
    (unlike those answerers) an absent constraints filter is legal:
    ``MiruFilter.NO_FILTER`` short-circuits in the reference
    (``MetricsQuestion.java:98-100``)."""
    from .request import _gate_ast
    return _gate_ast(request,
                     {"constraintsFilter": q.get("constraintsFilter")},
                     cfg, {"smallestTimestamp": lo, "largestTimestamp": hi},
                     extra_filter=extra)


def _window(q: dict) -> tuple[int, int, int]:
    tr = q.get("timeRange")
    if not tr:  # constructors reject ALL_TIME (Preconditions)
        raise ValueError("requires an explicit timeRange")
    n = int(q.get("divideTimeRangeIntoNSegments") or 0)
    if n < 1:
        raise ValueError("Segments must be at least 1")
    return (int(_req_key(tr, "smallestTimestamp", "timeRange")),
            int(_req_key(tr, "largestTimestamp", "timeRange")), n)


def _filters_map(q: dict, key: str) -> dict:
    m = q.get(key)
    if not isinstance(m, dict) or not m:
        raise ValueError(f"requires a non-empty {key} map "
                         "(name → MiruFilter)")
    return m


def _exhausted(searcher, lo: int) -> bool:
    from .request import exhausted_before
    return exhausted_before(searcher, lo)


def execute_stumptown(searcher, request: dict, t0: float) -> dict:
    """StumptownQuery → StumptownAnswer: per named filter, the
    per-segment count waveform in ONE batched fan-out, plus the newest
    ``desiredNumberOfResultsPerWaveform`` matching docs (chronologically
    descending — ``Stumptown.java:57-68`` keeps the bitmap tail and
    reverses)."""
    from .request import _respond
    q = request.get("query") or {}
    lo, hi, n = _window(q)
    filters = _filters_map(q, "stumptownFilters")
    desired = int(q.get("desiredNumberOfResultsPerWaveform") or 0)
    names = list(filters)
    asts = [_gate(request, q, searcher.cfg, lo, hi, filters[name])
            for name in names]
    waves = searcher.waveforms(asts, lo, hi, n)  # ONE fan-out, all filters
    out: dict[str, dict] = {}
    for name, ast, wave in zip(names, asts, waves):
        results = []
        if desired > 0:
            res = searcher.topk_time(ast, desired)  # newest-first
            ts_us = res["ts"].cast("int64").to_pylist()
            for d, t in zip(res["doc_id"].to_pylist(), ts_us):
                results.append({"docId": int(d), "timestamp": int(t)})
        out[str(name)] = {"waveform": [int(x) for x in wave],
                          "results": results}
    answer = {"waveforms": out,
              "resultsExhausted": _exhausted(searcher, lo)}
    return _respond(request, searcher, answer, t0,
                    [f"stumptown [{lo},{hi})/{n} × {len(names)} filters "
                     f"desired={desired}"])


def _bit_terms(searcher, field: str) -> list[int]:
    """The bit indexes actually present in ``field``'s term slice
    (≤64 terms; the reference probes all 64 unconditionally,
    ``MetricsQuestion.java:147-155`` — enumerating the dictionary skips
    the provably-empty planes)."""
    declared = [f for f, _src in
                getattr(searcher.cfg, "power_bits_fields", ())]
    if field not in declared:
        # the index config is authoritative — a keyword field whose
        # values happen to be small integers must not be summed as bit
        # planes (and an index with no power_bits_fields has none)
        raise ValueError(
            f"field {field!r} is not a power-bits field of this index "
            f"(declared power_bits_fields: {declared or 'none'})")
    found: set[str] = set()
    for res in searcher._fanout("expand_prefix", f"{field}:", 70):
        found.update(res)
    if not found:
        raise ValueError(
            f"power-bits field {field!r} has no indexed values — was the "
            "index built with power_bits_fields including it?")
    bits = []
    for key in found:
        v = key.split(":", 1)[1]
        if v in ("+", "-"):
            continue
        try:
            bits.append(int(v))
        except ValueError:
            raise ValueError(
                f"field {field!r} is not a power-bits field (found term "
                f"{v!r}; expected bit indexes and +/- sign terms — was "
                "the index built with power_bits_fields?)") from None
    return sorted(bits)


def _bit_sum_waves(searcher, asts: list[Node], field: str, bits: list[int],
                   lo: int, hi: int, n: int,
                   signs: tuple[str | None, ...] = (None,),
                   ) -> dict[str | None, tuple[np.ndarray, np.ndarray]]:
    """Per sign, per gate AST: (bit-weighted per-segment sums, raw
    per-segment cardinalities) — ``Anomaly.sum``'s cardinality loop,
    batched so ALL (sign × ast × bit) combos ride ONE reader fan-out.
    A ``None`` sign ignores the sign terms (metrics,
    ``MetricsQuestion.java:147-155``); ``"+"``/``"-"`` restrict to that
    sign partition (anomaly)."""
    probes: list[Node] = []
    for sign in signs:
        for ast in asts:
            base = (ast,) if sign is None else (ast, Term(field, sign))
            probes.append(And(base) if len(base) > 1 else ast)  # raw
            for b in bits:
                probes.append(And(base + (Term(field, str(b)),)))
    waves = searcher.waveforms(probes, lo, hi, n)
    stride = 1 + len(bits)
    _I64_MAX = (1 << 63) - 1
    out: dict[str | None, tuple[np.ndarray, np.ndarray]] = {}
    for si, sign in enumerate(signs):
        # exact big-int accumulation, then SATURATE at Long.MAX_VALUE —
        # the reference's checkedAdd catch (``Anomaly.java:118-123``)
        sums = np.zeros((len(asts), n), dtype=object)
        raws = np.zeros((len(asts), n), np.int64)
        off = si * len(asts) * stride
        for i in range(len(asts)):
            raws[i] = waves[off + i * stride]
            for j, b in enumerate(bits):
                sums[i] += (waves[off + i * stride + 1 + j].astype(object)
                            * (1 << b))
        out[sign] = (np.minimum(sums, _I64_MAX).astype(np.int64), raws)
    return out


def _avg_interpolated(sums: np.ndarray, raws: np.ndarray) -> np.ndarray:
    """``Anomaly.metricingAvg`` (``Anomaly.java:36-100``): integer
    division where the segment has docs; when only some segments do,
    the gaps take the degree-1 spline through the present points with
    flat endpoint extension, truncated to long."""
    present = raws > 0
    out = np.zeros(len(sums), np.int64)
    if not present.any():
        return out
    out[present] = sums[present] // raws[present]
    if present.all():
        return out
    idx = np.flatnonzero(present)
    # flat extension: np.interp holds the first/last present value
    # outside [idx[0], idx[-1]] — exactly the reference's sentinel
    # points at x=-1 and x=len
    missing = np.flatnonzero(~present)
    out[missing] = np.trunc(
        np.interp(missing, idx, out[idx].astype(np.float64))
    ).astype(np.int64)
    return out


def execute_metrics(searcher, request: dict, t0: float) -> dict:
    """MetricsQuery → MetricsAnswer: per named filter, the per-segment
    bit-sliced AVERAGE of the power-bits value
    (``MetricsQuestion.java:156-185`` → ``Metrics.metricingAvg``)."""
    from .request import _respond
    q = request.get("query") or {}
    lo, hi, n = _window(q)
    field = str(q.get("powerBitsFieldName") or "")
    if not field:
        raise ValueError("metrics requires powerBitsFieldName")
    filters = _filters_map(q, "filters")
    bits = _bit_terms(searcher, field)
    names = list(filters)
    asts = [_gate(request, q, searcher.cfg, lo, hi, filters[name])
            for name in names]
    sums, raws = _bit_sum_waves(searcher, asts, field, bits,
                                lo, hi, n)[None]
    waveforms = [{"id": str(name),
                  "waveform": [int(x) for x in
                               _avg_interpolated(sums[i], raws[i])]}
                 for i, name in enumerate(names)]
    answer = {"waveforms": waveforms,
              "resultsExhausted": _exhausted(searcher, lo)}
    return _respond(request, searcher, answer, t0,
                    [f"metrics field={field!r} bits={bits} "
                     f"[{lo},{hi})/{n} × {len(names)} filters"])


def execute_anomaly(searcher, request: dict, t0: float) -> dict:
    """AnomalyQuery → AnomalyAnswer: expansion values (literal or
    trailing-``*`` term-dict scans) join each named filter as key
    ``name-value`` (``AnomalyQuestion.java:149-185``); per key the
    per-segment bit-sliced SUM, sign-partitioned and merged as
    positive − negative (``AnomalyQuestion.java:210-235``)."""
    from .request import _respond
    q = request.get("query") or {}
    lo, hi, n = _window(q)
    field = str(q.get("powerBitsFieldName") or "")
    if not field:
        raise ValueError("anomaly requires powerBitsFieldName")
    filters = _filters_map(q, "filters")
    exp_field = str(q.get("expansionField") or "")
    exp_values = [str(e) for e in (q.get("expansionValues") or ()) if e]
    if exp_values and not exp_field:
        # checked BEFORE the prefix scan: a bare '*' with no field would
        # otherwise scan an empty prefix, find nothing, and silently
        # degrade to bare-filter waveforms
        raise ValueError("expansionValues requires expansionField")
    expansions: list[str] = []
    for e in exp_values:
        if e.endswith("*"):
            found: set[str] = set()
            for res in searcher._fanout(
                    "expand_prefix", f"{exp_field}:{e[:-1]}", 1001):
                found.update(res)
            if len(found) > 1000:
                raise ValueError(f"expansion {e!r} exceeds 1000 terms; "
                                 "narrow the prefix")
            expansions.extend(sorted(k.split(":", 1)[1] for k in found))
        else:
            expansions.append(e)
    if exp_values and not expansions:
        # every REQUESTED expansion resolved to zero terms (a wildcard
        # matching nothing): the answer is an empty waveforms map — the
        # bare-filter fallback below is only for requests that asked for
        # no expansion at all, never a silent degradation to
        # unrestricted corpus-wide sums under the wrong keys
        return _respond(request, searcher,
                        {"waveforms": {},
                         "resultsExhausted": _exhausted(searcher, lo)},
                        t0, [f"anomaly field={field!r}: expansionValues "
                             "matched no terms"])
    keys: list[str] = []
    asts: list[Node] = []
    for name in filters:
        base = _gate(request, q, searcher.cfg, lo, hi, filters[name])
        if expansions:
            for v in expansions:
                keys.append(f"{name}-{v}")
                asts.append(And((base, Term(exp_field, v))))
        else:  # AnomalyQuestion.java:186-189 — fall back to bare filters
            keys.append(str(name))
            asts.append(base)
    bits = _bit_terms(searcher, field)
    by_sign = _bit_sum_waves(searcher, asts, field, bits, lo, hi, n,
                             signs=("+", "-"))
    pos_sums, neg_sums = by_sign["+"][0], by_sign["-"][0]
    answer = {"waveforms": {k: [int(x) for x in (pos_sums[i] - neg_sums[i])]
                            for i, k in enumerate(keys)},
              "resultsExhausted": _exhausted(searcher, lo)}
    return _respond(request, searcher, answer, t0,
                    [f"anomaly field={field!r} bits={bits} "
                     f"[{lo},{hi})/{n} × {len(keys)} keys"])
