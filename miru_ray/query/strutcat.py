"""Catwalk model-build + Strut scoring request answerers — the
reference's naive-Bayes-flavored "hot or not" ranking family, over the
transcript index.

Reference shapes:

- ``CatwalkQuery{definition: CatwalkDefinition{catwalkId, gatherField,
  scorableField, features: [CatwalkFeature{name, featureFields,
  featureFilter, featureScalar}], featureStrategy, scorableFilter,
  numeratorCount}, modelQuery: CatwalkModelQuery{timeRange,
  modelFilters[], desiredNumberOfResults}}`` →
  ``CatwalkAnswer{results: per-feature [FeatureScore{termIds,
  numerators[], denominator, numPartitions}], modelCounts, totalCount,
  timeRange, resultsExhausted, resultsClosed, destroyed}``
  (``miru-catwalk-shared/.../CatwalkQuery.java:14-121``,
  ``CatwalkAnswer.java:14-46``, model build
  ``miru-stream-plugins/.../catwalk/Catwalk.java:88-215``,
  ``CatwalkQuestion.java:60-140``).

- ``StrutQuery{catwalkDefinition, modelScalars: [StrutModelScalar],
  timeRange, constraintFilter, numeratorStrategy, numeratorScalars,
  desiredNumberOfResults, includeFeatures, gatherTermsForFields, ...}``
  → ``StrutAnswer{results: [HotOrNot{value, gatherLatestValues, score,
  features, timestamp, unread, count}], modelTotalPartitionCount,
  resultsExhausted}`` (``StrutQuery.java:20-76``,
  ``StrutAnswer.java:8-28``, ``HotOrNot.java:16-44``, scoring
  ``Strut.java:72-247,354-407``).

Semantics implemented exactly (and where not, why):

- Numerator gather-term sets: per model filter, the top-N gatherField
  terms by doc count under ``alive ∧ authz ∧ timeRange ∧ filter``
  (``CatwalkQuestion.java:94-134``; N = ``desiredNumberOfResults`` —
  the reference reads ``topNTermsPerNumerator`` from deploy config,
  the query's knob is the natural stand-in).  Ties break (count DESC,
  term ASC) where the reference heap's order is unspecified.
- Feature numerators: ``numerator_i[v] = |postings(v) ∧ gate ∧
  (⋁ postings(g ∈ set_i))|`` — equal to the reference's per-answer-term
  doc counts summed over the numerator set, because gatherField is
  single-valued per doc.  Feature DENOMINATOR is corpus-wide (NOT
  time-gated): ``|postings(v) ∧ featureFilter|`` (``Catwalk.java:
  150-163`` ANDs only the combo postings and the feature mask), alive-
  masked here (tombstoned docs should not count; the reference's
  removal mask reaches its numerators but not this AND — a bug we do
  not reproduce).
- One- and two-field features: a multi-field feature's value is the
  per-doc VALUE CROSS-PRODUCT (the reference walks it via
  ``activityIndex.getAll``, ``CatwalkQuestion.java:193-215``).  With
  single-valued fields every doc carries exactly one combo, so 2-field
  model counts are pairwise postings intersections
  (``PartitionReader.term_pair_counts`` — no docstore walk), and
  strut's per-candidate observed combos come from ONE docstore gather
  bounded by the constraint window (the AggregateCounts pattern).
  ≥3-field combos are rejected loudly; the events-table catwalk
  pipeline (``pipelines/catwalk.py``) covers arbitrary composites at
  scale.
- Strut scoring (``Strut.java:354-407`` float math in float64):
  ``s_i(v) = clamp(numerator_i[v] / denominator[v], ≤1, NaN→0)``;
  per-feature score = max over the candidate's observed values of
  ``s_i(v) × featureScalar`` (the running-max ``score()``);
  ``termScores[i] = finalizeScore(per-feature, featureStrategy)`` with
  UNIT_WEIGHTED = Σ positive / n_features, REGRESSION_WEIGHTED = Σ
  positive, MAX = max; final = ``scaleScore(termScores,
  numeratorScalars, numeratorStrategy)`` (scale then finalize again).
- ``HotOrNot.timestamp``/``count`` = the candidate's latest matching
  doc ts / matching doc count; results rank (score DESC, value ASC).
- unread integration (unreadStreamId / unreadOnly / countUnread) is
  rejected loudly — read/unread lives in the events pipeline
  (``events_unread_backfill``).
"""

from __future__ import annotations

import json
import time

import numpy as np

from .filter import And, Node, Or, Term, TimeRange
# request.py only imports THIS module inside functions, so the
# module-level import is cycle-free
from .request import _req_key

_STRATEGIES = ("UNIT_WEIGHTED", "REGRESSION_WEIGHTED", "MAX")


def _finalize(scores: np.ndarray, strategy: str) -> float:
    """``Strut.finalizeScore`` (``Strut.java:366-397``): combine one
    row of per-feature (or per-numerator scaled) scores.  Zero entries
    are 'no signal' — UNIT_WEIGHTED still divides by the FULL length
    (``sum / scores.length``, not the positive count)."""
    pos = scores[scores > 0]
    if strategy == "UNIT_WEIGHTED":
        return float(pos.sum() / len(scores)) if len(pos) else 0.0
    if strategy == "REGRESSION_WEIGHTED":
        return float(pos.sum())
    if strategy == "MAX":
        return float(pos.max()) if len(pos) else 0.0
    raise ValueError(f"Strategy not supported: {strategy}")


def _scale(term_scores: np.ndarray, scalars: np.ndarray,
           strategy: str) -> float:
    """``Strut.scaleScore`` (``Strut.java:399-407``)."""
    return _finalize(term_scores * scalars, strategy)


def _ok_clauses(request: dict, tr: dict | None, cfg) -> list[Node]:
    from .request import authz_clause
    clauses: list[Node] = []
    if tr:
        clauses.append(TimeRange(
            int(_req_key(tr, "smallestTimestamp", "timeRange")),
            int(_req_key(tr, "largestTimestamp", "timeRange"))))
    az = authz_clause(request)
    if az is not None:
        clauses.append(az)
    return clauses


def _and(clauses: list[Node]) -> Node | None:
    if not clauses:
        return None
    return clauses[0] if len(clauses) == 1 else And(tuple(clauses))


def _feature_fields(defn: dict, cfg) -> list[
        tuple[str, tuple[str, ...], float, Node | None]]:
    """Validated features as (name, fields tuple, scalar, filter_ast).
    One- and two-field features are supported: a 2-field combo's value
    space is the cross product of the fields' per-doc values, countable
    as pairwise postings intersections (``PartitionReader.
    term_pair_counts``); ≥3 fields would need a 3-way bitmap walk —
    rejected loudly (the events catwalk pipeline covers arbitrary
    composites at scale)."""
    from .request import composite_parts_of, filter_to_ast
    feats = defn.get("features")
    if not isinstance(feats, (list, tuple)) or not feats:
        raise ValueError("catwalkDefinition requires a non-empty "
                         "features list")
    out = []
    for f in feats:
        fields = f.get("featureFields") or []
        if not 1 <= len(fields) <= 2:
            raise ValueError(
                "features need 1 or 2 featureFields here (≥3-field "
                "combos need an N-way docstore walk; arbitrary "
                "composites run in the events catwalk pipeline, "
                "pipelines/catwalk)")
        ff = f.get("featureFilter")
        out.append((str(f.get("name") or "+".join(fields)),
                    tuple(str(x) for x in fields),
                    float(f.get("featureScalar", 1.0)),
                    filter_to_ast(ff, tuple(cfg.text_fields), composite_parts_of(cfg))
                    if ff else None))
    return out


def _validate_model_query(defn: dict, mq: dict) -> tuple[int, int]:
    """Cheap DTO validation, shared by COLD builds and CACHE hits —
    accept/reject must never depend on cache state (numeratorCount is
    not part of the model-cache key, so a hit would otherwise skip the
    check a cold request fails).  Returns (numeratorCount, topN)."""
    filters = mq.get("modelFilters")
    if not isinstance(filters, (list, tuple)) or not filters:
        raise ValueError("modelQuery requires a non-empty modelFilters "
                         "list")
    nc = int(defn.get("numeratorCount") or len(filters))
    if nc != len(filters):  # CatwalkQuery.java:16 checkArgument
        raise ValueError("Numerator count must equal model filters length")
    top_n = int(mq.get("desiredNumberOfResults") or 0)
    if top_n < 1:  # CatwalkModelQuery.java:108
        raise ValueError("Number of results must be at least 1")
    return nc, top_n


def _build_model(searcher, request: dict, defn: dict, mq: dict):
    """The Catwalk model: per feature, per value tuple — numerators[] +
    denominator (``Catwalk.java:88-215``).  Returns (features,
    model: one ``{value_tuple → (nums tuple, den)}`` dict per feature,
    numerator_sets, modelCounts)."""
    from .request import (_expand_field_keys, composite_parts_of,
                          filter_to_ast)
    gather = str(_req_key(defn, "gatherField", "catwalk definition"))
    feats = _feature_fields(defn, searcher.cfg)
    nc, top_n = _validate_model_query(defn, mq)
    filters = mq.get("modelFilters")
    base = _ok_clauses(request, mq.get("timeRange"), searcher.cfg)
    gather_keys = _expand_field_keys(searcher, gather)

    _ALIVE = TimeRange(-(2 ** 62), 2 ** 62)  # alive-only gate

    def _counts(ast: Node | None, keys: list[str]) -> dict[str, int]:
        ast = _ALIVE if ast is None else ast
        # expansion nodes in the gate (composite parts-prefix values,
        # wildcards) resolve BEFORE the fan-out — an empty expansions
        # dict silently evaluates them to match-nothing
        exp, _tc, _st = searcher._prepare(ast, need_stats=False)
        tot = {k: 0 for k in keys}
        for part in searcher._fanout("term_match_counts", ast, keys, exp):
            for k, c in part.items():
                tot[k] += c
        return tot

    def _pair_counts(ast: Node | None, k1: list[str],
                     k2: list[str]) -> np.ndarray:
        ast = _ALIVE if ast is None else ast
        exp, _tc, _st = searcher._prepare(ast, need_stats=False)
        tot = np.zeros((len(k1), len(k2)), np.int64)
        for part in searcher._fanout("term_pair_counts", ast, k1, k2,
                                     exp):
            tot += part
        return tot

    numerator_sets: list[list[str]] = []
    for mf in filters:
        fl = filter_to_ast(mf, tuple(searcher.cfg.text_fields), composite_parts_of(searcher.cfg)) \
            if mf else None
        gate = _and(base + ([fl] if fl is not None else []))
        counts = _counts(gate, gather_keys)
        ranked = sorted(((c, k) for k, c in counts.items() if c > 0),
                        key=lambda t: (-t[0], t[1]))[:top_n]
        numerator_sets.append([k for _c, k in ranked])

    def _set_gate(set_i: list[str]) -> Node:
        return _and(base + [Or(tuple(Term(gather, k.split(":", 1)[1])
                                     for k in set_i))])

    # model: one dict per feature, keyed by the feature's VALUE TUPLE
    # (1-tuple for single-field features, 2-tuple for combos —
    # FeatureScore.termIds carries one termId per featureField)
    model: list[dict[tuple, tuple[tuple, int]]] = []
    model_counts: list[int] = []
    for _name, fields, _scalar, fmask in feats:
        walked = 0
        if len(fields) == 1:
            vkeys = _expand_field_keys(searcher, fields[0])
            # denominator: corpus-wide value counts (∧ featureFilter)
            dens = _counts(fmask, vkeys)
            nums: list[dict[str, int]] = []
            for set_i in numerator_sets:
                if not set_i:
                    nums.append({k: 0 for k in vkeys})
                    continue
                counts = _counts(_set_gate(set_i), vkeys)
                nums.append(counts)
                walked += sum(counts.values())
            model.append({
                (k.split(":", 1)[1],):
                    (tuple(nums[i][k] for i in range(nc)), dens[k])
                for k in vkeys})
        else:  # 2-field combo: pairwise postings intersections
            k1 = _expand_field_keys(searcher, fields[0])
            k2 = _expand_field_keys(searcher, fields[1])
            if len(k1) * len(k2) > 1_000_000:
                # each reader materializes a |f1|×|f2| int64 partial;
                # past ~8 MB/reader the combo belongs in the events
                # catwalk pipeline (distributed groupby), not a fan-out
                raise ValueError(
                    f"combo feature {fields} spans "
                    f"{len(k1)}×{len(k2)} values; cross-products past "
                    "1e6 run in the events catwalk pipeline "
                    "(pipelines/catwalk)")
            dens = _pair_counts(fmask, k1, k2)
            nmats = []
            for set_i in numerator_sets:
                if not set_i:
                    nmats.append(np.zeros_like(dens))
                    continue
                m = _pair_counts(_set_gate(set_i), k1, k2)
                nmats.append(m)
                walked += int(m.sum())
            entry: dict[tuple, tuple[tuple, int]] = {}
            live = dens > 0
            for m in nmats:
                live |= m > 0
            for i, j in zip(*np.nonzero(live)):  # sparse: observed combos
                entry[(k1[i].split(":", 1)[1], k2[j].split(":", 1)[1])] = \
                    (tuple(int(m[i, j]) for m in nmats), int(dens[i, j]))
            model.append(entry)
        model_counts.append(walked)
    return feats, model, numerator_sets, model_counts


def execute_catwalk(searcher, request: dict, t0: float) -> dict:
    """CatwalkQuery → CatwalkAnswer."""
    from .request import (_reject_unread_knobs, _respond,
                          exhausted_before)
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    defn = _req_key(q, "definition", "catwalk")
    mq = q.get("modelQuery") or {}
    feats, model, numerator_sets, model_counts = \
        _build_model(searcher, request, defn, mq)
    results = []
    for fi, (_name, _fields, _scalar, _fmask) in enumerate(feats):
        rows = []
        for vt in sorted(model[fi]):
            nums, den = model[fi][vt]
            if not den and not any(nums):
                continue  # value never observed under the masks
            rows.append({"termIds": list(vt), "numerators": list(nums),
                         "denominator": int(den), "numPartitions": 1})
        results.append(rows)
    zones = searcher._zone_maps()
    lo = min((z[0] for z in zones.values()), default=0)
    hi = max((z[1] for z in zones.values()), default=0)
    tr = mq.get("timeRange") or {}
    answer = {
        "results": results,
        "modelCounts": [int(c) for c in model_counts],
        "totalCount": int(searcher.manifest["n_docs"]),
        "timeRange": {"smallestTimestamp": int(lo),
                      "largestTimestamp": int(hi)},
        "resultsExhausted": exhausted_before(
            searcher, int(tr.get("smallestTimestamp", 0))),
        "resultsClosed": False,
        "destroyed": False,
    }
    sizes = [len(s) for s in numerator_sets]
    return _respond(request, searcher, answer, t0,
                    [f"catwalk numeratorSets={sizes} "
                     f"features={[f[1] for f in feats]}"])


def execute_strut(searcher, request: dict, t0: float) -> dict:
    """StrutQuery → StrutAnswer."""
    from .request import (_expand_field_keys, _reject_unread_knobs,
                          _respond, composite_parts_of, filter_to_ast)
    q = request.get("query") or {}
    _reject_unread_knobs(q)
    for knob in ("unreadStreamId", "suppressUnreadFilter"):
        if q.get(knob):
            raise ValueError(f"{knob} is unsupported: read/unread state "
                             "lives in the events pipeline "
                             "(events_unread_backfill)")
    defn = _req_key(q, "catwalkDefinition", "strut")
    gather = str(_req_key(defn, "gatherField", "strut catwalkDefinition"))
    scalars_q = q.get("modelScalars")
    if not isinstance(scalars_q, (list, tuple)) or not scalars_q:
        raise ValueError("modelScalars must be non-empty")
    n_strategy = str(q.get("numeratorStrategy") or "")
    if n_strategy not in _STRATEGIES:
        raise ValueError(f"Strategy not supported: {n_strategy!r}")
    f_strategy = str(defn.get("featureStrategy") or "")
    if f_strategy not in _STRATEGIES:
        raise ValueError(f"Strategy not supported: {f_strategy!r}")
    desired = int(q.get("desiredNumberOfResults") or 0)
    if desired < 1:  # StrutQuery.java:50
        raise ValueError("Number of results must be at least 1")
    tr = q.get("timeRange")
    if not tr:  # StrutQuery.java:42 checkNotNull
        raise ValueError("strut requires an explicit timeRange")
    cf = q.get("constraintFilter")
    c_ast = filter_to_ast(cf, tuple(searcher.cfg.text_fields), composite_parts_of(searcher.cfg)) \
        if cf else None
    if c_ast is None:  # StrutQuery.java:43
        raise ValueError("strut requires an effective constraintFilter")
    gate = _and([c_ast] + _ok_clauses(request, tr, searcher.cfg))

    # models: one per StrutModelScalar (StrutModelCache analogue: keyed
    # per-searcher memo — built once, reused across queries)
    cache = getattr(searcher, "_strut_models", None)
    if cache is None:
        cache = searcher._strut_models = {}
    models = []
    for ms in scalars_q:
        # validate the DTO regardless of cache state (the cache key does
        # not cover numeratorCount)
        _validate_model_query(defn, ms.get("catwalkModelQuery") or {})
        # key includes the caller's authz scope (a model built under one
        # ACL gate must never answer a differently-scoped caller) and
        # the searcher's mutation epoch (remove_docs invalidates —
        # StrutModelCache also rebuilds on index change)
        key = (str(defn.get("catwalkId")),
               json.dumps(ms.get("catwalkModelQuery"), sort_keys=True),
               json.dumps({k: defn.get(k) for k in
                           ("gatherField", "features")}, sort_keys=True,
                          default=str),
               json.dumps(request.get("authzExpression"), sort_keys=True),
               getattr(searcher, "mutation_epoch", 0))
        if key not in cache:
            epoch = key[-1]
            for k in [k for k in cache if k[-1] != epoch]:
                del cache[k]  # purge pre-mutation models
            cache[key] = _build_model(searcher, request, defn,
                                      ms.get("catwalkModelQuery") or {})
        feats, model, _sets, _mc = cache[key]
        models.append((feats, model, float(ms.get("scalar", 1.0))))
    feats = models[0][0]
    nc = len((q.get("numeratorScalars") or ()))
    num_scalars = np.asarray([float(x) for x in
                              (q.get("numeratorScalars") or ())],
                             np.float64)
    for _f, model, _s in models:
        sample = next((v for entry in model for v in entry.values()),
                      ((), 0))
        if len(sample[0]) != nc:
            # StrutQuery.java:46-47 checkArgument
            raise ValueError("numeratorScalars must be the same length "
                             "as catwalkModelQuery.modelFilters")

    # candidates: gatherField terms active under constraint ∧ timeRange;
    # stats = (count, max_ts, doc_at_max) per key from ONE fan-out
    gather_keys = _expand_field_keys(searcher, gather)
    # resolve the gate's expansion nodes ONCE (the gate is constant for
    # this request) — readers look expansions up by key, and an empty
    # dict silently turns them into match-nothing
    gate_exp, _tc, _st = searcher._prepare(gate, need_stats=False)
    stats: dict[str, tuple[int, int, int]] = {k: (0, -1, -1)
                                              for k in gather_keys}
    for part in searcher._fanout("term_match_stats", gate, gather_keys,
                                 gate_exp):
        for k, (c, t, d) in part.items():
            c0, t0_, d0 = stats[k]
            stats[k] = (c0 + c, *max((t0_, d0), (t, d)))
    cands = [k for k in gather_keys if stats[k][0] > 0]
    # candidate → observed value TUPLES per feature, under the gate.
    # Single-field features read postings intersections; 2-field combos
    # share ONE docstore gather bounded by the gate's candidate docs
    # (the AggregateCounts answerer's pattern — the reference walks the
    # same filtered bitmap against its activity index)
    observed: list[dict[str, set]] = []
    combo_fields = sorted({f for _n, fields, _s, _m in feats
                           if len(fields) == 2 for f in fields})
    combo_df = None
    if combo_fields:
        import pandas as pd
        ids = searcher.match_docs(gate)
        # dedupe: a feature field may BE the gather field (or repeat) —
        # duplicated pandas columns would turn sub[col] into a frame and
        # break the row filter and groupby below
        gcols = list(dict.fromkeys([gather] + combo_fields))
        gat = searcher.gather(ids, columns=gcols) if len(ids) else None
        combo_df = gat.to_pandas() if gat is not None else \
            pd.DataFrame(columns=gcols)
    for _name, fields, _scalar, _fmask in feats:
        rows: dict[str, set] = {k: set() for k in cands}
        if len(fields) == 1:
            vkeys = _expand_field_keys(searcher, fields[0])
            for part in searcher._fanout("term_pair_rows", gate, cands,
                                         vkeys, gate_exp):
                for k, vs in part.items():
                    rows[k] |= {(v.split(":", 1)[1],) for v in vs}
        else:
            f1, f2 = fields
            sub = combo_df[list(dict.fromkeys([gather, f1, f2]))]
            # term-composer visibility: empty/null values are never
            # indexed, so they form no combo
            for col in dict.fromkeys((f1, f2)):
                sub = sub[sub[col].notna() & (sub[col] != "")]
            for conv, g in sub.groupby(gather):
                key = f"{gather}:{conv}"
                if key in rows:
                    rows[key] |= set(zip(g[f1], g[f2]))
        observed.append(rows)

    include_features = bool(q.get("includeFeatures"))
    scored: list[tuple[float, str, dict]] = []
    sum_scalars = float(sum(s for _f, _m, s in models))
    for k in cands:
        value = k.split(":", 1)[1]
        # per-numerator scalar-weighted MEAN across models
        # (StrutModelScorer.scoreInternal: scores[n] += v_m[n]·scalar_m
        # then /= Σ scalars, StrutModelScorer.java:210-239)
        per_model_scores = np.zeros(nc, np.float64)
        hotness: list[list[dict]] = [[] for _ in feats]
        for feats_m, model, model_scalar in models:
            feat_scores = np.zeros((nc, len(feats_m)), np.float64)
            for fi, (_name, _fields, fscalar, _fm) in enumerate(feats_m):
                if fscalar <= 0:
                    continue  # score() keeps current when scalar <= 0
                for vt in observed[fi].get(k, ()):
                    nums, den = model[fi].get(vt, ((0,) * nc, 0))
                    s = np.asarray(nums, np.float64)
                    s = np.minimum(np.divide(
                        s, den, out=np.zeros_like(s),
                        where=den > 0), 1.0)  # clamp >1, NaN→0
                    upd = s * fscalar
                    feat_scores[:, fi] = np.where(
                        feat_scores[:, fi] > 0,
                        np.maximum(feat_scores[:, fi], upd), upd)
                    if include_features and s.any():
                        hotness[fi].append(
                            {"values": list(vt),
                             "scaledScore": _scale(s, num_scalars,
                                                   n_strategy),
                             "scores": [float(x) for x in s]})
            term_scores = np.asarray(
                [_finalize(feat_scores[i], f_strategy)
                 for i in range(nc)], np.float64)
            per_model_scores += term_scores * model_scalar
        if sum_scalars > 0:
            per_model_scores /= sum_scalars
        score = _scale(per_model_scores, num_scalars, n_strategy)
        extra = {"features": hotness if include_features else None}
        scored.append((score, value, extra))
    scored.sort(key=lambda t: (-t[0], t[1]))
    top = scored[:desired]

    gtf = [str(f) for f in (q.get("gatherTermsForFields") or ())]
    results = []
    for score, value, extra in top:
        k = f"{gather}:{value}"
        row = {"value": value, "score": score,
               "timestamp": int(stats[k][1]),
               "unread": False, "count": int(stats[k][0]),
               "gatherLatestValues": None,
               "features": extra["features"]}
        results.append(row)
    if gtf and results:
        # latest matching doc per candidate (by ts, NOT doc id — ids
        # group by conversation here) → gather its field values.  The
        # stats fan-out already carries each candidate's newest doc id,
        # so this is ONE bounded docstore gather, zero extra fan-outs.
        by_doc: dict[int, str] = {
            int(stats[f"{gather}:{row['value']}"][2]): row["value"]
            for row in results
            if stats[f"{gather}:{row['value']}"][2] >= 0}
        if by_doc:
            gat = searcher.gather(sorted(by_doc), columns=gtf)
            cols = {f: gat[f].to_pylist() for f in gtf}
            ids_col = gat["doc_id"].to_pylist()
            val_rows = {by_doc[int(d)]: i for i, d in enumerate(ids_col)}
            for row in results:
                i = val_rows.get(row["value"])
                if i is not None:
                    row["gatherLatestValues"] = {
                        f: [cols[f][i]] for f in gtf}
    from .request import exhausted_before
    answer = {"results": results,
              "modelTotalPartitionCount": len(searcher._zone_maps()),
              "resultsExhausted": exhausted_before(
                  searcher,
                  int(_req_key(tr, "smallestTimestamp", "strut timeRange")))}
    return _respond(request, searcher, answer, t0,
                    [f"strut {len(cands)} candidates × "
                     f"{len(feats)} features × {len(models)} models"])
