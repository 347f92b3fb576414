"""Flagship pipeline over the driver testdata: documents → transcripts →
index → queries, with per-`sf_dir` caching.

The driver's correctness gate only exposes the TPC-H-ish testdata views, so
the transcripts input (BASELINE.json ``input_hint`` shape) is derived
deterministically from ``documents`` via :data:`miru_ray.fixtures.DERIVE_SQL`
— the DuckDB oracle reproduces the exact same rows, and doc ids are the
ordinal of the stable (conv_id, turn_idx) order on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import IndexConfig
from ..fixtures import DERIVE_SQL, derive_transcripts_batch
from ..index.build import build_index
from ..query.engine import Searcher
from ..util import input_fingerprint, read_json, read_parquet_clean

CACHE_ROOT = "/tmp/miru_ray_cache"
_SEARCHERS: dict[str, Searcher] = {}
_TENANT_REGISTRIES: dict = {}

#: conv_id joins the keyword fields (97-value enum in the derived
#: transcripts) as the reco plugin's "user" axis — MiruActivity indexes
#: every queried field the same way (MiruActivity.java:34-60)
FLAGSHIP_CFG = IndexConfig(docs_per_partition=2000, num_shards=2,
                           keyword_fields=("role", "tool", "conv_id"),
                           list_keyword_fields=("acl",),
                           numeric_fields=("turn_idx",),
                           # composite (role, tool) — the multi-part term
                           # surface (MiruTermComposer.java:35-63)
                           composite_fields=(("role_tool",
                                              ("role", "tool")),))


def transcripts_from_documents(sf_dir: str) -> "ray.data.Dataset":
    """documents.parquet → transcripts Dataset (deterministic derivation)."""
    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                               columns=["doc_id", "text"])
    return ds.map_batches(derive_transcripts_batch, batch_format="pyarrow")


def _cfg_tag(cfg: IndexConfig) -> str:
    import hashlib
    return hashlib.md5(repr(sorted(vars(cfg).items()))
                       .encode()).hexdigest()[:8]


def index_dir_for(sf_dir: str, cfg: IndexConfig = FLAGSHIP_CFG) -> str:
    """Build (once) and return the index directory for a testdata sf_dir.

    Cache key = input fingerprint + derivation version + CONFIG hash —
    a non-default ``cfg`` must never silently reuse an index built with
    different shards/fields.  The transcripts write is crash-safe: a run
    killed mid-write leaves no ``_DONE`` marker and the next run CLEARS
    the partial directory before rewriting (``write_parquet`` into a
    half-written dir would append uniquely-named files and silently
    duplicate rows — sticky across processes since the cache is /tmp)."""
    src = os.path.join(sf_dir, "documents.parquet")
    fp = input_fingerprint([src])[:16]
    # v2: derived transcripts carry the acl column (cache key must change
    # whenever the derivation changes — the _DONE marker alone can't tell)
    root = os.path.join(CACHE_ROOT, f"flagship_{fp}_v2_{_cfg_tag(cfg)}")
    tdir = os.path.join(root, "transcripts")
    idir = os.path.join(root, "index")
    if not os.path.exists(os.path.join(tdir, "_DONE")):
        if os.path.exists(tdir):
            import shutil
            shutil.rmtree(tdir)
        transcripts_from_documents(sf_dir).repartition(4).write_parquet(tdir)
        with open(os.path.join(tdir, "_DONE"), "w") as f:
            f.write("ok")
    build_index(tdir, idir, cfg)  # no-op if manifest is current
    return idir


def searcher_for(sf_dir: str, num_readers: int = 2,
                 cfg: IndexConfig = FLAGSHIP_CFG) -> Searcher:
    """Cached Searcher over the (sf_dir, cfg) index — ONE cache-lookup /
    rebuild-on-dead-readers definition for every config variant."""
    idir = index_dir_for(sf_dir, cfg)
    key = (idir, num_readers)
    s = _SEARCHERS.get(key)
    if s is None or not s.readers:
        s = Searcher(idir, num_readers=num_readers)
        _SEARCHERS[key] = s
    return s


def manifest_for(sf_dir: str) -> dict:
    return read_json(os.path.join(index_dir_for(sf_dir), "manifest.json"))


# --------------------------------------------------------------------------
# SQL oracle scaffolding (DuckDB) — shared CTE prologue
# --------------------------------------------------------------------------

#: CTE prologue: transcripts + docs-with-ordinal-ids + token/tf/df/dl/stats.
#: Tokenization is regexp_extract_all(lower(text), '[a-z0-9]+') — identical
#: to the engine tokenizer (miru_ray.tokenize).
SQL_PROLOGUE = f"""
WITH transcripts AS ({DERIVE_SQL}),
docs AS (
  SELECT row_number() OVER (ORDER BY conv_id, turn_idx) - 1 AS doc_id,
         conv_id, turn_idx, role, tool, ts, text, acl
  FROM transcripts
),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM docs
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT d.doc_id, count(t.term) AS dl
       FROM docs d LEFT JOIN toks t USING (doc_id) GROUP BY 1),
df AS (SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY 1),
stats AS (
  SELECT (SELECT count(*) FROM docs) AS n,
         (SELECT sum(dl) FROM dl) * 1.0 / (SELECT count(*) FROM docs) AS avgdl
)
""".strip()


def bm25_sql(terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75,
             mode: str = "and", authz: tuple | None = None,
             num_range: tuple | None = None,
             boosts: dict | None = None,
             keyword: tuple | None = None) -> str:
    # default mode "and" matches q_bm25's default — a default-arg
    # engine/oracle pair must agree or a future registration silently
    # compares an AND query against an OR oracle
    boosts = boosts or {}
    qvals = ", ".join(f"('{t}', {float(boosts.get(t, 1.0))!r})"
                      for t in sorted(set(terms)))
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    authz_pred = ""
    if authz:
        lst = ", ".join(f"'{a}'" for a in authz)
        authz_pred = (f"JOIN docs ad ON ad.doc_id = tf.doc_id "
                      f"AND list_has_any(ad.acl, [{lst}])")
    if num_range:
        nf, lo, hi = num_range
        authz_pred += (f" JOIN docs nd ON nd.doc_id = tf.doc_id "
                       f"AND nd.{nf} BETWEEN {lo} AND {hi}")
    if keyword:  # non-scoring keyword gate (constraintsFilter semantics)
        kf, kv = keyword
        authz_pred += (f" JOIN docs kd ON kd.doc_id = tf.doc_id "
                       f"AND kd.{kf} = '{kv}'")
    return f"""
{SQL_PROLOGUE},
q(term, w) AS (VALUES {qvals}),
matched AS (
  SELECT tf.doc_id FROM tf JOIN q USING (term) {authz_pred}
  GROUP BY tf.doc_id {having}
),
scores AS (
  SELECT m.doc_id,
         sum(q.w * ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM matched m
  JOIN tf ON tf.doc_id = m.doc_id
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.doc_id
)
SELECT doc_id, round_even(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id DESC LIMIT {k}
""".strip()


def ref_tfidf_sql(terms: list[str], k: int = 10, mode: str = "and") -> str:
    qvals = ", ".join(f"('{t}')" for t in sorted(set(terms)))
    having = f"HAVING count(*) = {len(set(terms))}" if mode == "and" else ""
    return f"""
{SQL_PROLOGUE},
q(term) AS (VALUES {qvals}),
matched AS (
  SELECT tf.doc_id FROM tf JOIN q USING (term)
  GROUP BY tf.doc_id {having}
),
scores AS (
  SELECT m.doc_id, sum(1.0 / df.cf * tf.tf) AS score
  FROM matched m
  JOIN tf ON tf.doc_id = m.doc_id
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  GROUP BY m.doc_id
)
SELECT doc_id, round_even(score, 6) AS score
FROM scores ORDER BY score DESC, doc_id DESC LIMIT {k}
""".strip()


# --------------------------------------------------------------------------
# engine-side query callables (each takes sf_dir, returns a table)
# --------------------------------------------------------------------------

def q_bm25(sf_dir: str, terms: list[str], k: int = 10,
           mode: str = "and") -> pa.Table:
    s = searcher_for(sf_dir)
    ast = _ast(terms, mode)
    return s.topk(ast, k, "bm25")


def q_ref_tfidf(sf_dir: str, terms: list[str], k: int = 10,
                mode: str = "and") -> pa.Table:
    s = searcher_for(sf_dir)
    return s.topk(_ast(terms, mode), k, "ref-tfidf")


def q_request_topk(sf_dir: str, terms: list[str], role: str,
                   k: int = 10) -> pa.Table:
    """Top-k served through the JSON request surface: a canned
    MiruRequest document (``MiruRequest.java:14-36`` wrapping
    ``FullTextQuery.java:19-53``) with a non-scoring ``constraintsFilter``
    on ``role`` — the POSTed API path end-to-end (parse → filter AST →
    strategy → answer), not a direct Searcher call."""
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    req = {"name": "gate", "tenantId": "flagship",
           "query": {"query": " ".join(terms), "defaultField": "text",
                     "strategy": "BM25", "desiredNumberOfResults": k,
                     "constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldType": "primary",
                                           "fieldName": "role",
                                           "values": [role]}]}}}
    res = execute_request(s, req)["answer"]["results"]
    return pa.table({"doc_id": pa.array([r["docId"] for r in res],
                                        pa.int64()),
                     "score": pa.array([r["score"] for r in res],
                                       pa.float64())})


def q_request_distinct_count(sf_dir: str, term: str = "spark",
                             role: str = "user", field: str = "tool",
                             desired: int = 100) -> pa.Table:
    """DistinctCount served through the JSON request surface
    (``DistinctCountQuery.java:14-41`` → ``DistinctCountAnswer.java:
    10-26``): distinct ``field`` values among docs whose text contains
    ``term`` and whose role matches — streamFilter ∧ constraintsFilter,
    the reference's stream-scoped distinct.  ``desired`` is chosen above
    the field's cardinality so ``aggregateTerms`` is the COMPLETE
    distinct set (no truncation ambiguity in the oracle compare)."""
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    req = {"name": "distinctCount", "tenantId": "flagship",
           "query": {"streamFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": [role]}]},
                     "aggregateCountAroundField": field,
                     "desiredNumberOfDistincts": desired}}
    ans = execute_request(s, req)["answer"]
    return pa.table({"value": pa.array(ans["aggregateTerms"],
                                       pa.string())})


def request_distinct_count_sql(term: str = "spark", role: str = "user",
                               field: str = "tool") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT DISTINCT d.{field} AS value
FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
WHERE d.role = '{role}' AND d.{field} <> ''
ORDER BY value
""".strip()


def q_request_aggregate_counts(sf_dir: str, term: str = "spark",
                               start: int = 2,
                               desired: int = 8) -> pa.Table:
    """AggregateCounts (inbox / activity stream) through the JSON
    request surface (``AggregateCountsQuery.java:13-45``,
    ``AggregateCount.java:11-44``): docs whose text contains ``term``
    and whose role is user/assistant, grouped by conversation, newest
    stream order (latest ts desc, conv_id tie-break), paged
    ``[start, start+desired)``."""
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    req = {"name": "aggregateCounts", "tenantId": "flagship",
           "query": {"streamFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "constraints": {"inbox": {
                         "constraintsFilter": {
                             "operation": "or",
                             "fieldFilters": [{"fieldName": "role",
                                               "values": ["user",
                                                          "assistant"]}]},
                         "aggregateCountAroundField": "conv_id",
                         "startFromDistinctN": start,
                         "desiredNumberOfDistincts": desired}}}}
    res = execute_request(s, req)["answer"]["constraints"]["inbox"]
    rows = res["results"]
    return pa.table({
        "value": pa.array([r["distinctValue"] for r in rows], pa.string()),
        "n_docs": pa.array([r["count"] for r in rows], pa.int64()),
        "latest_ts": pa.array([r["latestTimestamp"] for r in rows],
                              pa.int64()).cast(pa.timestamp("us")),
        "oldest_ts": pa.array([r["oldestTimestamp"] for r in rows],
                              pa.int64()).cast(pa.timestamp("us")),
    })


def request_aggregate_counts_sql(term: str = "spark", start: int = 2,
                                 desired: int = 8) -> str:
    return f"""
{SQL_PROLOGUE}
SELECT d.conv_id AS value, count(*)::BIGINT AS n_docs,
       max(d.ts) AS latest_ts, min(d.ts) AS oldest_ts
FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
WHERE d.role IN ('user', 'assistant')
GROUP BY d.conv_id
ORDER BY latest_ts DESC, value
LIMIT {desired} OFFSET {start}
""".strip()


#: the analytics gate query's window: the fixture's first hour
#: (ts = 2024-01-01 + doc_id seconds), 24 segments of 150 s
_ANALYTICS_N = 24
_ANALYTICS_HOURS = 1
_ANALYTICS_ROLES = ("assistant", "user")


def q_request_analytics(sf_dir: str, term: str = "spark") -> pa.Table:
    """AnalyticsQuery through the JSON request surface
    (``AnalyticsQuery.java:14-28`` → ``AnalyticsAnswer.java:13-27``):
    per-segment counts of docs whose text contains ``term``, one
    waveform per role filter, over the fixture's first hour split into
    24 segments — postings + ts arrays only, no docstore gather."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "analytics", "tenantId": "flagship",
           "query": {"constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "scoreSets": [{"key": "hour0",
                                    "timeRange": {
                                        "smallestTimestamp": lo,
                                        "largestTimestamp": hi},
                                    "divideTimeRangeIntoNSegments":
                                        _ANALYTICS_N}],
                     "analyticsFilters": {
                         r: {"operation": "and",
                             "fieldFilters": [{"fieldName": "role",
                                               "values": [r]}]}
                         for r in _ANALYTICS_ROLES}}}
    rows = execute_request(s, req)["answer"]["waveforms"]["hour0"]
    names, segs, counts = [], [], []
    for r in rows:
        for i, c in enumerate(r["waveform"]):
            names.append(r["id"])
            segs.append(i)
            counts.append(c)
    return pa.table({"filter_name": pa.array(names, pa.string()),
                     "segment": pa.array(segs, pa.int64()),
                     "n_docs": pa.array(counts, pa.int64())})


def request_analytics_sql(term: str = "spark") -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    n = _ANALYTICS_N
    roles = ", ".join(f"('{r}')" for r in _ANALYTICS_ROLES)
    return f"""
{SQL_PROLOGUE},
hits AS (
  SELECT d.role AS role,
         ((epoch_us(d.ts) - {lo}) * {n}) // ({hi} - {lo}) AS segment
  FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
  WHERE epoch_us(d.ts) >= {lo} AND epoch_us(d.ts) < {hi}
)
SELECT r.filter_name, s.segment AS segment,
       coalesce(c.n, 0)::BIGINT AS n_docs
FROM (VALUES {roles}) r(filter_name)
CROSS JOIN (SELECT unnest(range(0, {n})) AS segment) s
LEFT JOIN (SELECT role, segment, count(*) AS n
           FROM hits GROUP BY 1, 2) c
  ON c.role = r.filter_name AND c.segment = s.segment
ORDER BY 1, 2
""".strip()


_TRENDING_K = 5


def q_request_trending(sf_dir: str, term: str = "spark",
                       field: str = "tool") -> pa.Table:
    """TrendingQuery through the JSON request surface
    (``TrendingQuery.java:14-47`` → ``TrendingAnswer`` /
    ``Trendy.java:11-28``): distinct ``tool`` values gathered from the
    term dictionary, one batched waveform fan-out over the fixture's
    first hour (24 segments) under the ``text:{term}`` constraint, then
    all four reference strategies ranked top-5 each
    (``TrendingInjectable.java:117-215``)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    req = {"name": "trending", "tenantId": "flagship",
           "query": {"constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "aggregateCountAroundField": field,
                     "distinctQueries": [[{
                         "timeRange": tr,
                         "gatherDistinctsForField": field}]],
                     "scoreSets": [{"key": "hour0",
                                    "strategies": ["LINEAR_REGRESSION",
                                                   "LEADER", "PEAKS",
                                                   "HIGHEST_PEAK"],
                                    "timeRange": tr,
                                    "divideTimeRangeIntoNSegments":
                                        _ANALYTICS_N,
                                    "desiredNumberOfDistincts":
                                        _TRENDING_K}]}}
    res = execute_request(s, req)["answer"]["scoreSets"]["hour0"]["results"]
    strat, vals, ranks = [], [], []
    for sname in sorted(res):
        for t in res[sname]:
            strat.append(sname)
            vals.append(t["distinctValue"])
            ranks.append(float(t["rank"]))
    return pa.table({"strategy": pa.array(strat, pa.string()),
                     "distinct_value": pa.array(vals, pa.string()),
                     "trend_rank": pa.array(ranks, pa.float64())})


def request_trending_sql(term: str = "spark", field: str = "tool") -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    n = _ANALYTICS_N
    k = _TRENDING_K
    sx = n * (n - 1) // 2
    sxx = (n - 1) * n * (2 * n - 1) // 6
    den = n * sxx - sx * sx
    # the PeakDet walk needs WITH RECURSIVE, declared on the top-level
    # WITH (same state machine as the events_trending_peaks oracle,
    # with the reference's per-term threshold mx/6 + bucket95/100)
    prologue = SQL_PROLOGUE.replace("WITH ", "WITH RECURSIVE ", 1)
    return f"""
{prologue},
hits AS (
  SELECT d.{field} AS v,
         ((epoch_us(d.ts) - {lo}) * {n}) // ({hi} - {lo}) AS seg
  FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
  WHERE epoch_us(d.ts) >= {lo} AND epoch_us(d.ts) < {hi}
    AND d.{field} <> ''
),
vals AS (SELECT DISTINCT v FROM hits),
grid AS (SELECT t.v, u.i AS seg
         FROM vals t, unnest(generate_series(0, {n - 1})) AS u(i)),
wave AS (SELECT g.v, g.seg, COALESCE(c.cnt, 0)::DOUBLE AS y
         FROM grid g
         LEFT JOIN (SELECT v, seg, count(*) AS cnt
                    FROM hits GROUP BY 1, 2) c
           ON c.v = g.v AND c.seg = g.seg),
agg AS (SELECT v, sum(seg * y) AS sxy, sum(y) AS sy, max(y) AS mx
        FROM wave GROUP BY v),
b95 AS (SELECT quantile_cont(mx, 0.95) AS q FROM agg),
pd AS (SELECT a.v, a.mx / 6.0 + b.q / 100.0 AS delta FROM agg a, b95 b),
walk(v, pos, mn, mx, look, peaks) AS (
  SELECT v, -1, 1e308, -1e308, true, 0 FROM pd
  UNION ALL
  SELECT w.v, w.pos + 1,
         CASE WHEN w.look AND dd.y < greatest(w.mx, dd.y) - pd.delta
              THEN dd.y ELSE least(w.mn, dd.y) END,
         CASE WHEN NOT w.look AND dd.y > least(w.mn, dd.y) + pd.delta
              THEN dd.y ELSE greatest(w.mx, dd.y) END,
         CASE WHEN w.look AND dd.y < greatest(w.mx, dd.y) - pd.delta
              THEN false
              WHEN NOT w.look AND dd.y > least(w.mn, dd.y) + pd.delta
              THEN true ELSE w.look END,
         w.peaks + CASE WHEN w.look AND dd.y < greatest(w.mx, dd.y)
                                               - pd.delta
                        THEN 1 ELSE 0 END
  FROM walk w
  JOIN wave dd ON dd.v = w.v AND dd.seg = w.pos + 1
  JOIN pd ON pd.v = w.v),
npeaks AS (SELECT v, peaks FROM walk WHERE pos = {n - 1})
SELECT * FROM (
  SELECT 'HIGHEST_PEAK' AS strategy, v AS distinct_value,
         mx AS trend_rank
  FROM agg ORDER BY trend_rank DESC, v LIMIT {k})
UNION ALL
SELECT * FROM (
  SELECT 'LEADER' AS strategy, v AS distinct_value, sy AS trend_rank
  FROM agg ORDER BY trend_rank DESC, v LIMIT {k})
UNION ALL
SELECT * FROM (
  SELECT 'LINEAR_REGRESSION' AS strategy, v AS distinct_value,
         ({n} * sxy - {sx} * sy) / {den} AS trend_rank
  FROM agg ORDER BY trend_rank DESC, v LIMIT {k})
UNION ALL
SELECT * FROM (
  SELECT 'PEAKS' AS strategy, p.v AS distinct_value,
         p.peaks::DOUBLE AS trend_rank
  FROM npeaks p ORDER BY trend_rank DESC, v LIMIT {k})
""".strip()


#: conv-000070's parents in the 10-min window are NOT closed under the
#: derived fixture's (t, t+4 mod 7) tool-pairing, so its contributor
#: neighborhood recommends tools outside its own set — most "me" convs
#: degenerate to empty under top-5 (their top contributors share exactly
#: their tools); K=10 reaches the count-1 contributors that carry new
#: tools, and the tool_2 exclusion removes a live recommendation
_RECO_CONV = "conv-000070"
_RECO_WINDOW_S = 600
_RECO_K = 10
_RECO_REMOVE_PREFIX = "tool_2"


def q_request_reco(sf_dir: str) -> pa.Table:
    """RecoQuery through the JSON request surface
    (``RecoQuery.java:12-41`` → ``RecoAnswer``): for conversation
    ``_RECO_CONV``, the tools it has NOT used in the fixture's first
    ``_RECO_WINDOW_S`` seconds, scored by how much the conversations
    that share its tools used them — the full 3-hop collaborative
    filter (``CollaborativeFiltering.java:56-240``) with a
    removeDistinctsQuery excluding the ``_RECO_REMOVE_PREFIX``
    prefix."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _RECO_WINDOW_S * 1_000_000
    tr = {"smallestTimestamp": lo, "largestTimestamp": hi}
    req = {"name": "reco", "tenantId": "flagship",
           "query": {"timeRange": tr,
                     "constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "conv_id",
                                           "values": [_RECO_CONV]}]},
                     "aggregateFieldName1": "tool",
                     "aggregateFieldName2": "conv_id",
                     "aggregateFieldName3": "tool",
                     "removeDistinctsQuery": {
                         "timeRange": tr,
                         "gatherDistinctsForField": "tool",
                         "prefixes": [_RECO_REMOVE_PREFIX]},
                     "desiredNumberOfDistincts": _RECO_K}}
    res = execute_request(s, req)["answer"]["results"]
    return pa.table({
        "distinct_value": pa.array([r["distinctValue"] for r in res],
                                   pa.string()),
        "reco_rank": pa.array([float(r["rank"]) for r in res],
                              pa.float64())})


def request_reco_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _RECO_WINDOW_S * 1_000_000
    return f"""
{SQL_PROLOGUE},
win AS (
  SELECT * FROM docs
  WHERE epoch_us(ts) >= {lo} AND epoch_us(ts) <= {hi}
),
myok AS (SELECT * FROM win WHERE conv_id = '{_RECO_CONV}'),
parents AS (SELECT DISTINCT tool FROM myok WHERE tool <> ''),
otherok AS (
  SELECT w.* FROM win w JOIN parents p ON w.tool = p.tool
  WHERE w.conv_id <> '{_RECO_CONV}'
),
contrib AS (
  SELECT conv_id, count(*) AS c FROM otherok GROUP BY 1
  ORDER BY c DESC, conv_id ASC LIMIT {_RECO_K}
),
hop3 AS (
  SELECT DISTINCT co.conv_id, w.tool, co.c
  FROM contrib co JOIN win w ON w.conv_id = co.conv_id
  WHERE w.tool <> ''
),
excl AS (
  SELECT tool FROM parents
  UNION
  SELECT DISTINCT tool FROM win
  WHERE tool LIKE '{_RECO_REMOVE_PREFIX}%' AND tool <> ''
)
SELECT h.tool AS distinct_value, sum(h.c)::DOUBLE AS reco_rank
FROM hop3 h
WHERE h.tool NOT IN (SELECT tool FROM excl)
GROUP BY 1
ORDER BY reco_rank DESC, distinct_value ASC LIMIT {_RECO_K}
""".strip()


def q_request_uniques(sf_dir: str, field: str = "tool",
                      role: str = "user") -> pa.Table:
    """UniquesQuery through the JSON request surface
    (``UniquesQuery.java:17-41`` → ``UniquesAnswer``): the count of
    distinct ``tool`` values among ``role=user`` docs in the fixture's
    first hour."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "uniques", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": lo,
                                   "largestTimestamp": hi},
                     "gatherUniquesForField": field,
                     "constraints": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": [role]}]}}}
    n = execute_request(s, req)["answer"]["uniques"]
    return pa.table({"uniques": pa.array([int(n)], pa.int64())})


def request_uniques_sql(field: str = "tool", role: str = "user") -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    return f"""
{SQL_PROLOGUE}
SELECT count(DISTINCT {field})::BIGINT AS uniques
FROM docs
WHERE role = '{role}' AND {field} <> ''
  AND epoch_us(ts) >= {lo} AND epoch_us(ts) <= {hi}
""".strip()


def q_request_distincts(sf_dir: str, field: str = "tool",
                        term: str = "spark") -> pa.Table:
    """DistinctsQuery through the JSON request surface
    (``DistinctsQuery.java:16-38`` → ``DistinctsAnswer``): the distinct
    ``tool`` values among first-hour docs whose text contains ``term``
    (the filtered-gather path)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "distincts", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": lo,
                                   "largestTimestamp": hi},
                     "gatherDistinctsForField": field,
                     "constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]}}}
    vals = execute_request(s, req)["answer"]["results"]
    return pa.table({"value": pa.array(vals, pa.string())})


def request_distincts_sql(field: str = "tool",
                          term: str = "spark") -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    return f"""
{SQL_PROLOGUE}
SELECT DISTINCT d.{field} AS value
FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
WHERE d.{field} <> ''
  AND epoch_us(d.ts) >= {lo} AND epoch_us(d.ts) <= {hi}
ORDER BY value
""".strip()


_CATWALK_TOPN = 50  # top convs per numerator — LIVE cut (97 convs exist)


def _catwalk_defn(features) -> dict:
    return {"catwalkId": "flagship",
            "gatherField": "conv_id",
            "scorableField": "conv_id",
            "features": features,
            "featureStrategy": "UNIT_WEIGHTED",
            "numeratorCount": 2}


def _catwalk_model_query(lo: int, hi: int) -> dict:
    return {"timeRange": {"smallestTimestamp": lo, "largestTimestamp": hi},
            "modelFilters": [
                {"operation": "and",
                 "fieldFilters": [{"fieldName": "role",
                                   "values": [r]}]}
                for r in ("user", "assistant")],
            "desiredNumberOfResults": _CATWALK_TOPN}


def q_request_catwalk(sf_dir: str) -> pa.Table:
    """CatwalkQuery through the JSON request surface
    (``CatwalkQuery.java:14-121`` → ``CatwalkAnswer``): the in-index
    naive-Bayes model over the first hour — numerator sets = top-50
    convs by user- and assistant-doc counts, feature = ``tool``,
    numerators = window doc counts of the numerator convs per value,
    denominator = corpus-wide value counts
    (``Catwalk.java:88-215``)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "catwalk", "tenantId": "flagship",
           "query": {"definition": _catwalk_defn(
                         [{"name": "tools", "featureFields": ["tool"],
                           "featureScalar": 1.0}]),
                     "modelQuery": _catwalk_model_query(lo, hi)}}
    rows = execute_request(s, req)["answer"]["results"][0]
    return pa.table({
        "value": pa.array([r["termIds"][0] for r in rows], pa.string()),
        "num_user": pa.array([r["numerators"][0] for r in rows],
                             pa.int64()),
        "num_assistant": pa.array([r["numerators"][1] for r in rows],
                                  pa.int64()),
        "denominator": pa.array([r["denominator"] for r in rows],
                                pa.int64())})


def _catwalk_sql_fragments(lo: int, hi: int) -> str:
    """Shared oracle CTEs: window, top-N numerator conv sets, per-value
    window numerators + corpus denominators for tool and role."""
    return f"""
win AS (
  SELECT * FROM docs
  WHERE epoch_us(ts) >= {lo} AND epoch_us(ts) <= {hi}
),
top_u AS (
  SELECT conv_id FROM (
    SELECT conv_id, count(*) AS c FROM win WHERE role = 'user'
    GROUP BY 1 ORDER BY c DESC, conv_id ASC LIMIT {_CATWALK_TOPN})),
top_a AS (
  SELECT conv_id FROM (
    SELECT conv_id, count(*) AS c FROM win WHERE role = 'assistant'
    GROUP BY 1 ORDER BY c DESC, conv_id ASC LIMIT {_CATWALK_TOPN})),
den_tool AS (SELECT tool AS v, count(*) AS d FROM docs
             WHERE tool <> '' GROUP BY 1),
nu_tool AS (SELECT tool AS v, count(*) AS n FROM win
            WHERE tool <> ''
              AND conv_id IN (SELECT conv_id FROM top_u) GROUP BY 1),
na_tool AS (SELECT tool AS v, count(*) AS n FROM win
            WHERE tool <> ''
              AND conv_id IN (SELECT conv_id FROM top_a) GROUP BY 1),
den_role AS (SELECT role AS v, count(*) AS d FROM docs GROUP BY 1),
nu_role AS (SELECT role AS v, count(*) AS n FROM win
            WHERE conv_id IN (SELECT conv_id FROM top_u) GROUP BY 1),
na_role AS (SELECT role AS v, count(*) AS n FROM win
            WHERE conv_id IN (SELECT conv_id FROM top_a) GROUP BY 1)
""".strip()


def request_catwalk_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    return f"""
{SQL_PROLOGUE},
{_catwalk_sql_fragments(lo, hi)}
SELECT d.v AS value,
       coalesce(nu.n, 0)::BIGINT AS num_user,
       coalesce(na.n, 0)::BIGINT AS num_assistant,
       d.d::BIGINT AS denominator
FROM den_tool d
LEFT JOIN nu_tool nu ON nu.v = d.v
LEFT JOIN na_tool na ON na.v = d.v
ORDER BY value
""".strip()


def q_request_catwalk_combo(sf_dir: str) -> pa.Table:
    """CatwalkQuery with a TWO-FIELD combo feature (tool × role): the
    per-doc value cross-product counted as pairwise postings
    intersections (``PartitionReader.term_pair_counts`` — the
    reference's ``activityIndex.getAll`` combo walk,
    ``CatwalkQuestion.java:193-215``, without a docstore pass)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "catwalk", "tenantId": "flagship",
           "query": {"definition": _catwalk_defn(
                         [{"name": "combo",
                           "featureFields": ["tool", "role"],
                           "featureScalar": 1.0}]),
                     "modelQuery": _catwalk_model_query(lo, hi)}}
    rows = execute_request(s, req)["answer"]["results"][0]
    return pa.table({
        "tool": pa.array([r["termIds"][0] for r in rows], pa.string()),
        "role": pa.array([r["termIds"][1] for r in rows], pa.string()),
        "num_user": pa.array([r["numerators"][0] for r in rows],
                             pa.int64()),
        "num_assistant": pa.array([r["numerators"][1] for r in rows],
                                  pa.int64()),
        "denominator": pa.array([r["denominator"] for r in rows],
                                pa.int64())})


def request_catwalk_combo_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    return f"""
{SQL_PROLOGUE},
{_catwalk_sql_fragments(lo, hi)},
den_c AS (SELECT tool, role, count(*) AS d FROM docs
          WHERE tool <> '' GROUP BY 1, 2),
nu_c AS (SELECT tool, role, count(*) AS n FROM win
         WHERE tool <> ''
           AND conv_id IN (SELECT conv_id FROM top_u) GROUP BY 1, 2),
na_c AS (SELECT tool, role, count(*) AS n FROM win
         WHERE tool <> ''
           AND conv_id IN (SELECT conv_id FROM top_a) GROUP BY 1, 2)
SELECT d.tool, d.role,
       coalesce(nu.n, 0)::BIGINT AS num_user,
       coalesce(na.n, 0)::BIGINT AS num_assistant,
       d.d::BIGINT AS denominator
FROM den_c d
LEFT JOIN nu_c nu ON nu.tool = d.tool AND nu.role = d.role
LEFT JOIN na_c na ON na.tool = d.tool AND na.role = d.role
ORDER BY 1, 2
""".strip()


_STRUT_K = 10


def q_request_strut(sf_dir: str) -> pa.Table:
    """StrutQuery through the JSON request surface
    (``StrutQuery.java:20-76`` → ``StrutAnswer``/``HotOrNot``): rank
    first-half-hour conversations by the catwalk model built over the
    first hour — two single-field features (tool ×1.0, role ×0.5),
    featureStrategy UNIT_WEIGHTED, numeratorScalars (0.5, 0.4) combined
    REGRESSION_WEIGHTED (``Strut.java:354-407``)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    chi = lo + 1_800 * 1_000_000  # candidates: the first half hour
    req = {"name": "strut", "tenantId": "flagship",
           "query": {
               "catwalkDefinition": _catwalk_defn(
                   [{"name": "tools", "featureFields": ["tool"],
                     "featureScalar": 1.0},
                    {"name": "roles", "featureFields": ["role"],
                     "featureScalar": 0.5}]),
               "modelScalars": [
                   {"catwalkModelQuery": _catwalk_model_query(lo, hi),
                    "scalar": 1.0}],
               "timeRange": {"smallestTimestamp": lo,
                             "largestTimestamp": chi},
               "constraintFilter": {
                   "operation": "and",
                   "fieldFilters": [{"fieldName": "role",
                                     "values": ["user", "assistant",
                                                "system", "tool"]}]},
               "numeratorStrategy": "REGRESSION_WEIGHTED",
               "numeratorScalars": [0.5, 0.4],
               "desiredNumberOfResults": _STRUT_K}}
    rows = execute_request(s, req)["answer"]["results"]
    return pa.table({
        "value": pa.array([r["value"] for r in rows], pa.string()),
        "score": pa.array([round(float(r["score"]), 6) for r in rows],
                          pa.float64()),
        "latest_ts": pa.array([r["timestamp"] for r in rows],
                              pa.int64()),
        "n_docs": pa.array([r["count"] for r in rows], pa.int64())})


def request_strut_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    chi = lo + 1_800 * 1_000_000
    return f"""
{SQL_PROLOGUE},
{_catwalk_sql_fragments(lo, hi)},
candwin AS (
  SELECT * FROM docs
  WHERE epoch_us(ts) >= {lo} AND epoch_us(ts) <= {chi}
),
-- per-value model scores s_i = least(num/den, 1), NaN-free
s_tool AS (
  SELECT d.v,
         CASE WHEN d.d > 0
              THEN least(coalesce(nu.n, 0) / d.d::DOUBLE, 1.0)
              ELSE 0.0 END AS su,
         CASE WHEN d.d > 0
              THEN least(coalesce(na.n, 0) / d.d::DOUBLE, 1.0)
              ELSE 0.0 END AS sa
  FROM den_tool d
  LEFT JOIN nu_tool nu ON nu.v = d.v
  LEFT JOIN na_tool na ON na.v = d.v),
s_role AS (
  SELECT d.v,
         CASE WHEN d.d > 0
              THEN least(coalesce(nu.n, 0) / d.d::DOUBLE, 1.0)
              ELSE 0.0 END AS su,
         CASE WHEN d.d > 0
              THEN least(coalesce(na.n, 0) / d.d::DOUBLE, 1.0)
              ELSE 0.0 END AS sa
  FROM den_role d
  LEFT JOIN nu_role nu ON nu.v = d.v
  LEFT JOIN na_role na ON na.v = d.v),
-- per-candidate feature scores: max over observed values of s x scalar
f_tool AS (
  SELECT c.conv_id, max(s.su) * 1.0 AS fu, max(s.sa) * 1.0 AS fa
  FROM (SELECT DISTINCT conv_id, tool FROM candwin
        WHERE tool <> '') c
  JOIN s_tool s ON s.v = c.tool GROUP BY 1),
f_role AS (
  SELECT c.conv_id, max(s.su) * 0.5 AS fu, max(s.sa) * 0.5 AS fa
  FROM (SELECT DISTINCT conv_id, role FROM candwin) c
  JOIN s_role s ON s.v = c.role GROUP BY 1),
cand AS (
  SELECT conv_id, max(epoch_us(ts)) AS latest_ts,
         count(*) AS n_docs
  FROM candwin GROUP BY 1),
-- featureStrategy UNIT_WEIGHTED: sum positives / n_features (=2);
-- numeratorStrategy REGRESSION_WEIGHTED over scaled (0.5, 0.4)
scored AS (
  SELECT c.conv_id, c.latest_ts, c.n_docs,
         greatest((coalesce(CASE WHEN t.fu > 0 THEN t.fu END, 0)
                   + coalesce(CASE WHEN r.fu > 0 THEN r.fu END, 0)) / 2
                  * 0.5, 0)
         + greatest((coalesce(CASE WHEN t.fa > 0 THEN t.fa END, 0)
                     + coalesce(CASE WHEN r.fa > 0 THEN r.fa END, 0)) / 2
                    * 0.4, 0) AS score
  FROM cand c
  LEFT JOIN f_tool t ON t.conv_id = c.conv_id
  LEFT JOIN f_role r ON r.conv_id = c.conv_id)
SELECT conv_id AS value, round(score, 6) AS score,
       latest_ts::BIGINT AS latest_ts, n_docs::BIGINT AS n_docs
FROM scored
ORDER BY scored.score DESC, value ASC LIMIT {_STRUT_K}
""".strip()


# ---------------------------------------------------------------------------
# Stumptown / Metrics / Anomaly request endpoints (the last three plugin
# shapes): waveform counts + newest-N docs, and bit-sliced SUM/AVG over a
# power-bits field
# ---------------------------------------------------------------------------

#: power-bits config: turn_idx indexed as its SET BITS (`bits:<i>` terms +
#: a `bits:+` sign term per doc — SampleTrawl.java:50-67, the metric
#: sampler's schema) so MetricsQuery/AnomalyQuery per-segment SUM/AVG are
#: pure postings algebra (~12 bit planes here, value-cardinality-free)
METRICS_CFG = IndexConfig(docs_per_partition=100_000, num_shards=1,
                          text_fields=(),  # metrics tenants don't score
                          keyword_fields=("role", "tool"),
                          power_bits_fields=(("bits", "turn_idx"),))


def _cfg_searcher(sf_dir: str, cfg: IndexConfig,
                  num_readers: int = 2) -> Searcher:
    return searcher_for(sf_dir, num_readers, cfg)


_STUMP_N = 12
_STUMP_DESIRED = 3
_WAVE_ROLES = ("assistant", "user")


def _role_filters(roles=_WAVE_ROLES) -> dict:
    return {r: {"operation": "and",
                "fieldFilters": [{"fieldName": "role", "values": [r]}]}
            for r in roles}


def q_request_stumptown(sf_dir: str, term: str = "spark") -> pa.Table:
    """StumptownQuery through the JSON request surface
    (``StumptownQuery.java:15-37`` → ``StumptownAnswer``): per role
    filter under a ``text:{term}`` constraint over the first hour — the
    12-segment count waveform PLUS the newest 3 matching docs
    (chronologically descending, ``Stumptown.java:57-68``).  Output is
    long-form ``(filter_name, kind, k, v)``: kind='wave' rows carry
    (segment, count); kind='doc'/'ts' rows carry (rank, doc_id/ts_us)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    req = {"name": "stumptown", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": lo,
                                   "largestTimestamp": hi},
                     "divideTimeRangeIntoNSegments": _STUMP_N,
                     "desiredNumberOfResultsPerWaveform": _STUMP_DESIRED,
                     "constraintsFilter": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "stumptownFilters": _role_filters()}}
    waves = execute_request(s, req)["answer"]["waveforms"]
    names, kinds, ks, vs = [], [], [], []
    for name in sorted(waves):
        w = waves[name]
        for i, c in enumerate(w["waveform"]):
            names.append(name), kinds.append("wave")
            ks.append(i), vs.append(int(c))
        for rank, r in enumerate(w["results"]):
            names.append(name), kinds.append("doc")
            ks.append(rank), vs.append(int(r["docId"]))
            names.append(name), kinds.append("ts")
            ks.append(rank), vs.append(int(r["timestamp"]))
    return pa.table({"filter_name": pa.array(names, pa.string()),
                     "kind": pa.array(kinds, pa.string()),
                     "k": pa.array(ks, pa.int64()),
                     "v": pa.array(vs, pa.int64())})


def request_stumptown_sql(term: str = "spark") -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    hi = lo + _ANALYTICS_HOURS * 3_600 * 1_000_000
    n = _STUMP_N
    roles = ", ".join(f"('{r}')" for r in _WAVE_ROLES)
    return f"""
{SQL_PROLOGUE},
hits AS (
  -- the gate TimeRange is INCLUSIVE [lo, hi] (buildTimeRangeMask); the
  -- waveform bucketing below re-clips to [lo, hi)
  SELECT d.role AS role, d.doc_id, epoch_us(d.ts) AS ts_us
  FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
  WHERE epoch_us(d.ts) >= {lo} AND epoch_us(d.ts) <= {hi}
    AND d.role IN (SELECT role FROM (VALUES {roles}) r(role))
),
wave AS (
  SELECT r.role, s.segment, coalesce(c.n, 0) AS v
  FROM (VALUES {roles}) r(role)
  CROSS JOIN (SELECT unnest(range(0, {n})) AS segment) s
  LEFT JOIN (SELECT role, ((ts_us - {lo}) * {n}) // ({hi} - {lo}) AS seg,
                    count(*) AS n
             FROM hits WHERE ts_us < {hi} GROUP BY 1, 2) c
    ON c.role = r.role AND c.seg = s.segment
),
newest AS (
  SELECT role, doc_id, ts_us,
         row_number() OVER (PARTITION BY role
                            ORDER BY ts_us DESC, doc_id DESC) - 1 AS rank
  FROM hits
)
SELECT filter_name, kind, k::BIGINT AS k, v::BIGINT AS v FROM (
  SELECT role AS filter_name, 'wave' AS kind, segment AS k, v FROM wave
  UNION ALL
  SELECT role, 'doc', rank, doc_id FROM newest
  WHERE rank < {_STUMP_DESIRED}
  UNION ALL
  SELECT role, 'ts', rank, ts_us FROM newest
  WHERE rank < {_STUMP_DESIRED})
ORDER BY filter_name, kind, k
""".strip()


_METRICS_N = 6


def q_request_metrics(sf_dir: str) -> pa.Table:
    """MetricsQuery through the JSON request surface
    (``MetricsQuery.java:17-41`` → ``MetricsAnswer``): per role filter
    over the first hour in 6 segments, the bit-sliced per-segment
    AVERAGE of turn_idx — reconstructed purely from the `bits` field's
    per-plane cardinalities (``Metrics.metricingAvg``; integer
    division).  The window is the CORPUS span (ts is 1 s per doc and
    roles cycle mod 4, so all 6 segments are non-empty per role at
    every sf and the oracle is a plain floor-division; the some-empty
    interpolation branch is pytest-covered instead)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = _cfg_searcher(sf_dir, METRICS_CFG)
    lo = _TS_BASE_US
    hi = lo + int(s.manifest["n_docs"]) * 1_000_000
    req = {"name": "metrics", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": lo,
                                   "largestTimestamp": hi},
                     "divideTimeRangeIntoNSegments": _METRICS_N,
                     "powerBitsFieldName": "bits",
                     "filters": _role_filters()}}
    rows = execute_request(s, req)["answer"]["waveforms"]
    names, segs, vals = [], [], []
    for r in rows:
        for i, v in enumerate(r["waveform"]):
            names.append(r["id"]), segs.append(i), vals.append(int(v))
    return pa.table({"filter_name": pa.array(names, pa.string()),
                     "segment": pa.array(segs, pa.int64()),
                     "avg_value": pa.array(vals, pa.int64())})


def request_metrics_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    n = _METRICS_N
    roles = ", ".join(f"('{r}')" for r in _WAVE_ROLES)
    return f"""
{SQL_PROLOGUE},
win AS (SELECT {lo}::BIGINT AS lo,
               {lo} + (SELECT count(*) FROM docs) * 1000000 AS hi),
hits AS (
  SELECT d.role AS role, d.turn_idx,
         ((epoch_us(d.ts) - w.lo) * {n}) // (w.hi - w.lo) AS segment
  FROM docs d CROSS JOIN win w
  WHERE epoch_us(d.ts) >= w.lo AND epoch_us(d.ts) < w.hi
)
SELECT r.role AS filter_name, s.segment::BIGINT AS segment,
       -- Σ 2^i·card(bit_i) == Σ value; // count == metricingAvg's
       -- integer division (every segment is non-empty here)
       coalesce(c.s // c.n, 0)::BIGINT AS avg_value
FROM (VALUES {roles}) r(role)
CROSS JOIN (SELECT unnest(range(0, {n})) AS segment) s
LEFT JOIN (SELECT role, segment, sum(turn_idx) AS s, count(*) AS n
           FROM hits GROUP BY 1, 2) c
  ON c.role = r.role AND c.segment = s.segment
ORDER BY 1, 2
""".strip()


def q_request_anomaly(sf_dir: str) -> pa.Table:
    """AnomalyQuery through the JSON request surface
    (``AnomalyQuery.java:18-48`` → ``AnomalyAnswer``): one base filter
    expanded over ``expansionField='role'`` with a trailing-``*``
    expansion (term-dictionary scan, ``AnomalyQuestion.java:150-170``),
    waveform keys ``name-value``; per key the bit-sliced per-segment
    SUM of turn_idx, sign-partitioned positive − negative
    (``Anomaly.sum`` with ``1L << i`` weights)."""
    from ..fixtures import _TS_BASE_US
    from ..query.request import execute_request
    s = _cfg_searcher(sf_dir, METRICS_CFG)
    lo = _TS_BASE_US
    hi = lo + int(s.manifest["n_docs"]) * 1_000_000
    req = {"name": "anomaly", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": lo,
                                   "largestTimestamp": hi},
                     "divideTimeRangeIntoNSegments": _METRICS_N,
                     "powerBitsFieldName": "bits",
                     "filters": {"turns": {
                         "operation": "and",
                         "fieldFilters": [{"fieldName": "role",
                                           "values": ["user", "assistant",
                                                      "system", "tool"]}]}},
                     "expansionField": "role",
                     "expansionValues": ["*"]}}
    waves = execute_request(s, req)["answer"]["waveforms"]
    keys, segs, vals = [], [], []
    for key in sorted(waves):
        for i, v in enumerate(waves[key]):
            keys.append(key), segs.append(i), vals.append(int(v))
    return pa.table({"key": pa.array(keys, pa.string()),
                     "segment": pa.array(segs, pa.int64()),
                     "sum_value": pa.array(vals, pa.int64())})


def request_anomaly_sql() -> str:
    from ..fixtures import _TS_BASE_US
    lo = _TS_BASE_US
    n = _METRICS_N
    return f"""
{SQL_PROLOGUE},
win AS (SELECT {lo}::BIGINT AS lo,
               {lo} + (SELECT count(*) FROM docs) * 1000000 AS hi),
hits AS (
  SELECT 'turns-' || d.role AS key, d.turn_idx,
         ((epoch_us(d.ts) - w.lo) * {n}) // (w.hi - w.lo) AS segment
  FROM docs d CROSS JOIN win w
  WHERE epoch_us(d.ts) >= w.lo AND epoch_us(d.ts) < w.hi
)
SELECT k.key, s.segment::BIGINT AS segment,
       coalesce(c.s, 0)::BIGINT AS sum_value
FROM (SELECT DISTINCT 'turns-' || role AS key FROM docs
      WHERE role <> '') k
CROSS JOIN (SELECT unnest(range(0, {n})) AS segment) s
LEFT JOIN (SELECT key, segment, sum(turn_idx) AS s
           FROM hits GROUP BY 1, 2) c
  ON c.key = k.key AND c.segment = s.segment
ORDER BY 1, 2
""".strip()


def q_bm25_wand(sf_dir: str, terms: list[str], k: int = 10) -> pa.Table:
    s = searcher_for(sf_dir)
    from ..query.filter import or_terms
    return s.topk(or_terms(terms), k, "bm25", use_wand=True)


def q_time(sf_dir: str, terms: list[str], k: int = 10) -> pa.Table:
    s = searcher_for(sf_dir)
    return s.topk(_ast(terms, "and"), k, "time")


def q_count_and(sf_dir: str, terms: list[str]) -> pa.Table:
    s = searcher_for(sf_dir)
    return pa.table({"n_matched": pa.array([s.count(_ast(terms, "and"))],
                                           type=pa.int64())})


def q_or_not_docs(sf_dir: str, a: str, b: str, c: str) -> pa.Table:
    from ..query.filter import Not, Or, Term
    s = searcher_for(sf_dir)
    ast = Not(Or((Term("text", a), Term("text", b))), (Term("text", c),))
    docs = s.match_docs(ast)
    return pa.table({"doc_id": pa.array(np.sort(docs))})


def q_parsed_count(sf_dir: str, qstr: str) -> pa.Table:
    """Count through the QUERY-STRING parser (not a hand-built AST) so
    the gate witnesses parser semantics end-to-end — added for the
    negated-group form '-(a b)' (Lucene MUST_NOT of a sub-clause),
    which previously parsed as a positive clause."""
    from ..query.parser import parse_query
    s = searcher_for(sf_dir)
    return pa.table({"n_matched": pa.array([s.count(parse_query(qstr))],
                                           type=pa.int64())})


def q_prefix_count(sf_dir: str, prefix: str) -> pa.Table:
    from ..query.filter import Prefix
    s = searcher_for(sf_dir)
    return pa.table({"n_matched": pa.array([s.count(Prefix("text", prefix))],
                                           type=pa.int64())})


def q_numeric_range_count(sf_dir: str, term: str, lo: int, hi: int) -> pa.Table:
    """Docs matching ``term`` AND ``turn_idx ∈ [lo, hi]`` — the numeric
    range evaluates as a lex-encoded term-dict range scan (reference:
    numeric prefix filters, ``MiruTermComposer.java:176-240``)."""
    from ..query.filter import And, NumericRange, Term
    s = searcher_for(sf_dir)
    ast = And((Term("text", term), NumericRange("turn_idx", lo, hi)))
    return pa.table({"n_matched": pa.array([s.count(ast)], type=pa.int64())})


def q_numeric_range_topk(sf_dir: str, terms: list, lo: int, hi: int,
                         k: int = 10) -> pa.Table:
    """BM25 top-k gated by a numeric range (constant-score gate: only the
    text terms rank, mirroring Lucene's constant-score numeric ranges)."""
    from ..query.filter import And, NumericRange, and_terms
    s = searcher_for(sf_dir)
    ast = And((and_terms(sorted(set(terms))),
               NumericRange("turn_idx", lo, hi)))
    return s.topk(ast, k, "bm25")


def q_siphon_route_counts(sf_dir: str) -> pa.Table:
    """Run the built-in role-routing siphon over the flagship index's WAL
    (the doc store) and report activities flushed per destination tenant —
    the typed ``MiruSiphonPlugin`` path end-to-end (contract + cursor +
    tenant-partitioned flush; ``AmzaSiphoner.java:111-180``).  The cursor
    makes re-asks a no-op: counts are read back from the flushed files."""
    import pyarrow.parquet as pq

    from ..index.siphon import RoleRouteSiphon, run_siphon, tenant_from_dirname
    idir = index_dir_for(sf_dir)
    out = os.path.join(os.path.dirname(idir), "siphon_role_route")
    run_siphon(idir, RoleRouteSiphon(), out)
    rows = []
    for d in os.listdir(out):
        if not d.startswith("tenant="):
            continue
        n = sum(pq.read_metadata(os.path.join(out, d, f)).num_rows
                for f in os.listdir(os.path.join(out, d))
                if f.endswith(".parquet"))
        rows.append((tenant_from_dirname(d), n))
    rows.sort()  # sort by DECODED tenant (oracle sorts the raw value)
    tenants = [t for t, _ in rows]
    counts = [n for _, n in rows]
    return pa.table({"tenant": pa.array(tenants, pa.string()),
                     "n_activities": pa.array(counts, pa.int64())})


AUTHZ_PRINCIPAL = ("grp3", "team5")  # deterministic test principal


def q_authz_count(sf_dir: str, term: str = "spark",
                  acls: tuple = AUTHZ_PRINCIPAL) -> pa.Table:
    """Docs matching ``term`` AND visible to the principal (ACL composite
    OR, ANDed into the answer — ``MiruAuthzIndex`` /
    ``FullTextCustomQuestion.java:106``)."""
    from ..query.filter import And, Authz, Term
    s = searcher_for(sf_dir)
    ast = And((Term("text", term), Authz(tuple(acls))))
    return pa.table({"n_matched": pa.array([s.count(ast)], type=pa.int64())})


def q_authz_topk(sf_dir: str, terms: list[str], k: int = 10,
                 acls: tuple = AUTHZ_PRINCIPAL) -> pa.Table:
    """BM25 top-k gated by the authz mask (scores unchanged — authz filters
    visibility, it never contributes scoring terms)."""
    from ..query.filter import And, Authz, Term
    s = searcher_for(sf_dir)
    ast = And(tuple(Term("text", t) for t in sorted(set(terms)))
              + (Authz(tuple(acls)),))
    return s.topk(ast, k, "bm25")


def authz_count_sql(term: str = "spark",
                    acls: tuple = AUTHZ_PRINCIPAL) -> str:
    lst = ", ".join(f"'{a}'" for a in acls)
    return f"""
{SQL_PROLOGUE}
SELECT count(*)::BIGINT AS n_matched
FROM docs d JOIN tf ON tf.doc_id = d.doc_id
WHERE tf.term = '{term}' AND list_has_any(d.acl, [{lst}])
""".strip()


def q_paired_latest(sf_dir: str, role: str = "user",
                    term: str = "spark") -> pa.Table:
    """pairedLatest: the newest doc (max ordinal) carrying BOTH a keyword
    term and a text term (reference: ``MiruIndexPairedLatest.java:31`` —
    per-(term, otherTerm) latest-doc structures; here answered from the
    postings intersection, with the single-term side served by the
    index-time last_doc column)."""
    from ..query.filter import And, Term
    s = searcher_for(sf_dir)
    docs = s.match_docs(And((Term("role", role), Term("text", term))))
    last = int(docs.max()) if len(docs) else -1
    return pa.table({"last_doc": pa.array([last], type=pa.int64())})


def paired_latest_sql(role: str = "user", term: str = "spark") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT COALESCE(max(d.doc_id), -1)::BIGINT AS last_doc
FROM docs d JOIN tf ON tf.doc_id = d.doc_id
WHERE tf.term = '{term}' AND d.role = '{role}'
""".strip()


def q_phrase_count(sf_dir: str, phrase: str = "spark merge") -> pa.Table:
    """Docs containing the exact token-adjacent phrase (Phrase node: AND
    candidates + stored-text verification)."""
    from ..query.parser import parse_query
    s = searcher_for(sf_dir)
    ast = parse_query(f'"{phrase}"')
    return pa.table({"n_matched": pa.array([s.count(ast)], type=pa.int64())})


#: bigram-demo config: text-only + phrase bigrams, unsharded (the bigram
#: index exists to serve phrases from postings alone)
BIGRAM_CFG = IndexConfig(docs_per_partition=4000, num_shards=1,
                         keyword_fields=(),
                         phrase_bigram_fields=("text",))


def q_phrase_bigram_count(sf_dir: str,
                          phrase: str = "spark merge") -> pa.Table:
    """Same phrase count answered from a PHRASE-BIGRAM index: the
    2-token phrase is a single `2g:` postings AND — no stored-text
    gather anywhere (the positions-free scale path).  Must equal
    ``fulltext_phrase_count``'s answer and the same SQL oracle."""
    from ..query.parser import parse_query
    s = _cfg_searcher(sf_dir, BIGRAM_CFG)
    ast = parse_query(f'"{phrase}"')
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


#: positional-demo config: within-doc token positions stored per posting
#: (delta-gap varints) — phrases of ANY length answered from the index
#: alone, the reference's Lucene-positions capability rebuilt natively
POSITIONAL_CFG = IndexConfig(docs_per_partition=4000, num_shards=1,
                             keyword_fields=(),
                             positional_fields=("text",))


def q_phrase_positional_count(sf_dir: str,
                              phrase: str = "stream table hash") -> pa.Table:
    """A THREE-token phrase count answered from a POSITIONAL index: AND
    the terms' postings, then intersect (doc, pos−i) keys across terms —
    exact adjacency for any phrase length with no stored-text gather
    (beyond what bigrams can certify).  Same SQL oracle family as
    ``fulltext_phrase_count``."""
    from ..query.parser import parse_query
    s = _cfg_searcher(sf_dir, POSITIONAL_CFG)
    ast = parse_query(f'"{phrase}"')
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def q_phrase_slop_count(sf_dir: str, a: str = "stream", b: str = "hash",
                        slop: int = 2) -> pa.Table:
    """Sloppy-phrase (ordered proximity) count from the POSITIONAL index:
    ``"a b"~N`` matches docs where `b` follows `a` within N extra
    positions — served by per-candidate greedy chains over the position
    runs, no stored-text gather (``LuceneBackedQueryParser`` sloppy
    phrases, reordering not licensed)."""
    from ..query.parser import parse_query
    s = _cfg_searcher(sf_dir, POSITIONAL_CFG)
    ast = parse_query(f'"{a} {b}"~{slop}')
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def phrase_slop_sql(a: str = "stream", b: str = "hash",
                    slop: int = 2) -> str:
    # ordinality via parallel unnest (DuckDB zips equal-length unnests);
    # EXISTS(b after a within slop) ⇔ the engine's ordered-near window
    return f"""
{SQL_PROLOGUE},
otok AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok,
         unnest(range(1, len(regexp_extract_all(lower(text),
                                                '[a-z0-9]+')) + 1)) AS ord
  FROM docs)
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT DISTINCT x.doc_id
  FROM otok x JOIN otok y ON y.doc_id = x.doc_id
   AND x.tok = '{a}' AND y.tok = '{b}'
   AND y.ord > x.ord AND y.ord - x.ord - 1 <= {slop})
""".strip()


def phrase_count_sql(phrase: str = "spark merge") -> str:
    # normalize the phrase through the SAME tokenization the engine
    # applies (lowercase [a-z0-9]+): a raw phrase with case/punctuation —
    # or LIKE metacharacters — would silently diverge from q_phrase_count
    import re
    norm = " ".join(re.findall(r"[a-z0-9]+", phrase.lower()))
    return f"""
{SQL_PROLOGUE}
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT doc_id,
         ' ' || array_to_string(regexp_extract_all(lower(text),
                                '[a-z0-9]+'), ' ') || ' ' AS ts
  FROM docs)
WHERE ts LIKE '% {norm} %'
""".strip()


def q_terms_latest(sf_dir: str, k: int = 20) -> pa.Table:
    """Per-term global (df, cf, first_doc, last_doc) from the segment term
    dicts — the index-time latest/first family (``MiruIndexLatest.java:25``,
    ``MiruIndexFirst.java``): newest/oldest doc per term WITHOUT a
    query-time groupby over postings."""
    idir = index_dir_for(sf_dir)
    from ray.data.aggregate import Max, Min, Sum
    segs = read_parquet_clean(
        os.path.join(idir, "segments"),
        columns=["term", "df", "cf", "first_doc", "last_doc"],
        file_extensions=["parquet"])
    agg = segs.groupby("term").aggregate(
        Sum("df", alias_name="df"), Sum("cf", alias_name="cf"),
        Min("first_doc", alias_name="first_doc"),
        Max("last_doc", alias_name="last_doc"))
    pdf = agg.to_pandas()
    pdf = pdf[~pdf["term"].str.contains(":")]
    pdf = pdf.sort_values(["cf", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(pdf.reset_index(drop=True))


def terms_latest_sql(k: int = 20) -> str:
    return f"""
{SQL_PROLOGUE}
SELECT t.term, f.df::BIGINT AS df, f.cf::BIGINT AS cf,
       min(t.doc_id) AS first_doc, max(t.doc_id) AS last_doc
FROM tf t JOIN df f USING (term)
GROUP BY t.term, f.df, f.cf
ORDER BY cf DESC, term ASC LIMIT {k}
""".strip()


def q_keyword_and_term(sf_dir: str, role: str, term: str) -> pa.Table:
    from ..query.filter import And, Term
    s = searcher_for(sf_dir)
    ast = And((Term("role", role), Term("text", term)))
    return pa.table({"n_matched": pa.array([s.count(ast)], type=pa.int64())})


def q_facet_counts(sf_dir: str, field: str = "role",
                   term: str = "spark") -> pa.Table:
    """Facet counts (the search-sidebar primitive): among docs whose text
    contains ``term``, the doc count per ``field`` keyword value —
    answered ENTIRELY from postings algebra (field-value postings ∧ term
    postings ∧ alive mask) with no docstore gather.  Values enumerate via
    the same capped prefix expansion wildcards use (cap overflow is a
    LOUD failure); all per-value counts ride ONE batched fan-out
    (:meth:`Searcher.facet_counts` → ``term_match_counts``), not one
    cluster round-trip per value."""
    from ..query.filter import Term
    s = searcher_for(sf_dir)
    facet = s.facet_counts(field, Term("text", term))
    vals = [v for v in sorted(facet) if facet[v]]
    return pa.table({"value": pa.array(vals, pa.string()),
                     "n_docs": pa.array([facet[v] for v in vals],
                                        pa.int64())})


def q_composite_facet(sf_dir: str, term: str = "spark") -> pa.Table:
    """Facet counts over the COMPOSITE (role, tool) field: among docs
    whose text contains ``term``, the doc count per composed
    ``role_tool`` value, decomposed back into its parts
    (``MiruTermComposer.compose/decompose:35-110``) — postings algebra
    only, the composite term space enumerated and counted through the
    same batched facet primitive as a keyword facet."""
    from ..query.composer import decompose_value
    from ..query.filter import Term
    s = searcher_for(sf_dir)
    facet = s.facet_counts("role_tool", Term("text", term))
    roles, tools, counts = [], [], []
    for v in sorted(facet):
        if facet[v]:
            p_role, p_tool = decompose_value(v)
            roles.append(p_role)
            tools.append(p_tool)
            counts.append(facet[v])
    return pa.table({"role": pa.array(roles, pa.string()),
                     "tool": pa.array(tools, pa.string()),
                     "n_docs": pa.array(counts, pa.int64())})


def composite_facet_sql(term: str = "spark") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT d.role AS role, d.tool AS tool,
       count(DISTINCT d.doc_id)::BIGINT AS n_docs
FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
WHERE d.role IS NOT NULL AND d.role <> ''
  AND d.tool IS NOT NULL AND d.tool <> ''
GROUP BY d.role, d.tool ORDER BY role, tool
""".strip()


def q_request_aggregate_counts_unread(sf_dir: str,
                                      term: str = "spark") -> pa.Table:
    """AggregateCounts with UNREAD DECORATION through the JSON request
    surface (``AggregateCounts.java:189-207,322-330``): per conv_id of
    docs whose text contains ``term`` — count, latest/oldest ts, and
    anyUnread / latestUnread / oldestUnread against a doc-level unread
    set (odd doc ids — deterministic, SQL-expressible, and makes the
    three flags genuinely independent)."""
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    n = int(s.manifest["n_docs"])
    s.set_stream_unread("unread-demo", np.arange(1, n, 2, dtype=np.int64))
    req = {"name": "aggregateCounts", "tenantId": "flagship",
           "query": {"streamId": "unread-demo",
                     "includeUnreadState": True,
                     "streamFilter": {
                         "operation": "or",
                         "fieldFilters": [{"fieldName": "text",
                                           "values": [term]}]},
                     "constraints": {"inbox": {
                         "aggregateCountAroundField": "conv_id",
                         "desiredNumberOfDistincts": 10 ** 6}}}}
    res = execute_request(s, req)["answer"]["constraints"]["inbox"][
        "results"]
    return pa.table({
        "conv_id": pa.array([r["distinctValue"] for r in res],
                            pa.string()),
        "n_docs": pa.array([r["count"] for r in res], pa.int64()),
        "latest_ts": pa.array([r["latestTimestamp"] for r in res],
                              pa.int64()),
        "oldest_ts": pa.array([r["oldestTimestamp"] for r in res],
                              pa.int64()),
        "any_unread": pa.array([int(r["anyUnread"]) for r in res],
                               pa.int64()),
        "latest_unread": pa.array([int(r["latestUnread"]) for r in res],
                                  pa.int64()),
        "oldest_unread": pa.array([int(r["oldestUnread"]) for r in res],
                                  pa.int64()),
    })


def request_aggregate_counts_unread_sql(term: str = "spark") -> str:
    return f"""
{SQL_PROLOGUE},
hits AS (
  SELECT d.conv_id, epoch_us(d.ts) AS ts_us, d.doc_id,
         (d.doc_id % 2 = 1) AS unread
  FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY ts_us DESC, doc_id DESC) AS rn_new,
         row_number() OVER (PARTITION BY conv_id
                            ORDER BY ts_us ASC, doc_id ASC) AS rn_old
  FROM hits
)
SELECT conv_id,
       count(*)::BIGINT AS n_docs,
       max(ts_us)::BIGINT AS latest_ts,
       min(ts_us)::BIGINT AS oldest_ts,
       max(CASE WHEN unread THEN 1 ELSE 0 END)::BIGINT AS any_unread,
       max(CASE WHEN unread AND rn_new = 1 THEN 1 ELSE 0 END)::BIGINT
           AS latest_unread,
       max(CASE WHEN unread AND rn_old = 1 THEN 1 ELSE 0 END)::BIGINT
           AS oldest_unread
FROM ranked GROUP BY conv_id
ORDER BY latest_ts DESC, conv_id ASC
""".strip()


def q_request_composite_filter(sf_dir: str) -> pa.Table:
    """Composite multi-part ``MiruValue`` through the JSON request
    surface: distinct ``conv_id`` values among docs matching the
    composite field with a PARTS-PREFIX value ``{"parts": ["user"]}``
    (every user turn that carries a tool) OR an exact two-part value
    ``{"parts": ["assistant", "tool_01"]}`` — the multi-part DTO form
    every reference request carries (``MiruValue.java``,
    ``MiruTermComposer.compose:35-63``)."""
    from ..query.request import execute_request
    s = searcher_for(sf_dir)
    req = {"name": "distincts", "tenantId": "flagship",
           "query": {"timeRange": {"smallestTimestamp": 0,
                                   "largestTimestamp": 2 ** 62},
                     "gatherDistinctsForField": "conv_id",
                     "constraintsFilter": {
                         "operation": "or",
                         "fieldFilters": [
                             {"fieldName": "role_tool",
                              "values": [{"parts": ["user"]},
                                         {"parts": ["assistant",
                                                    "tool_01"]}]}]}}}
    vals = execute_request(s, req)["answer"]["results"]
    return pa.table({"conv_id": pa.array(vals, pa.string())})


def request_composite_filter_sql() -> str:
    return f"""
{SQL_PROLOGUE}
SELECT DISTINCT conv_id FROM docs
WHERE (role = 'user' AND tool IS NOT NULL AND tool <> '')
   OR (role = 'assistant' AND tool = 'tool_01')
ORDER BY conv_id
""".strip()


def facet_sql(field: str = "role", term: str = "spark") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT d.{field} AS value, count(DISTINCT d.doc_id)::BIGINT AS n_docs
FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
GROUP BY d.{field} ORDER BY value
""".strip()


def _term_df(idir: str, pre=None, cols: tuple = ("df",)) -> "pd.DataFrame":
    """Vocabulary (term, Σcols) frame: one Ray pass over the segment term
    dicts with an optional worker-side pre-filter (pushed BEFORE the
    groupby so only candidate terms cross the shuffle), keyword
    ``field:value`` terms stripped.  An all-empty filtered stream loses
    its column names through ``to_pandas`` — normalized to a typed empty
    frame here, once, for every caller."""
    import pandas as pd

    from ray.data.aggregate import Sum
    segs = read_parquet_clean(os.path.join(idir, "segments"),
                                 columns=["term", *cols])
    if pre is not None:
        segs = segs.map_batches(pre, batch_format="pyarrow",
                                batch_size=65536)
    agg = segs.groupby("term").aggregate(
        *[Sum(c, alias_name=c) for c in cols]).to_pandas()
    if agg.empty:
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             **{c: pd.Series([], dtype="int64")
                                for c in cols}})
    agg = agg[~agg["term"].str.contains(":")]
    for c in cols:
        agg[c] = agg[c].astype("int64")
    return agg.reset_index(drop=True)


def pc_between_len(col, m: int):
    """Arrow mask: term length in [m−1, m+1] (tokens are [a-z0-9]+, so
    codepoint length == byte length)."""
    import pyarrow.compute as _pc
    ln = _pc.utf8_length(col)
    return _pc.and_(_pc.greater_equal(ln, max(m - 1, 1)),
                    _pc.less_equal(ln, m + 1))


def q_suggest(sf_dir: str, prefix: str = "s", k: int = 10) -> pa.Table:
    """Prefix suggestion / autocomplete: top-k completions of ``prefix``
    ranked by global document frequency — one Ray pass over the segment
    term dictionaries (prefix-pruned read), never the postings."""
    import pyarrow.compute as _pc
    agg = _term_df(index_dir_for(sf_dir),
                   pre=lambda t: t.filter(
                       _pc.starts_with(t["term"], prefix)))
    agg = agg.sort_values(["df", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(agg.reset_index(drop=True),
                                preserve_index=False)


def suggest_sql(prefix: str = "s", k: int = 10) -> str:
    return f"""
{SQL_PROLOGUE}
SELECT term, df::BIGINT AS df FROM df
WHERE term LIKE '{prefix}%'
ORDER BY df DESC, term ASC LIMIT {k}
""".strip()


#: per-tenant demo config — deliberately DIFFERENT from the flagship's
#: (text-only, unsharded, bigger partitions): the registry's whole point
#: is per-tenant config, and the lean index keeps the two tenant builds
#: cheaper than one flagship build
TENANT_CFG = IndexConfig(docs_per_partition=4000, num_shards=1,
                         keyword_fields=())


def tenant_registry_for(sf_dir: str, cfg: IndexConfig = TENANT_CFG):
    """Build (once, fingerprint-cached) a TWO-tenant registry over
    disjoint slices of the corpus: tenant 'even'/'odd' owns the
    conversations whose numeric suffix is even/odd.  Each tenant gets its
    OWN index directory + config entry in the catalog — the reference's
    tenant-scoped world (``AmzaClusterRegistry``; tenantId on every
    activity, ``MiruActivity.java:34-60``) reduced to its engine core:
    catalog + routing + per-tenant indexes that rebuild independently."""
    import shutil
    from concurrent.futures import ThreadPoolExecutor

    from ..index.build import _stabilize_concurrent_imports
    from ..index.tenants import TenantRegistry
    src = os.path.join(sf_dir, "documents.parquet")
    fp = input_fingerprint([src])[:16]
    root = os.path.join(CACHE_ROOT, f"tenants_{fp}_v1_{_cfg_tag(cfg)}")
    cached = _TENANT_REGISTRIES.get(root)
    if cached is not None:  # keep the per-tenant reader pools warm
        return cached
    reg = TenantRegistry(root)
    # source the tenant slices from the flagship's already-derived (and
    # fingerprint-cached) transcripts instead of re-deriving twice
    flagship_tdir = os.path.dirname(index_dir_for(sf_dir))
    flagship_tdir = os.path.join(flagship_tdir, "transcripts")

    def one_tenant(tenant: str, parity: int) -> None:
        tdir = os.path.join(root, tenant, "transcripts")
        idir = os.path.join(root, tenant, "index")
        if not os.path.exists(os.path.join(tdir, "_DONE")):
            if os.path.exists(tdir):
                shutil.rmtree(tdir)

            def pick(t: pa.Table, p=parity) -> pa.Table:
                num = pc.cast(pc.utf8_slice_codeunits(
                    t["conv_id"], 5, 99), pa.int64())
                return t.filter(pc.equal(
                    pc.bit_wise_and(num, pa.scalar(1, pa.int64())),
                    pa.scalar(p, pa.int64())))

            (read_parquet_clean(flagship_tdir,
                                file_extensions=["parquet"])
             .map_batches(pick, batch_format="pyarrow")
             .repartition(2).write_parquet(tdir))
            with open(os.path.join(tdir, "_DONE"), "w") as f:
                f.write("ok")
        build_index(tdir, idir, cfg)  # no-op when the manifest is current

    _stabilize_concurrent_imports()
    with ThreadPoolExecutor(2) as ex:  # tenant builds are independent —
        fs = [ex.submit(one_tenant, t, p)  # overlap their pipelines
              for t, p in (("even", 0), ("odd", 1))]
        for f in fs:
            f.result()
    for tenant in ("even", "odd"):
        idir = os.path.join(root, tenant, "index")
        if (tenant not in reg.tenants()
                or reg.index_dir(tenant) != os.path.abspath(idir)):
            reg.register(tenant, idir, cfg)
    _TENANT_REGISTRIES[root] = reg
    return reg


def q_tenant_route_counts(sf_dir: str, term: str = "spark") -> pa.Table:
    """Per-tenant term count answered by ROUTING: each tenant's count
    runs against that tenant's own index via the registry, never a
    shared one."""
    reg = tenant_registry_for(sf_dir)
    counts = reg.count_all(term)
    tenants = sorted(counts)
    return pa.table({"tenant": pa.array(tenants, pa.string()),
                     "n_matched": pa.array([counts[t] for t in tenants],
                                           pa.int64())})


def tenant_route_counts_sql(term: str = "spark") -> str:
    return f"""
{SQL_PROLOGUE},
tenants(tenant, parity) AS (VALUES ('even', 0), ('odd', 1)),
matched AS (
  SELECT CAST(substr(d.conv_id, 6) AS BIGINT) % 2 AS parity,
         count(*) AS n
  FROM docs d JOIN tf t ON t.doc_id = d.doc_id AND t.term = '{term}'
  GROUP BY 1)
SELECT tn.tenant, coalesce(m.n, 0)::BIGINT AS n_matched
FROM tenants tn LEFT JOIN matched m ON m.parity = tn.parity
ORDER BY tn.tenant
""".strip()


def q_fuzzy_count(sf_dir: str, word: str = "sparc",
                  max_edits: int = 1) -> pa.Table:
    """Fuzzy term count ``word~N`` (Lucene fuzzy via the reference's
    ``LuceneBackedQueryParser.java:48-53``): docs containing ANY
    vocabulary term within ``max_edits`` Levenshtein distance of
    ``word``.  Expansion happens per reader over the segment term dicts
    (vectorized DP, length-prefiltered); the registered query lifts the
    expansion cap so the oracle's uncapped ``levenshtein()`` predicate
    is the same set."""
    from ..query.filter import Fuzzy
    s = searcher_for(sf_dir)
    ast = Fuzzy("text", word, max_edits=max_edits, max_expansion=1 << 62)
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def fuzzy_count_sql(word: str = "sparc", max_edits: int = 1) -> str:
    return f"""
{SQL_PROLOGUE}
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched
FROM tf WHERE levenshtein(term, '{word}') <= {max_edits}
""".strip()


def q_wildcard_count(sf_dir: str, pattern: str = "s?ar*") -> pa.Table:
    """Infix-wildcard term count (Lucene ``WildcardQuery`` via the
    reference's Lucene-backed parser): docs containing ANY vocabulary
    term matching the pattern (``*`` any run, ``?`` one char).  The
    reader-side expansion bounds its term-dict scan by the literal
    prefix and matches survivors with one vectorized LIKE kernel; the
    registered query lifts the expansion cap so the oracle's uncapped
    ``LIKE`` predicate is the same set."""
    from ..query.filter import Wildcard
    s = searcher_for(sf_dir)
    ast = Wildcard("text", pattern, max_expansion=1 << 62)
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def wildcard_count_sql(pattern: str = "s?ar*") -> str:
    # only '*' and '?' are wildcards (Lucene); literal '%'/'_'/'\' in
    # the pattern must be escaped or the SQL side would treat them as
    # LIKE metacharacters while the engine treats them as literals
    like = (pattern.replace("\\", "\\\\").replace("%", "\\%")
            .replace("_", "\\_").replace("*", "%").replace("?", "_"))
    return f"""
{SQL_PROLOGUE}
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched
FROM tf WHERE term LIKE '{like}' ESCAPE '\\'
""".strip()


def q_regexp_count(sf_dir: str, pattern: str = "sp.rk|m.rge") -> pa.Table:
    """Anchored regexp term count (Lucene ``RegexpQuery``): docs with
    ANY vocabulary term fully matching the RE2 pattern.  Engine (Arrow)
    and oracle (DuckDB ``regexp_full_match``) both compile RE2 — same
    language, same anchoring, same answer by construction."""
    from ..query.filter import Regexp
    s = searcher_for(sf_dir)
    ast = Regexp("text", pattern, max_expansion=1 << 62)
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def regexp_count_sql(pattern: str = "sp.rk|m.rge") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched
FROM tf WHERE regexp_full_match(term, '{pattern}')
""".strip()


def q_min_should_count(sf_dir: str,
                       terms: tuple = ("spark", "merge", "dup"),
                       m: int = 2) -> pa.Table:
    """m-of-k boolean count (Lucene ``minimumNumberShouldMatch`` / ES
    ``minimum_should_match``): docs containing at least ``m`` of the
    ``k`` terms — evaluated as one vectorized per-doc match-count
    threshold over the children's bitmaps, the bitmap-algebra answer to
    the reference's Roaring AND/OR kernel composed m-of-k."""
    from ..query.filter import MinShould, Term
    # duplicate clauses count per-clause in the engine (Lucene's
    # should-clause semantics) but the SQL oracle dedups via
    # count(DISTINCT term) — the registered pair is only a pair for
    # distinct terms, so reject duplicates loudly
    assert len(set(terms)) == len(terms), "terms must be distinct"
    s = searcher_for(sf_dir)
    ast = MinShould(tuple(Term("text", t) for t in terms), m)
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def min_should_count_sql(terms: tuple = ("spark", "merge", "dup"),
                         m: int = 2) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
{SQL_PROLOGUE}
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT doc_id FROM tf WHERE term IN ({in_list})
  GROUP BY doc_id HAVING count(DISTINCT term) >= {m})
""".strip()


def q_exists_count(sf_dir: str, fld: str = "tool") -> pa.Table:
    """Field-exists count (Lucene ``field:*`` / ES ``exists`` query):
    docs holding ANY value for a keyword field.  The empty prefix
    expands the field's whole ``field:`` term-dict slice — exact
    because the build indexes a keyword term iff the value is non-null
    and non-empty (build.py keyword encode), the same predicate the
    oracle states directly."""
    from ..query.filter import Prefix
    s = searcher_for(sf_dir)
    ast = Prefix(fld, "", max_expansion=1 << 62)
    return pa.table({"n_matched": pa.array([s.count(ast)], pa.int64())})


def exists_count_sql(fld: str = "tool") -> str:
    return f"""
{SQL_PROLOGUE}
SELECT count(*)::BIGINT AS n_matched FROM docs
WHERE {fld} IS NOT NULL AND {fld} <> ''
""".strip()


def q_boosted_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Boosted BM25 top-k via the full parser path: ``spark^2 merge``
    doubles spark's per-doc contribution (Lucene boost syntax; the
    scorer multiplies term-at-a-time contributions, oracle = the same
    weighted sum in SQL)."""
    s = searcher_for(sf_dir)
    return s.topk("spark^2 merge", k, "bm25")


def q_spell_correct(sf_dir: str, word: str = "sparc",
                    k: int = 5) -> pa.Table:
    """"Did you mean": vocabulary terms within edit distance 1 of
    ``word``, ranked by global df — the spell-correction primitive.  The
    candidate set is VOCABULARY-bounded (one grouped pass over segment
    term dicts, then a length pre-filter); the distance-1 test is
    vectorized per candidate length class: common-prefix + common-suffix
    lengths cover substitution (p + s ≥ m−1, equal length) and
    insertion/deletion (p + s ≥ min length) without any per-string
    Python loop."""
    import pyarrow.compute as _pc
    w = np.frombuffer(word.encode(), np.uint8)
    m = len(w)
    # length pre-filter pushed into the Ray pass: only terms of length
    # m−1/m/m+1 can ever be distance-1 candidates
    agg = _term_df(index_dir_for(sf_dir),
                   pre=lambda t: t.filter(pc_between_len(t["term"], m)))

    def _pref_suf(cands: np.ndarray, width: int):
        M = np.zeros((len(cands), width), np.uint8)
        for i, t in enumerate(cands):          # vocabulary-bounded fill
            bt = t.encode()
            M[i, :len(bt)] = np.frombuffer(bt, np.uint8)
        lo = min(width, m)
        pref = np.cumprod(M[:, :lo] == w[None, :lo], axis=1).sum(axis=1)
        suf = np.cumprod(M[:, ::-1][:, :lo] == w[::-1][None, :lo],
                         axis=1).sum(axis=1)
        return pref, suf

    terms = agg["term"].to_numpy()
    lens = np.char.str_len(terms.astype(str))
    keep = np.zeros(len(terms), bool)
    dist = np.ones(len(terms), np.int64)
    for width, rule in ((m, "sub"), (m - 1, "del"), (m + 1, "ins")):
        if width <= 0:
            continue
        sel = np.flatnonzero(lens == width)
        if not len(sel):
            continue
        pref, suf = _pref_suf(terms[sel], width)
        if rule == "sub":
            ok = pref + suf >= m - 1
            dist[sel[ok & (pref >= m)]] = 0   # identical term
        else:
            ok = pref + suf >= min(width, m)
        keep[sel[ok]] = True
    out = agg[keep].copy()
    out["dist"] = dist[keep]
    out["df"] = out["df"].astype("int64")
    out = out.sort_values(["df", "term"],
                          ascending=[False, True]).head(k)
    return pa.Table.from_pandas(out[["term", "df", "dist"]]
                                .reset_index(drop=True),
                                preserve_index=False)


def spell_correct_sql(word: str = "sparc", k: int = 5) -> str:
    return f"""
{SQL_PROLOGUE}
SELECT term, df::BIGINT AS df,
       levenshtein(term, '{word}')::BIGINT AS dist
FROM df WHERE levenshtein(term, '{word}') <= 1
ORDER BY df DESC, term ASC LIMIT {k}
""".strip()


def q_more_like_this(sf_dir: str, doc_id: int = 0, n_terms: int = 5,
                     k: int = 10) -> pa.Table:
    """MoreLikeThis: top-k docs similar to ``doc_id`` — its most
    characteristic terms (ranked by the INTEGER-exact key
    (tf desc, df asc, term asc); a float tf·idf key could flip term
    selection on a 1-ulp ln() difference between engines) feed a BM25 OR
    query, self excluded.  One stored-field gather + one stats fan-out +
    one scored query — the reco-over-fulltext composition."""
    from collections import Counter

    from ..query.filter import or_terms
    from ..tokenize import py_tokenize
    s = searcher_for(sf_dir)
    txt = s.gather([doc_id], columns=("text",))["text"].to_pylist()[0]
    tf = Counter(py_tokenize(txt or ""))
    stats: dict[str, tuple[int, int]] = {}
    for res in s._fanout("term_stats", sorted(tf)):
        for t, (df, cf) in res.items():
            d0, c0 = stats.get(t, (0, 0))
            stats[t] = (d0 + df, c0 + cf)
    ranked = sorted(tf, key=lambda t: (-tf[t], stats.get(t, (0, 0))[0], t))
    terms = ranked[:n_terms]
    if not terms:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    res = s.topk(or_terms(terms), k + 1, "bm25").to_pandas()
    res = res[res["doc_id"] != doc_id].head(k).reset_index(drop=True)
    return pa.Table.from_pandas(res, preserve_index=False)


def more_like_this_sql(doc_id: int = 0, n_terms: int = 5, k: int = 10,
                       k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
{SQL_PROLOGUE},
src AS (
  SELECT t.term, t.tf, f.df FROM tf t JOIN df f USING (term)
  WHERE t.doc_id = {doc_id}),
q AS (SELECT term FROM src ORDER BY tf DESC, df ASC, term ASC
      LIMIT {n_terms}),
matched AS (SELECT tf.doc_id FROM tf JOIN q USING (term)
            GROUP BY tf.doc_id),
scores AS (
  SELECT m.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM matched m
  JOIN tf ON tf.doc_id = m.doc_id
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.doc_id
)
SELECT doc_id, round_even(score, 6) AS score
FROM scores WHERE doc_id <> {doc_id}
ORDER BY score DESC, doc_id DESC LIMIT {k}
""".strip()


def q_term_stats(sf_dir: str, k: int = 20) -> pa.Table:
    """Global per-term df/cf via a Ray pipeline over segment term dicts
    (the distributed analogue of ``getGlobalCardinality``,
    ``LabFieldIndex.java:474-476``)."""
    pdf = _term_df(index_dir_for(sf_dir), cols=("df", "cf"))
    pdf = pdf.sort_values(["cf", "term"], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(pdf.reset_index(drop=True))


def q_collection_stats(sf_dir: str) -> pa.Table:
    m = manifest_for(sf_dir)
    return pa.table({"n_docs": pa.array([m["n_docs"]], type=pa.int64()),
                     "total_len": pa.array([m["total_len"]], type=pa.int64()),
                     "avgdl": pa.array([round(m["avgdl"], 6)], type=pa.float64())})


def q_doc_lengths(sf_dir: str) -> pa.Table:
    """Per-doc token counts from the doclen sidecars (Σ of the per-shard
    encode partials); zero-token docs zero-filled from the doc-id list."""
    idir = index_dir_for(sf_dir)
    from ray.data.aggregate import Sum
    dl = (read_parquet_clean(os.path.join(idir, "doclen"),
                                file_extensions=["parquet"])
          .groupby("doc_id").aggregate(Sum("dl", alias_name="doc_len"))
          .to_pandas())
    ids = (read_parquet_clean(os.path.join(idir, "docstore"),
                                 columns=["doc_id"],
                                 file_extensions=["parquet"])
           .to_pandas())
    out = ids.merge(dl, on="doc_id", how="left")
    out["doc_len"] = out["doc_len"].fillna(0).astype("int64")
    out = out.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_highlight(sf_dir: str, terms: list[str], k: int = 5) -> pa.Table:
    """Top-k BM25 + best-fragment highlights (reference:
    ``LuceneBackedQueryParser.highlight``, LuceneBackedQueryParser.java:56-74)."""
    from ..query.highlight import highlight_rows
    s = searcher_for(sf_dir)
    res = s.topk(_ast(terms, "and"), k, "bm25")
    g = s.gather(res["doc_id"].to_pylist(), ["text"]).to_pandas()
    merged = res.to_pandas().merge(g, on="doc_id", how="left")
    merged["fragment"] = highlight_rows(merged["text"], terms)
    return pa.Table.from_pandas(
        merged[["doc_id", "score", "fragment"]], preserve_index=False)


def highlight_sql(terms: list[str], k: int = 5, width: int = 20,
                  k1: float = 1.2, b: float = 0.75) -> str:
    """SQL oracle for :func:`q_highlight`: BM25 top-k (AND) + the exact
    token-window fragment rebuilt with list_slice/list_transform."""
    tset = sorted(set(terms))
    qvals = ", ".join(f"('{t}')" for t in tset)
    inlist = ", ".join(f"'{t}'" for t in tset)
    return f"""
{SQL_PROLOGUE},
q(term) AS (VALUES {qvals}),
matched AS (
  SELECT tf.doc_id FROM tf JOIN q USING (term)
  GROUP BY tf.doc_id HAVING count(*) = {len(tset)}
),
scores AS (
  SELECT m.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * ({k1} + 1.0)
             / (tf.tf + {k1} * (1.0 - {b} + {b} * dl.dl / s.avgdl))) AS score
  FROM matched m
  JOIN tf ON tf.doc_id = m.doc_id
  JOIN q ON q.term = tf.term
  JOIN df ON df.term = tf.term
  JOIN dl ON dl.doc_id = m.doc_id
  CROSS JOIN stats s
  GROUP BY m.doc_id
),
topk AS (SELECT doc_id, score FROM scores
         ORDER BY score DESC, doc_id DESC LIMIT {k}),
tok AS (
  SELECT d.doc_id, regexp_extract_all(lower(d.text), '[a-z0-9]+') AS t
  FROM docs d JOIN topk USING (doc_id)),
pos AS (
  SELECT tok.doc_id, u.i, tok.t[u.i] AS tk
  FROM tok, unnest(generate_series(1, len(tok.t))) AS u(i)),
win AS (
  SELECT doc_id, i,
         sum(CASE WHEN tk IN ({inlist}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND {width - 1} FOLLOWING) AS c
  FROM pos),
best AS (
  SELECT doc_id, min(i) AS b FROM (
    SELECT doc_id, i, c, max(c) OVER (PARTITION BY doc_id) AS mx FROM win)
  WHERE c = mx GROUP BY doc_id),
frag AS (
  SELECT t.doc_id,
         array_to_string(list_transform(
           t.t[b.b : least(b.b + {width - 1}, len(t.t))],
           x -> CASE WHEN x IN ({inlist})
                     THEN '<b>' || x || '</b>' ELSE x END), ' ') AS fragment
  FROM tok t JOIN best b USING (doc_id))
SELECT tk.doc_id, round_even(tk.score, 6) AS score, f.fragment
FROM topk tk JOIN frag f USING (doc_id)
ORDER BY tk.score DESC, tk.doc_id DESC
""".strip()


def _ast(terms: list[str], mode: str):
    from ..query.filter import and_terms, or_terms
    return and_terms(sorted(set(terms))) if mode == "and" else or_terms(sorted(set(terms)))


# --------------------------------------------------------------------------
# versioned REPAIR / upsert over the flagship index (miru_ray.index.repair)
# --------------------------------------------------------------------------

#: deterministic repair spec: six turns re-delivered with version 1
#: (applied — stored version is 0), one delivered with version 0
#: (DECLINED, MiruIndexer.java:143).  Keys are (conv, turn) pairs that
#: exist at every sf: derived conv-%06d covers 0..96 and turn k exists
#: whenever documents doc_id = conv + 97·k is in range.
_REPAIR_APPLY = [(5, 0), (5, 1), (5, 2), (17, 0), (17, 1), (17, 2)]
_REPAIR_DECLINE = [(23, 0)]
_REPAIR_MARK = "zzyzxrepair"
_REPAIR_SPEC_V = 1


def _repair_text(conv: int, turn: int) -> str:
    return f"{_REPAIR_MARK} spark upserted c{conv} t{turn}"


def _repaired_index_for(sf_dir: str) -> str:
    """Copy the flagship index once per (input fingerprint, spec) and
    apply the deterministic repair batch to the COPY — the shared
    flagship index must never be mutated by a gate query."""
    import shutil

    from ..index.repair import repair_index
    from ..util import atomic_write_json
    idir = index_dir_for(sf_dir)
    rdir = os.path.join(os.path.dirname(idir), "repair_index")
    marker = os.path.join(rdir, "_REPAIRED.json")
    want = {"fingerprint":
            read_json(os.path.join(idir, "manifest.json"))["fingerprint"],
            "spec": _REPAIR_SPEC_V}
    if os.path.exists(marker) and read_json(marker) == want:
        return rdir
    shutil.rmtree(rdir, ignore_errors=True)
    shutil.copytree(idir, rdir)
    # original field values re-derived from the documents doc_id (the
    # derivation is a pure function — no docstore scan needed); the text
    # column carries the REPLACEMENT text
    spec = ([(c, k, 1) for c, k in _REPAIR_APPLY]
            + [(c, k, 0) for c, k in _REPAIR_DECLINE])
    from ..fixtures import N_CONVS_DERIVED
    rows = derive_transcripts_batch(pa.table({
        "doc_id": pa.array([c + N_CONVS_DERIVED * k for c, k, _v in spec],
                           pa.int64()),
        "text": pa.array([_repair_text(c, k) for c, k, _v in spec],
                         pa.string())}))
    rows = rows.append_column(
        "version", pa.array([v for _c, _k, v in spec], pa.int64()))
    repair_index(rdir, rows)
    atomic_write_json(marker, want)
    return rdir


def q_repair_upsert_counts(sf_dir: str) -> pa.Table:
    """REPAIR conformance: upsert six existing turns (higher version),
    decline one stale delivery, then recount the marker term, a probe
    term whose df the repair changed, and the corpus size (unchanged —
    upsert reuses ids, never appends)."""
    rdir = _repaired_index_for(sf_dir)
    key = (rdir, 2)
    s = _SEARCHERS.get(key)
    if s is None or not s.readers:
        s = Searcher(rdir, num_readers=2)
        _SEARCHERS[key] = s
    m = read_json(os.path.join(rdir, "manifest.json"))
    rep = m["repairs"][-1]
    return pa.table({
        "n_docs": pa.array([m["n_docs"]], pa.int64()),
        "n_marker": pa.array([s.count(_REPAIR_MARK)], pa.int64()),
        "n_probe": pa.array([s.count("spark")], pa.int64()),
        "n_applied": pa.array([rep["applied"]], pa.int64()),
        "n_skipped": pa.array([rep["skipped"]], pa.int64()),
    })


def repair_upsert_counts_sql() -> str:
    vals = ", ".join(
        f"('conv-{c:06d}', {k}, 1, '{_repair_text(c, k)}')"
        for c, k in _REPAIR_APPLY) + ", " + ", ".join(
        f"('conv-{c:06d}', {k}, 0, '{_repair_text(c, k)}')"
        for c, k in _REPAIR_DECLINE)
    return f"""
WITH transcripts AS ({DERIVE_SQL}),
repairs(conv_id, turn_idx, version, rtext) AS (VALUES {vals}),
eff AS (
  SELECT t.conv_id, t.turn_idx,
         CASE WHEN r.version > 0 THEN r.rtext ELSE t.text END AS text
  FROM transcripts t LEFT JOIN repairs r
    ON r.conv_id = t.conv_id AND r.turn_idx = t.turn_idx),
toks AS (
  SELECT conv_id || '|' || turn_idx AS doc_key,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM eff)
SELECT (SELECT count(*) FROM eff)::BIGINT AS n_docs,
       (SELECT count(DISTINCT doc_key) FROM toks
        WHERE term = '{_REPAIR_MARK}')::BIGINT AS n_marker,
       (SELECT count(DISTINCT doc_key) FROM toks
        WHERE term = 'spark')::BIGINT AS n_probe,
       (SELECT count(*) FROM repairs WHERE version > 0)::BIGINT AS n_applied,
       (SELECT count(*) FROM repairs WHERE version <= 0)::BIGINT AS n_skipped
""".strip()
