"""Plugin registry — the engine's operator-contribution contract.

Reference analogue: a Miru plugin supplies an endpoint + injectable +
remote-partition triple discovered by classpath scan
(``miru-plugin/.../plugin/MiruPlugin.java:11-18``,
``MiruReaderMain.java:661-664``), and each query family implements the
Question / AnswerMerger / AnswerEvaluator contract
(``miru-plugin/.../solution/Question.java``, ``MiruAnswerMerger.java``).

Here an operator registers a named :class:`Op`:

- ``query_fn(sf_dir) -> Table | DataFrame | Dataset`` — the ask-and-merge
  path (per-partition work + driver merge live inside the callable, which
  composes the engine surface: Searcher fan-out, Dataset pipelines, ...).
- ``oracle_sql`` — the conformance oracle (ANSI SQL over the testdata
  views); ``None`` marks a legitimately non-SQL-expressible op (approx
  sketches, recall reports, stubs) that gets a rows-only check.

``__ray_entry__.queries()`` / ``oracle_sql()`` are THIN views over this
registry: contributing a new operator end-to-end is one ``register_op``
call from any imported module — no driver-contract edits (see
``tests/test_plugins.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class Op:
    name: str
    query_fn: Callable[[str], Any]
    oracle_sql: str | None = None
    tags: tuple = field(default_factory=tuple)


_REGISTRY: dict[str, Op] = {}
_BUILTIN_LOADED = False

# The graft driver's correctness gate samples a PREFIX of the registry in
# registration order (50 of N).  Queries listed here are moved to the FRONT
# after builtin load so the ops that have never had a driver CORRECTNESS
# row — plus this round's new ops — get witnessed first; everything else
# keeps its relative order and rotates through the remaining slots.
_GATE_PRIORITY: tuple[str, ...] = (
    # 1) the round-4 breakage (VERDICT r4 ask #1): the md5_128 import slip
    #    FAILED these in CORRECTNESS_r04 — they must be re-witnessed green
    "pretrain_corpus_counts",
    "curation_neardup_summary",
    "curation_summary",
    # 2) round-5 additions (never driver-witnessed by definition) —
    #    KEEP NEW OPS HERE as they are registered
    "request_aggregate_counts_unread",
    "fulltext_composite_facet",
    "request_composite_filter",
    "repair_upsert_counts",
    "terms_heavy_hitters",
    "fulltext_negated_group_count",
    # 3) stalest witnesses first (VERDICT r4 ask #4): last green in r01/r02
    #    on code that has changed since
    "events_uniques_hll",                       # r01
    "dedup_simhash_pairs", "embedding_neardup_pairs",       # ↓ r02
    "ann_bruteforce_topk", "ann_lsh_recall",
    "text_token_count_by_source", "text_bpe_token_estimate",
    "text_quality_by_lang", "text_langid", "text_fingerprints",
    "rel_pricing_summary", "rel_revenue_by_nation",
    "rel_collaborative_filtering",
    "media_decode_dims", "media_frame_sample_counts",
    "media_pipeline_features",
    "catwalk_model", "strut_topk_users",
    # 4) r03 witnesses, oldest first — fills the remaining gate slots
    "fulltext_bm25_wand", "fulltext_reftfidf_and", "fulltext_time_top10",
    "fulltext_and_count", "fulltext_or_not_docs", "fulltext_prefix_count",
    "fulltext_numeric_range_count", "fulltext_numeric_range_topk",
    "siphon_route_counts", "keyword_and_term_count",
    "fulltext_phrase_count", "fulltext_facet_role", "fulltext_suggest",
    "fulltext_more_like_this", "fulltext_spell_correct",
    "fulltext_authz_count", "fulltext_authz_topk", "term_stats_top20",
    "terms_latest_top20", "fulltext_paired_latest", "collection_stats",
    "doc_lengths", "fulltext_highlight", "events_distincts",
    "events_uniques", "events_aggregate_counts", "events_waveform",
    "events_metrics", "events_anomaly", "events_trending",
    "events_trending_peaks", "events_stumptown", "events_inbox_lookup",
    "events_unread_counts", "events_sessions", "events_rolling_counts",
    "events_value_quantiles", "events_group_quantiles",
    "events_asof_purchase_click", "events_window_join", "events_funnel",
    "events_retention", "dedup_exact_docs", "dedup_exact_count",
    "dedup_incremental_counts", "dedup_ngram_jaccard_pairs",
    "dedup_substring_spans", "dedup_minhash_clusters",
)


def register_op(name: str, query_fn: Callable[[str], Any],
                oracle_sql: str | None = None,
                tags: tuple = ()) -> Callable[[str], Any]:
    """Register an operator under ``name``.  Returns ``query_fn`` so it can
    be used as a decorator-style one-liner.  Re-registering an existing
    name raises — names are the public contract surface."""
    if name in _REGISTRY:
        raise ValueError(f"operator {name!r} already registered")
    _REGISTRY[name] = Op(name, query_fn, oracle_sql, tuple(tags))
    return query_fn


def unregister_op(name: str) -> None:
    _REGISTRY.pop(name, None)


def registered_ops() -> dict[str, Op]:
    load_builtin()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[str], Any]]:
    return {n: op.query_fn for n, op in registered_ops().items()}


def oracle_sql() -> dict[str, str]:
    return {n: op.oracle_sql for n, op in registered_ops().items()
            if op.oracle_sql is not None}


def load_builtin() -> None:
    """Register every built-in operator family (idempotent; a failure
    mid-registration leaves the flag unset and the partial registrations
    rolled back, so the next call retries instead of silently serving a
    truncated surface)."""
    global _BUILTIN_LOADED
    if _BUILTIN_LOADED:
        return
    before = set(_REGISTRY)
    try:
        _load_builtin_ops()
    except BaseException:
        for name in set(_REGISTRY) - before:
            del _REGISTRY[name]
        raise
    # front-load the gate-priority queries (driver samples a registry
    # prefix); unknown names in the priority list are skipped, the rest
    # keep registration order
    ordered = {n: _REGISTRY[n] for n in _GATE_PRIORITY if n in _REGISTRY}
    ordered.update({n: op for n, op in _REGISTRY.items()
                    if n not in ordered})
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _BUILTIN_LOADED = True


def _load_builtin_ops() -> None:
    from .ops import analytics as A
    from .ops import dedup as D
    from .ops import similarity as Sim
    from .ops import textstats as T
    from .ops.sketches import approx_unique
    from .pipelines import catwalk as C
    from .pipelines import flagship as F
    from .pipelines import relational as R
    from .stages import multimodal as M

    QUERY_TERMS = ["spark", "merge"]       # hot terms of the documents vocab
    OR_TERMS = ["spark", "merge", "dup"]   # includes the rare term 'dup'

    def reg(name, fn, sql=None, tags=()):
        register_op(name, fn, sql, tags)

    P = F.SQL_PROLOGUE
    # ---- full-text index + scoring (SURVEY.md §2.12, §2.7) ----
    reg("fulltext_bm25_and", lambda sf: F.q_bm25(sf, QUERY_TERMS, 10, "and"),
        F.bm25_sql(QUERY_TERMS, 10, mode="and"), ("fulltext",))
    reg("fulltext_bm25_or", lambda sf: F.q_bm25(sf, OR_TERMS, 10, "or"),
        F.bm25_sql(OR_TERMS, 10, mode="or"), ("fulltext",))
    reg("fulltext_bm25_wand", lambda sf: F.q_bm25_wand(sf, OR_TERMS, 10),
        F.bm25_sql(OR_TERMS, 10, mode="or"), ("fulltext",))
    # the JSON request surface end-to-end (MiruRequest/FullTextQuery →
    # MiruResponse): parse + non-scoring constraintsFilter + BM25
    reg("fulltext_request_topk",
        lambda sf: F.q_request_topk(sf, QUERY_TERMS, "user", 10),
        F.bm25_sql(QUERY_TERMS, 10, mode="and", keyword=("role", "user")),
        ("fulltext",))
    # the other two stream-plugin request endpoints, dispatched by query
    # shape (DistinctCountQuery / AggregateCountsQuery → their answers)
    reg("request_distinct_count", F.q_request_distinct_count,
        F.request_distinct_count_sql(), ("request",))
    reg("request_aggregate_counts", F.q_request_aggregate_counts,
        F.request_aggregate_counts_sql(), ("request",))
    reg("request_analytics_waveform", F.q_request_analytics,
        F.request_analytics_sql(), ("request",))
    reg("request_trending_topn", F.q_request_trending,
        F.request_trending_sql(), ("request",))
    reg("request_reco_tools", F.q_request_reco,
        F.request_reco_sql(), ("request",))
    reg("request_uniques_count", F.q_request_uniques,
        F.request_uniques_sql(), ("request",))
    reg("request_distincts_values", F.q_request_distincts,
        F.request_distincts_sql(), ("request",))
    reg("request_aggregate_counts_unread",
        F.q_request_aggregate_counts_unread,
        F.request_aggregate_counts_unread_sql(), ("request", "unread"))
    reg("fulltext_composite_facet", F.q_composite_facet,
        F.composite_facet_sql(), ("fulltext", "composite"))
    reg("request_composite_filter", F.q_request_composite_filter,
        F.request_composite_filter_sql(), ("request", "composite"))
    reg("repair_upsert_counts", F.q_repair_upsert_counts,
        F.repair_upsert_counts_sql(), ("index", "repair"))
    reg("request_catwalk_model", F.q_request_catwalk,
        F.request_catwalk_sql(), ("request",))
    reg("request_strut_topn", F.q_request_strut,
        F.request_strut_sql(), ("request",))
    reg("request_catwalk_combo", F.q_request_catwalk_combo,
        F.request_catwalk_combo_sql(), ("request",))
    reg("request_stumptown_topn", F.q_request_stumptown,
        F.request_stumptown_sql(), ("request",))
    reg("request_metrics_avg", F.q_request_metrics,
        F.request_metrics_sql(), ("request",))
    reg("request_anomaly_sum", F.q_request_anomaly,
        F.request_anomaly_sql(), ("request",))
    reg("fulltext_reftfidf_and",
        lambda sf: F.q_ref_tfidf(sf, QUERY_TERMS, 10, "and"),
        F.ref_tfidf_sql(QUERY_TERMS, 10, mode="and"), ("fulltext",))
    reg("fulltext_time_top10", lambda sf: F.q_time(sf, QUERY_TERMS, 10), f"""
{P}
SELECT d.doc_id, d.ts FROM docs d
JOIN tf a ON a.doc_id = d.doc_id AND a.term = 'merge'
JOIN tf b ON b.doc_id = d.doc_id AND b.term = 'spark'
ORDER BY d.ts DESC, d.doc_id DESC LIMIT 10
""".strip(), ("fulltext",))
    # ---- filter AST (§2.3) ----
    reg("fulltext_and_count", lambda sf: F.q_count_and(sf, QUERY_TERMS), f"""
{P}
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT doc_id FROM tf WHERE term IN ('merge', 'spark')
  GROUP BY doc_id HAVING count(*) = 2)
""".strip(), ("filter",))
    reg("fulltext_or_not_docs",
        lambda sf: F.q_or_not_docs(sf, "spark", "merge", "dup"), f"""
{P}
SELECT DISTINCT doc_id FROM tf
WHERE term IN ('spark', 'merge')
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'dup')
ORDER BY doc_id
""".strip(), ("filter",))
    reg("fulltext_negated_group_count",
        lambda sf: F.q_parsed_count(sf, "spark -(merge dup)"), f"""
{P}
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT doc_id FROM tf WHERE term = 'spark'
  EXCEPT
  SELECT doc_id FROM (
    SELECT doc_id FROM tf WHERE term IN ('merge', 'dup')
    GROUP BY doc_id HAVING count(DISTINCT term) = 2))
""".strip(), ("filter", "parser"))
    reg("fulltext_prefix_count", lambda sf: F.q_prefix_count(sf, "s"), f"""
{P}
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched FROM tf
WHERE term LIKE 's%'
""".strip(), ("filter",))
    # ---- numeric-range term encoding (§2.9, MiruTermComposer numeric) ----
    reg("fulltext_numeric_range_count",
        lambda sf: F.q_numeric_range_count(sf, "spark", 2, 5), f"""
{P}
SELECT count(*)::BIGINT AS n_matched
FROM docs d JOIN (SELECT DISTINCT doc_id FROM tf WHERE term = 'spark') m
  ON m.doc_id = d.doc_id
WHERE d.turn_idx BETWEEN 2 AND 5
""".strip(), ("filter",))
    reg("fulltext_numeric_range_topk",
        lambda sf: F.q_numeric_range_topk(sf, QUERY_TERMS, 1, 6, 10),
        F.bm25_sql(QUERY_TERMS, 10, mode="and",
                   num_range=("turn_idx", 1, 6)), ("fulltext",))
    # ---- typed siphon contract (§2.1, MiruSiphonPlugin) ----
    reg("siphon_route_counts", F.q_siphon_route_counts, f"""
{P}
SELECT role AS tenant, count(*)::BIGINT AS n_activities
FROM docs GROUP BY role ORDER BY tenant
""".strip(), ("siphon",))
    reg("keyword_and_term_count",
        lambda sf: F.q_keyword_and_term(sf, "user", "spark"), f"""
{P}
SELECT count(*)::BIGINT AS n_matched
FROM docs d JOIN tf ON tf.doc_id = d.doc_id
WHERE tf.term = 'spark' AND d.role = 'user'
""".strip(), ("filter",))
    reg("fulltext_phrase_bigram_count", F.q_phrase_bigram_count,
        F.phrase_count_sql(), ("fulltext", "bigram"))
    reg("fulltext_phrase_positional_count", F.q_phrase_positional_count,
        F.phrase_count_sql("stream table hash"), ("fulltext", "positional"))
    reg("fulltext_phrase_slop_count", F.q_phrase_slop_count,
        F.phrase_slop_sql(), ("fulltext", "positional"))
    reg("fulltext_phrase_count", F.q_phrase_count, F.phrase_count_sql(),
        ("fulltext",))
    reg("fulltext_facet_role", F.q_facet_counts, F.facet_sql(),
        ("fulltext",))
    reg("fulltext_suggest", F.q_suggest, F.suggest_sql(), ("fulltext",))
    reg("fulltext_more_like_this", F.q_more_like_this,
        F.more_like_this_sql(), ("fulltext",))
    reg("fulltext_fuzzy_count", F.q_fuzzy_count, F.fuzzy_count_sql(),
        ("fulltext", "fuzzy"))
    reg("fulltext_wildcard_count", F.q_wildcard_count,
        F.wildcard_count_sql(), ("fulltext", "wildcard"))
    reg("fulltext_regexp_count", F.q_regexp_count,
        F.regexp_count_sql(), ("fulltext", "regexp"))
    reg("fulltext_min_should_count", F.q_min_should_count,
        F.min_should_count_sql(), ("fulltext", "boolean"))
    reg("fulltext_exists_count", F.q_exists_count,
        F.exists_count_sql(), ("fulltext", "exists"))
    reg("tenant_route_counts", F.q_tenant_route_counts,
        F.tenant_route_counts_sql(), ("tenant",))
    reg("fulltext_boosted_topk", F.q_boosted_topk,
        F.bm25_sql(["spark", "merge"], 10, mode="and",
                   boosts={"spark": 2.0}), ("fulltext", "boost"))
    reg("fulltext_spell_correct", F.q_spell_correct,
        F.spell_correct_sql(), ("fulltext",))
    # ---- authz / ACL composite filter (§2.3, MiruAuthzIndex) ----
    reg("fulltext_authz_count", F.q_authz_count, F.authz_count_sql(),
        ("authz",))
    reg("fulltext_authz_topk", lambda sf: F.q_authz_topk(sf, QUERY_TERMS, 10),
        F.bm25_sql(QUERY_TERMS, 10, mode="and", authz=F.AUTHZ_PRINCIPAL),
        ("authz",))
    # ---- index-side stats (§2.6 global tf/df + latest/first family) ----
    reg("term_stats_top20", lambda sf: F.q_term_stats(sf, 20), f"""
{P}
SELECT term, df::BIGINT AS df, cf::BIGINT AS cf FROM df
ORDER BY cf DESC, term ASC LIMIT 20
""".strip(), ("stats",))
    reg("terms_latest_top20", lambda sf: F.q_terms_latest(sf, 20),
        F.terms_latest_sql(20), ("stats",))
    reg("fulltext_paired_latest",
        lambda sf: F.q_paired_latest(sf, "tool", "dup"),
        F.paired_latest_sql("tool", "dup"), ("stats",))
    reg("collection_stats", F.q_collection_stats, f"""
{P}
SELECT n::BIGINT AS n_docs,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_len,
       round_even(avgdl, 6) AS avgdl
FROM stats
""".strip(), ("stats",))
    reg("doc_lengths", F.q_doc_lengths, f"""
{P}
SELECT doc_id, dl::BIGINT AS doc_len FROM dl ORDER BY doc_id
""".strip(), ("stats",))
    reg("fulltext_highlight", lambda sf: F.q_highlight(sf, QUERY_TERMS, 5),
        F.highlight_sql(QUERY_TERMS, 5), ("fulltext",))

    # ---- analytics family (§2.6) over events ----
    for name, fn in (("events_distincts", A.distincts),
                     ("events_uniques", A.uniques),
                     ("events_aggregate_counts", A.aggregate_counts),
                     ("events_waveform", A.waveform),
                     ("events_metrics", A.metrics),
                     ("events_anomaly", A.anomaly),
                     ("events_trending", A.trending),
                     ("events_trending_peaks", A.trending_peaks),
                     ("events_stumptown", A.stumptown),
                     ("events_inbox_lookup", A.inbox_lookup),
                     ("events_unread_counts", A.unread_counts),
                     ("events_unread_backfill", A.unread_backfill),
                     ("events_sessions", A.sessions),
                     ("events_rolling_counts", A.rolling_counts),
                     ("events_value_quantiles", A.value_quantiles),
                     ("events_group_quantiles", A.group_value_quantiles),
                     ("events_asof_purchase_click", A.asof_join),
                     ("events_window_join", A.window_join),
                     ("events_funnel", A.funnel_counts),
                     ("events_retention", A.retention_cohorts)):
        reg(name, fn, A.SQL.get(name), ("analytics",))
    from .ops import bitslice as BS
    reg("metrics_bitslice_sum", BS.metrics_bitslice_sum,
        BS.SQL.get("metrics_bitslice_sum"), ("analytics", "metrics"))
    from .index import logappender as LA
    reg("stumptown_appender_counts", LA.stumptown_appender_counts,
        LA.SQL.get("stumptown_appender_counts"), ("analytics", "ingest"))
    # ---- dedup family (§2.8 + training-data ops) ----
    for name, fn in (("dedup_exact_docs", D.exact_dedup),
                     ("dedup_exact_count", D.exact_dedup_count),
                     ("dedup_incremental_counts", D.incremental_dedup_counts),
                     ("dedup_ngram_jaccard_pairs", D.ngram_jaccard_pairs),
                     ("dedup_substring_spans", D.substring_spans),
                     ("dedup_minhash_clusters", D.minhash_dedup),
                     ("dedup_simhash_pairs", D.simhash_pairs),
                     ("embedding_neardup_pairs", D.embedding_neardup_pairs)):
        reg(name, fn, D.SQL.get(name), ("dedup",))
    reg("embedding_neardup_lsh_recall", D.embedding_neardup_lsh_report,
        None, ("dedup", "approx"))
    # ---- similarity search ----
    reg("ann_bruteforce_topk", Sim.ann_bruteforce_topk,
        Sim.SQL.get("ann_bruteforce_topk"), ("similarity",))
    reg("ann_lsh_recall", Sim.ann_lsh_topk, None, ("similarity", "approx"))
    reg("ann_ivf_topk", Sim.ann_ivf_topk,
        Sim.SQL.get("ann_ivf_topk"), ("similarity",))
    from .ops import cluster as Cl
    reg("embed_kmeans_assign", Cl.kmeans_assign,
        Cl.SQL.get("embed_kmeans_assign"), ("similarity", "cluster"))
    reg("embed_semdedup_counts", Cl.semdedup_counts,
        Cl.SQL.get("embed_semdedup_counts"), ("similarity", "dedup"))
    reg("embed_cluster_sample", Cl.cluster_sample,
        Cl.SQL.get("embed_cluster_sample"), ("similarity", "mixing"))
    # ---- text analysis ----
    for name, fn in (("text_token_count_by_source", T.token_count_by_source),
                     ("text_bpe_token_estimate", T.bpe_token_estimate),
                     ("text_quality_by_lang", T.quality_by_lang),
                     ("text_top_quality_per_lang", T.top_quality_per_lang),
                     ("text_langid", T.langid),
                     ("text_bpe_merges", T.bpe_merges),
                     ("text_fingerprints", T.fingerprints),
                     ("text_pii_scan", T.pii_scan),
                     ("text_repetition_stats", T.repetition_stats),
                     ("text_decontaminate", T.decontaminate),
                     ("text_rarity_topk", T.rarity_topk)):
        reg(name, fn, T.SQL.get(name), ("textstats",))
    # ---- graph analytics (bipartite PageRank over order history) ----
    from .ops import graph as G
    reg("graph_pagerank_top", G.pagerank_top,
        G.SQL.get("graph_pagerank_top"), ("graph",))
    reg("graph_components_top", G.components_top,
        G.SQL.get("graph_components_top"), ("graph",))
    # ---- deterministic mixture sampling (training-data mixing) ----
    from .ops import mixing as Mx
    reg("mix_sample_counts", Mx.mixture_sample,
        Mx.SQL.get("mix_sample_counts"), ("mixing",))
    reg("mix_token_budget", Mx.token_budget_sample,
        Mx.SQL.get("mix_token_budget"), ("mixing",))
    reg("mix_pack_sequences", Mx.pack_sequences,
        Mx.SQL.get("mix_pack_sequences"), ("mixing",))
    reg("mix_split_counts", Mx.split_counts,
        Mx.SQL.get("mix_split_counts"), ("mixing",))
    # ---- relational / reco (§2.5, §2.6) ----
    for name, fn in (("rel_pricing_summary", R.pricing_summary),
                     ("rel_revenue_by_nation", R.revenue_by_nation),
                     ("rel_bigjoin_top_customers", R.bigjoin_top_customers),
                     ("rel_collaborative_filtering",
                      R.collaborative_filtering)):
        reg(name, fn, R.SQL.get(name), ("relational",))
    # ---- multimodal binary columns (stubbed codecs, real plumbing) ----
    for name, fn in (("media_decode_dims", M.media_decode_dims),
                     ("media_frame_sample_counts",
                      M.media_frame_sample_counts),
                     ("media_pipeline_features", M.media_pipeline_features)):
        reg(name, fn, M.SQL.get(name), ("multimodal",))
    # ---- end-to-end curation (dedup ∧ quality ∧ token accounting) ----
    from .pipelines import curate as Cu
    reg("curation_summary", Cu.curation_summary,
        Cu.SQL.get("curation_summary"), ("curation",))
    reg("curation_neardup_summary", Cu.curation_neardup_summary,
        Cu.SQL.get("curation_neardup_summary"), ("curation",))
    reg("pretrain_corpus_counts", Cu.pretrain_corpus_counts,
        Cu.SQL.get("pretrain_corpus_counts"), ("curation",))
    # ---- catwalk model build + strut scoring (§2.5) ----
    reg("catwalk_model", C.catwalk_model, C.SQL.get("catwalk_model"),
        ("catwalk",))
    reg("catwalk_model_incremental", C.catwalk_model_incremental,
        C.SQL.get("catwalk_model_incremental"), ("catwalk",))
    reg("strut_topk_users", C.strut_topk, C.SQL.get("strut_topk_users"),
        ("catwalk",))
    # ---- sketches ----
    # "approximate" but DETERMINISTIC given the md5 hash, so fully oracled
    from .ops.sketches import hll_oracle_sql
    reg("events_uniques_hll",
        lambda sf: approx_unique(sf, "events", "user_id"),
        hll_oracle_sql("events", "user_id"), ("sketches", "approx"))
    # exact heavy hitters via a two-pass Misra–Gries candidate filter —
    # no full-term shuffle, O(k) driver state, exact verified counts
    from .ops.sketches import heavy_hitters, heavy_hitters_sql
    reg("terms_heavy_hitters", heavy_hitters, heavy_hitters_sql(),
        ("sketches", "text"))
