"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing here
calls ``ray.init`` / ``ray.shutdown``.

The flagship surface is the Ray-Data-native inverted-index + BM25 engine
(``miru_ray``): the transcripts input (BASELINE.json input_hint shape) is
derived deterministically from the ``documents`` testdata table with an
exactly-equivalent SQL mapping, so every index/query pipeline here has a
DuckDB oracle over the pre-registered views.  See SURVEY.md §2 for the
operator inventory each entry maps to.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERY_TERMS = ["spark", "merge"]          # hot terms of the documents vocab
OR_TERMS = ["spark", "merge", "dup"]      # includes the rare term 'dup'


def entry() -> Any:
    """Flagship pipeline on sf0.001: derive transcripts → build inverted
    index (map_batches tokenize → salted groupby(term-shard) → segment
    encode) → BM25 top-10 with gathered display columns."""
    from miru_ray.pipelines import flagship as F
    sf = "/root/testdata/sf0.001"
    res = F.q_bm25(sf, QUERY_TERMS, k=10, mode="and")
    s = F.searcher_for(sf)
    gathered = s.gather(res["doc_id"].to_pylist(),
                        ["conv_id", "turn_idx", "text"]).to_pandas()
    out = res.to_pandas().merge(gathered, on="doc_id", how="left")
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    from miru_ray.pipelines import flagship as F

    return {
        # ---- full-text index + scoring (SURVEY.md §2.12, §2.7) ----
        "fulltext_bm25_and": lambda sf: F.q_bm25(sf, QUERY_TERMS, 10, "and"),
        "fulltext_bm25_or": lambda sf: F.q_bm25(sf, OR_TERMS, 10, "or"),
        "fulltext_bm25_wand": lambda sf: F.q_bm25_wand(sf, OR_TERMS, 10),
        "fulltext_reftfidf_and": lambda sf: F.q_ref_tfidf(sf, QUERY_TERMS, 10, "and"),
        "fulltext_time_top10": lambda sf: F.q_time(sf, QUERY_TERMS, 10),
        # ---- filter AST (§2.3) ----
        "fulltext_and_count": lambda sf: F.q_count_and(sf, QUERY_TERMS),
        "fulltext_or_not_docs": lambda sf: F.q_or_not_docs(sf, "spark", "merge", "dup"),
        "fulltext_prefix_count": lambda sf: F.q_prefix_count(sf, "s"),
        "keyword_and_term_count": lambda sf: F.q_keyword_and_term(sf, "user", "spark"),
        # ---- authz / ACL composite filter (§2.3, MiruAuthzIndex) ----
        "fulltext_authz_count": F.q_authz_count,
        "fulltext_authz_topk": lambda sf: F.q_authz_topk(sf, QUERY_TERMS, 10),
        # ---- index-side stats (§2.6 global tf/df + latest/first family) ----
        "term_stats_top20": lambda sf: F.q_term_stats(sf, 20),
        "terms_latest_top20": lambda sf: F.q_terms_latest(sf, 20),
        "collection_stats": F.q_collection_stats,
        "doc_lengths": F.q_doc_lengths,
        **_ops_queries(),
    }


def _ops_queries() -> dict[str, Callable[[str], Any]]:
    from miru_ray.ops import analytics as A
    from miru_ray.ops import dedup as D
    from miru_ray.ops import similarity as Sim
    from miru_ray.ops import textstats as T
    from miru_ray.pipelines import relational as R

    return {
        # ---- analytics family (SURVEY.md §2.6) over events ----
        "events_distincts": A.distincts,
        "events_uniques": A.uniques,
        "events_aggregate_counts": A.aggregate_counts,
        "events_waveform": A.waveform,
        "events_metrics": A.metrics,
        "events_trending": A.trending,
        "events_trending_peaks": A.trending_peaks,   # rows-only (PEAKS)
        # ---- dedup family (§2.8 + training-data ops) ----
        "dedup_exact_docs": D.exact_dedup,
        "dedup_exact_count": D.exact_dedup_count,
        "dedup_ngram_jaccard_pairs": D.ngram_jaccard_pairs,
        "dedup_minhash_clusters": D.minhash_dedup,      # rows-only check
        "dedup_simhash_pairs": D.simhash_pairs,         # rows-only check
        "embedding_neardup_pairs": D.embedding_neardup_pairs,
        # ---- similarity search ----
        "ann_bruteforce_topk": Sim.ann_bruteforce_topk,
        "ann_lsh_recall": Sim.ann_lsh_topk,             # rows-only check
        # ---- text analysis ----
        "text_token_count_by_source": T.token_count_by_source,
        "text_quality_by_lang": T.quality_by_lang,
        "text_langid": T.langid,                        # rows-only check
        "text_fingerprints": T.fingerprints,            # rows-only check
        # ---- relational / reco (§2.5, §2.6) ----
        "rel_pricing_summary": R.pricing_summary,
        "rel_revenue_by_nation": R.revenue_by_nation,
        "rel_collaborative_filtering": R.collaborative_filtering,
        **_mm_queries(),
    }


def _mm_queries() -> dict[str, Callable[[str], Any]]:
    from miru_ray.pipelines import catwalk as C
    from miru_ray.stages import multimodal as M

    return {
        # ---- multimodal binary columns (stubbed codecs, real plumbing) ----
        "media_decode_dims": M.media_decode_dims,
        "media_frame_sample_counts": M.media_frame_sample_counts,
        "media_pipeline_features": M.media_pipeline_features,  # rows-only
        # ---- catwalk model build + strut scoring (§2.5) ----
        "catwalk_model": C.catwalk_model,
        "strut_topk_users": C.strut_topk,
        # ---- sketches + highlighting ----
        "events_uniques_hll": _hll_users,            # rows-only (approx)
        "fulltext_highlight": _highlight,            # rows-only
    }


def _hll_users(sf_dir: str) -> Any:
    from miru_ray.ops.sketches import approx_unique
    return approx_unique(sf_dir, "events", "user_id")


def _highlight(sf_dir: str) -> Any:
    from miru_ray.pipelines import flagship as F
    return F.q_highlight(sf_dir, QUERY_TERMS, 5)


def oracle_sql() -> dict[str, str]:
    from miru_ray.pipelines import flagship as F

    P = F.SQL_PROLOGUE
    return {
        "fulltext_bm25_and": F.bm25_sql(QUERY_TERMS, 10, mode="and"),
        "fulltext_bm25_or": F.bm25_sql(OR_TERMS, 10, mode="or"),
        "fulltext_bm25_wand": F.bm25_sql(OR_TERMS, 10, mode="or"),
        "fulltext_reftfidf_and": F.ref_tfidf_sql(QUERY_TERMS, 10, mode="and"),
        "fulltext_time_top10": f"""
{P}
SELECT d.doc_id, d.ts FROM docs d
JOIN tf a ON a.doc_id = d.doc_id AND a.term = 'merge'
JOIN tf b ON b.doc_id = d.doc_id AND b.term = 'spark'
ORDER BY d.ts DESC, d.doc_id DESC LIMIT 10
""".strip(),
        "fulltext_and_count": f"""
{P}
SELECT count(*)::BIGINT AS n_matched FROM (
  SELECT doc_id FROM tf WHERE term IN ('merge', 'spark')
  GROUP BY doc_id HAVING count(*) = 2)
""".strip(),
        "fulltext_or_not_docs": f"""
{P}
SELECT DISTINCT doc_id FROM tf
WHERE term IN ('spark', 'merge')
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'dup')
ORDER BY doc_id
""".strip(),
        "fulltext_prefix_count": f"""
{P}
SELECT count(DISTINCT doc_id)::BIGINT AS n_matched FROM tf
WHERE term LIKE 's%'
""".strip(),
        "keyword_and_term_count": f"""
{P}
SELECT count(*)::BIGINT AS n_matched
FROM docs d JOIN tf ON tf.doc_id = d.doc_id
WHERE tf.term = 'spark' AND d.role = 'user'
""".strip(),
        "fulltext_authz_count": F.authz_count_sql(),
        "fulltext_authz_topk": F.bm25_sql(QUERY_TERMS, 10, mode="and",
                                          authz=F.AUTHZ_PRINCIPAL),
        "terms_latest_top20": F.terms_latest_sql(20),
        "term_stats_top20": f"""
{P}
SELECT term, df::BIGINT AS df, cf::BIGINT AS cf FROM df
ORDER BY cf DESC, term ASC LIMIT 20
""".strip(),
        "collection_stats": f"""
{P}
SELECT n::BIGINT AS n_docs,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_len,
       round(avgdl, 6) AS avgdl
FROM stats
""".strip(),
        "doc_lengths": f"""
{P}
SELECT doc_id, dl::BIGINT AS doc_len FROM dl ORDER BY doc_id
""".strip(),
        **_ops_oracles(),
    }


def _ops_oracles() -> dict[str, str]:
    from miru_ray.ops import analytics as A
    from miru_ray.ops import dedup as D
    from miru_ray.ops import similarity as Sim
    from miru_ray.ops import textstats as T
    from miru_ray.pipelines import relational as R

    from miru_ray.pipelines import catwalk as C
    from miru_ray.stages import multimodal as M

    out: dict[str, str] = {}
    for mod in (A, D, T, Sim, R, C, M):
        out.update(mod.SQL)
    return out
