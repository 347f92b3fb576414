"""End-to-end training-data curation: the composition the engine exists
for — exact dedup ∧ quality gates ∧ token accounting as ONE streaming
pass over the corpus.

Shape at 100 TB — fully shuffle-side, NO driver round-trip: a single
map_batches pass computes per-doc (content_hash, n_tokens, n_stop); exact
duplicates have IDENTICAL text, so those features are group-constant
per hash and the whole curation collapses into ONE distributed
``groupby(hash)`` with Min/Count aggregates (the shuffle-side semi-join —
reference precedent: dedup happens inside the partition accessor, not at
a coordinator, ``MiruPartitionAccessor.handleActivities:563-578``).  The
grouped stream is then gated batch-by-batch: kept rows go straight to
partitioned Parquet (``out_path``), summary partials fold into one row.
Nothing O(N_docs) is ever collected to or broadcast from the driver.

Rules (deterministic, SQL-reproducible — the conformance contract):
- exact dedup: keep the smallest doc_id per distinct text
- length gate: ``MIN_TOKENS ≤ n_tokens ≤ MAX_TOKENS``
- quality gate: stopword_ratio ≤ MAX_STOP_RATIO (boilerplate/gibberish
  both fail it in opposite directions at real scale)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

from ..ops.dedup import _documents, label_roots
from ..tokenize import EN_STOPWORDS, explode_tokens
from ..util import md5_64

MIN_TOKENS = 40
MAX_TOKENS = 5000
MAX_STOP_RATIO = 0.08

_STOP_ARR = pa.array(sorted(EN_STOPWORDS), type=pa.string())


def _quality_mask(nt: np.ndarray, ns: np.ndarray) -> np.ndarray:
    """The ONE definition of the quality gate (length band + stopword
    ratio), shared by every curation variant so they can never diverge."""
    with np.errstate(invalid="ignore"):
        ratio = np.where(nt > 0, ns / np.maximum(nt, 1), 1.0)
    return (nt >= MIN_TOKENS) & (nt <= MAX_TOKENS) \
        & (ratio <= MAX_STOP_RATIO)


def _doc_stats_batch(b: pa.Table) -> pa.Table:
    """Row-local features: content hash + token/stopword counts.  These are
    the ONLY columns that cross the shuffle — text never does."""
    h = md5_64(b["text"].to_pandas()).view(np.int64)
    terms, rows, dl = explode_tokens(b["text"])
    is_stop = pc.is_in(terms, value_set=_STOP_ARR).to_numpy(
        zero_copy_only=False)
    n_stop = np.zeros(b.num_rows, np.int64)
    np.add.at(n_stop, rows, is_stop.astype(np.int64))
    return pa.table({"h": pa.array(h),
                     "doc_id": b["doc_id"],
                     "n_tokens": pa.array(dl.astype(np.int64)),
                     "n_stop": pa.array(n_stop)})


def _grouped_survivors(sf_dir: str) -> "ray.data.Dataset":
    """One distributed groupby(hash): survivor doc (min), group size, and
    the group-constant quality features (identical text ⇒ identical token
    stats, so Min is just "pick the group's value")."""
    stats = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_stats_batch, batch_format="pyarrow", batch_size=8192)
    return stats.groupby("h").aggregate(
        Min("doc_id", alias_name="doc_id"),
        Count(alias_name="group_n"),
        Min("n_tokens", alias_name="n_tokens"),
        Min("n_stop", alias_name="n_stop"))


def curation_summary(sf_dir: str, out_path: str | None = None):
    """(n_kept, total_tokens, n_dropped_dup, n_dropped_quality) after the
    full curation pass.  ``out_path``: also write the kept (doc_id,
    n_tokens) rows as Parquet (the 100-TB sink) — written from the SAME
    grouped stream, so the corpus is expanded, tokenized and shuffled
    exactly once.  Part files are named deterministically from the batch's
    doc-id range, so a re-executed Ray task (failure retry / lineage
    recompute) OVERWRITES its own output instead of appending a duplicate.
    ``out_path`` must not already exist (export semantics: one directory
    per run)."""
    if out_path is not None:
        if os.path.exists(out_path):
            raise FileExistsError(f"curation out_path exists: {out_path}")
        os.makedirs(out_path)

    def gate_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        gn = t["group_n"].to_numpy().astype(np.int64)
        nt = t["n_tokens"].to_numpy().astype(np.int64)
        ns = t["n_stop"].to_numpy().astype(np.int64)
        quality = _quality_mask(nt, ns)
        if out_path is not None and quality.any():
            import pyarrow.parquet as pq
            kept = pa.table({"doc_id": pa.array(ids[quality]),
                             "n_tokens": pa.array(nt[quality])})
            name = f"part-{int(ids.min()):012d}-{int(ids.max()):012d}.parquet"
            pq.write_table(kept, os.path.join(out_path, name),
                           compression="zstd")
        return pa.table({
            "n_kept": pa.array([int(quality.sum())]),
            "tokens": pa.array([int(nt[quality].sum())]),
            "drop_dup": pa.array([int((gn - 1).sum())]),
            "drop_quality": pa.array([int((~quality).sum())])})

    agg = (_grouped_survivors(sf_dir)
           .map_batches(gate_batch, batch_format="pyarrow", batch_size=8192)
           .aggregate(Sum("n_kept", alias_name="n_kept"),
                      Sum("tokens", alias_name="total_tokens"),
                      Sum("drop_dup", alias_name="n_dropped_dup"),
                      Sum("drop_quality", alias_name="n_dropped_quality")))
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("n_kept", "total_tokens", "n_dropped_dup",
                               "n_dropped_quality")})


def curation_neardup_summary(sf_dir: str) -> pa.Table:
    """Curation with a NEAR-dup gate on top of the exact one: keep a doc
    only if it is its verified minhash CLUSTER's smallest member (clusters
    subsume exact duplicates — identical text is Jaccard 1 — so the
    cluster root is always its text group's min too), then the same
    quality gates.  Output: (n_kept, total_tokens, n_dropped_exact,
    n_dropped_neardup, n_dropped_quality).

    Scale shape: the cluster labels are the duplication-bounded
    (keys, roots) arrays from :func:`miru_ray.ops.dedup._minhash_labels`
    broadcast once; the corpus itself still makes exactly one expanded +
    tokenized + grouped pass (the :func:`_grouped_survivors` stream), with
    the near-dup root check a searchsorted substitution inside the gate —
    nothing O(N_docs) reaches the driver."""
    from ..ops.dedup import _minhash_labels
    lk, lv = _minhash_labels(sf_dir)
    lab_ref = ray.put((lk, lv))

    def gate_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        gn = t["group_n"].to_numpy().astype(np.int64)
        nt = t["n_tokens"].to_numpy().astype(np.int64)
        ns = t["n_stop"].to_numpy().astype(np.int64)
        k, v = ray.get(lab_ref)
        is_root = label_roots(ids, k, v) == ids
        quality = _quality_mask(nt, ns)
        keep = is_root & quality
        return pa.table({
            "n_kept": pa.array([int(keep.sum())]),
            "tokens": pa.array([int(nt[keep].sum())]),
            "drop_exact": pa.array([int((gn - 1).sum())]),
            "drop_neardup": pa.array([int((~is_root).sum())]),
            "drop_quality": pa.array([int((is_root & ~quality).sum())])})

    agg = (_grouped_survivors(sf_dir)
           .map_batches(gate_batch, batch_format="pyarrow", batch_size=8192)
           .aggregate(Sum("n_kept", alias_name="n_kept"),
                      Sum("tokens", alias_name="total_tokens"),
                      Sum("drop_exact", alias_name="n_dropped_exact"),
                      Sum("drop_neardup", alias_name="n_dropped_neardup"),
                      Sum("drop_quality", alias_name="n_dropped_quality")))
    return pa.table({k: pa.array([int(agg[k] or 0)], pa.int64())
                     for k in ("n_kept", "total_tokens", "n_dropped_exact",
                               "n_dropped_neardup", "n_dropped_quality")})


from ..fixtures import DOCS_DUP_SQL  # single source of the dup derivation

SQL = {
    "curation_summary": f"""
WITH documents_dup AS ({DOCS_DUP_SQL}),
surv AS (SELECT min(doc_id) AS doc_id FROM documents_dup GROUP BY text),
feat AS (
  SELECT d.doc_id,
         d.doc_id IN (SELECT doc_id FROM surv) AS is_surv,
         len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS n_tokens,
         len(list_filter(regexp_extract_all(lower(d.text), '[a-z0-9]+'),
             x -> x IN ({", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))})))
           AS n_stop
  FROM documents_dup d),
gated AS (
  SELECT *,
         is_surv AND n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
           AND (CASE WHEN n_tokens > 0
                     THEN n_stop * 1.0 / n_tokens ELSE 1.0 END)
               <= {MAX_STOP_RATIO} AS keep
  FROM feat)
SELECT count(*) FILTER (keep)::BIGINT AS n_kept,
       COALESCE(sum(n_tokens) FILTER (keep), 0)::BIGINT AS total_tokens,
       count(*) FILTER (NOT is_surv)::BIGINT AS n_dropped_dup,
       count(*) FILTER (is_surv AND NOT keep)::BIGINT AS n_dropped_quality
FROM gated
""".strip(),
    # near-dup curation: verified-Jaccard connected components (the same
    # recursive CTE as dedup_minhash_clusters) → cluster-root survivors →
    # quality gates.  LSH recall at J ≥ 0.8 is 1−5e-8 on this geometry, so
    # the engine's LSH+verify pair set equals this true pair set.
    "curation_neardup_summary": f"""
WITH RECURSIVE documents_dup AS ({DOCS_DUP_SQL}),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents_dup
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks
),
pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0 /
        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM documents_dup
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
clusters AS (SELECT src AS doc_id, min(dst) AS root FROM reach GROUP BY src),
ex AS (SELECT min(doc_id) AS doc_id FROM documents_dup GROUP BY text),
feat AS (
  SELECT d.doc_id,
         len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS n_tokens,
         len(list_filter(regexp_extract_all(lower(d.text), '[a-z0-9]+'),
             x -> x IN ({", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))})))
           AS n_stop,
         d.doc_id IN (SELECT doc_id FROM ex) AS is_exact,
         c.root = d.doc_id AS is_root
  FROM documents_dup d JOIN clusters c ON c.doc_id = d.doc_id),
gated AS (
  SELECT *,
         is_root AND n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
           AND (CASE WHEN n_tokens > 0
                     THEN n_stop * 1.0 / n_tokens ELSE 1.0 END)
               <= {MAX_STOP_RATIO} AS keep
  FROM feat)
SELECT count(*) FILTER (keep)::BIGINT AS n_kept,
       COALESCE(sum(n_tokens) FILTER (keep), 0)::BIGINT AS total_tokens,
       count(*) FILTER (NOT is_exact)::BIGINT AS n_dropped_exact,
       count(*) FILTER (is_exact AND NOT is_root)::BIGINT
           AS n_dropped_neardup,
       count(*) FILTER (is_root AND NOT keep)::BIGINT AS n_dropped_quality
FROM gated
""".strip(),
}
