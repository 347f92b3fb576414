"""End-to-end training-data curation: the composition the engine exists
for — exact dedup ∧ quality gates ∧ token accounting as ONE streaming
pass over the corpus.

Shape at 100 TB: a first pruned pass computes the content-hash survivor
set (distributed groupby, only (hash → min doc) survivors leave it); the
second pass streams every batch through the survivor filter + vectorized
quality gates and either writes the kept rows as partitioned Parquet
(``out_path``) or folds them into per-batch summary partials.  Nothing
materializes on the driver except the final summary row.

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
from ray.data.aggregate import Min, Sum

from ..ops.dedup import _documents
from ..tokenize import EN_STOPWORDS, explode_tokens
from ..util import md5_64

MIN_TOKENS = 40
MAX_TOKENS = 5000
MAX_STOP_RATIO = 0.08


def _survivors(sf_dir: str) -> np.ndarray:
    """Exact-dedup survivor ids (min doc per content hash) — distributed
    groupby; only the survivor list leaves it."""
    ds = _documents(sf_dir, ["doc_id", "text"])

    def add_hash(b: pa.Table) -> pa.Table:
        h = md5_64(b["text"].to_pandas())
        return pa.table({"h": pa.array(h.view(np.int64)),
                         "doc_id": b["doc_id"]})

    kept = (ds.map_batches(add_hash, batch_format="pyarrow", batch_size=8192)
            .groupby("h").aggregate(Min("doc_id", alias_name="doc_id")))
    return np.sort(kept.to_pandas()["doc_id"].to_numpy().astype(np.int64))


def curation_summary(sf_dir: str, out_path: str | None = None):
    """(n_kept, total_tokens, n_dropped_dup, n_dropped_quality) after the
    full curation pass.  ``out_path``: also write the kept (doc_id,
    n_tokens) rows as Parquet (the 100-TB sink) — written as a per-batch
    side effect of the SAME traversal, so the corpus is expanded,
    tokenized and gated exactly once.  ``out_path`` must not already
    exist (export semantics: one directory per run)."""
    if out_path is not None:
        if os.path.exists(out_path):
            raise FileExistsError(f"curation out_path exists: {out_path}")
        os.makedirs(out_path)
    surv_ref = ray.put(_survivors(sf_dir))
    stop_arr = pa.array(sorted(EN_STOPWORDS), type=pa.string())

    def gate_batch(b: pa.Table) -> pa.Table:
        surv = ray.get(surv_ref)
        ids = b["doc_id"].to_numpy().astype(np.int64)
        pos = np.searchsorted(surv, ids)
        is_surv = (pos < len(surv)) & (
            surv[np.minimum(pos, len(surv) - 1)] == ids)
        terms, rows, dl = explode_tokens(b["text"])
        is_stop = pc.is_in(terms, value_set=stop_arr).to_numpy(
            zero_copy_only=False)
        n_stop = np.zeros(b.num_rows, np.int64)
        np.add.at(n_stop, rows, is_stop.astype(np.int64))
        with np.errstate(invalid="ignore"):
            ratio = np.where(dl > 0, n_stop / np.maximum(dl, 1), 1.0)
        quality = (dl >= MIN_TOKENS) & (dl <= MAX_TOKENS) \
            & (ratio <= MAX_STOP_RATIO)
        keep = is_surv & quality
        if out_path is not None and keep.any():
            import uuid

            import pyarrow.parquet as pq
            kept = pa.table({"doc_id": pa.array(ids[keep]),
                             "n_tokens": pa.array(dl[keep])})
            pq.write_table(kept, os.path.join(
                out_path, f"part-{uuid.uuid4().hex}.parquet"),
                compression="zstd")
        return pa.table({
            "n_kept": pa.array([int(keep.sum())]),
            "tokens": pa.array([int(dl[keep].sum())]),
            "drop_dup": pa.array([int((~is_surv).sum())]),
            "drop_quality": pa.array([int((is_surv & ~quality).sum())])})

    ds = _documents(sf_dir, ["doc_id", "text"])
    agg = (ds.map_batches(gate_batch, batch_format="pyarrow",
                          batch_size=8192)
           .aggregate(Sum("n_kept", alias_name="n_kept"),
                      Sum("tokens", alias_name="total_tokens"),
                      Sum("drop_dup", alias_name="n_dropped_dup"),
                      Sum("drop_quality", alias_name="n_dropped_quality")))
    return pa.table({k: pa.array([int(v)], pa.int64())
                     for k, v in agg.items()})


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
}
