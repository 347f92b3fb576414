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
from ..util import broadcast_get, md5_128, sorted_lookup

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


def _row_features(text: "pa.Array | pa.ChunkedArray"
                  ) -> tuple[np.ndarray, np.ndarray, np.ndarray,
                             np.ndarray]:
    """The ONE definition of the row-local curation features —
    (hash_lo, hash_hi, n_tokens, n_stop) per doc, the 128-bit content
    hash riding as two int64 halves — shared by every curation variant
    so the dedup/quality semantics can never fork."""
    lo, hi = md5_128(np.asarray(text.to_pandas(), dtype=object))
    terms, rows, dl = explode_tokens(text)
    is_stop = pc.is_in(terms, value_set=_STOP_ARR).to_numpy(
        zero_copy_only=False)
    n_stop = np.zeros(len(text), np.int64)
    np.add.at(n_stop, rows, is_stop.astype(np.int64))
    return lo.view(np.int64), hi.view(np.int64), dl.astype(np.int64), n_stop


def _doc_stats_batch(b: pa.Table) -> pa.Table:
    """Row-local features: content hash + token/stopword counts.  These are
    the ONLY columns that cross the shuffle — text never does."""
    h, h2, n_tokens, n_stop = _row_features(b["text"])
    return pa.table({"h": pa.array(h), "h2": pa.array(h2),
                     "doc_id": b["doc_id"],
                     "n_tokens": pa.array(n_tokens),
                     "n_stop": pa.array(n_stop)})


def _grouped_survivors(sf_dir: str) -> "ray.data.Dataset":
    """One distributed groupby(hash): survivor doc (min), group size, and
    the group-constant quality features (identical text ⇒ identical token
    stats, so Min is just "pick the group's value")."""
    stats = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        _doc_stats_batch, batch_format="pyarrow", batch_size=8192)
    # the FULL 128-bit content hash is the dedup key (64 bits expect
    # birthday collisions at 10^11 docs — two distinct texts silently
    # merged); text itself still never crosses the shuffle
    return stats.groupby(["h", "h2"]).aggregate(
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
    per run) and — because the part files are written from INSIDE
    distributed map_batches — must live on storage every worker node can
    reach (shared FS / fsspec object store); a node-local path on a
    multi-node cluster would silently scatter the parts."""
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
            # tmp+rename so a preempted worker (or a lineage-recompute
            # retry racing its zombie) never leaves a torn part under
            # the deterministic final name — build.py:664 convention
            final = os.path.join(out_path, name)
            tmp = f"{final}.{os.getpid()}.tmp"
            pq.write_table(kept, tmp, compression="zstd")
            os.replace(tmp, final)
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
    if agg is None:  # empty corpus: Dataset.aggregate over zero rows
        agg = {}     # returns None, not a zero-filled dict
    return pa.table({k: pa.array([int(agg.get(k) or 0)], pa.int64())
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
        k, v = broadcast_get(lab_ref)  # once per worker, not per batch
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
    if agg is None:  # empty corpus: Dataset.aggregate over zero rows
        agg = {}     # returns None, not a zero-filled dict
    return pa.table({k: pa.array([int(agg.get(k) or 0)], pa.int64())
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


# --------------- the full pretraining-corpus composition --------------------
#
# Every gate a pretraining data pipeline runs, COMPOSED as one job:
# benchmark split -> exact dedup -> quality gate -> language ID ->
# benchmark decontamination -> mixture sampling -> per-(source, lang)
# token accounting.  Public precedent for the chain: C4 (Raffel et al.),
# The Pile, GPT-3 appendix C decontamination, the Llama data reports.
#
# Scale shape (the part that matters at 100 TB): the TRAINING side is
# expanded, tokenized, shingled and language-scored in ONE streaming
# map_batches pass; the only shuffle is the exact-dedup groupby(hash) —
# every gate after it operates on group-constant FEATURES (identical
# text => identical tokens/shingles/language), so text never crosses the
# shuffle.  The benchmark side is an eval suite (corpus/29 here),
# gathered as distinct shingle hashes in a PRIOR streaming pass and
# broadcast once (the decontaminate blocklist shape) — that pass re-scans
# and re-expands the corpus rather than materializing the expanded
# stream, because pinning a corpus-scale dataset in the object store to
# save one cheap re-read is the wrong trade at 100 TB.
# The survivor's (doc_id, source) identity rides the shuffle as one
# zero-padded "doc_id|source" string so Min() picks the min-doc survivor
# AND its source in a single aggregate.  Output is |sources| x |langs|
# rows; nothing O(corpus) ever reaches the driver.


def _documents_src(sf_dir: str) -> "ray.data.Dataset":
    """The dup-planted corpus (fixtures.DOCS_DUP_SRC_SQL derivation) with
    the SOURCE column carried through: injected copies inherit the source
    of the row they duplicate — row-local, so it composes with
    map_batches.  One canonical planting implementation
    (:func:`..fixtures.expand_docs_dup`) serves this, the dedup family,
    and the whole-table test reference."""
    import pyarrow.parquet as pq

    from ..fixtures import expand_docs_dup
    from ..util import read_parquet_clean
    path = os.path.join(sf_dir, "documents.parquet")
    n = pq.read_metadata(path).num_rows
    ds = read_parquet_clean(path, columns=["doc_id", "text", "source"])
    return ds.map_batches(lambda b: expand_docs_dup(b, n, with_source=True),
                          batch_format="pyarrow", batch_size=8192)


def pretrain_corpus_counts(sf_dir: str,
                           out_path: str | None = None) -> pa.Table:
    """Per-(source, predicted-lang) document and token counts of the fully
    curated pretraining corpus — the end-to-end composition (see module
    note above).  With ``out_path``, additionally stream the kept
    (doc_id, source, lang, n_tokens) rows to Parquet from the SAME
    grouped stream (the 100-TB sink: deterministic doc-id-range part
    names, so a retried Ray task overwrites its own output; the
    directory must not pre-exist).  Gates, in order, all deterministic
    and SQL-mirrored:

    1. benchmark split: ``doc_id % DECON_BENCH_MOD == 0`` is the eval
       suite, excluded from training;
    2. exact dedup: keep the smallest doc_id per distinct text;
    3. quality: the shared :func:`_quality_mask` (length band + stopword
       ratio);
    4. decontamination: drop any survivor whose distinct word 3-grams
       are >= 50% covered by the benchmark set (``2*hits >= n_shingles``,
       exact integer on both engines) — the overlap-FRACTION shape of
       the Llama-report decontamination rather than GPT-3's any-overlap
       flag, because a shared-vocabulary corpus makes any-overlap
       degenerate (at sf0.1 it flags 6755 of 6759 training docs; the
       standalone :func:`~miru_ray.ops.textstats.decontaminate` op keeps
       the any-overlap REPORT semantics);
    5. mixture: keep iff ``md5_64(str(doc_id)) % 1e6 < rate(source)``
       (the :mod:`..ops.mixing` hash-threshold rule).
    """
    from ..ops.dedup import _make_shingle_rows
    from ..ops.mixing import RATE_MILLIONTHS, _keep_mask
    from ..ops.textstats import DECON_BENCH_MOD, _DECON_N, predict_lang
    from ..util import broadcast_get, md5_64_bulk
    if out_path is not None:
        if os.path.exists(out_path):
            raise FileExistsError(f"pretrain out_path exists: {out_path}")
        os.makedirs(out_path)
    shingle_rows = _make_shingle_rows(_DECON_N)
    docs = _documents_src(sf_dir)

    # pass 1: benchmark shingle hashes (eval-suite bounded), ray.put once
    def bench_hashes(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        sub = b.filter(pa.array(doc % DECON_BENCH_MOD == 0))
        if sub.num_rows == 0:
            return pa.table({"g": pa.array([], pa.uint64())})
        rows = shingle_rows(sub.select(["doc_id", "text"]))
        h = md5_64_bulk(np.asarray(rows["shingle"].to_pandas(),
                                   dtype=object))
        return pa.table({"g": pa.array(np.unique(h))})

    bh = docs.map_batches(bench_hashes, batch_format="pyarrow",
                          batch_size=4096).to_pandas()  # benchmark-bounded
    bench = (np.array([], np.uint64) if bh.empty
             else np.unique(bh["g"].to_numpy().astype(np.uint64)))
    bench_ref = ray.put(bench)

    _FEAT = pa.schema([("h", pa.int64()), ("h2", pa.int64()),
                       ("key", pa.string()),
                       ("n_tokens", pa.int64()), ("n_stop", pa.int64()),
                       ("contam", pa.int64()), ("pred_lang", pa.string())])

    # pass 2: row-local features for the training side — the ONLY columns
    # that cross the dedup shuffle; text stays inside this stage
    def feat_batch(b: pa.Table) -> pa.Table:
        doc = b["doc_id"].to_numpy()
        b = b.filter(pa.array(doc % DECON_BENCH_MOD != 0))
        if b.num_rows == 0:
            return _FEAT.empty_table()
        if b["source"].null_count:
            raise ValueError("pretrain_corpus_counts: NULL source")
        ids = b["doc_id"].to_numpy().astype(np.int64)
        if len(ids) and ids.min() < 0:  # zero-pad ordering needs ids >= 0
            raise ValueError("pretrain_corpus_counts: negative doc_id")
        h, h2, n_tokens, n_stop = _row_features(b["text"])
        pred = predict_lang(b["text"])
        # contamination: >= 50% of the doc's distinct shingles are in the
        # benchmark set (2*hits >= n_sh, integers — exact on both engines)
        bench = broadcast_get(bench_ref)
        contam = np.zeros(b.num_rows, np.int64)
        if len(bench):
            sh = shingle_rows(b.select(["doc_id", "text"]))
            hh = md5_64_bulk(np.asarray(sh["shingle"].to_pandas(),
                                        dtype=object))
            hit, _ = sorted_lookup(bench, hh)
            order = np.argsort(ids)  # batch ids are unique, order-free
            row_of = order[np.searchsorted(ids[order],
                                           sh["doc_id"].to_numpy())]
            n_sh = np.bincount(row_of, minlength=b.num_rows)
            hits = np.bincount(row_of[hit], minlength=b.num_rows)
            contam[(n_sh > 0) & (2 * hits >= n_sh)] = 1
        src = np.asarray(b["source"].to_pandas(), dtype=object)
        # 19 digits covers all of int64, so lexicographic min == numeric min
        key = np.array([f"{i:019d}|{s}" for i, s in zip(ids, src)],
                       dtype=object)
        return pa.table({"h": pa.array(h), "h2": pa.array(h2),
                         "key": pa.array(key, pa.string()),
                         "n_tokens": pa.array(n_tokens),
                         "n_stop": pa.array(n_stop),
                         "contam": pa.array(contam),
                         "pred_lang": pa.array(pred, pa.string())})

    # the dedup shuffle: Min over the zero-padded key == min doc_id, and
    # it carries the survivor's source; every other feature is
    # group-constant (identical text), so Min just reads the value
    surv = (docs.map_batches(feat_batch, batch_format="pyarrow",
                             batch_size=8192)
            .groupby(["h", "h2"])  # full 128-bit dedup key
            .aggregate(Min("key", alias_name="key"),
                       Min("n_tokens", alias_name="n_tokens"),
                       Min("n_stop", alias_name="n_stop"),
                       Min("contam", alias_name="contam"),
                       Min("pred_lang", alias_name="pred_lang")))

    def gate_batch(t: pa.Table) -> pa.Table:
        import pandas as pd
        key = pd.Series(np.asarray(t["key"].to_pandas(), dtype=object))
        ids = key.str[:19].astype(np.int64).to_numpy()
        src = key.str[20:].to_numpy(dtype=object)
        nt = t["n_tokens"].to_numpy().astype(np.int64)
        ns = t["n_stop"].to_numpy().astype(np.int64)
        contam = t["contam"].to_numpy().astype(np.int64)
        # the ONE shared keep rule (ops.mixing._keep_mask) — an inline
        # copy of the hash-threshold lookup would silently desynchronize
        # this composed pipeline from the mixing family's oracles if the
        # rule ever gains a salt or new NULL handling
        mix_keep, _thr = _keep_mask(ids, src)
        keep = _quality_mask(nt, ns) & (contam == 0) & mix_keep
        if not keep.any():
            return pa.table({"source": pa.array([], pa.string()),
                             "lang": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64())})
        kept = pa.table({"source": pa.array(src[keep], pa.string()),
                         "lang": t["pred_lang"].filter(pa.array(keep)),
                         "one": pa.array(np.ones(int(keep.sum()), np.int64)),
                         "n_tokens": pa.array(nt[keep])})
        if out_path is not None:
            import pyarrow.parquet as pq
            ik = ids[keep]
            part = pa.table({"doc_id": pa.array(ik), "source": kept["source"],
                             "lang": kept["lang"],
                             "n_tokens": kept["n_tokens"]})
            name = f"part-{int(ik.min()):019d}-{int(ik.max()):019d}.parquet"
            final = os.path.join(out_path, name)
            tmp = f"{final}.{os.getpid()}.tmp"  # never a torn part
            pq.write_table(part, tmp, compression="zstd")
            os.replace(tmp, final)
        g = kept.group_by(["source", "lang"]).aggregate(
            [("one", "sum"), ("n_tokens", "sum")])
        return pa.table({"source": g["source"], "lang": g["lang"],
                         "n_docs": g["one_sum"],
                         "n_tokens": g["n_tokens_sum"]})

    out = (surv.map_batches(gate_batch, batch_format="pyarrow",
                            batch_size=8192)
           .groupby(["source", "lang"])
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_tokens", alias_name="n_tokens"))
           .to_pandas())  # |sources| x |langs| rows
    if out.empty:  # an all-gated corpus loses column names via to_pandas
        return pa.table({"source": pa.array([], pa.string()),
                         "lang": pa.array([], pa.string()),
                         "n_docs": pa.array([], pa.int64()),
                         "n_tokens": pa.array([], pa.int64())})
    out = out.sort_values(["source", "lang"]).reset_index(drop=True)
    for c in ("n_docs", "n_tokens"):
        out[c] = out[c].astype(np.int64)
    return pa.Table.from_pandas(out[["source", "lang", "n_docs",
                                     "n_tokens"]], preserve_index=False)


def _pretrain_sql() -> str:
    """The composed oracle of :func:`pretrain_corpus_counts` — each stage
    is the SAME SQL its standalone oracle uses (dup derivation from
    fixtures, shingle CASE + md5 membership from text_decontaminate —
    aggregated to the 50% coverage fraction here, quality band from
    curation_summary, vote/branch fragments from _langid_sql,
    hash-threshold CASE from mix_sample_counts), so the composition can
    only diverge where the engine's composition does."""
    from ..fixtures import DOCS_DUP_SRC_SQL
    from ..ops.mixing import RATE_MILLIONTHS, _M
    from ..ops.textstats import (DECON_BENCH_MOD, _langid_pred_fragments)
    votes, branches, langs = _langid_pred_fragments()
    stops = ", ".join(f"'{w}'" for w in sorted(EN_STOPWORDS))
    return f"""
WITH documents_dup AS ({DOCS_DUP_SRC_SQL}),
train AS (SELECT * FROM documents_dup WHERE doc_id % {DECON_BENCH_MOD} <> 0),
surv AS (SELECT min(doc_id) AS doc_id FROM train GROUP BY text),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM documents_dup),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) = 0 THEN []::VARCHAR[]
              WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
              ELSE list_distinct(list_transform(generate_series(1, len(t)-2),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
         END AS s
  FROM toks),
bench AS (SELECT DISTINCT md5_number_lower(unnest(s)) AS g FROM sh
          WHERE doc_id % {DECON_BENCH_MOD} = 0),
persh AS (
  SELECT doc_id, count(*) AS n_sh,
         sum(CASE WHEN g IN (SELECT g FROM bench) THEN 1 ELSE 0 END)
           AS hits
  FROM (SELECT doc_id, md5_number_lower(unnest(s)) AS g FROM sh
        WHERE doc_id % {DECON_BENCH_MOD} <> 0)
  GROUP BY doc_id),
contam AS (SELECT doc_id FROM persh WHERE 2 * hits >= n_sh),
feat AS (
  SELECT d.doc_id, d.source,
         len(regexp_extract_all(lower(d.text), '[a-z0-9]+')) AS n_tokens,
         len(list_filter(regexp_extract_all(lower(d.text), '[a-z0-9]+'),
             x -> x IN ({stops}))) AS n_stop,
         lower(substr(d.text, 1, 500)) AS head,
         regexp_matches(substr(d.text, 1, 200), '[一-鿿]') AS cjk
  FROM train d JOIN surv USING (doc_id)),
votes AS (
  SELECT doc_id, source, n_tokens, n_stop, cjk,
         {votes}
  FROM feat),
pred AS (
  SELECT doc_id, source, n_tokens, n_stop,
         CASE WHEN cjk THEN 'zh'
    {branches}
    ELSE '{langs[-1]}' END AS lang
  FROM votes),
kept AS (
  SELECT * FROM pred
  WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
    AND (CASE WHEN n_tokens > 0 THEN n_stop * 1.0 / n_tokens ELSE 1.0 END)
        <= {MAX_STOP_RATIO}
    AND doc_id NOT IN (SELECT doc_id FROM contam)
    AND md5_number_lower(CAST(doc_id AS VARCHAR)) % {_M} <
        (CASE md5_number_lower(source) % {len(RATE_MILLIONTHS)}
              WHEN 0 THEN {RATE_MILLIONTHS[0]}
              WHEN 1 THEN {RATE_MILLIONTHS[1]}
              WHEN 2 THEN {RATE_MILLIONTHS[2]}
              ELSE {RATE_MILLIONTHS[3]} END))
SELECT source, lang, count(*)::BIGINT AS n_docs,
       sum(n_tokens)::BIGINT AS n_tokens
FROM kept GROUP BY source, lang ORDER BY source, lang
""".strip()


SQL["pretrain_corpus_counts"] = _pretrain_sql()
