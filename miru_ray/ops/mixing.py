"""Deterministic mixture sampling over the ``documents`` table.

A training-data mixture assigns every source a sampling rate and must pick
the SAME documents on every run, on every machine, and in every engine —
so the keep decision is a pure content hash, never an RNG:

    keep(doc)  ⇔  md5_64(str(doc_id)) % 1_000_000  <  threshold(source)

``md5_64`` is DuckDB's ``md5_number_lower``, so the SQL oracle reproduces
the exact sample bit-for-bit.  The per-source rate bucket is itself a
stable hash of the source name (``md5_64(source) % len(RATE_MILLIONTHS)``)
— no config table to ship, any source universe works.

Scale shape: keep decisions are row-local (one shuffle-free
``map_batches``); the per-source accounting is exact per-batch partials →
one tiny groupby.  ``out_path`` streams the kept rows straight to
partitioned Parquet — nothing O(corpus) ever reaches the driver.

Public precedent: hash-based document sampling / source weighting as in
the C4 and Pile mixture constructions (deterministic splits via content
hashes rather than seeded RNGs).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..tokenize import explode_tokens
from ..util import md5_64, read_parquet_clean, rowgroup_block_plan

#: rate buckets in millionths (1e6 = keep all): source → bucket by
#: md5_64(source) % 4 — stable, engine/SQL identical
RATE_MILLIONTHS = (1_000_000, 500_000, 250_000, 100_000)
_M = 1_000_000


def _documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                                 columns=columns)


def _doc_hash_m(doc_id: np.ndarray, salt: str = "") -> np.ndarray:
    """md5_64(salt + str(doc_id)) % 1e6 — the shared doc-hash draw.
    Decisions that must be INDEPENDENT of each other use distinct salts:
    the sample keep rule draws unsalted, the train/val/test split draws
    with ``"split|"`` — with ONE shared draw every doc kept by a
    rate ≤ 0.8 source would hash below the train threshold and val/test
    would receive zero sampled documents (the C4/Pile constructions salt
    each decision for exactly this reason)."""
    return (md5_64(np.array([salt + str(int(d)) for d in doc_id],
                            dtype=object))
            % np.uint64(_M)).astype(np.int64)


def _keep_mask(doc_id: np.ndarray, source) -> tuple[np.ndarray, np.ndarray]:
    """(keep mask, per-row threshold in millionths) — the one shared
    definition of the sample, used by both the counting and the export
    pass so they can never disagree."""
    src = np.asarray(source, dtype=object)
    codes, uniq = pd.factorize(src, sort=False)
    thr_u = np.array(RATE_MILLIONTHS, np.int64)[
        (md5_64(uniq.astype(object)) % np.uint64(len(RATE_MILLIONTHS)))
        .astype(np.int64)]
    # NULL sources factorize to code -1; the SQL oracle's
    # md5_number_lower(NULL) % 4 is NULL and falls to the CASE ELSE rate,
    # so map -1 explicitly to RATE_MILLIONTHS[-1] rather than letting
    # thr_u[-1] read whichever source happens to be last in the batch
    if len(thr_u):
        thr = np.where(codes < 0, np.int64(RATE_MILLIONTHS[-1]),
                       thr_u[np.maximum(codes, 0)])
    else:
        thr = np.full(len(codes), RATE_MILLIONTHS[-1], np.int64)
    return _doc_hash_m(doc_id) < thr, thr


def mixture_sample(sf_dir: str, out_path: str | None = None) -> pa.Table:
    """Per-source mixture accounting: (source, rate_millionths, n_total,
    n_kept), sorted by source.  With ``out_path``, additionally stream the
    kept (doc_id, source) rows to partitioned Parquet (the 100-TB sink)."""
    ds = _documents(sf_dir, ["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        keep, thr = _keep_mask(b["doc_id"].to_numpy(), b["source"].to_pandas())
        t = pa.table({"source": b["source"],
                      "rate_millionths": pa.array(thr),
                      "k": pa.array(keep.astype(np.int64))})
        g = t.group_by(["source", "rate_millionths"]).aggregate(
            [("k", "sum"), ("k", "count")])
        # name-based selection: pyarrow's key-vs-aggregate column ORDER has
        # changed across versions, so positional renames are a trap
        return pa.table({"source": g["source"],
                         "rate_millionths": g["rate_millionths"],
                         "kept": g["k_sum"], "tot": g["k_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)
    out = partials.groupby(["source", "rate_millionths"]).aggregate(
        Sum("tot", alias_name="n_total"),
        Sum("kept", alias_name="n_kept")).to_pandas()
    out = out.sort_values("source").reset_index(drop=True)
    out = out[["source", "rate_millionths", "n_total", "n_kept"]]

    if out_path is not None:
        def keep_rows(b: pa.Table) -> pa.Table:
            keep, _ = _keep_mask(b["doc_id"].to_numpy(),
                                 b["source"].to_pandas())
            return b.filter(pa.array(keep))

        (ds.map_batches(keep_rows, batch_format="pyarrow", batch_size=8192)
           .write_parquet(out_path, partition_cols=["source"]))
    return pa.Table.from_pandas(out, preserve_index=False)


#: default budget fraction — keep the first half of the corpus's tokens
BUDGET_NUM, BUDGET_DEN = 1, 2


def token_budget_sample(sf_dir: str, budget_num: int = BUDGET_NUM,
                        budget_den: int = BUDGET_DEN,
                        out_path: str | None = None) -> pa.Table:
    """Exact token-budget cut: keep documents in deterministic hash-priority
    order ``(md5_64(doc_id), doc_id)`` until the cumulative token count
    reaches ``budget = total_tokens * budget_num // budget_den`` (the doc
    that crosses the budget is included — exclusive-prefix rule).

    This is the standard "sample N tokens from the corpus" training-data
    op, done as an exact distributed prefix-scan rather than a global sort:

    1. one tokenize pass derives the tiny ``(doc_id, source, h, n)`` table
       (no text column — ~32 B/row — materialized so three consumers don't
       re-tokenize);
    2. 256 hash-range buckets (top 8 bits of ``h``) are summed via
       per-batch partials — only 256 numbers reach the driver, which
       prefix-scans them to locate the single BOUNDARY bucket;
    3. only that one bucket's rows (~corpus/256) are sorted exactly to
       find the cut key ``(h*, doc*)``;
    4. the keep decision is then row-local: ``bucket < b*  OR  key ≤ cut``.

    Nothing O(corpus) is ever sorted, shuffled, or driver-collected; at
    10^12 docs raise the bucket-bit count so a bucket stays node-sized.
    Output: per-source ``(source, n_docs_kept, tokens_kept)``.
    """
    ds = _documents(sf_dir, ["doc_id", "source", "text"])

    def derive(b: pa.Table) -> pa.Table:
        _, _, dl = explode_tokens(b["text"])
        h = md5_64(np.array([str(int(d)) for d in
                             b["doc_id"].to_numpy()], dtype=object))
        return pa.table({"doc_id": b["doc_id"], "source": b["source"],
                         "h": pa.array(h),
                         "bucket": pa.array((h >> np.uint64(56))
                                            .astype(np.int64)),
                         "n": pa.array(dl)})

    derived = ds.map_batches(derive, batch_format="pyarrow",
                             batch_size=8192).materialize()

    # ---- phase 2: 256 bucket sums -> budget + boundary bucket ----
    def bucket_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("bucket").aggregate([("n", "sum")])
        return pa.table({"bucket": g["bucket"], "tok": g["n_sum"]})

    bsums = (derived.map_batches(bucket_partial, batch_format="pyarrow")
             .to_pandas().groupby("bucket", as_index=False)["tok"].sum()
             .sort_values("bucket").reset_index(drop=True))
    total = int(bsums["tok"].sum())
    budget = total * budget_num // budget_den
    cum = bsums["tok"].cumsum()
    # first bucket where the running total REACHES the budget: every doc in
    # an earlier bucket has exclusive-prefix < budget (kept), every doc in a
    # later one has exclusive-prefix >= budget (dropped) — >= not > so that
    # zero-token docs sitting exactly at the boundary match the SQL rule
    over = bsums.index[cum >= budget]
    if len(over) == 0:  # budget >= total: keep everything
        b_star, cut = np.int64(1 << 62), None
    else:
        i = int(over[0])
        b_star = np.int64(bsums["bucket"].iloc[i])
        spent_before = int(cum.iloc[i - 1]) if i > 0 else 0

        # ---- phase 3: exact cut inside the one boundary bucket ----
        def only_boundary(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["bucket"], pa.scalar(int(b_star))))

        bb = (derived.map_batches(only_boundary, batch_format="pyarrow")
              .to_pandas().sort_values(["h", "doc_id"])
              .reset_index(drop=True))
        keep_n = (bb["n"].cumsum() - bb["n"]) < (budget - spent_before)
        if keep_n.any():
            last = bb[keep_n].iloc[-1]
            cut = (np.uint64(last["h"]), np.int64(last["doc_id"]))
        else:
            cut = None

    cut_ref = ray.put((int(b_star), None if cut is None
                       else (int(cut[0]), int(cut[1]))))

    def keep_mask(b: pa.Table) -> np.ndarray:
        bs, c = ray.get(cut_ref)
        bucket = b["bucket"].to_numpy()
        keep = bucket < bs
        if c is not None:
            h = b["h"].to_numpy().astype(np.uint64)
            d = b["doc_id"].to_numpy()
            hs, ds_ = np.uint64(c[0]), np.int64(c[1])
            keep = keep | ((bucket == bs) &
                           ((h < hs) | ((h == hs) & (d <= ds_))))
        return keep

    # ---- phase 4: row-local keep + per-source accounting ----
    def account(b: pa.Table) -> pa.Table:
        k = keep_mask(b)
        t = pa.table({"source": b["source"],
                      "kd": pa.array(k.astype(np.int64)),
                      "kt": pa.array(np.where(k, b["n"].to_numpy(), 0))})
        g = t.group_by("source").aggregate([("kd", "sum"), ("kt", "sum")])
        return pa.table({"source": g["source"], "kd": g["kd_sum"],
                         "kt": g["kt_sum"]})

    out = (derived.map_batches(account, batch_format="pyarrow")
           .groupby("source").aggregate(
               Sum("kd", alias_name="n_docs_kept"),
               Sum("kt", alias_name="tokens_kept")).to_pandas())
    out = out[out["n_docs_kept"] > 0]
    out = out.sort_values("source").reset_index(drop=True)
    out = out[["source", "n_docs_kept", "tokens_kept"]]

    if out_path is not None:
        (derived.map_batches(
            lambda b: b.filter(pa.array(keep_mask(b)))
                       .select(["doc_id", "source", "n"]),
            batch_format="pyarrow")
         .write_parquet(out_path, partition_cols=["source"]))
    return pa.Table.from_pandas(out, preserve_index=False)


#: training-sequence length for packing (tokens per sequence)
SEQ_LEN = 512


_doc_block_plan = rowgroup_block_plan  # shared metadata-only block packer


@ray.remote(num_cpus=1)
def _block_tok_partial(path: str, row_groups: list[int]):
    """Block → (min_doc, max_doc, n_rows, sum_tokens): bytes-per-block
    driver state, like the index build's per-file conv partials."""
    import pyarrow.parquet as pq
    t = pq.ParquetFile(path).read_row_groups(
        row_groups, columns=["doc_id", "text"])
    _, _, dl = explode_tokens(t["text"])
    ids = t["doc_id"].to_numpy()
    return int(ids.min()), int(ids.max()), len(ids), int(dl.sum())


@ray.remote(num_cpus=1)
def _block_pack_rows(path: str, row_groups: list[int], start_tok: int,
                     seq_len: int, out_path: str | None, block_idx: int):
    """Block + its exclusive global token offset → per-doc packing rows.
    With ``out_path``, writes its own deterministically-named partition
    file (resumable: a re-run overwrites, never duplicates)."""
    import pyarrow.parquet as pq
    t = pq.ParquetFile(path).read_row_groups(
        row_groups, columns=["doc_id", "text"])
    # the cross-block guard only sees [min, max] ranges; WITHIN the block
    # the cumsum below must also run in doc_id order
    t = t.sort_by("doc_id")
    _, _, dl = explode_tokens(t["text"])
    n = dl.astype(np.int64)
    st = np.zeros(len(n), np.int64)
    np.cumsum(n[:-1], out=st[1:])
    st += start_tok
    pos = n > 0
    first = np.where(pos, st // seq_len, -1)
    last = np.where(pos, (st + n - 1) // seq_len, -1)
    out = pa.table({
        "doc_id": t["doc_id"],
        "n_tok": pa.array(n),
        "start_tok": pa.array(st),
        "first_seq": pa.array(first),
        "last_seq": pa.array(last),
        "n_seqs": pa.array(np.where(pos, last - first + 1, 0))})
    if out_path is not None:
        os.makedirs(out_path, exist_ok=True)
        final = os.path.join(out_path, f"pack-{block_idx:06d}.parquet")
        tmp = f"{final}.{os.getpid()}.tmp"  # retry/preemption: no torn part
        pq.write_table(out, tmp)
        os.replace(tmp, final)
        return out.schema.empty_table()
    return out


def pack_sequences(sf_dir: str, seq_len: int = SEQ_LEN,
                   out_path: str | None = None,
                   block_rows: int = 65536) -> pa.Table:
    """GPT-style training-sequence packing: documents concatenated in
    ``doc_id`` order and chopped into fixed ``seq_len``-token sequences
    (documents span sequence boundaries, as in GPT/LLaMA-style
    pretraining batch construction).  Per doc: its global token offset and
    the [first_seq, last_seq] span it lands in; zero-token docs occupy no
    sequence (-1/-1, n_seqs 0).

    Exact distributed prefix-scan, no global sort and no O(corpus) driver
    state: one pruned pass per row-group block emits (min_doc, max_doc,
    rows, sum_tokens) partials; the driver validates doc_id monotonicity
    ACROSS blocks (same contiguity assertion as the index build's offsets
    stage) and prefix-sums block offsets — O(blocks) numbers; a second
    block pass derives every doc's span row-locally from its block's
    offset.  ``out_path`` makes each block task write its own
    deterministically-named partition file (the 100-TB sink — resumable,
    re-runs overwrite)."""
    path = os.path.join(sf_dir, "documents.parquet")
    blocks = _doc_block_plan(path, target_rows=block_rows)
    parts = ray.get([_block_tok_partial.remote(path, b) for b in blocks])
    order = np.argsort([p[0] for p in parts], kind="stable")
    prev_max = None
    starts = []
    run = 0
    for i in order:
        mn, mx, _rows, tok = parts[i]
        if prev_max is not None and mn <= prev_max:
            raise ValueError(
                "doc_id not globally monotone across row-group blocks; "
                "sequence packing requires doc_id-ordered input "
                f"(block min {mn} <= previous max {prev_max})")
        prev_max = mx
        starts.append(run)
        run += tok
    outs = ray.get([
        _block_pack_rows.remote(path, blocks[i], starts[k], seq_len,
                                out_path, k)
        for k, i in enumerate(order)])
    return pa.concat_tables(outs)


#: split thresholds in millionths: [0, train) train, [train, val) val,
#: [val, 1e6) test — one hash draw decides all three deterministically
SPLIT_TRAIN_M, SPLIT_VAL_M = 800_000, 900_000


def split_counts(sf_dir: str, out_path: str | None = None) -> pa.Table:
    """Deterministic train/val/test split (80/10/10): the split of a doc
    is a pure function of ``md5_64('split|' + doc_id) % 1e6`` —
    reproducible on any engine, stable under re-partitioning, disjoint
    by construction (one draw, three ranges), and SALTED so it is
    independent of the sample-keep draw (see :func:`_doc_hash_m`: an
    unsalted split would send every doc kept by a ≤0.8-rate source to
    train).  Per (source, split) accounting via exact per-batch
    partials; ``out_path`` streams rows to ``split=train|val|test``
    partitioned Parquet."""
    ds = _documents(sf_dir, ["doc_id", "source"])

    def _split(doc_id: np.ndarray) -> np.ndarray:
        h = _doc_hash_m(doc_id, salt="split|")
        return np.where(h < SPLIT_TRAIN_M, "train",
                        np.where(h < SPLIT_VAL_M, "val", "test"))

    def partial(b: pa.Table) -> pa.Table:
        sp = _split(b["doc_id"].to_numpy())
        t = pa.table({"source": b["source"],
                      "split": pa.array(sp, pa.string())})
        g = t.group_by(["source", "split"]).aggregate([([], "count_all")])
        return pa.table({"source": g["source"], "split": g["split"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
           .groupby(["source", "split"]).aggregate(
               Sum("n", alias_name="n_docs")).to_pandas()
           .sort_values(["source", "split"]).reset_index(drop=True))
    out["n_docs"] = out["n_docs"].astype("int64")

    if out_path is not None:
        def tag(b: pa.Table) -> pa.Table:
            sp = _split(b["doc_id"].to_numpy())
            return b.append_column("split", pa.array(sp, pa.string()))

        (ds.map_batches(tag, batch_format="pyarrow", batch_size=8192)
           .write_parquet(out_path, partition_cols=["split"]))
    return pa.Table.from_pandas(out[["source", "split", "n_docs"]],
                                preserve_index=False)


SQL = {
    "mix_split_counts": f"""
SELECT source,
       CASE WHEN md5_number_lower('split|' || CAST(doc_id AS VARCHAR))
                 % {_M} < {SPLIT_TRAIN_M} THEN 'train'
            WHEN md5_number_lower('split|' || CAST(doc_id AS VARCHAR))
                 % {_M} < {SPLIT_VAL_M} THEN 'val'
            ELSE 'test' END AS split,
       count(*)::BIGINT AS n_docs
FROM documents GROUP BY source, split ORDER BY source, split
""".strip(),
    "mix_pack_sequences": f"""
WITH d AS (
  SELECT doc_id,
         coalesce(len(regexp_extract_all(lower(text), '[a-z0-9]+')),
                  0)::BIGINT AS n
  FROM documents),
c AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS st
  FROM d)
SELECT doc_id, n AS n_tok, st::BIGINT AS start_tok,
       (CASE WHEN n > 0 THEN st // {SEQ_LEN} ELSE -1 END)::BIGINT
           AS first_seq,
       (CASE WHEN n > 0 THEN (st + n - 1) // {SEQ_LEN} ELSE -1 END)::BIGINT
           AS last_seq,
       (CASE WHEN n > 0
             THEN (st + n - 1) // {SEQ_LEN} - st // {SEQ_LEN} + 1
             ELSE 0 END)::BIGINT AS n_seqs
FROM c ORDER BY doc_id
""".strip(),
    "mix_token_budget": f"""
WITH d AS (
  SELECT source, doc_id,
         md5_number_lower(CAST(doc_id AS VARCHAR)) AS h,
         coalesce(len(regexp_extract_all(lower(text), '[a-z0-9]+')),
                  0)::BIGINT AS n
  FROM documents),
b AS (SELECT sum(n) * {BUDGET_NUM} // {BUDGET_DEN} AS budget FROM d),
c AS (
  SELECT *, sum(n) OVER (ORDER BY h, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n AS cume
  FROM d)
SELECT source, count(*)::BIGINT AS n_docs_kept,
       sum(n)::BIGINT AS tokens_kept
FROM c, b WHERE c.cume < b.budget
GROUP BY source ORDER BY source
""".strip(),
    "mix_sample_counts": f"""
WITH d AS (
  SELECT source, doc_id,
         (CASE md5_number_lower(source) % 4
               WHEN 0 THEN {RATE_MILLIONTHS[0]}
               WHEN 1 THEN {RATE_MILLIONTHS[1]}
               WHEN 2 THEN {RATE_MILLIONTHS[2]}
               ELSE {RATE_MILLIONTHS[3]}
          END)::BIGINT AS rate_millionths
  FROM documents
)
SELECT source, rate_millionths, count(*)::BIGINT AS n_total,
       sum(CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % {_M}
                     < rate_millionths THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM d
GROUP BY source, rate_millionths
ORDER BY source
""".strip(),
}
