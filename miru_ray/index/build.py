"""Distributed index build: transcripts Parquet → segments + manifest.

Ray-Data-first pipeline (SURVEY.md §7.1), four stages, all resumable:

[1] conv offsets   pruned read (conv_id, turn_idx) → per-batch partial counts
                   → small groupby → driver-streamed prefix sums
                   (replaces the reference's timestamp-ordered id allocation,
                   ``MiruPartitionAccessor.java:594-650``, WITHOUT a global
                   sort: ``turn_idx`` is 0-based contiguous per conversation,
                   so doc_id = conv_offset + turn_idx; contiguity is asserted)
[2] doc store      map_batches(assign doc_id) → write_parquet partitioned
                   by doc-partition (the forward/activity index,
                   ``miru-service/.../index/lab/LabActivityIndex.java``).
                   Doc lengths are NOT computed here — they fall out of
                   stage [3]'s encode as per-cell ``doclen/`` sidecars
                   (Σ tf per doc), so each build tokenizes the corpus
                   exactly once
[3] segments       map_batches(tokenize → (term, doc_id, tf) exact per-batch
                   partials) → shuffle keyed by gkey = (partition, shard) →
                   per-cell vectorized encode → atomic segment files.
                   Default shuffle is EXTERNAL (partitioned parquet spill +
                   one encode task per cell; see IndexConfig.shuffle_mode);
                   groupby(gkey).map_groups remains available.  Skew bound:
                   a hot term splits across partitions and its per-cell
                   postings are capped by partition size — the analogue of
                   atomized containers (``LabInvertedIndex.java:268-292``)
[4] manifest       collection stats (N, total_len, avgdl) + lineage:
                   input fingerprint, per-stage metrics, partition ranges,
                   segment inventory.  Atomic swap = index goes live
                   (reference: the ready-watermark barrier,
                   ``MiruIndexer.java:121-123``).

Resume: ``build_index`` re-invoked on the same (input fingerprint, config)
skips completed stages via their checkpoints (offsets parquet, docstore
_SUCCESS marker, existing segment files, manifest).  All stages are
deterministic, so retried tasks rewrite identical bytes.

Scale notes (100 TB / 10^12 turns): the only all-to-all exchange is the
(partition, shard) groupby in [3], whose input is exact per-batch-aggregated
(term, doc, tf) partials (one row per unique term-doc pair — a turn's text
never spans batches, so no cross-batch combining is lost).  Stage [1] moves
one row per conversation; the prefix-sum scan streams sorted batches on
the driver below a gate and goes fully distributed above it
(``build_conv_offsets``), and the offset broadcast uses ``ray.put`` once —
above ``_OFFSETS_BROADCAST_BYTES`` the assignment hands off to the
bucketed hash join (``_assign_ids_join``), so neither stage holds
O(conversations) anywhere at scale.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data
from ray.data.aggregate import Max as RMax
from ray.data.aggregate import Sum as RSum

from ..config import IndexConfig
from ..lexnum import lex_encode_array
from ..query.composer import compose_arrays as _compose_arrays
from ..tokenize import EN_STOPWORDS, explode_tokens
from ..util import (atomic_write_json, broadcast_get, input_fingerprint,
                    list_parquet_files, read_json, read_parquet_clean,
                    sorted_lookup, term_shard)
from .segments import (empty_pos_column, encode_segment_table,
                       segment_rel_path, write_segment)

logger = logging.getLogger(__name__)

MANIFEST_VERSION = 2  # v2: segment term dict carries first_doc/last_doc


def _read_input(input_path: str | list[str], columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(input_path, columns=columns)


def _build_tag(fp: str, cfg: IndexConfig) -> dict:
    """Identity of one build: (input fingerprint, content config, format
    version).  Every skip-if-exists checkpoint must match this tag,
    otherwise the stage output belongs to a DIFFERENT build and is cleared
    first — deterministic-content resume is only valid within one tag."""
    return {"fingerprint": fp, "config": cfg.content_dict(),
            "version": MANIFEST_VERSION}


def _stage_current(marker_path: str, tag: dict) -> bool:
    if not os.path.exists(marker_path):
        return False
    try:
        return read_json(marker_path) == tag
    except Exception:
        return False


def _stabilize_concurrent_imports() -> None:
    """Make concurrent Dataset executions from driver threads safe.

    Ray's path resolution lazily imports ``fsspec.implementations.http`` on
    every call; without aiohttp the import fails (handled), is evicted from
    ``sys.modules``, and is retried — so two threads resolving paths at once
    race on the half-initialized module and surface an *unhandled*
    ``ImportError: cannot import name HTTPFileSystem``.  Seeding stub
    ``aiohttp``/``yarl`` modules lets the fsspec module import once and stay
    cached.  This sandbox is local-filesystem-only; the HTTP path is never
    exercised.
    """
    import sys
    import types
    for name in ("aiohttp", "yarl"):
        try:
            __import__(name)
        except ImportError:
            sys.modules[name] = types.ModuleType(name)
    try:
        import fsspec.implementations.http  # noqa: F401
    except Exception:  # pragma: no cover
        pass


# ---------------------------------------------------------------------------
# stage 1 — conversation offsets (doc-id allocation without a global sort)
# ---------------------------------------------------------------------------

def _conv_count_partials(batch: pa.Table) -> pa.Table:
    """Per-batch exact partial: one row per conv_id seen in the batch.
    Carries the count/max/min/Σ/Σ² moments the permutation check needs
    (count mode="all" so NULL turn_idx rows are counted, then caught)."""
    ti = pc.cast(batch["turn_idx"], pa.int64())
    if pc.any(pc.is_null(ti)).as_py():
        raise ValueError("turn_idx contains NULLs; doc-id assignment "
                         "requires 0-based contiguous turn_idx per conv")
    sq = pc.multiply(ti, ti)
    g = pa.table({"conv_id": batch["conv_id"], "ti": ti, "sq": sq})         .group_by("conv_id").aggregate(
            [("ti", "count"), ("ti", "max"), ("ti", "min"),
             ("ti", "sum"), ("sq", "sum")])
    return pa.table({"conv_id": g["conv_id"], "cnt": g["ti_count"],
                     "max_turn": g["ti_max"], "min_turn": g["ti_min"],
                     "sum_turn": g["ti_sum"], "sumsq_turn": g["sq_sum"]})


@ray.remote(num_cpus=1)
def _conv_counts_for_file(path: str) -> pa.Table:
    """One input file → its (conv_id, cnt, max_turn) partial (pruned read)."""
    t = pq.read_table(path, columns=["conv_id", "turn_idx"])
    return _conv_count_partials(t)


#: driver-merge gate for stage 1: above this many per-file partial rows
#: the conv merge + prefix sum go distributed (hash groupby + range sort;
#: the driver then only STREAMS sorted batches into the offsets file with
#: O(batch) memory).  Partial rows ≈ Σ per-file distinct convs.
_OFFSETS_DRIVER_ROWS = 20_000_000


@ray.remote(num_cpus=0)
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


def _check_contiguous(conv, cnt, max_turn, min_turn=None,
                      sum_turn=None, sumsq_turn=None) -> None:
    """Permutation check via moments: a conv's turn_idx multiset must be
    exactly {0..cnt−1}.  count+max alone admits duplicate+gap patterns
    ([0,2,2] passes max+1==cnt) — min == 0, Σ == n(n−1)/2 and
    Σ² == (n−1)n(2n−1)/6 together reject every non-adversarial
    corruption (NULLs are rejected at the partial stage)."""
    bad = max_turn + 1 != cnt
    if min_turn is not None:
        bad |= min_turn != 0
    if sum_turn is not None:
        bad |= sum_turn != cnt * (cnt - 1) // 2
    if sumsq_turn is not None:
        bad |= sumsq_turn != (cnt - 1) * cnt * (2 * cnt - 1) // 6
    if bad.any():
        raise ValueError(
            f"turn_idx not contiguous for conv {conv[int(np.argmax(bad))]!r};"
            " doc-id fast path requires 0-based contiguous turn_idx per "
            "conversation")


def _merge_conv_partials(tables: list) -> tuple:
    """Driver-side merge of per-file conv-count partials: groupby-sum the
    moments, sort by conv_id, run the contiguity check, and return
    (conv, cnt, max_turn) sorted — the ONE definition shared by the cold
    build's driver branch and the append path (the moment-check argument
    list must never diverge between them)."""
    merged = pa.concat_tables(tables)
    g = merged.group_by("conv_id").aggregate(
        [("cnt", "sum"), ("max_turn", "max"), ("min_turn", "min"),
         ("sum_turn", "sum"), ("sumsq_turn", "sum")])
    conv = np.asarray(g["conv_id"].to_pandas(), dtype=object)
    cnt = g["cnt_sum"].to_numpy().astype(np.int64)
    max_turn = g["max_turn_max"].to_numpy().astype(np.int64)
    order = np.argsort(conv, kind="stable")
    conv, cnt, max_turn = conv[order], cnt[order], max_turn[order]
    _check_contiguous(conv, cnt, max_turn,
                      g["min_turn_min"].to_numpy().astype(np.int64)[order],
                      g["sum_turn_sum"].to_numpy().astype(np.int64)[order],
                      g["sumsq_turn_sum"].to_numpy().astype(np.int64)[order])
    return conv, cnt, max_turn


def build_conv_offsets(files: list[str], offsets_path: str,
                       driver_rows: int | None = None) -> dict:
    """Compute (conv_id → doc_id offset) with prefix sums; write parquet.

    One Ray task per input file emits (conv, cnt, max_turn) partials — a
    few hundred bytes per conversation touched.  Dual path on the total
    partial row count (the ``_PR_DRIVER_EDGES`` pattern):

    - driver branch: merge + prefix-sum vectorized on the driver, bounded
      by the number of conversations;
    - distributed branch: hash groupby merges the partials, a range sort
      orders them by conv_id, and the prefix sum runs as a STREAMING scan
      over the sorted batches — the driver holds one batch plus a running
      base at a time (O(batch) memory) while writing the single offsets
      parquet row-group by row-group.  Same content either way (tested);
      downstream doc ids depend only on the content.
    """
    if driver_rows is None:  # late bind: tests monkeypatch the constant
        driver_rows = _OFFSETS_DRIVER_ROWS
    refs = [_conv_counts_for_file.remote(p) for p in files]
    n_partial = sum(ray.get([_num_rows.remote(r) for r in refs]))
    if n_partial <= driver_rows:
        conv, cnt, _max_turn = _merge_conv_partials(ray.get(refs))
        off = np.zeros(len(cnt), np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        offsets = pa.table({"conv_id": pa.array(conv, pa.string()),
                            "offset": pa.array(off),
                            "cnt": pa.array(cnt)})
        tmp = offsets_path + ".tmp"
        pq.write_table(offsets, tmp)
        os.replace(tmp, offsets_path)
        return {"n_docs": int(cnt.sum()), "n_convs": len(cnt)}

    # distributed branch
    from ray.data.aggregate import Max, Min, Sum
    ds = ray.data.from_arrow_refs(refs)
    srt = (ds.groupby("conv_id")
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Max("max_turn", alias_name="max_turn"),
                      Min("min_turn", alias_name="min_turn"),
                      Sum("sum_turn", alias_name="sum_turn"),
                      Sum("sumsq_turn", alias_name="sumsq_turn"))
           .sort("conv_id"))
    schema = pa.schema([("conv_id", pa.string()), ("offset", pa.int64()),
                        ("cnt", pa.int64())])
    tmp = offsets_path + ".tmp"
    base = 0
    n_convs = 0
    writer = pq.ParquetWriter(tmp, schema)
    try:
        for b in srt.iter_batches(batch_size=65536, batch_format="pyarrow"):
            if b.num_rows == 0:  # an empty sort output partition
                continue
            conv = np.asarray(b["conv_id"].to_pandas(), dtype=object)
            cnt = b["cnt"].to_numpy().astype(np.int64)
            _check_contiguous(conv, cnt,
                              b["max_turn"].to_numpy().astype(np.int64),
                              b["min_turn"].to_numpy().astype(np.int64),
                              b["sum_turn"].to_numpy().astype(np.int64),
                              b["sumsq_turn"].to_numpy().astype(np.int64))
            off = base + np.concatenate(([0], np.cumsum(cnt[:-1])))
            writer.write_table(pa.table(
                {"conv_id": pa.array(conv, pa.string()),
                 "offset": pa.array(off), "cnt": pa.array(cnt)}))
            base += int(cnt.sum())
            n_convs += len(cnt)
    finally:
        writer.close()
    os.replace(tmp, offsets_path)
    return {"n_docs": int(base), "n_convs": int(n_convs)}


# ---------------------------------------------------------------------------
# stage 2 — doc store (doc_id + doc_len assignment, partitioned write)
# ---------------------------------------------------------------------------

# the broadcast offsets object rides the shared per-worker cache
# (util.broadcast_get): stateless map tasks scale instantly while each
# worker still deserializes the (conv array, offsets) pair exactly once
_get_offsets = broadcast_get


class AssignDocIds:
    """Doc-id assignment against the broadcast offsets table.

    ``ray.put`` ships the (sorted conv array, offsets array) pair to the
    object store once; every worker process reads and caches it on first
    use (module-level cache), so this runs as cheap stateless tasks with
    full elasticity.  Lookup is a vectorized ``np.searchsorted``.

    Doc LENGTHS are NOT computed here: they fall out of the postings
    encode pass for free (Σ tf per doc — the doclen sidecars), so the
    doc-store write never tokenizes and the corpus is tokenized exactly
    once per build.
    """

    def __init__(self, offsets_ref, docs_per_partition: int):
        self.ref = offsets_ref
        self.dpp = docs_per_partition

    def __call__(self, batch: pa.Table) -> pa.Table:
        convs, offs = _get_offsets(self.ref)
        conv = np.asarray(batch["conv_id"].to_pandas(), dtype=object)
        hit, pos = sorted_lookup(convs, conv)  # the ONE probe definition
        if not hit.all():
            raise ValueError("conv_id missing from offsets table")
        doc_id = offs[pos] + batch["turn_idx"].to_numpy().astype(np.int64)
        partition = doc_id // self.dpp
        return (batch
                .append_column("doc_id", pa.array(doc_id))
                .append_column("partition", pa.array(partition)))


def _offsets_ref(offsets_path: str):
    """Broadcast the (sorted conv array, offsets) pair ONCE — shared by the
    doc-store and spill consumers so the object store holds one copy and
    the per-worker cache never alternates between duplicate refs."""
    off_t = pq.read_table(offsets_path)
    return ray.put((np.asarray(off_t["conv_id"].to_pandas(), dtype=object),
                    off_t["offset"].to_numpy().astype(np.int64)))


#: stage-2 gate: above this many bytes of offsets parquet the doc-id
#: assignment stops broadcasting the conv→offset map and hands off to a
#: hash-shuffle ``Dataset.join`` on conv_id (the bucketed-hash-join
#: fallback the stage boundary was designed for) — conversation counts
#: beyond a worker-heap broadcast still assign ids, at the price of one
#: all-to-all per consumer.
_OFFSETS_BROADCAST_BYTES = 512 << 20


def _assign_ids_join(ds: "ray.data.Dataset", offsets_path: str,
                     cfg: IndexConfig) -> "ray.data.Dataset":
    """Distributed doc-id assignment: input ⋈ offsets on conv_id
    (left-outer so a conv_id missing from the offsets table RAISES like
    the broadcast path, instead of silently dropping its rows)."""
    from ..pipelines.relational import _shuffle_partitions
    from ..util import read_parquet_clean as _rpc
    input_cols = list(ds.schema().names)
    off = _rpc(offsets_path, columns=["conv_id", "offset"])
    nparts = _shuffle_partitions(offsets_path)
    joined = ds.join(off, join_type="left_outer", num_partitions=nparts,
                     on=("conv_id",))
    dpp = cfg.docs_per_partition

    def add_ids(t: pa.Table) -> pa.Table:
        off_col = t["offset"]
        import pyarrow.compute as _pc
        if _pc.any(_pc.is_null(off_col)).as_py():
            raise ValueError("conv_id missing from offsets table")
        doc_id = (off_col.to_numpy(zero_copy_only=False).astype(np.int64)
                  + t["turn_idx"].to_numpy().astype(np.int64))
        return (t.select(input_cols)  # original column order (parity
                #                       with the broadcast branch)
                .append_column("doc_id", pa.array(doc_id))
                .append_column("partition", pa.array(doc_id // dpp)))

    return joined.map_batches(add_ids, batch_format="pyarrow",
                              batch_size=8192)


def _write_docstore(out: "ray.data.Dataset", docstore_dir: str,
                    cfg: IndexConfig, tag: dict | None) -> None:
    """THE docstore commit (both assignment branches): partitioned write
    + success marker."""
    out.write_parquet(docstore_dir, partition_cols=["partition"],
                      compression=cfg.io_compression)
    atomic_write_json(os.path.join(docstore_dir, "_SUCCESS"), tag or {})


def build_docstore(ds: "ray.data.Dataset", offsets_path: str, docstore_dir: str,
                   cfg: IndexConfig, tag: dict | None = None,
                   offsets_ref=None) -> None:
    ref = offsets_ref if offsets_ref is not None else _offsets_ref(offsets_path)
    # stateless tasks (fn INSTANCE, not class): no actor-pool ramp-up; the
    # broadcast is cached per worker process by _get_offsets (no stopword
    # state: the docstore stage deliberately does not tokenize)
    fn = AssignDocIds(ref, cfg.docs_per_partition)
    out = ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)
    _write_docstore(out, docstore_dir, cfg, tag)


# ---------------------------------------------------------------------------
# stage 3 — postings shuffle + segment encode
# ---------------------------------------------------------------------------

def make_postings_fn(cfg: IndexConfig, offsets_ref=None):
    """Batch → (term, doc_id, tf, gkey) rows.

    With ``offsets_ref`` the batch is RAW INPUT (conv_id/turn_idx, no
    doc_id yet): ids are assigned inline against the broadcast offsets, so
    the postings pipeline reads the source directly and can run CONCURRENTLY
    with the doc-store write instead of waiting for its files.
    """
    stop = EN_STOPWORDS if cfg.remove_stopwords else None
    dpp = cfg.docs_per_partition
    nsh = cfg.num_shards
    text_fields = cfg.text_fields
    kw_fields = cfg.keyword_fields
    list_kw_fields = cfg.list_keyword_fields
    num_fields = cfg.numeric_fields
    pb_fields = tuple(getattr(cfg, "power_bits_fields", ()))
    comp_fields = tuple(getattr(cfg, "composite_fields", ()))
    bg_fields = frozenset(getattr(cfg, "phrase_bigram_fields", ()))
    pos_fields = tuple(getattr(cfg, "positional_fields", ()))
    if pos_fields and (len(pos_fields) != 1 or pos_fields != text_fields):
        # positions are decoded by IMPLIED splits (tf per posting == its
        # position count) — a second text field sharing the term space
        # would break that invariant (see IndexConfig.positional_fields)
        raise ValueError("positional_fields must equal text_fields and "
                         "contain exactly one field")
    positional = bool(pos_fields)
    _empty_pos = empty_pos_column  # closure capture for Ray workers

    def to_postings(batch: pa.Table) -> pa.Table:
        if offsets_ref is not None:
            convs, offs = _get_offsets(offsets_ref)
            conv = np.asarray(batch["conv_id"].to_pandas(), dtype=object)
            # same validation as AssignDocIds, through the ONE probe
            # definition: a conv_id missing from the offsets table must
            # raise, not silently take a neighbour's offset (ADVICE r01)
            hit, pos = sorted_lookup(convs, conv)
            if not hit.all():
                raise ValueError("conv_id missing from offsets table")
            doc_id = offs[pos] + batch["turn_idx"].to_numpy().astype(np.int64)
        else:
            doc_id = batch["doc_id"].to_numpy().astype(np.int64)
        parts = []
        tok_parts = []   # unigram + bigram parts (bare-token term space)
        n_uni = n_bg = 0
        for f in text_fields:
            terms, rows, dl = explode_tokens(batch[f], stop)
            if len(rows) == 0:
                continue
            n_uni += 1
            if positional:
                # (term, doc, tf, positions): group by (term, row) via a
                # stable int lexsort — the flat token stream is already in
                # position order WITHIN a row, so each group's slice of the
                # sorted stream IS its ascending position list
                import pandas as pd
                term_np = np.asarray(terms.to_pandas(), dtype=object)
                row_starts = np.zeros(len(dl) + 1, np.int64)
                np.cumsum(dl, out=row_starts[1:])
                pos = (np.arange(len(rows), dtype=np.int64)
                       - row_starts[rows]).astype(np.int32)
                codes, uniq = pd.factorize(term_np, sort=False)
                order = np.lexsort((rows, codes))  # stable: pos stays sorted
                sc, sr, sp = codes[order], rows[order], pos[order]
                new = np.empty(len(sc), bool)
                new[0] = True
                new[1:] = (sc[1:] != sc[:-1]) | (sr[1:] != sr[:-1])
                gstart = np.flatnonzero(new)
                tf_np = np.diff(np.append(gstart, len(sc)))
                tok_parts.append(pa.table({
                    "term": pa.array(uniq[sc[gstart]], pa.string()),
                    "doc_id": pa.array(doc_id[sr[gstart]]),
                    "tf": pa.array(tf_np.astype(np.int64)),
                    "pos": pa.ListArray.from_arrays(
                        pa.array(np.append(gstart, len(sp)).astype(np.int32)),
                        pa.array(sp))}))
            else:
                t = pa.table({"term": terms,
                              "doc_id": pa.array(doc_id[rows])})
                # exact per-batch tf: a doc's text is in one batch row
                tf = t.group_by(["term", "doc_id"]).aggregate(
                    [("doc_id", "count")])
                tok_parts.append(
                    tf.rename_columns(["term", "doc_id", "tf"]))
            if f in bg_fields and len(rows) >= 2:
                # positions-free phrase bigrams: one `2g:<a> <b>` term per
                # adjacent token pair WITHIN a row, over the same (possibly
                # stopword-filtered) stream the unigrams saw
                tnp = np.asarray(terms.to_pandas(), dtype=object)
                adj = rows[1:] == rows[:-1]
                if adj.any():
                    bg = (np.array(["2g:"], object) + tnp[:-1][adj]
                          + np.array([" "], object) + tnp[1:][adj])
                    bt = pa.table({
                        "term": pa.array(bg, pa.string()),
                        "doc_id": pa.array(doc_id[rows[:-1][adj]])})
                    btf = bt.group_by(["term", "doc_id"]).aggregate(
                        [("doc_id", "count")])
                    n_bg += 1
                    tok_parts.append(btf.rename_columns(
                        ["term", "doc_id", "tf"]))
        for f in kw_fields:
            vals = pc.cast(batch[f], pa.string())
            mask = pc.and_(pc.is_valid(vals), pc.not_equal(vals, ""))
            keep = pc.fill_null(mask, False).to_numpy(zero_copy_only=False).astype(bool)
            if not keep.any():
                continue
            v = np.asarray(vals.to_pandas(), dtype=object)[keep]
            kterm = np.array([f + ":"], dtype=object) + v
            parts.append(pa.table({
                "term": pa.array(kterm, type=pa.string()),
                "doc_id": pa.array(doc_id[keep]),
                "tf": pa.array(np.ones(int(keep.sum()), np.int64))}))
        for name, srcs in comp_fields:
            # composite field: ONE `name:<p1><SEP><p2>...` term per doc
            # where EVERY part is non-null/non-empty (the reference
            # composes the activity's supplied parts,
            # MiruTermComposer.compose:35-63; separator deviation
            # documented in query/composer.py)
            keep = np.ones(len(batch), bool)
            cols = []
            for s in srcs:
                sv = pc.cast(batch[s], pa.string())
                m = pc.fill_null(
                    pc.and_(pc.is_valid(sv), pc.not_equal(sv, "")),
                    False).to_numpy(zero_copy_only=False).astype(bool)
                keep &= m
                cols.append(np.asarray(sv.to_pandas(), dtype=object))
            if not keep.any():
                continue
            composed = _compose_arrays([c[keep] for c in cols])
            kterm = np.array([name + ":"], dtype=object) + composed
            parts.append(pa.table({
                "term": pa.array(kterm, type=pa.string()),
                "doc_id": pa.array(doc_id[keep]),
                "tf": pa.array(np.ones(int(keep.sum()), np.int64))}))
        for f in num_fields:
            # numeric fields: one `field:<lex>` term per row where <lex> is
            # the order-preserving encoding — range queries scan the sorted
            # term dict (reference: numeric prefix composer,
            # MiruTermComposer.writePrefixBytes:130-141)
            vals = pc.cast(batch[f], pa.int64())
            keep = pc.is_valid(vals).to_numpy(zero_copy_only=False).astype(bool)
            if not keep.any():
                continue
            v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)[keep]
            kterm = (np.array([f + ":"], dtype=object)
                     + lex_encode_array(v).astype(object))
            parts.append(pa.table({
                "term": pa.array(kterm, type=pa.string()),
                "doc_id": pa.array(doc_id[keep]),
                "tf": pa.array(np.ones(int(keep.sum()), np.int64))}))
        for f, src in pb_fields:
            # power-bits: index the int value AS ITS SET BITS — a sign
            # term (`f:+`/`f:-`) plus one `f:<i>` term per set bit of the
            # magnitude (SampleTrawl.java:50-67; Long.MIN_VALUE flips
            # lossily to Long.MAX_VALUE exactly as the reference does).
            # Bit-sliced per-segment SUM is then Σ 2^i·card(bit_i) — the
            # anomaly family's self-consistent weighting (Anomaly.sum
            # multiplier `1L << i`; AnomalyQueryPluginRegion rebuilds
            # values the same way).
            vals = pc.cast(batch[src], pa.int64())
            keep = pc.is_valid(vals).to_numpy(
                zero_copy_only=False).astype(bool)
            if not keep.any():
                continue
            v = pc.fill_null(vals, 0).to_numpy(zero_copy_only=False)[keep]
            dk = doc_id[keep]
            neg = v < 0
            i64 = np.iinfo(np.int64)
            mag = np.where(neg, np.where(v == i64.min, i64.max, -v),
                           v).astype(np.uint64)
            sterm = np.where(neg, f + ":-", f + ":+").astype(object)
            parts.append(pa.table({
                "term": pa.array(sterm, pa.string()),
                "doc_id": pa.array(dk),
                "tf": pa.array(np.ones(len(dk), np.int64))}))
            for bit in range(int(mag.max()).bit_length()):
                sel = ((mag >> np.uint64(bit)) & np.uint64(1)).astype(bool)
                if not sel.any():
                    continue
                n_b = int(sel.sum())
                parts.append(pa.table({
                    "term": pa.array(np.full(n_b, f"{f}:{bit}", object),
                                     pa.string()),
                    "doc_id": pa.array(dk[sel]),
                    "tf": pa.array(np.ones(n_b, np.int64))}))
        for f in list_kw_fields:
            # one `field:value` term per list element (multiTerm fields) —
            # zero-copy explode via list offsets + parent_indices
            col = batch[f]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            flat = pc.list_flatten(col)
            if len(flat) == 0:
                continue
            parent = pc.list_parent_indices(col).to_numpy()
            v = np.asarray(pc.cast(flat, pa.string()).to_pandas(),
                           dtype=object)
            ok = np.array([s is not None and s != "" for s in v], bool)
            if not ok.any():
                continue
            kterm = np.array([f + ":"], dtype=object) + v[ok]
            parts.append(pa.table({
                "term": pa.array(kterm, type=pa.string()),
                "doc_id": pa.array(doc_id[parent[ok]]),
                "tf": pa.array(np.ones(int(ok.sum()), np.int64))}))
        if n_uni > 1 or n_bg > 1:
            # two text (or bigram) fields share the bare-token term space:
            # SUM their tf per (term, doc) here — the segment encoder
            # treats duplicate (term, doc) rows as retried-task echoes and
            # DROPS them, which would silently lose the second field's tf
            tt = pa.concat_tables(tok_parts)
            g = tt.group_by(["term", "doc_id"]).aggregate([("tf", "sum")])
            tok_parts = [pa.table({"term": g["term"], "doc_id": g["doc_id"],
                                   "tf": g["tf_sum"]})]
        parts = tok_parts + parts
        if not parts:
            cols = {"term": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "tf": pa.array([], pa.int64())}
            if positional:
                cols["pos"] = _empty_pos(0)
            cols["gkey"] = pa.array([], pa.int64())
            return pa.table(cols)
        if positional:
            # every part carries the pos column so concat stays aligned
            parts = [p if "pos" in p.column_names
                     else p.append_column("pos", _empty_pos(p.num_rows))
                     for p in parts]
        t = pa.concat_tables(parts)
        t = t.set_column(2, "tf", pc.cast(t["tf"], pa.int64()))
        term_np = np.asarray(t["term"].to_pandas(), dtype=object)
        did = t["doc_id"].to_numpy().astype(np.int64)
        gkey = (did // dpp) * nsh + term_shard(term_np, nsh)
        return t.append_column("gkey", pa.array(gkey))

    return to_postings


def postings_columns(cfg: IndexConfig) -> list[str]:
    """Docstore columns the postings pass reads — the ONE definition
    (full build, append rebuild, repair rebuild).  Includes composite
    source columns: a composite field over a column that is not itself
    indexed must still reach ``make_postings_fn``."""
    return list(dict.fromkeys(
        ["doc_id"] + list(cfg.text_fields) + list(cfg.keyword_fields)
        + list(cfg.list_keyword_fields) + list(cfg.numeric_fields)
        + [src for _f, src in getattr(cfg, "power_bits_fields", ())]
        + [src for _n, parts in getattr(cfg, "composite_fields", ())
           for src in parts]))


def doclen_rel_path(pid: int, shard: int) -> str:
    return f"doclen/p{pid:05d}_s{shard:03d}.parquet"


def write_doclen_partial(doclen: pa.Table, index_dir: str, pid: int,
                         shard: int) -> None:
    """Write one cell's doc-length partial (Σ tf per doc over tokenized
    terms — computed inside :func:`encode_segment_table` from the deduped
    sorted arrays, i.e. for free).  A partition's doc lengths are the sum
    of its shard partials.  Atomic + deterministic (resume-safe)."""
    path = os.path.join(index_dir, doclen_rel_path(pid, shard))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(doclen, tmp)
    os.replace(tmp, path)


def encode_cell_files(rows: pa.Table, index_dir: str, pid: int, shard: int,
                      skip_if_exists: bool) -> dict:
    """Encode ONE cell's (term, doc_id, tf) rows and write its segment +
    doclen sidecar.  The single implementation behind the external
    shuffle, the groupby shuffle and the append rebuild — deterministic
    and atomic; ``skip_if_exists`` keeps present files (resume), else
    they are replaced.  ``n_postings`` is Σ df of the ENCODED segment
    (post-dedup — idempotent under retried upstream writes)."""
    seg, dl = encode_segment_table(rows, with_doclen=True)
    seg_path = os.path.join(index_dir, segment_rel_path(pid, shard))
    dl_path = os.path.join(index_dir, doclen_rel_path(pid, shard))
    if not (skip_if_exists and os.path.exists(dl_path)):
        write_doclen_partial(dl, index_dir, pid, shard)
    if not (skip_if_exists and os.path.exists(seg_path)):
        write_segment(seg, seg_path)
    return cell_stats(seg, pid, shard)


def cell_stats(seg: pa.Table, pid: int, shard: int) -> dict:
    """The ONE definition of a cell's manifest stats — n_terms,
    n_postings (Σ df post-dedup), cf_text (Σ cf of TEXT terms, the
    keyword `field:value` rows masked out).  Shared by every segment
    writer (build, append rebuild, repair rebuild, additive upgrade) so
    upgraded/repaired manifests can never silently diverge from a fresh
    build's."""
    kw = pc.match_substring(seg["term"], ":")
    return {"pid": pid, "shard": shard, "n_terms": seg.num_rows,
            "n_postings": int(pc.sum(seg["df"]).as_py() or 0),
            "cf_text": int(pc.sum(pc.if_else(kw, 0, seg["cf"])).as_py() or 0)}


def make_segment_writer(index_dir: str, nsh: int):
    def encode_group(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            # SAME five columns as the real groups — a 4-column empty
            # block would give the metadata dataset inconsistent schemas
            return pa.table({"pid": pa.array([], pa.int64()),
                             "shard": pa.array([], pa.int64()),
                             "n_terms": pa.array([], pa.int64()),
                             "n_postings": pa.array([], pa.int64()),
                             "cf_text": pa.array([], pa.int64())})
        gkey = int(group["gkey"][0].as_py())
        r = encode_cell_files(group, index_dir, gkey // nsh, gkey % nsh,
                              skip_if_exists=True)
        return pa.table({k: pa.array([v]) for k, v in r.items()})
    return encode_group


def build_segments(docstore_dir: str, index_dir: str, cfg: IndexConfig,
                   tag: dict | None = None) -> list[dict]:
    cols = postings_columns(cfg)
    docs = read_parquet_clean(docstore_dir, columns=cols,
                              file_extensions=["parquet"])
    postings = docs.map_batches(make_postings_fn(cfg), batch_format="pyarrow",
                                batch_size=8192)
    if cfg.shuffle_mode == "groupby":
        meta = postings.groupby("gkey").map_groups(
            make_segment_writer(index_dir, cfg.num_shards),
            batch_format="pyarrow")
        rows = meta.take_all()
        return sorted(rows, key=lambda r: (r["pid"], r["shard"]))
    return _build_segments_external(postings, index_dir, cfg, tag)


def _build_segments_external(postings: "ray.data.Dataset", index_dir: str,
                             cfg: IndexConfig,
                             tag: dict | None = None) -> list[dict]:
    """External shuffle: partitioned parquet spill keyed by gkey, then one
    independent encode task per (partition, shard) cell.

    Row-identical to the groupby path (encode sorts in-memory per cell and
    drops any exact-duplicate (term, doc) rows a retried write could leave),
    ~3× faster (no comparison sort of the posting stream), and resumable at
    cell granularity: existing segment files are skipped.
    """
    _spill_postings(postings, os.path.join(index_dir, "postings_spill"), tag,
                    cfg.io_compression)
    return _encode_cells(index_dir, cfg)


def _spill_postings(postings: "ray.data.Dataset", spill_dir: str,
                    tag: dict | None = None,
                    compression: str = "zstd") -> None:
    done_marker = os.path.join(spill_dir, "_SPILL_DONE")
    if _stage_current(done_marker, tag or {}):
        return
    import shutil
    if os.path.exists(spill_dir):
        shutil.rmtree(spill_dir)
    # compression on the spill: postings rows are string-heavy (term
    # column) and the spill is the build's dominant disk write
    postings.write_parquet(spill_dir, partition_cols=["gkey"],
                           compression=compression)
    atomic_write_json(done_marker, tag or {})


def _encode_cells(index_dir: str, cfg: IndexConfig) -> list[dict]:
    spill_dir = os.path.join(index_dir, "postings_spill")
    nsh = cfg.num_shards

    @ray.remote(num_cpus=1)
    def encode_cell(gdir: str, gkey: int) -> dict:
        # (duplicate rows from a retried spill task are dropped by the
        # post-sort mask inside encode_segment_table; no runtime miru_ray
        # imports here — worker processes may not have the repo on
        # sys.path, names arrive via the closure)
        t = pq.ParquetDataset(gdir).read()
        return encode_cell_files(t, index_dir, gkey // nsh, gkey % nsh,
                                 skip_if_exists=True)

    futs = []
    for d in sorted(os.listdir(spill_dir)):
        if not d.startswith("gkey="):
            continue
        gkey = int(d.split("=", 1)[1])
        futs.append(encode_cell.remote(os.path.join(spill_dir, d), gkey))
    rows = ray.get(futs)
    return sorted(rows, key=lambda r: (r["pid"], r["shard"]))





# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

def _reset_stage_outputs(index_dir: str, docstore_dir: str, tag: dict,
                         overwrite: bool) -> None:
    """Clear any stage output that belongs to a different build tag (or all
    of them under ``overwrite=True``) so skip-if-exists checkpoints can never
    serve stale bytes: segment files / docstore / spill written by a build
    with different input or config would otherwise be silently reused while
    the manifest reports fresh stats (ADVICE r01, high)."""
    import shutil
    seg_dir = os.path.join(index_dir, "segments")
    seg_meta = os.path.join(seg_dir, "_META.json")
    if overwrite or not _stage_current(seg_meta, tag):
        # the OLD manifest must die with the outputs it describes: a
        # crash mid-rebuild would otherwise leave a valid-looking
        # manifest pointing at wiped segment/docstore dirs (readers get
        # FileNotFoundError instead of "no index — rebuild")
        mpath = os.path.join(index_dir, "manifest.json")
        if os.path.exists(mpath):
            os.remove(mpath)
        shutil.rmtree(seg_dir, ignore_errors=True)
        shutil.rmtree(os.path.join(index_dir, "doclen"), ignore_errors=True)
        os.makedirs(seg_dir, exist_ok=True)
        atomic_write_json(seg_meta, tag)
    if overwrite or not _stage_current(
            os.path.join(docstore_dir, "_SUCCESS"), tag):
        shutil.rmtree(docstore_dir, ignore_errors=True)
        # the removal mask belongs to the OLD index's doc-id space — a
        # rebuild with different input/config must not inherit it
        tpath = os.path.join(index_dir, "tombstones.json")
        if os.path.exists(tpath):
            os.remove(tpath)
    for d in ("postings_spill", "postings_spill_append",
              "postings_spill_upgrade"):
        sd = os.path.join(index_dir, d)
        if os.path.exists(sd) and (
                overwrite
                or not _stage_current(os.path.join(sd, "_SPILL_DONE"), tag)):
            shutil.rmtree(sd, ignore_errors=True)


def build_index(input_path: str | list[str], index_dir: str,
                cfg: IndexConfig | None = None, *,
                overwrite: bool = False,
                stop_after_stage: str | None = None) -> dict:
    """Build (or resume) an index at ``index_dir``. Returns the manifest.

    ``stop_after_stage`` ∈ {offsets, docstore, segments} interrupts the build
    after that stage — used by the resume tests (FIXTURES.md §F4 inv. 6).
    """
    cfg = cfg or IndexConfig()
    os.makedirs(index_dir, exist_ok=True)
    files = list_parquet_files(input_path) if isinstance(input_path, str) else list(input_path)
    fp = input_fingerprint(files)
    manifest_path = os.path.join(index_dir, "manifest.json")
    offsets_path = os.path.join(index_dir, "conv_offsets.parquet")
    offsets_meta_path = offsets_path + ".meta.json"
    docstore_dir = os.path.join(index_dir, "docstore")

    if os.path.exists(manifest_path) and not overwrite:
        m = read_json(manifest_path)
        if (m.get("fingerprint") == fp and m.get("config") == cfg.to_dict()
                and m.get("version") == MANIFEST_VERSION):
            logger.info("index up to date at %s", index_dir)
            return m
        # incremental append (the sip analogue): the old input is an
        # unchanged subset of the new input → index only the added files
        old_files = m.get("input_files", [])
        if (m.get("config") == cfg.to_dict() and old_files
                and m.get("version") == MANIFEST_VERSION
                and set(old_files) <= set(files)
                and all("cf_text" in s for s in m.get("segments", []))):
            # guard ONLY the old-input fingerprint probe: a blanket
            # except around append_index itself would silently degrade a
            # failed APPEND into a full rebuild — an O(corpus) surprise
            # that also mints a fresh doc_space, invalidating every
            # delivery cursor and sync watermark downstream
            try:
                old_ok = input_fingerprint(old_files) == m["fingerprint"]
            except FileNotFoundError:
                old_ok = False  # old inputs vanished → full rebuild below
            if old_ok:
                new_files = sorted(set(files) - set(old_files))
                return append_index(index_dir, m, new_files, fp, cfg)

    stages: dict[str, dict] = {}
    tag = _build_tag(fp, cfg)
    _reset_stage_outputs(index_dir, docstore_dir, tag, overwrite)

    # [1] conv offsets
    t0 = time.perf_counter()
    if (not overwrite and os.path.exists(offsets_path)
            and os.path.exists(offsets_meta_path)
            and read_json(offsets_meta_path).get("fingerprint") == fp):
        meta1 = read_json(offsets_meta_path)
        stages["offsets"] = {"skipped": True, **{k: meta1[k] for k in ("n_docs", "n_convs")}}
    else:
        meta1 = build_conv_offsets(files, offsets_path)
        atomic_write_json(offsets_meta_path, {"fingerprint": fp, **meta1})
        stages["offsets"] = {"seconds": round(time.perf_counter() - t0, 3), **meta1}
    n_docs = meta1["n_docs"]
    if stop_after_stage == "offsets":
        return {"incomplete": True, "stages": stages}

    # [2] doc store ∥ [3a] postings spill — independent given the offsets
    # table (the spill assigns doc ids inline from the broadcast offsets),
    # so the two Dataset executions run concurrently from driver threads
    # and fill each other's scheduling gaps.  ONE shared broadcast ref —
    # duplicate refs would double object-store use and thrash the
    # per-worker offsets cache when both jobs interleave.  Above the
    # broadcast gate, assignment hands off to the hash-shuffle join
    # (``_assign_ids_join``) and no broadcast exists at all.
    use_join = (os.path.getsize(offsets_path) > _OFFSETS_BROADCAST_BYTES)
    shared_ref = None if use_join else _offsets_ref(offsets_path)

    def docstore_job():
        t0 = time.perf_counter()
        if _stage_current(os.path.join(docstore_dir, "_SUCCESS"), tag):
            return {"skipped": True}
        import shutil
        if os.path.exists(docstore_dir):
            shutil.rmtree(docstore_dir)
        if use_join:
            _write_docstore(
                _assign_ids_join(_read_input(files), offsets_path, cfg),
                docstore_dir, cfg, tag)
        else:
            build_docstore(_read_input(files), offsets_path, docstore_dir,
                           cfg, tag, offsets_ref=shared_ref)
        return {"seconds": round(time.perf_counter() - t0, 3)}

    def spill_job():
        t0 = time.perf_counter()
        cols = (["conv_id", "turn_idx"] + list(cfg.text_fields)
                + list(cfg.keyword_fields) + list(cfg.list_keyword_fields)
                + list(cfg.numeric_fields)
                + [src for _f, src in
                   getattr(cfg, "power_bits_fields", ())])
        ds = _read_input(files, columns=sorted(set(cols)))
        if use_join:
            ds = _assign_ids_join(ds, offsets_path, cfg)
            postings = ds.map_batches(make_postings_fn(cfg),
                                      batch_format="pyarrow",
                                      batch_size=8192)
        else:
            postings = ds.map_batches(make_postings_fn(cfg, shared_ref),
                                      batch_format="pyarrow",
                                      batch_size=8192)
        _spill_postings(postings, os.path.join(index_dir, "postings_spill"),
                        tag, cfg.io_compression)
        return {"seconds": round(time.perf_counter() - t0, 3)}

    t0 = time.perf_counter()
    if cfg.shuffle_mode == "external" and cfg.overlap_stages:
        from concurrent.futures import ThreadPoolExecutor
        _stabilize_concurrent_imports()
        if stop_after_stage == "docstore":
            stages["docstore"] = docstore_job()
            return {"incomplete": True, "stages": stages}
        with ThreadPoolExecutor(2) as ex:
            f_doc = ex.submit(docstore_job)
            f_spill = ex.submit(spill_job)
            stages["docstore"] = f_doc.result()
            stages["spill"] = f_spill.result()
        t0 = time.perf_counter()
        seg_rows = _encode_cells(index_dir, cfg)
    else:
        stages["docstore"] = docstore_job()
        if stop_after_stage == "docstore":
            return {"incomplete": True, "stages": stages}
        t0 = time.perf_counter()
        seg_rows = build_segments(docstore_dir, index_dir, cfg, tag)
    stages["segments"] = {"seconds": round(time.perf_counter() - t0, 3),
                          "n_segments": len(seg_rows),
                          "n_postings": int(sum(r["n_postings"] for r in seg_rows))}
    if stop_after_stage == "segments":
        return {"incomplete": True, "stages": stages}

    # [4] stats + manifest — total_len = Σ cf over tokenized terms, already
    # computed per segment by the encode stage (no extra pass)
    t0 = time.perf_counter()
    total_len = int(sum(r.get("cf_text", 0) for r in seg_rows))
    dpp = cfg.docs_per_partition
    n_parts = (n_docs + dpp - 1) // dpp
    manifest = {
        "version": MANIFEST_VERSION,
        "fingerprint": fp,
        # doc-id-space token: minted by a FULL build, inherited unchanged
        # by every append (appends extend the id space, rebuilds replace
        # it) — realtime delivery keys its cursor on this.  Hash of the
        # BUILD TAG, not the bare input fingerprint: a config-change
        # rebuild over unchanged inputs re-encodes every doc and must
        # re-deliver from 0
        "doc_space": hashlib.sha256(
            json.dumps(tag, sort_keys=True).encode()).hexdigest(),
        "config": cfg.to_dict(),
        "input_files": files,
        "n_docs": int(n_docs),
        "n_convs": int(meta1["n_convs"]),
        "total_len": int(total_len),
        "avgdl": (float(total_len) / n_docs) if n_docs else 0.0,
        "partitions": [{"pid": p, "base": p * dpp,
                        "count": min(dpp, n_docs - p * dpp)}
                       for p in range(n_parts)],
        "segments": [{"pid": int(r["pid"]), "shard": int(r["shard"]),
                      "path": segment_rel_path(int(r["pid"]), int(r["shard"])),
                      "n_terms": int(r["n_terms"]),
                      "n_postings": int(r["n_postings"]),
                      "cf_text": int(r.get("cf_text", 0))} for r in seg_rows],
        "stages": stages,
    }
    stages["manifest"] = {"seconds": round(time.perf_counter() - t0, 3)}
    atomic_write_json(manifest_path, manifest)
    _cleanup_spill(index_dir)
    return manifest


def _cleanup_spill(index_dir: str) -> None:
    # the postings spill was the mid-build checkpoint; the committed
    # segments supersede it
    import shutil
    for d in ("postings_spill", "postings_spill_append",
              "postings_spill_upgrade"):
        spill_dir = os.path.join(index_dir, d)
        if os.path.exists(spill_dir):
            shutil.rmtree(spill_dir, ignore_errors=True)


def append_index(index_dir: str, manifest: dict, new_files: list[str],
                 new_fp: str, cfg: IndexConfig,
                 _crash_after_docstore: bool = False) -> dict:
    """Incrementally index NEW input files into an existing index.

    The batch analogue of the reference's sip path
    (``MiruLocalHostedPartition.sip:1172-1238``): the manifest is the
    cursor, appended docs get ids after the existing allocation, the
    boundary (partially-filled) partition's segments are merged with the
    new postings (decode → concat → re-encode → atomic replace — LAB
    compaction's role), and later partitions are fresh.

    Constraint: appended files must contain only WHOLE NEW conversations
    (the reference reuses ids via ``timeIdIndex.lookup``; our id scheme is
    conv-offset-based, so continuing an existing conversation would need a
    second id range per conv — asserted and rejected).
    """
    t_all = time.perf_counter()
    offsets_path = os.path.join(index_dir, "conv_offsets.parquet")
    docstore_dir = os.path.join(index_dir, "docstore")
    old_n = manifest["n_docs"]
    dpp = cfg.docs_per_partition

    # [1] offsets for the new conversations (appended AFTER the old ids)
    partials = ray.get([_conv_counts_for_file.remote(p) for p in new_files])
    conv, cnt, _max_turn = _merge_conv_partials(partials)
    # NOTE: an EMPTY delta (zero-row new files) flows through every
    # stage below EXCEPT the docstore staging build/move — the offsets
    # merge still drops crashed-append leftovers (offset >= old_n), the
    # stale-tag purge still heals partition dirs, and the boundary
    # partition still re-encodes deterministically.  An early return
    # here would commit the new fingerprint while SKIPPING that healing,
    # durably orphaning a crashed append's phantom docs behind the
    # up-to-date fast path.
    def _merge_offsets_streamed(path: str, nconv: np.ndarray,
                                noff: np.ndarray, ncnt: np.ndarray) -> None:
        """Streamed sorted-merge of the offsets file with the new block:
        one row group of the OLD file plus the overlapping slice of the
        new arrays in memory at a time — never O(total conversations) on
        the driver.  Also enforces (a) crashed-append leftovers (offset
        ≥ old_n) are dropped, and (b) no appended conv continues an
        existing one (the clash would corrupt doc ids)."""
        schema = pa.schema([("conv_id", pa.string()),
                            ("offset", pa.int64()), ("cnt", pa.int64())])
        tmp_p = path + ".tmp"
        pf = pq.ParquetFile(path)
        writer = pq.ParquetWriter(tmp_p, schema)
        i = 0
        try:
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg)
                oc = np.asarray(t["conv_id"].to_pandas(), dtype=object)
                oo = t["offset"].to_numpy().astype(np.int64)
                on = t["cnt"].to_numpy().astype(np.int64)
                keep = oo < old_n  # drop crashed-append leftovers
                oc, oo, on = oc[keep], oo[keep], on[keep]
                if not len(oc):
                    continue
                j = i + int(np.searchsorted(nconv[i:], oc[-1], "right"))
                hit, _ = sorted_lookup(oc, nconv[i:j])
                if hit.any():
                    raise ValueError(
                        "appended files continue existing conversation(s) "
                        f"(e.g. {nconv[i + int(np.argmax(hit))]!r}); append "
                        "requires whole new conversations")
                mc = np.concatenate([oc, nconv[i:j]])
                mo = np.concatenate([oo, noff[i:j]])
                mn = np.concatenate([on, ncnt[i:j]])
                order2 = np.argsort(mc, kind="stable")
                writer.write_table(pa.table(
                    {"conv_id": pa.array(mc[order2], pa.string()),
                     "offset": pa.array(mo[order2]),
                     "cnt": pa.array(mn[order2])}))
                i = j
            if i < len(nconv):  # new convs sorting after every old one
                writer.write_table(pa.table(
                    {"conv_id": pa.array(nconv[i:], pa.string()),
                     "offset": pa.array(noff[i:]),
                     "cnt": pa.array(ncnt[i:])}))
        finally:
            writer.close()
        os.replace(tmp_p, path)
    off = np.zeros(len(cnt), np.int64)
    np.cumsum(cnt[:-1], out=off[1:])
    off += old_n
    _merge_offsets_streamed(offsets_path, conv, off, cnt)
    atomic_write_json(offsets_path + ".meta.json",
                      {"fingerprint": new_fp, "n_docs": old_n + int(cnt.sum()),
                       "n_convs": manifest["n_convs"] + len(cnt)})

    # [2] doc store for the new files only — IDEMPOTENT under append retry:
    # write to a staging dir, then move files into the live partition dirs
    # under a deterministic per-append prefix.  A ``pending_append.json``
    # sidecar records the in-flight attempt's prefix; leftovers of ANY
    # previously crashed attempt (same OR different fingerprint — ADVICE
    # r01, medium) are purged via the sidecar before new files move in.
    import shutil
    tag = f"append-{new_fp[:16]}"
    sidecar_path = os.path.join(index_dir, "pending_append.json")
    stale_tags = {tag}
    if os.path.exists(sidecar_path):
        prev = read_json(sidecar_path)
        stale_tags.update(prev.get("tags", []))
        if prev.get("tag"):
            stale_tags.add(prev["tag"])
    # NEVER purge a COMMITTED append's files: a crash between the manifest
    # commit and the sidecar removal leaves the committed tag in the
    # sidecar, and deleting its docstore rows would be silent data loss —
    # the manifest records every committed tag for exactly this exclusion
    committed_tags = set(manifest.get("append_tags", []))
    stale_tags -= committed_tags
    stale_tags.add(tag)  # the CURRENT attempt is pending by definition
    # the sidecar accumulates EVERY pending tag (a crash between writing
    # it and purging must not forget an older crashed attempt's tag)
    atomic_write_json(sidecar_path, {"tags": sorted(stale_tags)})
    staging = os.path.join(index_dir, "docstore_append_staging")
    if os.path.exists(staging):
        shutil.rmtree(staging)
    if int(cnt.sum()):
        ds = _read_input(new_files)
        # delta-bounded broadcast: the appended files contain ONLY new
        # conversations (enforced above), so the assignment never needs
        # the full offsets table — the O(total convs) ray.put the join
        # gate exists to avoid
        delta_ref = ray.put((conv, off))
        build_docstore(ds, offsets_path, staging, cfg,
                       offsets_ref=delta_ref)
    for pdir in sorted(os.listdir(docstore_dir)):
        if not pdir.startswith("partition="):
            continue
        dst_dir = os.path.join(docstore_dir, pdir)
        for stale in os.listdir(dst_dir):  # leftovers of crashed attempts
            if any(stale.startswith(t) for t in stale_tags):
                os.remove(os.path.join(dst_dir, stale))
    if os.path.exists(staging):  # absent for an empty delta (no blocks)
        for pdir in sorted(os.listdir(staging)):
            if not pdir.startswith("partition="):
                continue
            dst_dir = os.path.join(docstore_dir, pdir)
            os.makedirs(dst_dir, exist_ok=True)
            for k, f in enumerate(sorted(os.listdir(
                    os.path.join(staging, pdir)))):
                os.replace(os.path.join(staging, pdir, f),
                           os.path.join(dst_dir, f"{tag}-{k:05d}.parquet"))
        shutil.rmtree(staging)
    if _crash_after_docstore:  # test hook: simulate a mid-append crash
        raise RuntimeError("simulated crash after append docstore")

    # [3] re-encode every partition the append touches FROM THE DOC STORE
    # (all new docs have doc_id >= old_n, so touched pids are a contiguous
    # tail: the boundary partition + fresh ones).  Rebuilding cells from the
    # docstore — rather than merging new postings into existing segment
    # files — makes this stage idempotent under any crash/retry pattern:
    # a half-merged segment from a previous attempt is simply overwritten
    # with deterministic content (the docstore is the WAL / source of truth,
    # like the reference's rebuild-from-WAL path,
    # ``MiruLocalHostedPartition.RebuildIndexRunnable``).
    nsh = cfg.num_shards
    n_docs = old_n + int(cnt.sum())
    first_pid = old_n // dpp
    last_pid = (n_docs - 1) // dpp
    postings_fn = make_postings_fn(cfg)
    cols = postings_columns(cfg)

    @ray.remote(num_cpus=1)
    def rebuild_partition(pid: int) -> list[dict]:
        # NOTE: no runtime miru_ray imports here — the function body runs
        # on workers that may not have the repo on sys.path; everything it
        # needs is captured by value through the closure
        pdir = os.path.join(docstore_dir, f"partition={pid}")
        t = pq.ParquetDataset(pdir).read(columns=cols)
        rows = postings_fn(t)
        gkeys = rows["gkey"].to_numpy()
        out = []
        for shard in range(nsh):
            cell = rows.filter(pa.array(gkeys == pid * nsh + shard))
            if cell.num_rows == 0:
                # a crashed earlier attempt may have left files for a cell
                # that is now empty — readers discover segments on disk, so
                # stale files MUST go, not merely be skipped
                for p in (segment_rel_path(pid, shard),
                          doclen_rel_path(pid, shard)):
                    fp_ = os.path.join(index_dir, p)
                    if os.path.exists(fp_):
                        os.remove(fp_)
                continue
            r = encode_cell_files(cell, index_dir, pid, shard,
                                  skip_if_exists=False)
            out.append(r)
        return out

    futs = [rebuild_partition.remote(pid)
            for pid in range(first_pid, last_pid + 1)]
    new_rows = [{**r, "path": segment_rel_path(r["pid"], r["shard"])}
                for cells in ray.get(futs) for r in cells]

    # [4] manifest update: every cell of a rebuilt partition is replaced
    segments = [s for s in manifest["segments"]
                if s["pid"] < first_pid] + new_rows
    segments.sort(key=lambda r: (r["pid"], r["shard"]))
    n_parts = (n_docs + dpp - 1) // dpp
    total_len = int(sum(s["cf_text"] for s in segments))
    out = dict(manifest)
    out.update({
        "fingerprint": new_fp,
        "input_files": sorted(set(manifest["input_files"]) | set(new_files)),
        "n_docs": n_docs,
        "n_convs": manifest["n_convs"] + len(cnt),
        "total_len": total_len,
        "avgdl": total_len / n_docs if n_docs else 0.0,
        "partitions": [{"pid": p, "base": p * dpp,
                        "count": min(dpp, n_docs - p * dpp)}
                       for p in range(n_parts)],
        "segments": [{k: int(v) if isinstance(v, (int, np.integer)) else v
                      for k, v in s.items()} for s in segments],
    })
    # rebuilt partitions lost any gather_terms enrichment — retract them
    # from every gather watermark so a re-run re-enriches exactly those
    # pids (the gatherer hook is idempotent per partition)
    for gname, gstate in out.get("gather", {}).items():
        gstate["done_pids"] = [p for p in gstate.get("done_pids", [])
                               if p < first_pid]
    out.setdefault("stages", {})["append"] = {
        "seconds": round(time.perf_counter() - t_all, 3),
        "new_docs": int(cnt.sum()), "new_files": len(new_files)}
    # record this append's tag as COMMITTED — the next append must never
    # purge its docstore files even if the sidecar removal below is lost
    out["append_tags"] = sorted(set(manifest.get("append_tags", [])) | {tag})
    atomic_write_json(os.path.join(index_dir, "manifest.json"), out)
    # keep the stage checkpoints consistent with the appended state so a
    # subsequent full-rebuild check doesn't wipe a valid index
    new_tag = _build_tag(new_fp, cfg)
    atomic_write_json(os.path.join(docstore_dir, "_SUCCESS"), new_tag)
    atomic_write_json(os.path.join(index_dir, "segments", "_META.json"),
                      new_tag)
    os.remove(sidecar_path)  # append committed — no longer pending
    _cleanup_spill(index_dir)
    return out


