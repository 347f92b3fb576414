"""Index compaction: merge partitions + expunge tombstones into a new index.

The batch analogue of the reference's LAB compaction / merge path
(``LABEnvironment.compactOnClosedWriters``, the merge half of
``MiruPartitionAccessor``'s rebuild): an index that accumulated many small
partitions through incremental appends — or dead docs through removals —
is rewritten into a FRESH index directory with

  * tombstoned documents physically removed from postings, doc store and
    doc-length sidecars (Lucene's "expunge deletes"),
  * surviving doc ids renumbered densely (order preserved), and
  * a new, typically larger ``docs_per_partition`` (fewer, bigger
    partitions = fewer segment files and reader-side arrays).

Critically the postings are rebuilt FROM THE OLD SEGMENTS
(:func:`segment decode <miru_ray.index.segments.segment_to_rows>` →
renumber → re-shuffle → re-encode), so the corpus is **never
re-tokenized** — compaction cost is decode + shuffle + encode, not the
full build.  Ray-Data shape::

    read_parquet(old segment files)                 # term-dict rows stream
      → map_batches(decode postings, drop tombstones, renumber, gkey)
      → external shuffle keyed by (new partition, term shard)
      → one encode task per cell  (the build's own [3] machinery)

Invariant (tested): compacting an index whose tombstones are whole
conversations or per-conversation turn SUFFIXES produces segment/doclen
files **byte-identical** to a fresh ``build_index`` over the filtered
input — decode→renumber→re-encode is lossless and deterministic.

The output is a first-class index: same manifest contract, queryable by
``Searcher``, appendable by ``build_index`` (conv offsets are rewritten to
the dense numbering, so the sip/append path keeps allocating after the
compacted id space).  BM25 statistics (N, avgdl, df/cf) reflect the purge
— removed docs stop contributing to scores, exactly the expunge semantics.
"""

from __future__ import annotations

import logging
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data

from ..config import IndexConfig
from ..util import (atomic_write_json, broadcast_get, read_json,
                    read_parquet_clean, sorted_lookup, term_shard)
from .build import (MANIFEST_VERSION, _build_tag, _cleanup_spill,
                    _encode_cells, _spill_postings)
from .segments import segment_rows_table

logger = logging.getLogger(__name__)

# the broadcast tombstone array rides the shared per-worker cache
# (util.broadcast_get): stateless map tasks, one deserialize per worker
_get_tombs = broadcast_get


def _alive_renumber(doc: np.ndarray, tombs: np.ndarray):
    """(keep mask, densely renumbered ids for the kept docs).

    ``tombs`` sorted unique int64.  new_id = old_id − #tombstones<old_id —
    order-preserving dense renumbering, vectorized searchsorted (the
    tombstone set is removal-bounded, not corpus-bounded)."""
    if len(tombs) == 0:
        return None, doc
    dead, _ = sorted_lookup(tombs, doc)
    keep = ~dead
    kept = doc[keep]
    return keep, kept - np.searchsorted(tombs, kept)


def _rewrite_conv_offsets(src_dir: str, dst_dir: str, tombs: np.ndarray,
                          fingerprint: str) -> dict:
    """conv_id → offset/cnt table in the dense numbering; drops emptied
    conversations.  Keeps the append contract: new conversations allocate
    ids after the compacted space."""
    t = pq.read_table(os.path.join(src_dir, "conv_offsets.parquet"))
    off = t["offset"].to_numpy().astype(np.int64)
    cnt = t["cnt"].to_numpy().astype(np.int64)
    lo = np.searchsorted(tombs, off)
    hi = np.searchsorted(tombs, off + cnt)
    new_cnt = cnt - (hi - lo)
    new_off = off - lo
    keep = new_cnt > 0
    out = pa.table({
        "conv_id": t["conv_id"].filter(pa.array(keep)),
        "offset": pa.array(new_off[keep]),
        "cnt": pa.array(new_cnt[keep])})
    path = os.path.join(dst_dir, "conv_offsets.parquet")
    tmp = path + ".tmp"
    pq.write_table(out, tmp)
    os.replace(tmp, path)
    meta = {"fingerprint": fingerprint, "n_docs": int(new_cnt[keep].sum()),
            "n_convs": int(keep.sum())}
    atomic_write_json(path + ".meta.json", meta)
    return meta


def _make_decode_fn(tombs_ref, dpp: int, nsh: int):
    """Segment term-dict rows → renumbered (term, doc_id, tf, gkey) rows."""

    def decode_batch(b: pa.Table) -> pa.Table:
        tombs = _get_tombs(tombs_ref)
        rows = segment_rows_table(b)  # the one shared decode primitive
        docs = rows["doc_id"].to_numpy().astype(np.int64)
        tfs = rows["tf"].to_numpy().astype(np.int64)
        term_rep = np.asarray(rows["term"].to_pandas(), dtype=object)
        pos = rows["pos"] if "pos" in rows.column_names else None
        keep, docs = _alive_renumber(docs, tombs)
        if keep is not None:
            tfs, term_rep = tfs[keep], term_rep[keep]
            if pos is not None:  # positions are per-posting — same mask
                pos = pc.take(pos, pa.array(np.flatnonzero(keep)))
        gkey = (docs // dpp) * nsh + term_shard(term_rep, nsh)
        cols = {"term": pa.array(term_rep, pa.string()),
                "doc_id": pa.array(docs),
                "tf": pa.array(tfs)}
        if pos is not None:
            cols["pos"] = pos
        cols["gkey"] = pa.array(gkey)
        return pa.table(cols)

    return decode_batch


def _make_docstore_fn(tombs_ref, dpp: int):
    def rewrite(b: pa.Table) -> pa.Table:
        tombs = _get_tombs(tombs_ref)
        if "partition" in b.column_names:  # hive col from the old layout
            b = b.drop_columns(["partition"])
        doc = b["doc_id"].to_numpy().astype(np.int64)
        keep, new_doc = _alive_renumber(doc, tombs)
        if keep is not None:
            b = b.filter(pa.array(keep))
        idx = b.column_names.index("doc_id")
        b = b.set_column(idx, "doc_id", pa.array(new_doc))
        return b.append_column("partition", pa.array(new_doc // dpp))

    return rewrite


def compact_index(src_dir: str, dst_dir: str, *,
                  docs_per_partition: int | None = None,
                  num_shards: int | None = None,
                  overwrite: bool = False) -> dict:
    """Compact ``src_dir`` into a fresh index at ``dst_dir``.

    Only the layout knobs (``docs_per_partition``, ``num_shards``) may
    change — every tokenization-affecting field is inherited from the
    source config, because postings are reused, not recomputed.
    Returns the new manifest.
    """
    m = read_json(os.path.join(src_dir, "manifest.json"))
    if m.get("version") != MANIFEST_VERSION:
        raise ValueError(f"cannot compact manifest version {m.get('version')}")
    src_cfg = IndexConfig.from_dict(m["config"])
    import dataclasses
    dpp_new = (src_cfg.docs_per_partition if docs_per_partition is None
               else int(docs_per_partition))
    nsh_new = src_cfg.num_shards if num_shards is None else int(num_shards)
    if dpp_new <= 0 or nsh_new <= 0:
        raise ValueError("docs_per_partition and num_shards must be "
                         f"positive (got {dpp_new}, {nsh_new})")
    cfg = dataclasses.replace(src_cfg, docs_per_partition=dpp_new,
                              num_shards=nsh_new)

    # Destination safety: never delete anything that is not an index (or
    # this function's own crashed debris), and never let the destination
    # alias or contain the source we are about to read from.
    src_abs = os.path.realpath(src_dir)
    dst_abs = os.path.realpath(dst_dir)
    if (dst_abs == src_abs or src_abs.startswith(dst_abs + os.sep)
            or dst_abs.startswith(src_abs + os.sep)):
        # nested-INSIDE-src is just as fatal as containing it: the
        # compacted parquet would land where the source's recursive
        # docstore reads pick it up, silently corrupting the source
        raise ValueError("dst_dir must not be, contain, or live inside "
                         f"the source index ({dst_dir!r} vs {src_dir!r})")
    dst_manifest = os.path.join(dst_dir, "manifest.json")
    in_progress = os.path.join(dst_dir, "_COMPACTING.json")
    if os.path.exists(dst_dir):
        if os.path.exists(dst_manifest):
            if not overwrite:
                raise FileExistsError(f"{dst_dir} already holds an index "
                                      "(pass overwrite=True)")
        elif os.listdir(dst_dir) and not os.path.exists(in_progress):
            raise FileExistsError(
                f"{dst_dir} exists and is not an index — refusing to "
                "delete it (choose an empty/new destination)")
        shutil.rmtree(dst_dir)
    os.makedirs(dst_dir)
    atomic_write_json(in_progress, {"src": os.path.abspath(src_dir)})

    tpath = os.path.join(src_dir, "tombstones.json")
    tombs = np.array(sorted(set(read_json(tpath))) if os.path.exists(tpath)
                     else [], np.int64)
    if len(tombs) and (tombs[0] < 0 or tombs[-1] >= m["n_docs"]):
        raise ValueError("tombstone doc id out of range")

    stages: dict[str, dict] = {}
    fp = m["fingerprint"]
    tag = _build_tag(fp, cfg)
    if len(tombs):
        # purged outputs are FILTERED bytes: they must never satisfy a
        # full-build checkpoint for the same (fingerprint, config), so the
        # purge set is folded into the stage tag (build.py's tag contract:
        # a mismatched tag means "different build" and is cleared first)
        import hashlib
        tag = {**tag, "purged_docs": int(len(tombs)),
               "purged_md5": hashlib.md5(tombs.tobytes()).hexdigest()}

    # [1] conv offsets in the dense numbering.  A purged offsets table is
    # FILTERED bytes too — its meta must not claim the full-input
    # fingerprint, or build_index's offsets skip-check would adopt the
    # purged n_docs into a "fresh full build" (same reasoning as the
    # stage-tag purge marker above).
    meta_fp = fp if not len(tombs) else f"{fp}+purged:{tag['purged_md5']}"
    t0 = time.perf_counter()
    meta1 = _rewrite_conv_offsets(src_dir, dst_dir, tombs, meta_fp)
    n_docs = meta1["n_docs"]
    stages["offsets"] = {"seconds": round(time.perf_counter() - t0, 3),
                         **meta1}

    tombs_ref = ray.put(tombs)

    # [2] doc store: filter + renumber + repartition (streamed)
    t0 = time.perf_counter()
    docstore_dir = os.path.join(dst_dir, "docstore")
    ds = read_parquet_clean(os.path.join(src_dir, "docstore"),
                            file_extensions=["parquet"])
    (ds.map_batches(_make_docstore_fn(tombs_ref, cfg.docs_per_partition),
                    batch_format="pyarrow", batch_size=8192)
       .write_parquet(docstore_dir, partition_cols=["partition"],
                      compression=cfg.io_compression))
    atomic_write_json(os.path.join(docstore_dir, "_SUCCESS"), tag)
    stages["docstore"] = {"seconds": round(time.perf_counter() - t0, 3)}

    # [3] postings: decode old segments → shuffle → encode new cells.
    # Reuses the build's external-shuffle + per-cell-encode machinery,
    # which also re-emits the doclen sidecars and footer blooms.
    t0 = time.perf_counter()
    seg_paths = [os.path.join(src_dir, s["path"]) for s in m["segments"]]
    seg_meta_dir = os.path.join(dst_dir, "segments")
    os.makedirs(seg_meta_dir, exist_ok=True)
    atomic_write_json(os.path.join(seg_meta_dir, "_META.json"), tag)
    seg_cols = ["term", "df", "doc_bytes", "tf_bytes"]
    if getattr(cfg, "positional_fields", ()):
        # positional index: carry positions.  Decided by the CONFIG, not
        # a first-file schema sniff — a mixed directory (one segment
        # missing pos_bytes) must fail loudly here, not silently strip
        # every term's positions from the compacted output
        missing = [p for p in seg_paths
                   if "pos_bytes" not in pq.read_schema(p).names]
        if missing:
            raise ValueError(
                "positional index has segments without pos_bytes "
                f"(e.g. {os.path.basename(missing[0])}) — corrupt or "
                "mixed-schema directory; rebuild before compacting")
        seg_cols.append("pos_bytes")
    postings = (read_parquet_clean(
                    seg_paths,
                    columns=seg_cols)
                .map_batches(_make_decode_fn(tombs_ref,
                                             cfg.docs_per_partition,
                                             cfg.num_shards),
                             batch_format="pyarrow", batch_size=2048))
    _spill_postings(postings, os.path.join(dst_dir, "postings_spill"), tag,
                    cfg.io_compression)
    seg_rows = _encode_cells(dst_dir, cfg)
    stages["segments"] = {
        "seconds": round(time.perf_counter() - t0, 3),
        "n_segments": len(seg_rows),
        "n_postings": int(sum(r["n_postings"] for r in seg_rows))}

    # [4] manifest (same contract as build_index's)
    from .segments import segment_rel_path
    total_len = int(sum(r.get("cf_text", 0) for r in seg_rows))
    dpp = cfg.docs_per_partition
    n_parts = (n_docs + dpp - 1) // dpp
    manifest = {
        "version": MANIFEST_VERSION,
        "fingerprint": fp,
        "config": cfg.to_dict(),
        "input_files": m["input_files"],
        "n_docs": int(n_docs),
        "n_convs": int(meta1["n_convs"]),
        "total_len": total_len,
        "avgdl": (float(total_len) / n_docs) if n_docs else 0.0,
        "partitions": [{"pid": p, "base": p * dpp,
                        "count": min(dpp, n_docs - p * dpp)}
                       for p in range(n_parts)],
        "segments": [{"pid": int(r["pid"]), "shard": int(r["shard"]),
                      "path": segment_rel_path(int(r["pid"]),
                                               int(r["shard"])),
                      "n_terms": int(r["n_terms"]),
                      "n_postings": int(r["n_postings"]),
                      "cf_text": int(r.get("cf_text", 0))} for r in seg_rows],
        "stages": stages,
        "compaction": {"src": os.path.abspath(src_dir),
                       "purged_docs": int(len(tombs)),
                       "src_n_docs": int(m["n_docs"]),
                       "src_n_partitions": len(m["partitions"])},
    }
    atomic_write_json(dst_manifest, manifest)
    os.remove(in_progress)  # committed — dst is a complete index now
    _cleanup_spill(dst_dir)
    logger.info("compacted %s → %s: %d partitions → %d, purged %d docs",
                src_dir, dst_dir, len(m["partitions"]), n_parts, len(tombs))
    return manifest
