"""Versioned REPAIR / upsert: re-deliver existing turns in place.

Reference semantics (re-expressed, not ported):

- ``MiruPartitionAccessor.handleActivities`` (MiruPartitionAccessor.java:
  563-578) dedupes a delivery batch by time id keeping the HIGHEST
  ``version``, then splits hits (ids already allocated —
  ``timeIdIndex.lookup``, :594-650) from misses; hits are re-indexed
  under their EXISTING id (REPAIR), misses are appended.
- ``MiruIndexer`` "handles indexing of activity, including repair and
  removal, with synchronization and attention to versioning"
  (MiruIndexer.java:20); a re-delivery whose version is ``<=`` the stored
  version is DECLINED (MiruIndexer.java:143), and repairs also UNHIDE a
  previously removed doc (MiruIndexer.java:105).

Ray-Data-first shape: doc ids here are conv-offset based
(doc_id = conv_offset + turn_idx), so the id-reuse lookup is a streamed
probe of ``conv_offsets.parquet`` — no timeId index needed.  The repair
itself is bounded by the TOUCHED partitions, never the corpus:

[1] resolve   stream offsets row groups, resolve each repair row to its
              existing doc id (REPAIR cannot extend a conversation —
              that is append's job; unknown convs / out-of-range turns
              raise loudly)
[2] stage     one Ray task per touched partition consolidates that
              partition's docstore rows with the version-gated
              replacements applied (new version > stored version; a
              docstore without a ``version`` column stores version 0)
              into a staging file — the live index is untouched
[3] commit    sidecar (``pending_repair.json``) marks the swap; per
              partition the consolidated file replaces ALL existing
              docstore files via a directory-rename swap (open readers
              see the old file set or the new one, never both — the
              transient missing-dir instant is retried reader-side);
              segments + doclen sidecars are rebuilt
              from the docstore (the WAL / source-of-truth pattern the
              append path uses, so any crash/retry rewrites identical
              bytes); repaired doc ids are removed from tombstones
              (the unhide); manifest stats are recomputed and swapped
              atomically

Crash safety: staging files persist until the manifest commit, so a
crash after the sidecar is written is recovered by re-running the swap +
rebuild (idempotent — deterministic content).  ``recover_pending_repair``
performs that replay; ``repair_index`` calls it first, and readers refuse
to open a mid-repair index (engine checks the sidecar) rather than serve
a partition with duplicated rows.

At 100 TB the cost is O(touched partitions × docs_per_partition): each
repair batch rebuilds only the cells it touched, one Ray task per
partition, and nothing O(corpus) ever reaches the driver.
"""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..config import IndexConfig
from ..util import atomic_write_json, read_json, sorted_lookup
from .build import (doclen_rel_path, encode_cell_files, make_postings_fn,
                    postings_columns)
from .segments import segment_rel_path

REPAIR_SIDECAR = "pending_repair.json"
STAGING_DIR = "docstore_repair_staging"


class RepairAheadOfWAL(ValueError):
    """The repair batch references turns the index has not (yet) seen —
    unknown conversation or out-of-range turn.  For a sync RECEIVER this
    is a WAIT condition (the doc WAL is short after a sender crash), not
    a failure; everything else stays a plain ValueError so callers can
    discriminate by type instead of message text."""


def _resolve_doc_ids(index_dir: str, conv: np.ndarray,
                     turn: np.ndarray) -> np.ndarray:
    """conv-offset id reuse (the ``timeIdIndex.lookup`` analogue): stream
    the offsets file one row group at a time against the SORTED repair
    keys — O(row group + batch) memory, never O(conversations)."""
    order = np.argsort(conv, kind="stable")
    sc, st = conv[order], turn[order]
    out = np.full(len(conv), -1, np.int64)
    pf = pq.ParquetFile(os.path.join(index_dir, "conv_offsets.parquet"))
    for rg in range(pf.num_row_groups):
        t = pf.read_row_group(rg)
        oc = np.asarray(t["conv_id"].to_pandas(), dtype=object)
        hit, pos = sorted_lookup(oc, sc)
        if not hit.any():
            continue
        oo = t["offset"].to_numpy().astype(np.int64)
        on = t["cnt"].to_numpy().astype(np.int64)
        bad = hit & ((st < 0) | (st >= on[pos]))
        if bad.any():
            i = int(np.argmax(bad))
            raise RepairAheadOfWAL(
                f"repair row ({sc[i]!r}, turn {int(st[i])}) is outside the "
                "conversation's indexed extent — REPAIR re-indexes existing "
                "turns only; use append for new ones")
        out[order[hit]] = oo[pos[hit]] + st[hit]
    if (out < 0).any():
        i = int(np.argmax(out < 0))
        raise RepairAheadOfWAL(f"repair row references unknown conversation "
                               f"{conv[i]!r}")
    return out


def _read_partition_versioned(pdir: str) -> pa.Table:
    """Read one docstore partition dir preserving the ``version`` column
    across mixed-schema fragments.  ``ParquetDataset.read()`` takes its
    schema from the FIRST fragment, so once an append adds version-less
    files to a previously repaired partition (``append-*`` sorts before
    ``repair-*``), the repaired versions would be silently DROPPED and a
    stale re-delivery would pass the version gate — the exact DECLINE
    semantics (MiruIndexer.java:143) this module enforces.  Reading
    per-file and filling missing versions with 0 keeps the gate exact."""
    files = sorted(os.path.join(pdir, f) for f in os.listdir(pdir)
                   if f.endswith(".parquet"))
    parts = [pq.read_table(f) for f in files]
    if any("version" in t.schema.names for t in parts):
        parts = [t if "version" in t.schema.names
                 else t.append_column(
                     "version", pa.array(np.zeros(t.num_rows, np.int64)))
                 for t in parts]
        cols = parts[0].schema.names
        parts = [t.select(cols) for t in parts]
    return pa.concat_tables(parts, promote_options="default")


@ray.remote(num_cpus=1)
def _consolidate_partition(docstore_dir: str, staging: str, pid: int,
                           rep_ref) -> dict:
    """Consolidate ONE partition: docstore rows with version-gated
    replacements applied, written to staging.  Returns applied/skipped
    counts and the applied doc ids (bounded by the repair batch)."""
    rep: pa.Table = rep_ref  # Ray resolves the ObjectRef argument
    pdir = os.path.join(docstore_dir, f"partition={pid}")
    old = _read_partition_versioned(pdir)
    stored_ver = (old["version"].to_numpy(zero_copy_only=False)
                  .astype(np.int64)
                  if "version" in old.schema.names
                  else np.zeros(old.num_rows, np.int64))
    old_ids = old["doc_id"].to_numpy().astype(np.int64)
    o_order = np.argsort(old_ids, kind="stable")
    rep_ids = rep["doc_id"].to_numpy().astype(np.int64)
    hit, pos = sorted_lookup(old_ids[o_order], rep_ids)
    if not hit.all():
        i = int(np.argmax(~hit))
        raise ValueError(f"doc_id {int(rep_ids[i])} resolved from offsets "
                         "but missing from the docstore — index corrupt?")
    at = o_order[pos]
    new_ver = rep["version"].to_numpy().astype(np.int64)
    # the version gate (MiruIndexer.java:143): <= stored is DECLINED
    apply = new_ver > stored_ver[at]
    applied_ids = rep_ids[apply]
    n_skip = int((~apply).sum())
    if not apply.any():
        return {"pid": pid, "applied": 0, "skipped": n_skip,
                "applied_doc_ids": []}
    # consolidated content = unmatched old rows + replacement rows, both
    # cast to the UNION schema (old schema + version), sorted by doc_id
    out_schema = old.schema
    if "version" not in out_schema.names:
        out_schema = out_schema.append(pa.field("version", pa.int64()))
        old = old.append_column(
            "version", pa.array(np.zeros(old.num_rows, np.int64)))
    keep = np.ones(old.num_rows, bool)
    keep[at[apply]] = False
    rep_rows = rep.filter(pa.array(apply)).select(
        [f.name for f in out_schema])
    merged = pa.concat_tables(
        [old.filter(pa.array(keep)), rep_rows.cast(out_schema)])
    m_ids = merged["doc_id"].to_numpy().astype(np.int64)
    merged = merged.take(pa.array(np.argsort(m_ids, kind="stable")))
    os.makedirs(staging, exist_ok=True)
    path = os.path.join(staging, f"partition={pid}.parquet")
    pq.write_table(merged, path + ".tmp")
    os.replace(path + ".tmp", path)
    return {"pid": pid, "applied": int(apply.sum()), "skipped": n_skip,
            "applied_doc_ids": [int(d) for d in applied_ids]}


@ray.remote(num_cpus=1)
def _rebuild_partition(docstore_dir: str, index_dir: str, pid: int,
                       cfg_dict: dict) -> list[dict]:
    """Re-encode one partition's cells FROM THE DOC STORE (identical role
    to the append path's rebuild — idempotent, deterministic)."""
    cfg = IndexConfig.from_dict(cfg_dict)
    nsh = cfg.num_shards
    pdir = os.path.join(docstore_dir, f"partition={pid}")
    t = pq.ParquetDataset(pdir).read(columns=postings_columns(cfg))
    rows = make_postings_fn(cfg)(t)
    gkeys = rows["gkey"].to_numpy()
    out = []
    for shard in range(nsh):
        cell = rows.filter(pa.array(gkeys == pid * nsh + shard))
        if cell.num_rows == 0:
            for p in (segment_rel_path(pid, shard),
                      doclen_rel_path(pid, shard)):
                fp_ = os.path.join(index_dir, p)
                if os.path.exists(fp_):
                    os.remove(fp_)
            continue
        out.append(encode_cell_files(cell, index_dir, pid, shard,
                                     skip_if_exists=False))
    return out


def _finish_repair(index_dir: str, pending: dict) -> dict:
    """Phase [3]: swap staged partitions in, rebuild their segments,
    unhide repaired docs, commit the manifest.  Replayable — everything
    here is deterministic given the staging files (kept until commit)."""
    t0 = time.perf_counter()
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    cfg = IndexConfig.from_dict(manifest["config"])
    docstore_dir = os.path.join(index_dir, "docstore")
    staging = os.path.join(index_dir, STAGING_DIR)
    tag = pending["tag"]
    pids = [int(p) for p in pending["pids"]]

    for pid in pids:
        staged = os.path.join(staging, f"partition={pid}.parquet")
        if not os.path.exists(staged):
            raise RuntimeError(
                f"pending repair {tag} lost its staging file for partition "
                f"{pid}; cannot replay — restore from a replica or rebuild")
        dst_dir = os.path.join(docstore_dir, f"partition={pid}")
        # the swap dirs live under STAGING (not inside docstore/):
        # recursive docstore readers (doc_lengths, sync walks) must
        # never see a crash's leftover swap dir as extra content
        new_dir = os.path.join(staging, f"partition={pid}.new-{tag}")
        old_dir = os.path.join(staging, f"partition={pid}.old-{tag}")
        # DIRECTORY-rename swap: an already-open reader (the sidecar
        # guard only blocks NEW PartitionReaders) lists the partition
        # dir on every gather — publishing the consolidated file and
        # THEN deleting the old files in place would let a concurrent
        # gather read every touched doc twice.  With two renames the
        # reader sees either the old file set or the new one, never
        # both; the worst case is a transient missing-dir window that
        # PartitionReader._docstore_read absorbs with a short retry.
        # Replay-idempotent: every crash point below converges because
        # the staged content is deterministic.
        if os.path.exists(new_dir):
            shutil.rmtree(new_dir)
        os.makedirs(new_dir)
        shutil.copyfile(staged,
                        os.path.join(new_dir, f"repair-{tag}.parquet"))
        if os.path.exists(dst_dir):
            if os.path.exists(old_dir):  # crash after a completed swap
                shutil.rmtree(old_dir)   # → dst_dir is already the new
            os.rename(dst_dir, old_dir)  # content; re-swap is harmless
        os.rename(new_dir, dst_dir)
        shutil.rmtree(old_dir, ignore_errors=True)

    futs = [_rebuild_partition.remote(docstore_dir, index_dir, pid,
                                      manifest["config"])
            for pid in pids]
    new_rows = [{**r, "path": segment_rel_path(r["pid"], r["shard"])}
                for cells in ray.get(futs) for r in cells]

    # unhide (MiruIndexer.java:105): repaired docs leave the removal set
    unhide = set(int(d) for d in pending.get("applied_doc_ids", []))
    tpath = os.path.join(index_dir, "tombstones.json")
    if unhide and os.path.exists(tpath):
        left = [d for d in read_json(tpath) if d not in unhide]
        atomic_write_json(tpath, left)

    touched = set(pids)
    segments = [s for s in manifest["segments"]
                if s["pid"] not in touched] + new_rows
    segments.sort(key=lambda r: (r["pid"], r["shard"]))
    total_len = int(sum(s["cf_text"] for s in segments))
    out = dict(manifest)
    out.update({
        "total_len": total_len,
        "avgdl": total_len / out["n_docs"] if out["n_docs"] else 0.0,
        "segments": [{k: int(v) if isinstance(v, (int, np.integer)) else v
                      for k, v in s.items()} for s in segments],
    })
    # rebuilt partitions lost gather enrichment — retract their watermarks
    for gname, gstate in out.get("gather", {}).items():
        gstate["done_pids"] = [p for p in gstate.get("done_pids", [])
                               if p not in touched]
    # replay after a commit-crash must not double-record the repair.
    # applied_doc_ids rides into the manifest (bounded by the repair
    # batch, never the corpus) so a sync sender can REPLAY repairs to a
    # receiver whose copy of these docs already shipped
    # (MiruSyncSender replays REPAIR-type WAL entries)
    if not any(r.get("tag") == tag for r in out.get("repairs", [])):
        out.setdefault("repairs", []).append(
            {"tag": tag, "applied": int(pending["applied"]),
             "skipped": int(pending["skipped"]), "partitions": len(pids),
             "applied_doc_ids": [int(d) for d
                                 in pending["applied_doc_ids"]]})
    out.setdefault("stages", {})["repair"] = {
        "seconds": round(time.perf_counter() - t0, 3),
        "applied": int(pending["applied"]),
        "skipped": int(pending["skipped"]), "partitions": len(pids)}
    atomic_write_json(os.path.join(index_dir, "manifest.json"), out)
    os.remove(os.path.join(index_dir, REPAIR_SIDECAR))
    shutil.rmtree(staging, ignore_errors=True)
    return out


def recover_pending_repair(index_dir: str) -> dict | None:
    """Replay an interrupted repair (sidecar present).  Returns the new
    manifest, or None when no repair is pending."""
    sidecar = os.path.join(index_dir, REPAIR_SIDECAR)
    if not os.path.exists(sidecar):
        return None
    return _finish_repair(index_dir, read_json(sidecar))


def repair_index(index_dir: str, repair, *,
                 _crash_after_staging: bool = False) -> dict:
    """Apply a batch of versioned re-deliveries to an existing index.

    ``repair``: a pyarrow Table (or parquet path/list) carrying
    ``conv_id``, ``turn_idx``, an int64 ``version``, and EVERY docstore
    field column (the repaired row replaces the whole doc, like the
    reference's intern + ``setAndReady`` — MiruIndexer.java:127-135).
    Returns the updated manifest with ``stages.repair`` counts.
    """
    recover_pending_repair(index_dir)  # replay any interrupted repair
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    dpp = IndexConfig.from_dict(manifest["config"]).docs_per_partition

    if isinstance(repair, (str, list)):
        paths = [repair] if isinstance(repair, str) else list(repair)
        repair = pa.concat_tables(
            [pq.ParquetDataset(p).read() for p in paths])
    if "version" not in repair.schema.names:
        raise ValueError("repair rows must carry an explicit int64 "
                         "'version' column (the REPAIR gate compares it "
                         "against the stored version)")
    conv = np.asarray(repair["conv_id"].to_pandas(), dtype=object)
    turn = repair["turn_idx"].to_numpy().astype(np.int64)
    doc_id = _resolve_doc_ids(index_dir, conv, turn)
    ver = repair["version"].to_numpy().astype(np.int64)

    # in-batch dedupe keeping the HIGHEST version per doc, FIRST delivery
    # winning ties (handleActivities' uniques map replaces an entry only
    # on strictly-higher version, MiruPartitionAccessor.java:563-578)
    order = np.lexsort((-np.arange(len(ver)), ver, doc_id))
    last = np.ones(len(order), bool)
    last[:-1] = doc_id[order[:-1]] != doc_id[order[1:]]
    pick = order[last]
    repair = (repair.append_column("doc_id", pa.array(doc_id))
              .take(pa.array(np.sort(pick))))
    rep_ids = repair["doc_id"].to_numpy().astype(np.int64)

    staging = os.path.join(index_dir, STAGING_DIR)
    if os.path.exists(staging):  # leftovers of a crash BEFORE the sidecar
        shutil.rmtree(staging)
    pids = np.unique(rep_ids // dpp)
    docstore_dir = os.path.join(index_dir, "docstore")
    futs = []
    for pid in pids:
        sl = repair.filter(pa.array(rep_ids // dpp == pid))
        futs.append(_consolidate_partition.remote(
            docstore_dir, staging, int(pid), ray.put(sl)))
    results = ray.get(futs)

    applied = sum(r["applied"] for r in results)
    skipped = sum(r["skipped"] for r in results)
    if applied == 0:  # every row declined — the index is untouched
        shutil.rmtree(staging, ignore_errors=True)
        out = dict(manifest)
        out.setdefault("stages", {})["repair"] = {
            "seconds": 0.0, "applied": 0, "skipped": skipped,
            "partitions": 0}
        return out

    import hashlib
    ver2 = repair["version"].to_numpy().astype(np.int64)
    tag = hashlib.md5(np.stack([rep_ids, ver2]).tobytes()).hexdigest()[:16]
    pending = {"tag": tag,
               "pids": [r["pid"] for r in results if r["applied"]],
               "applied": applied, "skipped": skipped,
               "applied_doc_ids": sorted(
                   d for r in results for d in r["applied_doc_ids"])}
    atomic_write_json(os.path.join(index_dir, REPAIR_SIDECAR), pending)
    if _crash_after_staging:  # test hook: die at the commit point
        raise RuntimeError("simulated crash after repair staging")
    return _finish_repair(index_dir, pending)
