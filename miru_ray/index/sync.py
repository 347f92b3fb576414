"""Index replication with durable progress + verification — the sync
sender analogue.

Reference: ``MiruSyncSender`` replicates tenant partitions across clusters
with durable per-(tenant, partition) progress and cursors
(``miru-sync-deployable/.../MiruSyncSender.java:74``, progress scan
226-241, cursors 255-280).

Here an index directory is a set of immutable content files plus one
manifest: :func:`sync_index` copies every file with a sha256 recorded in a
durable progress sidecar at the destination, skipping files already copied
with a matching hash (resume), and commits the manifest LAST so a reader
never sees a half-synced index.  :func:`verify_sync` re-hashes the
destination against the recorded hashes — the segment-copy/verify tool the
reference's operators run after replication.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa

from ..util import atomic_write_json, read_json

PROGRESS = "sync_progress.json"


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while chunk := f.read(1 << 20):
            h.update(chunk)
    return h.hexdigest()


def _index_files(src_dir: str) -> list[str]:
    """Every content file of an index, manifest EXCLUDED (committed last)."""
    out = []
    for root, _dirs, files in os.walk(src_dir):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), src_dir)
            if rel in ("manifest.json", PROGRESS):
                continue
            if rel.startswith(("postings_spill", "docstore_append_staging",
                               "pending_append")):
                continue  # transient build state, not index content
            if ".tmp." in f or f.endswith(".sync_tmp"):
                continue  # orphaned atomic-write temps from killed tasks
            out.append(rel)
    return sorted(out)


def sync_index(src_dir: str, dst_dir: str) -> dict:
    """Copy ``src_dir`` → ``dst_dir`` incrementally.  Returns stats.

    Durable progress: ``sync_progress.json`` in the destination records
    (relpath → sha256) of every completed copy; a re-run copies only
    missing or changed files (the cursor semantics).  The manifest is
    written after every content copy (the atomic commit) and stale files
    are swept only AFTER it — at no point does a committed manifest
    reference a deleted file.

    Consistency window: re-syncing onto a replica that is concurrently
    SERVING queries can expose mixed-version segment files until the
    final manifest write (same-path segments are replaced in place).
    Quiesce readers during re-sync, or sync into a fresh directory and
    swap — the reference likewise serves replicas that are offline while
    rebuilding (``MiruPartitionState`` bootstrap→online).
    """
    if not os.path.exists(os.path.join(src_dir, "manifest.json")):
        raise FileNotFoundError(f"no manifest in {src_dir}")
    src_abs = os.path.realpath(src_dir)
    dst_abs = os.path.realpath(dst_dir)
    if dst_abs == src_abs or dst_abs.startswith(src_abs + os.sep):
        # a destination inside the source would be walked as source
        # content on the NEXT sync, snowballing the tree (same guard as
        # compact_index's destination check)
        raise ValueError(f"sync destination {dst_dir!r} must not alias "
                         f"or nest inside the source {src_dir!r}")
    os.makedirs(dst_dir, exist_ok=True)
    ppath = os.path.join(dst_dir, PROGRESS)
    progress: dict[str, str] = (read_json(ppath)
                                if os.path.exists(ppath) else {})
    copied = skipped = 0
    for rel in _index_files(src_dir):
        sp = os.path.join(src_dir, rel)
        dp = os.path.join(dst_dir, rel)
        want = _sha256(sp)
        # skip only when the DESTINATION bytes verify — a lost or corrupted
        # replica file is repaired on the next sync pass
        if os.path.exists(dp) and _sha256(dp) == want:
            if progress.get(rel) != want:
                progress[rel] = want
                atomic_write_json(ppath, progress)
            skipped += 1
            continue
        os.makedirs(os.path.dirname(dp), exist_ok=True)
        tmp = dp + ".sync_tmp"
        shutil.copyfile(sp, tmp)
        if _sha256(tmp) != want:  # read/write verification
            os.remove(tmp)
            raise IOError(f"copy verification failed for {rel}")
        os.replace(tmp, dp)
        progress[rel] = want
        atomic_write_json(ppath, progress)  # durable per-file cursor
        copied += 1
    # commit the manifest FIRST, then drop destination files that no
    # longer exist at the source (superseded segments): the new manifest
    # doesn't reference them, so a crash (or a concurrent reader) between
    # the two steps never sees a committed manifest pointing at deleted
    # files — stale leftovers are merely re-swept on the next sync
    shutil.copyfile(os.path.join(src_dir, "manifest.json"),
                    os.path.join(dst_dir, "manifest.json.sync_tmp"))
    os.replace(os.path.join(dst_dir, "manifest.json.sync_tmp"),
               os.path.join(dst_dir, "manifest.json"))
    removed = 0
    for rel in list(progress):
        if not os.path.exists(os.path.join(src_dir, rel)):
            p = os.path.join(dst_dir, rel)
            if os.path.exists(p):
                os.remove(p)
            del progress[rel]
            removed += 1
    if removed:
        atomic_write_json(ppath, progress)
    return {"copied": copied, "skipped": skipped, "removed": removed,
            "n_files": len(progress)}


def verify_sync(dst_dir: str) -> dict:
    """Re-hash every synced file against the recorded progress hashes."""
    ppath = os.path.join(dst_dir, PROGRESS)
    if not os.path.exists(ppath):
        return {"n_files": 0, "bad": [], "ok": False,
                "error": "no sync progress found — destination never synced"}
    progress = read_json(ppath)
    bad = [rel for rel, want in progress.items()
           if not os.path.exists(os.path.join(dst_dir, rel))
           or _sha256(os.path.join(dst_dir, rel)) != want]
    return {"n_files": len(progress), "bad": sorted(bad),
            "ok": not bad}


# ---------------------------------------------------------------------------
# tenant-level sync protocol: sender / receiver pair (two-cluster sync)
# ---------------------------------------------------------------------------

class SyncReceiver:
    """Destination-cluster ingress — the ``MiruSyncReceiver`` analogue
    (``miru-sync-deployable/.../MiruSyncReceiver.java:57-78``: received
    activity batches land in the destination's OWN WAL and writer
    cursors advance; the destination indexes from that WAL).

    Here the WAL is a per-tenant directory of numbered parquet shards
    (append-only, one shard per received batch) plus a durable
    ``sync_state.json`` cursor recording every persisted batch label and
    its row count.  ``write_activity`` is IDEMPOTENT per label: a
    re-delivered batch (sender retry after a crash) is acknowledged
    without rewriting — at-least-once delivery + idempotent persistence
    = exactly-once effect.  ``commit`` indexes the accumulated WAL via
    the incremental build (first commit = full build, later commits
    append only the new shards) and registers the tenant in the
    destination :class:`~miru_ray.index.tenants.TenantRegistry`.
    """

    def __init__(self, root: str):
        from .tenants import TenantRegistry
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.registry = TenantRegistry(os.path.join(root, "registry"))

    # -------- durable per-tenant cursor --------

    def _tdir(self, tenant: str) -> str:
        return os.path.join(self.root, "tenants", tenant)

    def _state_path(self, tenant: str) -> str:
        return os.path.join(self._tdir(tenant), "sync_state.json")

    def progress(self, tenant: str) -> dict:
        """The sender's resume point: persisted batch labels + the row
        high-watermark (docs ship in doc-id order exactly once, so
        Σ persisted rows IS the next doc id to ship — the per-(tenant,
        partition) cursor of ``MiruSyncSender.java:255-280``)."""
        p = self._state_path(tenant)
        if not os.path.exists(p):
            return {"batches": {}, "rows_persisted": 0, "commits": 0}
        return read_json(p)

    def bind_space(self, tenant: str, doc_space: str,
                   force: bool = False) -> None:
        """Pin the source doc-id space this tenant's WAL belongs to.

        Doc ids are only meaningful WITHIN one build's id space (a
        rebuild mints a fresh ``manifest['doc_space']`` because it may
        reuse ids with new meanings — ``build.py:981``); mixing batches
        from two spaces in one WAL would build a silently-divergent
        index.  First bind records the space; a later bind with a
        DIFFERENT space refuses while any rows are persisted — the
        operator must reset the tenant dir for a fresh initial sync."""
        state = self.progress(tenant)
        have = state.get("doc_space")
        if have == doc_space:
            return
        if int(state.get("rows_persisted", 0)) > 0:
            if have is None and not force:
                # pre-guard state: rows were persisted before doc_space
                # recording existed, so whether they belong to the
                # source's CURRENT space cannot be verified — refusing
                # here is the same mixed-space protection; an operator
                # certain the source was never rebuilt passes force=True
                raise RuntimeError(
                    f"tenant {tenant!r} WAL holds "
                    f"{state['rows_persisted']} rows persisted before "
                    "doc-space recording; cannot verify they belong to "
                    f"the source's current space {doc_space!r} — reset "
                    "the receiver tenant dir for a fresh initial sync, "
                    "or bind_space(..., force=True) if the source was "
                    "never rebuilt")
            if have is not None:
                # a KNOWN mismatch is never forceable — the rows
                # verifiably belong to another space
                raise RuntimeError(
                    f"tenant {tenant!r} WAL holds rows from doc space "
                    f"{have!r} but the source now serves {doc_space!r} "
                    "(the source index was rebuilt); forward sync would "
                    "mix two incompatible doc-id spaces — reset the "
                    "receiver tenant dir for a fresh initial sync")
        os.makedirs(self._tdir(tenant), exist_ok=True)
        state["doc_space"] = doc_space
        atomic_write_json(self._state_path(tenant), state)

    def _write_labeled(self, tenant: str, label: str, table,
                       subdir: str, state_key: str) -> bool:
        """The ONE labeled-batch persistence protocol (check label →
        parquet via .sync_tmp → atomic replace → record in state):
        shared by doc and REPAIR batches so the durability semantics
        can never fork."""
        import pyarrow.parquet as pq
        state = self.progress(tenant)
        staged = state.setdefault(state_key, {})
        if label in staged:
            return False
        wal = os.path.join(self._tdir(tenant), subdir)
        os.makedirs(wal, exist_ok=True)
        path = os.path.join(wal, f"batch-{label}.parquet")
        pq.write_table(table, path + ".sync_tmp")
        os.replace(path + ".sync_tmp", path)
        staged[label] = table.num_rows
        if state_key == "batches":
            state["rows_persisted"] = int(sum(staged.values()))
        atomic_write_json(self._state_path(tenant), state)
        return True

    def write_activity(self, tenant: str, label: str, table) -> bool:
        """Persist one batch under ``label``.  Returns False when the
        label was already persisted (idempotent retry)."""
        return self._write_labeled(tenant, label, table, "wal", "batches")

    def write_repair(self, tenant: str, label: str, table) -> bool:
        """Persist one replayed REPAIR batch (the sender's re-delivery
        of docs repaired at the source AFTER they shipped — the
        REPAIR-type WAL entry of the reference's sync protocol).
        Labeled and idempotent exactly like ``write_activity``; the
        batch is APPLIED to the destination index at the next
        ``commit`` (in label order = source repair order)."""
        return self._write_labeled(tenant, label, table, "wal_repairs",
                                   "repair_batches")

    def commit(self, tenant: str, cfg) -> dict:
        """Index everything received so far and (re)register the tenant.
        Incremental: the build's sip path appends only WAL shards that
        were not part of the previous commit.  Staged REPAIR batches are
        then applied to the built index in label (= source) order; the
        version gate makes a repair whose content already shipped inside
        a doc batch a clean DECLINE, so replay is idempotent."""
        import pyarrow.parquet as pq

        from .build import build_index
        from .repair import RepairAheadOfWAL, repair_index
        wal = os.path.join(self._tdir(tenant), "wal")
        files = sorted(os.path.join(wal, f) for f in os.listdir(wal)
                       if f.endswith(".parquet"))
        idir = os.path.join(self._tdir(tenant), "index")
        manifest = build_index(files, idir, cfg)
        state = self.progress(tenant)
        applied = state.setdefault("repairs_applied", [])
        pending = [lb for lb in sorted(state.get("repair_batches", {}))
                   if lb not in applied]
        rwal = os.path.join(self._tdir(tenant), "wal_repairs")
        for label in pending:
            t = pq.read_table(os.path.join(rwal,
                                           f"batch-{label}.parquet"))
            try:
                manifest = repair_index(idir, t)
            except RepairAheadOfWAL:
                # the repair references convs not yet shipped (a sender
                # crash mid-sync left the doc WAL short) — keep it
                # staged and retry at the next commit; later labels
                # must wait too (repairs apply in source order).  Any
                # OTHER error (corrupt docstore, malformed batch) will
                # never heal by waiting and propagates: swallowing it
                # would silently block repair replay forever
                break
            applied.append(label)
        if (tenant not in self.registry.tenants()
                or self.registry.index_dir(tenant) != os.path.abspath(idir)):
            self.registry.register(tenant, idir, cfg)
        else:
            # same directory, new content: cached searchers are stale
            self.registry.evict(tenant)
        state["commits"] = int(state.get("commits", 0)) + 1
        state["committed_docs"] = int(manifest["n_docs"])
        atomic_write_json(self._state_path(tenant), state)
        return manifest


class SyncSender:
    """Source-cluster egress — the ``MiruSyncSender`` analogue: durable
    per-(tenant, partition) progress, ``initial`` (bootstrap the whole
    history) and ``forward`` (tail only new docs) modes
    (``MiruSyncSender.java:74`` ring, progress scan :226-241, cursors
    :255-280, forward/initial ProgressType :67-69).

    The source docstore is the WAL being tailed (it is this engine's
    source of truth).  Batches are cut DETERMINISTICALLY — per source
    partition, aligned to ``batch_rows`` boundaries from the receiver's
    row high-watermark — so a crashed sender re-cuts byte-identical
    batches on restart and the receiver's label dedupe turns the retry
    into a no-op.  Nothing O(corpus) is held anywhere: one partition's
    rows in memory at a time, shipped in bounded batches.

    REPAIR replay: docs repaired at the source AFTER they shipped are
    re-delivered as labeled REPAIR batches (the reference replays
    REPAIR-type WAL entries) — each manifest ``repairs`` entry carries
    its applied doc ids, the sender gathers those docs' CURRENT rows
    (latest version — replaying an old repair with newer content is
    harmless, the version gate keeps the newest) and the receiver
    applies them through its own ``repair_index`` at commit.  Manifest
    repair entries from before applied_doc_ids was recorded cannot be
    replayed; those raise, and the tenant re-converges via a fresh
    initial sync.
    """

    def __init__(self, src_registry, receiver: SyncReceiver,
                 batch_rows: int = 100_000):
        self.registry = src_registry
        self.receiver = receiver
        self.batch_rows = int(batch_rows)

    def sync_tenant(self, tenant: str, commit: bool = True,
                    _crash_after_batches: int | None = None) -> dict:
        import numpy as np
        import pyarrow.parquet as pq
        idir = self.registry.index_dir(tenant)
        if os.path.exists(os.path.join(idir, "pending_repair.json")):
            # same rule as PartitionReader.__init__: a mid-repair
            # docstore can hold every touched doc twice, and the
            # receiver's label dedupe would make shipped corruption
            # PERMANENT (those labels are never re-accepted) — refuse
            # and let the caller replay recover_pending_repair() first
            raise RuntimeError(
                f"source index for tenant {tenant!r} has an interrupted "
                "REPAIR pending; run recover_pending_repair() before "
                "syncing")
        manifest = read_json(os.path.join(idir, "manifest.json"))
        # pin the doc-id space FIRST: a rebuilt source mints a new
        # doc_space and its ids are meaningless against this tenant's
        # existing WAL — bind_space refuses the mix loudly instead of
        # letting forward mode ship new-space rows after an old-space
        # watermark (the same invariant delivery.py keys its cursor on)
        self.receiver.bind_space(tenant, manifest.get("doc_space", ""))
        state = self.receiver.progress(tenant)
        watermark = int(state.get("rows_persisted", 0))
        mode = "initial" if watermark == 0 else "forward"
        n_docs = int(manifest["n_docs"])
        sent = skipped = rows = 0
        for part in manifest["partitions"]:
            pid, base, count = part["pid"], part["base"], part["count"]
            if base + count <= watermark:
                continue  # fully shipped (the per-partition cursor)
            # per-file read with version normalization: a partition
            # mixing version-less append files with versioned repair
            # files must not ship with the version column silently
            # dropped (ParquetDataset takes the FIRST fragment's schema)
            from .repair import _read_partition_versioned
            t = _read_partition_versioned(os.path.join(
                idir, "docstore", f"partition={pid}"))
            ids = t["doc_id"].to_numpy().astype(np.int64)
            t = t.take(pa.array(np.argsort(ids, kind="stable")))
            start = max(base, watermark)
            while start < base + count:
                stop = min(start + self.batch_rows, base + count)
                batch = t.slice(start - base, stop - start)
                batch = batch.drop_columns(
                    [c for c in ("doc_id",) if c in batch.schema.names])
                label = f"{pid:05d}-{start:012d}"
                if self.receiver.write_activity(tenant, label, batch):
                    sent += 1
                    rows += stop - start
                else:
                    skipped += 1
                start = stop
                if (_crash_after_batches is not None
                        and sent >= _crash_after_batches):
                    raise RuntimeError("simulated sender crash mid-sync")
        rep_sent, rep_skipped = self._ship_repairs(tenant, idir, manifest)
        out = {"tenant": tenant, "mode": mode, "batches_sent": sent,
               "batches_skipped": skipped, "rows": rows,
               "watermark": watermark, "n_docs": n_docs,
               "repairs_sent": rep_sent, "repairs_skipped": rep_skipped}
        if commit:
            m = self.receiver.commit(tenant, self.registry.config(tenant))
            out["committed_docs"] = int(m["n_docs"])
        return out

    def _ship_repairs(self, tenant: str, idir: str,
                      manifest: dict) -> tuple[int, int]:
        """Replay the source's committed REPAIRs to the receiver (the
        REPAIR-type WAL entries of the reference protocol).  One labeled
        batch per manifest ``repairs`` entry, in source order — the
        label embeds the entry index so receiver-side application sorts
        back into that order.  Rows are the repaired docs' CURRENT
        docstore content: a superseded repair ships newer content under
        an older label, which the receiver's version gate resolves to
        the same end state as the source."""
        import numpy as np
        reps = manifest.get("repairs", [])
        if not reps:
            return 0, 0
        from .repair import _read_partition_versioned
        from ..config import IndexConfig
        state = self.receiver.progress(tenant)
        staged = set(state.get("repair_batches", {}))
        dpp = IndexConfig.from_dict(manifest["config"]).docs_per_partition
        sent = skipped = 0
        # many small repair entries often touch the same hot partition —
        # cache the per-partition read across the entry loop (bounded
        # FIFO: one sync never holds more than a few partitions)
        part_cache: dict[int, pa.Table] = {}
        for i, rep in enumerate(reps):
            label = f"{i:06d}-{rep['tag']}"
            if label in staged:
                skipped += 1
                continue
            if "applied_doc_ids" not in rep:
                raise RuntimeError(
                    f"source repair {rep['tag']} predates applied_doc_ids "
                    "recording and cannot be replayed; reset the "
                    "receiver's tenant dir for a fresh initial sync")
            ids = np.asarray(sorted(rep["applied_doc_ids"]), np.int64)
            parts = []
            for pid in np.unique(ids // dpp):
                pid = int(pid)
                if pid not in part_cache:
                    while len(part_cache) >= 4:
                        part_cache.pop(next(iter(part_cache)))
                    part_cache[pid] = _read_partition_versioned(
                        os.path.join(idir, "docstore", f"partition={pid}"))
                t = part_cache[pid]
                mask = np.isin(t["doc_id"].to_numpy().astype(np.int64),
                               ids)
                parts.append(t.filter(pa.array(mask)))
            batch = pa.concat_tables(parts)
            batch = batch.sort_by("doc_id").drop_columns(["doc_id"])
            if self.receiver.write_repair(tenant, label, batch):
                sent += 1
            else:
                skipped += 1
        return sent, skipped

    def sync_all(self, commit: bool = True) -> list[dict]:
        return [self.sync_tenant(t, commit=commit)
                for t in self.registry.tenants()]
