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
