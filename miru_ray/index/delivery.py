"""Realtime delivery — push newly indexed doc ids to a consumer post-commit.

The reference notifies an external endpoint of freshly indexed activity
ids right after they land in a partition
(``MiruLocalHostedPartition.deliverRealtime:1306-1330`` collects the ids,
``miru-service/.../realtime/RoutingBirdRealtimeDelivery.java`` POSTs
them); delivery is at-least-once — a failed POST is retried, a crash
after the POST but before progress persists re-sends.

Ray-native: the manifest IS the commit point (both ``build_index`` and
``append_index`` finish by atomically writing it), and doc ids are
allocated densely ``[0, n_docs)`` with appends extending the tail — so
"what is new" is exactly ``[cursor, n_docs)`` and the durable delivery
cursor is one integer.  ``deliver_new`` walks that range per partition
(the reference also delivers per partition), hands each slice to the
sink, and only then advances the cursor:

- crash BEFORE the cursor write → the whole range re-delivers
  (at-least-once, exactly like the reference; sinks must be idempotent
  on (pid, lo, hi) — the bundled Parquet sink is);
- a second ``deliver_new`` after a clean one delivers nothing;
- a config-change rebuild resets the doc-id space → the ``doc_space``
  token (minted by a full build, inherited by appends) recorded beside
  the cursor detects it and restarts delivery from 0.

The id ranges come from the manifest alone — delivery never reads
segments or the docstore, so its cost is O(partitions touched), not
O(docs), at any corpus size.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..util import atomic_write_json, read_json


def _cursor_path(index_dir: str) -> str:
    return os.path.join(index_dir, "delivery", "cursor.json")


def deliver_new(index_dir: str, sink) -> dict:
    """Deliver every doc id indexed since the last delivery to ``sink``.

    ``sink.deliver(pid, lo, hi)`` receives each new contiguous id range
    (``lo`` inclusive, ``hi`` exclusive) partition by partition, in id
    order.  Returns ``{"delivered": n, "ranges": k}``."""
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    n_docs = int(manifest["n_docs"])
    # pre-doc_space manifests fall back to the fingerprint, which changes
    # on every append → conservative full redelivery (safe: at-least-once)
    space = manifest.get("doc_space", manifest["fingerprint"])
    cpath = _cursor_path(index_dir)
    cur = 0
    if os.path.exists(cpath):
        c = read_json(cpath)
        if c.get("doc_space") == space:
            cur = int(c["delivered_docs"])
        # else: rebuilt index — old doc-id space is gone, start over
    if cur >= n_docs:
        return {"delivered": 0, "ranges": 0}
    # probe the sink's signature ONCE — a try/except TypeError around
    # the call would also swallow TypeErrors raised INSIDE a modern
    # sink's deliver body and silently re-deliver under the legacy
    # empty namespace
    import inspect
    try:
        params = inspect.signature(sink.deliver).parameters
        legacy = ("doc_space" not in params
                  and not any(p.kind is inspect.Parameter.VAR_KEYWORD
                              for p in params.values()))
    except (TypeError, ValueError):  # builtins/C callables: assume modern
        legacy = False
    ranges = 0
    for p in manifest["partitions"]:
        lo = max(int(p["base"]), cur)
        hi = min(int(p["base"]) + int(p["count"]), n_docs)
        if lo < hi:
            if legacy:  # 3-arg sink: no space namespacing
                sink.deliver(int(p["pid"]), lo, hi)
            else:
                sink.deliver(int(p["pid"]), lo, hi, doc_space=str(space))
            ranges += 1
    os.makedirs(os.path.dirname(cpath), exist_ok=True)
    atomic_write_json(cpath, {"delivered_docs": n_docs, "doc_space": space})
    return {"delivered": n_docs - cur, "ranges": ranges}


class ParquetDeliverySink:
    """Durable default sink: one Parquet log of delivered ranges.

    Idempotent on re-delivery — ranges are keyed by (doc_space, pid,
    lo): a duplicate REPLACES the same file, and so does the widened
    re-delivery after a crash-before-cursor followed by an append (the
    cursor did not advance, so the wider range re-starts at the SAME lo
    and supersedes the stale narrower file — keying on hi too would
    leave both [lo, 25) and [lo, 40) on disk and double-count
    [lo, 25)).  At-least-once upstream thus yields exactly-once on disk
    (the consumer-side dedupe the reference asks of its endpoints).
    The DOC SPACE is part of the key: a config-change rebuild reuses
    doc ids with new meanings, so ranges from different spaces must
    never be conflated — :meth:`delivered` returns only the NEWEST
    space's rows by default (old-space ranges describe ids that no
    longer exist)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def deliver(self, pid: int, lo: int, hi: int,
                doc_space: str = "") -> None:
        import hashlib
        tag = hashlib.md5(doc_space.encode()).hexdigest()[:10]
        t = pa.table({"doc_space": pa.array([doc_space], pa.string()),
                      "pid": pa.array([pid], pa.int64()),
                      "doc_lo": pa.array([lo], pa.int64()),
                      "doc_hi": pa.array([hi], pa.int64())})
        path = os.path.join(
            self.out_dir,
            f"range-{tag}-{pid:06d}-{lo:012d}.parquet")
        tmp = f"{path}.{os.getpid()}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        # supersede any hi-suffixed files an OLDER writer left for this
        # (space, pid, lo) key — they carry a different filename, so the
        # os.replace above would otherwise leave both [lo, hi_old) and
        # [lo, hi_new) on disk and delivered() would double-count the
        # overlap
        import glob
        prefix = glob.escape(path[:-len(".parquet")])  # out_dir may hold
        for stale in glob.glob(f"{prefix}-*.parquet"):  # glob metachars
            os.remove(stale)
        # remember the newest space (file mtime order is not durable)
        atomic_write_json(os.path.join(self.out_dir, "_space.json"),
                          {"doc_space": doc_space})

    def delivered(self, doc_space: str | None = None) -> pa.Table:
        """Ranges of ONE doc space: the newest delivered (default) or an
        explicit ``doc_space``.  Pass ``doc_space=""`` for legacy rows
        written by a 3-arg deliver call."""
        empty = pa.table({"doc_space": pa.array([], pa.string()),
                          "pid": pa.array([], pa.int64()),
                          "doc_lo": pa.array([], pa.int64()),
                          "doc_hi": pa.array([], pa.int64())})
        files = sorted(os.path.join(self.out_dir, f)
                       for f in os.listdir(self.out_dir)
                       if f.endswith(".parquet"))
        if not files:
            return empty
        t = pa.concat_tables(pq.read_table(f) for f in files)
        if doc_space is None:
            spath = os.path.join(self.out_dir, "_space.json")
            doc_space = (read_json(spath)["doc_space"]
                         if os.path.exists(spath) else "")
        import pyarrow.compute as pc
        return t.filter(pc.equal(t["doc_space"], doc_space))
