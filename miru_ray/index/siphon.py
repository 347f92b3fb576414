"""Typed Siphon contract — WAL → external-system activity transforms.

Reference: ``MiruSiphonPlugin`` (``miru-siphon-api/.../query/siphon/
MiruSiphonPlugin.java:11-25``) — a named plugin exposing an output
``schema()`` and a ``siphon(...)`` callback that turns WAL rows
(key/value/timestamp/tombstoned) into a ``ListMultimap<MiruTenantId,
MiruActivity>``; ``AmzaSiphoner.siphon`` drives it from a durable
per-member transaction cursor and flushes per destination tenant
(``miru-siphon-deployable/.../siphoner/AmzaSiphoner.java:111-180``,
cursor ``AmzaSiphonCursor.java:11-20``).

Ray-Data-native equivalent:

- The WAL is the doc store (immutable parquet per index partition — the
  same rebuild-source-of-truth role the Amza WAL plays).
- A :class:`SiphonPlugin` declares ``name``, an Arrow output ``schema()``
  and a vectorized ``siphon(batch) -> Table`` whose output carries a
  ``tenant`` routing column (the multimap key) plus exactly the declared
  activity columns.
- :func:`run_siphon` streams each un-siphoned partition through the
  plugin with ``map_batches`` and flushes tenant-partitioned parquet with
  DETERMINISTIC file names (``tenant=<t>/p<pid>.parquet``) so a retried
  or re-executed flush overwrites instead of duplicating.
- The cursor is ``siphon.<name>.json`` next to the OUTPUT (destination-
  scoped, like the reference's per-siphoner-instance cursor row): a map
  ``pid -> (doc_count, tombstone_count)`` fingerprint taken at flush
  time.  A partition is skipped only while its fingerprint still
  matches — ``append_index`` rebuilds the partially-filled boundary
  partition in place (its doc count grows) and ``remove_docs`` adds
  tombstones, and either change re-flushes that partition (the
  deterministic per-tenant file name makes the re-flush an overwrite,
  never a duplicate).  This is the watermark-retraction rule the gather
  hook applies on append, enforced from the destination side.  A crashed
  run resumes at the first unflushed partition; a completed run
  re-invoked is a no-op; a fresh destination exports from scratch.

Scale: one flush task per index partition (the reference's batchSize maps
to Ray's batch size within the partition read); no driver-side row
traffic — counters are the only thing returned.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray

from ..util import atomic_write_json, read_json


class SiphonPlugin:
    """Subclass contract (the typed ``MiruSiphonPlugin`` analogue).

    ``name``: unique siphon name (cursor key + output namespace).
    ``columns``: doc-store columns the transform needs (pruned read).
    ``schema()``: Arrow schema of ONE activity row (without the routing
    column) — validated against every output batch.
    ``siphon(batch)``: vectorized WAL-rows → activities transform.  The
    input batch is ``doc_id`` + ``columns`` + ``tombstoned`` (bool, from
    the index removal list — ``valueTombstoned`` in the reference
    callback).  Returns a table with a ``tenant`` string column followed
    by exactly ``schema()``'s columns; rows may be 0..n per input row.
    """

    name: str = "siphon"
    columns: tuple = ()

    def schema(self) -> pa.Schema:
        raise NotImplementedError

    def siphon(self, batch: pa.Table) -> pa.Table:
        raise NotImplementedError


class RoleRouteSiphon(SiphonPlugin):
    """Built-in demo plugin: route every LIVE turn to the destination
    tenant named by its ``role`` keyword field, emitting a minimal
    activity (doc_id, conv_id, ts) — the shape of the reference's
    per-tenant ``MiruActivity`` fan-out (``MiruSiphonPlugin.siphon``
    returning a tenant-keyed multimap).  Tombstoned rows flush nothing
    (``valueTombstoned`` handling)."""

    name = "role_route"
    columns = ("conv_id", "role", "ts")

    def schema(self) -> pa.Schema:
        return pa.schema([("doc_id", pa.int64()), ("conv_id", pa.string()),
                          ("ts", pa.timestamp("us"))])

    def siphon(self, batch: pa.Table) -> pa.Table:
        live = batch.filter(pc.invert(batch["tombstoned"]))
        return pa.table({"tenant": live["role"], "doc_id": live["doc_id"],
                         "conv_id": live["conv_id"], "ts": live["ts"]})


@dataclass(frozen=True)
class SiphonResult:
    called: int       # partitions visited this run
    siphoned: int     # input WAL rows transformed
    flushed: int      # activity rows written
    skipped: int      # partitions already covered by the cursor


def _cursor_path(out_root: str, name: str) -> str:
    return os.path.join(out_root, f"siphon.{name}.json")


def tenant_dirname(tenant) -> str:
    """Hive dirname for a plugin-supplied tenant value.  Tenants route on
    FREE-TEXT columns, so the value is percent-encoded (safe='') before it
    touches a path: '/', '\\\\', '=', '..' and every other separator are
    escaped, which keeps the value inside ``out_root`` and keeps the
    stale-file cleanup's ``d.split('=', 1)`` parsing unambiguous."""
    from urllib.parse import quote
    # also escape '.' (quote() treats it as unreserved) so a literal '..'
    # can never appear anywhere in the dirname
    return "tenant=" + quote(str(tenant), safe="").replace(".", "%2E")


def tenant_from_dirname(d: str) -> str:
    """Inverse of :func:`tenant_dirname` (without the ``tenant=`` prefix)."""
    from urllib.parse import unquote
    return unquote(d.split("=", 1)[1])


def run_siphon(index_dir: str, plugin: SiphonPlugin, out_root: str,
               _crash_after_pids: int | None = None) -> SiphonResult:
    """Drive ``plugin`` over every un-siphoned doc-store partition.

    ``_crash_after_pids`` is a test hook simulating a crash mid-run (the
    cursor must make the next invocation resume, not redo).
    """
    manifest = read_json(os.path.join(index_dir, "manifest.json"))
    state = (read_json(_cursor_path(out_root, plugin.name))
             if os.path.exists(_cursor_path(out_root, plugin.name))
             else {"done": {}, "flushed": 0})
    # legacy bare-pid cursors carry no fingerprint: treat as empty (the
    # re-export is an idempotent overwrite, never a duplicate)
    done: dict[str, list] = dict(state.get("done", {}))
    tomb = np.array(sorted(read_json(os.path.join(index_dir, "tombstones.json")))
                    if os.path.exists(os.path.join(index_dir, "tombstones.json"))
                    else [], np.int64)

    def _fp(part: dict) -> list:
        """Per-partition change fingerprint: (doc count, tombstones in
        range).  append_index only ever grows a partition's count and
        remove only ever adds tombstones, so equality ⇔ unchanged."""
        base, count = part["base"], part["count"]
        n_dead = int(np.searchsorted(tomb, base + count)
                     - np.searchsorted(tomb, base)) if len(tomb) else 0
        return [count, n_dead]

    fps = {p["pid"]: _fp(p) for p in manifest["partitions"]}
    cols = ["doc_id"] + [c for c in plugin.columns if c != "doc_id"]
    out_schema = plugin.schema()
    pids = [p["pid"] for p in manifest["partitions"]]
    os.makedirs(out_root, exist_ok=True)

    # plugin ships BY VALUE — unconditionally, including miru_ray-defined
    # plugins: the driver may import this package from a path the Ray
    # workers don't have (the graft driver runs from an arbitrary cwd), so
    # nothing worker-executed may import miru_ray at runtime
    import inspect

    import cloudpickle
    import sys
    mod = inspect.getmodule(type(plugin))
    this_mod = sys.modules[__name__]
    registered = []
    try:
        if mod is not None and mod.__name__ != "__main__":
            cloudpickle.register_pickle_by_value(mod)
            registered.append(mod)
        payload = cloudpickle.dumps(plugin)
        # tenant_dirname must ALSO cross by value: a bare reference from
        # the task body would pickle as "import miru_ray.index.siphon"
        # on the worker (cloudpickle serializes module-level globals by
        # reference), breaking the arbitrary-cwd contract above
        if this_mod not in registered:
            cloudpickle.register_pickle_by_value(this_mod)
            registered.append(this_mod)
        dirname_payload = cloudpickle.dumps(tenant_dirname)
    finally:
        for m in registered:
            cloudpickle.unregister_pickle_by_value(m)
    schema_payload = cloudpickle.dumps(out_schema)

    @ray.remote(num_cpus=1)
    def flush_partition(pid: int) -> tuple[int, int]:
        plug = cloudpickle.loads(payload)
        schema = cloudpickle.loads(schema_payload)
        dirname = cloudpickle.loads(dirname_payload)
        t = pq.ParquetDataset(
            os.path.join(index_dir, "docstore", f"partition={pid}")
        ).read(columns=cols)
        did = t["doc_id"].to_numpy()
        dead = np.zeros(len(did), bool)
        if len(tomb):
            pos = np.searchsorted(tomb, did)
            hit = pos < len(tomb)
            dead[hit] = tomb[pos[hit]] == did[hit]
        batch = t.append_column("tombstoned", pa.array(dead))
        out = plug.siphon(batch)
        want = ["tenant"] + schema.names
        if out.column_names != want:
            raise ValueError(
                f"siphon {plug.name!r} produced columns {out.column_names}, "
                f"declared tenant+{schema.names}")
        out = pa.table(
            [out["tenant"]] + [out[n].cast(schema.field(n).type)
                               for n in schema.names],
            names=want)
        n_flushed = 0
        written = set()
        for tenant in pc.unique(out["tenant"]).to_pylist():
            rows = out.filter(pc.equal(out["tenant"], tenant))
            dname = dirname(tenant)
            tdir = os.path.join(out_root, dname)
            os.makedirs(tdir, exist_ok=True)
            # deterministic name: a re-executed flush overwrites, never
            # appends (exported side-effect writes must be idempotent)
            tmp = os.path.join(tdir, f".p{pid:05d}.parquet.tmp")
            pq.write_table(rows.drop(["tenant"]), tmp)
            os.replace(tmp, os.path.join(tdir, f"p{pid:05d}.parquet"))
            written.add(dname)
            n_flushed += rows.num_rows
        # a RE-flush (partition grew / rows tombstoned) may route zero
        # rows to a tenant that previously got some: drop this pid's
        # stale file there (each task touches only its own pid's files,
        # so concurrent flushes never race)
        for d in os.listdir(out_root):
            if d.startswith("tenant=") and d not in written:
                stale = os.path.join(out_root, d, f"p{pid:05d}.parquet")
                if os.path.exists(stale):
                    os.remove(stale)
        return len(did), n_flushed

    called = siphoned = flushed = 0
    todo = [p for p in pids if done.get(str(p)) != fps[p]]
    n_skipped = len(pids) - len(todo)
    if _crash_after_pids is not None:
        todo = todo[:_crash_after_pids]
    # all partitions flush in parallel; the cursor advances in COMPLETION
    # order, after each flush has landed — a crash loses only in-flight
    # partitions, whose deterministic re-flush is idempotent
    pending = {flush_partition.remote(pid): pid for pid in todo}
    while pending:
        ready, _ = ray.wait(list(pending), num_returns=1)
        pid = pending.pop(ready[0])
        n_in, n_out = ray.get(ready[0])
        called += 1
        siphoned += n_in
        flushed += n_out
        done[str(pid)] = fps[pid]
        atomic_write_json(_cursor_path(out_root, plugin.name),
                          {"done": done,
                           "flushed": state["flushed"] + flushed})
    return SiphonResult(called, siphoned, flushed, n_skipped)
