"""Log appender — the app-log → stumptown-tenant ingest client.

The reference ships a log4j appender (``miru-logappender/.../
MiruLogAppender.java``, HTTP variant ``HttpMiruLogAppender.java``) that
turns every application log record into an activity for the "stumptown"
tenant: records buffer in a BOUNDED in-memory queue, flush to the ingress
in fixed-size batches, and under back-pressure the appender DROPS rather
than blocks the application thread (a lossy-by-design client — logging
must never stall the app).

Ray-native: the appender is a client-side component (it runs in the
producing process, not on the cluster), so it stays a plain class here —
its output is the WAL: numbered Parquet shards under one tenant
directory, each written atomically (tmp + rename) so a concurrent or
crashed producer never exposes a torn shard.  The cluster side is
``read_appended`` → a normal ``ray.data`` Dataset feeding the same
stumptown queries every other source feeds.

Semantics kept from the reference:
- fixed-size flush batches (``batch_size``), partial tail on ``close()``;
- a bounded buffer of PENDING batches (``max_pending``): when the sink
  stalls, the OLDEST pending batch is dropped and counted
  (``dropped_records``) — never a block, never an exception;
- shard numbering is the cursor: a reader that has consumed shard *k*
  resumes at *k+1*, and ``_SUCCESS`` records the final shard count.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..util import atomic_write_json, read_json

#: WAL record schema — the stumptown activity fields
#: (level/thread/logger/message/ts; MiruLogEvent's core columns)
SCHEMA = pa.schema([
    ("ts_us", pa.int64()),
    ("level", pa.string()),
    ("logger", pa.string()),
    ("thread", pa.string()),
    ("message", pa.string()),
])


class LogAppender:
    """Buffered, bounded, lossy-under-pressure log WAL writer."""

    def __init__(self, out_dir: str, batch_size: int = 8192,
                 max_pending: int = 64):
        self.out_dir = out_dir
        self.batch_size = int(batch_size)
        self.max_pending = int(max_pending)
        os.makedirs(out_dir, exist_ok=True)
        self._cols: dict[str, list] = {f.name: [] for f in SCHEMA}
        self._n_buffered = 0
        self._pending: list[pa.Table] = []
        # resume numbering past any existing shards: a restarted
        # (crashed) producer must EXTEND the WAL, not clobber
        # shard-000000 onward
        existing = [int(f[len("shard-"):-len(".parquet")])
                    for f in os.listdir(out_dir)
                    if f.startswith("shard-") and f.endswith(".parquet")]
        self._next_shard = max(existing) + 1 if existing else 0
        self.dropped_records = 0
        self.appended_records = 0
        self._closed = False
        #: sink back-pressure switch — True models the reference's slow /
        #: unreachable ingress: sealed batches queue instead of flushing,
        #: and past ``max_pending`` the oldest is dropped (lossy client)
        self.paused = False

    # -- producer side -----------------------------------------------------
    def append(self, ts_us: int, level: str, message: str,
               logger: str = "root", thread: str = "main") -> None:
        if self._closed:
            raise RuntimeError("appender is closed")
        c = self._cols
        c["ts_us"].append(ts_us)
        c["level"].append(level)
        c["logger"].append(logger)
        c["thread"].append(thread)
        c["message"].append(message)
        self._n_buffered += 1
        self.appended_records += 1
        if self._n_buffered >= self.batch_size:
            self._seal()

    def append_batch(self, t: pa.Table) -> None:
        """Vectorized append — the HTTP appender's batched POST body.
        Columns beyond the WAL schema are dropped; missing ones error."""
        if self._closed:
            raise RuntimeError("appender is closed")
        t = t.select([f.name for f in SCHEMA]).cast(SCHEMA)
        self.appended_records += t.num_rows
        # seal whole slices directly; tail joins the row buffer
        off = 0
        if self._n_buffered:
            need = self.batch_size - self._n_buffered
            head = t.slice(0, need)
            for f in SCHEMA:
                self._cols[f.name].extend(
                    head[f.name].to_pylist())
            self._n_buffered += head.num_rows
            off = head.num_rows
            if self._n_buffered >= self.batch_size:
                self._seal()
        while off + self.batch_size <= t.num_rows:
            self._enqueue(t.slice(off, self.batch_size))
            off += self.batch_size
        tail = t.slice(off)
        for f in SCHEMA:
            self._cols[f.name].extend(tail[f.name].to_pylist())
        self._n_buffered += tail.num_rows
        if self._n_buffered >= self.batch_size:
            self._seal()

    # -- buffering / flushing ---------------------------------------------
    def _seal(self) -> None:
        if not self._n_buffered:
            return
        t = pa.table({f.name: pa.array(self._cols[f.name], f.type)
                      for f in SCHEMA})
        self._cols = {f.name: [] for f in SCHEMA}
        self._n_buffered = 0
        self._enqueue(t)

    def _enqueue(self, t: pa.Table) -> None:
        self._pending.append(t)
        while len(self._pending) > self.max_pending:
            # back-pressure: drop OLDEST, count it, keep the app running
            self.dropped_records += self._pending.pop(0).num_rows
        if not self.paused:
            self.flush()

    def flush(self) -> None:
        """Drain every pending batch to numbered shards (atomic each).
        The tmp name is pid-suffixed so a concurrent or crashed producer
        sharing the dir never publishes a torn shard, and an IO failure
        is the LOSSY-CLIENT path — the batch is counted into
        ``dropped_records`` and the app keeps running (the reference
        client logs-and-drops; it never raises into the producer)."""
        self.paused = False
        while self._pending:
            t = self._pending[0]
            path = os.path.join(self.out_dir,
                                f"shard-{self._next_shard:06d}.parquet")
            tmp = f"{path}.{os.getpid()}.tmp"
            try:
                pq.write_table(t, tmp)
                os.replace(tmp, path)
            except (OSError, pa.ArrowException):
                self.dropped_records += t.num_rows
                try:
                    os.remove(tmp)
                except OSError:
                    pass
                self._pending.pop(0)
                continue  # number unused — keep shard numbering DENSE
            self._pending.pop(0)
            self._next_shard += 1

    def close(self) -> dict:
        """Seal the tail, drain, and commit the ``_SUCCESS`` cursor."""
        if self._closed:
            return read_json(os.path.join(self.out_dir, "_SUCCESS"))
        self._seal()
        self.flush()
        meta = {"n_shards": self._next_shard,
                "appended_records": int(self.appended_records),
                "dropped_records": int(self.dropped_records)}
        atomic_write_json(os.path.join(self.out_dir, "_SUCCESS"), meta)
        self._closed = True
        return meta


def stumptown_appender_counts(sf_dir: str) -> pa.Table:
    """End-to-end appender round-trip, oracled: derive one log record per
    event (level from the stumptown event-type mapping, message =
    ``event_type#event_id``), push the stream through a ``LogAppender``
    exactly as a producing application would — the driver loop IS the
    client process here, the appender being client-side by definition —
    then consume the WAL shards as a Dataset and aggregate per level.

    The per-level ``max_message`` proves payload integrity through the
    buffer/seal/flush path, not just row counts; ``n_records`` proves the
    no-pressure path is lossless (``max_pending`` effectively unbounded —
    the lossy path is exercised by its own pytest, not the oracle)."""
    import shutil
    import tempfile

    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum

    from ..util import read_parquet_clean
    from ..ops.analytics import LEVEL_DEFAULT, LEVEL_OF

    events = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                columns=["event_id", "event_type", "ts"])
    out_dir = tempfile.mkdtemp(prefix="stumptown_wal_", dir="/tmp")
    try:
        ap = LogAppender(out_dir, batch_size=8192, max_pending=1 << 30)
        for b in events.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"):
            et = np.asarray(b["event_type"].to_pandas(), dtype=object)
            level = pa.array([LEVEL_OF.get(e, LEVEL_DEFAULT) for e in et],
                             pa.string())
            msg = pc.binary_join_element_wise(
                b["event_type"], "#",
                pc.cast(b["event_id"], pa.string()), "")
            ap.append_batch(pa.table({
                "ts_us": pc.cast(b["ts"], pa.int64()),
                "level": level,
                "logger": pa.array(["app"] * len(et), pa.string()),
                "thread": pa.array(["main"] * len(et), pa.string()),
                "message": msg}))
        meta = ap.close()
        assert meta["dropped_records"] == 0

        def partial(t: pa.Table) -> pa.Table:
            g = t.group_by("level").aggregate(
                [("message", "count", pc.CountOptions(mode="all")),
                 ("message", "max")])
            return pa.table({"level": g["level"],
                             "n": g["message_count"],
                             "mx": g["message_max"]})

        out = (read_appended(out_dir, columns=["level", "message"])
               .map_batches(partial, batch_format="pyarrow",
                            batch_size=65536)
               .groupby("level")
               .aggregate(Sum("n", alias_name="n_records"),
                          Max("mx", alias_name="max_message"))
               .to_pandas())  # bounded: one row per log level
        out = out.sort_values("level").reset_index(drop=True)
        return pa.table({"level": pa.array(out["level"], pa.string()),
                         "n_records": pa.array(
                             out["n_records"].astype(np.int64)),
                         "max_message": pa.array(out["max_message"],
                                                 pa.string())})
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _sql() -> dict:
    # the level CASE is the ONE shared _LEVEL_SQL constant — the engine
    # side imports LEVEL_OF from the same module, so a new level mapping
    # updates both engines together
    from ..ops.analytics import _LEVEL_SQL
    return {
        "stumptown_appender_counts": f"""
SELECT {_LEVEL_SQL} AS level,
       count(*)::BIGINT AS n_records,
       max(event_type || '#' || CAST(event_id AS VARCHAR)) AS max_message
FROM events GROUP BY 1 ORDER BY 1
""".strip(),
    }


SQL = _sql()


def read_appended(out_dir: str, columns=None):
    """Cluster-side consumption of the appender WAL as a Dataset."""
    import ray.data
    meta = read_json(os.path.join(out_dir, "_SUCCESS"))
    files = [os.path.join(out_dir, f"shard-{i:06d}.parquet")
             for i in range(meta["n_shards"])]
    if not files:
        empty = SCHEMA.empty_table()
        if columns is not None:
            empty = empty.select(columns)
        return ray.data.from_arrow(empty)
    return ray.data.read_parquet(files, columns=columns)
