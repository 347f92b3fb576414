"""Log appender WAL, realtime delivery, and the bit-sliced metric encode —
the round-4 closers for SURVEY §2.1/§2.10's last out-of-scope rows."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.delivery import ParquetDeliverySink, deliver_new
from miru_ray.index.logappender import (LogAppender, SCHEMA, read_appended)


def _records(n, start=0):
    return pa.table({
        "ts_us": pa.array(np.arange(start, start + n, dtype=np.int64)),
        "level": pa.array(["INFO" if i % 3 else "ERROR"
                           for i in range(start, start + n)]),
        "logger": pa.array(["app"] * n),
        "thread": pa.array(["main"] * n),
        "message": pa.array([f"m{i:05d}" for i in range(start, start + n)]),
    })


# ---------------------------------------------------------------------------
# log appender
# ---------------------------------------------------------------------------

def test_appender_lossless_roundtrip(tmp_path):
    """Mixed single/bulk appends over several seal boundaries come back
    complete, in order, payload-intact."""
    d = str(tmp_path / "wal")
    ap = LogAppender(d, batch_size=32, max_pending=1 << 20)
    for i in range(10):  # singles first: exercises the row buffer
        ap.append(i, "DEBUG", f"m{i:05d}", logger="app")
    ap.append_batch(_records(100, start=10))  # bulk spans seal boundaries
    for i in range(110, 117):
        ap.append(i, "DEBUG", f"m{i:05d}", logger="app")
    meta = ap.close()
    assert meta["appended_records"] == 117
    assert meta["dropped_records"] == 0
    assert meta["n_shards"] == (117 + 31) // 32

    got = read_appended(d).to_pandas().sort_values("ts_us")
    assert len(got) == 117
    assert list(got["ts_us"]) == list(range(117))
    assert list(got["message"]) == [f"m{i:05d}" for i in range(117)]
    # shard files themselves are ordered (the WAL property readers rely on)
    t0 = pq.read_table(str(tmp_path / "wal" / "shard-000000.parquet"))
    assert t0.num_rows == 32 and t0["ts_us"][0].as_py() == 0


def test_appender_drops_oldest_under_pressure(tmp_path):
    """Bounded queue: with the sink stalled, overflow drops the OLDEST
    sealed batch and counts it — the app thread never blocks or raises."""
    d = str(tmp_path / "wal")
    ap = LogAppender(d, batch_size=10, max_pending=2)
    ap.paused = True  # ingress stalled
    ap.append_batch(_records(100))  # 10 sealed batches against capacity 2
    assert ap.dropped_records == 80
    meta = ap.close()  # close drains the surviving queue
    assert meta["appended_records"] == 100
    assert meta["dropped_records"] == 80
    got = read_appended(d).to_pandas().sort_values("ts_us")
    # survivors are the NEWEST two sealed batches
    assert list(got["ts_us"]) == list(range(80, 100))


def test_appender_close_idempotent_and_empty(tmp_path):
    d = str(tmp_path / "wal")
    ap = LogAppender(d)
    m1 = ap.close()
    m2 = ap.close()
    assert m1 == m2 == {"n_shards": 0, "appended_records": 0,
                        "dropped_records": 0}
    assert read_appended(d).count() == 0
    # empty-path schema honors the columns arg like the non-empty path
    assert (read_appended(d, columns=["level", "message"]).schema().names
            == ["level", "message"])
    # a closed appender refuses writes instead of swallowing them
    with pytest.raises(RuntimeError, match="closed"):
        ap.append(0, "INFO", "late")
    with pytest.raises(RuntimeError, match="closed"):
        ap.append_batch(_records(1))


# ---------------------------------------------------------------------------
# realtime delivery
# ---------------------------------------------------------------------------

def _split_convs(xs_table, tmp_path):
    df = xs_table.to_pandas().sort_values(["conv_id", "turn_idx"],
                                          kind="mergesort")
    convs = sorted(df["conv_id"].unique())
    first = set(convs[: len(convs) // 2])
    a_path = str(tmp_path / "a.parquet")
    b_path = str(tmp_path / "b.parquet")
    pq.write_table(pa.Table.from_pandas(df[df["conv_id"].isin(first)],
                                        preserve_index=False), a_path)
    pq.write_table(pa.Table.from_pandas(df[~df["conv_id"].isin(first)],
                                        preserve_index=False), b_path)
    return a_path, b_path


def test_delivery_full_then_append_then_noop(xs_table, tmp_path):
    cfg = IndexConfig(docs_per_partition=1000, num_shards=2)
    a_path, b_path = _split_convs(xs_table, tmp_path)
    idx = str(tmp_path / "idx")
    m1 = build_index([a_path], idx, cfg)

    sink = ParquetDeliverySink(str(tmp_path / "sunk"))
    r1 = deliver_new(idx, sink)
    assert r1["delivered"] == m1["n_docs"]
    got = sink.delivered().to_pandas().sort_values("doc_lo")
    # ranges are disjoint, contiguous, and cover [0, n_docs) exactly
    assert got["doc_lo"].iloc[0] == 0
    assert (got["doc_lo"].iloc[1:].to_numpy()
            == got["doc_hi"].iloc[:-1].to_numpy()).all()
    assert got["doc_hi"].iloc[-1] == m1["n_docs"]

    # clean re-delivery: nothing new
    assert deliver_new(idx, sink) == {"delivered": 0, "ranges": 0}

    # append → only the new tail delivers
    m2 = build_index([a_path, b_path], idx, cfg)
    assert "append" in m2["stages"]
    r2 = deliver_new(idx, sink)
    assert r2["delivered"] == m2["n_docs"] - m1["n_docs"]
    got = sink.delivered().to_pandas()
    assert got["doc_hi"].max() == m2["n_docs"]
    # idempotent sink: no duplicate (pid, lo, hi) files
    assert not got.duplicated(["pid", "doc_lo", "doc_hi"]).any()

    # config-change rebuild over the SAME inputs mints a new doc_space
    # (docs re-encoded, ids re-meant) → delivery restarts from 0
    cfg2 = IndexConfig(docs_per_partition=500, num_shards=2)
    m3 = build_index([a_path, b_path], idx, cfg2, overwrite=True)
    r3 = deliver_new(idx, sink)
    assert r3["delivered"] == m3["n_docs"]
    # the sink keys ranges by DOC SPACE: delivered() returns only the
    # new space's ranges — the old space's partition layout (500-doc
    # partitions vs 1000 before) must not bleed through as phantom or
    # double-counted id ranges
    fresh = sink.delivered().to_pandas().sort_values("doc_lo")
    assert int(fresh["doc_hi"].max()) == m3["n_docs"]
    assert len(set(fresh["doc_space"])) == 1
    spans = list(zip(fresh["doc_lo"], fresh["doc_hi"]))
    assert spans == sorted(spans)
    assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))  # disjoint


def test_delivery_at_least_once_and_rebuild_reset(xs_index, tmp_path):
    import os
    from miru_ray.util import read_json
    sink = ParquetDeliverySink(str(tmp_path / "sunk"))
    r1 = deliver_new(xs_index, sink)
    assert r1["delivered"] > 0
    # crash BEFORE the cursor write: simulate by removing the cursor —
    # the whole range re-delivers (at-least-once), and the idempotent
    # sink absorbs the duplicates
    cpath = os.path.join(xs_index, "delivery", "cursor.json")
    n_files = len(sink.delivered())
    os.remove(cpath)
    r2 = deliver_new(xs_index, sink)
    assert r2 == r1
    assert len(sink.delivered()) == n_files  # same keys → same files

    # doc_space mismatch (rebuilt index) → cursor resets, full redelivery
    c = read_json(cpath)
    c["doc_space"] = "someone-elses-index"
    from miru_ray.util import atomic_write_json
    atomic_write_json(cpath, c)
    r3 = deliver_new(xs_index, sink)
    assert r3 == r1


def test_realtime_log_pipeline_end_to_end(tmp_path):
    """The reference's actual log flow, composed from this round's parts:
    app → LogAppender (client WAL) → index build → realtime delivery →
    level-filtered query; then MORE logs → incremental append → delivery
    of only the new tail.  Every stage is the production code path."""
    from miru_ray.query.engine import Searcher
    from miru_ray.query.filter import Term

    def produce(wal_dir, loggers, n_per, start_ts):
        ap = LogAppender(str(wal_dir), batch_size=64, max_pending=1 << 20)
        for li, lg in enumerate(loggers):
            for i in range(n_per):
                lvl = "ERROR" if (li + i) % 5 == 0 else "INFO"
                ap.append(start_ts + li * n_per + i, lvl,
                          f"msg {lg} {i}", logger=lg)
        ap.close()
        return ap

    def wal_to_input(wal_dir, out_path):
        # WAL → transcript-shaped index input: logger = conversation,
        # per-logger arrival order = turn, level = keyword field
        t = (read_appended(str(wal_dir))
             .to_pandas().sort_values(["logger", "ts_us"]))
        t["turn_idx"] = t.groupby("logger").cumcount()
        t = t.rename(columns={"logger": "conv_id", "message": "text"})
        out = pa.table({
            "conv_id": pa.array(t["conv_id"], pa.string()),
            "turn_idx": pa.array(t["turn_idx"].to_numpy(np.int32)),
            "text": pa.array(t["text"], pa.string()),
            "level": pa.array(t["level"], pa.string()),
            "ts": pa.array(t["ts_us"].to_numpy(np.int64),
                           pa.timestamp("us"))})
        pq.write_table(out, str(out_path))
        return out

    from miru_ray.config import IndexConfig
    cfg = IndexConfig(docs_per_partition=100, num_shards=2,
                      text_fields=("text",), keyword_fields=("level",))
    produce(tmp_path / "wal1", [f"app-{i}" for i in range(4)], 50, 0)
    in1 = str(tmp_path / "in1.parquet")
    wal_to_input(tmp_path / "wal1", in1)
    idx = str(tmp_path / "idx")
    m1 = build_index([in1], idx, cfg)
    assert m1["n_docs"] == 200

    sink = ParquetDeliverySink(str(tmp_path / "delivered"))
    assert deliver_new(idx, sink)["delivered"] == 200

    s = Searcher(idx, num_readers=1)
    try:
        n_err = s.count(Term("level", "ERROR"))
        assert n_err == sum(1 for li in range(4) for i in range(50)
                            if (li + i) % 5 == 0)

        # more logs land: NEW loggers (whole new conversations), append
        produce(tmp_path / "wal2", [f"job-{i}" for i in range(2)], 30,
                10_000)
        in2 = str(tmp_path / "in2.parquet")
        wal_to_input(tmp_path / "wal2", in2)
        m2 = build_index([in1, in2], idx, cfg)
        assert "append" in m2["stages"]
        assert deliver_new(idx, sink)["delivered"] == 60
        got = sink.delivered().to_pandas()
        assert got["doc_hi"].max() == 260
    finally:
        s.close()


# ---------------------------------------------------------------------------
# bit-sliced metric encode
# ---------------------------------------------------------------------------

def test_bitslice_partial_reconstructs_exact_sum():
    from miru_ray.ops.bitslice import _bit_count_partial, BITS
    vals = [0.01, 490.02, 123.456789, 0.25, 77.0]
    t = pa.table({
        "event_type": pa.array(["error"] * 5 + ["click"]),
        "ts": pa.array([1_704_067_200_000_000 + i * 10**9
                        for i in range(6)], pa.timestamp("us")),
        "value": pa.array(vals + [999.0])})
    out = _bit_count_partial(t, dt_us=3_600_000_000)
    df = out.to_pandas()
    planes = df[df["bit"] >= 0]
    sv6 = int((planes["cnt"] * (1 << planes["bit"].to_numpy(np.int64)))
              .sum())
    # banker's rounding at ×1e6, matching round_even in the oracle
    expect = sum(int(np.round(v * 1e6)) for v in vals)
    assert sv6 == expect
    assert df[df["bit"] == -1]["cnt"].sum() == 5  # click filtered out


def test_bitslice_null_value_and_ts_match_oracle_semantics():
    """NULL value counts in n_events but not the sum (SQL count(*) vs
    sum()); NULL ts is dropped on BOTH sides; an all-NULL bucket reports
    a NULL sum, not 0."""
    from miru_ray.ops.bitslice import _bit_count_partial
    t0 = 1_704_067_200_000_000
    t = pa.table({
        "event_type": pa.array(["error"] * 4),
        "ts": pa.array([t0, t0, None, t0 + 4 * 10**9],
                       pa.timestamp("us")),
        "value": pa.array([5.0, None, 1.0, None])})
    df = _bit_count_partial(t, dt_us=3_600_000_000).to_pandas()
    b0 = df[df["bucket"] == 0]
    assert b0[b0["bit"] == -1]["cnt"].iloc[0] == 2   # count(*) keeps NULL
    assert b0[b0["bit"] == -2]["cnt"].iloc[0] == 1   # one valued sample
    # the NULL-ts row vanished entirely
    assert df[df["bit"] == -1]["cnt"].sum() == 3
    # bucket 1 holds only the NULL-valued sample: planes absent
    b1 = df[df["bucket"] == 1]
    assert b1[b1["bit"] == -2]["cnt"].iloc[0] == 0
    assert (b1["bit"] >= 0).sum() == 0


def test_bitslice_rejects_value_above_planes():
    from miru_ray.ops.bitslice import _bit_count_partial, BITS
    t = pa.table({
        "event_type": pa.array(["error"]),
        "ts": pa.array([1_704_067_200_000_000], pa.timestamp("us")),
        "value": pa.array([float(1 << BITS) / 1e6 + 1.0])})
    with pytest.raises(ValueError, match="bit planes"):
        _bit_count_partial(t, dt_us=3_600_000_000)


def test_bitslice_rejects_negative_values():
    from miru_ray.ops.bitslice import _bit_count_partial
    t = pa.table({
        "event_type": pa.array(["error"]),
        "ts": pa.array([1_704_067_200_000_000], pa.timestamp("us")),
        "value": pa.array([-1.0])})
    with pytest.raises(ValueError, match="non-negative"):
        _bit_count_partial(t, dt_us=3_600_000_000)


def test_appender_restart_extends_wal(tmp_path):
    """A restarted (crashed) producer must EXTEND the WAL, not clobber
    shard-000000 onward, and the final _SUCCESS covers BOTH runs'
    shards densely."""
    d = str(tmp_path / "wal")
    ap = LogAppender(d, batch_size=16, max_pending=1 << 20)
    ap.append_batch(_records(40))          # 2 full shards + 8 buffered
    ap.close()                             # 3 shards durable
    ap2 = LogAppender(d, batch_size=16, max_pending=1 << 20)
    assert ap2._next_shard == 3            # resumed past run 1
    ap2.append_batch(_records(20, start=40))
    meta = ap2.close()
    assert meta["n_shards"] == 5           # dense 0..4, both runs
    got = read_appended(d).to_pandas().sort_values("ts_us")
    assert list(got["ts_us"]) == list(range(60))  # nothing clobbered


def test_appender_io_failure_is_lossy_not_fatal(tmp_path, monkeypatch):
    """A write failure mid-flush is the lossy-client path: counted into
    dropped_records, never raised into the producer, numbering dense."""
    d = str(tmp_path / "wal")
    ap = LogAppender(d, batch_size=8, max_pending=1 << 20)
    ap.append_batch(_records(8))           # shard 0 flushes fine
    calls = {"n": 0}
    real = pq.write_table

    def flaky(t, path, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("disk full")
        return real(t, path, **kw)

    import miru_ray.index.logappender as L
    monkeypatch.setattr(L.pq, "write_table", flaky)
    ap.append_batch(_records(8, start=8))   # this batch is LOST, no raise
    ap.append_batch(_records(8, start=16))  # this one lands as shard 1
    monkeypatch.setattr(L.pq, "write_table", real)
    meta = ap.close()
    assert meta["dropped_records"] == 8
    assert meta["appended_records"] == 24
    assert meta["n_shards"] == 2            # dense: no gap for the loss
    got = read_appended(d).to_pandas()
    assert len(got) == 16
    assert set(got["ts_us"]) == set(range(8)) | set(range(16, 24))


def test_delivery_crash_then_append_supersedes_stale_range(xs_table,
                                                           tmp_path):
    """Crash-before-cursor + append: the wider re-delivered range (same
    lo) must REPLACE the stale narrower file, never coexist with it —
    coexisting ranges would double-count the overlap."""
    import pyarrow.parquet as _pq

    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    convs = sorted(set(xs_table["conv_id"].to_pylist()))
    head = set(convs[: len(convs) // 2])
    mask = pa.array([c in head for c in xs_table["conv_id"].to_pylist()])
    a = str(tmp_path / "a.parquet")
    _pq.write_table(xs_table.filter(mask), a)
    b = str(tmp_path / "b.parquet")
    _pq.write_table(xs_table.filter(pc.invert(mask)), b)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=100000, num_shards=1)
    m1 = build_index([a], idx, cfg)  # ONE partition: one range
    sink = ParquetDeliverySink(str(tmp_path / "sink"))
    deliver_new(idx, sink)
    # simulate crash BEFORE the cursor write: delete it
    os.remove(os.path.join(idx, "delivery", "cursor.json"))
    m2 = build_index([a, b], idx, cfg)  # append extends the partition
    deliver_new(idx, sink)              # re-delivers [0, n2) — same lo
    got = sink.delivered().to_pandas()
    assert len(got) == 1                # stale [0, n1) file superseded
    assert int(got["doc_hi"].iloc[0]) == m2["n_docs"]
    total = int((got["doc_hi"] - got["doc_lo"]).sum())
    assert total == m2["n_docs"]        # no double-counted overlap
    assert m1["n_docs"] < m2["n_docs"]


def test_delivery_modern_sink_internal_typeerror_propagates(xs_index,
                                                            tmp_path):
    """A TypeError raised INSIDE a 4-arg sink's deliver body must
    propagate, not be swallowed by legacy-sink probing (which would
    silently re-deliver through the 3-arg path)."""
    calls = []

    class BrokenModernSink:
        def deliver(self, pid, lo, hi, doc_space=""):
            calls.append((pid, lo, hi))
            raise TypeError("bug inside the sink body")

    import shutil
    idx = str(tmp_path / "idx")
    shutil.copytree(xs_index, idx)
    shutil.rmtree(os.path.join(idx, "delivery"), ignore_errors=True)
    with pytest.raises(TypeError, match="inside the sink"):
        deliver_new(idx, BrokenModernSink())
    assert len(calls) == 1  # called once — not retried via 3-arg


def test_delivery_legacy_three_arg_sink_still_served(xs_index, tmp_path):
    calls = []

    class LegacySink:
        def deliver(self, pid, lo, hi):
            calls.append((pid, lo, hi))

    import shutil
    idx = str(tmp_path / "idx")
    shutil.copytree(xs_index, idx)
    shutil.rmtree(os.path.join(idx, "delivery"), ignore_errors=True)
    out = deliver_new(idx, LegacySink())
    assert out["ranges"] == len(calls) > 0
