"""Round-5 pipelines-family review regressions: NULL-ts window
assignment, empty-input guards, stats fallback."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(d, rows):
    pq.write_table(pa.table({
        "event_id": pa.array(list(range(len(rows["user_id"]))), pa.int64()),
        "user_id": pa.array(rows["user_id"], pa.int64()),
        "event_type": pa.array(rows["event_type"], pa.string()),
        "value": pa.array(rows["value"], pa.float64()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
    }), os.path.join(d, "events.parquet"))


def test_labeled_users_null_ts_lands_in_initial_window(
        ray_session, tmp_path):
    """A NULL-ts high-value purchase must land in exactly ONE window —
    the initial one — or the incremental store diverges from a full
    rebuild (review finding: windowed masks dropped NULL ts entirely
    while the unwindowed scan and the SQL oracle keep it)."""
    from miru_ray.pipelines.catwalk import _labeled_users
    d = str(tmp_path)
    _write_events(d, {
        "user_id": [1, 2, 3],
        "event_type": ["purchase", "purchase", "purchase"],
        "value": [200.0, 200.0, 100.0],
        "ts": [1_000_000, None, 2_000_000],
    })
    full = _labeled_users(d)
    assert list(full) == [1, 2]            # unwindowed keeps NULL ts
    init = _labeled_users(d, None, 1_500_000)
    assert list(init) == [1, 2]            # NULL ts → initial window
    fwd = _labeled_users(d, 1_500_000, 10_000_000)
    assert list(fwd) == []                 # never re-counted forward
    # union over the window partition == full rebuild
    assert sorted(set(init) | set(fwd)) == sorted(full)


def test_events_max_ts_all_null_falls_back(ray_session, tmp_path):
    """Row-group statistics with all-NULL ts (max is None) must not
    crash the metadata-only path (review finding)."""
    from miru_ray.pipelines.catwalk import _events_max_ts
    d = str(tmp_path)
    _write_events(d, {
        "user_id": [1], "event_type": ["view"], "value": [1.0],
        "ts": [None],
    })
    assert _events_max_ts(d) == 0
    # and a normal table still reads from statistics
    d2 = str(tmp_path / "n")
    os.makedirs(d2)
    _write_events(d2, {
        "user_id": [1], "event_type": ["view"], "value": [1.0],
        "ts": [7_000_000],
    })
    assert _events_max_ts(d2) == 7_000_000


def test_curation_summary_empty_corpus(ray_session, tmp_path):
    """Empty documents table: the summaries report zeros instead of
    subscripting the None Dataset.aggregate returns (review finding)."""
    from miru_ray.pipelines.curate import curation_summary
    d = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
        "source": pa.array([], pa.string()),
    }), os.path.join(d, "documents.parquet"))
    out = curation_summary(d).to_pandas()
    assert int(out["n_kept"].iloc[0]) == 0
    assert int(out["total_tokens"].iloc[0]) == 0


def test_revenue_by_nation_empty_customer(ray_session, tmp_path):
    """Zero-row customer table: inner-join semantics give an empty
    result, not an IndexError on the empty broadcast key array (review
    finding)."""
    from miru_ray.pipelines.relational import revenue_by_nation
    d = str(tmp_path)
    pq.write_table(pa.table({
        "c_custkey": pa.array([], pa.int64()),
        "c_nationkey": pa.array([], pa.int64()),
    }), os.path.join(d, "customer.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0], pa.int64()),
        "n_name": pa.array(["ALGERIA"], pa.string()),
    }), os.path.join(d, "nation.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1], pa.int64()),
        "o_custkey": pa.array([5], pa.int64()),
        "o_totalprice": pa.array([10.0], pa.float64()),
    }), os.path.join(d, "orders.parquet"))
    out = revenue_by_nation(d)
    assert out.num_rows == 0
