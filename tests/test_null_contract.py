"""NULL-contract regression tests for the analytics family (round-4c
review): the shipped fixtures are null-free, but the module's stated
contract supports NULL ts/value — counts are count(*), all-NULL
aggregates surface as NULL (never an int-cast crash), NULL buckets stay
off the time axis for windowed/ranked views, and quantile ranks landing
in the NULLS-LAST tail return NULL.  DuckDB evaluates the same oracles
on the same parquet as ground truth where one exists."""
import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from miru_ray.ops import analytics as A


@pytest.fixture(scope="module")
def null_sf(ray_session, tmp_path_factory):
    """A tiny sf_dir whose events carry NULL ts and NULL value rows,
    one event type with ALL-null ts, and zero 'click' events."""
    base = A.T0_US
    rows = [
        # event_type, ts_us (None = NULL), user_id, value
        ("view", base + 10, 1, 1.0),
        ("view", base + 3_700_000_000, 1, None),   # hour 1, NULL value
        ("view", None, 2, 3.0),                    # NULL ts
        ("purchase", base + 20, 2, None),          # NULL value
        ("purchase", base + 30, 3, 8.0),
        ("ghost", None, 3, None),                  # ALL-null ts type
        (A.ANOMALY_EVENT_TYPE, base + 40, 1, 2.0),
        (A.ANOMALY_EVENT_TYPE, base + 50, 2, None),  # null value counts
        (A.ANOMALY_EVENT_TYPE, base + 3_600_000_050, 2, 5.0),
    ]
    d = tmp_path_factory.mktemp("nullsf")
    pq.write_table(pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[0] for r in rows], pa.string()),
        "value": pa.array([r[3] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    }), str(d / "events.parquet"))
    return str(d)


def _oracle(null_sf: str, sql: str):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{os.path.join(null_sf, 'events.parquet')}'")
    return con.execute(sql).fetchdf()


def test_aggregate_counts_null_ts(null_sf):
    got = A.aggregate_counts(null_sf).to_pandas()
    exp = _oracle(null_sf, """
        SELECT event_type, count(*) AS n_events,
               min(ts) AS oldest_ts, max(ts) AS newest_ts
        FROM events GROUP BY 1 ORDER BY 1""")
    assert got["n_events"].tolist() == exp["n_events"].tolist()
    # the ALL-null-ts type reports NULL bounds, not a crash / garbage
    ghost = got[got["event_type"] == "ghost"].iloc[0]
    assert ghost["n_events"] == 1
    assert ghost[["oldest_ts", "newest_ts"]].isna().all()


def test_waveform_null_bucket_counts_rows(null_sf):
    got = A.waveform(null_sf).to_pandas()
    nulls = got[got["bucket"].isna()]
    assert dict(zip(nulls["event_type"], nulls["n_events"])) == \
        {"view": 1, "ghost": 1}
    # ranked/windowed consumers skip the null group without crashing
    assert A.rolling_counts(null_sf).num_rows > 0
    assert A.trending(null_sf).num_rows > 0


def test_anomaly_null_values(null_sf):
    got = A.anomaly(null_sf).to_pandas()
    # n_events is count(*): the NULL-value row in hour 0 still counts
    by_bucket = dict(zip(got["bucket"], got["n_events"]))
    assert by_bucket == {0: 2, 1: 1}
    assert got["sum_value"].notna().all()  # null sums contribute zero


def test_unread_counts_without_any_clicks(null_sf):
    got = A.unread_counts(null_sf).to_pandas()
    assert (got["n_unread"] > 0).all()  # no watermark → all unread
    bf = A.unread_backfill(null_sf).to_pandas()
    assert (bf["n_unread"] >= 0).all()  # no markers → no crash


def test_quantiles_nulls_last(null_sf):
    got = A.value_quantiles(null_sf).to_pandas()
    exp = _oracle(null_sf, f"""
        WITH n AS (SELECT count(*) AS n FROM events),
        r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn
              FROM events),
        q AS (SELECT unnest([{', '.join(map(str, A.QUANTILE_PCTS))}])
              AS q_pct)
        SELECT q.q_pct, r.value FROM q, n, r
        WHERE r.rn = (n.n * q.q_pct + 99) // 100 ORDER BY q_pct""")
    for _, row in exp.iterrows():
        g = got[got["q_pct"] == row["q_pct"]]["value"].iloc[0]
        if np.isnan(row["value"]):
            assert g is None or np.isnan(g)
        else:
            assert g == row["value"]
    # sanity: at least one rank lands in the NULLS-LAST tail
    assert exp["value"].isna().any()


def test_ann_zero_vector_never_nan(ray_session, tmp_path):
    """A zero embedding (failed/padding embed) must score cosine 0 —
    a NaN row would be ranked LARGEST by the batch prune and crowd real
    neighbors out of the top-k."""
    from miru_ray.ops import similarity as S
    rng = np.random.default_rng(3)
    n, dim = 40, 8
    M = rng.normal(size=(n, dim)).astype(np.float32)
    M[7] = 0.0  # the zero vector
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    }), str(tmp_path / "embeddings.parquet"))
    out = S.ann_bruteforce_topk(str(tmp_path), k=5,
                                vec_ids=(0, 7)).to_pandas()
    # the zero vector is never anyone's neighbor (cos 0 < real sims —
    # a NaN row would have crowded out a legitimate result)...
    assert 7 not in set(out[out["query_id"] == 0]["vec_id"])
    # ...and as a query every candidate ties at cos 0, so the lexsort
    # prune's (cos DESC, vec_id ASC) tie-break picks the LOWEST ids —
    # deterministic, batch-order-free
    q7 = out[out["query_id"] == 7].sort_values("rank")
    assert q7["vec_id"].tolist() == [0, 1, 2, 3, 4]


def test_rarity_topk_empty_corpus(ray_session, tmp_path):
    """A corpus with no [a-z0-9] tokens returns the typed empty table,
    not a KeyError off a column-less frame."""
    from miru_ray.ops import textstats as T
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["∆∆∆ ⌘⌘", "——…"], pa.string()),
        "source": pa.array(["a", "b"], pa.string()),
        "lang": pa.array(["zh", "zh"], pa.string()),
    }), str(tmp_path / "documents.parquet"))
    out = T.rarity_topk(str(tmp_path))
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_tokens", "rarity_score"]
    top = T.top_quality_per_lang(str(tmp_path))
    assert top.num_rows == 0
