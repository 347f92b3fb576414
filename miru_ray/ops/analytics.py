"""Analytics operators over the ``events`` stream table.

Ray-Data re-expressions of the reference's aggregate plugin family
(SURVEY.md §2.6):

- distincts / uniques    — ``Distincts.java:41-210``, ``UniquesInjectable``
- aggregate counts       — ``AggregateCounts.java:49-405`` (group, count,
                           oldest doc) without the bitmap peel loop
- waveforms              — ``Analytics.java:57-203`` time-bucketed counts
                           (bucket = (ts - t0) // dt computed in map_batches,
                           replacing ``boundedCardinalities``)
- metrics sum/avg        — ``Metrics.java:28-98`` (plain groupby sum/mean —
                           the valueBits bit-planes are a bitmap-engine
                           artifact, SURVEY.md §2.6)
- trending               — ``TrendingQuestion.java:138-199`` waveform +
                           LINEAR_REGRESSION scoring (slope), top-k

Every groupby here is preceded by an exact per-batch partial aggregation in
``map_batches`` so the all-to-all shuffle moves one row per (key, batch)
instead of one row per event — the §2.6→Ray "pre-aggregate before groupby"
rule.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..util import read_parquet_clean, sorted_lookup
from ray.data.aggregate import Count, Max, Mean, Min, Sum

US_PER_HOUR = 3_600_000_000


def _pdf_cols(df: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    """Normalize the all-empty-block ``to_pandas`` result (which loses
    its column names — the documented Ray gotcha) to a typed empty frame
    so downstream column access never raises KeyError."""
    if df.empty and not set(cols) <= set(df.columns):
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    return df

#: epoch µs of TIMESTAMP '2024-01-01' — fixed waveform origin so engine and
#: SQL bucket identically
T0_US = 1_704_067_200_000_000


def _events(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                 columns=columns)


def distincts(sf_dir: str) -> pa.Table:
    """Distinct event types, sorted (Distincts semantics)."""
    vals = _events(sf_dir, ["event_type"]).unique("event_type")
    return pa.table({"event_type": pa.array(sorted(vals))})


def uniques(sf_dir: str) -> pa.Table:
    """Cardinality of distinct users (Uniques = count of Distincts)."""
    n = len(_events(sf_dir, ["user_id"]).unique("user_id"))
    return pa.table({"n_unique_users": pa.array([n], type=pa.int64())})


def _bucket_batch(batch: pa.Table, dt_us: int) -> pa.Table:
    col = pc.cast(batch["ts"], pa.int64())
    invalid = pc.is_null(col).to_numpy(zero_copy_only=False).astype(bool)
    ts = pc.fill_null(col, 0).to_numpy(zero_copy_only=False)
    # FLOOR division (numpy), not Arrow's truncate-toward-zero divide:
    # the oracles bucket with DuckDB `//`, which floors — the two differ
    # on timestamps before T0 (negative offsets).  NULL ts propagates a
    # null bucket (SQL grouping semantics), never a crash.
    bucket = np.floor_divide(ts - T0_US, dt_us)
    return batch.append_column(
        "bucket", pa.array(bucket, pa.int64(),
                           mask=invalid if invalid.any() else None))


def aggregate_counts(sf_dir: str) -> pa.Table:
    """Per event_type: count + oldest/newest ts (AggregateCounts view)."""
    ds = _events(sf_dir, ["event_type", "ts"])
    ds = ds.map_batches(
        lambda t: t.set_column(1, "ts", pc.cast(t["ts"], pa.int64())),
        batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("event_type").aggregate(
            [("ts", "count", pc.CountOptions(mode="all")),  # count(*)
             ("ts", "min"), ("ts", "max")])
        return g.rename_columns(["event_type", "cnt", "min_ts", "max_ts"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby("event_type").aggregate(
        Sum("cnt", alias_name="n_events"),
        Min("min_ts", alias_name="oldest_ts"),
        Max("max_ts", alias_name="newest_ts")).to_pandas()
    out = out.sort_values("event_type").reset_index(drop=True)

    def _ts(series) -> pa.Array:
        # a type whose ts values are ALL NULL has a NULL min/max (SQL),
        # not an int-cast crash
        v = series.to_numpy(dtype="float64", na_value=np.nan)
        mask = np.isnan(v)
        return pa.array(np.where(mask, 0, v).astype(np.int64),
                        mask=mask if mask.any() else None) \
                 .cast(pa.timestamp("us"))

    return pa.table({
        "event_type": pa.array(out["event_type"]),
        "n_events": pa.array(out["n_events"].astype(np.int64)),
        "oldest_ts": _ts(out["oldest_ts"]),
        "newest_ts": _ts(out["newest_ts"]),
    })


def waveform(sf_dir: str, dt_us: int = US_PER_HOUR) -> pa.Table:
    """Time-bucketed event counts per event_type (Analytics waveforms)."""
    ds = _events(sf_dir, ["event_type", "ts"])
    ds = ds.map_batches(lambda t: _bucket_batch(t, dt_us),
                        batch_format="pyarrow", batch_size=65536)

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["event_type", "bucket"]).aggregate(
            [("bucket", "count", pc.CountOptions(mode="all"))])  # count(*)
        return g.rename_columns(["event_type", "bucket", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby(["event_type", "bucket"]).aggregate(
        Sum("cnt", alias_name="n_events")).to_pandas()
    out = out.sort_values(["event_type", "bucket"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def rolling_counts(sf_dir: str, dt_us: int = US_PER_HOUR,
                   window: int = 24) -> pa.Table:
    """Trailing-window aggregate (the "streaming window" custom-operator
    family): per (event_type, bucket), events in the last ``window``
    buckets inclusive — e.g. the rolling-24h volume behind rate alerting.

    Scale shape: the heavy reduction (N events → types × buckets rows) is
    the distributed :func:`waveform`; the window pass is then a
    prefix-sum + value-range ``searchsorted`` over OUTPUT-sized data —
    the same driver-finishing precedent as trending's slope.  Missing
    buckets contribute zero by construction (value-range window, matching
    SQL RANGE framing).  All exact ints."""
    wf = waveform(sf_dir, dt_us).to_pandas()
    # NULL-ts events (null bucket) have no place on the time axis
    wf = wf[wf["bucket"].notna()]
    types, buckets, rolls = [], [], []
    for et, g in wf.groupby("event_type", sort=True):
        b = g["bucket"].to_numpy().astype(np.int64)   # sorted by waveform
        n = g["n_events"].to_numpy().astype(np.int64)
        csum = np.cumsum(n)
        lo = np.searchsorted(b, b - (window - 1), side="left")
        roll = csum - np.where(lo > 0, csum[lo - 1], 0)
        types.extend([et] * len(b))
        buckets.append(b)
        rolls.append(roll)
    return pa.table({
        "event_type": pa.array(types, pa.string()),
        "bucket": pa.array(np.concatenate(buckets) if buckets
                           else np.empty(0, np.int64)),
        _rolling_col(dt_us, window): pa.array(
            np.concatenate(rolls) if rolls else np.empty(0, np.int64))})


def _rolling_col(dt_us: int, window: int) -> str:
    """Column name derived from the actual window, so a non-default call
    can never mislabel its output (review round 3)."""
    if dt_us == US_PER_HOUR:
        return f"n_events_{window}h"
    return f"n_events_{window}x{dt_us}us"


def rolling_counts_sql(dt_us: int = US_PER_HOUR, window: int = 24) -> str:
    """Oracle generator matching :func:`rolling_counts` for ANY window —
    the registry entry uses the defaults; parameterized callers build
    the matching oracle here."""
    return f"""
WITH wf AS (
  SELECT event_type, (epoch_us(ts) - {T0_US}) // {dt_us} AS bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, bucket,
       sum(n) OVER (PARTITION BY event_type ORDER BY bucket
                    RANGE BETWEEN {window - 1} PRECEDING AND CURRENT ROW)::BIGINT
         AS {_rolling_col(dt_us, window)}
FROM wf ORDER BY event_type, bucket
""".strip()


def metrics(sf_dir: str, dt_us: int = US_PER_HOUR) -> pa.Table:
    """Per-bucket sum/avg of ``value`` (Metrics/Anomaly waveforms).

    ``value`` is integer-scaled ×1e6 before summing so the distributed sum
    is exact and reduce-order-independent (hash-matches the SQL oracle)."""
    ds = _events(sf_dir, ["ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        # per-batch partial: one row per (batch, bucket) — the global
        # merge then moves ~buckets×batches rows instead of one row per
        # event through the hash-shuffle aggregators (whose fixed actor
        # startup dominated this op's 1.4 s at sf0.1; partials run it in
        # ~0.4 s, same exact integer sums)
        t = _bucket_batch(t, dt_us)
        v6 = pc.cast(pc.round(pc.multiply(t["value"], 1e6)), pa.int64())
        # count ALL rows per bucket (the oracle's count(*)) — pyarrow's
        # plain "count" skips nulls and would drop NULL-value rows from
        # n_events / the avg denominator
        g = pa.table({"bucket": t["bucket"], "v6": v6}) \
            .group_by("bucket").aggregate(
                [("v6", "sum"),
                 ("v6", "count", pc.CountOptions(mode="all"))])
        return pa.table({"bucket": g["bucket"], "sv6": g["v6_sum"],
                         "n_events": g["v6_count"]})

    out = (ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
           .to_pandas()  # bucket-bounded partials only
           .groupby("bucket", as_index=False)
           # min_count=1 keeps an all-NULL bucket's sum NULL (the SQL
           # sum() of zero non-null values), instead of pandas' 0.0
           .agg(sv6=("sv6", lambda c: c.sum(min_count=1)),
                n_events=("n_events", "sum")))
    out["sum_value"] = (out["sv6"] / 1e6).round(6)
    out["avg_value"] = (out["sv6"] / 1e6 / out["n_events"]).round(6)
    out = out[["bucket", "sum_value", "avg_value", "n_events"]]
    out = out.sort_values("bucket").reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


ANOMALY_EVENT_TYPE = "error"  # the filtered metric stream under watch
ANOMALY_TOPK = 5


def anomaly(sf_dir: str, dt_us: int = US_PER_HOUR,
            k: int = ANOMALY_TOPK) -> pa.Table:
    """Anomaly detection over the Metrics substrate (the reference's
    Anomaly plugin is a filtered metric waveform inspected for deviation,
    ``miru-anomaly-plugins/.../Anomaly.java:22-131``): bucket the
    ``value`` stream of one event type, then surface the k buckets whose
    sum deviates most from the stream's per-bucket mean.

    Exactness contract: sums are ×1e6 integer-scaled (reduce-order
    independent) and the deviation ranking uses the INTEGER score
    ``|n_buckets·sum − total|`` — the same ordering as |sum − mean| with
    no float comparisons anywhere near the cut; the reported ``deviation``
    column divides exact integers identically in both engines."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], ANOMALY_EVENT_TYPE))
        t = _bucket_batch(t, dt_us)
        v6 = pc.cast(pc.round(pc.multiply(t["value"], 1e6)), pa.int64())
        g = pa.table({"bucket": t["bucket"], "v6": v6}).group_by(
            "bucket").aggregate(
                [("v6", "sum"), ("v6", "count",
                                 pc.CountOptions(mode="all"))])  # count(*)
        # an all-NULL-value partial sums to NULL — a zero contribution
        # to the bucket's deviation, never an int-cast crash
        return pa.table({"bucket": g["bucket"],
                         "v6": pc.fill_null(g["v6_sum"], 0),
                         "n": g["v6_count"]})

    per_bucket = (ds.map_batches(prep, batch_format="pyarrow",
                                 batch_size=65536)
                  .groupby("bucket").aggregate(
                      Sum("v6", alias_name="sv6"),
                      Sum("n", alias_name="n_events"))
                  .to_pandas())  # bounded: one row per time bucket
    # NULL-ts events have no place on the time axis — the ranked/windowed
    # views skip the null-bucket group (SQL window functions likewise
    # never assign it a window)
    per_bucket = per_bucket[per_bucket["bucket"].notna()]
    nb = len(per_bucket)
    if not nb:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "n_events": pa.array([], pa.int64()),
                         "sum_value": pa.array([], pa.float64()),
                         "deviation": pa.array([], pa.float64())})
    sv6 = per_bucket["sv6"].to_numpy().astype(np.int64)
    total = int(sv6.astype(object).sum())  # exact (no int64 wrap)
    # exact-integer |sum - mean| ordering in PYTHON ints — nb·sv6 can
    # exceed int64 at scale and a silent wrap would reorder the top-k
    # (same guard as window_join's pair products)
    score = np.abs(nb * sv6.astype(object) - total)
    per_bucket["score"] = score
    out = per_bucket.sort_values(["score", "bucket"],
                                 ascending=[False, True]).head(k)
    dev = np.abs(out["sv6"].to_numpy() - total / nb) / 1e6
    return pa.table({
        "bucket": pa.array(out["bucket"].to_numpy().astype(np.int64)),
        "n_events": pa.array(out["n_events"].to_numpy().astype(np.int64)),
        "sum_value": pa.array(np.round(out["sv6"].to_numpy() / 1e6, 6)),
        "deviation": pa.array(np.round(dev, 6))})


def trending(sf_dir: str, dt_us: int = US_PER_HOUR, k: int = 3) -> pa.Table:
    """Top-k event types by linear-regression slope of their waveform
    (Trending LINEAR_REGRESSION strategy).  Waveform aggregation is
    distributed; the per-type slope over ≤#buckets points is driver-side
    (tiny), like the reference's answer-merge scoring."""
    wf = waveform(sf_dir, dt_us).to_pandas()
    # NULL-ts events (null bucket) have no place on the time axis
    wf = wf[wf["bucket"].notna()]
    rows = []
    for et, g in wf.groupby("event_type"):
        x = g["bucket"].to_numpy(dtype=np.float64)
        y = g["n_events"].to_numpy(dtype=np.float64)
        # least-squares slope, same formula as SQL regr_slope; a
        # single-bucket type has zero variance → regr_slope is NULL in
        # SQL (sorted last under DuckDB's NULLS LAST), so mirror that
        # instead of producing a NaN with arbitrary sort position
        den = float(np.mean(x * x) - x.mean() ** 2)
        slope = (None if den == 0.0 else
                 round(float((np.mean(x * y) - x.mean() * y.mean()) / den),
                       6))
        rows.append((et, slope))
    rows.sort(key=lambda r: (r[1] is None, -(r[1] or 0.0), r[0]))
    rows = rows[:k]
    return pa.table({"event_type": pa.array([r[0] for r in rows]),
                     "slope": pa.array([r[1] for r in rows], type=pa.float64())})


#: event_type → log level (Stumptown maps app-log levels the same way:
#: ``miru-stumptown-plugins/.../Stumptown.java:37-72`` — per-(bucket,
#: level) waveforms + latest message gather)
LEVEL_OF = {"error": "ERROR", "purchase": "INFO", "signup": "INFO",
            "click": "DEBUG", "view": "DEBUG"}
LEVEL_DEFAULT = "DEBUG"  # MUST match _LEVEL_SQL's ELSE branch — an unknown
#                          event_type must bucket identically in both


def stumptown(sf_dir: str, dt_us: int = US_PER_HOUR, k_latest: int = 3
              ) -> pa.Table:
    """Stumptown view: per-(level, bucket) counts + the level's newest
    event ids (the "latest messages" gather) — level is a derived column,
    exercising the §2.6 Stumptown shape end-to-end."""
    ds = _events(sf_dir, ["event_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        t = _bucket_batch(t, dt_us)
        et = np.asarray(t["event_type"].to_pandas(), dtype=object)
        level = np.array([LEVEL_OF.get(e, LEVEL_DEFAULT) for e in et],
                         dtype=object)
        out = pa.table({"level": pa.array(level, pa.string()),
                        "bucket": t["bucket"],
                        "event_id": t["event_id"]})
        g = out.group_by(["level", "bucket"]).aggregate(
            [("event_id", "count"), ("event_id", "max")])
        return g.rename_columns(["level", "bucket", "cnt", "max_eid"])

    partials = ds.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    out = partials.groupby(["level", "bucket"]).aggregate(
        Sum("cnt", alias_name="n_events"),
        Max("max_eid", alias_name="latest_event_id")).to_pandas()
    out = out.sort_values(["level", "bucket"]).reset_index(drop=True)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["latest_event_id"] = out["latest_event_id"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def inbox_lookup(sf_dir: str, user_id: int = 1, k: int = 10) -> pa.Table:
    """Per-user inbox: the user's newest ``k`` events, newest first
    (reference: ``MiruInboxIndex`` — a per-user postings stream read
    newest-first; here the 'inbox' is the user_id predicate + TIME
    ordering, SURVEY §2.5 'postings on the user field')."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def mine(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["user_id"], user_id))
        if sub.num_rows > k:  # per-batch top-k partial (bounded heap)
            ts = pc.cast(sub["ts"], pa.int64()).to_numpy()
            eid = sub["event_id"].to_numpy()
            order = np.lexsort((eid, ts))[::-1][:k]
            sub = sub.take(pa.array(np.sort(order)))
        return sub

    rows = ds.map_batches(mine, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
    rows = rows.sort_values(["ts", "event_id"],
                            ascending=[False, False]).head(k)
    rows = rows[["event_id", "event_type", "ts"]].reset_index(drop=True)
    return pa.Table.from_pandas(rows, preserve_index=False)


_LEVEL_SQL = ("CASE event_type WHEN 'error' THEN 'ERROR' "
              "WHEN 'purchase' THEN 'INFO' WHEN 'signup' THEN 'INFO' "
              "ELSE 'DEBUG' END")


def unread_counts(sf_dir: str) -> pa.Table:
    """Per-user unread counts with read-watermark semantics: a user's
    'click' events are read receipts, the watermark is their newest click,
    and everything after it (or everything, for users who never clicked)
    is unread (reference: per-user unread streams backfilled from a
    lastReadTime watermark, ``MiruUnreadTrackingIndex`` /
    ``MiruJustInTimeBackfillerizer.java:40-346``).

    Two distributed passes: watermark partials → small groupby →
    broadcast; then per-batch unread partials → groupby sum."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def wm_partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["event_type"], "click"))
        g = pa.table({"user_id": sub["user_id"],
                      "w": pc.cast(sub["ts"], pa.int64())}) \
            .group_by("user_id").aggregate([("w", "max")])
        return g.rename_columns(["user_id", "w"])

    wm = (ds.map_batches(wm_partial, batch_format="pyarrow",
                         batch_size=65536)
          .groupby("user_id").aggregate(Max("w", alias_name="w"))
          .to_pandas())  # one row per clicking user — the broadcast side
    wm = _pdf_cols(wm, ["user_id", "w"])  # no clicks at all → empty frame
    wk = wm["user_id"].to_numpy().astype(np.int64)
    order = np.argsort(wk)
    wm_ref = ray.put((wk[order], wm["w"].to_numpy().astype(np.int64)[order]))

    def unread_partial(t: pa.Table) -> pa.Table:
        keys, ws = ray.get(wm_ref)
        uid = t["user_id"].to_numpy().astype(np.int64)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        w = np.full(len(uid), np.int64(-2**62))  # no watermark → all unread
        has_wm, safe = sorted_lookup(keys, uid)
        w[has_wm] = ws[safe[has_wm]]
        unread = (ts > w).astype(np.int64)
        g = pa.table({"user_id": pa.array(uid), "u": pa.array(unread)}) \
            .group_by("user_id").aggregate([("u", "sum")])
        return g.rename_columns(["user_id", "u"])

    out = (ds.map_batches(unread_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("user_id").aggregate(Sum("u", alias_name="n_unread"))
           .to_pandas())
    out = out.sort_values("user_id").reset_index(drop=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_unread"] = out["n_unread"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


def unread_backfill(sf_dir: str) -> pa.Table:
    """Per-user unread counts from EXPLICIT read/unread marker semantics —
    the reference's JIT backfill state machine
    (``MiruJustInTimeBackfillerizer.java:40-346``): the message stream is
    'view' events; a READ marker ('click' at time c) clears every message
    with ts ≤ c; an UNREAD marker ('error' at time e) re-marks every
    message with ts ≤ e.  Markers apply in time order, so a message's
    final state is decided by the LATEST marker at-or-after it (ties:
    UNREAD wins — re-marking is the destructive direction).

    That state machine reduces exactly to an effective watermark:
    ``wm(user) = last_read if last_read > last_unread else −∞`` and a
    message is unread iff ``ts > wm`` — proven by case analysis in the
    oracle SQL, which states the same rule relationally.  Two distributed
    passes (marker partials → small groupby → user-bounded broadcast;
    then view partials → groupby sum), the same shape as
    :func:`unread_counts`; only users with ≥ 1 unread message appear."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def mark_partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.is_in(t["event_type"],
                                value_set=pa.array(["click", "error"])))
        g = pa.table({"user_id": sub["user_id"],
                      "kind": sub["event_type"],
                      "ts": pc.cast(sub["ts"], pa.int64())}) \
            .group_by(["user_id", "kind"]).aggregate([("ts", "max")])
        return pa.table({"user_id": g["user_id"], "kind": g["kind"],
                         "ts": g["ts_max"]})

    marks = (ds.map_batches(mark_partial, batch_format="pyarrow",
                            batch_size=65536)
             .groupby(["user_id", "kind"]).aggregate(Max("ts",
                                                         alias_name="ts"))
             .to_pandas())  # ≤ 2 rows per marking user — the broadcast side
    marks = _pdf_cols(marks, ["user_id", "kind", "ts"])  # no markers at all
    piv = marks.pivot_table(index="user_id", columns="kind", values="ts",
                            aggfunc="max")
    last_read = piv["click"] if "click" in piv else pd.Series(dtype=float)
    last_unread = piv["error"] if "error" in piv else pd.Series(dtype=float)
    eff = piv.assign(
        r=last_read, u=last_unread if len(last_unread) else np.nan)
    # effective watermark exists only when the newest marker is a READ
    has_wm = eff["r"].notna() & (~(eff["u"] >= eff["r"]).fillna(False))
    wm_users = eff.index.to_numpy().astype(np.int64)[has_wm.to_numpy()]
    wm_vals = eff["r"].to_numpy()[has_wm.to_numpy()].astype(np.int64)
    order = np.argsort(wm_users)
    wm_ref = ray.put((wm_users[order], wm_vals[order]))

    def unread_partial(t: pa.Table) -> pa.Table:
        keys, ws = ray.get(wm_ref)
        sub = t.filter(pc.equal(t["event_type"], "view"))
        uid = sub["user_id"].to_numpy().astype(np.int64)
        ts = pc.cast(sub["ts"], pa.int64()).to_numpy()
        w = np.full(len(uid), np.int64(-2**62))  # no watermark → unread
        hit, safe = sorted_lookup(keys, uid)
        w[hit] = ws[safe[hit]]
        unread = (ts > w).astype(np.int64)
        g = pa.table({"user_id": pa.array(uid), "u": pa.array(unread)}) \
            .group_by("user_id").aggregate([("u", "sum")])
        return pa.table({"user_id": g["user_id"], "u": g["u_sum"]})

    out = (ds.map_batches(unread_partial, batch_format="pyarrow",
                          batch_size=65536)
           .groupby("user_id").aggregate(Sum("u", alias_name="n_unread"))
           .to_pandas())
    out = out[out["n_unread"] > 0].sort_values("user_id") \
        .reset_index(drop=True)
    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_unread"] = out["n_unread"].astype(np.int64)
    return pa.Table.from_pandas(out, preserve_index=False)


#: inactivity gap that closes a session (classic 30-minute web-session rule)
SESSION_GAP_US = 30 * 60 * 1_000_000


def sessions(sf_dir: str, gap_us: int = SESSION_GAP_US,
             _batch_size: int = 65536) -> pa.Table:
    """Per-user sessionization: a user's events sorted by time split into
    sessions wherever the inactivity gap exceeds ``gap_us``.  Output: one
    row per user — (user_id, n_events, n_sessions), all exact ints.

    Scale shape: ONE all-to-all (``sort(user_id, ts)``), then everything
    is batch-local vectorized work.  A session start is an event whose
    same-user predecessor (in the global sort order) is absent or more
    than ``gap_us`` older; each batch counts its starts locally, treating
    its first event as a start, and emits one tiny boundary row —
    the driver then retracts the O(n_batches) starts whose predecessor
    lives in the previous batch.  No per-group Python (``map_groups``
    would pay Ray's per-group overhead at one call per user) and no
    driver pass over events.  The SQL oracle is the lag() window
    formulation of the same rule."""
    ds = _events(sf_dir, ["user_id", "ts"]).sort(["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({
            "kind": pa.array([], pa.int8()),
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_starts": pa.array([], pa.int64()),
            "b_first_uid": pa.array([], pa.int64()),
            "b_first_ts": pa.array([], pa.int64()),
            "b_last_uid": pa.array([], pa.int64()),
            "b_last_ts": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        # the boundary-retraction scheme is only sound if each batch is a
        # CONTIGUOUS slice of the global (user_id, ts) sort order — make a
        # violated assumption loud, never silently wrong
        ooo = (uid[1:] < uid[:-1]) | ((uid[1:] == uid[:-1])
                                      & (ts[1:] < ts[:-1]))
        if ooo.any():
            raise AssertionError("sessionize: batch is not sorted by "
                                 "(user_id, ts) — sort contract violated")
        start = np.ones(n, bool)
        start[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        g = (pa.table({"user_id": pa.array(uid),
                       "s": pa.array(start.astype(np.int64))})
             .group_by("user_id")
             .aggregate([("s", "sum"), ("s", "count")]))
        m = g.num_rows
        z = np.zeros(m, np.int64)
        rows = pa.table({
            "kind": pa.array(np.zeros(m, np.int8)),
            "user_id": g["user_id"],
            "n_events": g["s_count"],
            "n_starts": g["s_sum"],
            "b_first_uid": pa.array(z), "b_first_ts": pa.array(z),
            "b_last_uid": pa.array(z), "b_last_ts": pa.array(z)})
        bnd = pa.table({
            "kind": pa.array([np.int8(1)]),
            "user_id": pa.array([np.int64(-1)]),
            "n_events": pa.array([np.int64(0)]),
            "n_starts": pa.array([np.int64(0)]),
            "b_first_uid": pa.array([uid[0]]),
            "b_first_ts": pa.array([ts[0]]),
            "b_last_uid": pa.array([uid[-1]]),
            "b_last_ts": pa.array([ts[-1]])})
        return pa.concat_tables([rows.cast(empty.schema),
                                 bnd.cast(empty.schema)])

    # partials are O(users-per-batch + 1) rows per batch; materialize so
    # the two consumers below never re-execute the sort
    agg = ds.map_batches(partial, batch_format="pyarrow",
                         batch_size=_batch_size).materialize()
    per_user = _pdf_cols(
        agg.filter(expr="kind == 0")
        .groupby("user_id")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("n_starts", alias_name="n_starts"))
        .to_pandas(), ["user_id", "n_events", "n_starts"])
    bnd = _pdf_cols(agg.filter(expr="kind == 1").to_pandas(),
                    ["b_first_uid", "b_first_ts", "b_last_uid",
                     "b_last_ts"])
    # retract the start over-counted at each batch seam that continues a
    # session: O(n_batches) rows, trivially driver-side.  Batch order is
    # reconstructed from the boundary keys; the LAST keys break first-key
    # ties (two batches can share a first (uid, ts) when duplicate rows
    # straddle a boundary — a batch wholly inside the duplicate run sorts
    # before the one extending past it, restoring stream order)
    bnd = bnd.sort_values(["b_first_uid", "b_first_ts",
                           "b_last_uid", "b_last_ts"]) \
             .reset_index(drop=True)
    corrections: dict[int, int] = {}
    for i in range(1, len(bnd)):
        prev_u = int(bnd["b_last_uid"][i - 1])
        if (prev_u == int(bnd["b_first_uid"][i])
                and int(bnd["b_first_ts"][i]) - int(bnd["b_last_ts"][i - 1])
                <= gap_us):
            corrections[prev_u] = corrections.get(prev_u, 0) + 1
    per_user = per_user.sort_values("user_id").reset_index(drop=True)
    uids = per_user["user_id"].to_numpy().astype(np.int64)
    n_sessions = per_user["n_starts"].to_numpy().astype(np.int64)
    for u, c in corrections.items():
        n_sessions[np.searchsorted(uids, u)] -= c
    return pa.table({
        "user_id": pa.array(uids),
        "n_events": pa.array(per_user["n_events"].to_numpy()
                             .astype(np.int64)),
        "n_sessions": pa.array(n_sessions)})


QUANTILE_PCTS = (50, 90, 99)
_Q_BINS = 4096        # histogram resolution per refinement round
_Q_GATHER_CAP = 262_144  # max rows pulled to the driver for the final pick


# bin membership must be IDENTICAL in the histogram pass and the gather
# pass (float boundary rounding would otherwise shift ranks): one shared
# floor-rule chain — each refinement level is (lo, width, bin) and a row
# is a member iff it matches every level.
def _q_bin_idx(v: np.ndarray, lo: float, width: float) -> np.ndarray:
    return np.clip(np.floor((v - lo) / width).astype(np.int64),
                   0, _Q_BINS - 1)


def _q_member_mask(v: np.ndarray, chain) -> np.ndarray:
    # NULL values never join a bin: NaN would floor-cast to INT64_MIN
    # and clip into bin 0 (ranked SMALLEST) where the SQL oracle's
    # ORDER BY places NULLs LAST — the rank-vs-valid-count check in the
    # callers handles the null tail
    mask = ~np.isnan(v)
    for lo, width, b in chain:
        mask &= _q_bin_idx(v, lo, width) == b
    return mask


def _kth_smallest(ds: "ray.data.Dataset", n: int, lo: float, hi: float,
                  k: int) -> float:
    """Exact k-th smallest of ds["value"] by histogram refinement —
    shared by the global and the per-group quantile ops (``ds`` is the
    whole stream or one group's filtered view)."""
    if lo == hi:
        return lo
    chain: list = []
    rank, prev_count = k, n + 1
    while True:
        width = (hi - lo) / _Q_BINS

        def hist(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy()
            v = v[_q_member_mask(v, chain)]
            return pa.table({"h": pa.array(np.bincount(
                _q_bin_idx(v, lo, width),
                minlength=_Q_BINS).astype(np.int64))})

        h = (ds.map_batches(hist, batch_format="pyarrow",
                            batch_size=65536).to_pandas()["h"]
             .to_numpy().reshape(-1, _Q_BINS).sum(axis=0))
        cum = np.cumsum(h)
        b = int(np.searchsorted(cum, rank))
        rank -= int(cum[b - 1]) if b else 0
        count = int(h[b])
        chain.append((lo, width, b))
        # stop when the bin is gather-sized OR refinement stalled
        # (identical values can't split further) — the gather is
        # (value, count) partials, bounded by DISTINCT values, so a
        # degenerate all-ties bin still gathers one row per value
        if count <= _Q_GATHER_CAP or count >= prev_count or width <= 0:
            def distinct(t: pa.Table) -> pa.Table:
                v = t["value"].to_numpy()
                v = v[_q_member_mask(v, chain)]
                u, c = np.unique(v, return_counts=True)
                return pa.table({"value": pa.array(u),
                                 "cnt": pa.array(c.astype(np.int64))})

            g = (ds.map_batches(distinct, batch_format="pyarrow",
                                batch_size=65536).to_pandas()
                 .groupby("value", as_index=False)["cnt"].sum()
                 .sort_values("value"))
            pos = int(np.searchsorted(g["cnt"].cumsum().to_numpy(), rank))
            return float(g["value"].to_numpy()[pos])
        prev_count = count
        lo, hi = lo + b * width, lo + (b + 1) * width


def value_quantiles(sf_dir: str, pcts=QUANTILE_PCTS) -> pa.Table:
    """EXACT quantiles of ``events.value`` without a global sort — the
    distributed selection algorithm: histogram partials → locate the bin
    holding rank k → refine (re-histogram inside the bin) until the bin is
    gather-sized → exact pick of the k-th smallest on the driver.

    The k-th smallest VALUE is well-defined under ties, so the result is
    float-exact (an element of the column, not an interpolation) and the
    SQL oracle is a plain ``row_number() OVER (ORDER BY value)`` lookup.
    Per round the driver holds ``_Q_BINS`` counts; only the final bin's
    rows (≤ ``_Q_GATHER_CAP``, or a collapsed single-value range) are ever
    collected.  rank k = ceil(pct/100 · n) — 1-based.
    """
    ds = _events(sf_dir, ["value"]).materialize()

    def minmax(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        ok = v[~np.isnan(v)]
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),  # count(*) — rank basis
            "nv": pa.array([len(ok)], pa.int64()),
            "lo": pa.array([float(ok.min()) if len(ok) else np.inf]),
            "hi": pa.array([float(ok.max()) if len(ok) else -np.inf])})

    mm = ds.map_batches(minmax, batch_format="pyarrow",
                        batch_size=65536).to_pandas()
    n = int(mm["n"].sum())
    if n == 0:
        return pa.table({"q_pct": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         "value": pa.array([], pa.float64())})
    n_valid = int(mm["nv"].sum())
    lo0, hi0 = float(mm["lo"].min()), float(mm["hi"].max())
    ks = [(p, (n * p + 99) // 100) for p in pcts]
    # ranks past the non-null prefix land in the oracle's NULLS-LAST
    # tail — the quantile IS null
    out = [(p, k, _kth_smallest(ds, n, lo0, hi0, k) if k <= n_valid
            else None) for p, k in ks]
    return pa.table({"q_pct": pa.array([o[0] for o in out], pa.int64()),
                     "rank": pa.array([o[1] for o in out], pa.int64()),
                     "value": pa.array([o[2] for o in out], pa.float64())})


GROUP_QUANTILE_PCTS = (50, 90)


def group_value_quantiles(sf_dir: str,
                          pcts=GROUP_QUANTILE_PCTS) -> pa.Table:
    """EXACT per-group quantiles (p50/p90 of ``value`` per event_type) —
    the same histogram-refinement selection as
    :func:`value_quantiles`, run over each group's filtered view of ONE
    materialized (event_type, value) stream.  Group cardinality here is
    enum-small (5 event types), so the refinement loop costs
    groups × percentiles × (rounds + 1) streaming passes over the
    materialized stream, each with O(_Q_BINS) driver state; at high
    group cardinality — or many percentiles — key the histogram
    partials by (group, bin) and share each round across all groups and
    ranks instead: same algebra, one pass per round total."""
    ds = _events(sf_dir, ["event_type", "value"]).materialize()

    def mm_partial(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate(
            [("value", "min"), ("value", "max"),
             # count(*) via the never-null KEY column — two counts of
             # 'value' would both surface as 'value_count' (name-based
             # selection per the ADVICE column-order trap)
             ("event_type", "count", pc.CountOptions(mode="all")),
             ("value", "count")])  # non-null — the NULLS-LAST boundary
        return pa.table({"event_type": g["event_type"],
                         "lo": g["value_min"], "hi": g["value_max"],
                         "n": pc.cast(g["event_type_count"], pa.int64()),
                         "nv": pc.cast(g["value_count"], pa.int64())})

    mm = (ds.map_batches(mm_partial, batch_format="pyarrow",
                         batch_size=65536).to_pandas()
          .groupby("event_type", as_index=False)
          .agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"),
               nv=("nv", "sum"))
          .sort_values("event_type").reset_index(drop=True))

    rows = []
    for _, r in mm.iterrows():
        et, n, nv = str(r["event_type"]), int(r["n"]), int(r["nv"])
        view = ds.map_batches(
            lambda t, _et=et: t.filter(pc.equal(t["event_type"], _et))
                               .select(["value"]),
            batch_format="pyarrow", batch_size=65536)
        for p in pcts:
            k = (n * p + 99) // 100
            rows.append((et, p, k,
                         _kth_smallest(view, n, float(r["lo"]),
                                       float(r["hi"]), k)
                         if k <= nv else None))
    return pa.table({
        "event_type": pa.array([x[0] for x in rows], pa.string()),
        "q_pct": pa.array([x[1] for x in rows], pa.int64()),
        "rank": pa.array([x[2] for x in rows], pa.int64()),
        "value": pa.array([x[3] for x in rows], pa.float64())})


def _peakdet(y: np.ndarray, delta: float) -> int:
    """Count peaks: local maxima that rise ≥ delta above the surrounding
    minima (reference: ``PeakDet.java:22-95``, the classic peakdet scan)."""
    peaks = 0
    mn, mx = np.inf, -np.inf
    look_for_max = True
    for v in y:
        if v > mx:
            mx = v
        if v < mn:
            mn = v
        if look_for_max:
            if v < mx - delta:
                peaks += 1
                mn = v
                look_for_max = False
        else:
            if v > mn + delta:
                mx = v
                look_for_max = True
    return peaks


def trending_peaks(sf_dir: str, dt_us: int = US_PER_HOUR, k: int = 3,
                   delta_frac: float = 0.5) -> pa.Table:
    """Top-k event types by waveform peak count (Trending PEAKS strategy,
    ``TrendingQuestion.java:138-199`` + ``PeakDet``); ties by type name.
    delta = delta_frac × waveform mean, per type."""
    wf = waveform(sf_dir, dt_us).to_pandas()
    # NULL-ts events (null bucket) have no place on the time axis
    wf = wf[wf["bucket"].notna()]
    rows = []
    for et, g in wf.groupby("event_type"):
        g = g.sort_values("bucket")
        # densify: missing buckets are zero counts
        buckets = g["bucket"].to_numpy()
        dense = np.zeros(int(buckets.max() - buckets.min() + 1), np.float64)
        dense[buckets - buckets.min()] = g["n_events"].to_numpy()
        rows.append((et, _peakdet(dense, delta_frac * dense.mean())))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pa.table({"event_type": pa.array([r[0] for r in rows[:k]]),
                     "n_peaks": pa.array([r[1] for r in rows[:k]], pa.int64())})


# ------------------------------ as-of join ---------------------------------


def asof_join(sf_dir: str, left_type: str = "purchase",
              right_type: str = "click",
              _batch_size: int = 65536, detail: bool = False) -> pa.Table:
    """As-of join: each ``left_type`` event joined to the most recent
    STRICTLY-earlier ``right_type`` event by the same user (the classic
    purchase ← latest-prior-click attribution).  Ray Data has no as-of
    join; this is the sessions-style composition — ONE all-to-all
    ``sort(user_id, ts, kind)``, then every batch resolves its joins
    locally with a vectorized running-max scan, emitting per-(batch, user)
    seam rows (O(users + batches) total — users are contiguous in the
    sort) plus its unresolved lefts.  A SECOND streaming pass resolves
    those leftovers against the broadcast seam table (strict backward
    ``merge_asof`` per batch) and drops unresolvable lefts worker-side,
    so the driver only ever receives final join rows — O(matched left
    events), the query result.  Lefts with no prior right are dropped
    (inner-asof semantics, matching the SQL oracle).  At a scale where
    the seam table itself outgrows a broadcast, hash-partition pendings
    and seams by user instead — same algebra, one extra shuffle.

    Correctness of the seam scheme: batches are contiguous slices of the
    global sort (asserted).  A left event unresolved in its own batch can
    only be satisfied by rights in EARLIER batches, all of which are
    strictly earlier in time (equal (user, ts) rights sort after lefts,
    so they can never precede one across a batch boundary) — hence the
    per-(batch, user) last-right seam rows plus a strict backward
    merge_asof reproduce the exact join."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        is_l = pc.equal(t["event_type"], left_type)
        is_r = pc.equal(t["event_type"], right_type)
        t = t.filter(pc.or_(is_l, is_r))
        # lefts (kind 0) sort BEFORE rights (kind 1) at equal (user, ts):
        # a same-timestamp right must not satisfy the strict < contract
        kind = pc.cast(pc.equal(t["event_type"], right_type), pa.int8())
        return pa.table({"user_id": t["user_id"],
                         "ts": pc.cast(t["ts"], pa.int64()),
                         "kind": kind,
                         "event_id": t["event_id"]})

    srt = (ds.map_batches(prep, batch_format="pyarrow",
                          batch_size=_batch_size)
           .sort(["user_id", "ts", "kind"]))

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"mk": pa.array([], pa.int8()),
                          "event_id": pa.array([], pa.int64()),
                          "ts": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64()),
                          "rts": pa.array([], pa.int64()),
                          "reid": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        ts = t["ts"].to_numpy()
        kind = t["kind"].to_numpy()
        eid = t["event_id"].to_numpy().astype(np.int64)
        ok = ((uid[1:] > uid[:-1])
              | ((uid[1:] == uid[:-1])
                 & ((ts[1:] > ts[:-1])
                    | ((ts[1:] == ts[:-1]) & (kind[1:] >= kind[:-1])))))
        if not ok.all():
            raise AssertionError("asof_join: batch not sorted by "
                                 "(user_id, ts, kind) — sort contract "
                                 "violated")
        is_r = kind == 1
        last = np.maximum.accumulate(np.where(is_r, np.arange(n), -1))
        new_u = np.r_[True, uid[1:] != uid[:-1]]
        seg_starts = np.flatnonzero(new_u)
        first_of = seg_starts[np.cumsum(new_u) - 1]
        valid = last >= first_of
        ans = ~is_r & valid
        pend = ~is_r & ~valid
        parts = []
        if ans.any():
            m = int(ans.sum())
            parts.append(pa.table({
                "mk": pa.array(np.zeros(m, np.int8)),
                "event_id": pa.array(eid[ans]),
                "ts": pa.array(ts[ans]),
                "user_id": pa.array(uid[ans]),
                "rts": pa.array(ts[last[ans]]),
                "reid": pa.array(eid[last[ans]])}))
        if pend.any():
            m = int(pend.sum())
            parts.append(pa.table({
                "mk": pa.array(np.ones(m, np.int8)),
                "event_id": pa.array(eid[pend]),
                "ts": pa.array(ts[pend]),
                "user_id": pa.array(uid[pend]),
                "rts": pa.array(np.full(m, -1, np.int64)),
                "reid": pa.array(np.full(m, -1, np.int64))}))
        seg_ends = np.r_[seg_starts[1:], n] - 1
        le = last[seg_ends]
        has = le >= seg_starts
        if has.any():
            m = int(has.sum())
            parts.append(pa.table({
                "mk": pa.array(np.full(m, 2, np.int8)),
                "event_id": pa.array(np.full(m, -1, np.int64)),
                "ts": pa.array(np.full(m, -1, np.int64)),
                "user_id": pa.array(uid[seg_starts][has]),
                "rts": pa.array(ts[le[has]]),
                "reid": pa.array(eid[le[has]])}))
        if not parts:
            return empty
        return pa.concat_tables([p.cast(empty.schema) for p in parts])

    # materialize: the seam gather and the resolve pass both consume the
    # partials; a lazy Dataset would re-run the sort per consumer
    agg = srt.map_batches(partial, batch_format="pyarrow",
                          batch_size=_batch_size).materialize()
    bnd = (_pdf_cols(agg.filter(expr="mk == 2").to_pandas(),
                     ["user_id", "rts", "reid"])
           [["user_id", "rts", "reid"]]
           .rename(columns={"rts": "b_rts", "reid": "b_reid"})
           .sort_values("b_rts", kind="mergesort").reset_index(drop=True))
    bnd_ref = ray.put(bnd)

    def resolve(t: pa.Table) -> pa.Table:
        """mk=0 rows pass through; mk=1 pendings resolve against the
        broadcast seam table (any seam right with rts >= the pending's ts
        is from its own or a later batch and is correctly excluded by the
        strict backward match); unresolvable lefts drop HERE, worker-side."""
        out_schema = pa.schema([("event_id", pa.int64()),
                                ("user_id", pa.int64()),
                                ("ts", pa.int64()), ("rts", pa.int64()),
                                ("reid", pa.int64())])
        mk = t["mk"].to_numpy()
        parts = [t.filter(pa.array(mk == 0))
                 .select(["event_id", "user_id", "ts", "rts", "reid"])
                 .cast(out_schema)]
        if (mk == 1).any():
            seam = ray.get(bnd_ref)
            if len(seam):
                pnd = (t.filter(pa.array(mk == 1))
                       .select(["event_id", "ts", "user_id"]).to_pandas()
                       .sort_values("ts", kind="mergesort"))
                res = pd.merge_asof(pnd, seam, left_on="ts",
                                    right_on="b_rts", by="user_id",
                                    allow_exact_matches=False)
                res = res.dropna(subset=["b_rts"])
                if len(res):
                    parts.append(pa.table({
                        "event_id": pa.array(res["event_id"].to_numpy()
                                             .astype(np.int64)),
                        "user_id": pa.array(res["user_id"].to_numpy()
                                            .astype(np.int64)),
                        "ts": pa.array(res["ts"].to_numpy()
                                       .astype(np.int64)),
                        "rts": pa.array(res["b_rts"].to_numpy()
                                        .astype(np.int64)),
                        "reid": pa.array(res["b_reid"].to_numpy()
                                         .astype(np.int64))}))
        return pa.concat_tables(parts)

    ans = _pdf_cols(
        agg.map_batches(resolve, batch_format="pyarrow",
                        batch_size=_batch_size).to_pandas(),
        ["event_id", "user_id", "ts", "rts", "reid"]) \
        .sort_values("event_id").reset_index(drop=True)
    if detail:
        return pa.table({
            "event_id": pa.array(ans["event_id"].to_numpy().astype(np.int64)),
            "user_id": pa.array(ans["user_id"].to_numpy().astype(np.int64)),
            "ts": pa.array(ans["ts"].to_numpy().astype(np.int64)),
            "rts": pa.array(ans["rts"].to_numpy().astype(np.int64)),
            "reid": pa.array(ans["reid"].to_numpy().astype(np.int64))})
    out_col = f"{right_type}_ts"
    return pa.table({
        "event_id": pa.array(ans["event_id"].to_numpy().astype(np.int64)),
        "ts": pa.array(ans["ts"].to_numpy().astype(np.int64))
              .cast(pa.timestamp("us")),
        out_col: pa.array(ans["rts"].to_numpy().astype(np.int64))
                 .cast(pa.timestamp("us"))})


US_PER_DAY = 24 * US_PER_HOUR
RETENTION_MAX_OFFSET = 7


def retention_cohorts(sf_dir: str,
                      max_offset: int = RETENTION_MAX_OFFSET) -> pa.Table:
    """Retention cohorts: users grouped by signup DAY; for each day
    offset 0..``max_offset``, how many of the cohort had ANY event that
    day — the classic signup-retention triangle.

    Two streaming passes: per-user min signup ts via per-batch partials
    (driver merge is user-bounded — the same bound every per-user op
    here documents); then the activity pass looks up each event's
    cohort day via a broadcast sorted-array searchsorted and emits
    distinct (cohort_day, offset, user) partials, ≤ users × offsets
    rows total.  At extreme user cardinality swap the broadcast for a
    hash-partitioned join on user_id — same algebra."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def signup_partial(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["event_type"], "signup"))
        g = sub.group_by("user_id").aggregate([("ts", "min")])
        return pa.table({"user_id": g["user_id"],
                         "ts": pc.cast(g["ts_min"], pa.int64())})

    spdf = ds.map_batches(signup_partial, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
    if spdf.empty:  # no signups → no cohorts (an all-empty partial
        #             stream loses its column names through to_pandas)
        return pa.table({"cohort_day": pa.array([], pa.int64()),
                         "offset_days": pa.array([], pa.int64()),
                         "n_users": pa.array([], pa.int64())})
    sp = spdf.groupby("user_id", as_index=False)["ts"].min()
    su = sp["user_id"].to_numpy().astype(np.int64)
    order = np.argsort(su)
    d0 = (sp["ts"].to_numpy().astype(np.int64) // US_PER_DAY)[order]
    ref = ray.put((su[order], d0))

    def activity_partial(t: pa.Table) -> pa.Table:
        uk, ud0 = ray.get(ref)
        uid = t["user_id"].to_numpy().astype(np.int64)
        empty = pa.table({"cohort_day": pa.array([], pa.int64()),
                          "offset_days": pa.array([], pa.int64()),
                          "user_id": pa.array([], pa.int64())})
        if not len(uk):
            return empty
        day = pc.cast(t["ts"], pa.int64()).to_numpy() // US_PER_DAY
        hit, pos = sorted_lookup(uk, uid)
        off = np.where(hit, day - ud0[pos], -1)
        keep = hit & (off >= 0) & (off <= max_offset)
        out = pa.table({
            "cohort_day": pa.array((day - off)[keep]),
            "offset_days": pa.array(off[keep]),
            "user_id": pa.array(uid[keep])})
        return out.group_by(["cohort_day", "offset_days", "user_id"]) \
                  .aggregate([]).rename_columns(
                      ["cohort_day", "offset_days", "user_id"])

    tri = (ds.map_batches(activity_partial, batch_format="pyarrow",
                          batch_size=65536).to_pandas()
           .drop_duplicates(["cohort_day", "offset_days", "user_id"]))
    out = (tri.groupby(["cohort_day", "offset_days"], as_index=False)
           .agg(n_users=("user_id", "nunique"))
           .sort_values(["cohort_day", "offset_days"])
           .reset_index(drop=True))
    return pa.table({
        "cohort_day": pa.array(out["cohort_day"].astype("int64")),
        "offset_days": pa.array(out["offset_days"].astype("int64")),
        "n_users": pa.array(out["n_users"].astype("int64"))})


FUNNEL_WINDOW_US = 24 * US_PER_HOUR


def funnel_counts(sf_dir: str, window_us: int = FUNNEL_WINDOW_US,
                  _batch_size: int = 65536) -> pa.Table:
    """Ordered funnel (view → click → purchase within a window): users
    with any view; users with a view strictly before a click within
    ``window_us``; users completing the strict 3-step chain with
    purchase − view ≤ ``window_us``.

    Composition of two as-of joins (``detail`` mode): per purchase its
    latest strictly-prior click, per click its latest strictly-prior
    view.  The latest-chain is OPTIMAL — for a purchase p, the latest
    click c* maximizes the view pool, and c*'s latest prior view is the
    maximum v over every valid chain — so "latest chain fits the window"
    ⇔ "ANY chain fits", which is exactly the EXISTS self-join the SQL
    oracle states.  The per-click/per-purchase join tables are
    event-count-bounded driver merges here; at a scale where they
    outgrow the driver, feed the two detail tables through the
    hash-shuffle ``Dataset.join`` on click id instead — same algebra."""
    a2 = asof_join(sf_dir, "click", "view", detail=True,
                   _batch_size=_batch_size).to_pandas()
    a1 = asof_join(sf_dir, "purchase", "click", detail=True,
                   _batch_size=_batch_size).to_pandas()
    step2 = set(a2.loc[a2["ts"] - a2["rts"] <= window_us, "user_id"]
                .astype(int))
    j = a1.merge(a2[["event_id", "rts"]]
                 .rename(columns={"event_id": "click_eid",
                                  "rts": "view_ts"}),
                 left_on="reid", right_on="click_eid")
    step3 = set(j.loc[j["ts"] - j["view_ts"] <= window_us, "user_id"]
                .astype(int))

    def view_users(t: pa.Table) -> pa.Table:
        sub = t.filter(pc.equal(t["event_type"], "view"))
        g = sub.select(["user_id"]).group_by("user_id").aggregate([])
        return g.rename_columns(["user_id"])

    n1 = (_pdf_cols(_events(sf_dir, ["user_id", "event_type"])
                    .map_batches(view_users, batch_format="pyarrow",
                                 batch_size=65536).to_pandas(),
                    ["user_id"])["user_id"].nunique())
    return pa.table({
        "n_view_users": pa.array([int(n1)], pa.int64()),
        "n_view_click_users": pa.array([len(step2)], pa.int64()),
        "n_funnel_users": pa.array([len(step3)], pa.int64())})


#: range-join window: views counted in [purchase_ts − 1h, purchase_ts)
WINDOW_US = US_PER_HOUR


def window_join(sf_dir: str, left_type: str = "purchase",
                right_type: str = "view", window_us: int = WINDOW_US,
                _batch_size: int = 65536) -> pa.Table:
    """Range (interval) join: every ``left_type`` event counts the same
    user's ``right_type`` events with ts in ``[ts − window_us, ts)``,
    reported per user — (user_id, n_purchases, n_window_views).  Ray Data
    has no range join; this is the sessions/as-of composition: ONE
    all-to-all ``sort(user_id, ts, event_id)`` (a total order — no ties for
    the seam cut to misjudge), then each batch answers its lefts locally
    with two ``searchsorted`` probes over its right rows, encoded as
    batch-normalized (user, ts) composite keys (a loud guard bounds
    user-range × time-span to int64).

    Seam scheme: only a batch's FIRST user can have window mass in earlier
    batches (batches are contiguous sort slices — asserted).  Such lefts
    emit a pending row carrying the batch's first (ts, event_id) as the
    cut; every batch emits its LAST user's rights within ``window_us`` of
    the batch's last row (vt ≥ end − W — any right an ever-later batch's
    crossing left can need satisfies this, since that left's ts ≥ this
    batch's end).  The driver adds, per pending, the seam rights with
    (ts, event_id) lexicographically below the cut (excludes own/later
    batches exactly) and ts inside the window.  Both spills are
    O(batches × one user's rights-per-window) — the same per-seam bound
    the as-of join documents.  The SQL oracle is the LEFT JOIN … BETWEEN
    formulation."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        is_l = pc.equal(t["event_type"], left_type)
        is_r = pc.equal(t["event_type"], right_type)
        t2 = t.filter(pc.or_(is_l, is_r))
        return pa.table({
            "user_id": t2["user_id"],
            "ts": pc.cast(t2["ts"], pa.int64()),
            "event_id": t2["event_id"],
            "is_r": pc.cast(pc.equal(t2["event_type"], right_type),
                            pa.int8())})

    srt = (ds.map_batches(prep, batch_format="pyarrow",
                          batch_size=_batch_size)
           .sort(["user_id", "ts", "event_id"]))

    W = np.int64(window_us)

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table({"mk": pa.array([], pa.int8()),
                          "user_id": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        n = t.num_rows
        if n == 0:
            return empty
        uid = t["user_id"].to_numpy().astype(np.int64)
        ts = t["ts"].to_numpy()
        eid = t["event_id"].to_numpy().astype(np.int64)
        is_r = t["is_r"].to_numpy().astype(bool)
        ok = ((uid[1:] > uid[:-1])
              | ((uid[1:] == uid[:-1])
                 & ((ts[1:] > ts[:-1])
                    | ((ts[1:] == ts[:-1]) & (eid[1:] > eid[:-1])))))
        if not ok.all():
            raise AssertionError("window_join: batch not sorted by "
                                 "(user_id, ts, event_id) — sort contract "
                                 "violated")
        vu, vt = uid[is_r], ts[is_r]
        pu, pt = uid[~is_r], ts[~is_r]
        cnt = np.zeros(len(pu), np.int64)
        if len(vu) and len(pu):
            vumin = vu[0]
            span = np.int64(vt.max() - vt.min() + 2)
            vtmin = np.int64(vt.min())
            urange = np.int64(vu[-1] - vumin)
            # guard product in PYTHON ints — an np.int64 multiply can
            # itself wrap past 2^63 and silently slip under the bound
            if int(urange + 2) * int(span) >= 1 << 62:
                raise AssertionError(
                    "window_join: batch user-range × time-span overflows "
                    "the composite key — reduce _batch_size")
            cv = (vu - vumin) * span + (vt - vtmin)
            pur = np.clip(pu - vumin, -1, urange + 1)
            hi = pur * span + np.clip(pt - vtmin, 0, span)
            lo = pur * span + np.clip(pt - W - vtmin, 0, span)
            cnt = (np.searchsorted(cv, hi, side="left")
                   - np.searchsorted(cv, lo, side="left")).astype(np.int64)
        parts = []
        if len(pu):
            g = (pa.table({"user_id": pa.array(pu), "v": pa.array(cnt)})
                 .group_by("user_id").aggregate([("v", "sum"),
                                                 ("v", "count")]))
            m = g.num_rows
            parts.append(pa.table({
                "mk": pa.array(np.zeros(m, np.int8)),
                "user_id": g["user_id"],
                "a": pc.cast(g["v_count"], pa.int64()),
                "b": pc.cast(g["v_sum"], pa.int64()),
                "c": pa.array(np.zeros(m, np.int64))}))
            # pendings: first user's lefts whose window can reach rights
            # in earlier batches — carry the (ts, event_id) cut.  <= not <:
            # at pt − W == ts[0] a TIED-timestamp right with a smaller
            # event_id can still sit across the seam, inside the window
            pend = (pu == uid[0]) & (pt - W <= ts[0])
            if pend.any():
                m = int(pend.sum())
                parts.append(pa.table({
                    "mk": pa.array(np.ones(m, np.int8)),
                    "user_id": pa.array(pu[pend]),
                    "a": pa.array(pt[pend]),
                    "b": pa.array(np.full(m, ts[0], np.int64)),
                    "c": pa.array(np.full(m, eid[0], np.int64))}))
        # seam rights: last user's rights within W of the batch end
        seam = is_r & (uid == uid[-1]) & (ts >= ts[-1] - W)
        if seam.any():
            m = int(seam.sum())
            parts.append(pa.table({
                "mk": pa.array(np.full(m, 2, np.int8)),
                "user_id": pa.array(uid[seam]),
                "a": pa.array(ts[seam]),
                "b": pa.array(eid[seam]),
                "c": pa.array(np.zeros(m, np.int64))}))
        if not parts:
            return empty
        return pa.concat_tables([p.cast(empty.schema) for p in parts])

    agg = srt.map_batches(partial, batch_format="pyarrow",
                          batch_size=_batch_size).materialize()
    per_user = (_pdf_cols(agg.filter(expr="mk == 0").groupby("user_id")
                          .aggregate(Sum("a", alias_name="n_left"),
                                     Sum("b", alias_name="n_views"))
                          .to_pandas(), ["user_id", "n_left", "n_views"])
                .sort_values("user_id").reset_index(drop=True))
    pend = _pdf_cols(agg.filter(expr="mk == 1").to_pandas(),
                     ["mk", "user_id", "a", "b", "c"])
    seam = _pdf_cols(agg.filter(expr="mk == 2").to_pandas(),
                     ["mk", "user_id", "a", "b", "c"])
    uids = per_user["user_id"].to_numpy().astype(np.int64)
    n_views = per_user["n_views"].to_numpy().astype(np.int64)
    if len(pend) and len(seam):
        su = seam["user_id"].to_numpy().astype(np.int64)
        st = seam["a"].to_numpy().astype(np.int64)
        se = seam["b"].to_numpy().astype(np.int64)
        for _, row in pend.iterrows():
            u, p_ts = int(row["user_id"]), int(row["a"])
            cut_ts, cut_eid = int(row["b"]), int(row["c"])
            hit = ((su == u)
                   & (st >= p_ts - int(W)) & (st < p_ts)
                   & ((st < cut_ts) | ((st == cut_ts) & (se < cut_eid))))
            if hit.any():
                n_views[np.searchsorted(uids, u)] += int(hit.sum())
    return pa.table({
        "user_id": pa.array(uids),
        "n_purchases": pa.array(per_user["n_left"].to_numpy()
                                .astype(np.int64)),
        "n_window_views": pa.array(n_views)})


# --------------------------- SQL oracles -----------------------------------

SQL = {
    # strictly-prior latest click per purchase; the group-max self-join is
    # the unambiguous relational statement of the as-of contract
    "events_asof_purchase_click": """
SELECT p.event_id, p.ts, max(c.ts) AS click_ts
FROM events p JOIN events c
  ON c.user_id = p.user_id AND c.event_type = 'click' AND c.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.ts
ORDER BY p.event_id
""".strip(),
    # retention triangle: cohort = user's min signup DAY; a cohort-day ×
    # offset cell counts distinct users active that day
    "events_retention": f"""
WITH s AS (
  SELECT user_id, min(epoch_us(ts)) // {US_PER_DAY} AS d0
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
a AS (
  SELECT DISTINCT e.user_id, epoch_us(e.ts) // {US_PER_DAY} AS d
  FROM events e),
j AS (
  SELECT s.user_id, s.d0, a.d - s.d0 AS off
  FROM s JOIN a USING (user_id)
  WHERE a.d >= s.d0 AND a.d - s.d0 <= {RETENTION_MAX_OFFSET})
SELECT d0::BIGINT AS cohort_day, off::BIGINT AS offset_days,
       count(DISTINCT user_id)::BIGINT AS n_users
FROM j GROUP BY d0, off ORDER BY cohort_day, offset_days
""".strip(),
    # ordered funnel: strict-< chains, window anchored at the view; the
    # EXISTS form is what the engine's latest-chain composition equals
    "events_funnel": f"""
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
u1 AS (SELECT DISTINCT user_id FROM e WHERE event_type = 'view'),
u2 AS (SELECT DISTINCT c.user_id FROM e c JOIN e v
         ON v.user_id = c.user_id AND c.event_type = 'click'
        AND v.event_type = 'view' AND v.t < c.t
        AND c.t - v.t <= {FUNNEL_WINDOW_US}),
u3 AS (SELECT DISTINCT p.user_id
       FROM e p
       JOIN e c ON c.user_id = p.user_id AND p.event_type = 'purchase'
              AND c.event_type = 'click' AND c.t < p.t
       JOIN e v ON v.user_id = p.user_id AND v.event_type = 'view'
              AND v.t < c.t AND p.t - v.t <= {FUNNEL_WINDOW_US})
SELECT (SELECT count(*) FROM u1)::BIGINT AS n_view_users,
       (SELECT count(*) FROM u2)::BIGINT AS n_view_click_users,
       (SELECT count(*) FROM u3)::BIGINT AS n_funnel_users
""".strip(),
    # range join: per purchase, same-user views in [ts − 1h, ts); summed
    # per user.  LEFT JOIN keeps zero-view purchases in n_purchases.
    "events_window_join": f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'purchase'),
v AS (
  SELECT user_id, epoch_us(ts) AS t
  FROM events WHERE event_type = 'view'),
j AS (
  SELECT p.user_id, p.event_id, count(v.t) AS c
  FROM p LEFT JOIN v
    ON v.user_id = p.user_id AND v.t >= p.t - {WINDOW_US}
       AND v.t < p.t
  GROUP BY p.user_id, p.event_id)
SELECT user_id, count(*)::BIGINT AS n_purchases,
       sum(c)::BIGINT AS n_window_views
FROM j GROUP BY user_id ORDER BY user_id
""".strip(),
    "events_distincts":
        "SELECT DISTINCT event_type FROM events ORDER BY event_type",
    # lag() window formulation of the inactivity-gap rule; ties in ts are
    # benign (any tie order gives gap 0 ⇒ same session)
    "events_sessions": f"""
WITH l AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS pt
  FROM events)
SELECT user_id, count(*)::BIGINT AS n_events,
       sum(CASE WHEN pt IS NULL OR t - pt > {SESSION_GAP_US}
                THEN 1 ELSE 0 END)::BIGINT AS n_sessions
FROM l GROUP BY user_id ORDER BY user_id
""".strip(),
    "events_stumptown": f"""
SELECT {_LEVEL_SQL} AS level,
       (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
       count(*)::BIGINT AS n_events,
       max(event_id)::BIGINT AS latest_event_id
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip(),
    "events_inbox_lookup": """
SELECT event_id, event_type, ts FROM events
WHERE user_id = 1
ORDER BY ts DESC, event_id DESC LIMIT 10
""".strip(),
    "events_unread_counts": """
WITH wm AS (
  SELECT user_id, max(epoch_us(ts)) AS w FROM events
  WHERE event_type = 'click' GROUP BY user_id)
SELECT e.user_id,
       count(*) FILTER (wm.w IS NULL OR epoch_us(e.ts) > wm.w)::BIGINT
         AS n_unread
FROM events e LEFT JOIN wm USING (user_id)
GROUP BY e.user_id ORDER BY e.user_id
""".strip(),
    "events_unread_backfill": """
WITH marks AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           AS last_read,
         max(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
           AS last_unread
  FROM events GROUP BY user_id),
msgs AS (
  SELECT user_id, epoch_us(ts) AS ts FROM events
  WHERE event_type = 'view')
SELECT m.user_id, count(*)::BIGINT AS n_unread
FROM msgs m LEFT JOIN marks k USING (user_id)
WHERE k.last_read IS NULL
   OR coalesce(k.last_unread, -4611686018427387904) >= k.last_read
   OR m.ts > k.last_read
GROUP BY m.user_id ORDER BY m.user_id
""".strip(),
    "events_uniques":
        "SELECT count(DISTINCT user_id)::BIGINT AS n_unique_users FROM events",
    "events_aggregate_counts": """
SELECT event_type, count(*)::BIGINT AS n_events,
       min(ts) AS oldest_ts, max(ts) AS newest_ts
FROM events GROUP BY event_type ORDER BY event_type
""".strip(),
    "events_waveform": f"""
SELECT event_type,
       (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""".strip(),
    "events_metrics": f"""
SELECT (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
       round_even(sum(CAST(round_even(value * 1e6, 0) AS BIGINT)) / 1e6, 6) AS sum_value,
       round_even(sum(CAST(round_even(value * 1e6, 0) AS BIGINT)) / 1e6 / count(*), 6) AS avg_value,
       count(*)::BIGINT AS n_events
FROM events GROUP BY 1 ORDER BY 1
""".strip(),
    # PEAKS strategy reproduced exactly in SQL: the PeakDet state machine
    # (PeakDet.java:22-95 semantics, _peakdet above) walked by a recursive
    # CTE over the zero-densified waveform; delta = 0.5 × mean(dense).
    # All values are integer-valued doubles, so engine and SQL arithmetic
    # are bit-identical.
    "events_trending_peaks": f"""
WITH RECURSIVE wf AS (
  SELECT event_type,
         (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2),
rng AS (SELECT event_type, min(bucket) AS b0, max(bucket) AS b1
        FROM wf GROUP BY 1),
series AS (
  SELECT r.event_type, r.b0, u.i
  FROM rng r, unnest(generate_series(r.b0, r.b1)) AS u(i)),
dense AS (
  SELECT s.event_type, s.i - s.b0 AS pos, COALESCE(w.n, 0)::DOUBLE AS v
  FROM series s
  LEFT JOIN wf w ON w.event_type = s.event_type AND w.bucket = s.i),
d AS (SELECT event_type, 0.5 * avg(v) AS delta, max(pos) AS maxpos
      FROM dense GROUP BY 1),
walk(event_type, pos, mn, mx, look, peaks) AS (
  SELECT event_type, -1, 1e308, -1e308, true, 0 FROM d
  UNION ALL
  SELECT w.event_type, w.pos + 1,
         CASE WHEN w.look AND dd.v < greatest(w.mx, dd.v) - d.delta
              THEN dd.v ELSE least(w.mn, dd.v) END,
         CASE WHEN NOT w.look AND dd.v > least(w.mn, dd.v) + d.delta
              THEN dd.v ELSE greatest(w.mx, dd.v) END,
         CASE WHEN w.look AND dd.v < greatest(w.mx, dd.v) - d.delta
              THEN false
              WHEN NOT w.look AND dd.v > least(w.mn, dd.v) + d.delta
              THEN true ELSE w.look END,
         w.peaks + CASE WHEN w.look AND dd.v < greatest(w.mx, dd.v) - d.delta
                        THEN 1 ELSE 0 END
  FROM walk w
  JOIN dense dd ON dd.event_type = w.event_type AND dd.pos = w.pos + 1
  JOIN d ON d.event_type = w.event_type)
SELECT w.event_type, w.peaks::BIGINT AS n_peaks
FROM walk w JOIN d ON d.event_type = w.event_type AND w.pos = d.maxpos
ORDER BY n_peaks DESC, w.event_type ASC LIMIT 3
""".strip(),
    "events_anomaly": f"""
WITH b AS (
  SELECT (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
         sum(CAST(round_even(value * 1e6, 0) AS BIGINT)) AS sv6,
         count(*) AS n_events
  FROM events WHERE event_type = '{ANOMALY_EVENT_TYPE}' GROUP BY 1),
tot AS (SELECT sum(sv6) AS total, count(*) AS nb FROM b)
SELECT bucket, n_events::BIGINT AS n_events,
       round_even(sv6 / 1e6, 6) AS sum_value,
       round_even(abs(sv6 - total * 1.0 / nb) / 1e6, 6) AS deviation
FROM b, tot
ORDER BY abs(nb * sv6 - total) DESC, bucket ASC
LIMIT {ANOMALY_TOPK}
""".strip(),
    "events_trending": f"""
WITH wf AS (
  SELECT event_type,
         (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
         count(*) AS n_events
  FROM events GROUP BY 1, 2)
SELECT event_type, round_even(regr_slope(n_events, bucket), 6) AS slope
FROM wf GROUP BY event_type
ORDER BY slope DESC, event_type ASC LIMIT 3
""".strip(),
}

# RANGE framing sums by bucket VALUE (missing buckets = 0), exactly the
# engine's value-range searchsorted window; generated so parameterized
# callers share one definition with the default registry entry
SQL["events_rolling_counts"] = rolling_counts_sql()

SQL["events_group_quantiles"] = f"""
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
q AS (SELECT unnest([{", ".join(map(str, GROUP_QUANTILE_PCTS))}]) AS q_pct)
SELECT r.event_type, q.q_pct::BIGINT AS q_pct,
       ((r.n * q.q_pct + 99) // 100)::BIGINT AS rank, r.value
FROM r JOIN q ON r.rn = (r.n * q.q_pct + 99) // 100
ORDER BY event_type, q_pct
""".strip()

SQL["events_value_quantiles"] = f"""
WITH n AS (SELECT count(*) AS n FROM events),
r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM events),
q AS (SELECT unnest([{", ".join(map(str, QUANTILE_PCTS))}]) AS q_pct)
SELECT q.q_pct::BIGINT AS q_pct,
       ((n.n * q.q_pct + 99) // 100)::BIGINT AS rank, r.value
FROM q, n, r
WHERE r.rn = (n.n * q.q_pct + 99) // 100
ORDER BY q_pct
""".strip()
