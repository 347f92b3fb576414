"""Feature-model build + scoring — the Catwalk/Strut analogue over events.

Reference semantics (SURVEY.md §2.5):

- **Catwalk model build** (``miru-stream-plugins/.../catwalk/Catwalk.java:
  64-227``): for each gathered feature, numerator = co-occurrence count with
  the labeled set, denominator = global feature cardinality, emitted as
  ``FeatureScore{numerator, denominator}`` (:194).
- **Strut scoring** (``miru-stream-plugins/.../strut/Strut.java:72-250``):
  candidates scored ``s = numerator / denominator`` per feature (:202-216),
  combined with a strategy (MAX here), model held in a per-node cache
  (``StrutModelCache.java:36-140``) — our scorer actor pool receives the
  model via ``ray.put`` once and keeps it across batches.

Concrete task: label = "user made a high-value purchase (value > 150)";
feature of a user = distinct (event_type @ hour-of-day) pairs of their
non-purchase events; model scores P(labeled | feature); unlabeled users
ranked by max feature score.  All counts are distinct-user integers, so the
SQL oracle matches exactly.

Scale shape: the distinct (user, feature) pass, the labeled-user distinct,
and the FeatureScore aggregation are ALL distributed groupbys; only the
model table itself (one row per feature — the broadcast side by
definition) and the final top-k ever reach the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max

from ..util import broadcast_get, read_parquet_clean, sorted_lookup

US_PER_HOUR = 3_600_000_000


def _events(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                                 columns=columns)


LABEL_VALUE_THRESHOLD = 150  # splits the user population (~45% labeled)


def _ts_mask(t: pa.Table, t0_us: int | None, t1_us: int | None):
    """Half-open ingest window mask (t0_us, t1_us] over the ts column;
    None bounds are unbounded.

    NULL ts belongs to the INITIAL window (t0_us is None) and to no
    forward window: every row must land in exactly ONE window of a
    store's lifetime, or the merged store diverges from a full rebuild
    (whose unwindowed scans keep NULL-ts rows).  Consumers that exclude
    NULL ts on their own (``_feature_batch``) still filter is_valid
    explicitly."""
    if t0_us is None and t1_us is None:
        return None
    ts = pc.cast(t["ts"], pa.int64())
    m = None
    if t0_us is not None:
        m = pc.greater(ts, t0_us)  # NULL → null → dropped (not re-counted)
    if t1_us is not None:
        hi = pc.less_equal(ts, t1_us)
        if t0_us is None:
            hi = pc.fill_null(hi, True)  # NULL lands in the initial window
        m = hi if m is None else pc.and_(m, hi)
    return m


def _labeled_users(sf_dir: str, t0_us: int | None = None,
                   t1_us: int | None = None) -> np.ndarray:
    """Users with a high-value purchase (value > threshold) — the labeled
    set (small; broadcast).  One pruned distributed scan + distinct (the
    oracle engine is NOT a production dependency)."""
    ds = _events(sf_dir, ["user_id", "event_type", "value", "ts"])

    def high_value(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], "purchase"),
                    pc.greater(t["value"], LABEL_VALUE_THRESHOLD))
        w = _ts_mask(t, t0_us, t1_us)
        if w is not None:
            m = pc.and_(m, w)
        sub = t.filter(m)
        return sub.select(["user_id"]).group_by("user_id").aggregate([])

    users = (ds.map_batches(high_value, batch_format="pyarrow",
                            batch_size=65536)
             .unique("user_id"))
    # a window with zero labeled purchases: unique() over the all-empty
    # stream yields None, not []
    return np.array(sorted(users or []), np.int64)


def _feature_batch(t: pa.Table, t0_us: int | None = None,
                   t1_us: int | None = None) -> pa.Table:
    """events batch → distinct (user_id, feature) partials."""
    w = _ts_mask(t, t0_us, t1_us)
    if w is not None:
        t = t.filter(w)
    t = t.filter(pc.not_equal(t["event_type"], "purchase"))
    # a NULL ts has no hour-of-day feature (and would render EVERY hour
    # in its batch as float strings); the SQL side filters identically —
    # also keeps the store's windowed merges (whose masks drop null ts)
    # equal to a full rebuild
    t = t.filter(pc.is_valid(t["ts"]))
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    hour = (ts // US_PER_HOUR) % 24
    et = np.asarray(t["event_type"].to_pandas(), dtype=object)
    feat = et + "@" + pd.Series(hour).astype(str).to_numpy(dtype=object)
    out = pa.table({"user_id": t["user_id"],
                    "feature": pa.array(feat, pa.string())})
    # group_by(keys).aggregate([]) already yields exactly (feature,
    # user_id) — no rename needed
    return out.group_by(["feature", "user_id"]).aggregate([])


def _pair_partials(sf_dir: str, t0_us: int | None = None,
                   t1_us: int | None = None) -> "ray.data.Dataset":
    """Per-batch-distinct (feature, user_id) partials.  NOT globally
    distinct — a pair can repeat across batches; consumers must be
    duplicate-tolerant (per-feature nunique, per-user MAX)."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])
    return ds.map_batches(lambda t: _feature_batch(t, t0_us, t1_us),
                          batch_format="pyarrow", batch_size=65536)


def _model_from_pairs(pairs: "ray.data.Dataset",
                      lab: np.ndarray) -> pd.DataFrame:
    """FeatureScore table via ONE distributed groupby(feature).map_groups:
    numerator = labeled distinct users, denominator = all distinct users.
    The group count is the (small) feature vocabulary — map_groups is cheap
    here, and one shuffle of the pre-shrunk partials beats a global
    distinct-pairs shuffle followed by a second aggregate.  Only the
    per-feature model rows (the broadcast side of Strut scoring by
    definition) return to the driver."""
    lab_ref = ray.put(lab)

    def feature_score(g: pd.DataFrame) -> pd.DataFrame:
        labs = broadcast_get(lab_ref)  # once per worker, not per group
        users = pd.unique(g["user_id"].to_numpy())
        return pd.DataFrame({
            "feature": [g["feature"].iloc[0]],
            "numerator": [int(np.isin(users, labs).sum())],
            "denominator": [len(users)]})

    out = (pairs.groupby("feature").map_groups(feature_score,
                                               batch_format="pandas")
           .to_pandas())
    out["numerator"] = out["numerator"].astype(np.int64)
    out["denominator"] = out["denominator"].astype(np.int64)
    return out.sort_values("feature").reset_index(drop=True)


def catwalk_model(sf_dir: str) -> pa.Table:
    """(feature, numerator, denominator) — FeatureScore table, computed
    end-to-end distributed (distinct pass + grouped two-sided counts,
    ``Catwalk.java:125-163``)."""
    out = _model_from_pairs(_pair_partials(sf_dir), _labeled_users(sf_dir))
    return pa.Table.from_pandas(out, preserve_index=False)


class StrutScorer:
    """Actor-pool scorer: model loaded ONCE per actor from the object
    store (StrutModelCache analogue) as parallel sorted arrays, applied
    per batch of (user, feature) pairs → per-user max feature score
    partials.  Arrow-native: lookups are searchsorted substitutions, the
    per-user max is a lexsort + reduceat — no pandas hop."""

    def __init__(self, model_ref, labeled_ref):
        feats, nums, dens = ray.get(model_ref)
        order = np.argsort(feats)
        self.fk = feats[order]
        self.fv = (nums / dens)[order]
        self.labeled = np.sort(ray.get(labeled_ref))

    def __call__(self, b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy().astype(np.int64)
        is_labeled, _ = sorted_lookup(self.labeled, uid)
        keep = ~is_labeled
        uid = uid[keep]
        if not len(uid):
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64())})
        feats = np.asarray(b["feature"].to_pandas(), dtype=object)[keep]
        fhit, fpos = sorted_lookup(self.fk, feats)
        s = np.where(fhit, self.fv[fpos] if len(self.fk) else 0.0, 0.0)
        order = np.lexsort((s, uid))
        uid, s = uid[order], s[order]
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        return pa.table({
            "user_id": pa.array(uid[starts]),
            "s": pa.array(np.maximum.reduceat(s, starts))})


def strut_topk(sf_dir: str, k: int = 10) -> pa.Table:
    """Top-k unlabeled users by max feature score (MAX strategy).

    The pair partials are materialized ONCE in the object store (never on
    the driver); the model is derived from them distributed, broadcast,
    and the scorer actor pool re-consumes the same blocks.  MAX scoring is
    duplicate-tolerant, so the partials need no global distinct pass."""
    lab = _labeled_users(sf_dir)
    pairs = _pair_partials(sf_dir).materialize()
    model = _model_from_pairs(pairs, lab)
    model_ref = ray.put((np.asarray(model["feature"], object),
                         model["numerator"].to_numpy().astype(np.float64),
                         model["denominator"].to_numpy().astype(np.float64)))
    lab_ref = ray.put(lab)
    partials = pairs.map_batches(
        StrutScorer, batch_format="pyarrow", batch_size=65536,
        concurrency=(1, 4), fn_constructor_args=(model_ref, lab_ref))
    scored = partials.groupby("user_id").aggregate(
        Max("s", alias_name="score"))
    # distributed top-k: sort + limit — only k rows reach the driver
    out = scored.sort(["score", "user_id"],
                      descending=[True, False]).limit(k).to_pandas()
    out["score"] = out["score"].round(6)
    out["user_id"] = out["user_id"].astype(np.int64)
    return pa.Table.from_pandas(out.reset_index(drop=True),
                                preserve_index=False)


# ------------------------- durable model store -----------------------------
#
# Reference: CatwalkModelService persists FeatureScore models and merges
# incremental updates into them (``miru-catwalk-service/.../
# CatwalkModelService.java:45,146-200``).  The Ray-Data analogue stores the
# model at (feature, user) PAIR granularity so the merge stays EXACT: the
# distinct-user numerator/denominator of a merged window cannot be derived
# from two windows' counts (users overlap), but it can from the union of
# their pre-shrunk pair partials.  The store is duplicate-tolerant (pair
# partials may repeat across files), so a crash between the delta append
# and the watermark update only causes a harmless re-append on retry.


def _store_meta_path(store_dir: str) -> str:
    return os.path.join(store_dir, "_META.json")


def _events_max_ts(sf_dir: str) -> int:
    """Max event ts from Parquet row-group STATISTICS — metadata only,
    no data scan.  Falls back to a pruned distributed scan when a
    writer omitted statistics or a row group's ts values are all NULL
    (``statistics``/``.max`` is None there — max(None, datetime)
    raises)."""
    import pyarrow.parquet as pq
    path = os.path.join(sf_dir, "events.parquet")
    md = pq.read_metadata(path)
    col = {md.schema.column(i).name: i for i in range(md.num_columns)}["ts"]
    maxes = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(col).statistics
        if st is None or st.max is None:
            continue
        maxes.append(st.max)
    if len(maxes) < md.num_row_groups or not maxes:
        hi = (read_parquet_clean(path, columns=["ts"])
              .to_pandas()["ts"].max())  # ts column only; skips nulls
        if hi is None or hi != hi:
            return 0  # every ts NULL (or zero rows): epoch floor
        return int(pa.scalar(hi).cast(pa.timestamp("us"))
                   .cast(pa.int64()).as_py())
    hi = max(maxes)
    return int(pa.scalar(hi).cast(pa.timestamp("us")).cast(pa.int64()).as_py())


def _append_pairs_atomic(ds: "ray.data.Dataset", dest: str,
                         tag: str) -> None:
    """Append a pair-partial delta to the durable store without ever
    exposing a torn file: the Dataset writes into a tmp dir, completed
    files then move in with atomic renames under deterministic
    ``{tag}-`` names.  A crash mid-write leaves only the tmp dir (swept
    on retry); a crash mid-move leaves some files in place — the retry
    overwrites the same names, and pair consumers are duplicate-tolerant
    by contract."""
    import shutil
    tmp = dest.rstrip("/") + f".tmp-{tag}"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    os.makedirs(dest, exist_ok=True)
    moved = 0
    for f in sorted(os.listdir(tmp)):
        if f.endswith(".parquet"):
            os.replace(os.path.join(tmp, f),
                       os.path.join(dest, f"{tag}-{moved:05d}.parquet"))
            moved += 1
    shutil.rmtree(tmp, ignore_errors=True)


def model_store_init(sf_dir: str, store_dir: str,
                     upto_us: int | None = None) -> dict:
    """Create a durable model store from events with ts ≤ ``upto_us``
    (None = everything).  Layout: ``pairs/`` + ``labeled/`` Parquet
    (streamed via write_parquet — never driver-materialized) and a
    watermark in ``_META.json`` (written LAST: commit point)."""
    from ..util import atomic_write_json
    if upto_us is None:
        upto_us = _events_max_ts(sf_dir)
    os.makedirs(store_dir, exist_ok=True)
    _append_pairs_atomic(_pair_partials(sf_dir, None, upto_us),
                         os.path.join(store_dir, "pairs"), "init")
    lab = _labeled_users(sf_dir, None, upto_us)
    import pyarrow.parquet as pq
    os.makedirs(os.path.join(store_dir, "labeled"), exist_ok=True)
    lpath = os.path.join(store_dir, "labeled", "part-init.parquet")
    pq.write_table(pa.table({"user_id": pa.array(lab, pa.int64())}),
                   lpath + ".tmp")
    os.replace(lpath + ".tmp", lpath)  # never a torn labeled part
    meta = {"watermark_us": int(upto_us), "merges": 0}
    atomic_write_json(_store_meta_path(store_dir), meta)
    return meta


def model_store_merge(sf_dir: str, store_dir: str,
                      upto_us: int | None = None) -> dict:
    """Fold new events (watermark < ts ≤ upto_us) into the store: one
    pruned delta scan, pair/labeled partials APPENDED (merge-by-union —
    the pair store is the sort-merge substrate, no old events re-read),
    watermark advanced last."""
    from ..util import atomic_write_json, read_json
    meta = read_json(_store_meta_path(store_dir))
    t0 = meta["watermark_us"]
    if upto_us is None:
        upto_us = _events_max_ts(sf_dir)
    if upto_us <= t0:  # nothing new past the watermark — a true no-op
        return meta
    _append_pairs_atomic(_pair_partials(sf_dir, t0, upto_us),
                         os.path.join(store_dir, "pairs"),
                         f"m{meta['merges']:04d}")
    lab = _labeled_users(sf_dir, t0, upto_us)
    if len(lab):
        import pyarrow.parquet as pq
        lpath = os.path.join(store_dir, "labeled",
                             f"part-m{meta['merges']:04d}.parquet")
        pq.write_table(pa.table({"user_id": pa.array(lab, pa.int64())}),
                       lpath + ".tmp")
        os.replace(lpath + ".tmp", lpath)
    meta = {"watermark_us": int(upto_us), "merges": meta["merges"] + 1}
    atomic_write_json(_store_meta_path(store_dir), meta)
    return meta


def model_store_model(store_dir: str) -> pa.Table:
    """FeatureScore model recomputed from the stored pair partials —
    O(distinct pairs), not O(events): the point of the durable store."""
    import pyarrow.dataset as pads
    lab_t = pads.dataset(os.path.join(store_dir, "labeled")).to_table()
    lab = np.unique(lab_t["user_id"].to_numpy().astype(np.int64))
    pairs = read_parquet_clean(os.path.join(store_dir, "pairs"))
    out = _model_from_pairs(pairs, lab)
    return pa.Table.from_pandas(out, preserve_index=False)


def catwalk_model_incremental(sf_dir: str) -> pa.Table:
    """Demonstrates the store contract end-to-end: build a store from the
    OLDER half of the event stream, merge the newer half as a delta, and
    return the merged model — which must hash-match the full-rebuild SQL
    oracle (merged == rebuilt is the model-merge conformance bar)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq
    ts = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["ts"])["ts"]
    ts_i = pc.cast(ts, pa.int64())
    lo, hi = pc.min(ts_i).as_py(), pc.max(ts_i).as_py()
    split = (lo + hi) // 2
    store = tempfile.mkdtemp(prefix="catwalk_store_")
    try:
        model_store_init(sf_dir, store, upto_us=split)
        model_store_merge(sf_dir, store, upto_us=None)
        return model_store_model(store)
    finally:
        shutil.rmtree(store, ignore_errors=True)


_F_SQL = f"""
f AS (
  SELECT DISTINCT user_id,
         event_type || '@' ||
         CAST((epoch_us(ts) // {US_PER_HOUR}) % 24 AS VARCHAR) AS feature
  FROM events WHERE event_type <> 'purchase' AND ts IS NOT NULL),
lab AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = 'purchase' AND value > {LABEL_VALUE_THRESHOLD}),
model AS (
  SELECT feature,
         count(*) FILTER (user_id IN (SELECT user_id FROM lab)) AS numerator,
         count(*) AS denominator
  FROM f GROUP BY feature)
""".strip()

SQL = {
    "catwalk_model": f"""
WITH {_F_SQL}
SELECT feature, numerator::BIGINT AS numerator,
       denominator::BIGINT AS denominator
FROM model ORDER BY feature
""".strip(),
    # incremental store+merge must equal the full rebuild — same oracle
    "catwalk_model_incremental": f"""
WITH {_F_SQL}
SELECT feature, numerator::BIGINT AS numerator,
       denominator::BIGINT AS denominator
FROM model ORDER BY feature
""".strip(),
    "strut_topk_users": f"""
WITH {_F_SQL},
scores AS (
  SELECT f.user_id, max(m.numerator * 1.0 / m.denominator) AS s
  FROM f JOIN model m USING (feature)
  WHERE f.user_id NOT IN (SELECT user_id FROM lab)
  GROUP BY f.user_id)
SELECT user_id, round_even(s, 6) AS score FROM scores
ORDER BY s DESC, user_id ASC LIMIT 10
""".strip(),
}
