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
from ray.data.aggregate import Count, Max, Sum

US_PER_HOUR = 3_600_000_000


def _events(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                 columns=columns)


LABEL_VALUE_THRESHOLD = 150  # splits the user population (~45% labeled)


def _labeled_users(sf_dir: str) -> np.ndarray:
    """Users with a high-value purchase (value > threshold) — the labeled
    set (small; broadcast).  One pruned distributed scan + distinct (the
    oracle engine is NOT a production dependency)."""
    ds = _events(sf_dir, ["user_id", "event_type", "value"])

    def high_value(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["event_type"], "purchase"),
                    pc.greater(t["value"], LABEL_VALUE_THRESHOLD))
        sub = t.filter(m)
        return sub.select(["user_id"]).group_by("user_id").aggregate([])

    users = (ds.map_batches(high_value, batch_format="pyarrow",
                            batch_size=65536)
             .unique("user_id"))
    return np.array(sorted(users), np.int64)


def _feature_batch(t: pa.Table) -> pa.Table:
    """events batch → distinct (user_id, feature) partials."""
    t = t.filter(pc.not_equal(t["event_type"], "purchase"))
    ts = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    hour = (ts // US_PER_HOUR) % 24
    et = np.asarray(t["event_type"].to_pandas(), dtype=object)
    feat = et + "@" + pd.Series(hour).astype(str).to_numpy(dtype=object)
    out = pa.table({"user_id": t["user_id"],
                    "feature": pa.array(feat, pa.string())})
    return out.group_by(["feature", "user_id"]).aggregate([]).rename_columns(
        ["feature", "user_id"])


def _pair_partials(sf_dir: str) -> "ray.data.Dataset":
    """Per-batch-distinct (feature, user_id) partials.  NOT globally
    distinct — a pair can repeat across batches; consumers must be
    duplicate-tolerant (per-feature nunique, per-user MAX)."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])
    return ds.map_batches(_feature_batch, batch_format="pyarrow",
                          batch_size=65536)


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
        labs = ray.get(lab_ref)
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
    """Actor-pool scorer: model dict loaded ONCE per actor from the object
    store (StrutModelCache analogue), applied per batch of (user, feature)
    pairs → per-user max feature score partials."""

    def __init__(self, model_ref, labeled_ref):
        feats, nums, dens = ray.get(model_ref)
        self.score = dict(zip(feats, (nums / dens)))
        self.labeled = set(ray.get(labeled_ref).tolist())

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b[~b["user_id"].isin(self.labeled)].copy()
        if not len(b):
            return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                                 "s": pd.Series(dtype=np.float64)})
        b["s"] = b["feature"].map(self.score).fillna(0.0)
        return b.groupby("user_id", as_index=False)["s"].max()


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
        StrutScorer, batch_format="pandas", batch_size=65536,
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


_F_SQL = """
f AS (
  SELECT DISTINCT user_id,
         event_type || '@' ||
         CAST((epoch_us(ts) // 3600000000) % 24 AS VARCHAR) AS feature
  FROM events WHERE event_type <> 'purchase'),
lab AS (SELECT DISTINCT user_id FROM events
       WHERE event_type = 'purchase' AND value > 150),
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
    "strut_topk_users": f"""
WITH {_F_SQL},
scores AS (
  SELECT f.user_id, max(m.numerator * 1.0 / m.denominator) AS s
  FROM f JOIN model m USING (feature)
  WHERE f.user_id NOT IN (SELECT user_id FROM lab)
  GROUP BY f.user_id)
SELECT user_id, round(s, 6) AS score FROM scores
ORDER BY s DESC, user_id ASC LIMIT 10
""".strip(),
}
