"""Bit-sliced metric index — the metric-sampler → anomaly-tenant path.

The reference ships a client-side sampler that periodically snapshots app
metrics and indexes each sample's long value AS ITS SET BITS: the sampler
emits one term per set bit of the value ("bits" field,
``miru-metric-sampler/.../AnomalyMetric.java``; sampler loop
``MiruMetricSampler.java``), and the anomaly tenant's answerer
reconstructs ``SUM(value)`` over any time/filter slice from inverted
COUNTS alone — ``sum = Σ_k count(bit_k set) << k`` — without ever reading
a stored value (``miru-anomaly-plugins/.../Anomaly.java:22-131`` counts
one bitmap per bit plane).  ``analytics.metrics`` deliberately skipped the
bit planes as a bitmap-engine artifact; this module implements them
faithfully, because at 100 TB the trick is exactly what makes metric sums
index-served: the aggregation layer touches a ``≤ n_buckets × BITS``
count matrix, never the sample stream.

Ray-native shape:

- stage 1 (the "sampler" encode): ``map_batches`` filters the watched
  event type, scales values to exact integers (×1e6, round-even — the
  corpus-wide money-math convention), and emits per-``(bucket, bit)``
  count partials — the batch analogue of indexing term ``bit:k`` for
  every sample whose value has bit *k* set.  One extra ``bit = -1`` row
  per bucket carries the sample count (the "presence" term every
  activity gets).
- stage 2: ``groupby(bucket, bit).sum`` — the shuffle moves at most
  ``(BITS+1) × n_buckets`` rows per input batch, i.e. the size of the
  term dictionary, not the event stream.
- stage 3 (driver, bounded): fold the count matrix back into exact
  integer sums.  Pure integer arithmetic until one final ×1e-6.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Sum

from ..util import read_parquet_clean
from .analytics import T0_US, US_PER_HOUR, _bucket_batch, _pdf_cols

#: bit planes indexed per sample.  value×1e6 < 2³⁰ at this corpus
#: (max 490.02); 34 planes leave headroom without bloating the term
#: dictionary — the reference indexes all 64 for a Java long, but a
#: plane with no set bits produces zero postings either way.
BITS = 34

#: the metric stream under watch (same filtered tenant as the anomaly op)
METRIC_EVENT_TYPE = "error"


def _bit_count_partial(t: pa.Table, dt_us: int) -> pa.Table:
    """Per-batch (bucket, bit) → count partial: the sampler's encode.

    Two meta rows per bucket ride along with the bit planes: ``bit = -1``
    carries the sample count (every watched row, NULL value included —
    the oracle's ``count(*)``), and ``bit = -2`` the NON-NULL sample
    count, so the fold can distinguish an all-NULL bucket (SQL
    ``sum = NULL``) from an all-zero one (``sum = 0``)."""
    t = t.filter(pc.equal(t["event_type"], METRIC_EVENT_TYPE))
    # a sample without a capture timestamp is malformed (the reference's
    # sampler stamps every sample) — the oracle drops it with the same
    # `ts IS NOT NULL` predicate, keeping both engines aligned
    t = t.filter(pc.is_valid(t["ts"]))
    if t.num_rows == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "bit": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    t = _bucket_batch(t, dt_us)
    buckets = t["bucket"].to_numpy(zero_copy_only=False)
    uniq, codes = np.unique(buckets, return_inverse=True)
    n_all = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    valid = pc.is_valid(t["value"]).to_numpy(zero_copy_only=False) \
        .astype(bool)
    v6 = pc.cast(pc.round(pc.multiply(t["value"], 1e6)), pa.int64()) \
        .to_numpy(zero_copy_only=False)[valid].astype(np.int64)
    vcodes = codes[valid]
    if (v6 < 0).any():
        # two's-complement bits would break the Σ count<<k identity; the
        # reference samples counters (non-negative longs) — enforce that
        raise ValueError("bit-sliced metrics require non-negative values")
    if len(v6) and (v6 >> BITS).any():
        # a value above the indexed planes would silently truncate —
        # fail loudly instead of reconstructing a short sum
        raise ValueError(f"metric value exceeds {BITS} bit planes; "
                         "raise BITS")
    n_valid = np.bincount(vcodes, minlength=len(uniq)).astype(np.int64)
    # N×BITS plane membership, accumulated per bucket in one scatter-add
    planes = (v6[:, None] >> np.arange(BITS, dtype=np.int64)[None, :]) & 1
    counts = np.zeros((len(uniq), BITS), dtype=np.int64)
    np.add.at(counts, vcodes, planes)
    bk, bit = np.nonzero(counts)
    meta_bits = np.concatenate([np.full(len(uniq), -1, dtype=np.int64),
                                np.full(len(uniq), -2, dtype=np.int64)])
    return pa.table({
        "bucket": pa.array(np.concatenate([uniq, uniq, uniq[bk]]),
                           pa.int64()),
        "bit": pa.array(np.concatenate([meta_bits, bit]), pa.int64()),
        "cnt": pa.array(np.concatenate([n_all, n_valid, counts[bk, bit]]),
                        pa.int64())})


def metrics_bitslice_sum(sf_dir: str, dt_us: int = US_PER_HOUR) -> pa.Table:
    """Per-bucket sample count + SUM(value) reconstructed purely from the
    bit-plane counts (the anomaly answerer's aggregation — values never
    reach the reduce side)."""
    ds = read_parquet_clean(os.path.join(sf_dir, "events.parquet"),
                            columns=["event_type", "ts", "value"])
    term_counts = (ds.map_batches(lambda t: _bit_count_partial(t, dt_us),
                                  batch_format="pyarrow", batch_size=65536)
                   .groupby(["bucket", "bit"])
                   .aggregate(Sum("cnt", alias_name="cnt"))
                   .to_pandas())  # bounded: ≤ n_buckets × (BITS+1) rows
    term_counts = _pdf_cols(term_counts, ["bucket", "bit", "cnt"])
    planes = term_counts[term_counts["bit"] >= 0]
    # Σ_k count_k << k, exact integers end to end
    sv6 = (planes["cnt"].astype(np.int64)
           * (np.int64(1) << planes["bit"].to_numpy(np.int64)))
    per_bucket = pd.DataFrame({"bucket": planes["bucket"], "sv6": sv6}) \
        .groupby("bucket", as_index=False)["sv6"].sum()
    n = term_counts[term_counts["bit"] == -1][["bucket", "cnt"]] \
        .rename(columns={"cnt": "n_events"})
    nv = term_counts[term_counts["bit"] == -2][["bucket", "cnt"]] \
        .rename(columns={"cnt": "n_valued"})
    out = n.merge(nv, on="bucket", how="left").merge(per_bucket, on="bucket",
                                                    how="left")
    # no plane rows + some non-null samples = all-zero values → sum 0;
    # no non-null samples at all → SQL sum() is NULL
    out["sv6"] = out["sv6"].fillna(0).astype(np.int64)
    out = out.sort_values("bucket").reset_index(drop=True)
    sum_value = np.round(out["sv6"].to_numpy(np.int64) / 1e6, 6)
    all_null = out["n_valued"].fillna(0).to_numpy(np.int64) == 0
    return pa.table({
        "bucket": pa.array(out["bucket"].to_numpy(np.int64)),
        "n_events": pa.array(out["n_events"].to_numpy(np.int64)),
        "sum_value": pa.array(sum_value, pa.float64(),
                              mask=all_null if all_null.any() else None)})


SQL = {
    "metrics_bitslice_sum": f"""
SELECT (epoch_us(ts) - {T0_US}) // {US_PER_HOUR} AS bucket,
       count(*)::BIGINT AS n_events,
       round_even(sum(CAST(round_even(value * 1e6, 0) AS BIGINT)) / 1e6, 6)
           AS sum_value
FROM events WHERE event_type = '{METRIC_EVENT_TYPE}' AND ts IS NOT NULL
GROUP BY 1 ORDER BY 1
""".strip(),
}
