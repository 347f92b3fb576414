"""Deterministic mixture sampling over the ``documents`` table.

A training-data mixture assigns every source a sampling rate and must pick
the SAME documents on every run, on every machine, and in every engine —
so the keep decision is a pure content hash, never an RNG:

    keep(doc)  ⇔  md5_64(str(doc_id)) % 1_000_000  <  threshold(source)

``md5_64`` is DuckDB's ``md5_number_lower``, so the SQL oracle reproduces
the exact sample bit-for-bit.  The per-source rate bucket is itself a
stable hash of the source name (``md5_64(source) % len(RATE_MILLIONTHS)``)
— no config table to ship, any source universe works.

Scale shape: keep decisions are row-local (one shuffle-free
``map_batches``); the per-source accounting is exact per-batch partials →
one tiny groupby.  ``out_path`` streams the kept rows straight to
partitioned Parquet — nothing O(corpus) ever reaches the driver.

Public precedent: hash-based document sampling / source weighting as in
the C4 and Pile mixture constructions (deterministic splits via content
hashes rather than seeded RNGs).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Sum

from ..util import md5_64

#: rate buckets in millionths (1e6 = keep all): source → bucket by
#: md5_64(source) % 4 — stable, engine/SQL identical
RATE_MILLIONTHS = (1_000_000, 500_000, 250_000, 100_000)
_M = 1_000_000


def _documents(sf_dir: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                                 columns=columns)


def _keep_mask(doc_id: np.ndarray, source) -> tuple[np.ndarray, np.ndarray]:
    """(keep mask, per-row threshold in millionths) — the one shared
    definition of the sample, used by both the counting and the export
    pass so they can never disagree."""
    src = np.asarray(source, dtype=object)
    codes, uniq = pd.factorize(src, sort=False)
    thr_u = np.array(RATE_MILLIONTHS, np.int64)[
        (md5_64(uniq.astype(object)) % np.uint64(len(RATE_MILLIONTHS)))
        .astype(np.int64)]
    thr = thr_u[codes]
    h = (md5_64(np.array([str(int(d)) for d in doc_id], dtype=object))
         % np.uint64(_M)).astype(np.int64)
    return h < thr, thr


def mixture_sample(sf_dir: str, out_path: str | None = None) -> pa.Table:
    """Per-source mixture accounting: (source, rate_millionths, n_total,
    n_kept), sorted by source.  With ``out_path``, additionally stream the
    kept (doc_id, source) rows to partitioned Parquet (the 100-TB sink)."""
    ds = _documents(sf_dir, ["doc_id", "source"])

    def partial(b: pa.Table) -> pa.Table:
        keep, thr = _keep_mask(b["doc_id"].to_numpy(), b["source"].to_pandas())
        t = pa.table({"source": b["source"],
                      "rate_millionths": pa.array(thr),
                      "k": pa.array(keep.astype(np.int64))})
        g = t.group_by(["source", "rate_millionths"]).aggregate(
            [("k", "sum"), ("k", "count")])
        # name-based selection: pyarrow's key-vs-aggregate column ORDER has
        # changed across versions, so positional renames are a trap
        return pa.table({"source": g["source"],
                         "rate_millionths": g["rate_millionths"],
                         "kept": g["k_sum"], "tot": g["k_count"]})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=8192)
    out = partials.groupby(["source", "rate_millionths"]).aggregate(
        Sum("tot", alias_name="n_total"),
        Sum("kept", alias_name="n_kept")).to_pandas()
    out = out.sort_values("source").reset_index(drop=True)
    out = out[["source", "rate_millionths", "n_total", "n_kept"]]

    if out_path is not None:
        def keep_rows(b: pa.Table) -> pa.Table:
            keep, _ = _keep_mask(b["doc_id"].to_numpy(),
                                 b["source"].to_pandas())
            return b.filter(pa.array(keep))

        (ds.map_batches(keep_rows, batch_format="pyarrow", batch_size=8192)
           .write_parquet(out_path, partition_cols=["source"]))
    return pa.Table.from_pandas(out, preserve_index=False)


SQL = {
    "mix_sample_counts": f"""
WITH d AS (
  SELECT source, doc_id,
         (CASE md5_number_lower(source) % 4
               WHEN 0 THEN {RATE_MILLIONTHS[0]}
               WHEN 1 THEN {RATE_MILLIONTHS[1]}
               WHEN 2 THEN {RATE_MILLIONTHS[2]}
               ELSE {RATE_MILLIONTHS[3]}
          END)::BIGINT AS rate_millionths
  FROM documents
)
SELECT source, rate_millionths, count(*)::BIGINT AS n_total,
       sum(CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % {_M}
                     < rate_millionths THEN 1 ELSE 0 END)::BIGINT AS n_kept
FROM d
GROUP BY source, rate_millionths
ORDER BY source
""".strip(),
}
