"""Mergeable sketches: HyperLogLog approximate distinct counting.

SURVEY.md §2.6 flags the approximate-uniques variant as an explicit design
(the reference's Uniques is exact bitmap cardinality).  Pattern: each batch
emits ONE serialized sketch row (registers array); sketches are merged with
an elementwise max — the canonical "emit one mergeable sketch per batch,
merge in a tiny second stage" shape for 100 TB aggregation (HLL per
Flajolet et al., AMC 2007; public algorithm).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..util import md5_64_bulk

P = 12                     # 2^12 = 4096 registers, ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_add(registers: np.ndarray, values) -> np.ndarray:
    # shared md5_64 hashing, each DISTINCT value hashed once — user ids
    # repeat heavily per batch, and HLL only needs per-distinct ranks
    h = md5_64_bulk(np.asarray(pd.Series(values).astype(str), dtype=object))
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64(1 << (P - 1))  # sentinel bit
    # rank = leading zeros of remaining bits + 1, vectorized via log2
    lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    rank = (lz + 1).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    est = _ALPHA * M * M / np.sum(2.0 ** -registers.astype(np.float64))
    zeros = int((registers == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # small-range correction
    return float(est)


def approx_unique(sf_dir: str, table: str = "events",
                  column: str = "user_id") -> pa.Table:
    """Approximate distinct count of a column: one HLL sketch per batch,
    elementwise-max merge on the driver (shuffle-free)."""
    ds = ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[column])

    def sketch(b: pa.Table) -> pa.Table:
        regs = hll_add(np.zeros(M, np.uint8),
                       b[column].to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    merged = np.zeros(M, np.uint8)
    for blob in parts["regs"]:
        np.maximum(merged, np.frombuffer(blob, np.uint8), out=merged)
    return pa.table({"approx_unique": pa.array([int(round(hll_estimate(merged)))],
                                               pa.int64())})
