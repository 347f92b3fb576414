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

from ..util import md5_64_bulk, read_parquet_clean

P = 12                     # 2^12 = 4096 registers, ~1.6% standard error
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_add(registers: np.ndarray, values) -> np.ndarray:
    # shared md5_64 hashing, each DISTINCT value hashed once — user ids
    # repeat heavily per batch, and HLL only needs per-distinct ranks.
    # ``values`` must be null-free: callers drop nulls at the Arrow level
    # (count-DISTINCT semantics; a pandas null-cast would also turn int
    # columns float and hash '123.0' where SQL CAST yields '123')
    sv = pd.unique(pd.Series(values).astype(str))  # per-batch distinct
    h = md5_64_bulk(np.asarray(sv, dtype=object))
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    rest = (h << np.uint64(P)) | np.uint64(1 << (P - 1))  # sentinel bit
    # rank = leading zeros of rest + 1, INTEGER-exact (a float64 cast of
    # the raw 64-bit value can round across a power-of-2 boundary):
    # propagate the leading 1 right so x = 2^(64-clz) - 1, then
    # (x >> 1) + 1 = 2^(63-clz) is an exact power of two whose log2 is
    # exact in float — the same x | x>>k ladder the SQL oracle replays
    x = rest
    for s in (1, 2, 4, 8, 16, 32):
        x = x | (x >> np.uint64(s))
    rank = (64 - np.log2(((x >> np.uint64(1)) + np.uint64(1))
                         .astype(np.float64))).astype(np.uint8)
    np.maximum.at(registers, idx, rank)
    return registers


def hll_estimate(registers: np.ndarray) -> float:
    # exact integer register sum: sum(2^-reg) scaled by 2^53 (ranks are
    # capped at 64-P+1 = 53 by the sentinel bit), rounded to float64
    # ONCE — bit-for-bit reproducible by the SQL oracle, which sums the
    # same integers as HUGEINT (numpy's pairwise float sum is not)
    counts = np.bincount(registers, minlength=54)
    s_int = sum(int(c) << (53 - r) for r, c in enumerate(counts[:54]))
    est = _ALPHA * M * M / (float(s_int) / 9007199254740992.0)
    zeros = int(counts[0])
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)  # small-range correction
    return float(est)


def approx_unique(sf_dir: str, table: str = "events",
                  column: str = "user_id") -> pa.Table:
    """Approximate distinct count of a column: one HLL sketch per batch,
    elementwise-max merge on the driver (shuffle-free)."""
    ds = read_parquet_clean(os.path.join(sf_dir, f"{table}.parquet"),
                               columns=[column])

    def sketch(b: pa.Table) -> pa.Table:
        # NULLs are excluded (count-DISTINCT semantics, matching the
        # oracle's IS NOT NULL) — and dropping them at the Arrow level
        # keeps int columns int (a pandas null-cast to float would hash
        # '123.0' where SQL CAST yields '123')
        col = b[column].combine_chunks().drop_null()
        regs = hll_add(np.zeros(M, np.uint8),
                       col.to_numpy(zero_copy_only=False))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(sketch, batch_format="pyarrow",
                           batch_size=65536).to_pandas()
    merged = np.zeros(M, np.uint8)
    # the all-empty-block stream loses column names ("regs" absent on an
    # empty table) — zero registers estimate 0, matching the SQL oracle
    for blob in (parts["regs"] if "regs" in parts.columns else ()):
        np.maximum(merged, np.frombuffer(blob, np.uint8), out=merged)
    return pa.table({"approx_unique": pa.array([int(round(hll_estimate(merged)))],
                                               pa.int64())})


def hll_oracle_sql(table: str, column: str) -> str:
    """Exact SQL mirror of the HLL pipeline: the sketch is DETERMINISTIC
    given its hash (md5_number_lower == :func:`miru_ray.util.md5_64`), so
    the "approximate" distinct count is still bit-for-bit oracled.
    rank = 53 - bit_count(propagated low-52-bits) is the integer-exact
    leading-zero count :func:`hll_add` computes; the register sum is an
    exact HUGEINT scaled by 2^53 and rounded to double ONCE, exactly as
    :func:`hll_estimate` does."""
    return f"""
WITH h AS (SELECT DISTINCT md5_number_lower(CAST({column} AS VARCHAR)) AS hv
           FROM {table} WHERE {column} IS NOT NULL),
b AS (SELECT hv >> {64 - P} AS idx, hv & {(1 << (64 - P)) - 1} AS x FROM h),
p1 AS (SELECT idx, x | (x >> 1) AS x FROM b),
p2 AS (SELECT idx, x | (x >> 2) AS x FROM p1),
p3 AS (SELECT idx, x | (x >> 4) AS x FROM p2),
p4 AS (SELECT idx, x | (x >> 8) AS x FROM p3),
p5 AS (SELECT idx, x | (x >> 16) AS x FROM p4),
p6 AS (SELECT idx, x | (x >> 32) AS x FROM p5),
regs AS (SELECT idx, max({64 - P + 1} - bit_count(x)) AS reg FROM p6
         GROUP BY idx),
agg AS (SELECT coalesce(sum(1::BIGINT << ({64 - P + 1} - reg)), 0) AS s_hit,
               count(*) AS n_hit FROM regs),
est AS (SELECT (0.7213 / (1 + 1.079 / {M})) * {M} * {M} /
               (CAST(s_hit + ({M} - n_hit)::HUGEINT *
                     (1::BIGINT << {64 - P + 1}) AS DOUBLE) /
                {float(2 ** (64 - P + 1))!r}) AS raw,
               {M} - n_hit AS zeros FROM agg)
SELECT CAST(round_even(CASE WHEN raw <= 2.5 * {M} AND zeros > 0
                            THEN {M} * ln({M}.0 / zeros)
                            ELSE raw END, 0) AS BIGINT) AS approx_unique
FROM est
""".strip()
