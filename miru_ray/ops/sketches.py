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
import pyarrow.compute as pc

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


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters: exact hot terms without the full-term shuffle
# ---------------------------------------------------------------------------

MG_K = 8192          # summary capacity → undercount bound Δ ≤ N/(K+1)
HH_DENOM = 2000      # heavy = terms with count·DENOM ≥ total tokens N

# stage-1 metadata rows ride inside the (term, cnt) stream under reserved
# keys that can never collide with a real token ([a-z0-9]+ only)
_META_DELTA = "\x00delta"
_META_NTOK = "\x00ntok"


def _mg_fold(counts: dict[str, int], terms, cnts, k: int) -> int:
    """Fold one (term, weight) batch into a running Misra–Gries summary,
    pruning to ``k`` entries when it overflows ``2k`` (amortized).
    Returns the total decrement Δ added by prunes in this fold.

    Mergeable-summaries guarantee (Agarwal et al., PODS 2012 — public
    algorithm): every prune that subtracts δ from all counters removes
    ≥ (k+1)·δ total mass, so Σδ over ALL prunes anywhere ≤ N/(k+1), and
    every term's estimate undercounts its true count by at most Σδ."""
    delta = 0
    for t, c in zip(terms, cnts):
        counts[t] = counts.get(t, 0) + int(c)
        if len(counts) > 2 * k:
            vals = np.fromiter(counts.values(), np.int64)
            d = int(np.partition(vals, len(vals) - k - 1)[len(vals) - k - 1])
            counts_new = {t2: c2 - d for t2, c2 in counts.items() if c2 > d}
            counts.clear()
            counts.update(counts_new)
            delta += d
    return delta


def heavy_hitters(sf_dir: str, *, denom: int = HH_DENOM,
                  k: int = MG_K) -> pa.Table:
    """EXACT heavy hitters — every term whose total occurrence count c
    satisfies ``c·denom ≥ N`` (N = total tokens in ``documents.text``) —
    WITHOUT a full-term ``groupby`` shuffle.

    Two streaming passes (the reference's global-cardinality scans are
    per-term lookups, ``LabFieldIndex.java:474-476``; this is the
    corpus-wide hot-term analogue sized for 10^12 turns):

    [1] candidates — ``map_batches`` folds each batch's exact term counts
        into a capacity-``k`` Misra–Gries summary (vectorized
        ``value_counts``; per-batch prune bound rides along as a reserved
        metadata row), the driver folds the ≤ k+2-row partials into one
        summary with running undercount bound Δ ≤ N/(k+1).  A term is a
        candidate iff est ≥ threshold − Δ — guaranteed to include every
        true heavy hitter.  Driver state is O(k), like the HLL merge; at
        extreme block counts the same fold runs as a tree of
        ``map_batches`` stages over the summary dataset.
    [2] verify — the candidate list (≤ 2k terms) is broadcast once via
        ``ray.put``; a second streaming pass counts ONLY candidate terms
        per batch (``pc.is_in`` + ``value_counts``) and the driver sums
        the ≤ |candidates|-row partials, then applies the EXACT integer
        threshold ``c·denom ≥ N``.

    The result is deterministic (exact counts, exact threshold) even
    though the intermediate candidate set depends on block arrival order.
    """
    from ..tokenize import explode_tokens
    from ..util import broadcast_get
    # ^ imported at DRIVER time so the stage-2 closure captures the
    # function object (shipped by value thanks to the package-level
    # register_pickle_by_value in miru_ray/__init__.py); a relative
    # import executed inside the worker-side body would instead need
    # miru_ray importable on the worker, breaking the arbitrary-cwd
    # driver contract (verified: it fails from a /tmp driver)
    if k + 1 < denom:
        # the completeness guarantee needs Δ ≤ N/(k+1) < ceil(N/denom);
        # a smaller k MIGHT still find everything, but "might" is not a
        # contract (same refusal as the exists-query expansion cap)
        raise ValueError(
            f"Misra–Gries capacity k={k} is too small for denom={denom}: "
            f"the undercount bound Δ ≤ N/(k+1) must stay below the "
            f"threshold N/denom — need k + 1 ≥ denom")
    path = os.path.join(sf_dir, "documents.parquet")

    def mg_partial(b: pa.Table) -> pa.Table:
        terms, _rows, _dl = explode_tokens(b["text"])
        n_tok = len(terms)
        if n_tok == 0:
            return pa.table({"term": pa.array([_META_NTOK]),
                             "cnt": pa.array([0], pa.int64())})
        vc = pc.value_counts(terms)
        t = vc.field("values")
        c = vc.field("counts").to_numpy().astype(np.int64)
        delta = 0
        if len(c) > k:
            delta = int(np.partition(c, len(c) - k - 1)[len(c) - k - 1])
            keep = c > delta
            t, c = t.filter(pa.array(keep)), c[keep] - delta
        return pa.table({
            "term": pa.concat_arrays(
                [t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t,
                 pa.array([_META_DELTA, _META_NTOK])]),
            "cnt": pa.array(np.concatenate([c, [delta, n_tok]]), pa.int64()),
        })

    def mg_combine(part: pa.Table) -> pa.Table:
        """Intermediate tree level: fold a block of summary rows (many
        per-batch partials bundled by Ray) into ONE summary + aggregated
        metadata rows — same schema in and out, so the driver fold after
        it is unchanged.  This bounds the driver's work by the number of
        COMBINED blocks, not the number of input batches (the shape that
        matters at 10^12 turns)."""
        terms = np.asarray(part["term"].to_pandas(), dtype=object)
        cnts = part["cnt"].to_numpy().astype(np.int64)
        meta = np.isin(terms, (_META_DELTA, _META_NTOK))
        d = int(cnts[meta][terms[meta] == _META_DELTA].sum())
        n = int(cnts[meta][terms[meta] == _META_NTOK].sum())
        folded: dict[str, int] = {}
        d += _mg_fold(folded, terms[~meta], cnts[~meta], k)
        items = sorted(folded.items())
        return pa.table({
            "term": pa.array([t for t, _ in items]
                             + [_META_DELTA, _META_NTOK]),
            "cnt": pa.array([c for _, c in items] + [d, n], pa.int64()),
        })

    ds = read_parquet_clean(path, columns=["text"])
    summary: dict[str, int] = {}
    n_total = 0
    big_delta = 0
    for part in (ds.map_batches(mg_partial, batch_format="pyarrow",
                                batch_size=8192)
                 .map_batches(mg_combine, batch_format="pyarrow",
                              batch_size=16 * (k + 2))
                 .iter_batches(batch_format="pyarrow")):
        terms = np.asarray(part["term"].to_pandas(), dtype=object)
        cnts = part["cnt"].to_numpy().astype(np.int64)
        meta = np.isin(terms, (_META_DELTA, _META_NTOK))
        for t, c in zip(terms[meta], cnts[meta]):
            if t == _META_DELTA:
                big_delta += int(c)
            else:
                n_total += int(c)
        big_delta += _mg_fold(summary, terms[~meta], cnts[~meta], k)

    if n_total == 0:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    threshold = -(-n_total // denom)  # smallest c with c·denom ≥ N
    if big_delta >= threshold:
        raise ValueError(
            f"Misra–Gries undercount bound Δ={big_delta} reaches the "
            f"threshold {threshold}: capacity k={k} is too small for "
            f"denom={denom} (need k + 1 ≥ denom); raise k")
    cand = sorted(t for t, c in summary.items()
                  if c >= threshold - big_delta)
    if not cand:
        return pa.table({"term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    cand_ref = ray.put(pa.array(cand, pa.string()))

    def count_candidates(b: pa.Table) -> pa.Table:
        cand_arr = broadcast_get(cand_ref)
        terms, _rows, _dl = explode_tokens(b["text"])
        hit = terms.filter(pc.is_in(terms, value_set=cand_arr))
        if len(hit) == 0:
            return pa.table({"term": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(hit)
        return pa.table({"term": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    exact: dict[str, int] = {}
    for part in read_parquet_clean(path, columns=["text"]).map_batches(
            count_candidates, batch_format="pyarrow",
            batch_size=8192).iter_batches(batch_format="pyarrow"):
        for t, c in zip(part["term"].to_pylist(),
                        part["cnt"].to_numpy().astype(np.int64)):
            exact[t] = exact.get(t, 0) + int(c)

    rows = sorted(((t, c) for t, c in exact.items()
                   if c * denom >= n_total), key=lambda r: (-r[1], r[0]))
    return pa.table({"term": pa.array([t for t, _ in rows], pa.string()),
                     "cnt": pa.array([c for _, c in rows], pa.int64())})


def heavy_hitters_sql(denom: int = HH_DENOM) -> str:
    """Exact SQL mirror: the two-pass engine result equals the plain
    GROUP BY with the same integer threshold."""
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents),
tot AS (SELECT count(*) AS n FROM toks),
hh AS (SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM toks
       GROUP BY term HAVING count(*) * {denom} >= (SELECT n FROM tot))
SELECT term, cnt FROM hh ORDER BY cnt DESC, term ASC
""".strip()


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
