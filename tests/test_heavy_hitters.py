"""Misra–Gries heavy hitters: exact hot terms without a term shuffle.

The two-pass engine (candidate summary → exact verify) must equal the
plain GROUP BY oracle for every capacity that satisfies the Δ bound,
including capacities small enough to force pruning on every batch.
"""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from miru_ray.ops.sketches import (_mg_fold, heavy_hitters,
                                   heavy_hitters_sql)

SF = "/root/testdata/sf0.001"


def oracle(denom: int):
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')")
        return con.execute(heavy_hitters_sql(denom)).fetch_arrow_table()
    finally:
        con.close()


def test_heavy_hitters_matches_oracle(ray_session):
    got = heavy_hitters(SF)
    want = oracle(2000)
    assert got.num_rows == want.num_rows > 0
    assert got.column_names == ["term", "cnt"]
    assert got["term"].to_pylist() == want["term"].to_pylist()
    assert got["cnt"].to_pylist() == want["cnt"].to_pylist()


def test_heavy_hitters_prune_forced_still_exact(ray_session):
    """A capacity far below the vocabulary forces the prune path in both
    the per-batch partial and the driver fold; the Δ bound keeps every
    true heavy hitter a candidate, so the exact verify still matches.
    denom=50 keeps threshold ≥ N/50 ≫ Δ ≤ N/(k+1) = N/257."""
    got = heavy_hitters(SF, denom=50, k=256)
    want = oracle(50)
    assert got["term"].to_pylist() == want["term"].to_pylist()
    assert got["cnt"].to_pylist() == want["cnt"].to_pylist()


def test_heavy_hitters_capacity_guard(ray_session):
    """k below denom cannot guarantee completeness — must refuse loudly,
    never silently drop heavy hitters (same contract as the exists-query
    expansion cap)."""
    with pytest.raises(ValueError, match="too small"):
        heavy_hitters(SF, denom=2000, k=64)


def test_mg_fold_bound_holds():
    """Σδ over all prunes ≤ N/(k+1), and every estimate undercounts its
    true count by at most Σδ — on an adversarial skewed stream."""
    rng = np.random.default_rng(7)
    terms = [f"t{int(i)}" for i in
             rng.zipf(1.3, size=20_000) % 5_000]
    true: dict[str, int] = {}
    for t in terms:
        true[t] = true.get(t, 0) + 1
    k = 64
    summary: dict[str, int] = {}
    delta = 0
    for lo in range(0, len(terms), 1000):
        chunk = terms[lo:lo + 1000]
        cc: dict[str, int] = {}
        for t in chunk:
            cc[t] = cc.get(t, 0) + 1
        delta += _mg_fold(summary, list(cc), list(cc.values()), k)
    assert delta <= len(terms) // (k + 1)
    assert len(summary) <= 2 * k
    for t, est in summary.items():
        assert est <= true[t] <= est + delta
    # completeness: every term with true count > delta must be present
    for t, c in true.items():
        if c > delta:
            assert t in summary, (t, c, delta)
