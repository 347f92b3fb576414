"""Replica racing: hedged query fan-out across reader replica pools.

Reference semantics: ``MiruSolver`` / ``MiruLowestLatencySolver`` start one
solver per partition, add another after ~100 ms (``MiruServiceConfig.java:
41-51`` — initial 1, +1 per 100 ms, ≤10, abandon at 30 s) and take the
first answer.  Here: ``Searcher(replicas=N, hedge_delay_s=...)`` hosts
every partition in N actor pools; a fan-out call unanswered after the
hedge delay is also issued to the next pool, first completion wins.

Invariants:
  1. replicas=2 answers are identical to replicas=1 (racing never changes
     results), and a healthy pool fires no hedges under a generous delay.
  2. a SLOW primary pool (fault-injected delay ≫ hedge delay) still
     answers fast — from the replica — and the hedge counter records it.
  3. a DEAD primary actor fails over to the replica.
  4. state mutations (tombstones) reach EVERY replica pool, so an answer
     served by any replica reflects the removal.
"""

import time

import pytest

import ray

from miru_ray.query.engine import Searcher
from miru_ray.query.parser import parse_query

QUERY = "alpha beta"


@pytest.fixture()
def racing_searcher(xs_index):
    s = Searcher(xs_index, num_readers=2, replicas=2, hedge_delay_s=0.2)
    yield s
    s.close()


def _slow_pool(s: Searcher, pool: int, seconds: float) -> None:
    ray.get([a.set_debug_delay.remote(seconds) for a in s._pools[pool]])


def test_replicas_answer_identically(xs_index, xs_searcher,
                                     racing_searcher):
    ast = parse_query(QUERY)
    assert racing_searcher.topk(ast, k=10).to_pydict() == \
        xs_searcher.topk(ast, k=10).to_pydict()
    assert racing_searcher.count(ast) == xs_searcher.count(ast)


def test_healthy_pool_fires_no_hedges(xs_index):
    s = Searcher(xs_index, num_readers=2, replicas=2, hedge_delay_s=30.0)
    try:
        s.topk(parse_query(QUERY), k=10)
        assert s.hedges_fired == 0
    finally:
        s.close()


def test_slow_primary_is_raced_past(xs_index, xs_searcher, racing_searcher):
    expected = xs_searcher.topk(parse_query(QUERY), k=10).to_pydict()
    _slow_pool(racing_searcher, 0, 5.0)
    t0 = time.monotonic()
    got = racing_searcher.topk(parse_query(QUERY), k=10).to_pydict()
    dt = time.monotonic() - t0
    assert got == expected
    assert racing_searcher.hedges_fired > 0
    # must beat the 5 s injected stall by a wide margin (two fan-out
    # rounds × 0.2 s hedge delay + real work)
    assert dt < 4.0, dt


def test_dead_primary_fails_over(xs_index, xs_searcher, racing_searcher):
    expected = xs_searcher.count(parse_query(QUERY))
    for a in racing_searcher._pools[0]:
        ray.kill(a)
    assert racing_searcher.count(parse_query(QUERY)) == expected
    assert racing_searcher.hedges_fired > 0


def test_tombstones_reach_every_replica(xs_index, tmp_path, xs_path):
    # private index copy: tombstones.json must not leak into the shared
    # session fixture
    import shutil
    work = str(tmp_path / "idx")
    shutil.copytree(xs_index, work)
    s = Searcher(work, num_readers=2, replicas=2, hedge_delay_s=0.2)
    try:
        ast = parse_query(QUERY)
        docs = s.match_docs(ast)
        assert len(docs) >= 2
        before = s.count(ast)
        s.remove_docs([int(docs[0]), int(docs[1])])
        # force answers to come from the REPLICA pool: if the tombstone
        # load had raced instead of broadcasting, this count would be
        # stale
        _slow_pool(s, 0, 5.0)
        assert s.count(ast) == before - 2
    finally:
        s.close()
