"""Regression tests for the round-4 self-review findings (second batch):

  1. upgrade_index must REJECT a positional_fields change — an
     exec-knob-style flip would leave phrase queries reading positions
     that were never stored (reproduced: count 1 → 0 silently).
  2. an additive upgrade of a POSITIONAL index must write new cells WITH
     a pos_bytes column, and compaction after such an upgrade must keep
     phrase answers (reproduced: mixed segment schemas made the
     compaction read silently strip every position).
  3. the tombstone broadcast must survive a dead replica actor (respawn
     + retry), not fail forever while reads keep succeeding.
  4. Searcher.gather must tolerate a dead pool-0 actor exactly like the
     hedged read path does.
  5. an application-level error from a reader propagates immediately
     under replicas>1 — it must not be re-executed on every replica or
     kill a healthy actor.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray

from miru_ray.config import IndexConfig
from miru_ray.index.build import build_index
from miru_ray.index.compact import compact_index
from miru_ray.index.upgrade import upgrade_index
from miru_ray.query.engine import Searcher
from miru_ray.query.parser import parse_query


def _tiny_input(path: str) -> None:
    t = pa.table({
        "conv_id": pa.array(["c0", "c0", "c1"]),
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": pa.array(["user", "agent", "user"]),
        "text": pa.array(["aa ab ac", "ab aa", "aa ab"]),
        "tool": pa.array(["t1", "", "t2"]),
        "ts": pa.array([0, 1, 2], pa.timestamp("us")),
    })
    pq.write_table(t, path)


def test_upgrade_rejects_positional_flip(tmp_path, ray_session):
    src = str(tmp_path / "in.parquet")
    _tiny_input(src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=())
    build_index(src, idx, cfg)
    with pytest.raises(ValueError, match="positional_fields"):
        upgrade_index(idx, IndexConfig(
            docs_per_partition=10, num_shards=1, keyword_fields=(),
            positional_fields=("text",)))


def test_upgrade_then_compact_keeps_positions(tmp_path, ray_session):
    src = str(tmp_path / "in.parquet")
    _tiny_input(src)
    idx = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_partition=10, num_shards=1,
                      keyword_fields=(), positional_fields=("text",))
    build_index(src, idx, cfg)
    ast = parse_query('"aa ab"')
    before = Searcher(idx, num_readers=1).count(ast)
    assert before == 2
    # additive upgrade: a new keyword field creates delta-only rows
    upgrade_index(idx, IndexConfig(
        docs_per_partition=10, num_shards=1, keyword_fields=("tool",),
        positional_fields=("text",)))
    import os
    for f in sorted(os.listdir(os.path.join(idx, "segments"))):
        if f.endswith(".parquet"):
            names = pq.read_schema(
                os.path.join(idx, "segments", f)).names
            assert "pos_bytes" in names, f  # no mixed-schema cells
    assert Searcher(idx, num_readers=1).count(ast) == before
    dst = str(tmp_path / "compacted")
    compact_index(idx, dst)
    assert Searcher(dst, num_readers=1).count(ast) == before


def test_mutation_broadcast_survives_dead_replica(xs_index, tmp_path):
    import shutil
    work = str(tmp_path / "idx")
    shutil.copytree(xs_index, work)
    s = Searcher(work, num_readers=2, replicas=2, hedge_delay_s=0.2)
    try:
        ast = parse_query("alpha beta")
        docs = s.match_docs(ast)
        before = s.count(ast)
        ray.kill(s._pools[1][0])  # a dead REPLICA, reads never notice
        n = s.remove_docs([int(docs[0])])
        assert n >= 1
        assert s.count(ast) == before - 1
    finally:
        s.close()


def test_gather_survives_dead_primary(xs_index):
    s = Searcher(xs_index, num_readers=2, replicas=2, hedge_delay_s=0.2)
    try:
        ast = parse_query("alpha beta")
        docs = s.match_docs(ast)
        for a in s._pools[0]:
            ray.kill(a)
        out = s.gather([int(d) for d in docs[:3]], ["conv_id", "text"])
        assert out.num_rows == min(3, len(docs))
    finally:
        s.close()


def test_app_error_propagates_without_failover(xs_index):
    # generous hedge delay isolates the assertion: cold-actor startup
    # latency must not fire legitimate hedges during the error call
    s = Searcher(xs_index, num_readers=2, replicas=2, hedge_delay_s=30.0)
    try:
        with pytest.raises(ray.exceptions.RayTaskError):
            # an arg forces the packed path so the AttributeError is
            # raised READER-side (driver-side getattr would mask it)
            s._fanout("no_such_reader_method", 1)
        # a deterministic app error is NOT a replica failure: no hedges,
        # and the pool actors stay alive for the next real query
        assert s.hedges_fired == 0
        assert s.count(parse_query("alpha")) > 0
    finally:
        s.close()


def test_stats_cli_reports_lineage(xs_index, capsys):
    """`miru_ray stats` surfaces the manifest's lineage + stage metrics
    (the per-partition lineage/metrics the north rule names) without
    opening the index."""
    import json as _json
    from miru_ray.__main__ import main
    assert main(["stats", "--index", xs_index]) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[0])
    assert out["n_docs"] > 0 and out["n_partitions"] >= 1
    assert out["n_postings"] > 0 and out["segment_bytes"] > 0
    assert "segments" in out["stage_metrics"]
    assert main(["stats", "--index", xs_index, "--partitions"]) == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert len(lines) == 1 + out["n_segments"]


def test_cli_main_does_not_shut_down_callers_ray(xs_index, capsys):
    """In-process main() must NOT tear down a Ray session it didn't
    create — the bug: its unconditional finally-shutdown killed the
    suite's shared cluster, and the next Ray call auto-inited a FRESH
    one, so every pre-existing actor handle failed with 'from a
    different cluster' (broke every later session-searcher test)."""
    import ray

    @ray.remote
    class Canary:
        def ping(self):
            return 1

    c = Canary.remote()
    assert ray.get(c.ping.remote()) == 1
    from miru_ray.__main__ import main
    assert main(["stats", "--index", xs_index]) == 0
    capsys.readouterr()
    assert ray.is_initialized()
    # the pre-existing actor must still belong to the live cluster
    assert ray.get(c.ping.remote(), timeout=30) == 1
    ray.kill(c)
