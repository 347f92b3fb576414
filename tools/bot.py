#!/usr/bin/env python
"""miru-bot analogue: write-known-values-then-query conformance worker.

Reference: the bot deployable writes synthetic activities with values it
remembers in a bucket, waits for delivery, then queries distincts /
uniques through the READER and cross-checks BOTH directions — every
written value must come back, and no unknown value may appear
(``miru-bot-deployable/.../MiruBotDistinctsWorker.java:86-180`` — values
flip READ_SUCCESS/READ_FAIL; ``MiruBotUniquesWorker.java`` counts).

This worker drives the same loop against a live TenantRegistry, entirely
through the JSON REQUEST surface (the reader endpoint analogue):

  per round: append a batch of NEW conversations with deterministic
  field values and a per-round text marker → deliver (incremental index
  build — the sip/append path) → query Distincts(tool), Uniques(tool)
  and FullText(count of the round marker) via ``execute_request`` →
  cross-check against the bucket.  Append → query lag must be ZERO
  after delivery commits (the freshness assertion).

Usage:
    python tools/bot.py [--root /tmp/miru_bot] [--rounds 3]
                        [--convs-per-round 20] [--turns 3]

Prints one JSON line per round; exits non-zero on any READ_FAIL.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

TENANT = "mirubot"


def _round_batch(rnd: int, convs: int, turns: int) -> pa.Table:
    """Deterministic synthetic activities for one round: whole NEW
    conversations (the append constraint), tool values from a per-round
    pool, a per-round rare text marker in every turn."""
    n = convs * turns
    conv_id = np.repeat(
        [f"conv-bot-{rnd:04d}-{i:04d}" for i in range(convs)], turns)
    turn_idx = np.tile(np.arange(turns, dtype=np.int32), convs)
    tool = np.repeat([f"bot_tool_{rnd}_{i % 5}" for i in range(convs)],
                     turns)
    role = np.where(turn_idx % 2 == 0, "user", "assistant")
    text = np.array([f"botmark{rnd} synthetic turn {int(t)} of round {rnd}"
                     for t in turn_idx], dtype=object)
    base = 1_704_067_200_000_000 + rnd * 1_000_000_000
    ts = base + np.arange(n, dtype=np.int64) * 1_000_000
    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


def run_bot(root: str, rounds: int = 3, convs_per_round: int = 20,
            turns: int = 3) -> list[dict]:
    """Run the write→deliver→read loop; returns per-round reports."""
    from miru_ray.config import IndexConfig
    from miru_ray.index.build import build_index
    from miru_ray.index.tenants import TenantRegistry
    from miru_ray.query.request import execute_request

    cfg = IndexConfig(docs_per_partition=500, num_shards=2,
                      keyword_fields=("role", "tool"))
    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    idir = os.path.join(root, "index")
    reg = TenantRegistry(os.path.join(root, "registry"))

    bucket_tools: set[str] = set()   # every value ever written (the
    #                                  bot bucket, MiruBotBucket analogue)
    files: list[str] = []
    reports = []
    try:
        for rnd in range(rounds):
            batch = _round_batch(rnd, convs_per_round, turns)
            path = os.path.join(root, "input", f"batch-{rnd:04d}.parquet")
            pq.write_table(batch, path)
            files.append(path)
            bucket_tools.update(batch["tool"].to_pylist())

            t0 = time.perf_counter()
            build_index(files, idir, cfg)  # round 0 builds, later append
            if TENANT in reg.tenants():
                reg.evict(TENANT)  # in-place append: cached readers stale
            else:
                reg.register(TENANT, idir, cfg)
            deliver_s = time.perf_counter() - t0

            fails = []
            # the read window covers every round written so far (the
            # reference bot reads "from N ms in the past until now")
            tr = {"smallestTimestamp": 1_704_067_200_000_000,
                  "largestTimestamp": 1_704_067_200_000_000
                  + (rounds + 1) * 1_000_000_000}
            # Distincts(tool): both directions, like the reference's
            # READ_SUCCESS/READ_FAIL bookkeeping
            ans = execute_request(reg, {
                "tenantId": TENANT,
                "query": {"gatherDistinctsForField": "tool",
                          "timeRange": tr}})["answer"]
            got = set(ans["results"])
            missing = sorted(bucket_tools - got)
            unexpected = sorted(got - bucket_tools)
            if missing:
                fails.append(f"distincts missing {missing[:5]}")
            if unexpected:
                fails.append(f"distincts unexpected {unexpected[:5]}")
            # Uniques(tool): cardinality only
            ans = execute_request(reg, {
                "tenantId": TENANT,
                "query": {"gatherUniquesForField": "tool",
                          "timeRange": tr}})["answer"]
            if ans["uniques"] != len(bucket_tools):
                fails.append(f"uniques {ans['uniques']} != "
                             f"{len(bucket_tools)}")
            # DistinctCount: every round marker written so far matches
            # exactly its round's conversations (freshness across
            # appends — older rounds must not regress)
            for r2 in range(rnd + 1):
                ans = execute_request(reg, {
                    "tenantId": TENANT,
                    "query": {
                        "aggregateCountAroundField": "conv_id",
                        "desiredNumberOfDistincts": 10 * convs_per_round,
                        "streamFilter": {
                            "fieldFilters": [{
                                "fieldName": "text",
                                "values": [f"botmark{r2}"]}],
                            "operation": "or"}}})["answer"]
                if ans["collectedDistincts"] != convs_per_round:
                    fails.append(
                        f"distinct_count botmark{r2} "
                        f"{ans['collectedDistincts']} != {convs_per_round}")
            reports.append({
                "round": rnd, "written": batch.num_rows,
                "total_docs": (rnd + 1) * convs_per_round * turns,
                "distinct_tools": len(bucket_tools),
                "deliver_seconds": round(deliver_s, 3),
                "read_fail": fails, "ok": not fails})
    finally:
        reg.close()
    return reports


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--root", default="/tmp/miru_bot")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--convs-per-round", type=int, default=20)
    ap.add_argument("--turns", type=int, default=3)
    args = ap.parse_args()

    import logging

    import ray
    import ray.data
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import shutil
    shutil.rmtree(args.root, ignore_errors=True)
    try:
        reports = run_bot(args.root, args.rounds, args.convs_per_round,
                          args.turns)
    finally:
        ray.shutdown()
    for r in reports:
        print(json.dumps(r))
    return 0 if all(r["ok"] for r in reports) else 1


if __name__ == "__main__":
    raise SystemExit(main())
