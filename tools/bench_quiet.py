"""Steal-gated bench runner: wait for a quiet host, then run bench.py.

Single-box benchmark numbers on a shared host are only meaningful when
the hypervisor isn't stealing cycles (BENCH.md documents several
contention-degraded windows).  This wrapper:

1. polls /proc/stat steal until a canary window is below --max-steal
   jiffies per 10 s (or --wait-s elapses, then runs anyway, flagged),
2. runs ``python bench.py`` with any extra args passed through,
3. measures steal across the run and prints a one-line JSON verdict
   (quiet_before, steal_during, seconds, ok) to stderr; the bench's own
   stdout passes through untouched.

Exit code: bench's own code, or 3 if the run's window was contended
(steal_during > --max-steal scaled by duration) so callers can retry.
"""
import argparse
import json
import subprocess
import sys
import time


def steal_now() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def steal_window(seconds: float) -> int:
    a = steal_now()
    time.sleep(seconds)
    return steal_now() - a


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steal", type=int, default=100,
                    help="max steal jiffies per 10 s to call the box quiet")
    ap.add_argument("--wait-s", type=int, default=1800,
                    help="max seconds to wait for a quiet canary")
    ap.add_argument("--canary-s", type=int, default=10)
    ap.add_argument("bench_args", nargs="*",
                    help="passed through to bench.py")
    args = ap.parse_args()

    t0 = time.time()
    quiet = False
    while time.time() - t0 < args.wait_s:
        w = steal_window(args.canary_s)
        per10 = w * 10.0 / args.canary_s
        print(f"[bench_quiet] canary steal/{args.canary_s}s={w} "
              f"(={per10:.0f}/10s, threshold {args.max_steal})",
              file=sys.stderr, flush=True)
        if per10 <= args.max_steal:
            quiet = True
            break
        time.sleep(min(60, args.canary_s * 3))
    if not quiet:
        print("[bench_quiet] wait budget exhausted — running anyway "
              "(window will be flagged)", file=sys.stderr, flush=True)

    a = steal_now()
    start = time.time()
    rc = subprocess.call([sys.executable, "bench.py"] + args.bench_args)
    dur = time.time() - start
    during = steal_now() - a
    budget = args.max_steal * dur / 10.0
    ok = during <= budget
    print(json.dumps({"quiet_before": quiet, "steal_during": during,
                      "steal_budget": round(budget, 1),
                      "seconds": round(dur, 1), "window_ok": ok}),
          file=sys.stderr, flush=True)
    if rc != 0:
        return rc
    return 0 if ok else 3


if __name__ == "__main__":
    raise SystemExit(main())
