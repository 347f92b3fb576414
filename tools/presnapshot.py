"""Pre-snapshot gate: refuse to bless a tree whose test suite is red.

Round 4 shipped a NameError because the end-of-round snapshot commit
carried working-tree edits that were never run through pytest (VERDICT
round 4, "What's wrong" #1).  This script is the recorded full-suite
run that must precede any snapshot/milestone commit:

    python tools/presnapshot.py          # full suite
    python tools/presnapshot.py tests/test_ops.py   # targeted subset

It runs pytest against the CURRENT working tree (exactly what a
snapshot commit would capture), writes a machine-readable record to
TESTRUN.json — git SHA, dirty-file list, pass/fail counts, duration,
UTC timestamp — and exits non-zero on any failure, so wiring it in
front of `git commit` (`python tools/presnapshot.py && git commit ...`)
makes an untested snapshot impossible rather than merely discouraged.
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(["git", *args], cwd=REPO, capture_output=True,
                          text=True).stdout.strip()


def main(argv: list[str]) -> int:
    targets = argv or ["tests/"]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", *targets, "-q", "--tb=line"],
        cwd=REPO, capture_output=True, text=True)
    dur = time.time() - t0
    tail = (proc.stdout.strip().splitlines() or [""])[-1]
    counts = {k: int(n) for n, k in
              re.findall(r"(\d+) (passed|failed|error|errors|skipped)",
                         tail)}
    record = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "sha": _git("rev-parse", "HEAD"),
        "dirty": sorted(_git("status", "--porcelain").splitlines()),
        "targets": targets,
        "summary": tail,
        "passed": counts.get("passed", 0),
        "failed": counts.get("failed", 0) + counts.get("error", 0)
        + counts.get("errors", 0),
        "returncode": proc.returncode,
        "seconds": round(dur, 1),
    }
    with open(os.path.join(REPO, "TESTRUN.json"), "w") as f:
        json.dump(record, f, indent=1)
        f.write("\n")
    print(json.dumps(record))
    if proc.returncode != 0:
        print("REFUSING TO SNAPSHOT: test suite is red", file=sys.stderr)
        print(proc.stdout[-3000:], file=sys.stderr)
    return proc.returncode


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
