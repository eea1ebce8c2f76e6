#!/usr/bin/env python
"""Crash-proof test gate: one pytest process per test file.

The monolithic ``pytest tests -q`` invocation intermittently dies with an
XLA:CPU fatal signal (faulthandler dump, no summary) after a couple hundred
jit programs accumulate in one process — the codegen-under-suite-load
failure class diagnosed in round 3; the ``--xla_cpu_max_isa=AVX2`` cap in
tests/conftest.py reduced but did not eliminate it. Every file passes in an
isolated process, so the gate runs per-file: same tests, same conftest,
bounded blast radius — a crash in one file is reported as that FILE's
failure instead of killing the whole suite.

The reference's only gate is its gtest suite (test/CMakeLists.txt); this is
our equivalent, hardened for this host.

Usage:  /opt/venv/bin/python scripts/run_tests.py [-jN] [extra pytest args]
        -jN   run N files concurrently (default: 2; files are independent
              processes sharing only the persistent XLA compile cache)
Exit status: 0 iff every file's pytest exits 0.
"""

from __future__ import annotations

import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PER_FILE_TIMEOUT_S = 1200


def run_file(path: Path, extra: list[str]) -> tuple[Path, int, str, float]:
    t0 = time.perf_counter()
    cmd = [sys.executable, "-m", "pytest", str(path), "-q", "--no-header",
           "-p", "no:cacheprovider", *extra]
    try:
        r = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True,
                           timeout=PER_FILE_TIMEOUT_S)
        out, rc = r.stdout + r.stderr, r.returncode
    except subprocess.TimeoutExpired as e:
        # TimeoutExpired carries bytes even under text=True
        def _s(x):
            return x.decode(errors="replace") if isinstance(x, bytes) \
                else (x or "")

        out = _s(e.stdout) + _s(e.stderr) + "\n[TIMEOUT]"
        rc = -9
    return path, rc, out, time.perf_counter() - t0


def main(argv: list[str]) -> int:
    jobs = 2
    extra: list[str] = []
    files: list[Path] = []
    for a in argv:
        if re.fullmatch(r"-j\d+", a):
            jobs = int(a[2:])
        elif not a.startswith("-") and a.endswith(".py") and Path(a).exists():
            files.append(Path(a).resolve())
        elif a in ("-q", "--quiet"):
            pass  # run_file already passes -q; a second one ("-q -q")
            # suppresses pytest's "N passed" summary and breaks counting
        else:
            extra.append(a)

    files = sorted(files) or sorted((REPO / "tests").glob("test_*.py"))
    if not files:
        print("no test files found", file=sys.stderr)
        return 2

    failed: list[tuple[Path, int, str]] = []
    total_pass = total_fail = total_skip = 0
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=jobs) as pool:
        for path, rc, out, dt in pool.map(
                lambda p: run_file(p, extra), files):
            counts = {kind: int(n) for n, kind in
                      re.findall(r"(\d+) (passed|failed|skipped|error)s?\b",
                                 out)}
            total_pass += counts.get("passed", 0)
            total_fail += counts.get("failed", 0) + counts.get("error", 0)
            total_skip += counts.get("skipped", 0)
            if rc == 5:  # pytest: no tests collected (e.g. under -k)
                rc = 0
            status = "ok" if rc == 0 else f"FAIL(rc={rc})"
            print(f"{path.name:<36} {status:>10}  "
                  f"{counts.get('passed', 0):>3} passed  {dt:6.1f}s",
                  flush=True)
            if rc != 0:
                failed.append((path, rc, out))

    wall = time.perf_counter() - t0
    for path, rc, out in failed:
        print(f"\n===== {path.name} (rc={rc}) =====\n{out[-4000:]}",
              file=sys.stderr)
    print(f"\n{total_pass} passed, {total_fail} failed, {total_skip} skipped "
          f"across {len(files)} files in {wall:.0f}s "
          f"({len(failed)} file(s) failed)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
