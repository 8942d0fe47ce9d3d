#!/usr/bin/env python3
"""A/B probe for bench.py's absolute-load guard (VERDICT r10 #4).

The r10 driver bench ran on a uniformly ~1.5-2x loaded box (cpu
sentinels 0.207-0.28 s vs the 0.10-0.13 s idle floor) and was NOT
flagged, because the old rule only tested first-vs-last drift.  This
probe runs the bench twice at a small SF with one attempt each:

  * idle           -> load_suspect must be False
  * under synthetic uniform load (one busy-spin process per core,
    running for the whole bench)  -> load_suspect must be True

Usage: python experiments/load_guard_probe.py [sf_dir]
Prints one JSON line with both records' sentinel blocks and flags.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _spin() -> None:
    x = 0
    while True:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def run_bench(sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ATTEMPTS="1",
        SPARK_GRAFT_BENCH_RUNS="1",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    idle = run_bench(sf_dir)
    spinners = [
        multiprocessing.Process(target=_spin, daemon=True)
        for _ in range(os.cpu_count() or 8)
    ]
    for p in spinners:
        p.start()
    time.sleep(1)
    try:
        loaded = run_bench(sf_dir)
    finally:
        for p in spinners:
            p.terminate()
    record = {
        "probe": "load_guard_ab",
        "sf_dir": sf_dir,
        "idle": {
            "sentinel_sec": idle["sentinel_sec"],
            "load_suspect": idle["load_suspect"],
        },
        "loaded": {
            "sentinel_sec": loaded["sentinel_sec"],
            "load_suspect": loaded["load_suspect"],
        },
        "pass": (not idle["load_suspect"]) and loaded["load_suspect"],
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
