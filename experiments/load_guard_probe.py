#!/usr/bin/env python3
"""A/B probe for bench.py's load guard — round 13 (VERDICT r12 #2).

The r12 driver record ran ~14% hot with FLAT first/last sentinels and
``load_suspect: false``: the old guard was blind to (a) a burst that
arrives and recedes MID-SUITE (both endpoint sentinels idle) and (b)
uniform load confined to the measured pass.  The round-13 guard
interleaves probes through each pass, records the element-wise min
across >= 2 clean passes, and adds a sibling-floor rule (a pass whose
coolest probe sits >1.3x above the coolest probe of any pass in the
same invocation is loaded).

Synthetic load is synchronized to bench.py's env-gated
``# bench-progress`` stderr markers (SPARK_GRAFT_BENCH_PROGRESS=1) —
earlier time-aimed campaigns on this box showed its ambient wobble
(idle suite values 67-82 s across invocations, idle probe floors
0.06-0.08 s) moves a wall-clock-aimed burst onto the wrong side of a
probe.

Three scenarios, each its own bench invocation at a small SF:

  * idle (1 pass)        -> old pass, new pass (no false positive);
                            calibrates the box's idle reference as the
                            MAX idle probe (the upper idle band — probe
                            readings spread ~1.6x on a quiet box, so
                            the min would make every rule trip).
  * mid_burst (1 pass)   -> full-core spinners from done-q13 to
                            done-q27: they cover exactly the interior
                            probe before q20 and neither endpoint.
                            OLD endpoint rules pass (the r12 blind
                            spot); NEW drift rule over the interior
                            probes flags.
  * uniform_pass1 (2+ passes) -> flat spinner load from process start
                            to the end of PASS 1 exactly (pass_end
                            marker).  Old per-pass endpoint rules
                            accept that pass, and <= r12 bench had ONE
                            pass — it would have RECORDED it (the r12
                            failure).  The r13 protections are (i)
                            structural: the record is the element-wise
                            MIN across >= 2 clean passes, so the hot
                            pass cannot land in it; (ii) detective,
                            when the load clears sentinel noise: the
                            sibling-floor rule marks the hot pass
                            suspect once a clean pass exposes the true
                            floor.  Mild (~1.1-1.3x) uniform load is
                            BELOW the sentinel noise floor on this box
                            (idle floors wobble that much between
                            invocations) — for that band only the
                            structural protection applies, by design.

The old rules are evaluated on the new record's endpoint probes
(cpu_probes[0]/[-1]) exactly as bench.py <= r12 computed them, on the
IDENTICAL profile the new rules see — the comparison cannot be
confounded by run-to-run noise.

Usage: python experiments/load_guard_probe.py [sf_dir]
Prints one JSON line; "pass" is the overall A/B verdict.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import threading
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _spin() -> None:
    x = 0
    while True:
        x = (x * 1103515245 + 12345) & 0x7FFFFFFF


def run_bench(
    sf_dir: str,
    idle_ref: float | None = None,
    passes: int = 1,
    attempts: int = 1,
    n_spin: int = 0,
    start_marker: str | None = None,
    stop_marker: str | None = None,
) -> dict:
    """One bench invocation.  If ``n_spin``: start that many busy-spin
    processes when ``start_marker`` appears on bench stderr (or
    immediately if None) and stop them at ``stop_marker``."""
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_BENCH_ATTEMPTS=str(attempts),
        SPARK_GRAFT_BENCH_PASSES=str(passes),
        SPARK_GRAFT_BENCH_RUNS="1",
        SPARK_GRAFT_BENCH_PROGRESS="1",
    )
    if idle_ref is not None:
        env["SPARK_GRAFT_CPU_SENTINEL_REF"] = str(idle_ref)
    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    stdout_lines: list[str] = []
    t = threading.Thread(
        target=lambda: stdout_lines.extend(proc.stdout), daemon=True
    )
    t.start()
    spinners: list[multiprocessing.Process] = []

    def start_spinners() -> None:
        for _ in range(n_spin):
            p = multiprocessing.Process(target=_spin, daemon=True)
            p.start()
            spinners.append(p)

    def stop_spinners() -> None:
        for p in spinners:
            p.terminate()

    if n_spin and start_marker is None:
        start_spinners()
    for line in proc.stderr:
        if n_spin and start_marker and start_marker in line and not spinners:
            start_spinners()
        if spinners and stop_marker and stop_marker in line:
            stop_spinners()
            stop_marker = None
    proc.wait()
    stop_spinners()
    t.join(timeout=10)
    line = [ln for ln in stdout_lines if ln.startswith("{")][-1]
    return json.loads(line)


def old_rule(probes: list[float], idle_ref: float) -> bool:
    """The <= r12 guard, verbatim, on the endpoint probes only."""
    hi, lo = max(probes[0], probes[-1]), min(probes[0], probes[-1])
    return (hi > 1.5 * lo and hi - lo > 0.1) or hi > 0.5 or lo > 1.5 * idle_ref


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    ncpu = os.cpu_count() or 8

    idle = run_bench(sf_dir)
    probes0 = idle["passes"][0]["cpu_probes"]
    idle_ref = max(probes0)  # the upper idle band of THIS box

    # Scenario B: full-core burst covering exactly the interior probe
    # before q20 (markers: after q13 done -> after q27 done); probes
    # before q0/q10/q30/.../end stay outside it.
    mid = run_bench(
        sf_dir, idle_ref=idle_ref, n_spin=ncpu,
        start_marker="done pass=1 q=13", stop_marker="done pass=1 q=27",
    )
    mid_probes = mid["passes"][0]["cpu_probes"]

    # Scenario C: flat spinner load from process start to the exact end
    # of pass 1, in a 2-clean-pass invocation.
    uni = run_bench(
        sf_dir, idle_ref=idle_ref, passes=2, attempts=4,
        n_spin=int(ncpu * 0.875), stop_marker="pass_end 1",
    )
    uni_p1 = uni["passes"][0]["cpu_probes"]

    record = {
        "probe": "load_guard_ab_r13",
        "sf_dir": sf_dir,
        "idle_ref_calibrated": idle_ref,
        "idle": {
            "cpu_probes": probes0,
            "value": idle["value"],
            "old_flag": old_rule(probes0, idle_ref),
            "new_flag": idle["load_suspect"],
        },
        "mid_burst": {
            "cpu_probes": mid_probes,
            "value": mid["value"],
            "old_flag": old_rule(mid_probes, idle_ref),
            "new_flag": mid["load_suspect"],
        },
    }
    pass1_value = round(sum(uni["passes"][0]["timings"].values()), 3)
    record["uniform_pass1"] = {
        "pass1_probes": uni_p1,
        "all_pass_floors": [min(p["cpu_probes"]) for p in uni["passes"]],
        # <= r12 bench ran ONE pass: under this load epoch it records
        # pass 1's total with load_suspect=false.
        "old_recorded_value": pass1_value,
        "new_recorded_value": uni["value"],
        "hot_pass_excess": round(pass1_value / uni["value"], 3),
        "clean_passes": uni["clean_passes"],
        "attempts": uni["attempts"],
        "old_flag": old_rule(uni_p1, idle_ref),
        "sibling_rule_flagged": bool(uni["passes"][0]["load_suspect"]),
        "record_clean": not uni["load_suspect"],
    }
    record["pass"] = (
        not record["idle"]["old_flag"] and not record["idle"]["new_flag"]
        and not record["mid_burst"]["old_flag"] and record["mid_burst"]["new_flag"]
        and not record["uniform_pass1"]["old_flag"]
        and record["uniform_pass1"]["record_clean"]
        # the hot pass must run measurably above what the new protocol
        # records — i.e. the old protocol's record WAS contaminated and
        # the new one is not (2% = well outside element-wise-min jitter)
        and record["uniform_pass1"]["hot_pass_excess"] > 1.02
    )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
