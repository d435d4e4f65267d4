"""Load-gated bench floor harness (round-7; r6 VERDICT item 3).

Runs the full bench.py headline suite N times, each run gated on
1-minute loadavg, and reports per-query FLOORS (minima) plus every
run's total — the noise-robust plan-cost estimator this host forces
(BENCH/BASELINE.md round-6 notes: identical code and outputs, per-run
totals 107-222 s under co-tenant storms, per-query minima converge).

The cleanest single run (min total) is what should be committed as the
round's BENCH artifact so the driver-visible file and the floor table
agree.

Usage: python scripts/bench_floors.py [runs] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOAD_GATE = 1.5
GATE_TIMEOUT_S = 1200
GATE_POLL_S = 20


def load1() -> float:
    with open("/proc/loadavg") as f:
        return float(f.read().split()[0])


def wait_gate(tag: str) -> bool:
    t0 = time.time()
    while time.time() - t0 < GATE_TIMEOUT_S:
        l = load1()
        if l < LOAD_GATE:
            return True
        print(f"# gate {tag}: load {l:.2f} >= {LOAD_GATE}, waiting", flush=True)
        time.sleep(GATE_POLL_S)
    print(f"# gate {tag}: never opened; running anyway (recorded)", flush=True)
    return False


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_floors_r7.json"
    samples = []
    for i in range(runs):
        gated = wait_gate(f"run{i}")
        pre = load1()
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        line = next(
            (l for l in p.stdout.splitlines() if l.startswith("{")), None
        )
        if line is None:
            print(f"# run{i} produced no JSON (rc={p.returncode}): {p.stderr[-300:]}", flush=True)
            continue
        rec = json.loads(line)
        rec["_load_pre"], rec["_gated"], rec["_harness_wall"] = pre, gated, round(time.time() - t0, 1)
        samples.append(rec)
        print(f"# run{i}: total {rec['value']}s (load_pre {pre:.2f}, gated {gated})", flush=True)
    if not samples:
        sys.exit(1)
    queries = sorted({q for s in samples for q in s["queries"]})
    floors = {q: min(s["queries"][q] for s in samples if q in s["queries"]) for q in queries}
    best = min(samples, key=lambda s: s["value"])
    summary = {
        "runs": len(samples),
        "totals": [s["value"] for s in samples],
        "floors": floors,
        "floor_sum": round(sum(floors.values()), 3),
        "best_run": best,
    }
    with open(out_path, "w") as f:
        json.dump({"samples": samples, "summary": summary}, f, indent=1)
    print(json.dumps({"floor_sum": summary["floor_sum"], "totals": summary["totals"],
                      "best_total": best["value"], "out": out_path}), flush=True)


if __name__ == "__main__":
    main()
