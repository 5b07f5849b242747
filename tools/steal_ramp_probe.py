"""Direct test of the CPU-cap/credit hypothesis for the driver-context
bench penalty (VERDICT r11 item 1).

Runs sustained all-core load (32 worker processes spinning the same add
loop bench.py's cal_1t uses) for N windows, and per window reports:

- aggregate loop throughput (iterations/sec across all workers),
- steal%, user%, idle% from /proc/stat deltas,
- 1-thread calibration interleaved every few windows (from the parent,
  while workers keep spinning) — the driver's cal_1t analogue.

If the host throttles sustained multi-core load (burstable-VM credit
exhaustion), throughput falls and steal% climbs after some minutes and
plateaus; a single idle gap then recovers it. If the penalty were
thermal or in-repo, steal stays ~0 while throughput falls.

Usage: python tools/steal_ramp_probe.py [n_windows] [window_sec] [out.json]
"""

from __future__ import annotations

import json
import multiprocessing
import os
import sys
import time

STAT_FIELDS = (
    "user nice system idle iowait irq softirq steal guest guest_nice".split()
)


def read_stat() -> dict[str, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return dict(zip(STAT_FIELDS, (int(x) for x in parts)))


def worker(counter, stop) -> None:
    # Spin; bump the shared counter every 1M iterations.
    while not stop.is_set():
        s = 0
        for i in range(1_000_000):
            s += i
        with counter.get_lock():
            counter.value += 1


def main() -> None:
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    window_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 45.0
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/steal_ramp.json"
    n_procs = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    counter = multiprocessing.Value("q", 0)
    stop = multiprocessing.Event()
    procs = [
        multiprocessing.Process(target=worker, args=(counter, stop), daemon=True)
        for _ in range(n_procs)
    ]
    for p in procs:
        p.start()

    windows = []
    for w in range(n_windows):
        c0 = counter.value
        s0 = read_stat()
        t0 = time.time()
        time.sleep(window_sec)
        dt = time.time() - t0
        s1 = read_stat()
        c1 = counter.value
        delta = {k: s1[k] - s0[k] for k in STAT_FIELDS}
        tot = sum(delta.values())
        row = {
            "window": w,
            "mloops_per_sec": round((c1 - c0) / dt, 2),
            "steal_pct": round(100.0 * delta["steal"] / max(tot, 1), 2),
            "user_pct": round(100.0 * delta["user"] / max(tot, 1), 2),
            "idle_pct": round(100.0 * delta["idle"] / max(tot, 1), 2),
        }
        windows.append(row)
        print(json.dumps(row), flush=True)

    stop.set()
    for p in procs:
        p.join(timeout=5)
    with open(out_path, "w") as f:
        json.dump({"n_procs": n_procs, "window_sec": window_sec, "windows": windows}, f, indent=1)


if __name__ == "__main__":
    main()
