"""Instrumented bench wrapper for the driver-context-penalty question
(VERDICT r11 item 1): three consecutive rounds read the SAME committed
tree ~20-30% slower when bench.py runs minutes after a heavy 32-core
load (the driver's 50-query sweep / a pytest run) than on an idle box,
with the 1-thread calibration nearly flat.

This wrapper runs bench.py as a subprocess and brackets it with the
instruments the sandbox actually exposes (no cpufreq interface here):

- **/proc/stat deltas** across the bench: user/system/idle/iowait/steal
  ticks. Steal is the hypervisor-capped-CPU signature (a burstable VM
  that has spent its CPU budget shows uniform multi-core slowdown,
  near-flat single-thread latency, and a rising steal fraction).
- **32-process calibration** (same 10M-iteration add loop as bench.py's
  cal_1t, run on every core at once via multiprocessing): indexes
  *all-core* throughput, which cal_1t provably does not (r11: queries
  +25%, cal_1t +6%).
- **/proc/meminfo** page-cache fields before/after (rule page-cache
  eviction in or out: sf0.1 + scale10 inputs are ~175 MB on a 128 GiB
  box, so eviction is implausible, but measure rather than assert).
- **page-cache residency** of every parquet byte under the input dirs
  (mincore via mmap) before the bench.

Usage: python tools/driver_context_probe.py <label> [out.json]
Run once minutes after a heavy sweep ("postload") and once on an idle
box ("idle"); diff the two JSONs.
"""

from __future__ import annotations

import json
import multiprocessing
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAT_FIELDS = (
    "user nice system idle iowait irq softirq steal guest guest_nice".split()
)


def read_stat() -> dict[str, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    return dict(zip(STAT_FIELDS, (int(x) for x in parts)))


def read_meminfo() -> dict[str, int]:
    keep = {"MemFree", "MemAvailable", "Cached", "Dirty", "Writeback", "Active(file)", "Inactive(file)"}
    out = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            if k in keep:
                out[k] = int(v.split()[0])
    return out


def _cal_loop(_i: int) -> float:
    t = time.time()
    s = 0
    for i in range(10_000_000):
        s += i
    return time.time() - t


def calibrate(n_procs: int) -> dict[str, float]:
    """n_procs concurrent copies of bench.py's cal_1t loop; report the
    mean and max per-process seconds (all-core throughput index)."""
    with multiprocessing.Pool(n_procs) as pool:
        times = pool.map(_cal_loop, range(n_procs))
    return {
        "n": n_procs,
        "mean_sec": round(sum(times) / len(times), 3),
        "max_sec": round(max(times), 3),
        "min_sec": round(min(times), 3),
    }


def residency(path: str) -> dict[str, int]:
    """Bytes of files under path resident in page cache (mincore)."""
    import ctypes
    import mmap

    libc = ctypes.CDLL("libc.so.6", use_errno=True)
    total = 0
    resident = 0
    page = os.sysconf("SC_PAGE_SIZE")
    for root, _dirs, files in os.walk(path):
        for fn in files:
            fp = os.path.join(root, fn)
            try:
                size = os.path.getsize(fp)
            except OSError:
                continue
            if size == 0:
                continue
            total += size
            npages = (size + page - 1) // page
            vec = (ctypes.c_ubyte * npages)()
            with open(fp, "rb") as f:
                try:
                    # MAP_PRIVATE + PROT_WRITE: writable *private* view of a
                    # read-only fd, so ctypes.from_buffer accepts it; no
                    # file modification. Untouched pages reflect the page
                    # cache of the underlying file, which is what mincore
                    # reports.
                    mm = mmap.mmap(
                        f.fileno(),
                        size,
                        flags=mmap.MAP_PRIVATE,
                        prot=mmap.PROT_READ | mmap.PROT_WRITE,
                    )
                except (ValueError, OSError):
                    continue
                addr = ctypes.addressof(ctypes.c_char.from_buffer(mm))
                if libc.mincore(ctypes.c_void_p(addr), ctypes.c_size_t(size), vec) == 0:
                    resident += sum(1 for b in vec if b & 1) * page
                mm.close()
    return {"total_bytes": total, "resident_bytes": min(resident, total)}


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "probe"
    out_path = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(HERE, f"/tmp/ctx_probe_{label}.json")
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf_tag = os.path.basename(sf_dir.rstrip("/"))
    scale10 = os.environ.get("SPARK_GRAFT_SCALE10_DIR", f"/tmp/scale10_{sf_tag}")

    result: dict = {"label": label, "t_start": time.time()}
    with open("/proc/loadavg") as f:
        result["loadavg_start"] = f.read().split()[:3]
    result["meminfo_start"] = read_meminfo()
    result["residency_input_start"] = residency(sf_dir)
    if os.path.isdir(scale10):
        result["residency_scale10_start"] = residency(scale10)
    result["cal_1p"] = round(_cal_loop(0), 3)
    result["cal_32p_before"] = calibrate(32)
    stat0 = read_stat()

    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench.py")],
        capture_output=True,
        text=True,
        env={**os.environ, "SPARK_GRAFT_BENCH_OUT": "/tmp"},
    )
    result["bench_wall_sec"] = round(time.time() - t0, 3)
    stat1 = read_stat()

    result["stat_delta"] = {k: stat1[k] - stat0[k] for k in STAT_FIELDS}
    busy = sum(
        v for k, v in result["stat_delta"].items() if k not in ("idle", "iowait")
    )
    tot = sum(result["stat_delta"].values())
    result["steal_pct_of_total"] = round(
        100.0 * result["stat_delta"]["steal"] / max(tot, 1), 2
    )
    result["steal_pct_of_busy"] = round(
        100.0 * result["stat_delta"]["steal"] / max(busy, 1), 2
    )
    result["cal_32p_after"] = calibrate(32)
    result["cal_1p_after"] = round(_cal_loop(0), 3)
    result["meminfo_end"] = read_meminfo()
    with open("/proc/loadavg") as f:
        result["loadavg_end"] = f.read().split()[:3]

    for line in (proc.stdout or "").strip().splitlines()[::-1]:
        if line.startswith("{"):
            try:
                result["bench"] = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    if "bench" not in result:
        result["bench_stdout_tail"] = (proc.stdout or "")[-2000:]
        result["bench_stderr_tail"] = (proc.stderr or "")[-2000:]

    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "bench"}, indent=1))
    if "bench" in result:
        print("BENCH:", json.dumps(result["bench"]))


if __name__ == "__main__":
    main()
