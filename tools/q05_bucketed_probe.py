"""TPC-H q05 on orderkey-bucketed inputs (VERDICT r8 item 5).

q05 was the one TPC-H query that crossed the spill wall at sf100
(11.2x/decade): it exchanges lineitem⋈orders⋈customer in full. Its
FIRST join — lineitem⋈orders on the order key — is exactly the exchange
the r8 bucketed layout eliminates (the orders-side date filter sits on
top of the bucketed scan and preserves its hash distribution and sort
order). The remaining custkey exchange carries only the already-joined,
column-pruned fact, so the probe answers: how much of q05's superlinear
decade was the orderkey exchange, and how much is the customer side
that no single-key layout can remove?

Usage:
  python tools/q05_bucketed_probe.py [SF_DIR] [N_BUCKETS]
(defaults: /tmp/scale1000_sf100, 32; SPARK_GRAFT_IO_CODEC=zstd
recommended at sf100 — the r8 convention for spill-heavy probes)

Prints one JSON line: plain vs bucketed q05 seconds (warm min-of-2 by
default, SPARK_GRAFT_PROBE_RUNS=1 for one-shot), shuffle-exchange
counts, the one-time bucketed-write cost, and the minimum free scratch
observed while each variant ran (the r8 disk-watcher evidence style).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_4_online_retail_spark.operators.tpch import tpch_q05
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)
from data_pipeline_4_online_retail_spark.sources.bucketing import (
    write_bucketed,
)
from data_pipeline_4_online_retail_spark.sources.catalog import load_tables

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale1000_sf100"
N_BUCKETS = (
    int(sys.argv[2])
    if len(sys.argv) > 2
    # measured rule as code (VERDICT r11 item 5): q05 is the exchange-dominated exception -> 1 wave
    else pick_bucket_count(
        table_file_bytes(SF_DIR, "lineitem"),
        int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        consumers="exchange",
    )
)
WAREHOUSE = "/tmp/q05_bucketed_probe"


class _DiskWatcher:
    def __init__(self, path="/tmp"):
        self.path = path
        self.min_free_gb = shutil.disk_usage(path).free / 1e9
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        while not self._stop.wait(2.0):
            free = shutil.disk_usage(self.path).free / 1e9
            self.min_free_gb = min(self.min_free_gb, free)

    def __enter__(self):
        self._t.start()
        return self

    def __exit__(self, *a):
        self._stop.set()
        self._t.join()


def _time(df, n=None):
    if n is None:
        n = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def _shuffles(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Exchange hashpartitioning"
    )


def main() -> None:
    spark = get_spark(
        "q05-bucketed-probe",
        extra_conf={
            "spark.sql.legacy.bucketedTableScan.outputOrdering": "true"
        },
    )
    apply_scale_granularity(spark, SF_DIR)
    cat = load_tables(spark, SF_DIR)
    out = {
        "metric": "q05_bucketed_probe",
        "sf_dir": SF_DIR,
        "n_buckets": N_BUCKETS,
        "codec": spark.conf.get("spark.io.compression.codec"),
    }

    # Plain first (load_tables is memoized; overrides come after).
    plain_q05 = tpch_q05(spark, SF_DIR)
    out["plain_shuffles"] = _shuffles(plain_q05)
    with _DiskWatcher() as w:
        out["plain_sec"] = _time(plain_q05)
    out["plain_min_free_gb"] = round(w.min_free_gb, 1)

    t0 = time.time()
    write_bucketed(
        cat.table("lineitem"), "q05_li", f"{WAREHOUSE}/lineitem",
        bucket_by="l_orderkey", n_buckets=N_BUCKETS,
    )
    write_bucketed(
        cat.table("orders"), "q05_ord", f"{WAREHOUSE}/orders",
        bucket_by="o_orderkey", n_buckets=N_BUCKETS,
    )
    out["bucketed_write_sec"] = round(time.time() - t0, 3)

    # tpch_q05 resolves through the memoized catalog — swap the handles.
    orig_li = cat.table("lineitem")
    orig_ord = cat.table("orders")
    cat.register("lineitem", spark.table("q05_li"))
    cat.register("orders", spark.table("q05_ord"))
    try:
        bucketed_q05 = tpch_q05(spark, SF_DIR)
        out["bucketed_shuffles"] = _shuffles(bucketed_q05)
        with _DiskWatcher() as w:
            out["bucketed_sec"] = _time(bucketed_q05)
        out["bucketed_min_free_gb"] = round(w.min_free_gb, 1)
    finally:
        cat.register("lineitem", orig_li)
        cat.register("orders", orig_ord)
        for t in ("q05_li", "q05_ord"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    out["speedup"] = round(out["plain_sec"] / max(out["bucketed_sec"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
