"""Timing probe at an arbitrary scale multiple: run the given queries at
a base dir and a replicated big dir in ONE session and print per-query
base/big seconds + ratios (min-of-n, noop sink — the bench.py contract).

The scale10 block in bench.py answers "does the plan survive 10x" every
round; this tool is for the deeper one-shot probes (e.g. 100x — VERDICT
r4 item 5) without growing the per-round bench runtime.

Usage:
  python tools/scale_probe.py [--include-verification] BASE_DIR BIG_DIR FACTOR [query ...]
(defaults: the bench HEADLINE set; FACTOR is recorded, not derived)

Queries tagged ``verification`` in the registry (exactness twins of a
registered production path — all-pairs dedup, md5 MinHash, uncapped
itemcf) are SKIPPED unless --include-verification is passed: their cost
is by design not the production cost, and a bulk probe that sums them
misreads the engine's scale story. Skips are recorded in the output.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from bench import HEADLINE
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)


def time_query(fn, spark, sf_dir, n=None):
    if n is None:
        # SPARK_GRAFT_PROBE_RUNS=1 for one-shot decade probes (sf100):
        # the slopes of interest are ~10x factors, so +-10% single-run
        # noise is immaterial and the heaviest queries run once.
        n = int(os.environ.get("SPARK_GRAFT_PROBE_RUNS", "2"))
    runs = []
    for _ in range(n):
        t = time.time()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def main() -> None:
    argv = list(sys.argv[1:])
    include_verification = "--include-verification" in argv
    if include_verification:
        argv.remove("--include-verification")
    base = argv[0]
    big = argv[1]
    factor = int(argv[2])
    names = argv[3:] or HEADLINE
    spark = get_spark("scale-probe")
    qs = entry.queries()
    from data_pipeline_4_online_retail_spark.plans.registry import REGISTRY

    skipped = []
    if not include_verification:
        skipped = [
            n
            for n in names
            if n in REGISTRY and "verification" in REGISTRY[n].tags
        ]
        names = [n for n in names if n not in set(skipped)]
    out = {
        "metric": f"scale{factor}_probe",
        "base": base,
        "big": big,
        "factor": factor,
        "base_sec": {},
        "big_sec": {},
        "ratio": {},
        "errors": {},
        "skipped_verification": skipped,
    }
    # warmup both catalogs
    for d in (base, big):
        try:
            qs["op_order_by_full"](spark, d).write.mode("overwrite").format(
                "noop"
            ).save()
        except Exception as exc:  # noqa: BLE001
            out["errors"][f"_warmup:{d}"] = str(exc)[:200]
    for name in names:
        try:
            # per-tier shuffle granularity (runtime conf; session.py r10)
            apply_scale_granularity(spark, base)
            out["base_sec"][name] = time_query(qs[name], spark, base)
            apply_scale_granularity(spark, big)
            out["big_sec"][name] = time_query(qs[name], spark, big)
            out["ratio"][name] = round(
                out["big_sec"][name] / max(out["base_sec"][name], 1e-9), 2
            )
        except Exception as exc:  # noqa: BLE001
            out["errors"][name] = f"{type(exc).__name__}: {exc}"[:300]
    # Totals ONLY over names timed at BOTH dirs — a query that succeeds
    # at base but errors at big would otherwise skew total_ratio by
    # summing different query sets (ADVICE r5).
    both = sorted(set(out["base_sec"]) & set(out["big_sec"]))
    bs = sum(out["base_sec"][n] for n in both)
    gs = sum(out["big_sec"][n] for n in both)
    out["total_over"] = both
    out["base_total_sec"] = round(bs, 3)
    out["big_total_sec"] = round(gs, 3)
    out["total_ratio"] = round(gs / max(bs, 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
