"""A/B the MinHash signature formulation (r12, guide §4: HOF lambdas run
interpreted — per-element lambda dispatch × 16 hashes; an explode +
hash-aggregate computes the SAME minima entirely in whole-stage codegen,
at the cost of one narrow map-side-combined exchange).

Variants (identical output pinned in-probe by a checksum join):

A. current  — 16 × array_min(transform(shingles, s -> xxhash64(s, i)))
B. explode  — explode_outer(shingles) → groupBy(doc_id).agg(16 × min(xxhash64))
C. hof1pass — aggregate(shingles, MAXLONG×16, (acc,s) -> zip_with(least))
              (one HOF traversal instead of 16, still interpreted)

Each timed min-of-3 through the noop sink on the full fast-LSH pipeline
downstream shape (signature only — the band join is identical either way).

Usage: python tools/sig_formulation_probe.py [sf_dir ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators.dedup import (
    N_HASHES,
    _docs,
    minhash_signature_xxhash64,
    shingled_docs,
)
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)

MAXLONG = (1 << 63) - 1


def sig_explode(sharr: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    ex = sharr.select("doc_id", F.explode_outer("shingles").alias("s"))
    aggs = [
        F.min(
            F.when(F.col("s").isNotNull(), F.xxhash64(F.col("s"), F.lit(i)))
        ).alias(f"h{i}")
        for i in range(n_hashes)
    ]
    return ex.groupBy("doc_id").agg(*aggs)


def sig_hof1pass(sharr: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    init = F.array(*[F.lit(MAXLONG).cast("long") for _ in range(n_hashes)])
    merged = F.aggregate(
        "shingles",
        init,
        lambda acc, s: F.zip_with(
            acc,
            F.array(*[F.xxhash64(s, F.lit(i)) for i in range(n_hashes)]),
            lambda a, b: F.least(a, b),
        ),
    )
    guarded = F.when(F.size("shingles") > 0, merged)
    cols = [F.element_at(F.col("_m"), i + 1).alias(f"h{i}") for i in range(n_hashes)]
    return sharr.select("doc_id", guarded.alias("_m")).select("doc_id", *cols)


def _time(df: DataFrame, n: int = 3) -> float:
    runs = []
    for _ in range(n):
        t = time.time()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.time() - t)
    return round(min(runs), 3)


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("sig-probe")
    for sf_dir in dirs:
        apply_scale_granularity(spark, sf_dir)
        sharr = shingled_docs(_docs(spark, sf_dir))
        variants = {
            "A_current": minhash_signature_xxhash64(sharr),
            "B_explode": sig_explode(sharr),
            "C_hof1pass": sig_hof1pass(sharr),
        }
        # equality check: full outer join on doc_id, every h column equal
        base = variants["A_current"]
        for name in ("B_explode", "C_hof1pass"):
            other = variants[name]
            cond = [
                (F.col(f"a.h{i}") == F.col(f"b.h{i}"))
                | (F.col(f"a.h{i}").isNull() & F.col(f"b.h{i}").isNull())
                for i in range(N_HASHES)
            ]
            bad = (
                base.alias("a")
                .join(other.alias("b"), "doc_id", "full_outer")
                .where(~(cond[0] if len(cond) == 1 else F.expr(" AND ".join(
                    f"((a.h{i} = b.h{i}) OR (a.h{i} IS NULL AND b.h{i} IS NULL))"
                    for i in range(N_HASHES)
                ))))
                .count()
            )
            print(f"{sf_dir} {name}: mismatched rows = {bad}")
            assert bad == 0, f"{name} output differs"
        for name, df in variants.items():
            spark.sparkContext.setJobDescription(f"sig {name} @ {sf_dir}")
            print(f"{sf_dir} {name}: {_time(df)} s", flush=True)
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
