"""Measure the dedup pipeline's DENSITY — not just its time — per decade.

VERDICT r10 item 1: dedup_clusters' third decade (sf10 17.7 s -> sf100
185.9 s, 10.5x for 10x docs) was ATTRIBUTED to the scale replica's
construction inflating near-dup density, but the attribution was asserted
from construction, not measured. This probe measures the quantities the
attribution is about, at any corpus dir:

  n_docs            — corpus size
  bucket_pair_vol   — sum over LSH buckets of C(size,2): the band join's
                      output volume BEFORE distinct (the actual shuffle
                      cost driver)
  n_candidates      — distinct candidate pairs (doc_a < doc_b)
  n_verified        — candidates passing exact-Jaccard >= 0.6 (the cc
                      edge input)
  max_bucket        — largest single LSH bucket (skew indicator)
  stage seconds     — shingle+sig+band / candidates / verify / cc

Density = candidates/doc and verified/doc. If those are FLAT across
decades, the replica preserves density and the superlinear time must be
explained elsewhere (spill wall, contraction rounds); if they GROW, the
replica construction inflates density and the 10.5x decade is a corpus
artifact, not an engine scaling defect.

Usage: python tools/dedup_density_probe.py [SF_DIR ...]
Prints one JSON line per dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.operators import dedup as dd
from data_pipeline_4_online_retail_spark.session import (
    apply_scale_granularity,
    get_spark,
)


def probe(spark, sf_dir: str) -> dict:
    dd.release_caches()
    apply_scale_granularity(spark, sf_dir)
    out: dict = {"sf_dir": sf_dir}

    t0 = time.monotonic()
    docs = dd._docs(spark, sf_dir)
    sharr = dd._persist(dd.shingled_docs(docs))
    out["n_docs"] = sharr.count()
    sig = dd.minhash_signature_md5(sharr)

    # Reproduce lsh_candidate_pairs' banding, but materialize the banded
    # table once so bucket stats and the candidate join read one cache.
    rows = dd._sig_hash_count(sig) // dd.N_BANDS
    bands = F.array(
        *[
            F.md5(F.concat_ws("|", *[f"h{b * rows + r}" for r in range(rows)]))
            for b in range(dd.N_BANDS)
        ]
    )
    banded = dd._persist(
        sig.select("doc_id", F.posexplode(bands).alias("band_idx", "band_hash"))
    )
    banded.count()
    out["sig_band_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.count("*").alias("sz")
    )
    stats = buckets.agg(
        F.sum(F.expr("sz * (sz - 1) / 2")).alias("pair_vol"),
        F.max("sz").alias("max_bucket"),
        F.count("*").alias("n_buckets"),
    ).collect()[0]
    out["bucket_pair_vol"] = int(stats["pair_vol"])
    out["max_bucket"] = int(stats["max_bucket"])
    out["n_buckets"] = int(stats["n_buckets"])
    out["bucket_stats_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    cand = dd._persist(dd._band_self_join(banded))
    out["n_candidates"] = cand.count()
    out["candidates_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    pairs = dd._persist(
        dd.jaccard_verify_pairs(cand, sharr, dd.JACCARD_THRESHOLD)
    )
    out["n_verified"] = pairs.count()
    out["verify_sec"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    cc = dd.connected_components(pairs)
    out["n_labeled"] = cc.count()
    out["cc_sec"] = round(time.monotonic() - t0, 2)

    out["cand_per_doc"] = round(out["n_candidates"] / out["n_docs"], 4)
    out["verified_per_doc"] = round(out["n_verified"] / out["n_docs"], 4)
    dd.release_caches()
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = get_spark("dedup-density-probe")
    for d in dirs:
        print(json.dumps(probe(spark, d)), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
