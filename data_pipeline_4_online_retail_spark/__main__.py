"""CLI: run the reference pipeline end-to-end and materialize its tables.

    python -m data_pipeline_4_online_retail_spark run [--csv PATH] [--out DIR]

Without ``--csv`` the deterministic parity fixture is the source (the
shape a reference user's Online Retail CSV has after download). Each
built stage lands as parquet under ``--out`` (default ./retail_output),
quality gates run between stages, and the three reports print.
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="data_pipeline_4_online_retail_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    run = sub.add_parser("run", help="run the retail pipeline")
    run.add_argument("--csv", help="raw_invoices CSV (iso-8859-1, headered)")
    run.add_argument("--out", default="./retail_output", help="output directory")
    args = parser.parse_args(argv)

    from data_pipeline_4_online_retail_spark.pipeline import run_retail_pipeline
    from data_pipeline_4_online_retail_spark.plans.retail import MODELS
    from data_pipeline_4_online_retail_spark.session import get_spark
    from data_pipeline_4_online_retail_spark.sources.country_seed import (
        build_country_seed,
    )
    from data_pipeline_4_online_retail_spark.sources.io import read_csv
    from data_pipeline_4_online_retail_spark.sources.schemas import RAW_INVOICES

    spark = get_spark("retail-pipeline-cli")

    raw_loader = None
    country_loader = None
    if args.csv:
        csv_path = args.csv

        def raw_loader(s):  # noqa: F811
            return read_csv(s, csv_path, RAW_INVOICES)

        # real-data mode pairs the CSV with the full 239-row ISO seed (the
        # reference's country table); fixture mode keeps the small fixture
        # lookup its oracles inline
        country_loader = build_country_seed

    cat = run_retail_pipeline(
        spark, raw_loader=raw_loader, country_loader=country_loader
    )

    os.makedirs(args.out, exist_ok=True)
    for name, _ in MODELS:
        cat.table(name).write.mode("overwrite").parquet(
            os.path.join(args.out, name)
        )
    for report in (
        "report_customer_invoices",
        "report_product_invoices",
        "report_year_invoices",
    ):
        print(f"== {report} ==")
        cat.table(report).show(20, truncate=False)
    print(f"tables written to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
