"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (revenue-by-country top-10, the
report_customer_invoices.sql analogue) at sf0.001. ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2 plus
the training-data-pipeline extensions; the driver hash-compares each against
DuckDB at sf0.01.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_pipeline_4_online_retail_spark.plans import registry as _registry

# Importing these modules populates the registry.
from data_pipeline_4_online_retail_spark.plans import star as _star  # noqa: E402
from data_pipeline_4_online_retail_spark.plans.registry import REGISTRY, Query  # noqa: E402

for _name, (_fn, _sql) in _star.STAR_QUERIES.items():
    REGISTRY.setdefault(_name, Query(name=_name, build=_fn, oracle=_sql))

# Operator micro-queries + extensions (each module self-registers).
import data_pipeline_4_online_retail_spark.operators.relational  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.dedup  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.similarity  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.text_analysis  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.events_windows  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.multimodal  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.scalar_functions  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.operators.skew  # noqa: E402,F401
import data_pipeline_4_online_retail_spark.plans.retail_oracle  # noqa: E402,F401


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    fn = REGISTRY["star_report_customer"].build
    return fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()
