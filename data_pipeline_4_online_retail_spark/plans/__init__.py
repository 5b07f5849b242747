"""Query plans.

- ``registry``  Query objects: (name, Spark builder, DuckDB oracle SQL) —
                the driver-checked surface, one entry per SURVEY.md §2
                operator + extensions
- ``star``      the reference's star-schema semantics re-expressed over the
                driver's TPC-H-ish tables
- ``retail``    literal reference parity: raw_invoices/country →
                dims → fact → reports (tested against fixtures)
"""

from data_pipeline_4_online_retail_spark.plans.registry import (
    Query,
    REGISTRY,
    register,
)

__all__ = ["Query", "REGISTRY", "register"]
