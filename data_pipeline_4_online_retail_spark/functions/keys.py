"""Surrogate-key generation.

Replicates the public dbt-utils 1.1.1 ``generate_surrogate_key`` macro the
reference pins (reference include/dbt/packages.yml:2-3) and applies 7 times
across its models (e.g. include/dbt/models/transform/dim_customer.sql:3,
fct_invoice_line_value.sql:3-5):

    md5( concat_ws('-',
         coalesce(cast(col1 as string), '_dbt_utils_surrogate_key_null_'),
         ...) )

Kept as a pure built-in Column expression (md5/concat_ws/coalesce/cast) so
Catalyst folds it into whole-stage codegen — at 100 TB this runs per-row in
the scan stage with zero Python round-trips.

Correctness notes (SURVEY.md §2.4):
- numeric columns participate via their *string rendering*; a DOUBLE id
  17850.0 renders '17850.0' (BigQuery and Spark agree),
- NULLs map to the literal sentinel, so NULL Description still contributes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "_dbt_utils_surrogate_key_null_"


def surrogate_key(*cols: str | Column) -> Column:
    """md5 hex digest over '-'-joined, null-sentineled string casts."""
    parts = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"),
            F.lit(NULL_SENTINEL),
        )
        for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def surrogate_key_sql(*cols: str) -> str:
    """The same expression as ANSI SQL (DuckDB-compatible) — used to keep
    Spark queries and their oracle SQL hash-identical."""
    parts = ", ".join(
        f"coalesce(cast({c} as varchar), '{NULL_SENTINEL}')" for c in cols
    )
    return f"md5(concat_ws('-', {parts}))"
