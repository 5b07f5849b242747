"""Declared schemas for every table the engine touches.

The reference validates schemas *after* load with Soda contracts
(include/soda/checks/sources/raw_invoices.yml:2-12 etc.); we go schema-first:
explicit StructTypes at read time, plus the same post-conditions as quality
checks (quality/checks.py).

Types follow SURVEY.md §1.2 — notably CustomerID is DOUBLE (CSV nulls made
pandas/BQ infer float; surrogate keys hash its '17850.0' string rendering)
and InvoiceDate is a pre-formatted STRING.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-parity tables
# ---------------------------------------------------------------------------

RAW_INVOICES = T.StructType(
    [
        T.StructField("InvoiceNo", T.StringType(), False),
        T.StructField("StockCode", T.StringType(), True),
        T.StructField("Description", T.StringType(), True),
        T.StructField("Quantity", T.IntegerType(), False),
        T.StructField("InvoiceDate", T.StringType(), True),
        T.StructField("UnitPrice", T.DoubleType(), False),
        T.StructField("CustomerID", T.DoubleType(), True),
        T.StructField("Country", T.StringType(), False),
    ]
)

# Pre-ALTER shape of the country seed (include/table/country.sql:1-9);
# the post-ALTER shape (drop id/name, rename nicename→name) is produced by
# sources/country_seed.py with projection operators.
COUNTRY_SEED_RAW = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("iso", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("nicename", T.StringType(), False),
        T.StructField("iso3", T.StringType(), True),
        T.StructField("numcode", T.IntegerType(), True),
        T.StructField("phonecode", T.IntegerType(), False),
    ]
)

COUNTRY = T.StructType(
    [
        T.StructField("iso", T.StringType(), False),
        T.StructField("iso3", T.StringType(), True),
        T.StructField("numcode", T.IntegerType(), True),
        T.StructField("phonecode", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver test tables (/root/testdata/sf*/; FIXTURES.md §B)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
