"""Deterministic reference-semantics fixtures (FIXTURES.md §A).

A synthetic ``raw_invoices`` + ``country`` pair engineered to hit every
edge the reference pipeline handles:

- NULL CustomerID rows (≈25% in the real data, README.md:39) → driven
  through the implicit inner-join drop (SURVEY.md §2.3 J2),
- cancellations: ``C``-prefixed InvoiceNo with negative Quantity
  (README.md:45; filtered by fct_invoice_line_value.sql:9),
- zero / negative UnitPrice (filtered by dim_product.sql:8),
- NULL Description (participates in product_key via the null sentinel),
- NULL StockCode (filtered by dim_product.sql:7),
- per-invoice timestamp skew — lines 1 minute apart, canonicalized to the
  per-invoice max (dags/online_retail.py:46; README.md:159),
- an unparseable InvoiceDate (→ NULL via the coerce path),
- a Country with no match in the country lookup (NULL iso from the LEFT
  JOIN, dim_customer.sql:12-13),
- one CustomerID appearing under two countries (composite-key rationale,
  README.md:86).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from data_pipeline_4_online_retail_spark.sources.schemas import RAW_INVOICES

# (InvoiceNo, StockCode, Description, Quantity, InvoiceDate, UnitPrice,
#  CustomerID, Country)
RAW_INVOICE_ROWS = [
    # -- plain UK invoice, two lines, same timestamp -----------------------
    ("536365", "85123A", "WHITE HANGING HEART", 6, "12/01/2010 08:26 AM", 2.55, 17850.0, "United Kingdom"),
    ("536365", "71053", "WHITE METAL LANTERN", 6, "12/01/2010 08:26 AM", 3.39, 17850.0, "United Kingdom"),
    # -- timestamp-skew invoice: second line 1 minute later → both lines
    #    canonicalize to 08:35 AM (the 43-invoice case) --------------------
    ("536366", "84406B", "CREAM CUPID HEARTS", 8, "12/01/2010 08:34 AM", 2.75, 17850.0, "United Kingdom"),
    ("536366", "84406G", "GREEN CUPID HEARTS", 2, "12/01/2010 08:35 AM", 2.75, 17850.0, "United Kingdom"),
    # -- NULL CustomerID: lines survive to the fact CTE but die at the
    #    dim_invoice inner join (J2/J5 implicit drop) ----------------------
    ("536367", "22745", "POPPY'S PLAYHOUSE", 6, "12/01/2010 09:00 AM", 2.10, None, "United Kingdom"),
    # -- cancellation: negative quantity, excluded by Quantity > 0 ---------
    ("C536368", "22960", "JAM MAKING SET", -6, "12/01/2010 09:41 AM", 4.25, 13047.0, "United Kingdom"),
    # -- zero / negative price: line dropped from dim_product and thus from
    #    the fact (J4 implicit drop) — quantity still > 0 ------------------
    ("536369", "BANK", "Adjust bad debt", 1, "12/01/2010 10:00 AM", 0.0, 13047.0, "United Kingdom"),
    ("536369", "B", "Adjust bad debt", 1, "12/01/2010 10:00 AM", -11.62, 13047.0, "United Kingdom"),
    # -- NULL Description: product_key uses the null sentinel --------------
    ("536370", "22728", None, 24, "12/01/2010 10:30 AM", 3.75, 12583.0, "France"),
    ("536370", "22727", "ALARM CLOCK RED", 24, "12/01/2010 10:30 AM", 3.75, 12583.0, "France"),
    # -- NULL StockCode: dropped from dim_product (P3) ---------------------
    ("536371", None, "MYSTERY ITEM", 3, "12/01/2010 11:00 AM", 1.00, 12583.0, "France"),
    # -- unparseable date → NULL datetime (F1 coerce path); also dropped at
    #    the dim_datetime join because its date_key never materializes...
    #    (the NULL-date key joins to nothing since dim_datetime filters
    #    InvoiceDate IS NOT NULL) -----------------------------------------
    ("536372", "21730", "GLASS STAR FROSTED", 6, "not a date", 4.25, 17850.0, "United Kingdom"),
    # -- same customer id under a second country (composite key) -----------
    ("536373", "84879", "ASSORTED COLOUR BIRD", 16, "12/02/2010 09:00 AM", 1.69, 12583.0, "Germany"),
    # -- country with no lookup match → NULL iso ---------------------------
    ("536374", "84880", "BLUE BIRD ORNAMENT", 4, "12/02/2010 09:30 AM", 2.10, 14688.0, "Narnia"),
    # -- duplicate full line: DISTINCT collapses it in dims; the fact keeps
    #    both rows (reference fact has no dedup) ---------------------------
    ("536375", "85123A", "WHITE HANGING HEART", 6, "12/02/2010 10:00 AM", 2.55, 15311.0, "EIRE"),
    ("536375", "85123A", "WHITE HANGING HEART", 6, "12/02/2010 10:00 AM", 2.55, 15311.0, "EIRE"),
]

# Post-ALTER country shape: (iso, iso3, numcode, phonecode, name)
COUNTRY_FIXTURE_ROWS = [
    ("GB", "GBR", 826, 44, "United Kingdom"),
    ("FR", "FRA", 250, 33, "France"),
    ("DE", "DEU", 276, 49, "Germany"),
    ("IE", "IRL", 372, 353, "EIRE"),  # the dataset uses 'EIRE' as the name
    ("ES", "ESP", 724, 34, "Spain"),  # matched by no fixture customer
    ("AQ", None, None, 672, "Antarctica"),  # NULL iso3/numcode branch
]


def raw_invoices_fixture(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(RAW_INVOICE_ROWS, RAW_INVOICES)


def country_fixture(spark: SparkSession) -> DataFrame:
    from data_pipeline_4_online_retail_spark.sources.schemas import COUNTRY

    return spark.createDataFrame(COUNTRY_FIXTURE_ROWS, COUNTRY)
