"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline (adedamola26/data-pipeline-4-online-retail).

The reference is an Airflow + dbt + BigQuery + Soda batch ELT pipeline that
builds a Kimball star schema (4 dims + 1 fact + 3 reports) over the UCI
"Online Retail" dataset. This package re-expresses every operator it
executes — and a tier of large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal, streaming) — as
idiomatic PySpark DataFrame/SQL, designed for 100 TB scale:

- declarative plans (Catalyst does pushdown/pruning/join-reorder/AQE),
- built-in column expressions in the hot path (whole-stage codegen),
- broadcast joins for small dimensions, explicit shuffle hygiene,
- Pandas UDFs (Arrow) only where built-ins can't express the semantics.

Layout
------
- ``session``    SparkSession factory (UTC, ANSI off to match BQ/pandas
                 null-coerce semantics, AQE on)
- ``functions``  scalar/column expression library (surrogate keys, text,
                 vector math)
- ``sources``    schema-first readers, writers, seed tables, fixtures
- ``operators``  relational + extension operators (joins, aggs, dedup,
                 similarity, text analysis, multimodal)
- ``plans``      the reference-parity star-schema models + report queries
- ``streaming``  Structured Streaming surface (windows, watermark, stateful)
- ``quality``    Soda-style data-quality checks + fail-stop gate runner
- ``pipeline``   stage registry with topological execution
"""

__version__ = "0.1.0"
