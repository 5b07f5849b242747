"""Column-expression library — the engine's scalar-function surface.

Everything here is built from ``pyspark.sql.functions`` built-ins so the
expressions stay inside whole-stage codegen (no Python in the hot path).
"""

from data_pipeline_4_online_retail_spark.functions.keys import surrogate_key
from data_pipeline_4_online_retail_spark.functions.datetime import (
    parse_invoice_datetime,
    format_invoice_datetime,
    datetime_parts,
)
from data_pipeline_4_online_retail_spark.functions.text import (
    normalized_text,
    token_count,
    word_tokens,
    char_ngrams,
    rolling_fingerprint,
)
from data_pipeline_4_online_retail_spark.functions.vector import (
    dot_product,
    l2_norm,
    cosine_similarity,
)

__all__ = [
    "surrogate_key",
    "parse_invoice_datetime",
    "format_invoice_datetime",
    "datetime_parts",
    "normalized_text",
    "token_count",
    "word_tokens",
    "char_ngrams",
    "rolling_fingerprint",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
