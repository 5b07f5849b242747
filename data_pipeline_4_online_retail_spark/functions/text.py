"""Text column expressions for the training-data-pipeline extensions.

All built-ins (regexp/split/hash/aggregate) — these run inside codegen over
100 TB document shards; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalized_text(col: str | Column) -> Column:
    """Lowercase, collapse whitespace, strip non-alphanumerics — the
    canonical form used for fingerprinting and near-dup shingling."""
    c = _c(col)
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def word_tokens(col: str | Column) -> Column:
    """Whitespace tokenization of the normalized text → array<string>.

    ``split`` on a trimmed, whitespace-collapsed string never yields empty
    tokens, which keeps counts consistent with SQL oracles.
    """
    return F.split(normalized_text(col), " ")


def token_count(col: str | Column) -> Column:
    """Number of whitespace tokens (0 for empty/blank text)."""
    norm = normalized_text(col)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    )


def char_ngrams(col: str | Column, n: int = 5) -> Column:
    """Character n-gram shingles over normalized text → array<string>.

    Built with ``sequence`` + ``transform`` (codegen-friendly); empty/short
    docs yield an empty array.
    """
    norm = normalized_text(col)
    length = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(length - F.lit(n - 1), F.lit(0)))
    return F.when(length < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: norm.substr(i, F.lit(n)))
    )


def rolling_fingerprint(col: str | Column) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    normalized text. Collision-safe enough for exact-dup detection at
    document granularity; pair with full-text compare to confirm."""
    return F.xxhash64(normalized_text(col))
