"""Unit coverage for the general-purpose text expression library
(functions/text.py) — the normalizing tokenizers behind the operator tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipeline_4_online_retail_spark.functions.text import (
    char_ngrams,
    normalized_text,
    rolling_fingerprint,
    token_count,
    word_tokens,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).head()["v"]


def test_normalized_text(spark):
    assert (
        _one(spark, "  Hello,   WORLD!! 123 ", normalized_text("text"))
        == "hello world 123"
    )
    assert _one(spark, "???", normalized_text("text")) == ""


def test_token_count_handles_blank(spark):
    assert _one(spark, "one two  three", token_count("text")) == 3
    assert _one(spark, "   ", token_count("text")) == 0
    assert _one(spark, "", token_count("text")) == 0


def test_word_tokens_no_empty_tokens(spark):
    toks = _one(spark, "A  b,,c", word_tokens("text"))
    assert toks == ["a", "b", "c"]


def test_char_ngrams(spark):
    grams = _one(spark, "abcdef", char_ngrams("text", n=3))
    assert grams == ["abc", "bcd", "cde", "def"]
    assert _one(spark, "ab", char_ngrams("text", n=3)) == []


def test_rolling_fingerprint_deterministic_and_normalizing(spark):
    a = _one(spark, "Hello World", rolling_fingerprint("text"))
    b = _one(spark, "  hello   world ", rolling_fingerprint("text"))
    c = _one(spark, "hello worlds", rolling_fingerprint("text"))
    assert a == b  # normalization-invariant
    assert a != c
