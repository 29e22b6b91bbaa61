"""Tokenizer modes + sha256 invariant (input_hint contract)."""

from pyspark.sql import functions as F

from fusion_spark.tokenize import tokenize


def _toks(spark, text, mode):
    df = spark.createDataFrame([{"text": text}])
    return tokenize(df, mode=mode).collect()[0]["tokens"]


def test_simple_whitespace_lower(spark):
    assert _toks(spark, "  Foo\tBAR  baz\nfoo ", "simple") == ["foo", "bar", "baz", "foo"]


def test_simple_empty_and_whitespace(spark):
    assert _toks(spark, "", "simple") == []
    assert _toks(spark, "   \t ", "simple") == []


def test_reference_digit_filter(spark):
    # preprocessor.py:65 — any token containing a digit is dropped
    assert _toks(spark, "return x42 v1alpha clean", "reference") == ["return", "clean"]


def test_reference_punct_and_stopword_filter(spark):
    got = _toks(spark, "the Quick ;; fox !", "reference")
    assert got == ["quick", "fox"]  # 'the' stopword, ';;'/'!' punct, lowercased after


def test_code_tokenizer(spark):
    got = _toks(spark, "def foo_bar(x1, y):\n  return x1 + 42", "code")
    assert "foo_bar" in got and "def" in got and "(" in got and "+" in got
    assert "42" not in got  # numeric literals dropped by default


def test_sha256_invariant(spark, docs_df):
    """content sha256 equality per row must survive the pipeline
    (BASELINE.json input_hint)."""
    out = tokenize(docs_df, text_col="content", mode="simple").withColumn(
        "sha_now", F.sha2(F.col("content"), 256)
    )
    assert out.filter(F.col("sha_now") != F.col("content_sha256")).count() == 0
