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


def test_code_tokenizer_jvm_plan_has_no_python(spark):
    """mode='code_jvm' (the no-Python-workers twin, r8) must be a pure-JVM
    expression: no ArrowEvalPython / BatchEvalPython node in its plan."""
    df = spark.createDataFrame([{"text": "def f(x): return x + 1"}])
    plan = tokenize(df, mode="code_jvm")._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_code_tokenizer_jvm_matches_python_twin(spark):
    """The JVM expression and the Arrow twin must be token-identical on an
    adversarial corpus: ASCII code shapes, unicode digits (Python's bare \\d
    would have matched them — the ASCII-class pattern must not), digit-LIKE
    chars ('²' is isdigit() but not [0-9]), unicode whitespace (NBSP is NOT
    a separator under ASCII \\s in any of the three engines), accents,
    nulls, empties, and 200 seeded random strings."""
    import random

    cases = [
        "def foo_bar(x1, y):\n  return x1 + 42",
        "x += 3.14; y = .5 + 2.",
        "CamelCase snake_case _under __dunder__ A1B2",
        "nombre_de_cafés = 3",        # accented identifier char
        "٣٤ apples",             # Arabic-Indic digits ٣٤
        "area² = side²",         # '²' — isdigit() true, [0-9] false
        "a b",                        # NBSP — token char under ASCII \s
        "ab",                        # \v — Java/Python-ASCII whitespace
        "İstanbul Iı",           # Turkish dotted/dotless I
        "emoji \U0001f600 in code // why",
        "line1\r\nline2\ttab",
        "", "   ", None,
    ]
    rng = random.Random(8)
    pool = "abcXYZ_ 0123456789.+-*/(){}[];:#\"'\\\n\té²٣"
    cases += ["".join(rng.choice(pool) for _ in range(rng.randint(0, 60)))
              for _ in range(200)]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(cases)],
                               "i long, text string")
    jvm = {r["i"]: r["tokens"] for r in tokenize(df, mode="code_jvm").collect()}
    pyt = {r["i"]: r["tokens"] for r in tokenize(df, mode="code").collect()}
    for i, text in enumerate(cases):
        assert jvm[i] == pyt[i], f"case {i}: {text!r} -> {jvm[i]} vs {pyt[i]}"


def test_sha256_invariant(spark, docs_df):
    """content sha256 equality per row must survive the pipeline
    (BASELINE.json input_hint)."""
    out = tokenize(docs_df, text_col="content", mode="simple").withColumn(
        "sha_now", F.sha2(F.col("content"), 256)
    )
    assert out.filter(F.col("sha_now") != F.col("content_sha256")).count() == 0


def test_reference_lemma_table_mode(spark):
    """P5 plug-point with a frozen token→lemma lookup (the spaCy stand-in):
    irregulars map through the table (cased via the lowercase fallback),
    OOV tokens pass through, pipeline position identical to the other
    lemma modes (filter → lemma → join → lowercase)."""
    got = _toks(spark, "The Children went running ;; towards zz9", "reference_lemma_table")
    # 'The' stopword, ';;' punct, 'zz9' digit-filtered; Children→child,
    # went→go, running→run; 'towards' OOV passes through
    assert got == ["child", "go", "run", "towards"]

    # caller-supplied table overrides the fixture
    from fusion_spark.tokenize import tokenize as tk

    df = spark.createDataFrame([("corpora docs",)], "text string")
    out = tk(df, mode="reference_lemma_table", lemma_table={"corpora": "corpus"})
    assert out.collect()[0]["tokens"] == ["corpus", "docs"]


def test_lemma_table_agreement_vs_porter(spark, docs_df):
    """Quantify the table mode against the other plug-point stand-ins on
    the fixture corpus (the r3 verdict's P5 documentation pattern): on a
    synthetic-technical corpus with few irregular forms the table mode
    stays near-identity, so agreement vs identity must be ≥ porter's."""
    modes = {}
    for m in ("reference", "reference_porter", "reference_lemma_table"):
        toks = tokenize(docs_df, text_col="content", mode=m)
        rows = toks.select("doc_id", F.posexplode("tokens").alias("p", "t")).collect()
        modes[m] = {(r["doc_id"], r["p"]): r["t"] for r in rows}
    keys = set(modes["reference"]) & set(modes["reference_lemma_table"])
    assert keys
    agree_table = sum(
        modes["reference"][k] == modes["reference_lemma_table"][k] for k in keys
    ) / len(keys)
    keys_p = set(modes["reference"]) & set(modes["reference_porter"])
    agree_porter = sum(
        modes["reference"][k] == modes["reference_porter"][k] for k in keys_p
    ) / len(keys_p)
    assert agree_table >= agree_porter
