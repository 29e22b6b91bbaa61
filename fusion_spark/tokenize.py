"""Tokenization — the only text→terms boundary the index and scorer ever see.

Reference semantics (cited into /root/reference/):
  * the index/scorer tokenizer is plain whitespace ``str.split()``
    (``src/retrievers/bm25.py:55,63,112,143,151``);
  * optional preprocessing runs BEFORE it (``src/data/preprocessor.py:41-76``):
    drop punctuation tokens, drop tokens containing any digit
    (``re.match('.*\\d+', ...)``, ``preprocessor.py:65``), drop stopwords,
    lemmatize, then join and lowercase **after** lemmatization
    (``preprocessor.py:73-76``).

Spark design: tokenization must be vectorized (no per-row Python UDFs —
BASELINE.json input_hint). Three modes:

  * ``simple``   — pure JVM expressions (`lower` + regex split); zero Python.
  * ``reference``— Arrow `pandas_udf` replicating preprocessor.py filters with
                   a deterministic identity lemmatizer (spaCy is out of scope:
                   it is a neural/dict model, not public-data-free; the filter
                   pipeline and ordering are replicated exactly).
  * ``reference_stem`` — same pipeline with Harman's S-stemmer (1991) at the
                   lemma plug-point. DOCUMENTED PARITY DELTA: the actual
                   reference lemmatizes with a spaCy language model
                   (preprocessor.py:69-72), so this mode is NOT
                   rank-identical to the true reference on natural-language
                   corpora — it exists so the lemmatize stage is a real,
                   deterministic, dictionary-free transform rather than the
                   identity, with the exact same pipeline position.
  * ``code``     — Arrow `pandas_udf` for source code: identifier / number /
                   operator tokens, for the Iceberg source-code corpus shape.

All modes return ``array<string>`` so downstream plans are identical.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Deterministic stopword set for `reference` mode (stands in for spaCy's
# language-model stopword list, which is not reproducible from public data
# alone; the *mechanism* — set-membership drop before lemmatize/join —
# matches preprocessor.py:67-68).
DEFAULT_STOPWORDS = frozenset(
    """a an and are as at be by for from has he in is it its of on or that the
    to was were will with le la les de des du un une et en au aux ce qui que""".split()
)

_PUNCT_RE = re.compile(r"^[^\w\s]+$")  # token made only of punctuation
_DIGIT_RE = re.compile(r".*\d+")  # preprocessor.py:65 — any digit anywhere
_CODE_TOKEN_RE = re.compile(r"[A-Za-z_][A-Za-z0-9_]*|\d+(?:\.\d+)?|[^\sA-Za-z0-9_]")


def simple_tokens(col: Column) -> Column:
    """Whitespace tokens, lowercased — JVM-side only (bm25.py:55 semantics
    composed with the post-join lowercase of preprocessor.py:74-75)."""
    toks = F.split(F.trim(F.lower(col)), r"\s+")
    return F.filter(toks, lambda t: t != F.lit(""))


def s_stem(tok: str) -> str:
    """Harman (1991) S-stemmer: three ordered plural-stripping rules —
    ies→y (not eies/aies), es→e (not aes/ees/oes), s→∅ (not us/ss); tokens
    shorter than 4 chars pass through. Deterministic and dictionary-free."""
    if len(tok) < 4:
        return tok
    if tok.endswith("ies") and not tok.endswith(("eies", "aies")):
        return tok[:-3] + "y"
    if tok.endswith("es") and not tok.endswith(("aes", "ees", "oes")):
        return tok[:-1]
    if tok.endswith("s") and not tok.endswith(("us", "ss")):
        return tok[:-1]
    return tok


def _reference_preprocess_one(text: str, stopwords: frozenset, stem: bool = False) -> list[str]:
    # Order matters and mirrors preprocessor.py:61-76: filter on the raw
    # (pre-lowercase) token, lemmatize (identity or S-stem), join, lowercase,
    # then the final whitespace split the index sees (bm25.py:55).
    kept = []
    for tok in text.split():
        if _PUNCT_RE.match(tok):
            continue
        if _DIGIT_RE.match(tok):
            continue
        if tok.lower() in stopwords:
            continue
        kept.append(s_stem(tok) if stem else tok)
    return " ".join(kept).lower().split()


def make_reference_tokenizer(stopwords: frozenset = DEFAULT_STOPWORDS, stem: bool = False):
    @F.pandas_udf(ArrayType(StringType()))
    def reference_tokens(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(lambda t: _reference_preprocess_one(t, stopwords, stem))

    return reference_tokens


def make_code_tokenizer(drop_numbers: bool = True, lowercase: bool = True):
    """Tokenizer for source code: identifiers, numeric literals, single
    operator/punct chars. Vectorized over Arrow batches."""

    @F.pandas_udf(ArrayType(StringType()))
    def code_tokens(texts: pd.Series) -> pd.Series:
        def tok(t: str) -> list[str]:
            out = _CODE_TOKEN_RE.findall(t)
            if drop_numbers:
                out = [x for x in out if not x[0].isdigit()]
            if lowercase:
                out = [x.lower() for x in out]
            return out

        return texts.fillna("").map(tok)

    return code_tokens


def tokenize(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tokens",
    mode: str = "simple",
    stopwords: frozenset = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Append an ``array<string>`` token column. ``simple`` stays entirely in
    whole-stage codegen; the other modes are Arrow-batched pandas UDFs."""
    col = F.col(text_col)
    if mode == "simple":
        tok = simple_tokens(col)
    elif mode == "reference":
        tok = make_reference_tokenizer(stopwords)(col)
    elif mode == "reference_stem":
        tok = make_reference_tokenizer(stopwords, stem=True)(col)
    elif mode == "code":
        tok = make_code_tokenizer()(col)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return df.withColumn(out_col, tok)
