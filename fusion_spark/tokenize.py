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
  * ``reference_porter`` — same pipeline with the ORIGINAL Porter stemmer
                   (Porter 1980, no NLTK extensions) at the lemma
                   plug-point — the standard public suffix-stripper, so the
                   spaCy delta is QUANTIFIED, not just named. Measured
                   token-level agreement on the 500-doc fixture corpus
                   (12,977 surviving tokens): porter vs s_stem 90.4 %,
                   porter vs identity 88.8 % — i.e. the choice of
                   dictionary-free lemmatizer moves ~10 % of tokens, which
                   bounds how much any such stand-in can matter vs spaCy.
  * ``reference_lemma_table`` — same pipeline with a frozen token→lemma
                   LOOKUP at the plug-point (generate offline from public
                   spaCy output; curated-irregulars fixture shipped) — the
                   closest context-free stand-in for the reference's model
                   lemmatizer, POS-ambiguous lemmas excluded by design.
  * ``code``     — Arrow `pandas_udf` for source code: identifier / number /
                   operator tokens, for the Iceberg source-code corpus
                   shape. MEASURED choice, not a concession (BENCH.md r8
                   A/B at 1.44M docs): CPython's sre runs this 3-branch
                   alternation ~3× faster than java.util.regex
                   (`regexp_extract_all` 20.6 s vs 6.65 s at local[8],
                   equal at local[2]; a replace-then-split JVM variant is
                   3× worse again), so the Arrow batch transfer buys more
                   than JVM residency here.
  * ``code_jvm`` — the PURE-JVM twin (`regexp_extract_all` + `filter` +
                   `transform`; token-identical, property-tested): for
                   deployments that can't ship Python workers, at the
                   measured regex-engine cost.

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
# identifiers / numeric literals / single operator-punct chars. Explicit
# ASCII classes + re.ASCII so the SAME pattern means the same thing in all
# three engines that run it: Python re (unicode \d/\s by default), Java
# regex (ASCII \d/\s by default), and DuckDB RE2 (the oracle) — with bare
# \d/\s the Python path silently tokenized unicode digits/whitespace
# differently from both others.
_CODE_TOKEN_PATTERN = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+(?:\.[0-9]+)?|[^\sA-Za-z0-9_]"
_CODE_TOKEN_RE = re.compile(_CODE_TOKEN_PATTERN, re.ASCII)


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


# --------------------------- Porter stemmer ---------------------------------
# Clean-room implementation of the published algorithm (M.F. Porter, "An
# algorithm for suffix stripping", Program 14(3), 1980) — a third lemma mode
# so the spaCy parity delta can be QUANTIFIED against a standard public
# stemmer rather than only the 3-rule S-stemmer.

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: the number of VC sequences in the C?(VC){m}V? form."""
    seq = [_is_cons(stem, i) for i in range(len(stem))]
    return sum(1 for i in range(1, len(seq)) if seq[i] and not seq[i - 1])


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_cvc(w: str) -> bool:
    return (
        len(w) >= 3
        and _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


def _rule(w: str, suffix: str, repl: str, min_m: int) -> str | None:
    if w.endswith(suffix):
        stem = w[: len(w) - len(suffix)]
        if _measure(stem) > min_m:
            return stem + repl
    return None


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement", "ment",
    "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(w: str) -> str:
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        hit = None
        if w.endswith("ed") and _has_vowel(w[:-2]):
            hit = w = w[:-2]
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            hit = w = w[:-3]
        if hit is not None:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif (
                len(w) >= 2
                and w[-1] == w[-2]
                and _is_cons(w, len(w) - 1)
                and w[-1] not in "lsz"
            ):
                w = w[:-1]
            elif _measure(w) == 1 and _ends_cvc(w):
                w += "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2
    for suf, repl in _STEP2:
        if w.endswith(suf):
            out = _rule(w, suf, repl, 0)
            if out is not None:
                w = out
            break
    # step 3
    for suf, repl in _STEP3:
        if w.endswith(suf):
            out = _rule(w, suf, repl, 0)
            if out is not None:
                w = out
            break
    # step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > 1:
                w = stem
            break
    else:
        if w.endswith("ion") and w[: -3].endswith(("s", "t")) and _measure(w[:-3]) > 1:
            w = w[:-3]
    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            w = stem
    # step 5b
    if len(w) >= 2 and w[-1] == "l" and w[-2] == "l" and _measure(w) > 1:
        w = w[:-1]
    return w


_LEMMATIZERS = {
    "identity": lambda t: t,
    "s_stem": s_stem,
    "porter": lambda t: porter_stem(t.lower()),
}

# Frozen token→lemma lookup fixture for the `table` lemma mode: hand-curated
# unambiguous English irregulars (lemmas a context-free lookup CAN state —
# POS-dependent cases like "better"→good/well or "left"→leave/left are
# deliberately excluded, since a token table cannot disambiguate them; the
# reference's spaCy lemmatizer does, which is exactly the residual delta).
# A production deployment regenerates this table offline from public spaCy
# output over its own corpus vocabulary and passes it via `lemma_table`.
LEMMA_TABLE_EN_SAMPLE: dict[str, str] = {
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "being": "be", "has": "have", "had": "have",
    "having": "have", "does": "do", "did": "do", "done": "do",
    "went": "go", "gone": "go", "going": "go", "said": "say",
    "says": "say", "made": "make", "took": "take", "taken": "take",
    "saw": "see", "seen": "see", "came": "come", "ran": "run",
    "running": "run", "wrote": "write", "written": "write",
    "knew": "know", "known": "know", "thought": "think",
    "brought": "bring", "bought": "buy", "found": "find",
    "gave": "give", "given": "give", "got": "get", "gotten": "get",
    "mice": "mouse", "geese": "goose", "feet": "foot", "teeth": "tooth",
    "children": "child", "men": "man", "women": "woman", "people": "person",
}


def _reference_preprocess_one(
    text: str,
    stopwords: frozenset,
    lemma: str = "identity",
    lemma_table: dict[str, str] | None = None,
) -> list[str]:
    # Order matters and mirrors preprocessor.py:61-76: filter on the raw
    # (pre-lowercase) token, lemmatize (identity / S-stem / Porter at the
    # spaCy plug-point), join, lowercase, then the final whitespace split
    # the index sees (bm25.py:55). Porter assumes lowercase input, so the
    # porter mode lowercases the token before stemming (the pipeline
    # lowercases afterwards anyway, so only the stem rule sees a change).
    if lemma == "table":
        # exact-token first (spaCy tables are cased), lowercase fallback,
        # then pass-through — the plug-point stays total over any vocab
        tbl = lemma_table or {}
        lem = lambda t: tbl.get(t, tbl.get(t.lower(), t))  # noqa: E731
    else:
        lem = _LEMMATIZERS[lemma]
    kept = []
    for tok in text.split():
        if _PUNCT_RE.match(tok):
            continue
        if _DIGIT_RE.match(tok):
            continue
        if tok.lower() in stopwords:
            continue
        kept.append(lem(tok))
    return " ".join(kept).lower().split()


def make_reference_tokenizer(
    stopwords: frozenset = DEFAULT_STOPWORDS,
    stem: bool = False,
    lemma: str | None = None,
    lemma_table: dict[str, str] | None = None,
):
    if lemma is None:
        lemma = "s_stem" if stem else "identity"
    # the table ships inside the UDF closure — pickled once per task, fine
    # for vocabulary-sized tables (≤ a few M entries); it never joins or
    # shuffles corpus-side
    table = dict(lemma_table) if lemma_table else None

    @F.pandas_udf(ArrayType(StringType()))
    def reference_tokens(texts: pd.Series) -> pd.Series:
        return texts.fillna("").map(
            lambda t: _reference_preprocess_one(t, stopwords, lemma, table)
        )

    return reference_tokens


def code_tokens_expr(
    col: Column, drop_numbers: bool = True, lowercase: bool = True
) -> Column:
    """Source-code tokens as a PURE-JVM expression — identifiers, numeric
    literals, single operator/punct chars via `regexp_extract_all`, the
    number drop via `filter` on the first character, the lowercase via
    `transform`. Token-identical to the default ``code`` Arrow mode
    (property-tested) and to the DuckDB oracle — all three run
    `_CODE_TOKEN_PATTERN` with ASCII class semantics.

    NOT the default, by measurement (BENCH.md r8 A/B, 1.44M docs): the
    cost is `regexp_extract_all` itself — java.util.regex runs the
    3-branch alternation ~3× slower than CPython's sre (20.6 s vs 6.65 s
    at local[8]; the filter/transform HOFs add <1 s; a replace-then-split
    reformulation is 3× worse again at 67 s). Use this when executors
    cannot run Python workers; otherwise ``code`` wins throughput."""
    toks = F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(_CODE_TOKEN_PATTERN), F.lit(0)
    )
    if drop_numbers:
        toks = F.filter(toks, lambda t: ~t.substr(1, 1).rlike("[0-9]"))
    if lowercase:
        toks = F.transform(toks, F.lower)
    return toks


def make_code_tokenizer(drop_numbers: bool = True, lowercase: bool = True):
    """The DEFAULT code tokenizer: Arrow-batched `pandas_udf` whose inner
    loop is `re.findall`. Interpreted Python per row, yet 3× faster than
    the JVM `regexp_extract_all` twin on the 1.44M-doc A/B (BENCH.md r8) —
    sre's compiled program beats java.util.regex on this alternation by
    more than the Arrow transfer costs."""

    @F.pandas_udf(ArrayType(StringType()))
    def code_tokens(texts: pd.Series) -> pd.Series:
        def tok(t: str) -> list[str]:
            out = _CODE_TOKEN_RE.findall(t)
            if drop_numbers:
                # '0' <= c <= '9', not str.isdigit(): isdigit() is true for
                # unicode digit-LIKE chars (e.g. '²') the regex never treats
                # as number starts — the JVM/RE2 paths check [0-9]
                out = [x for x in out if not ("0" <= x[0] <= "9")]
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
    lemma_table: dict[str, str] | None = None,
) -> DataFrame:
    """Append an ``array<string>`` token column. ``simple`` stays entirely in
    whole-stage codegen; the other modes are Arrow-batched pandas UDFs.

    ``reference_lemma_table`` runs the reference pipeline with a frozen
    token→lemma LOOKUP at the spaCy plug-point (preprocessor.py:69-72): the
    closest dictionary-free stand-in to the reference's model lemmatizer —
    generate the table offline from public spaCy output over the corpus
    vocabulary and pass it as ``lemma_table`` (defaults to the curated
    irregulars fixture ``LEMMA_TABLE_EN_SAMPLE``). Context-free by design:
    POS-ambiguous lemmas (better→good/well) remain the residual delta."""
    col = F.col(text_col)
    if mode == "simple":
        tok = simple_tokens(col)
    elif mode == "reference":
        tok = make_reference_tokenizer(stopwords)(col)
    elif mode == "reference_stem":
        tok = make_reference_tokenizer(stopwords, stem=True)(col)
    elif mode == "reference_porter":
        tok = make_reference_tokenizer(stopwords, lemma="porter")(col)
    elif mode == "reference_lemma_table":
        tok = make_reference_tokenizer(
            stopwords, lemma="table",
            lemma_table=lemma_table if lemma_table is not None else LEMMA_TABLE_EN_SAMPLE,
        )(col)
    elif mode == "code":
        tok = make_code_tokenizer()(col)  # Arrow sre — measured 3× over JVM
    elif mode == "code_jvm":
        tok = code_tokens_expr(col)  # no-Python-workers twin (slower, r8)
    else:
        raise ValueError(f"unknown tokenizer mode: {mode}")
    return df.withColumn(out_col, tok)
