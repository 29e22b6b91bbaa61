"""Deterministic synthetic fixtures (seed=42) per FIXTURES.md.

Generates the input_hint-shaped source-code corpus
(repo, path, commit, lang, content [, doc_id, content_sha256]) with Zipfian
hot tokens (exercises skew handling), plus queries with the reference's edge
cases (duplicate tokens, OOV, digit tokens, no-match query), qrels, and
multi-system score lists for fusion tests. Pure-Python → used both to drive
Spark (via createDataFrame) and the pure-Python oracle.
"""

from __future__ import annotations

import hashlib
import random

# Zipf-ish code vocabulary: earlier = hotter (sampled with weight 1/rank).
CODE_VOCAB = (
    "def return import self if else for in not None class from while try except "
    "print len range dict list set str int float lambda yield with as pass break "
    "assert raise global del elif finally is and or true false null void public "
    "static final new this super extends implements interface package throws func "
    "var let const type struct map chan go defer select case switch match impl fn "
    "mut pub use mod trait enum where async await spawn loop module table column "
    "select insert update delete join group order window partition shuffle branch "
    "commit merge rebase clone fetch push pull tag stash blame bisect revert"
).split()

LANGS = ["python", "java", "scala", "go", "sql"]


def make_corpus(n_docs: int = 64, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    weights = [1.0 / (r + 1) for r in range(len(CODE_VOCAB))]
    rows = []
    for i in range(n_docs):
        repo = f"org{i % 5}/proj{i % 7}"
        path = f"src/module_{i % 11}/file_{i}.py"
        commit = hashlib.sha1(f"commit-{seed}-{i}".encode()).hexdigest()
        lang = LANGS[i % len(LANGS)]
        if i % 17 == 13:
            content = ""  # empty doc
        elif i % 17 == 5:
            content = "   \t  "  # whitespace-only doc
        else:
            ln = rng.randint(5, 60)
            content = " ".join(rng.choices(CODE_VOCAB, weights=weights, k=ln))
        rows.append({"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content})
    # duplicate-token-multiset docs for tie-break tests
    if n_docs >= 8:
        rows[3]["content"] = rows[1]["content"]
        rows[7]["content"] = rows[1]["content"]
    # doc_id = row_number over (repo, path, commit) — deterministic corpus order
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    for i, r in enumerate(rows):
        r["doc_id"] = i
        r["content_sha256"] = hashlib.sha256(r["content"].encode()).hexdigest()
    return rows


def make_queries(n_queries: int = 12, seed: int = 42) -> list[dict]:
    rng = random.Random(seed + 1)
    qs = []
    for q in range(1, n_queries + 1):
        terms = rng.choices(CODE_VOCAB, k=rng.randint(2, 5))
        qs.append({"qid": q, "question": " ".join(terms)})
    # mandated edge cases (FIXTURES.md §2)
    qs[0]["question"] = "def def return"  # duplicate tokens (bm25.py:151)
    qs[1]["question"] = "zzzunknownzzz import"  # OOV term
    qs[2]["question"] = "return x42 v1alpha"  # digit tokens (preprocessor regex)
    qs[3]["question"] = "qqq www eee"  # matches nothing → zero scores
    return qs


def make_qrels(corpus_rows: list[dict], queries: list[dict], seed: int = 42) -> list[dict]:
    rng = random.Random(seed + 2)
    n = len(corpus_rows)
    return [
        {"qid": q["qid"], "article_ids": sorted(rng.sample(range(n), k=rng.randint(1, min(8, n))))}
        for q in queries
    ]


def make_score_lists(
    queries: list[dict],
    n_docs: int,
    systems: tuple[str, ...] = ("bm25", "dense", "sparse"),
    list_len: int = 20,
    seed: int = 42,
) -> list[dict]:
    """(system, qid, doc_id, score, rank) rows with degenerate groups:
    one all-equal-score group per system (min-max→ones / z-score→zeros
    branches, hybrid.py:257,263) and exact in-list ties."""
    rng = random.Random(seed + 3)
    rows = []
    for system in systems:
        for q in queries:
            qid = q["qid"]
            docs = rng.sample(range(n_docs), k=min(list_len, n_docs))
            if qid == 1:
                scores = [5.0] * len(docs)  # degenerate: all equal
            else:
                scores = sorted((round(rng.uniform(0.1, 30.0), 4) for _ in docs), reverse=True)
                if len(scores) > 3:
                    scores[2] = scores[1]  # exact tie inside the list
            pairs = sorted(zip(docs, scores), key=lambda x: -x[1])
            for r, (d, s) in enumerate(pairs, start=1):
                rows.append({"system": system, "qid": qid, "doc_id": d, "score": float(s), "rank": r})
    return rows
