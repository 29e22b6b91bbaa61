"""Rank+score identity of the Spark BM25/TFIDF/Atire engine vs the vendored
pure-Python oracle (reference semantics, SURVEY.md §5 item 1)."""

from collections import defaultdict

import pytest

from fusion_spark import oracle
from fusion_spark.indexing import build_index
from fusion_spark.scoring import extract_negatives, search
from fusion_spark.metrics import explode_qrels


def _collect_ranked(df):
    got = defaultdict(list)
    for r in df.orderBy("qid", "rank").collect():
        got[r["qid"]].append((r["doc_id"], r["score"]))
    return got


def _assert_identical(got, expected, tol=1e-9):
    assert set(got) == set(expected)
    for qid in expected:
        g, e = got[qid], expected[qid]
        assert [d for d, _ in g] == [d for d, _ in e], f"rank mismatch qid={qid}: {g[:5]} vs {e[:5]}"
        for (_, a), (_, b) in zip(g, e):
            assert a == pytest.approx(b, abs=tol)


@pytest.mark.parametrize(
    "variant,k1,b",
    [("bm25", 2.5, 0.2), ("bm25", 1.5, 0.75), ("bm25", 0.9, 0.4), ("atire", 1.5, 0.75), ("tfidf", 0, 0)],
)
def test_rank_score_identity(spark, docs_df, queries_df, corpus_rows, query_rows, variant, k1, b):
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content", variant=variant)
    res = search(idx, queries_df, k=15, k1=k1, b=b, zero_tail=True)
    o = oracle.OracleIndex({r["doc_id"]: r["content"] for r in corpus_rows}, variant=variant)
    exp = o.search_all({q["qid"]: q["question"] for q in query_rows}, top_k=15, k1=k1, b=b)
    _assert_identical(_collect_ranked(res), exp)


def test_sparse_topk_matches_zero_tail_on_matching_prefix(spark, docs_df, queries_df):
    """The scale path (no zero tail) must agree with the exhaustive ranking
    wherever scores are nonzero."""
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    k = 10
    sparse = _collect_ranked(search(idx, queries_df, k=k, k1=2.5, b=0.2, zero_tail=False))
    full = _collect_ranked(search(idx, queries_df, k=k, k1=2.5, b=0.2, zero_tail=True))
    for qid, exp in full.items():
        got = sparse.get(qid, [])
        nonzero_prefix = [(d, s) for d, s in exp if s > 0][:k]
        pos_prefix = got[: len(nonzero_prefix)]
        assert pos_prefix == nonzero_prefix


def test_no_match_query_zero_tail_orders_by_doc_id(spark, docs_df, queries_df):
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    res = search(idx, queries_df.filter("qid = 4"), k=5, zero_tail=True)
    rows = res.orderBy("rank").collect()
    assert [r["doc_id"] for r in rows] == [0, 1, 2, 3, 4]
    assert all(r["score"] == 0.0 for r in rows)


def test_duplicate_query_terms_double_contribution(spark, docs_df, corpus_rows):
    """bm25.py:151 — each duplicate occurrence contributes its own partial."""
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    q1 = spark.createDataFrame([{"qid": 1, "question": "def"}])
    q2 = spark.createDataFrame([{"qid": 1, "question": "def def"}])
    s1 = {r["doc_id"]: r["score"] for r in search(idx, q1, k=64, zero_tail=True).collect()}
    s2 = {r["doc_id"]: r["score"] for r in search(idx, q2, k=64, zero_tail=True).collect()}
    for d in s1:
        assert s2[d] == pytest.approx(2 * s1[d], abs=1e-12)


def test_negative_idf_allowed(spark, docs_df):
    """BM25 idf has no floor — a term in > half the docs gets idf < 0
    (bm25.py:145-147)."""
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content", variant="bm25")
    neg = idx.termstats.filter("idf < 0").count()
    assert neg > 0  # 'def' et al. are hot by construction


def test_negatives_extraction(spark, docs_df, queries_df, qrel_rows):
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    ranked = search(idx, queries_df, k=20, k1=2.5, b=0.2, zero_tail=True)
    qrels = spark.createDataFrame(qrel_rows)
    gt = explode_qrels(qrels)
    negs = extract_negatives(ranked, gt, num_negatives=5)
    joined = negs.join(gt, ["qid", "doc_id"], "inner")
    assert joined.count() == 0
    counts = {r["qid"]: r["c"] for r in negs.groupBy("qid").count().withColumnRenamed("count", "c").collect()}
    assert all(c <= 5 for c in counts.values())
