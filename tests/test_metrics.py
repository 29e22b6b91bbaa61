"""Spark metrics vs the oracle's reference-convention implementations."""

import pytest

from fusion_spark import oracle
from fusion_spark.indexing import build_index
from fusion_spark.metrics import compute_all_metrics
from fusion_spark.scoring import search

KW = dict(recall_k=(5, 10, 20), map_k=(10,), mrr_k=(10,), ndcg_k=(10,))


def test_metrics_match_oracle(spark, docs_df, queries_df, corpus_rows, query_rows, qrel_rows):
    idx = build_index(docs_df, doc_id_col="doc_id", text_col="content")
    preds = search(idx, queries_df, k=20, k1=2.5, b=0.2, zero_tail=True)
    qrels = spark.createDataFrame(qrel_rows)
    got = compute_all_metrics(preds.select("qid", "doc_id", "rank"), qrels, **KW)

    o = oracle.OracleIndex({r["doc_id"]: r["content"] for r in corpus_rows})
    ranked = o.search_all({q["qid"]: q["question"] for q in query_rows}, top_k=20, k1=2.5, b=0.2)
    all_gt = [next(r["article_ids"] for r in qrel_rows if r["qid"] == q["qid"]) for q in query_rows]
    all_preds = [[d for d, _ in ranked[q["qid"]]] for q in query_rows]
    exp = oracle.compute_all_metrics(
        all_gt, all_preds, recall_k=(5, 10, 20), map_k=(10,), mrr_k=(10,), ndcg_k=(10,)
    )
    assert set(got) == set(exp)
    for m in exp:
        assert got[m] == pytest.approx(exp[m], abs=1e-9), m


def test_metrics_handcomputed(spark):
    # gt = {1,2,3}; preds ranked [2, 9, 1, 8] → hits at ranks 1 and 3
    preds = spark.createDataFrame(
        [{"qid": 1, "doc_id": d, "rank": r} for r, d in enumerate([2, 9, 1, 8], start=1)]
    )
    qrels = spark.createDataFrame([{"qid": 1, "article_ids": [1, 2, 3]}])
    got = compute_all_metrics(preds, qrels, recall_k=(2, 4), map_k=(4,), mrr_k=(4,), ndcg_k=(4,))
    assert got["recall@2"] == pytest.approx(1 / 3)
    assert got["recall@4"] == pytest.approx(2 / 3)
    assert got["mrr@4"] == pytest.approx(1.0)
    assert got["map@4"] == pytest.approx((1 / 1 + 2 / 3) / 3)
    # reference ndcg: hit rank1 → 1; hit rank3 → 1/log2(3); idcg = 1 + 1/log2(2) + 1/log2(3)
    import math

    dcg = 1 + 1 / math.log2(3)
    idcg = 1 + 1 / math.log2(2) + 1 / math.log2(3)
    assert got["ndcg@4"] == pytest.approx(dcg / idcg)
    assert got["r-precision"] == pytest.approx(2 / 3)  # top-3 has hits {2, 1}


def test_precision_at_k_handcomputed(spark):
    # gt = {1,2,3}; preds ranked [2, 9, 1, 8] → hits at ranks 1 and 3
    preds = spark.createDataFrame(
        [{"qid": 1, "doc_id": d, "rank": r} for r, d in enumerate([2, 9, 1, 8], start=1)]
    )
    qrels = spark.createDataFrame([{"qid": 1, "article_ids": [1, 2, 3]}])
    got = compute_all_metrics(
        preds, qrels, recall_k=(), map_k=(), mrr_k=(), ndcg_k=(), precision_k=(2, 4, 10)
    )
    assert got["precision@2"] == pytest.approx(1 / 2)
    assert got["precision@4"] == pytest.approx(2 / 4)
    # reference denominator is len(results[:k]) = min(k, |results|) = 4
    assert got["precision@10"] == pytest.approx(2 / 4)


def test_precision_at_k_no_preds_query(spark):
    preds = spark.createDataFrame([{"qid": 1, "doc_id": 1, "rank": 1}])
    qrels = spark.createDataFrame([{"qid": 1, "article_ids": [1]}, {"qid": 2, "article_ids": [5]}])
    from fusion_spark.metrics import metrics_per_query

    rows = {
        r["qid"]: r
        for r in metrics_per_query(
            preds, qrels, recall_k=(), map_k=(), mrr_k=(), ndcg_k=(), precision_k=(5,)
        ).collect()
    }
    assert rows[1]["precision@5"] == pytest.approx(1.0)  # 1 hit / min(5, 1 pred)
    assert rows[2]["precision@5"] == 0.0  # zero predictions → 0
