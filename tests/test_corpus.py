"""Corpus source transforms (S4/T3) + M7 set metrics."""

import pytest
from pyspark.sql import functions as F

from fusion_spark.corpus import assign_doc_ids, explode_qrels_shuffled, title_concat, with_sha256
from fusion_spark.metrics import set_precision_recall_f1


def test_title_concat(spark):
    df = spark.createDataFrame(
        [("Intro", "body text"), (None, "plain"), ("  ", "ws title")],
        "description string, article string",
    )
    got = [r["text"] for r in title_concat(df).collect()]
    assert got == ["Intro | body text", "plain", "ws title"]


def test_assign_doc_ids_order(spark):
    df = spark.createDataFrame(
        [("b", "y", "2"), ("a", "x", "1"), ("a", "z", "3")],
        "repo string, path string, commit string",
    )
    got = {(r["repo"], r["path"]): r["doc_id"] for r in assign_doc_ids(df).collect()}
    assert got[("a", "x")] == 0 and got[("a", "z")] == 1 and got[("b", "y")] == 2


def test_assign_doc_ids_parallel_matches_window_oracle(spark):
    from fusion_spark.corpus import assign_doc_ids_window

    # 1000 rows, shuffled insertion order, multi-partition input
    rows = [(f"repo{(i * 37) % 11}", f"p/{(i * 73) % 997:04d}", f"c{i:05d}") for i in range(1000)]
    df = spark.createDataFrame(rows, "repo string, path string, commit string").repartition(13)
    got = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in assign_doc_ids(df, num_partitions=7).collect()
    }
    want = {
        (r["repo"], r["path"], r["commit"]): r["doc_id"]
        for r in assign_doc_ids_window(df).collect()
    }
    assert got == want
    assert sorted(got.values()) == list(range(1000))  # dense 0..N-1


def test_with_sha256(spark):
    import hashlib

    df = with_sha256(spark.createDataFrame([("hello",)], "content string"))
    assert df.collect()[0]["content_sha256"] == hashlib.sha256(b"hello").hexdigest()


def test_explode_qrels_shuffled_deterministic(spark):
    qrels = spark.createDataFrame([(1, [10, 20, 30]), (2, [40])], "qid long, article_ids array<long>")
    a = [tuple(r) for r in explode_qrels_shuffled(qrels, seed=42).collect()]
    b = [tuple(r) for r in explode_qrels_shuffled(qrels, seed=42).collect()]
    assert sorted(a) == [(1, 10), (1, 20), (1, 30), (2, 40)]
    assert a == b  # same seed → same order


def test_set_prf_handcomputed(spark):
    preds = spark.createDataFrame([(1, d) for d in [2, 9, 1, 8]], "qid long, doc_id long")
    qrels = spark.createDataFrame([(1, [1, 2, 3])], "qid long, article_ids array<long>")
    r = set_precision_recall_f1(preds, qrels).collect()[0]
    assert r["precision"] == pytest.approx(2 / 4)
    assert r["recall"] == pytest.approx(2 / 3)
    p, rec = 0.5, 2 / 3
    assert r["f1"] == pytest.approx(2 * p * rec / (p + rec))


def test_set_prf_no_hits_query(spark):
    preds = spark.createDataFrame([(1, 99)], "qid long, doc_id long")
    qrels = spark.createDataFrame(
        [(1, [1]), (2, [5])], "qid long, article_ids array<long>"
    )
    rows = {r["qid"]: r for r in set_precision_recall_f1(preds, qrels).collect()}
    assert rows[1]["f1"] == 0.0
    assert rows[2]["precision"] == 0.0 and rows[2]["recall"] == 0.0  # no preds at all
