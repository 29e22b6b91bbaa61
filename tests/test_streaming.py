"""Incremental posting-store stream: arrivals in two waves produce an index
identical to a one-shot batch build over the union."""

import pytest

from fusion_spark.indexing import build_index
from fusion_spark.scoring import search
from fusion_spark.streaming import incremental_index_stream, load_incremental_index


def test_incremental_equals_batch(spark, docs_df, queries_df, tmp_path):
    landing = str(tmp_path / "landing")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")

    docs = docs_df.select("doc_id", docs_df["content"].alias("text"))
    wave1 = docs.filter("doc_id % 2 = 0")
    wave2 = docs.filter("doc_id % 2 = 1")

    wave1.write.mode("append").parquet(landing)
    incremental_index_stream(spark, landing, store, ckpt)
    wave2.write.mode("append").parquet(landing)
    incremental_index_stream(spark, landing, store, ckpt)

    inc = load_incremental_index(spark, store)
    batch = build_index(docs, doc_id_col="doc_id", text_col="text")
    assert inc.n_docs == batch.n_docs
    assert inc.avgdl == pytest.approx(batch.avgdl)
    assert sorted(map(tuple, inc.postings.collect())) == sorted(
        map(tuple, batch.postings.collect())
    )

    a = search(inc, queries_df, k=5, k1=2.5, b=0.2).orderBy("qid", "rank").collect()
    b = search(batch, queries_df, k=5, k1=2.5, b=0.2).orderBy("qid", "rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
