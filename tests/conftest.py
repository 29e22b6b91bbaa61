import pytest

from fusion_spark import synth
from fusion_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="fusion-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_rows():
    return synth.make_corpus(64)


@pytest.fixture(scope="session")
def query_rows():
    return synth.make_queries(12)


@pytest.fixture(scope="session")
def qrel_rows(corpus_rows, query_rows):
    return synth.make_qrels(corpus_rows, query_rows)


@pytest.fixture(scope="session")
def docs_df(spark, corpus_rows):
    return spark.createDataFrame(corpus_rows).cache()


@pytest.fixture(scope="session")
def queries_df(spark, query_rows):
    return spark.createDataFrame(query_rows).cache()
