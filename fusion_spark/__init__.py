"""fusion_spark — a from-scratch PySpark-native inverted-index + BM25 + fusion engine.

Re-expresses the query/data-processing capabilities of the reference
(maastrichtlawtech/fusion, see SURVEY.md) as idiomatic Spark DataFrame
pipelines: Arrow-vectorized tokenization, shuffle-built posting lists,
join-based BM25 top-k, window-based rank fusion, and DataFrame IR metrics.

Nothing here is a port: the reference is single-process dict-based Python
(`/root/reference/src/retrievers/bm25.py`, `hybrid.py`); this package is a
distributed re-design targeting 100 TB-scale corpora on multi-executor
clusters while remaining rank- and score-identical on the reference's
query semantics.
"""

__version__ = "0.1.0"

from fusion_spark.session import get_spark  # noqa: F401
