"""Corpus source transforms — turning raw source tables into the engine's
canonical (doc_id, text) shape.

  * title-concat (S4, /root/reference/src/data/lleqa.py:85-88): prepend
    `description + " | "` to the article when the description is non-empty.
  * deterministic doc_id assignment: row_number() over (repo, path, commit)
    — defines the corpus insertion order the tie-break contract depends on
    (bm25.py:105-106,207). NB row_number over a global order is a single-
    partition sort at scale; for 10^12 rows use a precomputed id column or
    zipWithIndex-style block ids — this helper is the semantic reference.
  * content sha256 derivation (input_hint per-row invariant).
  * one-to-many → one-to-one qrels explode with seeded shuffle (T3,
    lleqa.py:90-100) — test-data shaping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def title_concat(
    df: DataFrame,
    text_col: str = "article",
    title_col: str = "description",
    out_col: str = "text",
) -> DataFrame:
    """S4: `description | article` when description is non-empty/non-null."""
    has_title = F.col(title_col).isNotNull() & (F.trim(F.col(title_col)) != "")
    return df.withColumn(
        out_col,
        F.when(has_title, F.concat_ws(" | ", F.col(title_col), F.col(text_col))).otherwise(
            F.col(text_col)
        ),
    )


def assign_doc_ids(df: DataFrame, order_cols=("repo", "path", "commit")) -> DataFrame:
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("doc_id", F.row_number().over(w) - 1)


def with_sha256(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def explode_qrels_shuffled(qrels: DataFrame, seed: int = 42) -> DataFrame:
    """T3: one-to-many (qid, article_ids) → shuffled one-to-one pairs."""
    return (
        qrels.select("qid", F.explode("article_ids").alias("doc_id"))
        .orderBy(F.rand(seed))
    )
