"""Incremental index maintenance via Structured Streaming.

The reference is batch-only (SURVEY.md §2.9) — this is the additive scale
feature a production posting store needs: new documents arrive as files in a
landing directory; each micro-batch tokenizes, builds its postings delta,
and appends it to the posting store (per-batch parquet append via
foreachBatch). Because tf/dl are per-doc facts, appends never rewrite old
data; global stats (df/idf/avgdl) are recomputed lazily at query time from
the posting-store union — identical semantics to a full rebuild.

`trigger(availableNow=True)` drains the backlog and stops — used by tests
and by backfill jobs; a live deployment runs the same query continuously
with a processingTime trigger + checkpointLocation for exactly-once appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusion_spark.indexing import BM25Index, _finalize, _postings_from_tokens
from fusion_spark.tokenize import tokenize


def incremental_index_stream(
    spark: SparkSession,
    landing_dir: str,
    store_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id long, text string",
    mode: str = "simple",
    available_now: bool = True,
):
    """Start (and with available_now=True, run to completion) the incremental
    posting-store maintenance stream. Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(landing_dir)

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        toks = tokenize(batch_df, text_col="text", mode=mode).withColumn(
            "dl", F.size("tokens")
        )
        postings = _postings_from_tokens(toks, "doc_id")
        postings.write.mode("append").parquet(f"{store_dir}/postings")
        # docstats kept separately — token-less docs still count toward N/avgdl
        toks.select("doc_id", "dl").write.mode("append").parquet(f"{store_dir}/docstats")

    writer = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.trigger(processingTime="10 seconds").start()


def load_incremental_index(
    spark: SparkSession, store_dir: str, variant: str = "bm25"
) -> BM25Index:
    """Posting store → queryable index; df/idf/N/avgdl derived from the
    current union of appended posting deltas."""
    postings = spark.read.parquet(f"{store_dir}/postings")
    docstats = spark.read.parquet(f"{store_dir}/docstats")
    return _finalize(postings, docstats, variant)
