"""Inverted-index build — postings, term stats, doc stats — as Spark aggregations.

Reference semantics (all in /root/reference/src/retrievers/bm25.py):
  * postings  tf[term][doc]   — nested dict count            (bm25.py:58-65)
  * df        docs containing term (set-per-doc update)      (bm25.py:68-75)
  * idf       TFIDF/Atire: log10((N+1)/(df+1)); BM25:
              log10((N-df+0.5)/(df+0.5)) — log10, may be
              negative, no floor                             (bm25.py:85-87,145-147,171-173)
  * doc_len   whitespace token count per doc                 (bm25.py:141-143)
  * avgdl     exact mean of doc lengths                      (bm25.py:137-138)

Spark design (scale notes):
  * `explode(tokens) → groupBy(term, doc_id).count()` — Catalyst inserts a
    partial (map-side) hash aggregate, so the shuffle carries (term, doc_id,
    tf) pairs, not token occurrences. Hot terms (`def`, `{`, …) are NOT a
    skew problem here because doc_id is part of the grouping key — the
    shuffle key (term, doc_id) is near-uniform even when term is Zipfian.
  * df must be EXACT (scores depend on it): `groupBy(term).count()` over the
    already-distinct (term, doc_id) postings. Again partial aggregation
    means each map task emits one (term, partial_count) row per term —
    the hot-term reduce side receives ≤ #map-partitions rows per term.
    No approx_count_distinct, no salting needed for counts.
  * doc length is denormalized INTO postings (`dl` per row) so query-time
    scoring joins only (query_terms ⋈ postings): one fewer shuffle join
    against a 10^12-row docstats table at scale; storage cost is one int32
    per posting.
  * N and avgdl are two scalars collected once and broadcast as literals.
  * Resumable build: documents are bucketed by `pmod(doc_id, n_buckets)`;
    each bucket's postings are written to its own parquet subdirectory with
    a manifest row appended on success. A re-run skips completed buckets
    (idempotent, byte-identical results since tf/dl are per-doc facts and
    bucket membership is deterministic). Global stats (df/idf/N/avgdl) are
    derived from the union of bucket postings at finalize time.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fusion_spark.tokenize import tokenize

VARIANTS = ("bm25", "tfidf", "atire")


def idf_expr(variant: str, n_docs: int, df_col="df"):
    """IDF per reference variant — log10 in all cases (bm25.py:87,147,173)."""
    df_c = F.col(df_col)
    if variant == "bm25":
        return F.log10((F.lit(float(n_docs)) - df_c + F.lit(0.5)) / (df_c + F.lit(0.5)))
    elif variant in ("tfidf", "atire"):
        return F.log10((F.lit(float(n_docs + 1))) / (df_c + F.lit(1.0)))
    raise ValueError(f"unknown variant {variant}")


@dataclass
class BM25Index:
    """A queryable posting store: DataFrames + two broadcastable scalars."""

    postings: DataFrame  # (term, doc_id, tf, dl)
    termstats: DataFrame  # (term, df, idf)
    docstats: DataFrame  # (doc_id, dl)
    n_docs: int
    avgdl: float
    variant: str = "bm25"

    def persist(self) -> "BM25Index":
        self.postings.persist()
        self.termstats.persist()
        self.docstats.persist()
        return self

    def unpersist(self) -> "BM25Index":
        for df in (self.postings, self.termstats, self.docstats):
            df.unpersist()
        return self


def _postings_from_tokens(toks: DataFrame, doc_id_col: str) -> DataFrame:
    """(doc_id, tokens, dl) → (term, doc_id, tf, dl). Partial-agg friendly.

    explode_outer + null-filter, not explode: a plain explode makes
    Catalyst infer `size(tokens) > 0` and push it below the scan-side
    Project with the tokenize expression spliced in — every doc would be
    tokenized TWICE on the build's map side (the dominant stage of the
    whole index build). Token-less docs are excluded either way (they
    carry no postings; docstats keeps them)."""
    return (
        toks.select(
            F.col(doc_id_col).alias("doc_id"), "dl", F.explode_outer("tokens").alias("term")
        )
        .filter(F.col("term").isNotNull())
        .groupBy("term", "doc_id", "dl")
        .agg(F.count(F.lit(1)).cast("int").alias("tf"))
        .select("term", "doc_id", "tf", "dl")
    )


def build_index(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "simple",
    variant: str = "bm25",
) -> BM25Index:
    """One-shot in-memory index build (for tests / small corpora; the
    resumable path below is the production build).

    One tokenize pass instead of two: the previous shape collected
    (N, avgdl) from docstats — a full tokenize of the corpus — and then the
    first consumer of the persisted postings paid ANOTHER full tokenize to
    materialize them. Both scalars are derivable without touching tokens:

      * N and the avg denominator come from the raw docs frame (count +
        non-null text count — column-pruned, the tokenize expression is
        never evaluated);
      * sum(dl) == sum(tf) exactly (every token instance contributes 1 to
        its doc's dl and 1 to exactly one posting's tf — integer sums, no
        rounding), so avgdl rides the one postings materialization pass.

    avg("dl") ignored NULL dl rows; dl is NULL iff text is NULL in `simple`
    mode (split(NULL) → NULL) and never NULL in the other modes (the UDFs
    fillna(""), code_jvm coalesces), so the denominator replicates that.
    float(sum)/denom is the identical IEEE op Spark's Average performs
    (long sum → double divide) — avgdl is bit-identical to the old path."""
    toks = tokenize(docs.select(doc_id_col, text_col), text_col=text_col, mode=mode).withColumn(
        "dl", F.size("tokens")
    )
    postings = _postings_from_tokens(toks, doc_id_col).persist()
    docstats = toks.select(F.col(doc_id_col).alias("doc_id"), "dl")
    # Both scalar rows in ONE action (per-job fixed overhead is ~0.13 s on
    # this host and dominates small-SF builds — guide §1.1): the union's two
    # aggregate subtrees run inside one collect, and the postings subtree
    # fills the cache as a side effect, so the caller's first postings
    # action is a cache hit.
    doc_row = docs.agg(
        F.lit("d").alias("side"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count(F.col(text_col)).cast("long").alias("nn"),
    )
    post_row = postings.agg(
        F.lit("p").alias("side"),
        F.sum("tf").cast("long").alias("n"),
        F.lit(None).cast("long").alias("nn"),
    )
    rows = {r["side"]: r for r in doc_row.unionByName(post_row).collect()}
    n_docs = int(rows["d"]["n"])
    denom = int(rows["d"]["nn"]) if mode == "simple" else n_docs
    total = rows["p"]["n"]
    avgdl = float(total) / denom if (denom and total is not None) else 0.0
    termstats = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", idf_expr(variant, n_docs))
    )
    return BM25Index(postings, termstats, docstats, n_docs, avgdl, variant)


def _finalize(postings: DataFrame, docstats: DataFrame, variant: str) -> BM25Index:
    postings = postings.persist()
    row = docstats.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"]), float(row["avgdl"]) if row["avgdl"] is not None else 0.0
    termstats = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn("idf", idf_expr(variant, n_docs))
    )
    return BM25Index(postings, termstats, docstats, n_docs, avgdl, variant)


# ---------------------------------------------------------------------------
# Resumable, checkpointed build (north rule: per-partition checkpoints with
# lineage + metrics tables).
# ---------------------------------------------------------------------------


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "_manifest.jsonl")


def _read_manifest(index_dir: str) -> dict[int, dict]:
    done = {}
    p = _manifest_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    if rec.get("status") == "ok":
                        done[rec["bucket"]] = rec
    return done


def build_index_resumable(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    n_buckets: int = 8,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "simple",
    variant: str = "bm25",
) -> BM25Index:
    """Checkpointed build: bucket docs by pmod(doc_id, n_buckets), write each
    bucket's postings independently, append a lineage row per bucket, skip
    completed buckets on restart. Produces a byte-identical index regardless
    of where a previous run died (tf/dl are per-doc facts; df/idf are
    recomputed from the full postings union at finalize)."""
    os.makedirs(index_dir, exist_ok=True)
    done = _read_manifest(index_dir)
    docs = docs.select(F.col(doc_id_col).alias("doc_id"), F.col(text_col).alias("text"))

    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.perf_counter()
        bucket_docs = docs.filter(F.pmod(F.col("doc_id"), F.lit(n_buckets)) == b)
        toks = tokenize(bucket_docs, text_col="text", mode=mode).withColumn("dl", F.size("tokens"))
        postings_b = _postings_from_tokens(toks, "doc_id")
        out = os.path.join(index_dir, f"postings_bucket={b}")
        postings_b.write.mode("overwrite").parquet(out)
        # docstats persisted separately: token-less docs have NO postings but
        # still count toward N and avgdl (idf depends on exact N)
        toks.select("doc_id", "dl").write.mode("overwrite").parquet(
            os.path.join(index_dir, f"docstats_bucket={b}")
        )
        n_postings = spark.read.parquet(out).count()
        n_docs_b = bucket_docs.count()
        with open(_manifest_path(index_dir), "a") as f:
            f.write(
                json.dumps(
                    {
                        "bucket": b,
                        "status": "ok",
                        "n_docs": n_docs_b,
                        "n_postings": n_postings,
                        "wall_sec": round(time.perf_counter() - t0, 3),
                        "variant": variant,
                        "mode": mode,
                    }
                )
                + "\n"
            )

    return load_index(spark, index_dir, variant=variant, finalize=True)


def load_index(
    spark: SparkSession, index_dir: str, variant: str = "bm25", finalize: bool = True
) -> BM25Index:
    paths = [
        os.path.join(index_dir, d)
        for d in sorted(os.listdir(index_dir))
        if d.startswith("postings_bucket=")
    ]
    postings = spark.read.parquet(*paths)
    ds_paths = [
        os.path.join(index_dir, d)
        for d in sorted(os.listdir(index_dir))
        if d.startswith("docstats_bucket=")
    ]
    if ds_paths:
        docstats = spark.read.parquet(*ds_paths)
    else:  # legacy stores: token-less docs unrecoverable — derive from postings
        docstats = postings.select("doc_id", "dl").distinct()
    return _finalize(postings, docstats, variant)


def write_term_bucketed_store(index: BM25Index, path: str, n_buckets: int = 64) -> None:
    """Query-optimized posting-store layout: partition the postings by
    `term_bucket = pmod(hash(term), n_buckets)`. A query's terms map to a
    handful of buckets, so the Hive-style partition column prunes whole
    FILES before the parquet reader even opens them (directory-level
    pruning), on top of the term IN (...) row-group filter. This is the
    co-located layout a 100 TB posting store would use (term cannot be a
    partition column directly — unbounded cardinality — the hash bucket is
    the standard fix)."""
    (
        index.postings.withColumn("term_bucket", F.pmod(F.hash("term"), F.lit(n_buckets)))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(f"{path}/postings")
    )
    index.docstats.write.mode("overwrite").parquet(f"{path}/docstats")
    index.termstats.write.mode("overwrite").parquet(f"{path}/termstats")
    import json as _json

    with open(f"{path}/meta.json", "w") as f:
        _json.dump(
            {"n_docs": index.n_docs, "avgdl": index.avgdl, "variant": index.variant,
             "n_term_buckets": n_buckets},
            f,
        )


def load_term_bucketed_store(spark: SparkSession, path: str) -> BM25Index:
    import json as _json

    with open(f"{path}/meta.json") as f:
        meta = _json.load(f)
    postings = spark.read.parquet(f"{path}/postings").drop("term_bucket")
    # NB: keep the partition column for pruning when filtering manually:
    # spark.read.parquet(...).filter(term_bucket IN ...) — scoring.score's
    # prefilter_terms handles the term-level filter; bucket-level pruning is
    # applied by query_bucket_filter below.
    return BM25Index(
        postings=postings,
        termstats=spark.read.parquet(f"{path}/termstats"),
        docstats=spark.read.parquet(f"{path}/docstats"),
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        variant=meta["variant"],
    )


def load_term_bucketed_pruned(
    spark: SparkSession, path: str, terms: list[str]
) -> BM25Index:
    """Load the bucketed store with directory-level pruning for a known
    query-term set: only the partitions whose bucket hosts a query term are
    listed/read."""
    import json as _json

    with open(f"{path}/meta.json") as f:
        meta = _json.load(f)
    n_b = meta["n_term_buckets"]
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    buckets = sorted(
        r["b"]
        for r in tdf.select(F.pmod(F.hash("term"), F.lit(n_b)).alias("b")).distinct().collect()
    )
    postings = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("term_bucket").isin(buckets))
        .drop("term_bucket")
    )
    return BM25Index(
        postings=postings,
        termstats=spark.read.parquet(f"{path}/termstats"),
        docstats=spark.read.parquet(f"{path}/docstats"),
        n_docs=meta["n_docs"],
        avgdl=meta["avgdl"],
        variant=meta["variant"],
    )


def lineage(spark: SparkSession, index_dir: str) -> DataFrame:
    """The per-bucket lineage/metrics table (north rule artifact)."""
    recs = list(_read_manifest(index_dir).values())
    return spark.createDataFrame(
        recs or [],
        schema="bucket int, status string, n_docs long, n_postings long, wall_sec double, variant string, mode string",
    )
