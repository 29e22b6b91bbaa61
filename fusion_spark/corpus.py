"""Corpus source transforms — turning raw source tables into the engine's
canonical (doc_id, text) shape.

  * title-concat (S4, /root/reference/src/data/lleqa.py:85-88): prepend
    `description + " | "` to the article when the description is non-empty.
  * deterministic doc_id assignment over (repo, path, commit) — defines the
    corpus insertion order the tie-break contract depends on
    (bm25.py:105-106,207). The production path is parallel (range-partition
    sort + per-partition offsets); the global row_number window is kept as
    `assign_doc_ids_window`, the semantic test oracle.
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


def assign_doc_ids(
    df: DataFrame,
    order_cols=("repo", "path", "commit"),
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic dense 0..N−1 doc_id by global (order_cols) order —
    the id the whole tie-break contract hangs on (reference
    bm25.py:105-106,207) — WITHOUT a single-task global sort:

      1. repartitionByRange(order_cols) + sortWithinPartitions — parallel
         range sort (each partition holds a contiguous key range),
      2. per-partition row counts collected once (num_partitions scalars),
      3. doc_id = partition offset + local position, stamped by an Arrow
         mapInPandas pass (batches arrive in partition sort order).

    The input is persisted so the count job and the stamping job see the
    SAME range boundaries (repartitionByRange samples its bounds).
    `order_cols` must be a unique key — duplicate keys would make ids
    nondeterministic across runs. `assign_doc_ids_window` below is the
    single-exchange semantic reference the tests compare against."""
    import numpy as np
    from pyspark.sql.types import LongType, StructField, StructType

    cols = [F.col(c) for c in order_cols]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (
        df.repartitionByRange(n, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [f for f in d.schema.fields if f.name != "_pid"] + [StructField("doc_id", LongType())]
    )

    def stamp(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            off = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf["doc_id"] = np.arange(off + seen, off + seen + len(pdf), dtype=np.int64)
            seen += len(pdf)
            yield pdf

    return d.mapInPandas(stamp, schema=out_schema)


def assign_doc_ids_window(df: DataFrame, order_cols=("repo", "path", "commit")) -> DataFrame:
    """Semantic reference: global row_number window (single-task sort — test
    oracle only, never the production path)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("doc_id", F.row_number().over(w) - 1)


def with_sha256(df: DataFrame, content_col: str = "content") -> DataFrame:
    return df.withColumn("content_sha256", F.sha2(F.col(content_col), 256))


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """Context-window chunking — split long documents into overlapping
    token windows (the pretraining prep step between curation and
    tokenizer packing). Chunk i covers tokens [i·stride, i·stride +
    max_tokens) with stride = max_tokens − overlap;
    n_chunks = 1 + ⌈max(n − max_tokens, 0) / stride⌉ (so every token is in
    ≥1 chunk and the tail chunk keeps ≥ overlap tokens); token-less docs
    produce no rows. Pure JVM whole-stage codegen — transform(sequence)
    builds the windows, no UDF, no shuffle (chunking is embarrassingly
    row-local; output partitioning inherits the input's).
    Output: (doc_id, chunk_idx, chunk_text, n_tokens)."""
    if overlap >= max_tokens:
        raise ValueError(f"overlap ({overlap}) must be < max_tokens ({max_tokens})")
    stride = max_tokens - overlap
    from fusion_spark.tokenize import tokenize

    toks = tokenize(docs.select(doc_id_col, text_col), text_col=text_col, mode="simple")
    n = F.size("tokens")
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - max_tokens, F.lit(0)) / F.lit(float(stride))
    ).cast("int")
    chunks = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice("tokens", i * stride + 1, max_tokens)).alias(
                    "chunk_text"
                ),
                F.least(F.lit(max_tokens), n - i * stride).cast("long").alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<chunk_idx:long,chunk_text:string,n_tokens:long>>"))
    # explode_outer + null-filter: a plain explode would make Catalyst infer
    # size(chunks) > 0 and push it down with the whole windowing expression
    # spliced in — every doc builds its chunk array twice (interpreted),
    # serially on a single-file scan (same pathology as textstats.fingerprint)
    return (
        toks.select(F.col(doc_id_col).alias("doc_id"), F.explode_outer(chunks).alias("c"))
        .filter(F.col("c").isNotNull())
        .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
    )


def stratified_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    buckets: int = 1000,
) -> DataFrame:
    """Deterministic hash split (train/dev/test and data-mixture shards):
    bucket = first 8 md5 hex chars of `<seed>:<key>` mod `buckets`; split
    boundaries are the cumulative weight thresholds. Properties a 100 TB
    pipeline needs and `df.randomSplit` does NOT give:

      * map-only — no shuffle, no sampling pass; appending data never
        reassigns existing keys (stable membership under growth);
      * engine-portable — the identical md5 formula runs in any SQL engine
        (driver-gate oracle), so splits survive engine migrations;
      * key-stable — the same key lands in the same split regardless of
        partitioning, row order, or cluster size.

    Output: df + `split` column. Weights are normalized; thresholds use
    floor(cum·buckets) so every bucket maps to exactly one split."""
    total = sum(weights.values())
    names = sorted(weights)  # deterministic boundary order
    # a split whose weight floors to zero buckets would be silently EMPTY
    # (e.g. weight 0.0005 with buckets=1000) — validate loudly instead
    cum, prev_hi = 0.0, 0
    for name in names:
        cum += weights[name] / total
        hi = int(cum * buckets)
        if hi <= prev_hi:
            raise ValueError(
                f"stratified_split: split '{name}' maps to zero of {buckets} "
                "buckets (weight too small) — raise `buckets` or the weight"
            )
        prev_hi = hi
    bucket = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{seed}:"), F.col(key_col).cast("string"))), 1, 8), 16, 10)
        .cast("long")
        % buckets
    )
    expr = None
    cum = 0.0
    for name in names:
        cum += weights[name] / total
        hi = int(cum * buckets)  # floor
        cond = bucket < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float-rounding guard: anything at/above the last threshold joins the
    # final split (cum == 1.0 ⇒ hi == buckets, so this is only reachable
    # when the normalized weights round below 1)
    expr = expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def dedup_splits(train: DataFrame, dev: DataFrame, key_cols=("qid",)) -> DataFrame:
    """T2: drop train rows whose key appears in the dev split — the
    train/dev leakage guard (reference filters dev qids out of the mined
    training tuples, mmarco.py:141-166 sampling loop) as a left anti-join;
    the dev key set is aggregated (distinct) before the join so the big
    train side shuffles once against a small build side."""
    keys = dev.select(*[F.col(c) for c in key_cols]).distinct()
    return train.join(keys, list(key_cols), "left_anti")


def explode_qrels_shuffled(qrels: DataFrame, seed: int = 42) -> DataFrame:
    """T3: one-to-many (qid, article_ids) → shuffled one-to-one pairs."""
    return (
        qrels.select("qid", F.explode("article_ids").alias("doc_id"))
        .orderBy(F.rand(seed))
    )
