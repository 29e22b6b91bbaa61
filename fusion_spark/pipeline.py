"""End-to-end training-data curation pipeline — the composition the extras
exist for: quality filter → exact dedup → MinHash-LSH near-dup removal →
curated corpus + per-group budget.

Every stage is one of the already-verified operators (textstats.quality_score,
dedup.exact_duplicates, dedup.minhash_signatures → lsh_candidate_pairs →
jaccard_pairs); this module only wires them so one call yields the curated
corpus a pretraining run would read. Scale shape: no stage self-joins the
corpus — pair generation is LSH-banded, removals are anti-joins.

Determinism/cross-engine notes: the quality gate compares round(quality, 6)
(both engines round identically; an unrounded threshold could flip on a
one-ulp difference); the Jaccard gate compares the raw ratio (identical
integer inputs → identical IEEE division in both engines). Near-dup removal
keeps the smaller doc_id of every verified pair (drop all doc_b) — a
deterministic greedy that keeps ≥1 representative per duplicate chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusion_spark.extras import dedup, textstats


def curation_shuffle_partitions(
    n_docs: int, cores: int = 32, rows_per_task: int = 23_000
) -> int:
    """Shuffle-partition count for the curation pipeline, encoding the r6
    bracketing sweep (BENCH.md "partition-knob remedy") so the operator does
    not need to know it: the 12M-doc optimum sat at 512 partitions ≈ 23k
    docs/task with a 24g heap — enough tasks that per-task agg/join state
    (shingle maps, minhash groupings, CC label frames) stays under the
    executor memory fractions instead of spilling, not so many that the
    2×N-task iterative CC rounds pay pure per-task overhead (the measured
    U-curve: 256 → 512 → 1024 gave 1,872.9 → 1,455.0 → 1,551.6 s CC wall).
    Rounded to the nearest power of two; floored at cores*2 so small inputs
    keep full parallelism; capped at 65,536 as a sanity bound.

    Per-stage nuance (measured, same sweep): tiny driver-bounded stages
    (budget selection, audit count passes) prefer FEWER partitions — AQE's
    runtime coalescing (with the 64k minPartitionSize floor from get_spark)
    handles those, and select_by_token_budget keeps its own num_partitions
    knob; this heuristic sizes the corpus-scale shuffles."""
    import math

    raw = max(n_docs / rows_per_task, 1)
    p = 2 ** round(math.log2(raw))
    return min(max(p, cores * 2), 65_536)


def select_by_token_budget(
    docs: DataFrame,
    budgets: dict[str, int],
    group_col: str = "lang",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    order_col: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Data-mixture materializer: per group (language/source), keep documents
    in priority order while the group's CUMULATIVE whitespace-token count
    stays ≤ budgets[group] — the op that turns a mixture plan ("30 B tokens
    of python, 5 B of go") into an actual corpus. Groups absent from
    `budgets` are dropped (budget 0) — pass every group explicitly.

    Priority order: (order_col DESC, doc_id ASC) when order_col is given
    (e.g. a quality score — best docs first), else doc_id ASC. Selection
    rule is prefix-by-cumsum: doc kept iff its INCLUSIVE running total ≤
    budget, with the running total accumulating over all docs in order
    (window-expressible — the driver-gate oracle mirrors it exactly).

    Scale shape: the naive plan (`sum() OVER (PARTITION BY group ORDER BY
    …)`) serializes each group through ONE reducer — a 50 TB `en` group is
    a single-task scan. This implementation reuses the assign_doc_ids
    parallel-prefix pattern instead: range-partition by (group, order),
    per-(partition, group) token sums collected once (num_partitions ×
    |groups| scalars), prefix offsets computed on the driver, and an Arrow
    mapInPandas pass stamps running totals per partition — every partition
    works concurrently, no per-group serial window.
    Output: (doc_id, group_col, n_tokens, cum_tokens) for kept docs."""
    import numpy as np
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    spark = docs.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    toks = F.filter(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != F.lit(""))
    # every driver/kernel lookup keys on `_gks`, the group value cast to
    # string IN THE SPARK PLAN (NULL → sentinel): the Arrow kernel would
    # otherwise see a nullable int64 group column as float64 (5 → 5.0,
    # NULL → NaN) while the driver collect sees Python int — and group ids
    # above 2^53 would silently collapse in float64, drawing the wrong
    # budget. Casting once JVM-side gives driver and kernel byte-identical
    # exact keys for any group type; the original `grp` column still
    # carries the output value/type. (`budgets` keys are canonicalized to
    # Spark's string cast per group dtype below — exact for string, integer
    # and boolean group columns; fractional group columns raise.)
    _NULL_KEY = "\0null"
    base = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(group_col).alias("grp"),
        F.coalesce(F.col(group_col).cast("string"), F.lit(_NULL_KEY)).alias("_gks"),
        F.size(toks).cast("long").alias("n_tokens"),
        *([F.col(order_col).alias("_ord")] if order_col else []),
    )
    order = ([F.col("_ord").desc()] if order_col else []) + [F.col("doc_id").asc()]
    d = (
        base.repartitionByRange(n, F.col("grp"), *order)
        .sortWithinPartitions(F.col("grp"), *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # count job and stamping job must see the same ranges
    )

    sums = d.groupBy("_pid", "_gks").agg(F.sum("n_tokens").alias("s")).collect()
    per_group: dict[str, dict[int, int]] = {}
    for r in sums:
        per_group.setdefault(r["_gks"], {})[r["_pid"]] = r["s"]
    offsets: dict[tuple[int, str], int] = {}
    for grp, by_pid in per_group.items():
        acc = 0
        for pid in sorted(by_pid):
            offsets[(pid, grp)] = acc
            acc += by_pid[pid]

    # the kernel emits the STRING key, not the group value: a nullable int64
    # group would round-trip through pandas as float64 and mangle values
    # above 2^53 in the OUTPUT too — the exact string→original-type cast
    # happens JVM-side after the stamping pass
    grp_type = d.schema["grp"].dataType
    out_schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("_gks", StringType()),
            StructField("n_tokens", LongType()),
            StructField("cum_tokens", LongType()),
        ]
    )
    # Canonicalize budget keys to Spark's string-cast of the group column —
    # Python str() alone diverges for bool (str(True)='True' vs Spark 'true')
    # and for float groups keyed by int budgets (5 vs Spark's '5.0'), which
    # would silently match nothing and drop every doc in the group. Bool,
    # integral, date, and timestamp types are canonicalized; fractional/other
    # group types raise (float equality is no basis for a budget key — cast
    # the column first).
    #
    # Timestamp keys are rendered BY SPARK ITSELF (one tiny indexed
    # createDataFrame → CAST(AS STRING) → collect over just the budget
    # keys): a driver-side strftime would have to assume the naive datetime
    # is in the session timezone, but PySpark's collect/createDataFrame
    # convert TimestampType through the DRIVER OS timezone — on a non-UTC
    # host a strftime render never matches the JVM-side `_gks` cast and
    # every doc in the group is silently dropped (r6 advice). Routing the
    # key through createDataFrame applies the exact inverse of the
    # conversion that produced a collected key, so the rendered string
    # matches `_gks` regardless of host tz (and tz-aware keys work too).
    import datetime as _dt

    from pyspark.sql.types import (
        BooleanType,
        ByteType,
        DateType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
        TimestampNTZType,
        TimestampType,
    )

    _ts_render: dict = {}
    if isinstance(grp_type, (TimestampType, TimestampNTZType)):
        dt_keys = [k for k in budgets if isinstance(k, _dt.datetime)]
        if dt_keys:
            kdf = spark.createDataFrame(
                list(enumerate(dt_keys)),
                StructType(
                    [StructField("i", LongType()), StructField("k", grp_type)]
                ),
            )
            rows = kdf.select("i", F.col("k").cast("string").alias("s")).collect()
            _ts_render = {dt_keys[r["i"]]: r["s"] for r in rows}

    def _canon(k):
        if k is None:
            return _NULL_KEY
        if isinstance(grp_type, BooleanType):
            return "true" if k in (True, "true", "True", 1) else "false"
        if isinstance(grp_type, (ByteType, ShortType, IntegerType, LongType)):
            return str(int(k))
        if isinstance(grp_type, (TimestampType, TimestampNTZType)):
            if isinstance(k, _dt.datetime):
                return _ts_render[k]
            return str(k)
        if isinstance(grp_type, DateType):
            # datetime IS a date (subclass) but renders with a time part that
            # Spark's date cast never emits — silently matching nothing. A
            # midnight datetime is unambiguous; anything else is lossy → raise.
            if isinstance(k, _dt.datetime):
                if k.tzinfo is not None or k.time() != _dt.time(0):
                    raise ValueError(
                        "token_budget_select: datetime budget key "
                        f"{k!r} for a DateType group column — pass a "
                        "datetime.date (a non-midnight time part cannot match "
                        "any date value)"
                    )
                return k.date().isoformat()
            return k.isoformat() if isinstance(k, _dt.date) else str(k)
        if isinstance(grp_type, StringType):
            return str(k)
        raise ValueError(
            f"token_budget_select: unsupported group column type {grp_type} — "
            "budget keys can't be matched exactly against a fractional/complex "
            "group column; cast the column to string or integer first"
        )

    bud = {_canon(k): int(v) for k, v in budgets.items()}

    def stamp(batches):
        seen: dict[str, int] = {}
        pid = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0]) if pid is None else pid
            out_parts = []
            # rows are sorted by (grp, order) — one contiguous run per group
            # and _gks is a function of grp; grouping on the JVM-cast string
            # key (never NaN — NULLs are the sentinel) keys identically to
            # the driver offsets
            for k, g in pdf.groupby("_gks", sort=False):
                start = offsets[(pid, k)] + seen.get(k, 0)
                cum = start + np.cumsum(g["n_tokens"].to_numpy(dtype=np.int64))
                seen[k] = int(cum[-1]) - offsets[(pid, k)]
                keep = cum <= bud.get(k, 0)
                if keep.any():
                    kept = g.loc[keep, ["doc_id", "_gks", "n_tokens"]].copy()
                    kept["cum_tokens"] = cum[keep]
                    out_parts.append(kept)
            if out_parts:
                import pandas as pd

                yield pd.concat(out_parts, ignore_index=True)

    # materialize the (narrow: 4-column) selection and CUT its lineage with
    # localCheckpoint, then release the corpus-scale frame: the offsets are
    # only valid against the partitioning `d` was persisted with, so the
    # result must never be re-derivable through an unpersisted (re-sampled)
    # repartitionByRange — and repeated calls in a long-lived driver must
    # not accumulate cached corpus blocks (ADVICE r2 cache-hygiene theme)
    stamped = d.mapInPandas(stamp, schema=out_schema).select(
        "doc_id",
        F.when(F.col("_gks") == _NULL_KEY, F.lit(None).cast(grp_type))
        .otherwise(F.col("_gks").cast(grp_type))
        .alias(group_col),
        "n_tokens",
        "cum_tokens",
    )
    out = stamped.localCheckpoint(eager=True)
    d.unpersist()
    return out


def contamination_report(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    eval_text_col: str = "question",
) -> DataFrame:
    """Benchmark decontamination scan: (doc_id, n_shared) for every corpus
    document sharing ≥1 token n-gram with the evaluation set — the check a
    pretraining pipeline runs so eval questions don't leak into training
    data. Plan: the eval side's distinct n-grams are tiny (benchmarks are
    thousands of rows) and BROADCAST; the corpus side's distinct shingles
    stream through the broadcast hash join and the count aggregates on
    doc_id — the corpus never shuffles on the shingle."""
    sh = dedup.shingles(docs, text_col=text_col, doc_id_col=doc_id_col, n=n)
    eshr = dedup.shingles(
        eval_df.select(F.monotonically_increasing_id().alias("doc_id"),
                       F.col(eval_text_col).alias("text")),
        n=n,
    ).select("shingle").distinct()
    return (
        sh.join(F.broadcast(eshr), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 3,
    min_shared: int = 1,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    eval_text_col: str = "question",
) -> DataFrame:
    """Drop every document sharing ≥ min_shared token n-grams with the
    eval set (anti-join on the contamination report — no corpus self-join)."""
    flagged = contamination_report(
        docs, eval_df, n, text_col, doc_id_col, eval_text_col
    ).filter(F.col("n_shared") >= min_shared).select(F.col("doc_id").alias(doc_id_col))
    return docs.join(flagged, doc_id_col, "left_anti")


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    min_quality: float = 0.05,
    jaccard_threshold: float = 0.6,
    shingle_n: int = 3,
    num_hashes: int = 4,
    band_size: int = 2,
    near_dup_policy: str = "pairs",
    stats_out: dict | None = None,
) -> DataFrame:
    """Returns the curated (doc_id, quality) survivors:

      1. quality gate: round(quality, 6) >= min_quality;
      2. exact dedup: canonical (min doc_id) row per content hash;
      3. near-dup removal among the remainder: MinHash → banded LSH
         candidates → exact Jaccard verify >= jaccard_threshold → then one
         of two removal policies:
         * "pairs" (default, driver-gated): drop the larger doc_id of every
           verified pair — keeps ≥1 representative per duplicate CHAIN but
           can keep several per chain when the verified pair set is not
           transitively closed;
         * "cc": connected components over the verified pairs
           (dedup.duplicate_clusters) — exactly ONE survivor (the min
           doc_id) per near-dup component, the web-scale keep-one policy.

    `stats_out` (cc policy only): forwarded to duplicate_clusters, filled
    with rounds-to-convergence and per-round wall seconds.
    """
    d = docs.select(F.col(doc_id_col).alias("doc_id"), F.col(text_col).alias("text"))

    q = textstats.quality_score(d).select(
        "doc_id", F.round("quality", 6).alias("quality")
    ).filter(F.col("quality") >= min_quality)
    stage1 = d.join(q, "doc_id")

    # persisted: three consumers below (signatures, shingles, final
    # anti-join) would otherwise re-run the quality gate + dedup joins
    # over the full corpus — the dominant cost at scale
    stage2 = dedup.drop_exact_duplicates(stage1).persist()

    sigs = dedup.minhash_signatures(stage2, n=shingle_n, num_hashes=num_hashes)
    cands = dedup.lsh_candidate_pairs(sigs, band_size=band_size)
    sh = dedup.shingles(stage2, n=shingle_n)
    near = dedup.jaccard_pairs(sh, min_jaccard=jaccard_threshold, candidates=cands)
    if near_dup_policy == "cc":
        clusters = dedup.duplicate_clusters(
            near.select("doc_a", "doc_b"), stats_out=stats_out
        )
        drops = clusters.filter(F.col("doc_id") != F.col("cluster_rep")).select("doc_id")
    elif near_dup_policy == "pairs":
        drops = near.select(F.col("doc_b").alias("doc_id")).distinct()
    else:
        raise ValueError(f"unknown near_dup_policy {near_dup_policy}")
    survivors = stage2.join(drops, "doc_id", "left_anti").select("doc_id", "quality")
    # materialize the (small: doc_id, quality) result through the stage2
    # cache, then RELEASE stage2 — repeated curate_corpus calls in a
    # long-lived driver must not accumulate cached corpus blocks (ADVICE r2)
    survivors = survivors.persist()
    survivors.count()
    stage2.unpersist()
    return survivors
