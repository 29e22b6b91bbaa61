"""IR evaluation metrics as DataFrame aggregations.

Reference: class Metrics, /root/reference/src/utils/metrics.py. Per-query
scores, then an UNWEIGHTED mean over all queries in the ground truth
(metrics.py:60-70) — queries with zero hits contribute 0, so every metric
aggregates over the full qrels qid set (left join + coalesce 0).

Conventions replicated exactly:
  * precision@k divides by len(results[:k]) = min(k, |results|)
    (metrics.py:138-149).
  * MAP@k: Σ_{i: hit at i} P@i / |gt| (metrics.py:72-83).
  * MRR@k: 1/min(hit rank), else 0 (metrics.py:85-95).
  * nDCG@k uses the reference's index convention — rel_0 counted raw and
    rel_i/log2(i+1) for 0-based i ≥ 1, i.e. a hit at 1-based rank r
    contributes 1 if r==1 else 1/log2(r); idcg = 1 + Σ_{i=1}^{|gt|−1}
    1/log2(i+1) (metrics.py:97-110). This differs from standard log2(i+2);
    we match the reference.
  * R-precision with R = |gt| (metrics.py:112-123).

Input shapes: preds (qid, doc_id, rank) with 1-based rank; qrels either
(qid, article_ids array<long>) or pre-exploded (qid, doc_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_qrels(qrels: DataFrame) -> DataFrame:
    if "article_ids" in qrels.columns:
        return qrels.select("qid", F.explode("article_ids").alias("doc_id"))
    return qrels.select("qid", "doc_id")


def _per_query(preds: DataFrame, qrels: DataFrame):
    # gt is consumed by the hits join AND (via gt_size) by the metric
    # aggregate and the idcg join; without pinning, the whole qrels lineage
    # re-executes once PER consumer (event-log measured r11: three
    # concurrent copies of the ground-truth derivation dominated the
    # metrics wall). gt is one row per (query, relevant doc) and gt_size
    # one row per query — metadata-sized at any corpus scale — so lazy
    # localCheckpoints pin them at negligible cost; hits has a single
    # consumer chain and needs none.
    gt = explode_qrels(qrels).localCheckpoint(eager=False)
    gt_size = gt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt")).localCheckpoint(
        eager=False
    )
    hits = preds.join(gt, ["qid", "doc_id"]).select("qid", "rank")
    n_res = preds.groupBy("qid").agg(F.count(F.lit(1)).alias("n_res"))
    return gt_size, hits, n_res


def metrics_per_query(
    preds: DataFrame,
    qrels: DataFrame,
    recall_k=(5, 10, 20, 50, 100, 200, 500, 1000),
    map_k=(10, 100),
    mrr_k=(10, 100),
    ndcg_k=(10, 100),
    precision_k=(),
) -> DataFrame:
    """One row per qid with every configured metric (base for the means).

    precision_k defaults EMPTY for reference parity: Metrics.precision exists
    (metrics.py:140-151) but compute_all_metrics never emits it — pass e.g.
    precision_k=(5, 10) to enable the standalone metric. Denominator is the
    reference's len(results[:k]) = min(k, |results|); a query with zero
    predictions scores 0 (the reference would divide by zero there).

    MAP@k plan note: P@i = (cumulative hits at rank i) / i needs a prefix
    count, computed ONCE as a row_number window over the unfiltered hits —
    valid for every k simultaneously because the rank≤k rows are a prefix of
    the rank order, so filtering rows with rank>k cannot change row_number
    for the rows that remain. Each k then folds into the single groupBy as a
    conditional sum. One window + one aggregate for the whole metric grid
    (the window's hash(qid) partitioning is reused by the groupBy), instead
    of a window + groupBy + join per k."""
    gt_size, hits, n_res = _per_query(preds, qrels)

    if map_k:
        from pyspark.sql import Window

        w = Window.partitionBy("qid").orderBy("rank")
        hits = hits.withColumn(
            "_p_at_i", F.row_number().over(w).cast("double") / F.col("rank")
        )

    aggs = []
    for k in precision_k:
        aggs.append(
            F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)).alias(f"_hits@{k}")
        )
    for k in recall_k:
        aggs.append(
            (F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)) / F.max("n_gt")).alias(
                f"recall@{k}"
            )
        )
    for k in mrr_k:
        aggs.append(
            F.coalesce(
                F.lit(1.0) / F.min(F.when(F.col("rank") <= k, F.col("rank"))), F.lit(0.0)
            ).alias(f"mrr@{k}")
        )
    for k in ndcg_k:
        # dcg: hit at rank 1 contributes 1; at rank r>1 contributes 1/log2(r)
        dcg = F.sum(
            F.when(F.col("rank") == 1, F.lit(1.0)).when(
                F.col("rank") <= k, F.lit(1.0) / F.log2(F.col("rank"))
            ).otherwise(F.lit(0.0))
        )
        aggs.append(dcg.alias(f"_dcg@{k}"))
    aggs.append(
        (F.sum(F.when(F.col("rank") <= F.col("n_gt"), 1).otherwise(0)) / F.max("n_gt")).alias(
            "r-precision"
        )
    )
    for k in map_k:
        aggs.append(
            F.sum(F.when(F.col("rank") <= k, F.col("_p_at_i"))).alias(f"_sum_p@{k}")
        )

    base = (
        gt_size.join(hits, "qid", "left")
        .groupBy("qid")
        .agg(*aggs)
    )
    if precision_k:
        base = base.join(n_res, "qid", "left")
        for k in precision_k:
            base = base.withColumn(
                f"precision@{k}",
                F.when(
                    F.coalesce(F.col("n_res"), F.lit(0)) > 0,
                    F.col(f"_hits@{k}") / F.least(F.lit(k), F.col("n_res")),
                ).otherwise(F.lit(0.0)),
            ).drop(f"_hits@{k}")
        base = base.drop("n_res")

    # idcg from gt size; finalize ndcg and map.
    out = base.join(gt_size, "qid")
    # idcg = 1 + Σ_{i=1}^{n_gt−1} 1/log2(i+1)  ≡  1 + Σ_{j=2}^{n_gt} 1/log2(j)
    idcg = lambda: F.lit(1.0) + F.when(  # noqa: E731
        F.col("n_gt") >= 2,
        F.aggregate(
            F.transform(
                F.sequence(F.lit(2), F.col("n_gt")),
                lambda j: F.lit(1.0) / F.log2(j.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    ).otherwise(F.lit(0.0))
    for k in ndcg_k:
        out = out.withColumn(
            f"ndcg@{k}",
            F.when(F.col("n_gt") >= 1, F.col(f"_dcg@{k}") / idcg()).otherwise(F.lit(0.0)),
        ).drop(f"_dcg@{k}")
    for k in map_k:
        out = out.withColumn(
            f"map@{k}", F.coalesce(F.col(f"_sum_p@{k}"), F.lit(0.0)) / F.col("n_gt")
        ).drop(f"_sum_p@{k}")
    return out.drop("n_gt")


def set_precision_recall_f1(preds: DataFrame, qrels: DataFrame) -> DataFrame:
    """M7 (metrics.py:6-22): set-overlap tp/fp/fn → per-query precision,
    recall, F1. preds: (qid, doc_id) — rank-free set semantics."""
    gt = explode_qrels(qrels)
    p = preds.select("qid", "doc_id").distinct()
    tp = p.join(gt, ["qid", "doc_id"]).groupBy("qid").agg(F.count(F.lit(1)).alias("tp"))
    np_ = p.groupBy("qid").agg(F.count(F.lit(1)).alias("n_pred"))
    ng = gt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt"))
    out = (
        ng.join(np_, "qid", "left")
        .join(tp, "qid", "left")
        .withColumn("tp", F.coalesce("tp", F.lit(0)))
        .withColumn("n_pred", F.coalesce("n_pred", F.lit(0)))
        .withColumn(
            "precision",
            F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(F.lit(0.0)),
        )
        .withColumn("recall", F.col("tp") / F.col("n_gt"))
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return out.select("qid", "precision", "recall", "f1")


def compute_all_metrics(
    preds: DataFrame,
    qrels: DataFrame,
    recall_k=(5, 10, 20, 50, 100, 200, 500, 1000),
    map_k=(10, 100),
    mrr_k=(10, 100),
    ndcg_k=(10, 100),
    precision_k=(),
) -> dict[str, float]:
    """Unweighted mean over queries (metrics.py:60-70) → {metric: value}."""
    per_q = metrics_per_query(preds, qrels, recall_k, map_k, mrr_k, ndcg_k, precision_k)
    metric_cols = [c for c in per_q.columns if c != "qid"]
    row = per_q.agg(*[F.avg(F.col(f"`{c}`")).alias(c) for c in metric_cols]).collect()[0]
    return {c: float(row[c]) for c in metric_cols}


def metrics_table(preds: DataFrame, qrels: DataFrame, **kw) -> DataFrame:
    """Single-row DataFrame of metric means (for sinks / the driver)."""
    per_q = metrics_per_query(preds, qrels, **kw)
    metric_cols = [c for c in per_q.columns if c != "qid"]
    return per_q.agg(*[F.avg(F.col(f"`{c}`")).alias(c) for c in metric_cols])
