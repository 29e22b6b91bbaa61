"""Hyperparameter tuning — the reference's grid searches, in two forms each:

  * the reference-shaped DRIVER LOOP (`bm25_grid`, `nsf_weight_grid`): one
    cached index / score-list table, one Spark job per combo with new
    literals (Catalyst replans; bm25.py:219,234 update_params reuse);
  * the Spark-first FUSED plan (`bm25_grid_fused`, `nsf_weight_grid_fused`):
    the whole grid as ONE distributed job — combos ride as broadcast literal
    columns, scores/metrics aggregate per combo. Bit-identical results
    (asserted in tests); ~100× on the 187-combo reference grid (BENCH.md).

Grids: BM25 k1/b (bm25.py:215-246): 17×11 = 187 combos, k1∈[0,8] step .5,
b∈[0,1] step .1; NSF linear-weight simplex (hybrid.py:404-426): step-0.05
weight vectors summing to 1 over the fused systems.

All return a tidy metrics DataFrame (the reference's CSV grid sink, S8).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from fusion_spark import fusion as fz
from fusion_spark.indexing import BM25Index
from fusion_spark.metrics import compute_all_metrics
from fusion_spark.scoring import score as _score
from fusion_spark.scoring import search
from fusion_spark.scoring import top_k as _top_k


def bm25_grid(
    index: BM25Index,
    queries: DataFrame,
    qrels: DataFrame,
    k1_values=None,
    b_values=None,
    top_k: int = 1000,
    recall_k=(10, 100, 200, 500, 1000),
    score_round: int | None = None,
) -> DataFrame:
    """`score_round` rounds scores to that many dp BEFORE ranking — the
    cross-engine tie contract for driver-gated runs (one-ulp summation-order
    differences must not flip a rank against the SQL oracle); None (default)
    ranks raw scores like the reference."""
    spark = queries.sparkSession
    if k1_values is None:
        k1_values = [x * 0.5 for x in range(17)]  # 0 .. 8
    if b_values is None:
        b_values = [x * 0.1 for x in range(11)]  # 0 .. 1
    index.persist()
    rows = []
    for k1, b in itertools.product(k1_values, b_values):
        if score_round is None:
            ranked = search(index, queries, k=top_k, k1=k1, b=b)
        else:
            sc = _score(index, queries, k1=k1, b=b).withColumn(
                "score", F.round("score", score_round)
            )
            ranked = _top_k(sc, top_k)
        scores = compute_all_metrics(
            ranked.select("qid", "doc_id", "rank"), qrels,
            recall_k=recall_k, map_k=(), mrr_k=(), ndcg_k=(),
        )
        rows.append(
            {"k1": k1, "b": b,
             **{m.replace("@", "_").replace("-", "_"): v for m, v in scores.items()}}
        )
    return spark.createDataFrame(rows)


def bm25_grid_fused(
    index: BM25Index,
    queries: DataFrame,
    qrels: DataFrame,
    k1_values=None,
    b_values=None,
    top_k: int = 1000,
    recall_k=(10, 100, 200, 500, 1000),
    score_round: int | None = None,
    mode: str = "simple",
) -> DataFrame:
    """The whole k1/b grid in ONE distributed plan (vs bm25_grid's per-combo
    driver loop — 187 round-trips on the reference workflow, bm25.py:215-246).

    Shape: the (qid, doc_id) → sorted term-stat arrays table is built ONCE
    (the same single corpus-side shuffle as one search); the combo table
    (|k1|×|b| rows) broadcast-cross-joins it and each score is a JVM
    higher-order fold over the array with k1/b as columns — identical
    arithmetic and summation order to scoring.score, so scores are
    bit-identical to the loop version (asserted in tests). Ranking and
    recall@k then aggregate per (k1, b). Driver round-trips: 2 (combo count
    is plan-side), regardless of grid size."""
    from pyspark.sql import Window

    from fusion_spark.metrics import explode_qrels
    from fusion_spark.scoring import query_terms

    spark = queries.sparkSession
    if k1_values is None:
        k1_values = [x * 0.5 for x in range(17)]  # 0 .. 8
    if b_values is None:
        b_values = [x * 0.1 for x in range(11)]  # 0 .. 1
    if index.variant == "tfidf":
        raise ValueError("k1/b grid applies to bm25/atire saturation scoring")

    qterms = F.broadcast(query_terms(queries, mode=mode)).join(
        index.termstats.select("term", "idf"), "term"
    )
    joined = F.broadcast(qterms).join(index.postings, "term")
    # one aggregate builds the per-pair term arrays (term-sorted → the fold
    # order below matches scoring.score's sort_array fold exactly)
    base = joined.groupBy("qid", "doc_id").agg(
        F.sort_array(
            F.collect_list(F.struct("term", "qtf", "idf", "tf", "dl"))
        ).alias("_ts")
    )
    combos = spark.createDataFrame(
        [(float(k1), float(b)) for k1 in k1_values for b in b_values], "k1 double, b double"
    )
    avgdl = F.lit(float(index.avgdl)) if index.avgdl else None

    def fold(acc, x):
        tf = x["tf"].cast("double")
        dl = x["dl"].cast("double")
        norm = (F.col("b") * dl / avgdl) if avgdl is not None else F.lit(0.0)
        denom = tf + F.col("k1") * (F.lit(1.0) - F.col("b") + norm)
        # same op order as scoring.partial_score_expr: qtf * (idf*(tf*(k1+1))/denom)
        return acc + x["qtf"].cast("double") * (
            x["idf"] * (tf * (F.col("k1") + F.lit(1.0))) / denom
        )

    scored = (
        base.crossJoin(F.broadcast(combos))
        .withColumn("score", F.aggregate("_ts", F.lit(0.0), fold))
        .drop("_ts")
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round("score", score_round))
    w = Window.partitionBy("k1", "b", "qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= top_k)

    gt = explode_qrels(qrels)
    gt_size = gt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt"))
    hits = ranked.join(gt, ["qid", "doc_id"]).select("k1", "b", "qid", "rank")
    # every (combo × gt-qid) contributes (zero-hit queries count as 0)
    all_cells = gt_size.crossJoin(F.broadcast(combos))
    per_q = (
        all_cells.join(hits, ["k1", "b", "qid"], "left")
        .groupBy("k1", "b", "qid", "n_gt")
        .agg(
            *[
                F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)).alias(f"_h{k}")
                for k in recall_k
            ]
        )
    )
    return per_q.groupBy("k1", "b").agg(
        *[
            F.avg(F.coalesce(F.col(f"_h{k}"), F.lit(0)) / F.col("n_gt")).alias(f"recall_{k}")
            for k in recall_k
        ]
    )


def weight_simplex(systems: list[str], step: float = 0.05) -> list[dict[str, float]]:
    """All step-grid weight vectors over `systems` summing to 1
    (hybrid.py:404-408 semantics, float-safe)."""
    n = round(1 / step)
    out = []
    for combo in itertools.product(range(n + 1), repeat=len(systems)):
        if sum(combo) == n:
            out.append({s: c * step for s, c in zip(systems, combo)})
    return out


def nsf_weight_grid_fused(
    score_lists: DataFrame,
    qrels: DataFrame,
    normalization: str = "min-max",
    step: float = 0.05,
    return_topk: int = 1000,
    recall_k=(10, 100),
    distributions=None,
) -> DataFrame:
    """The whole weight simplex in ONE distributed plan (vs nsf_weight_grid's
    per-combo loop — 231 combos for 3 systems at step 0.05,
    hybrid.py:404-426). Normalization is weight-independent → computed once;
    the combo table (one weight_<system> column per system) broadcast-cross-
    joins the normalized lists; weighted sums, per-combo ranking, and
    recall@k aggregate per combo in the same job."""
    from pyspark.sql import Window

    from fusion_spark.metrics import explode_qrels

    spark = score_lists.sparkSession
    systems = sorted(r["system"] for r in score_lists.select("system").distinct().collect())
    combos_list = weight_simplex(systems, step)
    wcols = [f"weight_{s}" for s in systems]
    combos = spark.createDataFrame(
        [
            {"combo_id": i, **{f"weight_{s}": w[s] for s in systems}}
            for i, w in enumerate(combos_list)
        ]
    )
    normalized = fz.normalize_scores(
        score_lists.repartition("qid"), normalization, distributions
    )
    wexpr = None
    for s in systems:
        branch = (F.col("system") == s, F.col(f"weight_{s}"))
        wexpr = F.when(*branch) if wexpr is None else wexpr.when(*branch)
    weighted = normalized.crossJoin(F.broadcast(combos)).withColumn(
        "wscore", F.col("score") * wexpr
    )
    agg = weighted.groupBy("combo_id", *wcols, "qid", "doc_id").agg(
        F.sum("wscore").alias("score")
    )
    w = Window.partitionBy("combo_id", "qid").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = agg.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= return_topk
    )

    gt = explode_qrels(qrels)
    gt_size = gt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_gt"))
    hits = ranked.join(gt, ["qid", "doc_id"]).select("combo_id", *wcols, "qid", "rank")
    all_cells = gt_size.crossJoin(F.broadcast(combos))
    per_q = (
        all_cells.join(hits, ["combo_id", *wcols, "qid"], "left")
        .groupBy("combo_id", *wcols, "qid", "n_gt")
        .agg(
            *[
                F.sum(F.when(F.col("rank") <= k, 1).otherwise(0)).alias(f"_h{k}")
                for k in recall_k
            ]
        )
    )
    return per_q.groupBy("combo_id", *wcols).agg(
        *[
            F.avg(F.coalesce(F.col(f"_h{k}"), F.lit(0)) / F.col("n_gt")).alias(f"recall_{k}")
            for k in recall_k
        ]
    ).drop("combo_id")


def nsf_weight_grid(
    score_lists: DataFrame,
    qrels: DataFrame,
    normalization: str = "min-max",
    step: float = 0.05,
    return_topk: int = 1000,
    recall_k=(10, 100),
) -> DataFrame:
    spark = score_lists.sparkSession
    systems = sorted(r["system"] for r in score_lists.select("system").distinct().collect())
    score_lists = score_lists.persist()
    rows = []
    for weights in weight_simplex(systems, step):
        fused = fz.fuse(
            score_lists, method="nsf", normalization=normalization,
            weights=weights, return_topk=return_topk,
        )
        scores = compute_all_metrics(
            fused.select("qid", "doc_id", "rank"), qrels,
            recall_k=recall_k, map_k=(), mrr_k=(10,), ndcg_k=(10,),
        )
        rows.append(
            {
                **{f"weight_{s}": w for s, w in weights.items()},
                **{m.replace("@", "_").replace("-", "_"): v for m, v in scores.items()},
            }
        )
    score_lists.unpersist()  # metrics are collected — release the cache
    return spark.createDataFrame(rows)


def write_grid_artifacts(
    grid: DataFrame,
    output_dir: str,
    metric: str = "recall_100",
    csv_name: str = "bm25_tuning_results.csv",
    vmin: float = 40.0,
    vmax: float = 60.0,
):
    """The reference's tuning-run artifacts (bm25.py:241-246): the full grid
    CSV (comma-separated, float_format '%.5f', hyperparameter columns
    first) and the k1×b heatmap of `metric` — k1 rows DESCENDING, values
    ×100, one decimal, exactly the reference's pivot. The reference renders
    the heatmap with seaborn (YlOrBr, annotated, cbar off, vmin=40,
    vmax=60) into bm25_tuning_heatmap.pdf; matplotlib/seaborn are OPTIONAL
    here — when importable the PDF is written with the same options,
    otherwise the identical pivot lands as bm25_tuning_heatmap.csv (the
    documented stand-in for plotting-free environments). The grid frame is
    driver-sized (≤ a few hundred combos), so toPandas is safe.
    Returns the pivot (pandas, percent scale)."""
    import os

    pdf = grid.toPandas()
    cols = ["k1", "b"] + [c for c in pdf.columns if c not in ("k1", "b")]
    pdf = pdf[cols].sort_values(["k1", "b"], ignore_index=True)
    os.makedirs(output_dir, exist_ok=True)
    pdf.to_csv(
        os.path.join(output_dir, csv_name), sep=",", float_format="%.5f", index=False
    )
    pivot = pdf.pivot_table(values=metric, index="k1", columns="b")[::-1] * 100
    try:  # optional plotting stack — absent in this container
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        # fresh figure + explicit close: the reference is a one-shot script,
        # but this is a reusable library call — drawing on the implicit
        # current axes would overlay successive grids in one process
        fig, ax = plt.subplots()
        sns.heatmap(
            pivot, annot=True, cmap="YlOrBr", fmt=".1f", cbar=False,
            vmin=vmin, vmax=vmax, ax=ax,
        )
        fig.savefig(os.path.join(output_dir, "bm25_tuning_heatmap.pdf"))
        plt.close(fig)
    except ImportError:
        # data pre-rounded to the heatmap's 1 decimal; no float_format — it
        # would also reformat the b COLUMN LABELS (0.75 → '0.8')
        pivot.round(1).to_csv(os.path.join(output_dir, "bm25_tuning_heatmap.csv"))
    return pivot
