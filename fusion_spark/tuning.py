"""Hyperparameter tuning — the reference's grid searches as driver loops over
one cached index / one cached score-list table.

  * BM25 k1/b grid (bm25.py:215-246): 17×11 = 187 combos, k1∈[0,8] step .5,
    b∈[0,1] step .1. The index is built ONCE (tf/df/idf/dl are k1/b-
    independent, bm25.py:219,234); each combo re-runs only the scoring query
    with new literals — Catalyst replans, the cached postings are reused.
  * NSF linear-weight simplex grid (hybrid.py:404-426): step-0.05 weight
    vectors summing to 1 over the fused systems; each combo reuses the
    cached per-system score lists.

Both return a tidy metrics DataFrame (the reference's CSV grid sink, S8).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
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


def weight_simplex(systems: list[str], step: float = 0.05) -> list[dict[str, float]]:
    """All step-grid weight vectors over `systems` summing to 1
    (hybrid.py:404-408 semantics, float-safe)."""
    n = round(1 / step)
    out = []
    for combo in itertools.product(range(n + 1), repeat=len(systems)):
        if sum(combo) == n:
            out.append({s: c * step for s, c in zip(systems, combo)})
    return out


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
    return spark.createDataFrame(rows)
