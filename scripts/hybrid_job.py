"""spark-submit entry point: hybrid fusion of per-system ranked lists —
the reference's `run_hybrid.sh` flagship (hybrid.py:310-468) as one job.

    scripts/submit.sh scripts/hybrid_job.py \
        --score-lists /path/score_lists.parquet \
        --fusion nsf --normalization min-max \
        [--weights bm25=0.5,dpr=0.5] [--distributions /path/distr.parquet] \
        --output /path/fused [--qrels /path/qrels.parquet] [--topk 1000]

score_lists: (system string, qid long, doc_id long, score double, rank int)
— the BM25 leg from query_job.py, neural legs as opaque score tables
(SURVEY.md scope ruling). distributions: (system, quantiles array<double>)
from the score-distribution builder, needed for percentile-rank / NCE.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--score-lists", required=True)
    ap.add_argument("--fusion", required=True, choices=["bcf", "rrf", "nsf"])
    ap.add_argument("--normalization", default=None, choices=[
        None, "none", "min-max", "z-score", "arctan", "percentile-rank",
        "normal-curve-equivalent",
    ])
    ap.add_argument("--weights", default=None, help="sys=w,sys=w (default: equal)")
    ap.add_argument("--distributions", default=None)
    ap.add_argument("--output", required=True)
    ap.add_argument("--topk", type=int, default=1000)
    ap.add_argument("--qrels", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fusion_spark import fusion as fz

    spark = SparkSession.builder.appName("fusion-spark-hybrid").getOrCreate()
    score_lists = spark.read.parquet(args.score_lists)

    weights = None
    if args.weights:
        weights = {kv.split("=")[0]: float(kv.split("=")[1]) for kv in args.weights.split(",")}
    distributions = None
    if args.distributions:
        distributions = {
            r["system"]: list(r["quantiles"])
            for r in spark.read.parquet(args.distributions).collect()
        }

    fused = fz.fuse(
        score_lists, method=args.fusion, normalization=args.normalization,
        weights=weights, distributions=distributions, return_topk=args.topk,
    )
    fused.write.mode("overwrite").parquet(args.output)
    out = {"fusion": args.fusion, "normalization": args.normalization,
           "rows": spark.read.parquet(args.output).count()}
    if args.qrels:
        from fusion_spark.metrics import compute_all_metrics

        preds = spark.read.parquet(args.output).select("qid", "doc_id", "rank")
        out["metrics"] = {
            k: round(v, 6)
            for k, v in compute_all_metrics(preds, spark.read.parquet(args.qrels)).items()
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
