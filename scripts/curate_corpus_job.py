"""spark-submit entry point: training-data curation pipeline.

Usage (same launch mechanism as the index build):
    scripts/submit.sh scripts/curate_corpus_job.py \
        --input /path/documents.parquet --output /path/curated \
        [--min-quality 0.05] [--jaccard 0.6] [--budget-col lang]

Runs fusion_spark.pipeline.curate_corpus (quality gate → exact dedup →
banded-LSH near-dup removal), writes the curated corpus as parquet, and
prints the per-group token budget of the survivors as one JSON line per
group — the artifacts a pretraining data run consumes.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.05)
    ap.add_argument("--jaccard", type=float, default=0.6)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--budget-col", default=None, help="group column for the survivor token budget")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fusion_spark.extras.textstats import token_budget
    from fusion_spark.pipeline import curate_corpus

    spark = SparkSession.builder.appName("curate-corpus").getOrCreate()
    docs = spark.read.parquet(args.input)
    survivors = curate_corpus(
        docs,
        text_col=args.text_col,
        doc_id_col=args.doc_id_col,
        min_quality=args.min_quality,
        jaccard_threshold=args.jaccard,
    )
    curated = docs.join(
        survivors.select("doc_id", "quality"),
        docs[args.doc_id_col] == survivors["doc_id"],
        "left_semi",
    )
    curated.write.mode("overwrite").parquet(args.output)
    n_in, n_out = docs.count(), spark.read.parquet(args.output).count()
    print(json.dumps({"docs_in": n_in, "docs_out": n_out, "dropped": n_in - n_out}))
    if args.budget_col:
        for r in token_budget(
            spark.read.parquet(args.output), group_col=args.budget_col, text_col=args.text_col
        ).collect():
            print(json.dumps(r.asDict()))
    spark.stop()


if __name__ == "__main__":
    main()
