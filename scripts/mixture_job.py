"""spark-submit entry point: end-to-end training-data MIXTURE pipeline.

Usage:
    scripts/submit.sh scripts/mixture_job.py \
        --input /path/documents.parquet --output /path/mixture \
        [--eval /path/eval.parquet --eval-text-col question] \
        [--budgets '{"python": 2000000, "go": 500000}'] \
        [--group-col lang] [--max-tokens 2048] [--overlap 256] \
        [--split '{"train": 0.98, "dev": 0.01, "test": 0.01}']

Composes the curation/mixture operators into the full pretraining data
path, every stage one of the oracle-verified ops:

    1. curate_corpus       quality gate -> exact dedup -> LSH near-dup
                           removal (connected-components policy);
    2. decontaminate       drop docs sharing token n-grams with the eval
                           set (skipped when --eval is absent);
    3. select_by_token_budget
                           per-group prefix-by-cumsum selection, best
                           quality first, until each group's token budget
                           is filled (all groups, 'remaining' budget, when
                           --budgets is absent);
    4. stratified_split    deterministic md5-bucket train/dev/test;
    5. chunk_documents     overlapping context windows.

Outputs `<output>/chunks` parquet partitioned by split, plus one JSON
line per (split, group) with document/chunk/token counts — the numbers a
data-mixture plan is signed off against.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--eval", default=None)
    ap.add_argument("--eval-text-col", default="question")
    ap.add_argument("--budgets", default=None, help="JSON {group: token budget}")
    ap.add_argument("--group-col", default="lang")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--doc-id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.05)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--overlap", type=int, default=256)
    ap.add_argument("--split", default='{"train": 0.98, "dev": 0.01, "test": 0.01}')
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from fusion_spark.corpus import chunk_documents, stratified_split
    from fusion_spark.pipeline import (
        curate_corpus,
        decontaminate,
        select_by_token_budget,
    )
    from fusion_spark.session import get_spark

    spark = get_spark(app_name="mixture-pipeline")
    docs = spark.read.parquet(args.input)

    survivors = curate_corpus(
        docs, text_col=args.text_col, doc_id_col=args.doc_id_col,
        min_quality=args.min_quality, near_dup_policy="cc",
    )
    # curate_corpus computes its own quality from text and ignores any
    # existing column — drop a pre-existing one or the join duplicates it
    # and select_by_token_budget(order_col="quality") hits an
    # ambiguous-column AnalysisException
    curated = docs.drop("quality").join(
        survivors.select(F.col("doc_id").alias(args.doc_id_col), "quality"),
        args.doc_id_col,
    )

    if args.eval:
        evals = spark.read.parquet(args.eval)
        curated = decontaminate(
            curated, evals, text_col=args.text_col,
            doc_id_col=args.doc_id_col, eval_text_col=args.eval_text_col,
        )

    if args.budgets:
        budgets = {k: int(v) for k, v in json.loads(args.budgets).items()}
    else:
        budgets = {
            r["g"]: 1 << 62
            for r in curated.select(F.col(args.group_col).alias("g")).distinct().collect()
        }
    picked = select_by_token_budget(
        curated, budgets, group_col=args.group_col, text_col=args.text_col,
        doc_id_col=args.doc_id_col, order_col="quality",
    )
    selected = curated.join(
        picked.select(F.col("doc_id").alias(args.doc_id_col)), args.doc_id_col, "left_semi"
    )

    splits = stratified_split(selected, json.loads(args.split), key_col=args.doc_id_col)
    chunks = chunk_documents(
        splits, max_tokens=args.max_tokens, overlap=args.overlap,
        text_col=args.text_col, doc_id_col=args.doc_id_col,
    ).join(
        splits.select(F.col(args.doc_id_col).alias("doc_id"), "split", F.col(args.group_col).alias("grp")),
        "doc_id",
    )
    chunks.write.mode("overwrite").partitionBy("split").parquet(f"{args.output}/chunks")

    report = (
        chunks.groupBy("split", "grp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tokens").alias("total_chunk_tokens"),
        )
        .collect()
    )
    for r in sorted(report, key=lambda r: (r["split"], str(r["grp"]))):
        print(json.dumps({
            "split": r["split"], args.group_col: r["grp"], "n_docs": r["n_docs"],
            "n_chunks": r["n_chunks"], "total_chunk_tokens": r["total_chunk_tokens"],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
