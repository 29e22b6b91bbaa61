"""spark-submit entry point: top-k BM25 query job over a built index.

    scripts/submit.sh scripts/query_job.py \
        --index-dir /path/index [--packed] \
        --queries /path/queries.parquet --output /path/ranked \
        --k 1000 --k1 2.5 --b 0.2 [--qrels /path/qrels.parquet]

Reads the resumable posting store (or the packed v2 block store with
--packed), answers all queries in one distributed plan, writes the ranked
lists as parquet, and — when qrels are given — prints the reference metric
grid as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--packed", action="store_true", help="use the packed v2 block store (WAND)")
    ap.add_argument("--queries", required=True, help="parquet with (qid long, question string)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--k1", type=float, default=1.5)
    ap.add_argument("--b", type=float, default=0.75)
    ap.add_argument("--variant", default="bm25", choices=["bm25", "tfidf", "atire"])
    ap.add_argument("--mode", default="simple", choices=["simple", "reference", "code"])
    ap.add_argument("--zero-tail", action="store_true")
    ap.add_argument("--qrels", help="optional parquet with (qid long, article_ids array<long>)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("fusion-spark-query").getOrCreate()
    queries = spark.read.parquet(args.queries)

    t0 = time.perf_counter()
    if args.packed:
        from fusion_spark.blocks import PackedIndex, wand_search

        packed = PackedIndex.read(spark, args.index_dir + "/packed")
        ranked = wand_search(packed, queries, k=args.k, k1=args.k1, b=args.b, mode=args.mode)
    else:
        from fusion_spark.indexing import load_index
        from fusion_spark.scoring import search

        idx = load_index(spark, args.index_dir, variant=args.variant)
        ranked = search(
            idx, queries, k=args.k, k1=args.k1, b=args.b,
            mode=args.mode, zero_tail=args.zero_tail,
        )
    ranked.write.mode("overwrite").parquet(args.output)
    n_queries = queries.count()
    wall = time.perf_counter() - t0
    out = {
        "n_queries": n_queries,
        "wall_sec": round(wall, 3),
        "avg_latency_ms_per_query": round(wall / n_queries * 1000, 2) if n_queries else None,
    }
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
