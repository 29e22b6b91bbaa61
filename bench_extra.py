"""Round-11 profiling companion to the FROZEN bench.py (guide §1).

Mirrors bench.py's six timed queries exactly (same session config, same
inputs, same materialization sinks), but additionally:
  * labels every job (`setJobDescription`) so event logs/UI are readable,
  * writes `.explain("formatted")` for each query to plans/r11/<q>_<tag>.txt,
  * runs each query N times and prints min/median per query as JSON.

Usage:
  python bench_extra.py [--sf-dir DIR] [--repeats N] [--tag before|after]
                        [--plans-dir plans/r11] [--only q1,q2]

bench.py itself is the artifact of record and is not touched (the driver
times the round with the round-start copy); this file exists so per-change
A/B numbers and plan diffs can be produced without editing it.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _capture_plan(df, path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    with open(path, "w") as f:
        f.write(plan)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--tag", default=None, help="if set, save plans as plans/r11/<q>_<tag>.txt")
    ap.add_argument("--plans-dir", default="plans/r11")
    ap.add_argument("--only", default=None, help="comma-separated query subset")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from pyspark.sql import functions as F

    from fusion_spark import fusion as fz
    from fusion_spark.extras import dedup, similarity
    from fusion_spark.indexing import build_index
    from fusion_spark.metrics import metrics_per_query
    from fusion_spark.scoring import search
    from fusion_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="fusion-spark-bench-extra", cores=cpus)
    sc = spark.sparkContext
    sf_dir = args.sf_dir

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .repartition(int(cpus) * 2 if str(cpus).isdigit() else 32, "doc_id")
        .cache()
    )
    n_docs = docs.count()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}

    def timed(name, repeats=args.repeats, plan_df=None):
        def deco(fn):
            if only is not None and name not in only:
                return
            sc.setJobDescription(f"bench_extra:{name}")
            if args.tag and plan_df is not None:
                _capture_plan(plan_df(), os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"))
            fn()  # untimed warmup, as in bench.py
            secs = []
            for _ in range(repeats):
                t0 = time.perf_counter()
                fn()
                secs.append(time.perf_counter() - t0)
            timings[name] = round(min(secs), 3)
            medians[name] = round(statistics.median(secs), 3)
            sc.setJobDescription(None)
            print(f"# {name}: min={timings[name]} median={medians[name]} all={[round(s,3) for s in secs]}",
                  file=sys.stderr)

        return deco

    idx_holder = {}

    @timed("index_build", plan_df=lambda: build_index(docs).postings)
    def _build():
        prev = idx_holder.pop("idx", None)
        if prev is not None:
            prev.unpersist()
        idx = build_index(docs, doc_id_col="doc_id", text_col="text")
        idx.persist()
        idx.postings.count()
        idx_holder["idx"] = idx

    if "idx" not in idx_holder:  # --only subset skipped the build: still need an index
        idx_holder["idx"] = build_index(docs).persist()
        idx_holder["idx"].postings.count()
    idx = idx_holder["idx"]

    vocab = [r["term"] for r in idx.termstats.orderBy(F.desc("df")).limit(24).collect()]
    qrows = [(i, " ".join(vocab[(i + j) % len(vocab)] for j in range(4))) for i in range(64)]
    queries = spark.createDataFrame(qrows, "qid long, question string")

    ranked = search(idx, queries, k=1000, k1=2.5, b=0.2).cache()

    @timed("bm25_search_top1000", plan_df=lambda: search(idx, queries, k=1000, k1=2.5, b=0.2))
    def _search():
        ranked.unpersist()
        ranked.cache().count()

    legs = ranked.withColumn("system", F.lit("bm25")).unionByName(
        ranked.withColumn("system", F.lit("leg2")).withColumn("score", F.col("score") * 0.7 + 0.1)
    ).select("system", "qid", "doc_id", "score", "rank")

    @timed("fusion_rrf_plus_nsf", plan_df=lambda: fz.fuse(legs, method="rrf", return_topk=100))
    def _fuse():
        fz.fuse(legs, method="rrf", return_topk=100).count()
        fz.fuse(legs, method="nsf", normalization="z-score",
                weights={"bm25": 0.5, "leg2": 0.5}, return_topk=100).count()

    qrels = queries.select("qid").crossJoin(docs.select("doc_id")).filter(
        F.pmod(F.col("doc_id"), F.lit(97)) == F.pmod(F.col("qid") * 7, F.lit(97))
    )

    def _metrics_df():
        return metrics_per_query(
            ranked.select("qid", "doc_id", "rank"), qrels,
            recall_k=(10, 100), map_k=(10,), mrr_k=(10,), ndcg_k=(10,),
        )

    @timed("ir_metrics", plan_df=_metrics_df)
    def _metrics():
        _metrics_df().write.format("noop").mode("overwrite").save()

    def _dedup_df():
        sigs = dedup.minhash_signatures(docs, n=3, num_hashes=8)
        return dedup.lsh_candidate_pairs(sigs, band_size=2)

    @timed("minhash_lsh_dedup", plan_df=_dedup_df)
    def _dedup():
        _dedup_df().count()

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = embs.filter("vec_id < 16").select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )

    @timed("cosine_topk", plan_df=lambda: similarity.cosine_topk(embs, qv, k=10))
    def _cos():
        similarity.cosine_topk(embs, qv, k=10).count()

    print(json.dumps({
        "metric": "bench_extra_sec", "value": round(sum(timings.values()), 3),
        "unit": "sec", "queries": timings, "queries_median": medians,
        "n_docs": n_docs, "sf_dir": sf_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
