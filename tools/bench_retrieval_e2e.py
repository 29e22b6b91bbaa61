"""Composed at-size RETRIEVAL run (r9 verdict #8 — the retrieval analogue
of the standing composed 12M curation artifact).

Every retrieval-side knob in ONE session over a 14.4M-doc corpus:

  build (tokenize → postings/docstats)
    → pack(segment_size="auto", num_partitions="auto")   [both r9 defaults]
    → block-max WAND top-1000 (the reference's top_k)
    → 3-leg fusion (the reference's hybrid stage: the WAND run is the
      lexical leg; two synthetic system legs derive deterministically from
      its scores, standing in for the dense/ColBERT legs SURVEY rules out)
      via RRF-60 AND NSF z-score
    → ir_metrics (recall/map/mrr/ndcg grid) against deterministic qrels

Walls per phase, one JSON line. Set SPARK_GRAFT_EVENTLOG_DIR and run
tools/audit_event_log.py over it — the done-criterion is 0 findings or
findings triaged by the r9 straggler/hot_key classifier.

Usage: python tools/bench_retrieval_e2e.py [n_docs] [vocab] [dl] [out_dir]
Defaults: 14_400_000 200_000 70 <tmp>.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fusion_spark import fusion as fz  # noqa: E402
from fusion_spark.blocks import PackedIndex, wand_search  # noqa: E402
from fusion_spark.indexing import build_index  # noqa: E402
from fusion_spark.metrics import metrics_per_query  # noqa: E402
from fusion_spark.session import get_spark  # noqa: E402


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 14_400_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dl = int(sys.argv[3]) if len(sys.argv) > 3 else 70
    out_dir = sys.argv[4] if len(sys.argv) > 4 else tempfile.mkdtemp(prefix="rete2e_")

    spark = get_spark(app_name="bench-retrieval-e2e", cores=32,
                      shuffle_partitions=256)
    T: dict[str, float] = {}

    def phase(tag):
        class _P:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                T[tag] = round(time.perf_counter() - self.t0, 1)
                print(f"[phase] {tag}: {T[tag]} s", file=sys.stderr, flush=True)

        return _P()

    tok = (
        f"concat('t', cast(floor({vocab} * pow("
        "pmod(xxhash64(concat(cast(id as string), ':', cast(i as string))), 100000)"
        " / 100000.0, 3.0)) as long))"
    )
    with phase("gen_write_docs"):
        (
            spark.range(0, n_docs, numPartitions=256)
            .withColumn("text", F.expr(
                f"concat_ws(' ', transform(sequence(1, {dl}), i -> {tok}))"))
            .select(F.col("id").alias("doc_id"), "text")
            .write.mode("overwrite").parquet(f"{out_dir}/docs")
        )
    docs = spark.read.parquet(f"{out_dir}/docs")

    with phase("build_index"):
        idx = build_index(docs, doc_id_col="doc_id", text_col="text")
        idx.termstats.persist().count()
        idx.docstats.persist().count()
    with phase("pack_write_store"):
        packed = PackedIndex.from_index(idx, segment_size="auto",
                                        num_partitions="auto")
        packed.write(f"{out_dir}/store")
    store = PackedIndex.read(spark, f"{out_dir}/store")

    # 36 queries: 32 rare-term + 4 hot-term, 4 terms each
    qrows = [(i, " ".join(f"t{vocab - 1 - (i * 7 + j) % (vocab // 4)}" for j in range(4)))
             for i in range(32)]
    qrows += [(100 + i, " ".join(f"t{(i * 3 + j) % 16}" for j in range(4)))
              for i in range(4)]
    queries = spark.createDataFrame(qrows, "qid long, question string")

    with phase("wand_top1000"):
        ranked = wand_search(store, queries, k=1000, k1=2.5, b=0.2).cache()
        n_ranked = ranked.count()

    # three systems: the WAND lexical leg + two deterministic synthetic
    # legs (affine score transforms + rank jitter via doc_id hash) — the
    # hybrid-stage SHAPE at full scale without the out-of-scope encoders
    legs = (
        ranked.withColumn("system", F.lit("bm25"))
        .unionByName(
            ranked.withColumn("system", F.lit("leg2"))
            .withColumn("score", F.col("score") * 0.7 + 0.1)
        )
        .unionByName(
            ranked.withColumn("system", F.lit("leg3"))
            .withColumn("score",
                        F.col("score") + (F.pmod(F.xxhash64("doc_id"), 100) / 1000.0))
        )
        .select("system", "qid", "doc_id", "score", "rank")
    )
    with phase("fusion_rrf"):
        fused_rrf = fz.fuse(legs, method="rrf", return_topk=100).cache()
        fused_rrf.count()
    with phase("fusion_nsf_zscore"):
        fz.fuse(legs, method="nsf", normalization="z-score",
                weights={"bm25": 0.5, "leg2": 0.25, "leg3": 0.25},
                return_topk=100).write.format("noop").mode("overwrite").save()

    # Deterministic qrels: doc is relevant to qid iff doc_id ≡ 7·qid (mod
    # 9973). Written as an explicit broadcast equi-join — the first shape
    # of this (crossJoin + filter) let Catalyst extract the equi-condition
    # but keep join type Cross, which AQE refuses to broadcast-convert:
    # rule C flagged the resulting 576-byte-vs-230MB SortMergeJoin on the
    # first 14.4M run (the audit working as designed; BENCH.md r9).
    qrels = docs.select("doc_id").join(
        F.broadcast(queries.select("qid")),
        F.pmod(F.col("doc_id"), F.lit(9973)) == F.pmod(F.col("qid") * 7, F.lit(9973)),
    )
    with phase("ir_metrics"):
        metrics_per_query(
            fused_rrf.select("qid", "doc_id", "rank"), qrels,
            recall_k=(10, 100), map_k=(10,), mrr_k=(10,), ndcg_k=(10,),
        ).write.format("noop").mode("overwrite").save()

    report = {
        "n_docs": n_docs, "vocab": vocab, "dl": dl,
        "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        # postings count from the store's own block metadata (no postings pass)
        "n_postings": store.blocks.agg(F.sum("n_docs")).collect()[0][0],
        "segment_size": store.segment_size,
        "ranked_rows": n_ranked,
        "phases": T,
        "total_sec": round(sum(T.values()), 1),
    }
    print(json.dumps(report))
    spark.stop()
    if out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
