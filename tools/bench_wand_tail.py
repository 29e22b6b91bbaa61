"""Per-query WAND latency split: rare-term vs hot-term tail (r10 #4).

The r9 1B proof reported only the 36-query BATCH wall (3.17 s) with 4
hot-term queries mixed in — if hot terms dominate, the batch number hides
a fat tail. This tool runs every query SOLO (best-of-N warm) against a
packed store and reports the rare/hot populations separately, plus an
overhead floor measured with a no-op query (a term absent from the vocab:
same tokenize + census + window machinery, zero blocks decoded) so the
per-query numbers can be read net of fixed job overhead.

Reuses a bench_scale1b out_dir when given (docs/postings/docstats/mono
already on disk — the 1B store builds once); otherwise generates the
standing fixture at the requested size.

Usage:
  python tools/bench_wand_tail.py [n_docs] [vocab] [dl] [out_dir] [--keep]
Defaults: 2_000_000 200_000 50 <tmp>  (99.2M postings; pass a scale1b
out_dir with 14_400_000 ... for the 1B reading). --keep skips cleanup so
a later run can reuse the store.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fusion_spark.blocks import PackedIndex, wand_search  # noqa: E402
from fusion_spark.indexing import _finalize, build_index  # noqa: E402
from fusion_spark.session import get_spark  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv
    n_docs = int(args[0]) if len(args) > 0 else 2_000_000
    vocab = int(args[1]) if len(args) > 1 else 200_000
    dl = int(args[2]) if len(args) > 2 else 50
    out_dir = args[3] if len(args) > 3 else tempfile.mkdtemp(prefix="wandtail_")

    spark = get_spark(app_name="bench-wand-tail", cores=32,
                      shuffle_partitions=64)
    tok = (
        f"concat('t', cast(floor({vocab} * pow("
        "pmod(xxhash64(concat(cast(id as string), ':', cast(i as string))), 100000)"
        " / 100000.0, 3.0)) as long))"
    )
    have_build = all(os.path.exists(f"{out_dir}/{d}/_SUCCESS")
                     for d in ("postings", "docstats"))
    if not have_build:
        docs = (
            spark.range(0, n_docs, numPartitions=256)
            .withColumn("text", F.expr(
                f"concat_ws(' ', transform(sequence(1, {dl}), i -> {tok}))"))
            .select(F.col("id").alias("doc_id"), "text")
        )
        idx = build_index(docs, doc_id_col="doc_id", text_col="text")
        idx.postings.write.mode("overwrite").parquet(f"{out_dir}/postings")
        idx.docstats.write.mode("overwrite").parquet(f"{out_dir}/docstats")
    disk_idx = _finalize(
        spark.read.parquet(f"{out_dir}/postings"),
        spark.read.parquet(f"{out_dir}/docstats"),
        "bm25",
    )
    disk_idx.termstats.persist().count()
    if not os.path.exists(f"{out_dir}/mono/meta.json"):
        PackedIndex.from_index(disk_idx, segment_size="auto",
                               num_partitions="auto").write(f"{out_dir}/mono")
    store = PackedIndex.read(spark, f"{out_dir}/mono")
    store.termstats.persist().count()

    # the scale1b query mix, labeled: 32 rare-term + 4 hot-term
    rare = [(i, " ".join(f"t{vocab - 1 - (i * 7 + j) % (vocab // 4)}"
                         for j in range(4))) for i in range(32)]
    hot = [(100 + i, " ".join(f"t{(i * 3 + j) % 16}" for j in range(4)))
           for i in range(4)]

    def solo_ms(qid: int, text: str, reps: int = 3) -> float:
        q = spark.createDataFrame([(qid, text)], "qid long, question string")
        best = None
        for _ in range(reps):
            t0 = time.perf_counter()
            wand_search(store, q, k=10, k1=2.5, b=0.2).collect()
            dt = (time.perf_counter() - t0) * 1000
            best = dt if best is None else min(best, dt)
        return round(best, 1)

    # overhead floor: a term no generator can emit — full job machinery,
    # zero matching blocks
    overhead_ms = solo_ms(999_999, "zz_not_in_vocab_zz")

    per_query = {}
    for qid, text in rare + hot:
        per_query[str(qid)] = solo_ms(qid, text)
        print(f"[q] {qid}: {per_query[str(qid)]} ms", file=sys.stderr, flush=True)

    def stats(items):
        a = np.array(items, dtype=np.float64)
        return {
            "n": int(a.size),
            "p50_ms": round(float(np.percentile(a, 50)), 1),
            "p99_ms": round(float(np.percentile(a, 99)), 1),
            "max_ms": round(float(a.max()), 1),
            "p50_net_ms": round(float(np.percentile(a, 50)) - overhead_ms, 1),
            "max_net_ms": round(float(a.max()) - overhead_ms, 1),
        }

    rare_ms = [per_query[str(q)] for q, _ in rare]
    hot_ms = [per_query[str(q)] for q, _ in hot]

    # batch reference (the number r9 reported)
    qall = spark.createDataFrame(rare + hot, "qid long, question string")
    batch_best = None
    for _ in range(2):
        t0 = time.perf_counter()
        wand_search(store, qall, k=10, k1=2.5, b=0.2).collect()
        dt = time.perf_counter() - t0
        batch_best = dt if batch_best is None else min(batch_best, dt)

    # hot-term block exposure, from store metadata only: how many blocks /
    # postings each hot query is OBLIGED to consider before skipping
    hot_terms = sorted({t for _, text in hot for t in text.split()})
    exposure = (
        store.blocks.filter(F.col("term").isin(hot_terms))
        .agg(F.count("*").alias("blocks"), F.sum("n_docs").alias("postings"))
        .collect()[0]
    )

    report = {
        "n_docs": n_docs, "vocab": vocab, "dl": dl,
        "n_postings": int(disk_idx.postings.count()),
        "segment_size": store.segment_size,
        "overhead_ms": overhead_ms,
        "rare": stats(rare_ms),
        "hot": stats(hot_ms),
        "hot_over_rare_net": round(
            (max(hot_ms) - overhead_ms) / max(
                float(np.percentile(np.array(rare_ms), 50)) - overhead_ms, 0.1), 2),
        "batch36_sec": round(batch_best, 2),
        "hot_term_blocks": int(exposure["blocks"]),
        "hot_term_postings": int(exposure["postings"]),
        "per_query_ms": per_query,
    }
    print(json.dumps(report))
    spark.stop()
    if not keep and out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
