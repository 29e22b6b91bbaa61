"""Why impact-ordered blocks cannot prune hot terms here (r10 #4 negative).

Builds the wand_tail fixture shape (2M docs, vocab 200k, dl 70, segment
2^17 — the 1B layout at 1/7 the docs), then measures for the hottest term:

* its idf (the hottest terms have df > N/2 → NEGATIVE idf under the
  reference's floorless BM25 — the only safe upper bound is 0, which
  beats every all-negative top-k threshold, so bound-based skipping can
  never fire for such terms without breaking rank identity);
* the per-segment (max_tf, min_dl) spread (for positive-idf hot terms
  this is the only pruning signal; at 2^17 docs/segment both concentrate
  at their population extremes, leaving a few-percent bound spread);
* the realized top-10 threshold of the solo hot query vs those bounds —
  the hypothetical skip rate of an impact-ordered visit.

Backs the BENCH.md r10 "WAND hot-term tail" section. Reference scoring
semantics: /root/reference/src/retrievers/bm25.py (log10 idf, no floor).

Usage: python tools/analyze_hot_term_bounds.py [n_docs] [vocab] [dl]
(~3 min at the defaults, local[32]). Output: ONE JSON line.
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


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dl = int(sys.argv[3]) if len(sys.argv) > 3 else 70
    out = tempfile.mkdtemp(prefix="hotbound_")
    spark = get_spark(app_name="hot-bound", cores=32, shuffle_partitions=64)
    tok = (
        f"concat('t', cast(floor({vocab} * pow("
        "pmod(xxhash64(concat(cast(id as string), ':', cast(i as string))), 100000)"
        " / 100000.0, 3.0)) as long))"
    )
    docs = (
        spark.range(0, n_docs, numPartitions=64)
        .withColumn("text", F.expr(
            f"concat_ws(' ', transform(sequence(1, {dl}), i -> {tok}))"))
        .select(F.col("id").alias("doc_id"), "text")
    )
    t0 = time.time()
    idx = build_index(docs, doc_id_col="doc_id", text_col="text")
    idx.postings.write.mode("overwrite").parquet(f"{out}/postings")
    idx.docstats.write.mode("overwrite").parquet(f"{out}/docstats")
    disk = _finalize(spark.read.parquet(f"{out}/postings"),
                     spark.read.parquet(f"{out}/docstats"), "bm25")
    disk.termstats.persist().count()
    PackedIndex.from_index(disk, segment_size=2**17,
                           num_partitions="auto").write(f"{out}/mono")
    print(f"build+pack {time.time() - t0:.1f} s", file=sys.stderr)

    store = PackedIndex.read(spark, f"{out}/mono")
    k1, b, k = 2.5, 0.2, 10
    avgdl = store.avgdl

    meta = (spark.read.parquet(f"{out}/mono/blocks")
            .filter(F.col("term") == "t0")
            .select("segment", "max_tf", "min_dl", "n_docs").collect())
    idf = float(store.termstats.filter(F.col("term") == "t0")
                .collect()[0]["idf"])

    def bound(max_tf: int, min_dl: int) -> float:
        # mirrors blocks.py: negative-idf terms can only lower a score
        if idf <= 0:
            return 0.0
        norm = b * min_dl / avgdl
        return idf * (max_tf * (k1 + 1.0)) / (max_tf + k1 * (1.0 - b + norm))

    bounds = np.array([bound(r["max_tf"], r["min_dl"]) for r in meta])
    q = spark.createDataFrame([(1, "t0")], "qid long, question string")
    kth = min(r["score"] for r in wand_search(store, q, k=k, k1=k1, b=b).collect())

    spread = float((bounds.max() - bounds.min()) / bounds.max()) if bounds.max() > 0 else 0.0
    print(json.dumps({
        "term": "t0", "segments": len(meta),
        "postings": int(sum(r["n_docs"] for r in meta)),
        "df_over_n": round(sum(r["n_docs"] for r in meta) / n_docs, 4),
        "idf": round(idf, 6),
        "bound_min": round(float(bounds.min()), 6),
        "bound_max": round(float(bounds.max()), 6),
        "bound_rel_spread": round(spread, 4),
        "kth_score": round(kth, 6),
        "skippable_segments": int((bounds < kth).sum()),
        "skip_rate": round(float((bounds < kth).mean()), 4),
        "max_tf_values": sorted({int(r["max_tf"]) for r in meta}),
        "min_dl_values": sorted({int(r["min_dl"]) for r in meta}),
    }))
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
