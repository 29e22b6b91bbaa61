"""IVF at size WITHOUT planted structure (r9 verdict #4).

The r8 10M ANN proof planted 256 well-separated clusters and handed the
writer their true centers — it proved the STORE (pruning, latency), not the
TRAINING. Real embeddings are messier; this bench runs Lloyd training
(`train_ivf_centroids(lloyd_iters>0)`) at 10M vectors on a corpus with:

  * Zipf(s=1.1)-weighted cluster sizes over `latent` hidden centers (the
    head cluster holds ~7% of all rows — a genuine hot list),
  * 20% uniform background vectors carrying no cluster structure,
  * noise 0.5 (vs the planted bench's 0.25) so clusters overlap.

Sweep: n_centroids ∈ {64, 256, 1024} — each trained with lloyd_iters=2 on a
10% sample (`train_fraction`), stored, then measured at n_probe ∈
{1, 4, 8, 16}: recall@10 / top-1 vs exact brute force, ms/query (best-of-2
warm), store bytes read. One extra store isolates the training value:
n_centroids=256 with lloyd_iters=0 (raw seed centroids).

The run validates `auto_n_centroids` (the n_centroids="auto" heuristic,
~10k rows/list): its pick must land within ~10% of the hand-tuned sweep's
best recall-at-equal-read-budget point (BENCH.md r9 records the table).

Usage: python tools/bench_ivf_messy.py [n] [dim] [latent] [out_dir]
Defaults: 10_000_000 64 512 <tmp>.
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import bench_ann  # noqa: E402  (sibling tool: shared deterministic generators)
from pyspark.sql import functions as F  # noqa: E402

from fusion_spark.extras import similarity  # noqa: E402
from fusion_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    latent = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    out_dir = sys.argv[4] if len(sys.argv) > 4 else tempfile.mkdtemp(prefix="ivfmessy_")

    spark = get_spark(app_name="bench-ivf-messy", cores=32)
    # gen_messy_vectors' closure references bench_ann module functions;
    # executor Python workers don't have tools/ on their path — ship it
    # (the spark-submit --py-files shape of the north rule, in miniature)
    spark.sparkContext.addPyFile(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_ann.py")
    )
    t0 = time.perf_counter()
    vecs = bench_ann.gen_messy_vectors(spark, n, dim, latent)
    base = f"{out_dir}/base"
    vecs.write.mode("overwrite").parquet(base)
    embs = spark.read.parquet(base)
    gen_sec = time.perf_counter() - t0

    # 64 queries from the same mixture at held-out ids (> n), nudged noise:
    # Zipf puts most of them in head clusters, a few in tail/background —
    # the realistic query load for a corpus-shaped index
    qids = np.arange(1, 65, dtype=np.uint64) * np.uint64(2**40)
    Cmat = bench_ann.centers_matrix(latent, dim)
    cl, bg = bench_ann.messy_params(qids, latent, 1.1, 0.2)
    qvecs = Cmat[cl] + 0.5 * bench_ann._unit_noise(qids, dim)
    bgv = 1.2 * bench_ann._unit_noise(qids ^ np.uint64(0xFACE), dim)
    qvecs = np.where(bg[:, None], bgv, qvecs)
    queries = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in zip(qids, qvecs)],
        "qid long, qvec array<float>",
    ).cache()
    queries.count()

    report: dict = {
        "n_vectors": n, "dim": dim, "latent_clusters": latent,
        "zipf_s": 1.1, "background_frac": 0.2, "noise": 0.5,
        "gen_sec": round(gen_sec, 1),
        "auto_n_centroids": similarity.auto_n_centroids(n),
        "runs": {},
    }

    # exact ground truth (one pass — latency floor measured in bench_ann)
    t0 = time.perf_counter()
    brute_rows = similarity.cosine_topk(embs, queries, k=10).collect()
    report["brute_sec"] = round(time.perf_counter() - t0, 1)
    truth: dict[int, list[int]] = {}
    for r in brute_rows:
        truth.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
    truth = {q: [v for _, v in sorted(rs)] for q, rs in truth.items()}

    def quality(rows):
        got: dict[int, list] = {}
        for r in rows:
            got.setdefault(r["qid"], []).append((r["rank"], r["vec_id"]))
        got = {q: [v for _, v in sorted(rs)] for q, rs in got.items()}
        rec = [len(set(got.get(q, [])) & set(truth[q])) / len(truth[q]) for q in truth]
        top1 = [bool(got.get(q)) and got[q][0] == truth[q][0] for q in truth]
        return round(float(np.mean(rec)), 4), round(float(np.mean(top1)), 4)

    def run_store(tag: str, n_centroids: int, lloyd_iters: int):
        path = f"{out_dir}/ivf_{tag}"
        t0 = time.perf_counter()
        cents = similarity.train_ivf_centroids(
            embs, n_centroids, lloyd_iters=lloyd_iters, train_fraction=0.1,
        )
        train_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        similarity.write_ivf_store(embs, path, centroids=cents)
        write_sec = time.perf_counter() - t0
        entry: dict = {
            "n_centroids": n_centroids, "lloyd_iters": lloyd_iters,
            "train_sec": round(train_sec, 1), "write_sec": round(write_sec, 1),
            "probes": {},
        }
        for n_probe in (1, 4, 8, 16):
            best, rows = None, None
            for _ in range(2):
                t0 = time.perf_counter()
                rows = similarity.ivf_cosine_topk_store(
                    spark, path, queries, k=10, n_probe=n_probe
                ).collect()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            rec, top1 = quality(rows)
            # observed read fraction from the store's own layout
            probe_udf = similarity._probe_ids_udf(cents, n_probe)
            probe_rows = queries.select(
                "qid", F.explode(probe_udf(F.col("qvec"))).alias("c")).collect()
            per_q: dict[int, set[str]] = {}
            for r in probe_rows:
                per_q.setdefault(r["qid"], set()).add(str(r["c"]))
            probed = {c for sset in per_q.values() for c in sset}
            ft, bt, fk, bk, by_part = bench_ann.store_file_stats(
                f"{path}/vectors", probed, "centroid")
            per_q_frac = float(np.mean(
                [sum(by_part.get(c, 0) for c in sset) / bt for sset in per_q.values()]))
            entry["probes"][str(n_probe)] = {
                "ms_per_query": round(1000 * best / 64, 1),
                "recall_at_10": rec, "top1_hit": top1,
                "per_query_bytes_read_frac": round(per_q_frac, 5),
                "batch_bytes_read_frac": round(bk / bt, 4),
            }
        report["runs"][tag] = entry
        # free the store before the next config (3 stores ≈ 3× corpus bytes)
        shutil.rmtree(path, ignore_errors=True)

    run_store("c256_lloyd0", 256, 0)
    # bracketing auto_n_centroids (1024 at 10M): one coarser, one finer.
    # The 200k smoke showed recall AT FIXED READ BUDGET improves with C
    # (finer lists aim the reads better) — the at-size sweep bounds where
    # write cost / small-file overhead turns that around.
    for c in (256, 1024, 2048):
        run_store(f"c{c}_lloyd2", c, 2)

    print(json.dumps(report))
    spark.stop()
    if out_dir.startswith(tempfile.gettempdir()):
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
