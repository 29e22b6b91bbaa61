"""Two-cluster-size scaling for the PACK stage (r9 extra evidence).

The north rule's N→4N criterion is standing-measured for the index BUILD
(bench.py's scaling section, local[2] vs local[8] — the honest pair on
this host, see BENCH.md "Why the 2→8 pair"). Since r9 the pack stage is
the other first-class physical step (`num_partitions="auto"` default);
this tool measures the SAME pack job — identical input, identical
resolved (segment_size, num_partitions) — at both parallelism levels.

Protocol notes mirroring bench.py's scaling worker:
  * fresh subprocess JVM per level (no cross-level JIT/cache bleed),
  * SPARK_DRIVER_MEMORY=8g at BOTH levels (8g measured faster than
    32g for these string/shuffle-heavy jobs; constant per level),
  * `pack_shuffle_partitions` floors at cores*2 but 99.2M postings
    resolves to 64 at both 2 and 8 cores — the shuffle layout is
    byte-identical, only the executor-thread count differs,
  * long walls (minutes) so bursty host steal averages out; the wall is
    single-shot per level with the per-stage breakdown printed.

Usage: python tools/bench_pack_scaling.py [n_docs] [vocab] [dl]
Defaults: 2_000_000 200_000 50  (the standing 99.2M-posting r7/r8 corpus)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(data_dir: str, cores: int) -> None:
    from fusion_spark.blocks import PackedIndex, _resolve_pack_params
    from fusion_spark.indexing import _finalize
    from fusion_spark.session import get_spark

    spark = get_spark(app_name=f"pack-scale-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8))
    idx = _finalize(
        spark.read.parquet(f"{data_dir}/postings"),
        spark.read.parquet(f"{data_dir}/docstats"),
        "bm25",
    )
    idx.termstats.persist().count()
    seg, parts = _resolve_pack_params(idx, "auto", "auto")
    out = tempfile.mkdtemp(prefix=f"packscale{cores}_")
    t0 = time.perf_counter()
    PackedIndex.from_index(idx, segment_size=seg, num_partitions=parts).write(out)
    wall = time.perf_counter() - t0
    n_post = int(idx.postings.count())
    shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"cores": cores, "pack_sec": round(wall, 1),
                      "segment_size": seg, "num_partitions": parts,
                      "n_postings": n_post}))
    spark.stop()


def main() -> None:
    if "--worker" in sys.argv:
        worker(sys.argv[2], int(sys.argv[3]))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dl = int(sys.argv[3]) if len(sys.argv) > 3 else 50

    from pyspark.sql import functions as F

    from fusion_spark.indexing import build_index
    from fusion_spark.session import get_spark

    data_dir = tempfile.mkdtemp(prefix="packscale_data_")
    spark = get_spark(app_name="pack-scale-gen", cores=32,
                      shuffle_partitions=64)
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
    idx = build_index(docs, doc_id_col="doc_id", text_col="text")
    idx.postings.write.mode("overwrite").parquet(f"{data_dir}/postings")
    idx.docstats.write.mode("overwrite").parquet(f"{data_dir}/docstats")
    spark.stop()

    lo, hi = (int(x) for x in
              os.environ.get("SPARK_GRAFT_SCALE_CORES", "2,8").split(","))
    report: dict = {"n_docs": n_docs, "vocab": vocab, "dl": dl,
                    "cores_low": lo, "cores_high": hi}
    for cores in (lo, hi):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             data_dir, str(cores)],
            capture_output=True, text=True, timeout=3600,
            env={**os.environ, "SPARK_DRIVER_MEMORY": "8g"},
        )
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        rec = json.loads(line)
        tag = "low" if cores == lo else "high"
        report[f"pack_sec_{tag}"] = rec["pack_sec"]
        report[f"postings_per_sec_{tag}"] = round(
            rec["n_postings"] / rec["pack_sec"], 0)
        # the cores*2 floor can bind at toy sizes and split the levels'
        # layouts — record both so an incomparable pair is visible
        report[f"num_partitions_{tag}"] = rec["num_partitions"]
        report["segment_size"] = rec["segment_size"]
        report["n_postings"] = rec["n_postings"]
        print(f"[level] cores={cores}: {rec['pack_sec']} s", file=sys.stderr,
              flush=True)
    report["efficiency"] = round(
        (report["postings_per_sec_high"] / report["postings_per_sec_low"])
        / (hi / lo), 3)
    report["layout_identical"] = (
        report["num_partitions_low"] == report["num_partitions_high"])
    print(json.dumps(report))
    shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
