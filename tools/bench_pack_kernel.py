"""A/B the pack kernels at the standing 99.2M-posting fixture (r10 #1).

The r9 control proved the lexsort kernel memory-bandwidth-bound
(np.lexsort + 5-column gather over ~100 MB/task on one memory bus: the
2→8-core pack pair read 0.49 while a no-Spark multiprocessing control
showed the host delivers only ~0.71-0.78 for that kernel). The r10
"sorted" kernel moves the sort into Spark's reduce-side Tungsten sort
(binary rows, spill-capable, overlapped with shuffle read) and streams
Arrow batches through a boundary/reduceat/varint pass — no lexsort, no
gather, O(batch) Python memory.

This tool measures both kernels on the IDENTICAL input, resolved knobs
and write path, then proves block-set identity between the two written
stores with one order-independent hash aggregate per store (block sets
equal ⟹ every WAND/exact query result equal — blobs and impact bounds
are the store). Optionally (--scaling) re-runs the north-rule 2→8-core
pair for the sorted kernel to compare against the r9 0.49 reading.

Usage: python tools/bench_pack_kernel.py [n_docs] [vocab] [dl] [--scaling]
Defaults: 2_000_000 200_000 50  (the standing 99.2M-posting fixture).
Output: ONE JSON line on stdout.
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


def worker(data_dir: str, cores: int, strategy: str, out: str) -> None:
    from fusion_spark.blocks import PackedIndex, _resolve_pack_params
    from fusion_spark.indexing import _finalize
    from fusion_spark.session import get_spark

    spark = get_spark(app_name=f"pack-ab-{strategy}-{cores}", cores=cores,
                      shuffle_partitions=max(cores * 2, 8),
                      # bigger Arrow batches: the sorted kernel streams
                      # per-batch (carry concat + factorize + encoder setup
                      # are per-batch costs); 128k rows ≈ 6 MB — far under
                      # the per-task budget, 13× fewer Python roundtrips
                      extra_conf={
                          "spark.sql.execution.arrow.maxRecordsPerBatch":
                              "131072"})
    idx = _finalize(
        spark.read.parquet(f"{data_dir}/postings"),
        spark.read.parquet(f"{data_dir}/docstats"),
        "bm25",
    )
    idx.termstats.persist().count()
    seg, parts = _resolve_pack_params(idx, "auto", "auto")
    t0 = time.perf_counter()
    PackedIndex.from_index(idx, segment_size=seg, num_partitions=parts,
                           strategy=strategy).write(out)
    wall = time.perf_counter() - t0
    n_post = int(idx.postings.count())
    print(json.dumps({"strategy": strategy, "cores": cores,
                      "pack_sec": round(wall, 1), "segment_size": seg,
                      "num_partitions": parts, "n_postings": n_post}))
    spark.stop()


def compare(store_a: str, store_b: str) -> None:
    """Order-independent block-set fingerprint per store: count + the sum
    of a 64-bit row hash over ALL block columns (wraparound sum over a
    set — collision-safe enough for identity evidence; any differing
    block flips the sum with probability 1-2^-64)."""
    from pyspark.sql import functions as F

    from fusion_spark.session import get_spark

    spark = get_spark(app_name="pack-ab-compare", cores=8,
                      shuffle_partitions=16)
    cols = ["term", "segment", "n_docs", "max_tf", "min_dl",
            "doc_blob", "tf_blob", "dl_blob"]
    out = {}
    for tag, p in (("a", store_a), ("b", store_b)):
        row = (
            spark.read.parquet(f"{p}/blocks")
            .agg(F.count("*").alias("n"),
                 # decimal sum: ANSI mode (Spark 4 default) raises on long
                 # wraparound; decimal(38,0) holds 2^63·n_blocks exactly
                 F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"))
            .collect()[0]
        )
        out[tag] = {"n_blocks": int(row["n"]), "hash_sum": int(row["h"])}
    out["identical"] = (out["a"] == out["b"])
    print(json.dumps(out))
    spark.stop()


def _run(args: list[str], env: dict | None = None) -> dict:
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), *args],
        capture_output=True, text=True, timeout=3600,
        env={**os.environ, **(env or {})},
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        print(proc.stdout[-2000:], file=sys.stderr)
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"worker failed: {args}")
    return json.loads(lines[-1])


def main() -> None:
    if "--worker" in sys.argv:
        worker(sys.argv[2], int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return
    if "--compare" in sys.argv:
        compare(sys.argv[2], sys.argv[3])
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_docs = int(args[0]) if len(args) > 0 else 2_000_000
    vocab = int(args[1]) if len(args) > 1 else 200_000
    dl = int(args[2]) if len(args) > 2 else 50
    do_scaling = "--scaling" in sys.argv

    from pyspark.sql import functions as F

    from fusion_spark.indexing import build_index
    from fusion_spark.session import get_spark

    data_dir = tempfile.mkdtemp(prefix="packab_data_")
    spark = get_spark(app_name="pack-ab-gen", cores=32, shuffle_partitions=64)
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

    report: dict = {"n_docs": n_docs, "vocab": vocab, "dl": dl, "cores": 32}
    stores = {}
    try:
        for strategy in ("lexsort", "sorted"):
            out = tempfile.mkdtemp(prefix=f"packab_{strategy}_")
            stores[strategy] = out
            rec = _run(["--worker", data_dir, "32", strategy, out],
                       env={"SPARK_DRIVER_MEMORY": "8g"})
            report[f"{strategy}_sec"] = rec["pack_sec"]
            report[f"postings_per_sec_{strategy}"] = round(
                rec["n_postings"] / rec["pack_sec"], 0)
            report["n_postings"] = rec["n_postings"]
            report["segment_size"] = rec["segment_size"]
            report["num_partitions"] = rec["num_partitions"]
            print(f"[ab] {strategy}: {rec['pack_sec']} s", file=sys.stderr,
                  flush=True)
        report["speedup_sorted_vs_lexsort"] = round(
            report["lexsort_sec"] / report["sorted_sec"], 3)
        cmp_rec = _run(["--compare", stores["lexsort"], stores["sorted"]])
        report["block_set_identical"] = cmp_rec["identical"]
        report["n_blocks"] = cmp_rec["a"]["n_blocks"]

        if do_scaling:
            # scale BOTH kernels in the same host window — the r9 lexsort
            # 0.49 reading came from a different session; cross-window
            # comparisons of this memory-bandwidth-bound kernel are noise
            lo, hi = (int(x) for x in os.environ.get(
                "SPARK_GRAFT_SCALE_CORES", "2,8").split(","))
            for strategy in ("lexsort", "sorted"):
                for cores, tag in ((lo, "low"), (hi, "high")):
                    out = tempfile.mkdtemp(prefix=f"packab_s{cores}_")
                    try:
                        rec = _run(
                            ["--worker", data_dir, str(cores), strategy, out],
                            env={"SPARK_DRIVER_MEMORY": "8g"})
                    finally:
                        shutil.rmtree(out, ignore_errors=True)
                    report[f"{strategy}_sec_{tag}"] = rec["pack_sec"]
                    report[f"{strategy}_pps_{tag}"] = round(
                        rec["n_postings"] / rec["pack_sec"], 0)
                    print(f"[scaling] {strategy} cores={cores}: "
                          f"{rec['pack_sec']} s", file=sys.stderr, flush=True)
                report[f"{strategy}_scaling_efficiency"] = round(
                    (report[f"{strategy}_pps_high"]
                     / report[f"{strategy}_pps_low"]) / (hi / lo), 3)
    finally:
        for p in stores.values():
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
