"""Stretch r5→r6: the FULL reference-shape 187-combo k1/b grid (17×11,
bm25.py:227-229) end-to-end at sf0.1 — `bm25_grid_fused` one-plan sweep →
`write_grid_artifacts` (reference CSV + heatmap pivot) — with the CSV's
sha256 recorded so the artifact BYTES, not just the 2.7 s wall claim, are
pinned round-over-round (the small-scale byte-parity fixture in
test_tuning covers the writer; this covers the whole sf0.1 workflow).

Queries/qrels mirror the driver gate's deterministic set (QUERY_SET +
doc_id % 37 == (qid*5) % 37), so the run needs nothing but the testdata.

Usage: python tools/bench_grid_artifact.py [sf_dir] [out_dir]
Prints one JSON line with walls, grid shape, and the CSV sha256.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from fusion_spark.session import get_spark  # noqa: E402
from fusion_spark.tuning import bm25_grid_fused, write_grid_artifacts  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="grid_")
    spark = get_spark(app_name="grid-artifact-bench", cores=16)

    t0 = time.time()
    idx = entry._index(spark, sf_dir, "bm25")
    idx.postings.count()  # materialize the cached index outside the sweep wall
    wall_index = round(time.time() - t0, 2)

    t0 = time.time()
    grid = bm25_grid_fused(
        idx,
        entry._queries_df(spark),
        entry._qrels(spark, sf_dir),
        # defaults = the reference's full 187-combo grid + k ladder
    ).cache()
    n_combos = grid.count()
    wall_sweep = round(time.time() - t0, 2)

    t0 = time.time()
    write_grid_artifacts(grid, out_dir, metric="recall_100")
    wall_write = round(time.time() - t0, 2)

    csv_path = os.path.join(out_dir, "bm25_tuning_results.csv")
    with open(csv_path, "rb") as fh:
        sha = hashlib.sha256(fh.read()).hexdigest()
    print(json.dumps({
        "sf_dir": sf_dir, "out_dir": out_dir, "n_combos": n_combos,
        "walls_sec": {"index_build": wall_index, "grid_sweep": wall_sweep,
                      "write_artifacts": wall_write},
        "csv_sha256": sha,
        "heatmap": sorted(os.listdir(out_dir)),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
