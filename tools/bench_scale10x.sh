#!/bin/bash
# 14.4M-doc scaling pair (10x the per-round measurement): identical job,
# 64 shuffle partitions at BOTH levels, best-of-2 inside each JVM.
set -e
cd /root/repo
echo "=== scaling 14.4M docs local[2] ==="
SPARK_DRIVER_MEMORY=8g SPARK_GRAFT_BUILD_REPEATS=2 SPARK_GRAFT_WORKER_SHUFFLE=64 \
  python bench.py --worker --cores 2 --replicate 2880 --sf-dir /root/testdata/sf0.1
echo "=== scaling 14.4M docs local[8] ==="
SPARK_DRIVER_MEMORY=8g SPARK_GRAFT_BUILD_REPEATS=2 SPARK_GRAFT_WORKER_SHUFFLE=64 \
  python bench.py --worker --cores 8 --replicate 2880 --sf-dir /root/testdata/sf0.1
echo "=== done ==="
