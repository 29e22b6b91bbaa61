"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the sandbox (local[N], 128 GiB single JVM) but expressed
so the same config works on a real multi-executor cluster: AQE on (runtime
re-planning + skew-join splitting), Arrow on (vectorized pandas UDF
transfer), modest shuffle partitions for small SFs (override per workload).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "fusion-spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` pins ``local[cores]`` — used by the scaling bench to run the
    identical job at two parallelism levels (local[8] vs local[32], the
    sandbox stand-in for N vs 4N executors).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = os.environ.get("SPARK_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cores) * 2, 8)
        except (TypeError, ValueError):
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE sizes post-shuffle reads by MAP-OUTPUT BYTES and cannot see a
        # downstream row multiplication: a small aggregate feeding a combo
        # cross-join (the fused tuning grids: 23k rows / 1.7 MB exchanged,
        # then ×187 combos + an interpreted fold) coalesces to ONE task and
        # the whole expansion runs serially (event-log-measured 18.6 s
        # single-task stage; r6). parallelismFirst exists for exactly this,
        # but its floor is minPartitionSize (default 1 MB) — far above such
        # exchanges. 64k keeps small-byte/CPU-heavy reads at full
        # parallelism and is inert at scale (real partitions are ≥ the
        # 64 MB advisory size, so this floor never binds there).
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Opt-in event logging (tools/audit_event_log.py consumes these): the
    # executed plan — AQE-coalesced reads, real task counts — only exists in
    # the event log; .explain() shows the pre-runtime plan (docs/PLANS.md).
    elog_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if elog_dir:
        os.makedirs(elog_dir, exist_ok=True)
        builder = (
            builder.config("spark.eventLog.enabled", "true")
            .config("spark.eventLog.dir", elog_dir)
            # uncompressed: the audit tool parses the JSON lines directly
            # (no zstd codec in this environment)
            .config("spark.eventLog.compress", "false")
        )
    # env-injected conf (JSON dict), applied after everything else: lets a
    # parent process A/B a scheduler knob (e.g. spark.speculation for the
    # r10 straggler experiment) in child workers without threading a new
    # parameter through every tool
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    merged = {**(extra_conf or {})}
    if env_conf:
        import json as _json

        merged.update(_json.loads(env_conf))
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
