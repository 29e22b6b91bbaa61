"""Why spark.speculation cannot be A/B-measured on a single host (r10 #3).

Three-layer probe backing the BENCH.md r10 speculation section; each layer
is checked live against the installed Spark (no hardcoded expectations):

1. `local[N]`: `TaskSchedulerImpl.start()` gates its speculation scheduler
   on `!isLocal` before reading `spark.speculation` — JVM thread dump shows
   no `task-scheduler-speculation` thread even with the conf on.
2. `local-cluster[2,2,2048]` (isLocal=false, two executor JVMs, ONE host):
   the thread exists and a planted 12 s straggler IS marked speculatable
   (live `TaskSetManager.speculatableTasks` polled via py4j), but no
   speculative attempt ever launches: `TaskSetManager.hasAttemptOnHost`
   refuses same-host placement and there is no other host.
3. Conclusion printed as one JSON line; the audit's straggler remedy text
   (tools/audit_event_log.py) carries the applicability boundary.

Reference behavior being contextualized: the reference engine is
single-process (bm25.py run loops) and has no task re-execution concept;
speculation is a Spark-fleet remedy for the straggler population the
event-log audit classifies (BENCH.md r9 rule D).

Usage: python tools/probe_speculation.py   (~2 min, two short sessions)
"""

from __future__ import annotations

import json
import threading
import time

from pyspark.sql import SparkSession


def _session(master: str) -> SparkSession:
    return (
        SparkSession.builder.master(master)
        .config("spark.speculation", "true")
        .config("spark.speculation.interval", "100ms")
        .config("spark.speculation.multiplier", "1.2")
        .config("spark.speculation.quantile", "0.4")
        .config("spark.speculation.efficiency.enabled", "false")
        .config("spark.executor.memory", "2g")
        .config("spark.ui.enabled", "true")
        .getOrCreate()
    )


def _speculation_threads(sc) -> list[str]:
    jvm = sc._jvm
    names = [
        t.getName()
        for t in jvm.java.lang.Thread.getAllStackTraces().keySet().toArray()
    ]
    return [n for n in names if "specul" in n.lower()]


def _straggler_job(sc, marks: list) -> int:
    """Run 8 tasks (one sleeps 12 s) while polling speculatableTasks size.

    Returns the number of task starts Spark actually scheduled (8 means
    no speculative copy launched).
    """

    def work(it):
        import time as tt

        for x in it:
            tt.sleep(12 if x == 7 else 0.3)
            yield x

    def poll():
        ts = sc._jsc.sc().taskScheduler()
        for _ in range(60):
            time.sleep(0.4)
            try:
                q = ts.rootPool().getSortedTaskSetQueue()
                for i in range(q.size()):
                    marks.append(q.apply(i).speculatableTasks().size())
            except Exception:  # noqa: BLE001 — py4j races during teardown
                pass

    t = threading.Thread(target=poll, daemon=True)
    t.start()
    status = sc.statusTracker()
    sc.parallelize(range(8), 8).mapPartitions(work).collect()
    stage_ids = status.getJobIdsForGroup(None)
    # statusTracker's numTasks counts launched attempts incl. speculative
    launched = 0
    for jid in stage_ids:
        info = status.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            sinfo = status.getStageInfo(sid)
            if sinfo is not None:
                launched += sinfo.numActiveTasks + sinfo.numCompletedTasks + sinfo.numFailedTasks
    return launched


def main() -> None:
    out = {}

    spark = _session("local[4]")
    sc = spark.sparkContext
    out["local"] = {
        "master": "local[4]",
        "isLocal": bool(sc._jsc.sc().isLocal()),
        "speculation_threads": _speculation_threads(sc),
    }
    spark.stop()
    time.sleep(1)

    spark = _session("local-cluster[2,2,2048]")
    sc = spark.sparkContext
    marks: list = []
    launched = _straggler_job(sc, marks)
    out["local_cluster"] = {
        "master": "local-cluster[2,2,2048]",
        "isLocal": bool(sc._jsc.sc().isLocal()),
        "speculation_threads": _speculation_threads(sc),
        "speculatable_set_max": max([m for m in marks if isinstance(m, int)], default=0),
        "task_attempts_launched": launched,
    }
    spark.stop()

    out["conclusion"] = (
        "local[*] never starts the speculation scheduler (isLocal gate); "
        "local-cluster on one host marks stragglers speculatable but can "
        "never place the copy (hasAttemptOnHost) — single-host A/Bs read "
        "zero speculative attempts by construction"
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
