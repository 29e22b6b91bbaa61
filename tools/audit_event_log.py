"""Mechanical event-log audit for the two r6 plan-hygiene rules
(docs/PLANS.md "AQE coalescing is blind to row multiplication" and the
single-file-scan-layout lesson). `.explain()` shows the PRE-runtime plan;
both failure modes only exist in the EXECUTED plan, which the event log
records — so this turns the r6 hand-driven hunt into a per-round check.

Rules (per completed stage, task metrics aggregated from TaskEnd events):

  A. serial-expansion — a 1-task stage whose shuffle WRITE records are
     >= EXPAND_X its shuffle READ records (with >= MIN_RECORDS written and
     >= MIN_RUNTIME_MS run time): AQE coalesced a small-byte exchange to
     one partition and the downstream row multiplication (combo cross-join,
     sequence explode, per-row fan-out) ran serially inside that task.
     The r6 instance: 23k rows / 1.7 MB coalesced to ONE task feeding a
     ×187 expansion — 18.6 s serial (fixed by the 64k minPartitionSize
     floor in get_spark; this rule guards the fix).

  B. single-partition heavy scan — a 1-task stage reading >= MIN_RECORDS
     input records with >= MIN_RUNTIME_MS run time: a single-file scan is
     ONE input partition, pinning a CPU-heavy map (shingling, minhash) to
     one core. The r6 instance: sf0.1 documents.parquet is one file; the
     shingle/minhash map serialized until the `_docs_wide` spread.

  C. broadcast-miss SMJ (r8) — a SortMergeJoin in the FINAL (post-AQE)
     plan where one input side's materialized size ("data size" of the
     nearest exchange / "size of files read" of the scan under that side)
     is under the broadcast threshold. AQE converts such joins to
     broadcast automatically, so one SURVIVING in the executed plan means
     something defeated the conversion (a non-equi condition, an explicit
     hint, a disabled config) — the classic silent 100×-scale shuffle
     regression. Both sides' sizes must be known and the other side must
     exceed the threshold (two tiny sides are a trivially cheap join).

  D. task-duration skew (r8; classified r9) — a completed stage with >=
     SKEW_MIN_TASKS tasks whose p99 task run time is >= SKEW_X times the
     median (median >= SKEW_MIN_MEDIAN_MS, p99 >= MIN_RUNTIME_MS): a hot
     key / unsplit partition that per-stage record totals cannot show. One
     straggler out of hundreds is exactly the shape that becomes the job's
     wall clock at 1000 executors. Each finding carries a CLASSIFICATION
     from the per-task record counts (the r8 manual triage, mechanized):
     `hot_key` when the slow tasks also processed >= HOTKEY_RECORDS_X times
     the stage's median records (data skew — salt the key / AQE skew-join),
     `straggler` when they processed ~median records but ran slow anyway
     (host steal time / IO stall — speculative execution territory, not a
     partitioning bug), `unknown` when the stage reports no per-task record
     metrics to compare (pure-compute stages).

Thresholds are deliberately coarse: tiny driver-bounded stages legitimately
run as one task (that is AQE doing its job on genuinely small work); only
one-task stages that are BOTH large-record and slow are scale smells.

Collect logs by exporting SPARK_GRAFT_EVENTLOG_DIR before any tool that
uses fusion_spark.session.get_spark, e.g. the standing sf0.1 gate sweep:

    SPARK_GRAFT_EVENTLOG_DIR=/tmp/elog python tools/check_oracles.py \
        /root/testdata/sf0.1
    python tools/audit_event_log.py /tmp/elog

Usage: python tools/audit_event_log.py <eventlog-file-or-dir>...
           [--expand-x 10] [--min-records 10000] [--min-runtime-ms 2000]
           [--broadcast-threshold 10485760] [--skew-x 5]
           [--hotkey-records-x 3] [--json PATH]
Exit status: 0 = clean, else min(#findings, 125) — raw exit codes wrap
mod 256, so a large finding count must not alias to 0 in a CI gate; the
exact count lives in the JSON report.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

EXPAND_X = 10.0
MIN_RECORDS = 10_000
MIN_RUNTIME_MS = 2_000
BROADCAST_THRESHOLD = 10 * 1024 * 1024  # spark.sql.autoBroadcastJoinThreshold default
SKEW_X = 5.0
SKEW_MIN_TASKS = 10
SKEW_MIN_MEDIAN_MS = 100
# Straggler-vs-hot-key boundary: a slow task that also read this many times
# the stage's median records is slow BECAUSE of its data (hot key); below it
# the task did median work slowly (host straggler). 3× sits well clear of
# both observed populations: the r8 12M-run stragglers read 0.9–1.1× median
# records at 5–12× median time, while a genuinely hot key concentrates the
# skew factor itself (>= SKEW_X = 5×) into one task's records.
HOTKEY_RECORDS_X = 3.0

_SQL_START = "org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart"
_SQL_ADAPTIVE = "org.apache.spark.sql.execution.ui.SparkListenerSQLAdaptiveExecutionUpdate"
_SQL_DRIVER_ACCUMS = "org.apache.spark.sql.execution.ui.SparkListenerDriverAccumUpdates"


def iter_event_files(paths: list[str]):
    """Yield event-log JSON files: plain v1 files, and the `events_*` parts
    inside Spark's v2 `eventlog_v2_<appId>` directories (get_spark writes
    these uncompressed; a .zstd part means compression was left on — warn,
    since no zstd codec is importable here)."""
    for p in paths:
        if os.path.isdir(p):
            for root, _dirs, files in os.walk(p):
                for name in sorted(files):
                    if name.startswith(".") or name.startswith("appstatus"):
                        continue
                    if name.endswith((".zstd", ".lz4", ".snappy")):
                        print(
                            f"warning: skipping compressed log {name} — set "
                            "spark.eventLog.compress=false (get_spark does "
                            "when SPARK_GRAFT_EVENTLOG_DIR is set)",
                            file=sys.stderr,
                        )
                        continue
                    yield os.path.join(root, name)
        else:
            yield p


def parse_event_log(path: str) -> dict[int, dict]:
    """One record per stage attempt 0: task-metric sums + stage metadata.
    Tolerates .inprogress logs and unknown events (skips unparseable lines —
    Spark truncates the last line of an in-progress log mid-write)."""
    return parse_event_log_full(path)["stages"]


def parse_event_log_full(path: str) -> dict:
    """Single pass over the log → {"stages": {sid: {...}}, "plans":
    {executionId: final sparkPlanInfo}, "accums": {accumId: int value}}.

    Plans: the LAST plan seen per executionId (SQLExecutionStart, then each
    SQLAdaptiveExecutionUpdate supersedes it) — i.e. the EXECUTED post-AQE
    plan, which is where a surviving SortMergeJoin is meaningful.
    Accums: SQL metrics are Long accumulators; final values come from
    StageCompleted's cumulative Accumulables plus DriverAccumUpdates
    (exchanges report "data size" from tasks; some scans report
    driver-side). Max per id = the cumulative total."""
    stages: dict[int, dict] = {}
    plans: dict[int, dict] = {}
    accums: dict[int, int] = {}

    def _note_accum(aid, value) -> None:
        try:
            v = int(value)
        except (TypeError, ValueError):
            return
        if aid is not None and v >= accums.get(aid, -1):
            accums[aid] = v

    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            kind = ev.get("Event")
            if kind == "SparkListenerStageCompleted":
                info = ev.get("Stage Info", {})
                if info.get("Stage Attempt ID", 0) != 0:
                    continue
                sid = info["Stage ID"]
                st = stages.setdefault(sid, _empty_stage())
                st["name"] = (info.get("Stage Name") or "").split("\n")[0][:120]
                st["num_tasks"] = info.get("Number of Tasks", 0)
                st["completed"] = True
                for acc in info.get("Accumulables") or []:
                    _note_accum(acc.get("ID"), acc.get("Value"))
            elif kind == "SparkListenerTaskEnd":
                if ev.get("Stage Attempt ID", 0) != 0:
                    continue
                sid = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, _empty_stage())
                run_ms = m.get("Executor Run Time", 0)
                st["run_ms"] += run_ms
                st["task_ms"].append(run_ms)
                st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                in_rec = (m.get("Input Metrics") or {}).get("Records Read", 0)
                sr_rec = (m.get("Shuffle Read Metrics") or {}).get(
                    "Total Records Read", 0
                )
                st["input_records"] += in_rec
                st["shuffle_read_records"] += sr_rec
                # per-task consumed records (input + shuffle read), index-
                # aligned with task_ms — rule D's straggler/hot_key evidence
                st["task_records"].append(in_rec + sr_rec)
                st["shuffle_write_records"] += (
                    m.get("Shuffle Write Metrics") or {}
                ).get("Shuffle Records Written", 0)
            elif kind in (_SQL_START, _SQL_ADAPTIVE):
                eid = ev.get("executionId")
                plan = ev.get("sparkPlanInfo")
                if eid is not None and plan is not None:
                    plans[eid] = plan
            elif kind == _SQL_DRIVER_ACCUMS:
                for pair in ev.get("accumUpdates") or []:
                    if isinstance(pair, (list, tuple)) and len(pair) == 2:
                        _note_accum(pair[0], pair[1])
    return {"stages": stages, "plans": plans, "accums": accums}


def _empty_stage() -> dict:
    return {
        "name": "",
        "num_tasks": 0,
        "completed": False,
        "run_ms": 0,
        "cpu_ms": 0,
        "input_records": 0,
        "shuffle_read_records": 0,
        "shuffle_write_records": 0,
        "task_ms": [],
        "task_records": [],
    }


def audit_stages(
    stages: dict[int, dict],
    expand_x: float = EXPAND_X,
    min_records: int = MIN_RECORDS,
    min_runtime_ms: int = MIN_RUNTIME_MS,
    skew_x: float = SKEW_X,
    hotkey_records_x: float = HOTKEY_RECORDS_X,
) -> list[dict]:
    findings = []
    for sid, st in sorted(stages.items()):
        if not st["completed"]:
            continue
        # rule D: task-duration skew — multi-task stages only (1-task
        # stages are rules A/B's territory; skew needs a population)
        ts = st["task_ms"]
        if len(ts) >= SKEW_MIN_TASKS and st["num_tasks"] > 1:
            med = statistics.median(ts)
            p99 = sorted(ts)[min(len(ts) - 1, int(0.99 * (len(ts) - 1) + 0.999))]
            if (
                med >= SKEW_MIN_MEDIAN_MS
                and p99 >= min_runtime_ms
                and p99 >= skew_x * med
            ):
                # classify from per-task records (index-aligned with task_ms):
                # compare the slow tasks' record counts to the stage median —
                # the r8 manual triage ("same records + slower = host
                # straggler; record skew = hot key"), mechanized
                recs = st["task_records"]
                classification, slow_rec, rec_med = "unknown", None, None
                if len(recs) == len(ts) and any(r > 0 for r in recs):
                    rec_med = statistics.median(recs)
                    slow_rec = max(
                        (r for t, r in zip(ts, recs) if t >= p99), default=0
                    )
                    classification = (
                        "hot_key"
                        if slow_rec >= hotkey_records_x * max(rec_med, 1)
                        else "straggler"
                    )
                remedy = {
                    "hot_key": "salt the key or let AQE skew-join split it",
                    "straggler": (
                        "records match the median — a host/IO straggler, "
                        "not a partitioning bug; enable spark.speculation "
                        "on multi-host clusters (inert under local[*]: "
                        "TaskSchedulerImpl gates the speculation thread on "
                        "!isLocal, and single-host deployments can never "
                        "place a copy — hasAttemptOnHost excludes hosts "
                        "already running an attempt; see BENCH.md r10)"
                    ),
                    "unknown": (
                        "no per-task record metrics to classify; inspect "
                        "the stage manually"
                    ),
                }[classification]
                findings.append(
                    {
                        "rule": "task-skew",
                        "stage_id": sid,
                        "stage": st["name"],
                        "num_tasks": len(ts),
                        "median_ms": round(med, 1),
                        "p99_ms": p99,
                        "classification": classification,
                        "median_records": rec_med,
                        "slow_task_records": slow_rec,
                        "detail": (
                            f"stage p99 task time {p99} ms is "
                            f"{p99 / med:.1f}x its median ({med:.0f} ms) over "
                            f"{len(ts)} tasks [{classification}: slow task "
                            f"read {slow_rec} records vs median {rec_med}] — "
                            f"{remedy}"
                        ),
                    }
                )
        if st["num_tasks"] != 1:
            continue
        if st["run_ms"] < min_runtime_ms:
            continue
        r, w = st["shuffle_read_records"], st["shuffle_write_records"]
        if r > 0 and w >= min_records and w >= expand_x * r:
            findings.append(
                {
                    "rule": "serial-expansion",
                    "stage_id": sid,
                    "stage": st["name"],
                    "run_ms": st["run_ms"],
                    "shuffle_read_records": r,
                    "shuffle_write_records": w,
                    "detail": (
                        f"1-task stage expands {r} shuffled rows to {w} "
                        f"({w / r:.1f}x) in {st['run_ms']} ms — an "
                        "AQE-coalesced read feeding a row multiplication "
                        "runs serially; check minPartitionSize / repartition "
                        "before the expansion"
                    ),
                }
            )
        if st["input_records"] >= min_records:
            findings.append(
                {
                    "rule": "single-partition-heavy-scan",
                    "stage_id": sid,
                    "stage": st["name"],
                    "run_ms": st["run_ms"],
                    "input_records": st["input_records"],
                    "detail": (
                        f"1-task stage reads {st['input_records']} input "
                        f"records and runs {st['run_ms']} ms — a "
                        "single-file/partition scan pinning per-row work to "
                        "one core; spread the scan (repartition) before the "
                        "heavy map"
                    ),
                }
            )
    return findings


_SIZE_METRIC_NAMES = ("data size", "size of files read")

# Nodes a join-input size may be read THROUGH: they preserve cardinality
# exactly, so an exchange/scan size found below them IS the join input
# size. Anything else (HashAggregate, Window, another join, Generate,
# Filter, Limit…) changes row counts between the metric and the join — a
# size read past one of those attributes a DEEP descendant's bytes to the
# join side, which is how rule C's first draft flagged three tiny-tiny
# LeftOuter joins in the r8 gate sweep as "67 MB vs 120 B" (the 67 MB
# exchange sat below a per-qid aggregate that reduced it to 64 rows).
_SIZE_PASSTHROUGH_PREFIXES = (
    "Sort", "Project", "AQEShuffleRead", "ShuffleQueryStage",
    "BroadcastQueryStage", "TableCacheQueryStage", "ResultQueryStage",
    "Exchange", "BroadcastExchange", "ReusedExchange", "ReusedQueryStage",
    "WholeStageCodegen", "InputAdapter", "ColumnarToRow",
)

# Cardinality-CHANGING nodes whose names collide with a passthrough prefix
# (r9 ADVICE: "Sort" matches SortMergeJoin/SortAggregate, so a nested SMJ's
# deep exchange bytes could be attributed to the outer join's input — the
# exact misattribution rule C's passthrough list exists to prevent). Checked
# BEFORE the passthrough test: descent stops here unconditionally.
_SIZE_STOP_PREFIXES = (
    "SortMergeJoin", "SortAggregate", "SortedAggregate",
    "ShuffledHashJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin",
)


def _subtree_size_bytes(node: dict, accums: dict[int, int]) -> int | None:
    """Materialized byte size of a join input: BFS for the nearest node
    carrying a size metric with a recorded accumulator value (Exchange
    "data size"; scan "size of files read"), descending ONLY through
    cardinality-preserving nodes. Unknown (None) when the input comes out
    of an aggregate/window/join first — sound: no finding beats a finding
    built on a misattributed size."""
    queue = [node]
    while queue:
        nxt = []
        for n in queue:
            for m in n.get("metrics") or []:
                if m.get("name") in _SIZE_METRIC_NAMES:
                    v = accums.get(m.get("accumulatorId"))
                    if v is not None:
                        return v
            name = str(n.get("nodeName", ""))
            if not name.startswith(_SIZE_STOP_PREFIXES) and name.startswith(
                _SIZE_PASSTHROUGH_PREFIXES
            ):
                nxt.extend(n.get("children") or [])
        queue = nxt
    return None


def audit_sql_plans(
    plans: dict[int, dict],
    accums: dict[int, int],
    broadcast_threshold: int = BROADCAST_THRESHOLD,
) -> list[dict]:
    """Rule C: SortMergeJoin surviving in the final plan with one side's
    materialized size under the broadcast threshold (and the other side
    above it — two tiny sides are a trivially cheap join either way)."""
    findings = []
    for eid, root in sorted(plans.items()):
        stack = [root]
        while stack:
            node = stack.pop()
            children = node.get("children") or []
            stack.extend(children)
            if not str(node.get("nodeName", "")).startswith("SortMergeJoin"):
                continue
            if len(children) != 2:
                continue
            sizes = [_subtree_size_bytes(c, accums) for c in children]
            if any(s is None for s in sizes):
                continue
            small, big = min(sizes), max(sizes)
            if small <= broadcast_threshold < big:
                side = "left" if sizes[0] == small else "right"
                findings.append(
                    {
                        "rule": "broadcast-miss-smj",
                        "execution_id": eid,
                        "stage": node.get("simpleString", "")[:120],
                        "small_side_bytes": small,
                        "large_side_bytes": big,
                        "detail": (
                            f"SortMergeJoin executed with its {side} side at "
                            f"{small} bytes (< broadcast threshold "
                            f"{broadcast_threshold}) vs {big} on the other — "
                            "AQE did not convert it (non-equi condition, "
                            "hint, or disabled config?); broadcast the small "
                            "side to drop the big side's shuffle"
                        ),
                    }
                )
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help="event log file(s) or dir(s)")
    ap.add_argument("--expand-x", type=float, default=EXPAND_X)
    ap.add_argument("--min-records", type=int, default=MIN_RECORDS)
    ap.add_argument("--min-runtime-ms", type=int, default=MIN_RUNTIME_MS)
    ap.add_argument("--broadcast-threshold", type=int, default=BROADCAST_THRESHOLD)
    ap.add_argument("--skew-x", type=float, default=SKEW_X)
    ap.add_argument("--hotkey-records-x", type=float, default=HOTKEY_RECORDS_X)
    ap.add_argument("--json", dest="json_path", default=None)
    args = ap.parse_args()

    all_findings, n_stages, n_apps = [], 0, 0
    for path in iter_event_files(args.paths):
        parsed = parse_event_log_full(path)
        stages = parsed["stages"]
        if not stages and not parsed["plans"]:
            continue
        n_apps += 1
        n_stages += sum(1 for s in stages.values() if s["completed"])
        for f in audit_stages(
            stages, args.expand_x, args.min_records, args.min_runtime_ms,
            args.skew_x, args.hotkey_records_x,
        ) + audit_sql_plans(
            parsed["plans"], parsed["accums"], args.broadcast_threshold
        ):
            all_findings.append({"app": os.path.basename(path), **f})

    report = {
        "apps": n_apps,
        "stages_audited": n_stages,
        "findings": all_findings,
    }
    if args.json_path:
        with open(args.json_path, "w") as f:
            json.dump(report, f, indent=2)
    print(json.dumps(report if all_findings else {**report, "findings": []}))
    for f in all_findings:
        print(f"[{f['rule']}] app={f['app']} "
              f"stage={f.get('stage_id', f.get('execution_id'))} "
              f"{f['detail']}", file=sys.stderr)
    # clamp: raw counts wrap mod 256 in the shell, so exactly 256 findings
    # would exit 0 and read as clean in a CI gate; the JSON carries the count
    return min(len(all_findings), 125)


if __name__ == "__main__":
    raise SystemExit(main())
