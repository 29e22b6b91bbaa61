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
           [--json PATH]
Exit status: number of findings (0 = clean).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

EXPAND_X = 10.0
MIN_RECORDS = 10_000
MIN_RUNTIME_MS = 2_000


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
    stages: dict[int, dict] = {}
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
            elif kind == "SparkListenerTaskEnd":
                if ev.get("Stage Attempt ID", 0) != 0:
                    continue
                sid = ev.get("Stage ID")
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, _empty_stage())
                st["run_ms"] += m.get("Executor Run Time", 0)
                st["cpu_ms"] += m.get("Executor CPU Time", 0) // 1_000_000
                st["input_records"] += (m.get("Input Metrics") or {}).get(
                    "Records Read", 0
                )
                st["shuffle_read_records"] += (m.get("Shuffle Read Metrics") or {}).get(
                    "Total Records Read", 0
                )
                st["shuffle_write_records"] += (
                    m.get("Shuffle Write Metrics") or {}
                ).get("Shuffle Records Written", 0)
    return stages


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
    }


def audit_stages(
    stages: dict[int, dict],
    expand_x: float = EXPAND_X,
    min_records: int = MIN_RECORDS,
    min_runtime_ms: int = MIN_RUNTIME_MS,
) -> list[dict]:
    findings = []
    for sid, st in sorted(stages.items()):
        if not st["completed"] or st["num_tasks"] != 1:
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("paths", nargs="+", help="event log file(s) or dir(s)")
    ap.add_argument("--expand-x", type=float, default=EXPAND_X)
    ap.add_argument("--min-records", type=int, default=MIN_RECORDS)
    ap.add_argument("--min-runtime-ms", type=int, default=MIN_RUNTIME_MS)
    ap.add_argument("--json", dest="json_path", default=None)
    args = ap.parse_args()

    all_findings, n_stages, n_apps = [], 0, 0
    for path in iter_event_files(args.paths):
        stages = parse_event_log(path)
        if not stages:
            continue
        n_apps += 1
        n_stages += sum(1 for s in stages.values() if s["completed"])
        for f in audit_stages(
            stages, args.expand_x, args.min_records, args.min_runtime_ms
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
        print(f"[{f['rule']}] app={f['app']} stage={f['stage_id']} "
              f"{f['detail']}", file=sys.stderr)
    return len(all_findings)


if __name__ == "__main__":
    raise SystemExit(main())
