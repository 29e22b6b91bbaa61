"""A/B speculative execution against the straggler population (r10 #3).

The rule-D triage names speculation as the straggler remedy but it has
never been measured here. This tool runs the SAME composed workload (the
standing retrieval artifact, tools/bench_retrieval_e2e.py --standing)
twice in fresh subprocess JVMs — speculation off, then on — each with its
own event-log dir, and compares:

  * e2e wall (the standing run's total_sec),
  * the task-duration tail pooled over all stages (p50/p95/p99),
  * how many speculative task attempts actually launched and how many
    WON (finished before the original — the only ones that can help).

Speculation conf for the ON leg (injected via SPARK_GRAFT_EXTRA_CONF —
see session.get_spark): spark.speculation=true with the default
multiplier 1.5 / quantile 0.75. local[32] shares one host, so a
CPU-steal straggler's duplicate lands on the same silicon — a duplicate
only wins when the slowness was per-task-slot (GC pause, page-cache miss,
a slow spill), which is exactly the class rule D triages as `straggler`.
A negative result (duplicates burn cores, no wall win) is a valid answer
and gets recorded in the audit remedy text either way.

Usage: python tools/bench_speculation.py [n_docs]   (default 1_440_000)
Output: ONE JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def task_stats(elog_dir: str) -> dict:
    """Pooled task-duration tail + speculative attempt accounting, straight
    from the raw event JSON (TaskInfo carries Speculative + Finish/Launch
    times; a speculative attempt 'wins' when some same-index original is
    still running at its finish — approximated here as: the stage's task
    index saw its FIRST finish from a speculative attempt)."""
    durs: list[float] = []
    spec_launched = 0
    spec_won = 0
    first_finish: dict[tuple[int, int], bool] = {}
    events = []
    for root, _dirs, files in os.walk(elog_dir):
        for fn in files:
            with open(os.path.join(root, fn)) as f:
                for line in f:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    if ev.get("Event") == "SparkListenerTaskEnd":
                        events.append(ev)
                    elif ev.get("Event") == "SparkListenerTaskStart":
                        if ev.get("Task Info", {}).get("Speculative"):
                            spec_launched += 1
    events.sort(key=lambda e: e.get("Task Info", {}).get("Finish Time", 0))
    for ev in events:
        ti = ev.get("Task Info", {})
        if ti.get("Finish Time", 0) and ti.get("Launch Time", 0):
            durs.append(ti["Finish Time"] - ti["Launch Time"])
        key = (ev.get("Stage ID", -1), ti.get("Index", -1))
        if key not in first_finish:
            first_finish[key] = bool(ti.get("Speculative"))
            if ti.get("Speculative"):
                spec_won += 1
    a = np.array(durs, dtype=np.float64)
    return {
        "tasks": int(a.size),
        "task_p50_ms": round(float(np.percentile(a, 50)), 1) if a.size else None,
        "task_p95_ms": round(float(np.percentile(a, 95)), 1) if a.size else None,
        "task_p99_ms": round(float(np.percentile(a, 99)), 1) if a.size else None,
        "task_max_ms": round(float(a.max()), 1) if a.size else None,
        "speculative_launched": spec_launched,
        "speculative_won": spec_won,
    }


def run_leg(n_docs: int, speculation: bool) -> dict:
    elog = tempfile.mkdtemp(prefix=f"spec_elog_{int(speculation)}_")
    env = {
        **os.environ,
        "SPARK_GRAFT_EVENTLOG_DIR": elog,
        "SPARK_DRIVER_MEMORY": "8g",
    }
    if speculation:
        env["SPARK_GRAFT_EXTRA_CONF"] = json.dumps({
            "spark.speculation": "true",
            # defaults made explicit so the record is self-describing
            "spark.speculation.multiplier": "1.5",
            "spark.speculation.quantile": "0.75",
        })
    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "bench_retrieval_e2e.py")
    proc = subprocess.run(
        [sys.executable, tool, "--standing", str(n_docs)],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        print(proc.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"standing leg failed (speculation={speculation})")
    rec = json.loads(lines[-1])
    out = {
        "total_sec": rec["total_sec"],
        "phases": rec["phases"],
        "identity_ok": rec.get("standing", {}).get("identity_ok"),
        **task_stats(elog),
    }
    import shutil

    shutil.rmtree(elog, ignore_errors=True)
    return out


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_440_000
    report: dict = {"workload": "bench_retrieval_e2e --standing",
                    "n_docs": n_docs}
    for tag, spec in (("off", False), ("on", True)):
        report[tag] = run_leg(n_docs, spec)
        print(f"[leg] speculation={tag}: {report[tag]['total_sec']} s, "
              f"task p99 {report[tag]['task_p99_ms']} ms, "
              f"spec launched/won {report[tag]['speculative_launched']}/"
              f"{report[tag]['speculative_won']}", file=sys.stderr, flush=True)
    off, on = report["off"], report["on"]
    report["wall_delta_pct"] = round(
        100 * (on["total_sec"] - off["total_sec"]) / off["total_sec"], 1)
    report["p99_delta_pct"] = (
        round(100 * (on["task_p99_ms"] - off["task_p99_ms"]) / off["task_p99_ms"], 1)
        if off["task_p99_ms"] else None)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
