"""tools/ units: the event-log audit's parser + rules (r6 verdict #5 — the
two PLANS.md plan-hygiene lessons as a mechanical check; no SparkSession)
and bench_curation's deterministic audit-sampling predicate (r7; uses the
shared session fixture)."""

import importlib.util
import json
import os
import sys

_spec = importlib.util.spec_from_file_location(
    "audit_event_log",
    os.path.join(os.path.dirname(__file__), "..", "tools", "audit_event_log.py"),
)
audit_event_log = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(audit_event_log)


def _stage_completed(sid, num_tasks, name="stage"):
    return {
        "Event": "SparkListenerStageCompleted",
        "Stage Info": {
            "Stage ID": sid,
            "Stage Attempt ID": 0,
            "Stage Name": name,
            "Number of Tasks": num_tasks,
        },
    }


def _task_end(sid, run_ms=0, input_rec=0, sh_read=0, sh_write=0):
    return {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": sid,
        "Stage Attempt ID": 0,
        "Task Metrics": {
            "Executor Run Time": run_ms,
            "Executor CPU Time": run_ms * 1_000_000,
            "Input Metrics": {"Records Read": input_rec},
            "Shuffle Read Metrics": {"Total Records Read": sh_read},
            "Shuffle Write Metrics": {"Shuffle Records Written": sh_write},
        },
    }


def _write_log(tmp_path, events, name="app-1"):
    p = tmp_path / name
    p.write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(p)


def test_audit_flags_serial_expansion(tmp_path):
    """The r6 shape: one task, small shuffle read, >=10x write expansion,
    slow — must be flagged by rule A (and by rule A only)."""
    events = [
        _task_end(7, run_ms=18_600, sh_read=23_000, sh_write=4_301_000),
        _stage_completed(7, 1, "mapInPandas at tuning.py:200"),
    ]
    stages = audit_event_log.parse_event_log(_write_log(tmp_path, events))
    findings = audit_event_log.audit_stages(stages)
    assert [f["rule"] for f in findings] == ["serial-expansion"]
    assert findings[0]["stage_id"] == 7
    assert findings[0]["shuffle_write_records"] == 4_301_000


def test_audit_flags_single_partition_heavy_scan(tmp_path):
    """One task reading many input records slowly = the single-file-scan
    layout smell (rule B)."""
    events = [
        _task_end(3, run_ms=5_000, input_rec=60_000),
        _stage_completed(3, 1, "Scan parquet documents"),
    ]
    stages = audit_event_log.parse_event_log(_write_log(tmp_path, events))
    findings = audit_event_log.audit_stages(stages)
    assert [f["rule"] for f in findings] == ["single-partition-heavy-scan"]


def test_audit_clean_on_benign_stages(tmp_path):
    """No false positives on: parallel stages of any size, fast 1-task
    driver-bounded stages, 1-task stages with small record counts, and
    1-task expansions below the ratio."""
    events = [
        # parallel heavy stage — fine at any size
        _task_end(1, run_ms=9_000, input_rec=1_000_000),
        _task_end(1, run_ms=9_000, input_rec=1_000_000),
        _stage_completed(1, 2, "big parallel scan"),
        # tiny driver-bounded 1-task stage (AQE doing its job)
        _task_end(2, run_ms=150, sh_read=500, sh_write=500),
        _stage_completed(2, 1, "small agg"),
        # slow 1-task stage but below the record threshold
        _task_end(4, run_ms=4_000, input_rec=900),
        _stage_completed(4, 1, "slow scalar collect"),
        # 1-task stage with sub-10x expansion
        _task_end(5, run_ms=4_000, sh_read=20_000, sh_write=90_000),
        _stage_completed(5, 1, "modest fanout"),
    ]
    stages = audit_event_log.parse_event_log(_write_log(tmp_path, events))
    assert audit_event_log.audit_stages(stages) == []


def test_audit_skips_retries_and_garbage_lines(tmp_path):
    """Attempt>0 events are ignored (retried stages would double-count) and
    a truncated trailing line (.inprogress logs) doesn't crash the parse."""
    bad = {
        "Event": "SparkListenerTaskEnd",
        "Stage ID": 9,
        "Stage Attempt ID": 1,
        "Task Metrics": {"Executor Run Time": 99_999},
    }
    p = tmp_path / "app.inprogress"
    p.write_text(
        json.dumps(_task_end(9, run_ms=100, input_rec=10)) + "\n"
        + json.dumps(bad) + "\n"
        + json.dumps(_stage_completed(9, 1)) + "\n"
        + '{"Event": "SparkListenerStageCom'  # truncated mid-write
    )
    stages = audit_event_log.parse_event_log(str(p))
    assert stages[9]["run_ms"] == 100
    assert audit_event_log.audit_stages(stages) == []


# --------- bench_curation's sampled hot-bucket audit (r7) ----------------

_spec_bc = importlib.util.spec_from_file_location(
    "bench_curation",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_curation.py"),
)
bench_curation = importlib.util.module_from_spec(_spec_bc)
_spec_bc.loader.exec_module(bench_curation)


def test_audit_sample_expr_deterministic_and_unbiased(spark):
    """The audit's doc_id sample is deterministic (same docs every
    evaluation) and hits the requested rate closely enough that
    sampled/frac estimates of planted-family bucket sizes are honest
    (binomial sd ~ sqrt(n*f) — well under the few-percent level here)."""
    from pyspark.sql import functions as F

    df = spark.range(0, 50_000).withColumnRenamed("id", "doc_id")
    pred = bench_curation.audit_sample_expr(0.1)
    n1 = df.filter(F.expr(pred)).count()
    n2 = df.filter(F.expr(pred)).count()
    assert n1 == n2
    assert 0.09 * 50_000 < n1 < 0.11 * 50_000
    # disjoint rates nest: every doc sampled at 0.05 is sampled at 0.1
    small = set(
        r["doc_id"]
        for r in df.filter(F.expr(bench_curation.audit_sample_expr(0.05))).collect()
    )
    big = set(r["doc_id"] for r in df.filter(F.expr(pred)).collect())
    assert small <= big
