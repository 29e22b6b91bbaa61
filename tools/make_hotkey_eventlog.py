"""Planted REAL hot-key run for rule D's classifier (r9 verdict #3).

The classifier's unit tests pin the logic on synthetic event-log lines;
this produces a genuine event log: `groupBy.applyInPandas` (no partial
aggregation — every row of a group lands in its task) over a key space
where ONE group holds `hot_frac` of all rows. The stage's task population
is ~uniform except the task holding the giant group, which is slow
BECAUSE of its data — the audit must emit task-skew with
classification=hot_key (slow-task records >> median records), unlike the
12M curation run's host stragglers (records ≈ median).

Usage:
  SPARK_GRAFT_EVENTLOG_DIR=/tmp/elog_hotkey python tools/make_hotkey_eventlog.py
  python tools/audit_event_log.py /tmp/elog_hotkey
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fusion_spark.session import get_spark  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    if not os.environ.get("SPARK_GRAFT_EVENTLOG_DIR"):
        print("set SPARK_GRAFT_EVENTLOG_DIR to capture the log", file=sys.stderr)
        return 2
    spark = get_spark(app_name="hotkey-fixture", cores=32)
    # half of all rows share key 0; the rest spread over n_keys
    df = spark.range(0, n, numPartitions=64).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id") % n_keys).alias("k"),
        (F.col("id") * 31 % 997).alias("v"),
    )

    def per_group(pdf):
        import pandas as pd

        # real per-group work proportional to group size (sort + cumsum)
        s = pdf.sort_values("v")["v"].cumsum()
        return pd.DataFrame({"k": [int(pdf["k"].iloc[0])],
                             "chk": [float(s.iloc[-1])]})

    t0 = time.perf_counter()
    out = df.groupBy("k").applyInPandas(per_group, schema="k long, chk double")
    rows = out.count()
    print(f"groups={rows} wall={time.perf_counter() - t0:.1f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
