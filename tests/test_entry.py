"""Driver-contract invariants that don't need a SparkSession — cheap guards
against the failure mode r3 actually hit (registry outgrew the driver's
50-entry correctness artifact and the tail queries silently lost their
evidence)."""

import __spark_entry__ as entry


def test_gate_registry_within_cap():
    qs = entry.queries()
    assert len(qs) <= entry._GATE_CAP, (
        f"{len(qs)} registered queries > gate cap {entry._GATE_CAP}: the "
        "driver artifact would silently drop the tail — merge entries into "
        "family queries (params/method/sketch columns) instead"
    )


def test_every_query_has_an_oracle():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) == set(qs), (
        f"oracle/query key mismatch: missing={sorted(set(qs) - set(oracles))} "
        f"orphan={sorted(set(oracles) - set(qs))}"
    )


def test_oracle_sql_is_single_statement():
    # the driver executes each oracle as ONE DuckDB statement; a stray
    # semicolon would truncate it silently
    for name, sql in entry.oracle_sql().items():
        assert ";" not in sql, f"{name}: oracle contains ';'"
