"""Driver-contract smoke tests (SURVEY.md §5.2.2)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "sum_qty", "count_order"} <= set(df.columns)


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_every_query_runs_at_smallest_sf(spark, sf_dir):
    failures = {}
    for name, fn in entrymod.queries().items():
        try:
            fn(spark, sf_dir).limit(1).collect()
        except Exception as e:  # noqa: BLE001
            failures[name] = repr(e)[:200]
    assert not failures, failures
