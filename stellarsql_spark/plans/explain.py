"""Physical-plan assertions (SURVEY.md §4).

The engine has no custom optimizer — Catalyst + AQE are the optimizer
(predicate pushdown, column pruning, broadcast selection, skew
handling come free from the declarative plans). What we own is
*verifying* that each operator compiles to the plan we want at scale;
tests use these helpers to pin that down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().simpleString()


def assert_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        if needle not in plan:
            raise AssertionError(f"expected {needle!r} in physical plan:\n{plan}")


def assert_not_in_plan(df: DataFrame, *needles: str) -> None:
    plan = physical_plan(df)
    for needle in needles:
        if needle in plan:
            raise AssertionError(f"did not expect {needle!r} in physical plan:\n{plan}")


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of the scan nodes (empty if none)."""
    return "\n".join(
        line.strip() for line in physical_plan(df).splitlines() if "PushedFilters" in line
    )