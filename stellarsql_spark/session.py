"""SparkSession factory.

The reference engine's entry point is a TCP server accepting SQL text
(StellarSQL ``src/main.rs``, ``src/connection/`` [pub, unverified]);
in a Spark-native engine the ``SparkSession`` *is* the entry point, so
this module only concentrates the session tuning in one place.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting,
  and join-strategy switching replace hand-tuning per query.
- ``spark.sql.shuffle.partitions`` is a *local* default (≈ cores);
  on a real cluster AQE's coalescing makes the initial number a cap,
  so a cluster deploy would raise it to 2-3× total cores.
- Session timezone pinned to UTC so timestamp semantics match the
  DuckDB oracle (UTC-naive) and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def get_spark(app_name: str = "stellarsql_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = cpus or DEFAULT_CPUS
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_oracle(spark: SparkSession) -> SparkSession:
    """Runtime confs every query needs regardless of who built the session.

    The driver harness owns the SparkSession it passes to ``entry``/
    ``queries()`` callables, so anything correctness-critical must be a
    runtime-settable conf applied here, not a builder-time conf.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
