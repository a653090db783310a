"""Time-series reshaping over the events stream table: calendar
gap-fill and fixed-interval resampling — the hypertable-style rollups
a metrics pipeline needs.

Gap-fill generates the full calendar spine with `sequence` (JVM-side,
no driver loop) and left-joins actuals onto it; at scale the spine is
tiny (one row per bucket) and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_GAPFILL_ORACLE = """
WITH spine AS (
  SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
                                TIMESTAMP '2024-01-30 23:00:00',
                                INTERVAL 1 HOUR)) AS bucket
),
actual AS (
  SELECT DATE_TRUNC('hour', ts) AS bucket,
         COUNT(*) AS n_raw,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_raw
  FROM events WHERE event_type = 'purchase'
  GROUP BY 1
)
SELECT s.bucket, COALESCE(a.n_raw, 0) AS n_events, COALESCE(a.v_raw, 0.0) AS total_value
FROM spine s LEFT JOIN actual a ON s.bucket = a.bucket
"""


@register("b_ts_gapfill", oracle=_GAPFILL_ORACLE, tags=("timeseries", "gapfill"))
def b_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled hourly rollup: calendar spine ⟕ actual buckets.
    Buckets with no purchases appear with 0 counts."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    actual = (
        e.groupBy(F.date_trunc("hour", "ts").alias("bucket"))
        .agg(
            F.count("*").alias("n_raw"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("v_raw"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01 00:00:00").cast("timestamp"),
                F.lit("2024-01-30 23:00:00").cast("timestamp"),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("bucket")
    )
    return spine.join(actual, "bucket", "left").select(
        "bucket",
        F.coalesce(F.col("n_raw"), F.lit(0)).alias("n_events"),
        F.coalesce(F.col("v_raw"), F.lit(0.0)).alias("total_value"),
    )


_RESAMPLE_ORACLE = """
SELECT user_id,
       time_bucket(INTERVAL '6 hours', ts) AS bucket,
       COUNT(*) AS n_events,
       CAST(MAX(value) AS DOUBLE) AS peak_value
FROM events
GROUP BY 1, 2
"""


@register("b_ts_resample", oracle=_RESAMPLE_ORACLE, tags=("timeseries", "resample"))
def b_ts_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed 6-hour resampling per user (window() tumbling buckets)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.window("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"), F.max("value").cast("double").alias("peak_value"))
        .select("user_id", F.col("w.start").alias("bucket"), "n_events", "peak_value")
    )


_ROLLUP_REUSE_ORACLE = """
SELECT DATE_TRUNC('day', ts) AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY day, event_type
"""


@register("b_ts_rollup_reuse", oracle=_ROLLUP_REUSE_ORACLE, tags=("timeseries", "rollup"))
def b_ts_rollup_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate (hypertable-rollup) pattern: answer a
    day-grain query by RE-AGGREGATING an hour-grain rollup instead of
    the raw events. Count and decimal-sum are mergeable, so the result
    is exactly the direct day aggregate (the oracle IS the direct
    form). At 100 TB the hourly rollup is a materialized table ~1000×
    smaller than the log; every coarser query reads it, not the raw
    events."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("v_sum"),
    )
    return (
        hourly.groupBy(F.date_trunc("day", F.col("hour")).alias("day"), "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("v_sum").cast("double").alias("total_value"),
        )
    )
