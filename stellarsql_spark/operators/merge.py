"""MERGE / upsert emulation (plain Spark, no Delta in this image):
the anti-join + union construction — updates overwrite matched keys,
inserts append unmatched ones. At scale this is one shuffle on the
merge key (or zero with bucketed storage); with Delta/Iceberg on the
classpath the same logic is `MERGE INTO` and the code collapses to
one SQL statement (documented swap point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

# The incoming batch: one update to an existing region, one new region.
_BATCH = [(0, "AFRICA_RENAMED"), (100, "ATLANTIS")]

_MERGE_ORACLE = """
WITH batch AS (
  SELECT * FROM (VALUES (0, 'AFRICA_RENAMED'), (100, 'ATLANTIS')) AS t(r_regionkey, r_name)
)
SELECT r_regionkey, r_name, 'kept' AS action FROM region
WHERE r_regionkey NOT IN (SELECT r_regionkey FROM batch)
UNION ALL
SELECT b.r_regionkey, b.r_name,
       CASE WHEN r.r_regionkey IS NULL THEN 'inserted' ELSE 'updated' END AS action
FROM batch b LEFT JOIN region r ON b.r_regionkey = r.r_regionkey
"""


def merge_upsert(target: DataFrame, batch: DataFrame, key: str) -> DataFrame:
    """Generic upsert: rows of `target` not in `batch` survive, batch
    rows replace/insert the rest, tagged with the action taken."""
    kept = target.join(batch, on=key, how="left_anti").withColumn("action", F.lit("kept"))
    target_keys = target.select(F.col(key).alias("_tk"))
    applied = batch.join(
        target_keys, batch[key] == F.col("_tk"), "left"
    ).select(
        *[c for c in batch.columns],
        F.when(F.col("_tk").isNull(), "inserted").otherwise("updated").alias("action"),
    )
    return kept.unionByName(applied)


@register("b_merge_upsert", oracle=_MERGE_ORACLE, tags=("merge", "upsert"))
def b_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert a literal batch into region (anti-join + union MERGE)."""
    region = load_table(spark, sf_dir, "region")
    batch = spark.createDataFrame(_BATCH, schema=region.schema)
    return merge_upsert(region, batch, "r_regionkey")


_SCD2_ORACLE = """
WITH versions AS (
  SELECT user_id, ts AS valid_from, value,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS version
  FROM events
  WHERE event_type = 'signup'
)
SELECT user_id, version, valid_from, valid_to,
       CAST(valid_to IS NULL AS BOOLEAN) AS is_current,
       CAST(value AS DOUBLE) AS value
FROM versions
"""


@register("b_merge_scd2", oracle=_SCD2_ORACLE, tags=("merge", "scd2", "window"))
def b_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history build: each user's signup events become
    versioned rows with [valid_from, valid_to) ranges — valid_to is
    the next version's start (LEAD), NULL marks the current row. One
    window per user partition; at scale this is the standard way to
    turn a change log into a dimension history without self-joins."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        F.row_number().over(w).alias("version"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
        F.col("value").cast("double").alias("value"),
    )


# --- full-snapshot sync MERGE (with BY SOURCE delete) ----------------

_SYNC_ORACLE = """
WITH tgt AS (
  SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer WHERE c_custkey < 300
),
src AS (
  SELECT c_custkey, CAST(c_acctbal + 10.0 AS DOUBLE) AS bal
  FROM customer WHERE c_custkey >= 100 AND c_custkey < 400
)
SELECT COALESCE(s.c_custkey, t.c_custkey) AS c_custkey,
       CASE WHEN s.c_custkey IS NOT NULL AND t.c_custkey IS NOT NULL THEN 'updated'
            WHEN s.c_custkey IS NOT NULL THEN 'inserted'
            ELSE 'deleted' END AS action,
       s.bal AS bal
FROM tgt t FULL JOIN src s ON t.c_custkey = s.c_custkey
"""


@register("b_merge_sync", oracle=_SYNC_ORACLE, tags=("merge", "sync", "delete"))
def b_merge_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C131: full-snapshot dimension sync — the three-way MERGE
    (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT / WHEN NOT MATCHED
    BY SOURCE DELETE) that reconciles a warehouse dimension against a
    complete upstream snapshot. Emulated as ONE full-outer join on
    the key with per-row action classification; deleted keys are
    emitted (bal NULL) as the audit trail a production MERGE writes
    to its change log. One key-partitioned shuffle per side at any
    scale — with both snapshots bucketed on the key (sources/
    bucketed.py) the exchange disappears entirely; on Delta/Iceberg
    this collapses to MERGE INTO with the same plan underneath."""
    c = load_table(spark, sf_dir, "customer")
    tgt = c.where(F.col("c_custkey") < 300).select(
        "c_custkey", F.col("c_acctbal").cast("double").alias("bal")
    )
    src = c.where((F.col("c_custkey") >= 100) & (F.col("c_custkey") < 400)).select(
        "c_custkey", (F.col("c_acctbal") + 10.0).cast("double").alias("bal")
    )
    t = tgt.alias("t")
    s = src.alias("s")
    j = t.join(s, F.col("t.c_custkey") == F.col("s.c_custkey"), "full_outer")
    return j.select(
        F.coalesce(F.col("s.c_custkey"), F.col("t.c_custkey")).alias("c_custkey"),
        F.when(
            F.col("s.c_custkey").isNotNull() & F.col("t.c_custkey").isNotNull(), "updated"
        )
        .when(F.col("s.c_custkey").isNotNull(), "inserted")
        .otherwise("deleted")
        .alias("action"),
        F.col("s.bal").alias("bal"),
    )
