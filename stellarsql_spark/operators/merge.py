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
