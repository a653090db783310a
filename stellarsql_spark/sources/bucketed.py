"""Bucketed tables: the shuffle-free fact-fact join (SCALE.md §Joins).

`bucketBy(n, key)` at write time co-locates rows by hash(key) so a
later join on that key needs NO exchange on either side — at 100 TB
this deletes the single most expensive stage of orders⋈lineitem.
Bucketed tables require the session catalog (`saveAsTable`), which
lands in the Spark warehouse directory (pointed at the repo scratch
area).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.functions.exact import sql_dsum
from stellarsql_spark.registry import register

N_BUCKETS = 8

_BUCKETED_ORACLE = f"""
SELECT o_orderstatus, COUNT(*) AS n_items, {sql_dsum("l_extendedprice")} AS gross
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


def _drop_stale_location(spark: SparkSession, table: str) -> None:
    """A fresh session's in-memory catalog doesn't know tables a prior
    session wrote; remove the orphaned warehouse dir so saveAsTable
    can re-create it."""
    import shutil
    from urllib.parse import urlparse

    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    path = os.path.join(warehouse, table)
    if os.path.exists(path):
        shutil.rmtree(path)


def write_bucketed(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Persist orders+lineitem bucketed by order key; idempotent per SF."""
    tag = "".join(ch if ch.isalnum() else "_" for ch in sf_dir.rstrip("/")).strip("_")
    to, tl = f"orders_b_{tag}", f"lineitem_b_{tag}"
    existing = {t.name for t in spark.catalog.listTables()}
    if to not in existing:
        _drop_stale_location(spark, to)
        (
            load_table(spark, sf_dir, "orders")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(to)
        )
    if tl not in existing:
        _drop_stale_location(spark, tl)
        (
            load_table(spark, sf_dir, "lineitem")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(tl)
        )
    return to, tl


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    to, tl = write_bucketed(spark, sf_dir)
    # hint("merge"): pin the bucket-aligned SortMergeJoin (no Exchange on
    # either side). On toy data the optimizer would rather broadcast;
    # at scale the shuffle-free SMJ is exactly the plan bucketing buys.
    o, li = spark.table(to).hint("merge"), spark.table(tl)
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("gross"),
        )
    )


@register("b_join_bucketed", oracle=_BUCKETED_ORACLE, tags=("join", "bucketed"))
def b_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem on pre-bucketed tables: SortMergeJoin with no
    Exchange on either side (asserted in tests/test_plans.py)."""
    return bucketed_join(spark, sf_dir)
