"""Sorts, limits, top-k (SURVEY.md §2 B28–B30).

The driver's hash compare is order-insensitive, so sortedness is made
hash-visible by materializing the sort position as a column. Global
top-k uses Spark's TakeOrderedAndProject (per-partition heap + driver
merge — no global sort, the scalable plan); per-group top-k uses a
rank window which AQE keeps as one shuffle on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_B28_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey, bal_band,
       ROW_NUMBER() OVER (ORDER BY bal_band DESC NULLS LAST, s_nationkey ASC, s_suppkey DESC) AS pos
FROM (
  SELECT s_suppkey, s_name, s_nationkey,
         NULLIF(ROUND(s_acctbal / 1000), 0) AS bal_band
  FROM supplier
) t
"""


@register("b_sort_multi", oracle=_B28_ORACLE, tags=("sort",))
def b_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with mixed direction and NULLS LAST, made
    order-sensitive for the hash check via a global position column."""
    s = load_table(spark, sf_dir, "supplier").withColumn(
        "bal_band", F.nullif(F.round(F.col("s_acctbal") / 1000), F.lit(0))
    )
    order = [
        F.col("bal_band").desc_nulls_last(),
        F.col("s_nationkey").asc(),
        F.col("s_suppkey").desc(),
    ]
    w = Window.orderBy(*order)
    return s.select(
        "s_suppkey", "s_name", "s_nationkey", "bal_band", F.row_number().over(w).alias("pos")
    )


_B29_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
"""


@register("b_topk_global", oracle=_B29_ORACLE, tags=("sort", "topk"))
def b_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no full sort — survives any scale)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(15)
    )


_B30_ORACLE = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM customer JOIN orders ON c_custkey = o_custkey
) t
WHERE rn <= 3
"""


@register("b_topk_per_group", oracle=_B30_ORACLE, tags=("sort", "topk"))
def b_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: rank window + filter (single shuffle
    on the group key; WindowGroupLimit pushes the limit into the sort)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    joined = c.join(o, c.c_custkey == o.o_custkey).select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return joined.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 3)
