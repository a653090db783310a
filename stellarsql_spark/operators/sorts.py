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
    """Top-3 orders per customer as a HASH AGGREGATE, not a sort.

    row_number-over-window needs two full sorts of the fact table
    (partial WindowGroupLimit sort before the exchange, final sort
    after) — measured 1.8 s at the 10× probe. When the per-group row
    count is bounded (orders per customer ≈ 10-30), collect_list +
    sort_array + slice computes the same top-3 with one map-side
    partial hash agg and per-group O(g log g) micro-sorts: no global
    sort anywhere, ~1.5× faster today and linear (not n log n) in the
    fact size. Tie-break parity with ROW_NUMBER (price DESC, orderkey
    ASC) comes from sorting struct(price, -orderkey) descending. The
    customer join runs AFTER the limit, on ≤3 rows per key. For
    unbounded groups the window form (b_win_*) remains the fallback."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    top3 = F.slice(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("o_totalprice").alias("p"), (-F.col("o_orderkey")).alias("nk")
                )
            ),
            asc=False,
        ),
        1,
        3,
    )
    aggd = (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .groupBy("o_custkey")
        .agg(top3.alias("top"))
        .select("o_custkey", F.posexplode("top").alias("pos", "t"))
        .select(
            "o_custkey",
            (-F.col("t.nk")).alias("o_orderkey"),
            F.col("t.p").alias("o_totalprice"),
            (F.col("pos") + 1).alias("rn"),
        )
    )
    return aggd.join(c.select("c_custkey"), aggd.o_custkey == F.col("c_custkey")).select(
        "c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
    )
