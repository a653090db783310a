"""Projections, rich predicates, conditionals (SURVEY.md §2 B5–B7).

All expressions stay JVM-side (`pyspark.sql.functions`) so they join
the whole-stage-codegen pipeline and push down to the parquet scan
where eligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_B5_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  CAST(l_quantity AS BIGINT) AS qty_int,
  CAST(CAST(l_extendedprice AS DECIMAL(18,2))
       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price,
  CAST(l_extendedprice > 30000 AS BOOLEAN) AS is_big,
  DATE_TRUNC('day', l_shipdate) AS ship_day
FROM lineitem
WHERE l_linenumber = 1
"""


@register("b_project_compute", oracle=_B5_ORACLE, tags=("projection",))
def b_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed projections with aliases and CASTs."""
    li = load_table(spark, sf_dir, "lineitem")
    net = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("double")
    return li.where(F.col("l_linenumber") == 1).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        net.alias("net_price"),
        (F.col("l_extendedprice") > 30000).alias("is_big"),
        F.date_trunc("day", "l_shipdate").alias("ship_day"),
    )


_B6_ORACLE = """
SELECT p_partkey, p_brand, p_type, p_size
FROM part
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
  AND p_size BETWEEN 5 AND 25
  AND p_type LIKE '%PROMO%'
  AND p_name IS NOT NULL
"""


@register("b_filter_rich", oracle=_B6_ORACLE, tags=("filter",))
def b_filter_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / BETWEEN / LIKE / IS NULL — all pushdown-eligible predicates."""
    p = load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_size").between(5, 25)
        & F.col("p_type").like("%PROMO%")
        & F.col("p_name").isNotNull()
    ).select("p_partkey", "p_brand", "p_type", "p_size")


_B7_ORACLE = """
SELECT
  o_orderkey,
  CASE
    WHEN o_totalprice >= 300000 THEN 'high'
    WHEN o_totalprice >= 100000 THEN 'mid'
    ELSE 'low'
  END AS price_band,
  COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
  CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
       THEN 1 ELSE 0 END AS is_urgent
FROM orders
"""


@register("b_case_when", oracle=_B7_ORACLE, tags=("conditional",))
def b_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / COALESCE / NULLIF conditional expressions."""
    o = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") >= 300000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    urgent = F.when(
        F.col("o_orderpriority").like("1%") | F.col("o_orderpriority").like("2%"), 1
    ).otherwise(0)
    return o.select(
        "o_orderkey",
        band.alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        urgent.alias("is_urgent"),
    )
