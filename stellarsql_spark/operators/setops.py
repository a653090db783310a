"""Set operations (SURVEY.md §2 B31–B33)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

_B31_ORACLE = """
SELECT nationkey, src FROM (
  SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier WHERE s_acctbal > 9000
) u
UNION
SELECT n_nationkey AS nationkey, 'nation' AS src FROM nation WHERE n_nationkey < 5
"""


@register("b_set_union", oracle=_B31_ORACLE, tags=("setop",))
def b_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (no shuffle) + UNION DISTINCT (hash-dedup shuffle)."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_acctbal") > 9000)
    s = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") > 9000)
    n = load_table(spark, sf_dir, "nation").where(F.col("n_nationkey") < 5)
    all_part = c.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    ).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src"))
    )
    nat = n.select(F.col("n_nationkey").alias("nationkey"), F.lit("nation").alias("src"))
    return all_part.unionByName(nat).distinct()


_B32_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9500
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("b_set_intersect", oracle=_B32_ORACLE, tags=("setop",))
def b_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9500)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


_B33_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 200
EXCEPT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("b_set_except", oracle=_B33_ORACLE, tags=("setop",))
def b_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL with real multiset semantics: each supplier in a
    nation cancels ONE customer occurrence of that nation, the rest
    survive — both sides carry duplicates, so the occurrence-count
    arithmetic (not just membership) is what the oracle checks.
    (The previous form — nation keys minus supplier nations — was
    empty at sf≥0.01 where every nation has a supplier, making the
    check vacuous.)"""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


_B33B_ORACLE = """
SELECT c_nationkey AS nationkey FROM customer WHERE c_custkey < 200
INTERSECT ALL
SELECT s_nationkey AS nationkey FROM supplier
"""


@register("b_set_intersect_all", oracle=_B33B_ORACLE, tags=("setop", "multiset"))
def b_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — the multiset twin of b_set_except's EXCEPT ALL:
    each nation key survives min(customer-count, supplier-count)
    times, so the occurrence arithmetic (not membership) is what the
    oracle checks. Compiles to the same left-semi-style hash plan as
    INTERSECT plus per-key count bookkeeping."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") < 200)
        .select(F.col("c_nationkey").alias("nationkey"))
    )
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


_UNION_BYNAME_ORACLE = """
SELECT * FROM (
  SELECT c_custkey AS id, 'customer' AS src, c_mktsegment AS seg,
         CAST(c_acctbal AS DOUBLE) AS bal
  FROM customer WHERE c_custkey % 37 = 0
  UNION ALL BY NAME
  SELECT s_suppkey AS id, 'supplier' AS src, CAST(s_nationkey AS INT) AS nat
  FROM supplier WHERE s_suppkey % 11 = 0
)
"""


@register("b_set_union_byname", oracle=_UNION_BYNAME_ORACLE, tags=("setop", "union", "byname"))
def b_set_union_byname(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C107: schema-evolution union — UNION ALL BY NAME over relations
    with different column sets (Spark `unionByName(
    allowMissingColumns=True)`, DuckDB's native `UNION ALL BY NAME`).
    Columns align by NAME, missing ones null-fill, and the output
    schema is the first input's columns followed by the second's
    extras — the operation every multi-generation data lake needs
    when old and new file schemas meet in one query. Pure map-side
    projection + concat: no shuffle at any scale."""
    c = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 37 == 0)
        .select(
            F.col("c_custkey").alias("id"),
            F.lit("customer").alias("src"),
            F.col("c_mktsegment").alias("seg"),
            F.col("c_acctbal").cast("double").alias("bal"),
        )
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_suppkey") % 11 == 0)
        .select(
            F.col("s_suppkey").alias("id"),
            F.lit("supplier").alias("src"),
            F.col("s_nationkey").cast("int").alias("nat"),
        )
    )
    return c.unionByName(s, allowMissingColumns=True)
