"""Subqueries & CTEs through the SQL entry point (SURVEY.md §3.2-1).

These exercise Catalyst's subquery machinery: scalar-subquery
rewrite, IN→left-semi conversion, and correlated-subquery
decorrelation (`RewriteCorrelatedScalarSubquery`) — all free once the
query is declared in SQL. The same ANSI text runs on DuckDB as the
oracle, so parser + rewrite semantics are pinned end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stellarsql_spark.catalog import register_views
from stellarsql_spark.registry import register

_CTE_ORACLE = """
WITH seg_stats AS (
  SELECT c_mktsegment,
         CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS seg_bal,
         COUNT(*) AS seg_n
  FROM customer GROUP BY c_mktsegment
),
big AS (
  SELECT * FROM seg_stats WHERE seg_n > 10
)
SELECT c_mktsegment, seg_bal, seg_n,
       CAST(seg_bal / seg_n AS DOUBLE) AS avg_bal
FROM big
"""


@register("b_sql_cte", oracle=_CTE_ORACLE, tags=("sql", "cte"))
def b_sql_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs (WITH ... , ...) through Spark's SQL parser."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_CTE_ORACLE)


_SCALAR_SUBQ_ORACLE = """
SELECT c_custkey, c_nationkey, c_acctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(AVG(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) * 1.5
                   FROM supplier)
"""


@register("b_sql_scalar_subquery", oracle=_SCALAR_SUBQ_ORACLE, tags=("sql", "subquery"))
def b_sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate."""
    register_views(spark, sf_dir, ("customer", "supplier"))
    return spark.sql(_SCALAR_SUBQ_ORACLE)


_IN_SUBQ_ORACLE = """
SELECT p_partkey, p_brand, p_size
FROM part
WHERE p_partkey IN (
  SELECT l_partkey FROM lineitem WHERE l_quantity >= 49
)
AND p_size < 10
"""


@register("b_sql_in_subquery", oracle=_IN_SUBQ_ORACLE, tags=("sql", "subquery"))
def b_sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join after rewrite."""
    register_views(spark, sf_dir, ("part", "lineitem"))
    return spark.sql(_IN_SUBQ_ORACLE)


_CORR_SUBQ_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT CAST(AVG(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
  FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
"""


@register("b_sql_corr_subquery", oracle=_CORR_SUBQ_ORACLE, tags=("sql", "subquery"))
def b_sql_corr_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-customer average) — Catalyst
    decorrelates to an aggregate + join; DuckDB does the same rewrite,
    and the decimal-exact AVG keeps both sides bit-identical."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_CORR_SUBQ_ORACLE)


_RECURSIVE_ORACLE = """
WITH RECURSIVE bounds AS (
  SELECT DATE_TRUNC('month', MIN(o_orderdate)) AS lo,
         DATE_TRUNC('month', MAX(o_orderdate)) AS hi
  FROM orders
),
months(m, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT m + INTERVAL 1 MONTH, hi FROM months WHERE m < hi
),
mc AS (
  SELECT DATE_TRUNC('month', o_orderdate) AS m, COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start, COALESCE(mc.n, 0) AS n_orders
FROM months LEFT JOIN mc ON months.m = mc.m
"""


@register("b_sql_recursive", oracle=_RECURSIVE_ORACLE, tags=("sql", "cte", "recursive"))
def b_sql_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): generate the full month
    series spanning the order history — including empty months — then
    left-join monthly order counts. The identical ANSI text runs on
    DuckDB, pinning the recursion (anchor + iterated term + implicit
    UNION ALL fixpoint) end-to-end. Iteration depth is bounded by the
    data span (~80 months), far under Spark's recursion-level limit."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_RECURSIVE_ORACLE)


# Identical ANSI text runs on BOTH engines — the oracle IS the query
# (the b_sql_groupby_all pattern).
_EXISTS_ORACLE = """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000
      )
"""


@register("b_sql_exists", oracle=_EXISTS_ORACLE, tags=("sql", "subquery", "exists"))
def b_sql_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C108: correlated EXISTS / NOT EXISTS predicates — the remaining
    subquery quantifiers next to IN (b_sql_in_subquery), scalar, and
    correlated-scalar. Byte-identical SQL text on both engines.
    Catalyst rewrites EXISTS to a LEFT SEMI join and NOT EXISTS to a
    LEFT ANTI join on the correlation key (plan-asserted in tests) —
    both hash-shuffle joins carrying only the correlation columns, so
    the pattern scales like any equi-join: no per-row re-execution of
    the subquery, which is what a naive nested-loop interpretation
    would do at 100 TB."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_EXISTS_ORACLE)
