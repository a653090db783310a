"""Spark 4 modern-SQL surface (SURVEY.md §2 C61-C63): VARIANT
semi-structured values, SQL pipe syntax, and string collations.

Reference parity note: /root/reference is an empty checkout (SURVEY.md
§0); these keys cover the post-2024 ANSI/industry SQL surface a
current analytics engine is expected to ship (semi-structured VARIANT
as in Snowflake/Databricks, ZetaSQL-style pipe queries, ICU
collations), each expressed through the native Spark 4 feature and
hash-checked against a DuckDB oracle computing the same values with
classic constructs.

Scale notes: VARIANT parse/extract is per-row JVM work (no UDF, no
shuffle beyond the query's own aggregation); pipe syntax is pure
frontend sugar compiling to the same Catalyst plans as the ANSI form
(verified: same physical plan); collation comparisons evaluate inside
codegen — grouping by a collated key shuffles on the collation key
exactly like any other groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table, register_views
from stellarsql_spark.functions.exact import sql_csum
from stellarsql_spark.registry import register

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k,
       event_type AS t,
       value AS v
FROM events WHERE event_id % 97 = 0
"""


@register("b_fn_variant", oracle=_VARIANT_ORACLE, tags=("function", "variant", "semistructured"))
def b_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4): parse the props JSON column into an open
    semi-structured value once, then pull typed paths out with
    variant_get — the schema-on-read path for event payloads whose
    shape drifts (vs b_fn_json's per-path get_json_object re-parses).
    A second variant is CONSTRUCTED from row data and round-tripped,
    covering build + extract. The oracle computes the same values with
    DuckDB's classic JSON operators."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_id") % 97 == 0)
    return e.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'int')").alias("k"),
        F.expr(
            "variant_get(parse_json(to_json(named_struct('t', event_type, 'v', value))),"
            " '$.t', 'string')"
        ).alias("t"),
        F.expr(
            "variant_get(parse_json(to_json(named_struct('t', event_type, 'v', value))),"
            " '$.v', 'double')"
        ).alias("v"),
    )


_PIPE_ORACLE = f"""
SELECT o_orderpriority, COUNT(*) AS n, {sql_csum("o_totalprice")} AS spend
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
HAVING COUNT(*) > 5
"""


@register("b_sql_pipe", oracle=_PIPE_ORACLE, tags=("sql", "pipe"))
def b_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4, ZetaSQL-style): the same
    filter→aggregate→having pipeline as the ANSI oracle, written as a
    linear |> chain. Pure frontend: the parser lowers each stage onto
    the previous one's plan, so Catalyst sees the identical logical
    tree and the physical plan matches the ANSI form (pinned in
    tests)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE COUNT(*) AS n,
             CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS spend
             GROUP BY o_orderpriority
        |> WHERE n > 5
        |> SELECT o_orderpriority, n, spend
        """
    )


_COLLATION_ORACLE = """
SELECT MIN(mixed) AS name, COUNT(*) AS n
FROM (
  SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS mixed
  FROM part
)
GROUP BY lower(mixed)
"""


@register("b_fn_collation", oracle=_COLLATION_ORACLE, tags=("function", "collation"))
def b_fn_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4): group a deliberately case-mangled
    name column under UTF8_LCASE, so 'RED WIDGET' and 'red widget'
    land in one group WITHOUT rewriting the data through lower() —
    the collation is a property of the comparison, not a projection.
    The group representative (binary MIN) and count are
    collation-independent values both engines agree on; the oracle
    gets the same grouping with the classic lower() rewrite."""
    register_views(spark, sf_dir, ("part",))
    return spark.sql(
        """
        SELECT MIN(mixed) AS name, COUNT(*) AS n
        FROM (
          SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name) ELSE p_name END AS mixed
          FROM part
        )
        GROUP BY mixed COLLATE UTF8_LCASE
        """
    )


# C79 — ordered LISTAGG (SQL:2023, new in Spark 4): deterministic
# string aggregation via the mandatory WITHIN GROUP order.  The
# DuckDB twin is string_agg(expr, sep ORDER BY ...).  The modulo
# filter keeps per-group strings bounded (listagg of an unbounded
# group is an anti-pattern at any scale — the aggregate state is the
# concatenation itself).
_LISTAGG_ORACLE = """
SELECT c_mktsegment,
       COUNT(*) AS n,
       string_agg(c_name, '|' ORDER BY c_name) AS names
FROM customer
WHERE c_custkey % 97 = 0
GROUP BY c_mktsegment
"""


@register("b_agg_listagg", oracle=_LISTAGG_ORACLE, tags=("agg", "listagg", "modern-sql"))
def b_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79: LISTAGG ... WITHIN GROUP (ORDER BY ...) — the SQL:2023
    ordered string aggregation, hash-exact because the order clause
    makes the concatenation deterministic on both engines."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n,
               listagg(c_name, '|') WITHIN GROUP (ORDER BY c_name) AS names
        FROM customer
        WHERE c_custkey % 97 = 0
        GROUP BY c_mktsegment
        """
    )


# C80 — GROUP BY ALL (DuckDB-originated, adopted by Spark 4): the
# grouping keys are inferred as every non-aggregate select item.
# IDENTICAL SQL text runs on both engines — the strongest form of
# cross-engine parity this suite checks.
_GROUPBY_ALL_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_csum('o_totalprice')} AS revenue
FROM orders
GROUP BY ALL
"""


@register("b_sql_groupby_all", oracle=_GROUPBY_ALL_SQL, tags=("sql", "modern-sql", "groupby-all"))
def b_sql_groupby_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C80: GROUP BY ALL — the oracle IS the Spark query text,
    byte-identical on both engines (key-inference semantics must
    agree, not just results)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_GROUPBY_ALL_SQL)


# C84 — XML surface: to_xml / from_xml round trip + XPath extraction.
# DuckDB has no XML support, so the oracle recomputes the SAME values
# relationally — the round trip must be lossless, which is the
# property under test.  Map-only (no shuffle beyond the final agg);
# XML parse/serialize run JVM-side, no UDF.
_XML_ORACLE = """
SELECT o_orderstatus AS status,
       COUNT(*) AS n,
       CAST(SUM(o_custkey) AS BIGINT) AS sum_cust
FROM orders
WHERE o_orderkey % 53 = 0
GROUP BY o_orderstatus
"""


@register("b_fn_xml", oracle=_XML_ORACLE, tags=("function", "xml", "semistructured"))
def b_fn_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C84: serialize rows to XML (`to_xml`), re-parse with
    `from_xml` AND independently with `xpath_*`, then aggregate the
    re-extracted values — both extraction paths must agree with the
    relational ground truth the oracle computes."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 53 == 0)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )
    xml = o.select(
        F.to_xml(F.struct("o_orderkey", "o_custkey", "o_orderstatus")).alias("x")
    )
    schema = "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING"
    parsed = xml.select(
        F.from_xml("x", schema).alias("r"),
        F.xpath_long("x", F.lit("/ROW/o_custkey")).alias("xp_cust"),
        F.xpath_string("x", F.lit("/ROW/o_orderstatus")).alias("xp_status"),
    )
    return (
        parsed.where(
            (F.col("r.o_custkey") == F.col("xp_cust"))
            & (F.col("r.o_orderstatus") == F.col("xp_status"))
        )
        .groupBy(F.col("r.o_orderstatus").alias("status"))
        .agg(
            F.count("*").alias("n"),
            F.sum("xp_cust").cast("bigint").alias("sum_cust"),
        )
    )


# C85 — lateral column aliases: a select item referencing a PRIOR
# alias in the same SELECT (SQL:2023-adjacent; DuckDB pioneered it,
# Spark adopted in 3.4).  Byte-identical text on both engines.
_LCA_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(ROUND(AVG(o_custkey)) AS BIGINT) AS avg_cust,
       avg_cust * 2 AS double_avg,
       double_avg + n AS combined
FROM orders
GROUP BY o_orderpriority
"""


@register("b_sql_lateral_alias", oracle=_LCA_SQL, tags=("sql", "modern-sql", "lateral-alias"))
def b_sql_lateral_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C85: lateral column aliases — `double_avg` and `combined` are
    defined from earlier select items, chained twice.  The oracle IS
    the query text (alias-resolution semantics must agree, not just
    the arithmetic)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_LCA_SQL)


# C86 — parameterized SQL (Spark 4 named parameter markers): the
# production path for injecting untrusted literals without string
# concatenation.  The oracle is the same query with the parameters
# substituted as literals — binding must be value-equivalent.
_PARAM_STATUS = "F"
_PARAM_MIN_PRICE = 150000.0

_PARAM_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
FROM orders
WHERE o_orderstatus = '{_PARAM_STATUS}' AND o_totalprice >= {_PARAM_MIN_PRICE}
GROUP BY o_orderpriority
"""


@register("b_sql_parameterized", oracle=_PARAM_ORACLE, tags=("sql", "modern-sql", "parameterized"))
def b_sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C86: named-parameter SQL — ``spark.sql(text, args=...)`` with
    ``:status`` / ``:min_price`` markers.  Parameters bind as typed
    literals into the plan (constant-folded, pushdown-eligible — NOT
    string splicing)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
        FROM orders
        WHERE o_orderstatus = :status AND o_totalprice >= :min_price
        GROUP BY o_orderpriority
        """,
        args={"status": _PARAM_STATUS, "min_price": _PARAM_MIN_PRICE},
    )


_QUALIFY_ORACLE = """
SELECT o_orderpriority, o_orderkey, CAST(o_totalprice AS DOUBLE) AS price,
       ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS rk
FROM orders
QUALIFY rk <= 3
"""


@register("b_sql_qualify", oracle=_QUALIFY_ORACLE, tags=("sql", "modern-sql", "qualify"))
def b_sql_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C98: QUALIFY-equivalent window filtering. Spark has no QUALIFY
    clause (DuckDB/Snowflake/BigQuery do), so the engine provides the
    canonical lowering — QUALIFY <pred over window fns> ==
    project(window) → filter — which is exactly what those engines'
    planners do internally. The oracle runs DuckDB's native QUALIFY
    so the key certifies the lowering against a real implementation,
    deterministic via the (price DESC, orderkey) total order. The
    filter-on-rank rides Spark's WindowGroupLimit pushdown (top-k per
    group without materializing full ranks), the same plan shape as
    b_topk_per_group."""
    o = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.select(
            "o_orderpriority",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= 3)
    )


_ORDER_ALL_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""


@register("b_sql_order_all", oracle=_ORDER_ALL_SQL, tags=("sql", "modern", "orderall"))
def b_sql_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C142: ORDER BY ALL (+ GROUP BY ALL) — the modern-SQL shorthand
    pair: group on every non-aggregate select item, then order by
    every select item left-to-right, identical text on both engines
    (Spark 4 and DuckDB both ship it). The ordering includes the
    aggregate columns, so the result order is total and deterministic
    without naming a single column — resolution-time sugar over the
    same hash-agg + TakeOrdered plan the explicit form produces."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_ORDER_ALL_SQL)


# --- DISTINCT ON: first row per key by an explicit order (C162) ------

_DISTINCT_ON_ORACLE = """
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_custkey < 500
ORDER BY o_custkey, o_totalprice DESC, o_orderkey
"""


@register("b_sql_distinct_on", oracle=_DISTINCT_ON_ORACLE, tags=("sql", "modern-sql", "distinct-on"))
def b_sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C162: DISTINCT ON (key) — the Postgres/DuckDB shorthand for
    "one row per key, chosen by an explicit ORDER BY" (here: each
    customer's highest-value order, orderkey as the total tie-break).

    Spark has no DISTINCT ON surface; the engine-native expression is
    the rank-1 window, which Spark 3.5+ executes as WindowGroupLimit:
    the per-partition TOP-1 is computed map-side BEFORE the exchange,
    so the shuffle carries at most one row per (partition, key) — the
    same partial-aggregation shape that makes this safe at 100 TB
    (never a full sort of the fact table; see b_topk_per_group's plan
    notes). The oracle runs the literal DISTINCT ON syntax, pinning
    the semantic equivalence of the two surfaces."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 500)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus")
    )


# --- SELECT * EXCEPT: projection by exclusion (C230) ----------------------------------

# The wide-table ergonomic both engines grew independently (Spark 3.4
# `* EXCEPT (...)`, DuckDB `* EXCLUDE (...)`): project everything BUT
# the named columns.  The key pins that the exclusion happens at
# ANALYSIS time — the scan's ReadSchema must already drop the
# excluded column (asserted in tests), i.e. it is column pruning, not
# a post-projection.
_STAR_EXCEPT_ORACLE = """
SELECT COLUMNS(* EXCLUDE (o_comment_na, o_totalprice)) FROM (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
         o_orderpriority, NULL AS o_comment_na
  FROM orders
) WHERE o_orderkey < 1000
ORDER BY o_orderkey
"""


@register("b_sql_star_except", oracle=_STAR_EXCEPT_ORACLE, tags=("sql", "projection"))
def b_sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C230: SELECT * EXCEPT — projection by exclusion over a wide
    relation (Spark's EXCEPT = DuckDB's EXCLUDE).  The value at scale
    is that the exclusion resolves during analysis, so Catalyst's
    column pruning pushes the NARROWED schema to the parquet scan —
    the excluded money column never leaves storage (ReadSchema
    asserted in tests/test_round8c.py).

    orderdate is deliberately absent and a NULL dummy present, so the
    projected shape is non-trivial on both sides."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_se")
    return spark.sql(
        """
        SELECT * EXCEPT (o_comment_na, o_totalprice) FROM (
          SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderpriority, CAST(NULL AS STRING) AS o_comment_na
          FROM orders_se
        ) WHERE o_orderkey < 1000
        """
    )
