"""SQL-surface parity extensions: LATERAL joins, value-window
functions, error-safe try_* arithmetic, and a second string-function
family (SURVEY.md §2 B-8/B-2 widening).

All pure JVM expressions inside whole-stage codegen — nothing here
adds a Python boundary or an extra shuffle beyond the window's own
partition exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table, register_views
from stellarsql_spark.registry import register

_LATERAL_SQL = """
SELECT c_custkey, c_mktsegment, t.n_orders, t.max_price
FROM customer,
LATERAL (
  SELECT COUNT(*) AS n_orders,
         CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
  FROM orders WHERE o_custkey = c_custkey
) t
WHERE c_custkey < 300
"""


@register("b_sql_lateral", oracle=_LATERAL_SQL, tags=("sql", "lateral", "subquery"))
def b_sql_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated derived table: per-customer aggregate in the
    FROM clause. Catalyst decorrelates to an aggregate + left outer
    join — one pass over orders, no per-row re-execution."""
    register_views(spark, sf_dir, ("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


_NTH_ORACLE = """
SELECT o_orderkey, o_custkey,
       FIRST_VALUE(o_totalprice) OVER w AS first_price,
       NTH_VALUE(o_totalprice, 2) OVER w AS second_price,
       LAST_VALUE(o_totalprice)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS final_price
FROM orders
WHERE o_custkey < 200
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@register("b_win_nth", oracle=_NTH_ORACLE, tags=("window", "nth_value"))
def b_win_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-window functions: first/nth with the default growing frame
    (nth is NULL until row n arrives — same in both engines) and last
    over the full-partition frame."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") < 200)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        F.last("o_totalprice").over(w_full).alias("final_price"),
    )


_TRY_ORACLE = """
SELECT o_orderkey,
       TRY_CAST(o_orderstatus AS INT) AS status_int,
       CAST(o_totalprice / NULLIF(o_orderkey - 7, 0) AS DOUBLE) AS price_ratio,
       string_split(o_orderpriority, '-')[5] AS missing_part
FROM orders
WHERE o_orderkey < 300
"""


@register("b_fn_try", oracle=_TRY_ORACLE, tags=("function", "try", "errors"))
def b_fn_try(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expressions: TRY_CAST of a non-numeric string,
    try_divide (NULL on zero divisor, like x / NULLIF(y,0)), and
    out-of-bounds array access returning NULL instead of raising."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.col("o_orderstatus").try_cast("int").alias("status_int"),
        F.try_divide(F.col("o_totalprice"), F.col("o_orderkey") - 7)
        .cast("double")
        .alias("price_ratio"),
        F.try_element_at(F.split("o_orderpriority", "-"), F.lit(5)).alias("missing_part"),
    )


_STR2_ORACLE = """
SELECT p_partkey,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
       translate(p_brand, '#123456789', '-bcdefghij') AS brand_coded,
       reverse(p_type) AS type_rev,
       repeat(p_brand, 2) AS brand_twice,
       strpos(p_name, 'o') AS first_o,
       left(p_name, 3) AS name_l3,
       right(p_name, 3) AS name_r3,
       ascii(p_type) AS type_ascii
FROM part
WHERE p_partkey < 400
"""


@register("b_fn_string2", oracle=_STR2_ORACLE, tags=("function", "string"))
def b_fn_string2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string family: regex extract-all, translate, reverse,
    repeat, position, left/right, ascii."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 400)
    return p.select(
        "p_partkey",
        F.array_join(F.regexp_extract_all("p_name", F.lit("([a-z]+)")), ",").alias("words"),
        F.translate("p_brand", "#123456789", "-bcdefghij").alias("brand_coded"),
        F.reverse("p_type").alias("type_rev"),
        F.repeat("p_brand", 2).alias("brand_twice"),
        F.instr("p_name", "o").alias("first_o"),
        F.substring("p_name", 1, 3).alias("name_l3"),
        F.expr("right(p_name, 3)").alias("name_r3"),
        F.ascii("p_type").alias("type_ascii"),
    )


_MAP_ORACLE = """
WITH wc AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  WHERE word <> '' AND doc_id < 50
  GROUP BY doc_id, word
)
SELECT doc_id,
       COUNT(*) AS n_keys,
       array_to_string(list_sort(list(word)), ',') AS keys_sorted,
       CAST(MAX(CASE WHEN word = 'join' THEN cnt END) AS BIGINT) AS join_cnt
FROM wc
GROUP BY doc_id
"""


@register("b_fn_map", oracle=_MAP_ORACLE, tags=("function", "map"))
def b_fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: build word→count maps per doc
    (map_from_entries), then interrogate them with map_keys /
    element_at. The oracle computes the same facts map-free, checking
    that the map round-trip loses nothing."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("cnt"))
    )
    mapped = wc.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("word", "cnt"))).alias("m")
    )
    return mapped.select(
        "doc_id",
        F.size("m").cast("bigint").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_sorted"),
        F.element_at("m", "join").alias("join_cnt"),
    )


_HINTS_SQL = """
SELECT /*+ BROADCAST(n), MERGE(o) */
       n_name, COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o_custkey = c_custkey
JOIN nation n   ON c_nationkey = n_nationkey
GROUP BY n_name
"""

_HINTS_ORACLE = """
SELECT n_name, COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o_custkey = c_custkey
JOIN nation n   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@register("b_sql_hints", oracle=_HINTS_ORACLE, tags=("sql", "hints", "join"))
def b_sql_hints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hints through SQL comments: BROADCAST pins the
    nation dim to a broadcast-hash join, MERGE requests sort-merge for
    the fact side — the escape hatch when the optimizer's stats-based
    choice is wrong. Hints change the physical plan only; the oracle
    is the unhinted query."""
    register_views(spark, sf_dir, ("orders", "customer", "nation"))
    return spark.sql(_HINTS_SQL)


# --- inline VALUES relations ----------------------------------------

_VALUES_SQL = """
SELECT c_mktsegment AS seg, CAST(w AS DOUBLE) AS w, COUNT(*) AS n_cust,
       CAST(COUNT(*) * w AS DOUBLE) AS weighted
FROM customer
JOIN (VALUES ('AUTOMOBILE', 1.5), ('BUILDING', 2.0), ('FURNITURE', 0.5),
             ('HOUSEHOLD', 1.0), ('MACHINERY', 1.25)) AS t(seg, w)
  ON c_mktsegment = t.seg
GROUP BY c_mktsegment, w
"""


@register("b_sql_values", oracle=_VALUES_SQL, tags=("sql", "values"))
def b_sql_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C126: inline VALUES relation — a literal lookup table written
    directly in the query (segment → sampling weight) joined against
    a corpus table; the idiom for small config/mapping tables that
    don't warrant a file. Identical ANSI text on both engines;
    Catalyst folds the VALUES into a LocalRelation and broadcasts
    it, so the corpus side is a map-side probe at any scale."""
    register_views(spark, sf_dir, ("customer",))
    return spark.sql(_VALUES_SQL)


# --- LIMIT/OFFSET pagination ----------------------------------------

_OFFSET_SQL = """
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20 OFFSET 40
"""


@register("b_sql_offset", oracle=_OFFSET_SQL, tags=("sql", "offset", "limit"))
def b_sql_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C127: LIMIT/OFFSET pagination over a deterministic total order
    (price desc, key tiebreak — without the unique tiebreak the page
    boundary would be engine-dependent). Spark executes this as
    TakeOrderedAndProject with limit+offset pushed into the per-
    partition top-k: each task keeps 60 rows, the driver merges and
    drops the first 40 — no global sort materializes, which is why
    page-N-of-a-100 TB-table is cheap while OFFSET 1e9 would not be
    (documented anti-pattern: keyset pagination is the scale path)."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_OFFSET_SQL)


# Keyset (seek) pagination: the scale path b_sql_offset's docstring
# names. The page-2 boundary row (here a 1-row subquery standing in
# for the cursor a client would hold) turns "skip 40" into a sargable
# predicate on the sort key, so each task filters then keeps only
# page-size rows — OFFSET N must buffer N+page rows per task, which
# is why OFFSET 1e9 dies at scale while the seek form stays O(page).
_KEYSET_SQL = """
WITH b AS (
  SELECT o_totalprice AS bp, o_orderkey AS bk
  FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 1 OFFSET 39
)
SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS price
FROM orders, b
WHERE o_totalprice < bp OR (o_totalprice = bp AND o_orderkey > bk)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


@register("b_sql_keyset", oracle=_KEYSET_SQL, tags=("sql", "offset", "keyset"))
def b_sql_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C152: keyset pagination twin of b_sql_offset — byte-identical
    page 3 (rows 41-60 of the price-desc order), fetched by SEEKING
    past the last row of page 2 instead of skipping 40 rows.

    The paged scan plans as TakeOrderedAndProject(limit=20) over a
    filtered scan with NO offset anywhere (asserted in
    tests/test_round8.py, alongside result equality with the OFFSET
    form): per task the work is a predicate plus a 20-row heap,
    independent of how deep the page is. The boundary subquery is a
    1-row broadcast — in production the client carries (bp, bk) as
    its cursor and the main query is all that runs. Same SQL text on
    both engines."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_KEYSET_SQL)


# --- named WINDOW clause ---------------------------------------------

_WINDOW_CLAUSE_SQL = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS rn,
       LAG(o_orderkey) OVER w AS prev_key,
       CAST(o_totalprice - AVG(o_totalprice) OVER w2 AS DOUBLE) AS price_vs_cust_avg
FROM orders WHERE o_custkey < 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       w2 AS (PARTITION BY o_custkey)
"""


@register("b_sql_window_clause", oracle=_WINDOW_CLAUSE_SQL, tags=("sql", "window", "named"))
def b_sql_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C135: named WINDOW clause — one window definition referenced by
    several functions (plus a second frameless window for the
    whole-partition average), the ANSI feature that keeps multi-
    function analytic queries from repeating their OVER specs.
    Identical SQL text on both engines. Catalyst plans the two
    specs as ONE exchange (same partition key) with the ordered
    functions sharing a sort — renaming the window changes nothing
    physically, which is the point: it's resolution-time sugar."""
    register_views(spark, sf_dir, ("orders",))
    return spark.sql(_WINDOW_CLAUSE_SQL)
