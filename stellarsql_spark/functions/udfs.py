"""UDF / UDAF / UDTF surface (SURVEY.md §2 B46–B49).

UDFs are the deliberate slow path: row-at-a-time Python UDF (B46) is
included for surface parity, the Arrow-vectorized pandas UDF (B47) is
the form actually recommended at scale (10-100× less serde), the
grouped applyInPandas (B48) is the UDAF story, and the Python UDTF
(B49, Spark 4) is the table-function story. All payload math is kept
integer/string-exact so the oracle hash cannot drift.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table, register_views
from stellarsql_spark.registry import register

_B46_ORACLE = """
SELECT c_custkey, c_acctbal,
       CASE WHEN c_acctbal < 0 THEN 'debt'
            WHEN c_acctbal < 5000 THEN 'ok'
            ELSE 'rich' END AS wealth
FROM customer
"""


def _wealth_band_py(bal: float) -> str:
    if bal < 0:
        return "debt"
    if bal < 5000:
        return "ok"
    return "rich"


@register("b_udf_scalar", oracle=_B46_ORACLE, tags=("udf",))
def b_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (surface parity; the pandas UDF
    below is the production form)."""
    wealth_band = F.udf(_wealth_band_py, "string")
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", "c_acctbal", wealth_band("c_acctbal").alias("wealth"))


_B47_ORACLE = """
SELECT event_id, value,
       value * 2 AS value_x2,
       CAST(LENGTH(event_type) + 1 AS BIGINT) AS type_len1
FROM events
"""


@register("b_udf_pandas", oracle=_B47_ORACLE, tags=("udf", "pandas"))
def b_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDFs (Arrow batches across the Python
    boundary — the scalable Python-compute path)."""

    @F.pandas_udf("double")
    def double_it(s: pd.Series) -> pd.Series:
        return s * 2  # exact: doubling a double is a power-of-two scale

    @F.pandas_udf("long")
    def len_plus_one(s: pd.Series) -> pd.Series:
        return (s.str.len() + 1).astype("int64")

    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "value",
        double_it("value").alias("value_x2"),
        len_plus_one("event_type").alias("type_len1"),
    )


_B48_ORACLE = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
       CAST(MAX(l_linenumber) AS INT) AS max_line
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def _group_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # integer-exact math only (float sums would be order-sensitive)
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "l_linestatus": [pdf["l_linestatus"].iloc[0]],
            "n_rows": [len(pdf)],
            "total_qty": [int(pdf["l_quantity"].astype("int64").sum())],
            "max_line": [int(pdf["l_linenumber"].max())],
        }
    )


@register("b_udaf_grouped", oracle=_B48_ORACLE, tags=("udf", "udaf"))
def b_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDAF: whole group in, one aggregate row out.
    Shuffles once on the group key; each group materializes as one
    Arrow batch in the Python worker (groups must fit in worker RAM —
    true here: 6 groups, and at 100 TB you'd pre-aggregate first)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").applyInPandas(
        _group_stats,
        schema="l_returnflag string, l_linestatus string, n_rows long, total_qty long, max_line int",
    )


_B49_ORACLE = """
SELECT doc_id,
       CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INT) AS pos,
       unnest(string_split(text, ' ')) AS word
FROM documents WHERE doc_id < 10
"""


@register("b_udtf", oracle=_B49_ORACLE, tags=("udf", "udtf"))
def b_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): one input row → many output rows, used
    via LATERAL join in SQL (oracle: UNNEST WITH ORDINALITY).
    Arrow-optimized (batched transfer instead of per-row pickling —
    the plan shows ArrowEvalPythonUDTF, not BatchEvalPythonUDTF)."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="pos int, word string")
    class SplitWords:
        def eval(self, text: str):
            for i, w in enumerate(text.split(" "), start=1):
                yield i, w

    spark.udtf.register("split_words", SplitWords)
    register_views(spark, sf_dir, ("documents",))
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.word "
        "FROM (SELECT doc_id, text FROM documents WHERE doc_id < 10) d, "
        "LATERAL split_words(d.text) t"
    )


_B50_COGROUP_ORACLE = """
SELECT o_orderkey,
       COUNT(l_orderkey) AS n_lines,
       ANY_VALUE(o_totalprice) AS o_totalprice,
       CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS gross
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey % 50 = 0
GROUP BY o_orderkey
"""


def _reconcile(orders_pdf: pd.DataFrame, lines_pdf: pd.DataFrame) -> pd.DataFrame:
    # Exact money math via integer cents (see functions.exact): float
    # sums would be partition-order-sensitive and break the hash oracle.
    if orders_pdf.empty or lines_pdf.empty:
        return pd.DataFrame(
            columns=["o_orderkey", "n_lines", "o_totalprice", "gross"]
        ).astype(
            {"o_orderkey": "int64", "n_lines": "int64", "o_totalprice": "float64", "gross": "float64"}
        )
    cts = (lines_pdf["l_extendedprice"] * 100).round().astype("int64").sum()
    return pd.DataFrame(
        {
            "o_orderkey": [int(orders_pdf["o_orderkey"].iloc[0])],
            "n_lines": [len(lines_pdf)],
            "o_totalprice": [float(orders_pdf["o_totalprice"].iloc[0])],
            "gross": [cts / 100.0],
        }
    )


@register("b_udf_cogrouped", oracle=_B50_COGROUP_ORACLE, tags=("udf", "cogroup"))
def b_udf_cogrouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped-map pandas UDF: ``df1.groupBy(k).cogroup(df2.groupBy(k))
    .applyInPandas`` — BOTH relations shuffle on the shared key and each
    key's two group DataFrames arrive together in one Python call (the
    order-vs-lineitems reconciliation shape: custom per-entity logic
    over two aligned inputs that no single-table UDF form can express).
    One shuffle per side, same as the equivalent join; group pairs must
    fit in worker RAM (an order's lineitems: ≤7 rows). The key subset
    (orderkey % 50) bounds the per-group Python-call count — at 100 TB
    the call overhead amortizes per group, and entity-level logic like
    this is exactly what you'd window down to a keyed slice first."""
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 50 == 0)
        .select("l_orderkey", "l_extendedprice")
    )
    return o.groupBy("o_orderkey").cogroup(li.groupBy("l_orderkey")).applyInPandas(
        _reconcile,
        schema="o_orderkey long, n_lines long, o_totalprice double, gross double",
    )


_ARROW_ORACLE = """
SELECT l_returnflag,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS revenue,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem
WHERE l_orderkey % 101 = 0
GROUP BY l_returnflag
"""


@register("b_udf_arrow", oracle=_ARROW_ORACLE, tags=("udf", "arrow"))
def b_udf_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C114: the Arrow-native Python boundary — mapInArrow (per-batch
    pyarrow.compute, zero pandas conversion) feeding applyInArrow
    (per-group (key, pa.Table) -> pa.Table aggregation, Spark 4.0).
    Completes the Python-API ladder next to the row UDF (anti-pattern
    parity), pandas UDF, grouped/cogrouped pandas, and UDTF keys: for
    numeric batch work, Arrow-native skips the pandas materialization
    entirely — one fewer copy per batch than a pandas UDF, which is
    the fastest Python path Spark offers when the logic is expressible
    in pyarrow.compute kernels. Money stays exact: 2-decimal inputs
    scale to integer cents inside the batch (integer-valued floats, so
    the kernel's rounding mode cannot matter), and the per-group sums
    are int64 all the way. The oracle is the plain SQL aggregate."""
    import pyarrow as pa  # noqa: F401 — document the dependency at def site

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 101 == 0
    ).select("l_returnflag", "l_extendedprice", "l_quantity")

    def to_cents(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            cents = pc.cast(
                pc.round(pc.multiply(b.column("l_extendedprice"), pa.scalar(100.0))),
                pa.int64(),
            )
            qty = pc.cast(b.column("l_quantity"), pa.int64())
            yield pa.RecordBatch.from_arrays(
                [b.column("l_returnflag"), cents, qty],
                names=["l_returnflag", "cents", "qty"],
            )

    centsed = li.mapInArrow(
        to_cents, "l_returnflag string, cents long, qty long"
    )

    def agg_group(key, table):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "l_returnflag": pa.array([key[0]], pa.string()),
                "n_items": pa.array([table.num_rows], pa.int64()),
                "cents": pa.array([pc.sum(table.column("cents")).as_py() or 0], pa.int64()),
                "total_qty": pa.array([pc.sum(table.column("qty")).as_py() or 0], pa.int64()),
            }
        )

    grouped = centsed.groupBy("l_returnflag").applyInArrow(
        agg_group, "l_returnflag string, n_items long, cents long, total_qty long"
    )
    return grouped.select(
        "l_returnflag",
        "n_items",
        (F.col("cents") / 100.0).cast("double").alias("revenue"),
        "total_qty",
    )
