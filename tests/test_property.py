"""Property-based oracle parity (SURVEY.md §5.2.4): random small
frames through the same operator in Spark and DuckDB must agree —
catches semantics drift beyond the fixed corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", None]),
        st.integers(min_value=-1000, max_value=1000),
        st.booleans(),
    ),
    min_size=0,
    max_size=30,
)

_SQL = """
SELECT g, COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS sx,
       CAST(MIN(x) AS BIGINT) AS mn, CAST(MAX(x) AS BIGINT) AS mx
FROM t WHERE keep GROUP BY g
"""


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_groupby_agg_parity(spark, rows):
    pdf = pd.DataFrame(rows, columns=["g", "x", "keep"]).astype(
        {"x": "int64", "keep": "bool"}
    )
    pdf["g"] = pdf["g"].astype(object)
    sdf = spark.createDataFrame(pdf, schema="g string, x long, keep boolean")
    sdf.createOrReplaceTempView("t")
    spark_out = spark.sql(_SQL).toPandas()
    con = duckdb.connect()
    con.register("t", pdf)
    duck_out = con.execute(_SQL).df()
    key = ["g", "n", "sx", "mn", "mx"]
    norm = lambda df: sorted(
        (
            "\0null" if pd.isna(r["g"]) else r["g"],
            int(r["n"]),
            int(r["sx"]),
            int(r["mn"]),
            int(r["mx"]),
        )
        for _, r in df[key].iterrows()
    )
    assert norm(spark_out) == norm(duck_out)
