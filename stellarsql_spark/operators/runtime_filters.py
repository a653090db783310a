"""Runtime filter pruning (SURVEY.md §2 C77): Spark's
InjectRuntimeFilter builds a Bloom filter from the SELECTIVE side of a
shuffle join at execution time and pushes `might_contain` onto the
large side's scan — rows that cannot join are dropped BEFORE the
exchange, the dynamic twin of static partition pruning.

At 100 TB this is a first-order lever: a fact-table scan feeding a
join against a filtered dimension ships only the ~matching fraction
of its rows through the shuffle (the Bloom's false-positive rate,
~3%, is the only overshoot).  The result is provably unchanged —
the Bloom only ever drops rows the join would drop — which is exactly
what the hash oracle checks.

The injection rule reads session confs at plan-OPTIMIZATION time, so
the builder pins the thresholds, forces optimization of this one
DataFrame, then restores the session state — other keys' plans keep
their audited shapes (tests/test_plans.py asserts the
`might_contain` is present here and absent from a vanilla twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.functions.exact import cents, sql_csum
from stellarsql_spark.registry import register

_BLOOM_CONFS = {
    # let the rule consider any application-side scan (the corpus
    # fact tables are far below the 10 GiB production default)...
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # ...and keep the creation side permissive for the filtered dim
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # the rule only fires on non-broadcast joins (a broadcast build
    # already sees every key); pin the join to a shuffle for a
    # deterministic plan shape at every SF
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _with_confs(spark: SparkSession, confs: dict, df: DataFrame) -> DataFrame:
    """Force this DataFrame's plan to optimize under ``confs``, then
    restore the session (the optimized plan is cached on the
    DataFrame, so later actions reuse it)."""
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df._jdf.queryExecution().executedPlan()  # pin the plan now
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return df


def bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ (part WHERE p_size ≤ 5): the dim filter keeps ~1/10
    of part, so ~9/10 of lineitem's join keys can be Bloom-dropped at
    the scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") <= 5)
        .select("p_partkey", "p_brand")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(cents("l_quantity")) / 100.0).cast("double").alias("sum_qty"),
        )
    )


_BLOOM_ORACLE = f"""
SELECT p_brand,
       COUNT(*) AS n_items,
       {sql_csum("l_quantity")} AS sum_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_size <= 5
GROUP BY p_brand
"""


@register("b_join_bloom_prune", oracle=_BLOOM_ORACLE, tags=("join", "runtime-filter", "bloom"))
def b_join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C77: runtime Bloom-filter join pruning.  The returned plan
    carries `bloom_filter_might_contain` on the lineitem side
    (plan-asserted in tests/test_plans.py) and must hash-match the
    plain join — the filter is a pure pruning optimization."""
    return _with_confs(spark, _BLOOM_CONFS, bloom_join(spark, sf_dir))
