"""Skew-resilient join (SURVEY.md §4.2 "skew handling"): explicit key
salting, the manual fallback when AQE's skew-join split isn't enough
(e.g. one hot key inside a single shuffle block, or a streaming join
where AQE doesn't apply).

Construction: the probe side appends a deterministic salt in
[0, NSALT) derived from a non-key column; the build side is exploded
NSALT× so every (key, salt) pair still finds its match. The join key
becomes (key, salt), spreading one hot key over NSALT shuffle
partitions. Replication multiplies the build side NSALT× — use it on
the small side only. Results are identical to the unsalted join, so
the oracle is the plain SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.functions.exact import sql_dsum
from stellarsql_spark.registry import register

NSALT = 8

_SALTED_ORACLE = f"""
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       {sql_dsum('l_extendedprice')} AS gross
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
"""


@register("b_join_salted", oracle=_SALTED_ORACLE, tags=("join", "skew", "salt"))
def b_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem with an 8-way salted key. The salt is
    pmod(hash(l_linenumber), 8) — deterministic, uniform, and
    independent of the join key, so each original pair appears exactly
    once in exactly one salt lane."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    salts = F.array(*[F.lit(i) for i in range(NSALT)])
    o_rep = o.withColumn("salt", F.explode(salts))
    li_s = li.withColumn("salt", F.pmod(F.hash("l_linenumber"), F.lit(NSALT)))
    return (
        li_s.join(
            o_rep,
            (li_s.l_orderkey == o_rep.o_orderkey) & (li_s.salt == o_rep.salt),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("gross"),
        )
    )
