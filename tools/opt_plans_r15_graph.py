"""Plan-evidence snapshots for the r15 graph promotions.

The graph keys are 'eager' (the loop runs at builder time), so a
single .explain of the returned frame shows only the final
re-aggregate over a checkpoint — not the per-round shape the
promotion changes.  These snapshots therefore capture the two
SUB-PLANS the r15 diff rewrites, before/after in one file each:

- lpa_argmax: the per-round argmax over a (node, lbl) vote frame —
  window form (count + row_number: Exchange + Sort + Window) vs the
  promoted packed form (two hash aggregates, zero sorts);
- prm_round_join: one PageRank round's contribution join against the
  persisted bidirectional edge list — unpartitioned persist (the
  round join exchanges the edge side every round) vs the promoted
  pre-partitioned persist (only the rank frame exchanges).  Captured
  at the 300× graph corpus (the measured tier): at sf0.01 the rank
  side broadcasts and the edge-side partitioning is moot.

    python tools/opt_plans_r15_graph.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"
OUT = "/root/repo/plans/r15"


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stellarsql_spark.operators.graph import _lpa_argmax, _minute_edges
    from stellarsql_spark.plans.explain import physical_plan
    from stellarsql_spark.session import get_spark

    spark = get_spark("opt_plans_r15_graph", cpus=8)
    os.makedirs(OUT, exist_ok=True)

    edges = _minute_edges(spark, SF)
    bidir = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    votes = bidir.select(F.col("u").alias("node"), F.col("v").alias("lbl"))

    # --- LPA argmax: window (before) vs packed aggregate (after) ---
    w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("lbl"))
    window_form = (
        votes.groupBy("node", "lbl")
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("node", "lbl")
    )
    with open(os.path.join(OUT, "lpa_argmax_before.txt"), "w") as f:
        f.write(physical_plan(window_form))
    with open(os.path.join(OUT, "lpa_argmax_after.txt"), "w") as f:
        f.write(physical_plan(_lpa_argmax(votes)))

    # --- prm round join: persist() vs repartition(u).persist() ---
    # at the 300× graph corpus so the rank side is past broadcast and
    # the edge-side partitioning decides the join's exchanges
    from stellarsql_spark.scale import ensure_graph_corpus
    from stellarsql_spark.session import tune_for_data_size

    d300 = ensure_graph_corpus(spark, "/root/testdata/sf0.1", 300)
    tune_for_data_size(spark, d300, cpus=8)
    edges300 = _minute_edges(spark, d300)
    bidir = edges300.select("u", "v").unionAll(
        edges300.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )

    def one_round(und):
        und = und.persist()
        dg = und.groupBy(F.col("u").alias("node")).agg(F.count("*").alias("deg"))
        ranks = dg.select("node", "deg", F.lit(1000000).cast("bigint").alias("pr"))
        contrib = (
            und.join(ranks.select(F.col("node").alias("u"), "deg", "pr"), "u")
            .select(F.col("v").alias("node"), F.expr("pr div deg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        # materialize the cache the way the loop does before planning
        und.count()
        plan = physical_plan(contrib)
        und.unpersist()
        return plan

    und = bidir
    with open(os.path.join(OUT, "prm_round_join_before.txt"), "w") as f:
        f.write(one_round(und))
    with open(os.path.join(OUT, "prm_round_join_after.txt"), "w") as f:
        f.write(one_round(und.repartition(F.col("u"))))

    for p in (
        "lpa_argmax_before", "lpa_argmax_after",
        "prm_round_join_before", "prm_round_join_after",
    ):
        print("wrote", os.path.join(OUT, p + ".txt"))
    spark.stop()


if __name__ == "__main__":
    main()
