"""Transitive duplicate grouping (SURVEY.md §4.3): connected
components over the near-dup pair graph, so "A≈B, B≈C" collapses into
one group {A,B,C} with a single kept representative.

Algorithm: iterative min-label propagation over the edge list
(small-star/large-star style). Each iteration is two shuffles
(join + groupBy-min) on the vertex id; convergence in O(log n)
iterations for real dup graphs (shallow components). This is the
standard DataFrame-native CC used when GraphFrames isn't available,
and the output is deterministic (min doc_id per component) even
though no SQL oracle can express the fixpoint → rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register


def connected_components(edges: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation: edges(src,dst) → (node, component).

    Components are labeled by their minimum member id. Iterates until
    no label changes (checked via count of improved labels).
    """
    # Materialize the edge list ONCE: every iteration joins against it,
    # and without this the full upstream pipeline (e.g. the Jaccard
    # candidate join) would re-execute per iteration.
    edges = edges.select("src", "dst").localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    labels = nodes.withColumn("comp", F.col("node"))
    sym = (
        edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # best neighbor label per node
        neighbor_min = (
            sym.join(labels, sym.dst == labels.node)
            .groupBy("src")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut the lineage per iteration
        if changed == 0:
            break
    return labels


@register("b_llm_dup_groups", oracle=None, tags=("pipeline", "dedup", "graph"))
def b_llm_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups: Jaccard pairs → connected components → one
    row per group (representative=min doc_id, members sorted). Output
    is deterministic; the iterative fixpoint is not SQL-expressible →
    rows-only check."""
    from stellarsql_spark.pipeline.dedup import b_llm_jaccard

    pairs = b_llm_jaccard(spark, sf_dir).select(
        F.col("doc1").alias("src"), F.col("doc2").alias("dst")
    )
    comps = connected_components(pairs)
    return (
        comps.groupBy("comp")
        .agg(
            F.count("*").alias("group_size"),
            F.array_join(F.array_sort(F.collect_list("node")), ",").alias("members"),
        )
        .select(F.col("comp").alias("representative"), "group_size", "members")
    )
