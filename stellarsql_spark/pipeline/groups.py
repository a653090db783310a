"""Transitive duplicate grouping (SURVEY.md §4.3): connected
components over the near-dup pair graph, so "A≈B, B≈C" collapses into
one group {A,B,C} with a single kept representative.

Algorithm: iterative min-label propagation over the edge list
(small-star/large-star style). Each iteration is two shuffles
(join + groupBy-min) on the vertex id; convergence in O(log n)
iterations for real dup graphs (shallow components). This is the
standard DataFrame-native CC used when GraphFrames isn't available.
The output is deterministic (min doc_id per component), and the
fixpoint IS SQL-expressible: the hash oracle recomputes the
components as a recursive-CTE transitive closure over the same
Jaccard pair set, so label propagation is pinned value-exact to an
independent algorithm, not just row-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.pipeline.dedup import JACCARD_THRESHOLD
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


# Connected components as a recursive transitive closure: reach(a, b)
# holds every (node, reachable node) pair over the symmetrized Jaccard
# edge list (UNION dedups, so the recursion terminates); a component's
# label is the minimum reachable id — the same labeling min-propagation
# converges to. Closure size is sum(|component|^2): fine for near-dup
# graphs, whose components are tiny (the oracle runs at sf<=0.01).
_DUP_GROUPS_ORACLE = f"""
WITH RECURSIVE
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
shin AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, len(w) - 1),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS sh
  FROM words
  WHERE len(w) >= 3
),
counts AS (SELECT doc_id, COUNT(*) AS n FROM shin GROUP BY doc_id),
cand AS (
  SELECT a.doc_id AS doc1, b.doc_id AS doc2, COUNT(*) AS n_common
  FROM shin a JOIN shin b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jpairs AS (
  SELECT doc1, doc2
  FROM cand
  JOIN counts ca ON doc1 = ca.doc_id
  JOIN counts cb ON doc2 = cb.doc_id
  WHERE CAST(n_common AS DOUBLE) / (ca.n + cb.n - n_common)
        >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT doc1 AS src, doc2 AS dst FROM jpairs
  UNION
  SELECT doc2, doc1 FROM jpairs
),
reach(a, b) AS (
  SELECT src, src FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
),
comp AS (SELECT a AS node, MIN(b) AS comp FROM reach GROUP BY a)
SELECT comp AS representative,
       COUNT(*) AS group_size,
       STRING_AGG(CAST(node AS VARCHAR), ',' ORDER BY node) AS members
FROM comp
GROUP BY comp
"""


@register("b_llm_dup_groups", oracle=_DUP_GROUPS_ORACLE, tags=("pipeline", "dedup", "graph"))
def b_llm_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate groups: Jaccard pairs → connected components → one
    row per group (representative=min doc_id, members sorted). The
    hash oracle recomputes the grouping via an independent algorithm
    (recursive-CTE transitive closure over the same pair set)."""
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


# --- Duplicate-cluster canonicalization (C245) ------------------------------------------

# The step AFTER grouping: pick ONE canonical document per duplicate
# cluster and account for what was dropped.  Policy here is
# longest-content-wins (n_chars DESC, doc_id ASC tie-break) — the
# usual crawl heuristic (the longest copy is most often the complete
# one); the deterministic tie-break is what makes the choice a hash
# contract.  Composes connected_components over the same Jaccard pair
# graph as b_llm_dup_groups; the oracle extends that key's
# recursive-closure oracle with the argmax selection.
_CANONICALIZE_ORACLE = (
    _DUP_GROUPS_ORACLE[: _DUP_GROUPS_ORACLE.index("SELECT comp AS representative")]
    + """, sel AS (
  SELECT c.comp, c.node, d.n_chars,
         ROW_NUMBER() OVER (PARTITION BY c.comp
                            ORDER BY d.n_chars DESC, c.node) AS rn
  FROM comp c JOIN documents d ON c.node = d.doc_id
)
SELECT comp AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS cluster_size,
       CAST(MIN(CASE WHEN rn = 1 THEN node END) AS BIGINT) AS canonical_doc,
       CAST(MIN(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS canonical_chars,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_dropped,
       CAST(SUM(CASE WHEN rn > 1 THEN n_chars ELSE 0 END) AS BIGINT) AS chars_dropped
FROM sel GROUP BY comp ORDER BY comp
"""
)


@register("b_llm_canonicalize", oracle=_CANONICALIZE_ORACLE, tags=("pipeline", "dedup", "canonical"))
def b_llm_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C245: duplicate-cluster canonicalization — for every transitive
    near-dup cluster (the C-dup-groups components), keep the
    longest-content member (n_chars DESC, doc_id ASC — deterministic)
    and account for the dropped volume.  This is the step a curation
    funnel actually executes after grouping; the kept/dropped char
    accounting is what the funnel report needs.

    Scale shape: the component labeling is the O(log n)
    min-propagation (two slim node-keyed shuffles per round); the
    selection is one window over |cluster members| rows joined to a
    slim (doc_id, n_chars) projection."""
    from pyspark.sql import Window

    from stellarsql_spark.catalog import load_table
    from stellarsql_spark.pipeline.dedup import b_llm_jaccard

    pairs = b_llm_jaccard(spark, sf_dir).select(
        F.col("doc1").alias("src"), F.col("doc2").alias("dst")
    )
    comps = connected_components(pairs)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    sel = comps.join(d, comps.node == d.doc_id).select(
        "comp",
        "node",
        "n_chars",
        F.row_number()
        .over(Window.partitionBy("comp").orderBy(F.desc("n_chars"), F.asc("node")))
        .alias("rn"),
    )
    return (
        sel.groupBy(F.col("comp").alias("cluster_id"))
        .agg(
            F.count("*").cast("bigint").alias("cluster_size"),
            F.min(F.when(F.col("rn") == 1, F.col("node")))
            .cast("bigint")
            .alias("canonical_doc"),
            F.min(F.when(F.col("rn") == 1, F.col("n_chars")))
            .cast("bigint")
            .alias("canonical_chars"),
            (F.count("*") - 1).cast("bigint").alias("n_dropped"),
            F.sum(F.when(F.col("rn") > 1, F.col("n_chars")).otherwise(0))
            .cast("bigint")
            .alias("chars_dropped"),
        )
    )
