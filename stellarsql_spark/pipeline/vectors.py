"""Vector aggregation + IVF-style ANN (SURVEY.md §2 B52 scale path).

- ``b_llm_centroids``: per-class mean vector via posexplode → groupBy
  (label, position) — the distributed way to average vectors: the
  shuffle carries |labels|×dim partial sums, never the vectors
  themselves, so it is constant-size regardless of corpus size.
- ``b_llm_ann_ivf``: inverted-file ANN. The centroids act as a coarse
  quantizer (deterministic — no iterative k-means needed for the
  operator's plan shape); every corpus vector is assigned to its
  nearest centroid cell, and a query scans ONLY its own cell —
  O(N/cells) instead of O(N) per query. At 100 TB the corpus is
  stored partitioned by cell id so a probe is a partition-pruned scan.
  Recall is approximate → rows-only check (the exact baseline is
  ``b_llm_cosine_topk``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stellarsql_spark.catalog import load_table
from stellarsql_spark.pipeline.similarity import (
    COSINE_NEARDUP_THRESHOLD,
    N_QUERIES,
    TOP_K,
    dot,
    norm,
)
from stellarsql_spark.registry import register

_CENTROID_ORACLE = """
SELECT label, CAST(pos AS INT) AS pos,
       ROUND(AVG(v), 6) AS centroid_val
FROM (
  SELECT label,
         unnest(range(0, len(embedding))) AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
) exploded
GROUP BY label, pos
"""


@register("b_llm_centroids", oracle=_CENTROID_ORACLE, tags=("pipeline", "vectors", "agg"))
def b_llm_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding, exploded to (label, pos, value) rows.
    Rounded to 6 dp so float summation order cannot flip the hash."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("centroid_val"))
    )


def _centroid_vectors(e: DataFrame) -> DataFrame:
    """label → dense centroid array (ordered by position)."""
    exploded = (
        e.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("cv"))
    )
    return exploded.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
        ).alias("cvec")
    )


NPROBE = 3


@register("b_llm_ann_ivf", oracle=None, tags=("pipeline", "similarity", "approx"))
def b_llm_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: assign corpus vectors to their nearest centroid cell
    (broadcast the tiny centroid table, pick argmin via row_number),
    then each query probes its NPROBE nearest cells for cosine top-k —
    scanning NPROBE/cells of the corpus instead of all of it."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding", "label")
    # The coarse quantizer (k × dim) is persisted: r01's real double
    # pass was the two full-corpus centroid aggregations hiding under
    # both the assignment and the probe branch. At 100 TB the
    # quantizer is a precomputed stored artifact anyway — caching the
    # k-row table is the single-job equivalent.
    cents = _centroid_vectors(e).select(F.col("label").alias("cell"), "cvec").persist()

    cell_sim = F.round(
        dot(F.col("embedding"), F.col("cvec"))
        / (norm(F.col("embedding")) * norm(F.col("cvec"))),
        6,
    )
    pick = Window.partitionBy("vec_id").orderBy(F.col("cell_sim").desc(), "cell")
    # the full corpus is ranked against the broadcast quantizer
    # exactly once (assignment); the probe side ranks only the
    # N_QUERIES query vectors, so nothing corpus-sized runs twice.
    assigned = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cell", cell_sim.alias("cell_sim"))
        .withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cell")
    )
    # queries probe their NPROBE nearest cells (recall knob, like
    # faiss's nprobe)
    queries = (
        e.select("vec_id", "embedding")
        .where(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cell", cell_sim.alias("cell_sim"))
        .withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") <= NPROBE)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.col("cell").alias("qcell"),
        )
    )
    scored = (
        assigned.join(F.broadcast(queries), F.col("cell") == F.col("qcell"))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                dot(F.col("qe"), F.col("embedding"))
                / (norm(F.col("qe")) * norm(F.col("embedding"))),
                6,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= TOP_K)


@register("b_llm_embed_gemm", oracle=None, tags=("pipeline", "dedup", "embedding", "vectorized"))
def b_llm_embed_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs via bucketed matrix multiply: vectors
    are fanned out to their LSH (band, sig) buckets, and each bucket
    computes its members' pairwise similarities with ONE numpy GEMM
    inside applyInPandas. Fully distributed — no driver-side collect,
    no corpus broadcast, no all-pairs join: the only shuffles are the
    groupBy on (band, sig) and the final cross-band pair distinct.
    At 100 TB each bucket is a bounded block (bands add more, smaller
    buckets), so executor memory stays flat while the GEMM keeps the
    per-pair cost ~100× below per-pair expression evaluation.
    Same deterministic pair set as ``b_llm_embed_neardup``; GEMM float
    order differs from the sequential fold → rows-only check."""
    import numpy as np
    import pandas as pd

    from stellarsql_spark.pipeline.similarity import with_band_sigs

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    banded = with_band_sigs(e).select(
        "vec_id", "embedding", F.posexplode("band_sigs").alias("band", "sig")
    )

    def bucket_sims(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        m = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        m /= np.linalg.norm(m, axis=1, keepdims=True)
        sims = m @ m.T  # GEMM: |bucket| × |bucket|
        qi, ci = np.nonzero(sims >= COSINE_NEARDUP_THRESHOLD)
        keep = ids[qi] < ids[ci]
        return pd.DataFrame(
            {
                "id1": ids[qi][keep],
                "id2": ids[ci][keep],
                "sim": np.round(sims[qi, ci][keep], 6),
            }
        )

    return (
        banded.groupBy("band", "sig")
        .applyInPandas(bucket_sims, schema="id1 bigint, id2 bigint, sim double")
        .distinct()  # a pair colliding in k bands scores identically k times
    )


K_CLUSTERS = 8
KMEANS_ITERS = 3


@register("b_llm_kmeans", oracle=None, tags=("pipeline", "vectors", "iterative"))
def b_llm_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means on the embedding corpus, DataFrame-native:
    seeded init (vec_id < k), then per iteration (a) broadcast the k
    centroids, (b) assign each vector to its nearest centroid via
    crossJoin + argmin window — map-side only, (c) recompute centroids
    with the posexplode → groupBy(cluster, pos) mean (shuffle carries
    k×dim partial sums). Centroids are rounded per iteration so float
    summation order cannot perturb assignments between runs. Fixed
    iteration count & seed → deterministic; no SQL fixpoint → rows-only.
    Returns cluster sizes + within-cluster mean similarity."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = (
        e.where(F.col("vec_id") < K_CLUSTERS)
        .select(F.col("vec_id").alias("cluster"), F.col("embedding").alias("cvec"))
        .select("cluster", F.transform("cvec", lambda x: F.round(x.cast("double"), 6)).alias("cvec"))
    )
    for _ in range(KMEANS_ITERS):
        sim = F.round(
            dot(F.col("embedding"), F.col("cvec"))
            / (norm(F.col("embedding")) * norm(F.col("cvec"))),
            6,
        )
        pick = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), "cluster")
        assigned = (
            e.crossJoin(F.broadcast(cents))
            .select("vec_id", "embedding", "cluster", sim.alias("sim"))
            .withColumn("rn", F.row_number().over(pick))
            .where(F.col("rn") == 1)
            .select("vec_id", "embedding", "cluster", "sim")
        )
        cents = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("cv"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s.cv
                ).alias("cvec")
            )
        )
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("sim"), 4).alias("mean_sim_to_centroid"),
        )
        .orderBy("cluster")
    )
