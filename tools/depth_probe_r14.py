"""Round-14 one-off depth probes (r13 VERDICT #1/#2/#4).

Measures, with the standard per-query engine-paired protocol
(bench._interleaved_times' discipline: warm both engines, alternate
spark/duck back-to-back, min-of-N, pre/post plan floors as the
contention witness):

  --tier dedupb1000  b_llm_dedup_incremental (the 2.10x plain read
                     being closed) + b_llm_dedup_incremental_bucketed
                     (the layout twin) at the 1000x documents tier
                     (5M docs), min-of-5; the bucketed standing-set
                     build timed one-off (it is the at-rest ingest
                     step a deployment amortizes), plus a staged
                     decomposition of the PLAIN key's cost (hash+
                     distinct of the standing corpus vs the batch
                     pre-agg vs the anti join) so the 2.10x has named
                     parts.
  --tier graph300    b_graph_pagerank_minute (min-of-7) on the 300x
                     TIME-SHIFTED graph corpus — the tier's second
                     permanent row candidate — plus a per-stage
                     decomposition of b_graph_label_prop_converged's
                     cost at the same depth (edges build vs per-round
                     join+argmax+checkpoint vs convergence counts).
  --tier graphhour   b_graph_pagerank (the HOURLY quasi-clique graph,
                     ~789k edges/sf0.1 at 70% density) at a 30x graph
                     corpus (~23.7M edges), min-of-5 — the named key's
                     own depth point; 300x (~237M edges) prices out of
                     a permanent per-round block, documented in
                     SCALE.md.
  --tier mm300       b_mm_image_ahash (real BMP encode->decode->hash
                     round trip) + b_mm_format_sniffer (mixed-container
                     encode + JVM-native classify) on the 300x
                     documents replica (1.5M docs), min-of-5 — the
                     multimodal family's first depth row.

One tier per process (memory note: one query family per process at
depth; probe JVMs <= 56g on this 125 GB box).  Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from depth_probe_r13 import best_of_paired, duck_con, plan_floors  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", required=True,
                    choices=("dedupb1000", "graph300", "graphhour", "mm300"))
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stellarsql_spark.catalog import load_table
    from stellarsql_spark.registry import all_specs
    from stellarsql_spark.scale import ensure_graph_corpus, ensure_scaled_corpus
    from stellarsql_spark.session import get_spark, tune_for_data_size

    spark = get_spark(f"depth_r14_{args.tier}", cpus=32)
    specs = all_specs()
    out: dict = {"tier": args.tier}

    fresh_builder_keys: set[str] = set()
    if args.tier == "dedupb1000":
        d = ensure_scaled_corpus(
            spark, args.sf, 1000,
            tables=("lineitem", "orders", "customer", "events",
                    "embeddings", "documents"),
        )
        keys_runs = [("b_llm_dedup_incremental", 5),
                     ("b_llm_dedup_incremental_bucketed", 5)]
        warm_tables = ("documents",)
    elif args.tier == "graph300":
        d = ensure_graph_corpus(spark, args.sf, 300)
        keys_runs = [("b_graph_pagerank_minute", 7)]
        warm_tables = ("events",)
    elif args.tier == "graphhour":
        d = ensure_graph_corpus(spark, args.sf, 30)
        keys_runs = [("b_graph_pagerank", 5)]
        warm_tables = ("events",)
        # the hourly key memoizes + persists its edge list per
        # (session, corpus) — clear it per trial so the timed Spark
        # unit includes the edge self-join, exactly the work DuckDB's
        # one statement re-does per trial
        fresh_builder_keys = {"b_graph_pagerank"}
    else:
        d = ensure_scaled_corpus(spark, args.sf, 300)
        keys_runs = [("b_mm_image_ahash", 5), ("b_mm_format_sniffer", 5)]
        warm_tables = ("documents",)

    tune_for_data_size(spark, d, cpus=32)
    for t in warm_tables:
        out[f"{t}_rows"] = load_table(spark, d, t).count()
    out["floors_pre"] = plan_floors(spark)
    con = duck_con(d)

    if args.tier == "dedupb1000":
        import shutil
        from urllib.parse import urlparse

        from stellarsql_spark.pipeline.dedup import (
            ensure_standing_hashset_bucketed,
        )

        tag = "".join(ch if ch.isalnum() else "_" for ch in d.rstrip("/")).strip("_")
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        name = f"dedup_hashset_bk_{tag}"
        if spark.catalog.tableExists(name):
            spark.sql(f"DROP TABLE {name}")
        shutil.rmtree(os.path.join(warehouse, name), ignore_errors=True)
        t0 = time.perf_counter()
        ensure_standing_hashset_bucketed(spark, d)
        out["hashset_build_sec"] = round(time.perf_counter() - t0, 1)
        out["standing_hashes"] = spark.table(name).count()

        # Staged decomposition of the PLAIN key (the 2.10x read):
        # hash+DISTINCT the standing corpus / batch keep-min pre-agg /
        # full key (the anti join adds only the probe on top of both).
        docs = load_table(spark, d, "documents")
        hashed = docs.withColumn(
            "text_hash", F.md5(F.lower(F.trim(F.col("text"))))
        )

        def stage_standing():
            return (
                hashed.where(F.col("doc_id") % 3 != 0)
                .select("text_hash").distinct().count()
            )

        def stage_batch():
            return (
                hashed.where(F.col("doc_id") % 3 == 0)
                .groupBy("text_hash")
                .agg(F.min("doc_id").alias("doc_id"),
                     F.count("*").alias("n_in_batch"))
                .count()
            )

        stages = {}
        for nm, fn in (("standing_hash_distinct", stage_standing),
                       ("batch_preagg", stage_batch)):
            fn()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            stages[nm] = round(best, 3)
        out["plain_stage_decomposition"] = stages

    if args.tier == "graph300":
        # Per-stage decomposition of the LPA depth row (r13 VERDICT
        # #2): where do the ~20 s go — the edges build (distinct +
        # bucket self-join + distinct), the per-round vote join +
        # argmax window + localCheckpoint, or the convergence counts?
        from pyspark.sql import Window

        from stellarsql_spark.operators.graph import LP_CONV_CAP, _minute_edges

        stages: dict[str, float] = {}
        t0 = time.perf_counter()
        edges = _minute_edges(spark, d)
        bidir = edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).persist()
        out["bidir_rows"] = bidir.count()
        stages["edges_build_persist"] = round(time.perf_counter() - t0, 3)
        w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("lbl"))
        votes = bidir.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
        labels = None
        for rnd in range(LP_CONV_CAP):
            t0 = time.perf_counter()
            mode = (
                votes.groupBy("node", "lbl")
                .agg(F.count("*").alias("n"))
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "lbl")
                .localCheckpoint()
            )
            stages[f"round{rnd + 1}_argmax_checkpoint"] = round(
                time.perf_counter() - t0, 3
            )
            if labels is not None:
                t0 = time.perf_counter()
                changed = (
                    mode.join(labels.withColumnRenamed("lbl", "old"), "node")
                    .where(F.col("lbl") != F.col("old"))
                    .count()
                )
                stages[f"round{rnd + 1}_convergence_count"] = round(
                    time.perf_counter() - t0, 3
                )
                if changed == 0:
                    break
            labels = mode
            t0 = time.perf_counter()
            votes = bidir.join(
                mode.select(F.col("node").alias("v"), "lbl"), "v"
            ).select(F.col("u").alias("node"), "lbl")
            stages[f"round{rnd + 1}_vote_join_plan"] = round(
                time.perf_counter() - t0, 3
            )
        bidir.unpersist()
        out["lpa_stage_decomposition"] = stages
        print(f"## lpa_stage_decomposition: {stages}", flush=True)

    results = {}
    for key, runs in keys_runs:
        spec = specs[key]
        df_holder: dict = {}
        eager = "eager" in spec.tags

        def spark_fn(spec=spec, df_holder=df_holder, eager=eager, key=key):
            if key in fresh_builder_keys:
                from stellarsql_spark.operators.graph import _EDGE_CACHE

                for cached in _EDGE_CACHE.values():
                    cached.unpersist()
                _EDGE_CACHE.clear()
                return spec.builder(spark, d).count()
            if eager:
                return spec.builder(spark, d).count()
            if "df" not in df_holder:
                df_holder["df"] = spec.builder(spark, d)
            return df_holder["df"].count()

        dsql = spec.oracle
        if args.tier in ("graph300", "graphhour"):
            # Timing-only rewrite (the r13 annr precedent): pin the
            # graph CTE chain to AS MATERIALIZED.  Without it DuckDB
            # re-expands the shared edges/und CTEs once per unrolled
            # PageRank round into a bushy self-join tree that spilled
            # past 50 GB at 300× (6.9M edges!); materialized, each CTE
            # computes once.  Same rows, same hash — the registered
            # oracle stays byte-stable.
            for cte in ("b AS (", "edges AS (", "und AS (", "dg AS (",
                        "bidir AS (", "r0 AS (", "r1 AS (", "r2 AS (",
                        "r3 AS ("):
                dsql = dsql.replace(cte, cte.replace("AS (", "AS MATERIALIZED ("))

        def duck_fn(dsql=dsql):
            return con.execute(dsql).fetchall()

        s, dk, spread = best_of_paired(spark_fn, duck_fn, runs)
        results[key] = {
            "spark_sec": round(s, 3),
            "duck_sec": round(dk, 3),
            "ratio": round(s / dk, 2) if dk > 0 else None,
            "spread": round(spread, 3),
            "runs": runs,
        }
        print(f"## {key}: {results[key]}", flush=True)

    out["queries"] = results
    out["floors_post"] = plan_floors(spark)
    out["load_1min"] = round(os.getloadavg()[0], 1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
