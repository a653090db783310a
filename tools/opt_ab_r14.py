"""Round-14 OPTIMIZATION A/B probes.

Measures candidate plan rewrites against the registered form under
the standard engine-paired protocol (depth_probe_r13.best_of_paired:
warm both, alternate spark/duck, min-of-N, pre/post floors as the
contention witness).  Variants live HERE, unregistered, so a losing
candidate never touches the registry; a winner is promoted into the
operator module and re-certified by tools/check_oracle.py before it
ships.

    python tools/opt_ab_r14.py --tier topk1000
    python tools/opt_ab_r14.py --tier q3base
    python tools/opt_ab_r14.py --tier graph300

One tier per process (56g-heap rule).  Emits one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from depth_probe_r13 import best_of_paired, duck_con, plan_floors  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from stellarsql_spark.catalog import load_table
    from stellarsql_spark.registry import all_specs
    from stellarsql_spark.scale import ensure_graph_corpus, ensure_scaled_corpus
    from stellarsql_spark.session import get_spark, tune_for_data_size

    spark = get_spark(f"opt_ab_{args.tier}", cpus=32)
    specs = all_specs()
    out: dict = {"tier": args.tier}

    # ------------------------------------------------------------------
    # Variant builders (candidates under test).  Each returns a
    # DataFrame whose RESULT SET must equal the registered key's —
    # asserted here on the probe corpus before any timing.
    # ------------------------------------------------------------------

    def topk_packed(spark, sf_dir):
        """b_topk_per_group with the struct(p, nk) list element packed
        into ONE long: cents(price) << 34 | (2^34-1 - orderkey).
        Sorting packed DESC == (price DESC, orderkey ASC) because
        cents is exact on this corpus and orderkey < 2^34 at every
        tier (max 1e10 at 1000x; bound asserted by the caller)."""
        from stellarsql_spark.functions.exact import cents

        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        kmask = (1 << 34) - 1
        packed = F.shiftleft(cents("o_totalprice"), 34) + (F.lit(kmask) - F.col("o_orderkey"))
        top3 = F.slice(F.sort_array(F.collect_list("pk"), asc=False), 1, 3)
        aggd = (
            o.select("o_custkey", packed.alias("pk"))
            .groupBy("o_custkey")
            .agg(top3.alias("top"))
            .select("o_custkey", F.posexplode("top").alias("pos", "pk"))
            .select(
                "o_custkey",
                (F.lit(kmask) - F.col("pk").bitwiseAND(F.lit(kmask))).alias("o_orderkey"),
                (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
                (F.col("pos") + 1).alias("rn"),
            )
        )
        return aggd.join(c.select("c_custkey"), aggd.o_custkey == F.col("c_custkey")).select(
            "c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
        )

    def topk_packed_repart(spark, sf_dir):
        """Packed + repartition-on-key FIRST (the b_join_inner trick:
        skip the pre-exchange ObjectHashAggregate partial that cannot
        reduce scattered keys, fuse partial+final post-exchange)."""
        from stellarsql_spark.functions.exact import cents

        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        kmask = (1 << 34) - 1
        packed = F.shiftleft(cents("o_totalprice"), 34) + (F.lit(kmask) - F.col("o_orderkey"))
        top3 = F.slice(F.sort_array(F.collect_list("pk"), asc=False), 1, 3)
        aggd = (
            o.select("o_custkey", packed.alias("pk"))
            .repartition(F.col("o_custkey"))
            .groupBy("o_custkey")
            .agg(top3.alias("top"))
            .select("o_custkey", F.posexplode("top").alias("pos", "pk"))
            .select(
                "o_custkey",
                (F.lit(kmask) - F.col("pk").bitwiseAND(F.lit(kmask))).alias("o_orderkey"),
                (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
                (F.col("pos") + 1).alias("rn"),
            )
        )
        return aggd.join(c.select("c_custkey"), aggd.o_custkey == F.col("c_custkey")).select(
            "c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
        )

    def topk_repart_only(spark, sf_dir):
        """Struct list element unchanged; ONLY the repartition-on-key
        move (attribution twin for packed_repart)."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        top3 = F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("o_totalprice").alias("p"), (-F.col("o_orderkey")).alias("nk")
                    )
                ),
                asc=False,
            ),
            1,
            3,
        )
        aggd = (
            o.select("o_custkey", "o_orderkey", "o_totalprice")
            .repartition(F.col("o_custkey"))
            .groupBy("o_custkey")
            .agg(top3.alias("top"))
            .select("o_custkey", F.posexplode("top").alias("pos", "t"))
            .select(
                "o_custkey",
                (-F.col("t.nk")).alias("o_orderkey"),
                F.col("t.p").alias("o_totalprice"),
                (F.col("pos") + 1).alias("rn"),
            )
        )
        return aggd.join(c.select("c_custkey"), aggd.o_custkey == F.col("c_custkey")).select(
            "c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
        )

    def q3_eager(spark, sf_dir):
        """b_tpch_q3 with the lineitem revenue EAGERLY aggregated by
        l_orderkey BEFORE the join (guide: aggregate before you
        shuffle): the orderkey exchange then carries one row per
        order, the post-join group-by disappears (l_orderkey is
        unique after the pre-agg), and the join output feeds
        TakeOrderedAndProject directly."""
        from stellarsql_spark.functions.exact import cents

        c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
        o = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < "1998-03-15")
        li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > "1998-03-15")
        ep, dc = cents("l_extendedprice"), cents("l_discount")
        rev = (
            li.groupBy("l_orderkey")
            .agg((F.sum(ep * (100 - dc)) / 10000.0).cast("double").alias("revenue"))
        )
        return (
            c.join(o, c.c_custkey == o.o_custkey)
            .join(rev, o.o_orderkey == rev.l_orderkey)
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
            .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
            .limit(10)
        )

    def lpa_opt(spark, sf_dir, edges_shared=True, packed_argmax=True,
                prepart_bidir=True):
        """b_graph_label_prop_converged with up to three physical
        rewrites (results identical by construction):

        - edges_shared: ONE repartition(event_type, m) serves the
          membership distinct AND the bucket self-join (partitioning
          on a subset of the grouping keys satisfies the distinct's
          clustering requirement; the self-join reuses the exchange),
          instead of distinct-exchange + per-side join exchanges.
        - prepart_bidir: the persisted bidirectional edge list is
          hash-partitioned on the join key (v) ONCE, so each LPA
          round's label join shuffles only the |V|-sized label frame,
          not the edge list.
        - packed_argmax: the per-node argmax window (exchange + full
          sort per round) becomes max(packed) where packed =
          n << 34 | (2^34-1 - lbl): two hash aggregates, zero sorts.
          Valid while lbl < 2^34 (user_id = base + replica*STRIDE
          <= ~1e10 < 2^34 at every tier) and n < 2^29 (n <= |V|).
        """
        from stellarsql_spark.operators.graph import LP_CONV_CAP

        ev = load_table(spark, sf_dir, "events")
        b = ev.select(
            "user_id", "event_type", F.date_trunc("minute", "ts").alias("m")
        )
        if edges_shared:
            b = b.repartition("event_type", "m").dropDuplicates()
        else:
            b = b.distinct()
        edges = (
            b.alias("l")
            .join(b.alias("r"), ["event_type", "m"])
            .where(F.col("l.user_id") < F.col("r.user_id"))
            .select(F.col("l.user_id").alias("u"), F.col("r.user_id").alias("v"))
            .distinct()
        )
        bidir = edges.select("u", "v").unionAll(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        if prepart_bidir:
            bidir = bidir.repartition(F.col("v"))
        bidir = bidir.persist()
        kmask = (1 << 34) - 1

        def argmax(votes):
            if packed_argmax:
                return (
                    votes.groupBy("node", "lbl")
                    .agg(F.count("*").alias("n"))
                    .select(
                        "node",
                        (F.shiftleft("n", 34) + (F.lit(kmask) - F.col("lbl"))).alias("pk"),
                    )
                    .groupBy("node")
                    .agg(F.max("pk").alias("pk"))
                    .select(
                        "node", (F.lit(kmask) - F.col("pk").bitwiseAND(F.lit(kmask))).alias("lbl")
                    )
                )
            from pyspark.sql import Window

            w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("lbl"))
            return (
                votes.groupBy("node", "lbl")
                .agg(F.count("*").alias("n"))
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "lbl")
            )

        votes = bidir.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
        labels = None
        try:
            for it in range(LP_CONV_CAP):
                if packed_argmax and it == 0:
                    # round 1's votes are the DISTINCT bidirectional
                    # pairs themselves (one vote per (node, lbl)), so
                    # every count is 1 and the argmax is min(lbl)
                    mode = (
                        votes.groupBy("node").agg(F.min("lbl").alias("lbl"))
                        .localCheckpoint()
                    )
                else:
                    mode = argmax(votes).localCheckpoint()
                if labels is not None:
                    changed = (
                        mode.join(labels.withColumnRenamed("lbl", "old"), "node")
                        .where(F.col("lbl") != F.col("old"))
                        .count()
                    )
                    if changed == 0:
                        labels = mode
                        break
                labels = mode
                votes = bidir.join(
                    mode.select(F.col("node").alias("v"), "lbl"), "v"
                ).select(F.col("u").alias("node"), "lbl")
        finally:
            bidir.unpersist()
        return labels.groupBy(F.col("lbl").alias("community")).agg(
            F.count("*").alias("n_members")
        )

    def prm_opt(spark, sf_dir):
        """b_graph_pagerank_minute with the bidirectional list
        pre-partitioned on the per-round join key (u); edge build
        unchanged (the shared-exchange build measured NEGATIVE — it
        concentrates the hot (type, minute) buckets)."""
        from stellarsql_spark.operators.graph import (
            PR_MINUTE_ROUNDS,
            _minute_edges,
        )

        edges = _minute_edges(spark, sf_dir)
        und = (
            edges.select("u", "v")
            .unionAll(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .repartition(F.col("u"))
            .persist()
        )
        try:
            dg = (
                und.groupBy(F.col("u").alias("node"))
                .agg(F.count("*").alias("deg"))
                .localCheckpoint()
            )
            ranks = dg.select("node", "deg", F.lit(1000000).cast("bigint").alias("pr"))
            for _ in range(PR_MINUTE_ROUNDS):
                contrib = (
                    und.join(ranks.select(F.col("node").alias("u"), "deg", "pr"), "u")
                    .select(F.col("v").alias("node"), F.expr("pr div deg").alias("c"))
                    .groupBy("node")
                    .agg(F.sum("c").alias("s"))
                )
                ranks = dg.join(contrib, "node", "left").select(
                    "node",
                    "deg",
                    (F.lit(150000) + F.expr("(85 * coalesce(s, 0)) div 100"))
                    .cast("bigint")
                    .alias("pr"),
                ).localCheckpoint()
        finally:
            und.unpersist()
        return (
            ranks.orderBy(F.col("pr").desc(), "node")
            .limit(20)
            .select(F.col("node").alias("user_id"), "deg", F.col("pr").alias("rank_micro"))
        )

    def skew_split_cents(spark, sf_dir):
        """b_join_skew_split with the money sum riding as integer
        cents (long adds) instead of DECIMAL(28,2) buffer adds —
        b_join_inner's measured ~15% hot-path choice applied to the
        skew family.  sum(cents)/100.0 == cast(sum(dec2) as double)
        bit-exactly while the cent total stays under 2^53 (~9e15
        cents; the 300x zipfian tier peaks ~7e14)."""
        from stellarsql_spark.functions.exact import cents
        from stellarsql_spark.operators.skew import _SPLIT_CONFS
        from stellarsql_spark.catalog import _read_table

        s2 = spark.newSession()
        for k, v in _SPLIT_CONFS.items():
            s2.conf.set(k, v)
        s2.conf.set("spark.sql.session.timeZone", "UTC")
        s2.conf.set(
            "spark.sql.shuffle.partitions",
            spark.conf.get("spark.sql.shuffle.partitions", "32"),
        )
        o = _read_table(s2, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
        li = _read_table(s2, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
        return (
            li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                (F.sum(cents("l_extendedprice")) / 100.0).cast("double").alias("gross"),
            )
        )

    # ------------------------------------------------------------------

    def check_equal(name, base_df, var_df):
        """Result-set equality gate before any timing (order-insensitive,
        same discipline as tools/check_oracle.compare on two Spark
        frames: exceptAll both ways + count match)."""
        n_b, n_v = base_df.count(), var_df.count()
        d1 = base_df.exceptAll(var_df).count()
        d2 = var_df.exceptAll(base_df).count()
        ok = (n_b == n_v) and d1 == 0 and d2 == 0
        out[f"{name}_equal"] = {"base": n_b, "variant": n_v, "missing": d1, "extra": d2, "ok": ok}
        return ok

    def timed_pair(tag, builder, d, con, dsql, runs):
        df = builder(spark, d)
        sfn = lambda: df.count()  # noqa: E731
        dfn = (lambda: con.execute(dsql).fetchall()) if dsql else None
        s, dk, spread = best_of_paired(sfn, dfn, runs)
        out[tag] = {
            "spark": round(s, 3),
            "duck": (round(dk, 3) if dfn else None),
            "spread": round(spread, 3),
            "ratio": (round(s / dk, 2) if dfn and dk > 0 else None),
        }

    if args.tier in ("topk1000", "topk300", "topkbase"):
        factor = {"topk1000": 1000, "topk300": 300, "topkbase": 1}[args.tier]
        if factor > 1:
            tables = (
                ("lineitem", "orders", "customer", "events", "embeddings", "documents")
                if factor == 1000
                else None
            )
            d = ensure_scaled_corpus(spark, args.sf, factor, tables=tables)
        else:
            d = args.sf
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)
        spec = specs["b_topk_per_group"]
        dsql = f"SELECT COUNT(*) AS n FROM ({spec.oracle})"
        base_df = spec.builder(spark, d)
        # correctness gate on the probe corpus (cheap at base, real at depth)
        ok1 = check_equal("packed", base_df, topk_packed(spark, d))
        ok2 = check_equal("packed_repart", base_df, topk_packed_repart(spark, d))
        ok3 = check_equal("repart_only", base_df, topk_repart_only(spark, d))
        timed_pair("base", spec.builder, d, con, dsql, args.runs)
        if ok1:
            timed_pair("packed", topk_packed, d, con, None, args.runs)
        if ok2:
            timed_pair("packed_repart", topk_packed_repart, d, con, None, args.runs)
        if ok3:
            timed_pair("repart_only", topk_repart_only, d, con, None, args.runs)
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("graph300", "graphbase"):
        d = (
            ensure_graph_corpus(spark, args.sf, 300)
            if args.tier == "graph300"
            else args.sf
        )
        tune_for_data_size(spark, d, cpus=32)
        load_table(spark, d, "events").count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)

        def timed_eager(tag, builder, dsql, runs):
            # eager loop keys: the timed unit is builder + count (the
            # loop runs at builder time — bench.py prepare() contract)
            sfn = lambda: builder(spark, d).count()  # noqa: E731
            dfn = (lambda: con.execute(dsql).fetchall()) if dsql else None
            s, dk, spread = best_of_paired(sfn, dfn, runs)
            out[tag] = {
                "spark": round(s, 3),
                "duck": (round(dk, 3) if dfn else None),
                "spread": round(spread, 3),
                "ratio": (round(s / dk, 2) if dfn and dk > 0 else None),
            }

        lpa_spec = specs["b_graph_label_prop_converged"]
        prm_spec = specs["b_graph_pagerank_minute"]

        def paired_ab(tag, fn_a, fn_b, runs):
            """Trial-level interleaving of base vs variant — the host
            drifts on multi-minute waves, so block ordering (all base
            trials then all variant trials) aliases the wave into the
            comparison; back-to-back pairs cancel it the same way the
            bench pairs spark/duck."""
            fn_a()
            fn_b()
            a_best = b_best = float("inf")
            a_worst = b_worst = 0.0
            for _ in range(runs):
                t0 = time.perf_counter()
                fn_a()
                dt = time.perf_counter() - t0
                a_best, a_worst = min(a_best, dt), max(a_worst, dt)
                t0 = time.perf_counter()
                fn_b()
                dt = time.perf_counter() - t0
                b_best, b_worst = min(b_best, dt), max(b_worst, dt)
            out[tag] = {
                "base": round(a_best, 3),
                "variant": round(b_best, 3),
                "spread_base": round(a_worst - a_best, 3),
                "spread_variant": round(b_worst - b_best, 3),
                "delta_pct": round(100 * (b_best - a_best) / a_best, 1),
            }

        ok_l = check_equal(
            "lpa_noshare",
            lpa_spec.builder(spark, d),
            lpa_opt(spark, d, edges_shared=False),
        )
        ok_p = check_equal(
            "prm_preonly", prm_spec.builder(spark, d), prm_opt(spark, d)
        )
        runs = args.runs
        # DuckDB leg skipped on purpose: the promotion decision is
        # Spark-base vs Spark-variant; the lpa oracle (no MATERIALIZED
        # pin) spills >60 GB beside a warm 48g Spark session and fills
        # the disk.  Ratios vs DuckDB come from the bench artifact.
        if ok_l:
            paired_ab(
                "lpa_ab",
                lambda: lpa_spec.builder(spark, d).count(),
                lambda: lpa_opt(spark, d, edges_shared=False).count(),
                runs,
            )
        if ok_p:
            paired_ab(
                "prm_ab",
                lambda: prm_spec.builder(spark, d).count(),
                lambda: prm_opt(spark, d).count(),
                runs,
            )
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("skew300", "skewbase"):
        from stellarsql_spark.scale import ensure_skewed_corpus

        d = (
            ensure_skewed_corpus(spark, args.sf, 300)
            if args.tier == "skew300"
            else args.sf
        )
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "lineitem"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)
        spec = specs["b_join_skew_split"]
        base_df = spec.builder(spark, d)
        ok = check_equal("split_cents", base_df, skew_split_cents(spark, d))
        timed_pair("base", spec.builder, d, con, spec.oracle, args.runs)
        if ok:
            timed_pair("split_cents", skew_split_cents, d, con, None, args.runs)
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("q3base", "q3x30"):
        d = args.sf if args.tier == "q3base" else ensure_scaled_corpus(spark, args.sf, 30)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("customer", "orders", "lineitem"):
            df = load_table(spark, d, t)
            if args.tier == "q3base":
                df.cache()
            df.count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)
        spec = specs["b_tpch_q3"]
        base_df = spec.builder(spark, d)
        ok = check_equal("q3_eager", base_df, q3_eager(spark, d))
        timed_pair("base", spec.builder, d, con, spec.oracle, args.runs)
        if ok:
            timed_pair("q3_eager", q3_eager, d, con, None, args.runs)
        out["floors_post"] = plan_floors(spark)

    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
