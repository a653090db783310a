"""Round-15 OPTIMIZATION A/B probes.

Same protocol as tools/opt_ab_r14.py (variants live HERE, unregistered;
result-set equality is asserted via exceptAll both ways BEFORE any
timing; min-of-N with trial-level base/variant interleaving so host
contention waves cancel).  A winning variant is promoted into the
operator module and re-certified by tools/check_oracle.py.

    python tools/opt_ab_r15.py --tier topk300
    python tools/opt_ab_r15.py --tier topk1000
    python tools/opt_ab_r15.py --tier topkdecomp1000
    python tools/opt_ab_r15.py --tier q3x30
    python tools/opt_ab_r15.py --tier join300

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

_KMASK = (1 << 34) - 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to restrict a "
                         "topk tier to (focused re-measure)")
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from stellarsql_spark.catalog import load_table
    from stellarsql_spark.registry import all_specs
    from stellarsql_spark.scale import ensure_scaled_corpus
    from stellarsql_spark.session import get_spark, tune_for_data_size

    spark = get_spark(f"opt_ab_{args.tier}", cpus=32)
    specs = all_specs()
    out: dict = {"tier": args.tier}

    # ------------------------------------------------------------------
    # topk variants.  All produce the registered result set (asserted).
    # ------------------------------------------------------------------

    def _packed(o):
        from stellarsql_spark.functions.exact import cents

        packed = F.shiftleft(cents("o_totalprice"), 34) + (
            F.lit(_KMASK) - F.col("o_orderkey")
        )
        return o.select("o_custkey", packed.alias("pk"))

    def _reconstruct(df):
        return df.select(
            "o_custkey",
            (F.lit(_KMASK) - F.col("pk").bitwiseAND(F.lit(_KMASK))).alias("o_orderkey"),
            (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
            "rn",
        )

    def _finish(aggd, c, hash_hint=False):
        cc = c.select("c_custkey")
        if hash_hint:
            cc = cc.hint("shuffle_hash")
        return aggd.join(cc, aggd.o_custkey == F.col("c_custkey")).select(
            "c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int").alias("rn")
        )

    def topk_rank_norepart(spark, sf_dir, hash_hint=False):
        """Window rank-filter form, NO explicit repartition: Spark 4's
        WindowGroupLimit inserts a PARTIAL top-3 below the exchange
        (local sort + per-key limit).  On this corpus replica keys are
        scattered (~1 row per (task, key)), so the partial is predicted
        NOT to reduce — measured here to close the VERDICT #1 question
        with numbers rather than argument."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        w = Window.partitionBy("o_custkey").orderBy(F.col("pk").desc())
        ranked = (
            _packed(o)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        )
        return _finish(_reconstruct(ranked), c, hash_hint)

    def topk_rank_repart(spark, sf_dir, hash_hint=False):
        """Window rank-filter AFTER an explicit repartition(o_custkey):
        one exchange (same bytes as the shipped form), then sort +
        WindowGroupLimit + row_number INSTEAD of the fused
        partial+final ObjectHashAggregate pair (collect_list object
        hash map + ArrayBuffer per key) — trades 15M ArrayBuffer
        allocations for one radix-prefix sort of the 16-byte rows."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        w = Window.partitionBy("o_custkey").orderBy(F.col("pk").desc())
        ranked = (
            _packed(o)
            .repartition(F.col("o_custkey"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
        )
        return _finish(_reconstruct(ranked), c, hash_hint)

    def topk_join_first(spark, sf_dir, hash_hint=False):
        """Shipped aggregate form, but the customer join runs at the
        PRE-explode grain (one row per customer with the ≤3-element
        array) instead of post-explode (3 rows per customer): the join
        probes/sorts a 3x smaller left side.  posexplode commutes with
        a key-equijoin (the join key is unchanged by the explode), so
        the result set is identical under any key multiplicity."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        top3 = F.slice(F.sort_array(F.collect_list("pk"), asc=False), 1, 3)
        aggd = (
            _packed(o)
            .repartition(F.col("o_custkey"))
            .groupBy("o_custkey")
            .agg(top3.alias("top"))
        )
        cc = c.select("c_custkey")
        if hash_hint:
            cc = cc.hint("shuffle_hash")
        return (
            aggd.join(cc, aggd.o_custkey == F.col("c_custkey"))
            .select("c_custkey", F.posexplode("top").alias("pos", "pk"))
            .select(
                "c_custkey",
                (F.lit(_KMASK) - F.col("pk").bitwiseAND(F.lit(_KMASK))).alias("o_orderkey"),
                (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
                (F.col("pos") + 1).cast("int").alias("rn"),
            )
        )

    def _top3_arrow_fn(batches):
        """Per-task vectorized top-3 (guide §4.2): the task's whole
        key-local slice is concatenated (each custkey is entirely
        inside one task after the exchange), lexsorted by
        (custkey asc, pk desc), and group-ranked with a cumulative-max
        trick — no JVM object hash maps, no ArrayBuffers."""
        import numpy as np
        import pyarrow as pa

        cks, pks = [], []
        for b in batches:
            cks.append(b.column(0).to_numpy(zero_copy_only=False))
            pks.append(b.column(1).to_numpy(zero_copy_only=False))
        if not cks:
            return
        ck = np.concatenate(cks)
        pk = np.concatenate(pks)
        order = np.lexsort((-pk, ck))  # custkey asc, pk desc
        ck_s, pk_s = ck[order], pk[order]
        idx = np.arange(len(ck_s), dtype=np.int64)
        first = np.empty(len(ck_s), dtype=bool)
        first[0] = True
        np.not_equal(ck_s[1:], ck_s[:-1], out=first[1:])
        start = np.maximum.accumulate(np.where(first, idx, 0))
        rn = idx - start  # 0-based rank within custkey
        keep = rn < 3
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(ck_s[keep]),
                pa.array(pk_s[keep]),
                pa.array((rn[keep] + 1).astype(np.int32)),
            ],
            names=["o_custkey", "pk", "rn"],
        )

    def _reconstruct_final(df):
        return df.select(
            F.col("o_custkey").alias("c_custkey"),
            (F.lit(_KMASK) - F.col("pk").bitwiseAND(F.lit(_KMASK))).alias("o_orderkey"),
            (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
            "rn",
        )

    def topk_arrow_join_first(spark, sf_dir):
        """Customer join piggybacks the top-3 exchange (SHJ build =
        per-partition customer slice), THEN the Python top-3 runs on
        the join output — which keeps hashpartitioning(o_custkey), so
        there is NO exchange after the Python stage."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        slim = _packed(o).repartition(F.col("o_custkey"))
        cc = c.select(F.col("c_custkey").alias("o_custkey")).hint("shuffle_hash")
        joined = slim.join(cc, "o_custkey").select("o_custkey", "pk")
        aggd = joined.mapInArrow(
            _top3_arrow_fn, "o_custkey long, pk long, rn int"
        )
        return _reconstruct_final(aggd)

    def topk_arrow_join_after(spark, sf_dir, hash_hint=True):
        """Python top-3 straight after the exchange; the customer join
        runs on the ≤3-per-key output (pays one more exchange of the
        small output because mapInArrow's partitioning is opaque)."""
        c = load_table(spark, sf_dir, "customer")
        o = load_table(spark, sf_dir, "orders")
        slim = _packed(o).repartition(F.col("o_custkey"))
        aggd = slim.mapInArrow(_top3_arrow_fn, "o_custkey long, pk long, rn int")
        cc = c.select("c_custkey")
        if hash_hint:
            cc = cc.hint("shuffle_hash")
        return (
            aggd.join(cc, aggd.o_custkey == F.col("c_custkey"))
            .select(
                "c_custkey",
                (F.lit(_KMASK) - F.col("pk").bitwiseAND(F.lit(_KMASK))).alias("o_orderkey"),
                (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
                "rn",
            )
        )

    def join_inner_packed(spark, sf_dir):
        """b_join_inner with the pre-agg exchange narrowed to ONE long
        per row (guide §2.3 narrower types): pk = o_custkey << 26 |
        cents(o_totalprice).  Bounds: corpus max cents 49,999,318 <
        2^26 (prices never scale with replication), custkey < 2^34 <<
        2^37 headroom.  The exchange partitions on shiftright(pk, 26)
        and the groupBy uses the same expression, so the repartition
        still satisfies the aggregate's distribution (verified: one
        Exchange in the plan) while the shuffled row shrinks 24 → 16
        bytes (UnsafeRow: 8B header + fields)."""
        from stellarsql_spark.functions.exact import cents

        o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
        c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        n = load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        )
        r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
        pk = F.shiftleft(F.col("o_custkey"), 26).bitwiseOR(cents("o_totalprice"))
        ck = F.shiftright(F.col("pk"), 26)
        pre = (
            o.select(pk.alias("pk"))
            .repartition(ck)
            .groupBy(ck.alias("o_custkey"))
            .agg(
                F.count("*").alias("n_orders_p"),
                F.sum(F.col("pk").bitwiseAND(F.lit((1 << 26) - 1))).alias("rev_p"),
            )
        )
        return (
            pre.join(c.hint("shuffle_hash"), pre.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name", "n_name")
            .agg(
                F.sum("n_orders_p").alias("n_orders"),
                (F.sum("rev_p") / 100.0).cast("double").alias("revenue"),
            )
        )

    # ------------------------------------------------------------------

    def check_equal(name, base_df, var_df):
        n_b, n_v = base_df.count(), var_df.count()
        d1 = base_df.exceptAll(var_df).count()
        d2 = var_df.exceptAll(base_df).count()
        ok = (n_b == n_v) and d1 == 0 and d2 == 0
        out[f"{name}_equal"] = {
            "base": n_b, "variant": n_v, "missing": d1, "extra": d2, "ok": ok
        }
        return ok

    def paired_ab(tag, fn_a, fn_b, runs):
        """Trial-level interleaving of base vs variant (r14 protocol:
        back-to-back pairs cancel multi-minute host waves)."""
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

    def _scaled(factor):
        if factor <= 1:
            return args.sf
        tables = (
            ("lineitem", "orders", "customer", "events", "embeddings", "documents")
            if factor == 1000
            else None
        )
        return ensure_scaled_corpus(spark, args.sf, factor, tables=tables)

    if args.tier in ("topk1000", "topk300", "topkbase"):
        factor = {"topk1000": 1000, "topk300": 300, "topkbase": 1}[args.tier]
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        spec = specs["b_topk_per_group"]
        base_df = spec.builder(spark, d)
        variants = {
            "rank_norepart": lambda s, dd: topk_rank_norepart(s, dd),
            "rank_repart": lambda s, dd: topk_rank_repart(s, dd),
            "join_first": lambda s, dd: topk_join_first(s, dd),
            "join_first_hash": lambda s, dd: topk_join_first(s, dd, hash_hint=True),
            "rank_repart_hash": lambda s, dd: topk_rank_repart(s, dd, hash_hint=True),
            "arrow_join_first": topk_arrow_join_first,
            "arrow_join_after": topk_arrow_join_after,
        }
        if args.only:
            keep = set(args.only.split(","))
            variants = {k: v for k, v in variants.items() if k in keep}
        oks = {}
        var_dfs = {}
        for name, b in variants.items():
            var_dfs[name] = b(spark, d)
            oks[name] = check_equal(name, base_df, var_dfs[name])
        for name in variants:
            if not oks[name]:
                continue
            vdf = var_dfs[name]
            paired_ab(
                f"ab_{name}",
                lambda: base_df.count(),
                lambda vdf=vdf: vdf.count(),
                args.runs,
            )
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("topkdecomp1000", "topkdecomp300"):
        factor = 1000 if args.tier.endswith("1000") else 300
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        c = load_table(spark, d, "customer")
        o = load_table(spark, d, "orders")
        slim = _packed(o)
        top3 = F.slice(F.sort_array(F.collect_list("pk"), asc=False), 1, 3)
        aggd0 = (
            slim.repartition(F.col("o_custkey")).groupBy("o_custkey").agg(top3.alias("top"))
        )
        exploded = aggd0.select("o_custkey", F.posexplode("top").alias("pos", "pk")).select(
            "o_custkey",
            (F.lit(_KMASK) - F.col("pk").bitwiseAND(F.lit(_KMASK))).alias("o_orderkey"),
            (F.shiftright("pk", 34) / 100.0).cast("double").alias("o_totalprice"),
            (F.col("pos") + 1).alias("rn"),
        )
        full = specs["b_topk_per_group"].builder(spark, d)

        def noop(df):
            return lambda: df.write.format("noop").mode("overwrite").save()

        stages = {
            "d0_scan_project": noop(slim),
            "d1_exchange": noop(slim.repartition(F.col("o_custkey"))),
            "d2_agg": noop(aggd0),
            "d3_explode": noop(exploded),
            "d4_full_noop": noop(full),
            "d5_full_count": (lambda: full.count()),
        }
        for tag, fn in stages.items():
            fn()  # warm
            best, worst = float("inf"), 0.0
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best, worst = min(best, dt), max(worst, dt)
            out[tag] = {"best": round(best, 3), "spread": round(worst - best, 3)}
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("q3base", "q3x30", "q3x100", "q3x300"):
        factor = {"q3base": 1, "q3x30": 30, "q3x100": 100, "q3x300": 300}[args.tier]
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("customer", "orders", "lineitem"):
            df = load_table(spark, d, t)
            if factor == 1:
                df.cache()
            df.count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)
        spec = specs["b_tpch_q3"]
        base_df = spec.builder(spark, d)

        def q3_eager(spark, sf_dir):
            from stellarsql_spark.functions.exact import cents

            c = load_table(spark, sf_dir, "customer").where(
                F.col("c_mktsegment") == "BUILDING"
            )
            o = load_table(spark, sf_dir, "orders").where(
                F.col("o_orderdate") < "1998-03-15"
            )
            li = load_table(spark, sf_dir, "lineitem").where(
                F.col("l_shipdate") > "1998-03-15"
            )
            ep, dc = cents("l_extendedprice"), cents("l_discount")
            rev = li.groupBy("l_orderkey").agg(
                (F.sum(ep * (100 - dc)) / 10000.0).cast("double").alias("revenue")
            )
            return (
                c.join(o, c.c_custkey == o.o_custkey)
                .join(rev, o.o_orderkey == rev.l_orderkey)
                .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
                .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
                .limit(10)
            )

        ok = check_equal("q3_eager", base_df, q3_eager(spark, d))
        timed_pair("base", spec.builder, d, con, spec.oracle, args.runs)
        if ok:
            timed_pair("q3_eager", q3_eager, d, con, None, args.runs)
            paired_ab(
                "ab_q3_eager",
                lambda: base_df.count(),
                lambda: q3_eager(spark, d).count(),
                args.runs,
            )
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("joinpk300", "joinpk1000", "joinpkbase"):
        factor = {"joinpk300": 300, "joinpk1000": 1000, "joinpkbase": 1}[args.tier]
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer", "nation", "region"):
            df = load_table(spark, d, t)
            if factor == 1:
                df.cache()
            df.count()
        out["floors_pre"] = plan_floors(spark)
        spec = specs["b_join_inner"]
        base_df = spec.builder(spark, d)
        var_df = join_inner_packed(spark, d)
        from stellarsql_spark.plans.explain import physical_plan

        out["n_shuffle_exchanges_variant"] = physical_plan(var_df).count(
            "Exchange hashpartitioning"
        )
        if check_equal("joinpk", base_df, var_df):
            paired_ab(
                "ab_joinpk",
                lambda: base_df.write.format("noop").mode("overwrite").save(),
                lambda: var_df.write.format("noop").mode("overwrite").save(),
                args.runs,
            )
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("joindecomp300", "joindecomp1000"):
        # VERDICT #4 follow-through: stage decomposition of the plain
        # b_join_inner so the 300× ratio drift is attributed to a
        # component (scan / exchange / agg / dim joins) rather than
        # hand-waved as environment.
        factor = 300 if args.tier.endswith("300") else 1000
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer", "nation", "region"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        from stellarsql_spark.functions.exact import cents

        o = load_table(spark, d, "orders")
        slim = o.select("o_custkey", cents("o_totalprice").alias("cts"))
        repart = slim.repartition(F.col("o_custkey"))
        aggd = repart.groupBy("o_custkey").agg(
            F.count("*").alias("n"), F.sum("cts").alias("c")
        )
        full = specs["b_join_inner"].builder(spark, d)

        def noop(df):
            return lambda: df.write.format("noop").mode("overwrite").save()

        stages = {
            "d0_scan_project": noop(slim),
            "d1_exchange": noop(repart),
            "d2_agg": noop(aggd),
            "d3_full_noop": noop(full),
        }
        for tag, fn in stages.items():
            fn()  # warm
            best, worst = float("inf"), 0.0
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn()
                dt = time.perf_counter() - t0
                best, worst = min(best, dt), max(worst, dt)
            out[tag] = {"best": round(best, 3), "spread": round(worst - best, 3)}
        out["floors_post"] = plan_floors(spark)

    elif args.tier in ("join300", "join1000"):
        # VERDICT #4: re-measure the untouched b_join_inner family at
        # depth under the paired protocol to adjudicate the +23% 300x
        # drift (environment vs regression).
        factor = 300 if args.tier == "join300" else 1000
        d = _scaled(factor)
        tune_for_data_size(spark, d, cpus=32)
        for t in ("orders", "customer", "nation", "region"):
            load_table(spark, d, t).count()
        out["floors_pre"] = plan_floors(spark)
        con = duck_con(d)
        for key in ("b_join_inner", "b_join_inner_bucketed"):
            spec = specs[key]
            if key.endswith("bucketed"):
                from stellarsql_spark.sources.bucketed import ensure_custkey_bucketed

                ensure_custkey_bucketed(spark, d)
            timed_pair(key, spec.builder, d, con, spec.oracle, args.runs)
        out["floors_post"] = plan_floors(spark)

    print(json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
