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
        timed_pair("base", spec.builder, d, con, dsql, args.runs)
        if ok1:
            timed_pair("packed", topk_packed, d, con, None, args.runs)
        if ok2:
            timed_pair("packed_repart", topk_packed_repart, d, con, None, args.runs)
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
