"""Round-4 component tests: the MinHash-LSH recall contract.
The full-value correctness gate is tools/check_oracle.py; these pin
the algorithmic invariants the oracle compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestMinhashRecall:
    def test_recall_flags_true_on_corpus(self, spark):
        """Every jaccard band >= 0.8 present in the corpus must be
        recovered at >= 80% by the banded candidate path (measured
        1.0 at sf0.001/0.01/0.1)."""
        from stellarsql_spark.pipeline.dedup import b_llm_minhash_recall

        rows = b_llm_minhash_recall(spark, SF).collect()
        assert rows, "corpus has no >=0.8-jaccard truth pairs?"
        assert all(r.recall_ge_08 for r in rows)
        assert all(r.jac_band >= 0.8 for r in rows)

    def test_truth_counts_match_exact_jaccard(self, spark):
        """n_truth per band is exactly the band histogram of the
        hash-oracle-verified exact Jaccard pairs — the contract key
        introduces no second definition of truth."""
        from stellarsql_spark.pipeline.dedup import (
            MINHASH_RECALL_BAND,
            b_llm_jaccard,
            b_llm_minhash_recall,
        )

        exact = (
            b_llm_jaccard(spark, SF)
            .where(F.col("jaccard") >= MINHASH_RECALL_BAND)
            .select((F.floor(F.col("jaccard") * 10) / 10).alias("jac_band"))
            .groupBy("jac_band")
            .count()
        )
        expected = {r.jac_band: r["count"] for r in exact.collect()}
        got = {
            r.jac_band: r.n_truth
            for r in b_llm_minhash_recall(spark, SF).collect()
        }
        assert got == expected

    def test_found_pairs_are_truth_subset(self, spark):
        """b_llm_dedup_near verifies candidates with exact Jaccard, so
        its output must be a subset of the exact pair set — LSH can
        lose pairs, never invent them."""
        from stellarsql_spark.pipeline.dedup import b_llm_dedup_near, b_llm_jaccard

        truth = {
            (r.doc1, r.doc2) for r in b_llm_jaccard(spark, SF).collect()
        }
        found = {
            (r.doc1, r.doc2) for r in b_llm_dedup_near(spark, SF).collect()
        }
        assert found <= truth


class TestCogrouped:
    def test_matches_join_aggregate(self, spark):
        """The cogrouped reconciliation equals the equivalent
        join+groupBy — cogroup is an execution strategy, not new
        semantics."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.functions.udfs import b_udf_cogrouped

        got = {
            (r.o_orderkey, r.n_lines, round(r.gross, 2))
            for r in b_udf_cogrouped(spark, SF).collect()
        }
        o = load_table(spark, SF, "orders").where(F.col("o_orderkey") % 50 == 0)
        li = load_table(spark, SF, "lineitem").where(F.col("l_orderkey") % 50 == 0)
        ref = {
            (r.o_orderkey, r.n_lines, round(r.gross, 2))
            for r in o.join(li, o.o_orderkey == li.l_orderkey)
            .groupBy("o_orderkey")
            .agg(
                F.count("*").alias("n_lines"),
                (F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) / 100.0).alias("gross"),
            )
            .collect()
        }
        assert got == ref
        assert got, "subset predicate selected no orders?"


class TestConnectedComponents:
    def test_partition_property(self, spark):
        """Components partition the node set: sizes sum to |nodes|,
        component ids are member minima (so each id is <= every node
        it labels, and ids are distinct nodes)."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.graph import b_graph_components

        rows = b_graph_components(spark, SF).collect()
        n_users = (
            load_table(spark, SF, "events").select("user_id").distinct().count()
        )
        assert sum(r.n_nodes for r in rows) == n_users
        ids = [r.comp_id for r in rows]
        assert len(ids) == len(set(ids))

    def test_labels_constant_on_edges(self, spark):
        """Convergence invariant: every edge's endpoints share a
        component id (no edge crosses components)."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.graph import b_graph_components

        # rebuild the same minute-level edge set the operator uses
        ev = load_table(spark, SF, "events")
        b = ev.select(
            "user_id", "event_type", F.date_trunc("minute", "ts").alias("m")
        ).distinct()
        edges = (
            b.alias("l")
            .join(b.alias("r"), ["event_type", "m"])
            .where(F.col("l.user_id") < F.col("r.user_id"))
            .select(F.col("l.user_id").alias("u"), F.col("r.user_id").alias("v"))
            .distinct()
            .collect()
        )
        # recover per-node labels by rerunning the operator's closure:
        # component id = min reachable node; check via union-find over
        # the collected edge list (tiny at sf0.001)
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for e in edges:
            ru, rv = find(e.u), find(e.v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        nodes = [r.user_id for r in ev.select("user_id").distinct().collect()]
        sizes = {}
        for n in nodes:
            sizes[find(n)] = sizes.get(find(n), 0) + 1
        got = {(r.comp_id, r.n_nodes) for r in b_graph_components(spark, SF).collect()}
        assert got == set(sizes.items())


class TestHotPathPlans:
    def test_join_inner_preagg_aggregates_after_repartition(self, spark):
        """The measured 100x-probe win: the pre-agg's exchange must
        move RAW (key, cents) rows (REPARTITION_BY_COL) so the
        aggregate pair runs fused on key-local data — not a
        pre-exchange partial map that reduces ~nothing at ~3
        orders/customer. The customer join must stay a shuffled-hash
        join (no sorts of the two |customer|-sized sides)."""
        from stellarsql_spark.operators.joins import b_join_inner
        from stellarsql_spark.plans.explain import simple_plan

        plan = simple_plan(b_join_inner(spark, SF))
        assert "ShuffledHashJoin" in plan
        assert "REPARTITION_BY_COL" in plan
        # the repartition exchange feeds a Project/Filter/scan — NOT a
        # HashAggregate (that would be the old shuffle-the-partials
        # shape, one useless |customer|-sized map per task)
        import re

        m = re.search(r"Exchange hashpartitioning\(o_custkey[^\n]*REPARTITION_BY_COL[^\n]*\n[\s:]*\+- (\w+)", plan)
        assert m, plan
        assert m.group(1) != "HashAggregate", plan

    def test_tumbling_batch_single_shuffle(self, spark):
        """Batch tumbling = one exchange (the final agg); the integer
        hour bucketing must not introduce extra stages."""
        from stellarsql_spark.plans.explain import simple_plan
        from stellarsql_spark.streaming.windows import b_stream_tumbling

        plan = simple_plan(b_stream_tumbling(spark, SF))
        assert plan.count("Exchange") == 1, plan


class TestModernSql:
    def test_pipe_syntax_compiles_to_ansi_plan(self, spark):
        """|> stages are frontend sugar: the physical plan must equal
        the ANSI GROUP BY/HAVING form's plan (modulo plan ids)."""
        import re

        from stellarsql_spark.catalog import register_views
        from stellarsql_spark.operators.modern_sql import b_sql_pipe
        from stellarsql_spark.plans.explain import simple_plan

        register_views(spark, SF, ("orders",))
        ansi = spark.sql(
            """
            SELECT o_orderpriority, COUNT(*) AS n,
                   CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS spend
            FROM orders
            WHERE o_orderstatus = 'O'
            GROUP BY o_orderpriority
            HAVING COUNT(*) > 5
            """
        )

        def normalize(df):
            return re.sub(r"#\d+L?|plan_id=\d+", "#", simple_plan(df))

        assert normalize(b_sql_pipe(spark, SF)) == normalize(ansi)

    def test_collation_groups_case_insensitively(self, spark):
        """Mixed-case names must collapse: strictly fewer groups than
        binary grouping, exactly as many as lower() grouping."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.modern_sql import b_fn_collation

        p = load_table(spark, SF, "part").select(
            F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
            .otherwise(F.col("p_name"))
            .alias("mixed")
        )
        n_binary = p.distinct().count()
        n_lower = p.select(F.lower("mixed")).distinct().count()
        n_collated = b_fn_collation(spark, SF).count()
        assert n_collated == n_lower < n_binary

    def test_variant_extract_matches_json_path(self, spark):
        from pyspark.sql import functions as F

        from stellarsql_spark.operators.modern_sql import b_fn_variant
        from stellarsql_spark.catalog import load_table

        got = {r.event_id: (r.k, r.t, r.v) for r in b_fn_variant(spark, SF).collect()}
        ref = {
            r.event_id: (int(r.k), r.event_type, r.value)
            for r in load_table(spark, SF, "events")
            .where(F.col("event_id") % 97 == 0)
            .select("event_id", F.get_json_object("props", "$.k").alias("k"), "event_type", "value")
            .collect()
        }
        assert got == ref
