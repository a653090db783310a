"""Round-5 component tests: transformWithState protobuf shim plumbing
and the data-size session tiers."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


class TestPbShim:
    def test_protobuf_available_idempotent(self):
        from stellarsql_spark.streaming.runtime import protobuf_available

        first = protobuf_available()
        assert protobuf_available() == first

    def test_shim_propagation_sets_worker_pythonpath(self, spark):
        import os

        from stellarsql_spark.streaming.runtime import (
            _PBSHIM_DIR,
            _propagate_pbshim,
        )

        _propagate_pbshim(spark)
        _propagate_pbshim(spark)  # idempotent: no duplicate entries
        pp = spark.sparkContext.environment["PYTHONPATH"].split(os.pathsep)
        assert pp.count(_PBSHIM_DIR) == 1


class TestRound5Operators:
    def test_stars_equals_label_propagation(self, spark):
        """Two independent algorithms, one graph invariant: the
        O(log n) star contraction and the diameter-round min-label
        propagation must produce identical component censuses."""
        from stellarsql_spark.operators.graph import (
            b_graph_components,
            b_graph_components_stars,
        )

        a = {(r.comp_id, r.n_nodes) for r in b_graph_components(spark, SF).collect()}
        b = {(r.comp_id, r.n_nodes) for r in b_graph_components_stars(spark, SF).collect()}
        assert a == b

    def test_reservoir_exact_k_and_stable(self, spark):
        from stellarsql_spark.operators.reshape import (
            _RESERVOIR_K,
            b_sample_reservoir,
        )
        from stellarsql_spark.catalog import load_table

        import pyspark.sql.functions as F

        out = b_sample_reservoir(spark, SF)
        sizes = {
            r.source: r.n
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        truth = {
            r.source: r.n
            for r in load_table(spark, SF, "documents")
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for src, n in sizes.items():
            assert n == min(_RESERVOIR_K, truth[src])
        # deterministic: a second build yields the identical sample
        one = {(r.source, r.doc_id, r.pick) for r in out.collect()}
        two = {(r.source, r.doc_id, r.pick) for r in b_sample_reservoir(spark, SF).collect()}
        assert one == two

    def test_nearest_join_beats_brute_force(self, spark):
        """The two-candidate windowed construction must equal the
        pairwise argmin under the (diff, pts, pid) tie rule."""
        from pyspark.sql import Window
        import pyspark.sql.functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.joins import b_join_nearest

        ev = load_table(spark, SF, "events")
        c = ev.where(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("cid"), F.col("ts").alias("cts")
        )
        p = ev.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("pu"), F.col("event_id").alias("pid"), F.col("ts").alias("pts")
        )
        diff = F.abs(F.unix_micros("pts") - F.unix_micros("cts"))
        w = Window.partitionBy("cid").orderBy(diff, F.col("pts"), F.col("pid"))
        brute = (
            c.join(p, c.user_id == p.pu)
            .select("cid", "pid", F.row_number().over(w).alias("rn"))
            .where(F.col("rn") == 1)
        )
        want = {(r.cid, r.pid) for r in brute.collect()}
        got = {(r.click_id, r.purchase_id) for r in b_join_nearest(spark, SF).collect()}
        assert got == want

    def test_incremental_rollup_merges_exactly(self, spark):
        import pyspark.sql.functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.timeseries import b_ts_rollup_incremental

        got = {
            (r.bucket, r.event_type): (r.n_events, r.total_value)
            for r in b_ts_rollup_incremental(spark, SF).collect()
        }
        want = {
            (r.bucket, r.event_type): (r.n_events, r.total_value)
            for r in load_table(spark, SF, "events")
            .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                (F.sum(F.round(F.col("value") * 100).cast("bigint")) / 100.0)
                .cast("double")
                .alias("total_value"),
            )
            .collect()
        }
        assert got == want
