"""Round-3 component tests: graph analytics, sessionization,
interpolation, curation filters, and the image-resize codec path.
The full-value correctness gate is tools/check_oracle.py; these pin
the algorithmic invariants the oracle compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestGraph:
    def test_triangle_census_matches_bruteforce(self, spark):
        """Degree-oriented counting equals the plain u<v three-way
        self-join on the same edge list."""
        from stellarsql_spark.operators.graph import _edges, b_graph_triangles

        edges = {(r.u, r.v) for r in _edges(spark, SF).collect()}
        brute = sum(
            1
            for (a, b) in edges
            for (c, d) in edges
            if b == c and (a, d) in edges
        )
        row = b_graph_triangles(spark, SF).collect()[0]
        assert row.n_triangles == brute
        assert row.n_edges == len(edges)
        # every edge endpoint pair is ordered
        assert all(u < v for (u, v) in edges)

    def test_clustering_coefficient_bounds(self, spark):
        from stellarsql_spark.operators.graph import b_graph_triangles

        row = b_graph_triangles(spark, SF).collect()[0]
        assert 0.0 <= row.clustering <= 1.0
        assert row.n_wedges >= row.n_triangles * 3  # each triangle holds 3 wedges

    def test_pagerank_mass_and_order(self, spark):
        from stellarsql_spark.operators.graph import b_graph_pagerank

        rows = b_graph_pagerank(spark, SF).collect()
        assert rows, "graph must be non-empty at sf0.001"
        # truncating fixed-point iterations only ever LOSE micro-units
        # vs the ideal mass of 1e6 per node, and damping floors at .15
        assert all(150000 <= r.rank_micro <= 10**9 for r in rows)
        prs = [r.rank_micro for r in rows]
        assert prs == sorted(prs, reverse=True)


class TestSessionize:
    def test_sessions_partition_events(self, spark):
        """Session event counts sum to the event count: sessions are a
        partition of each user's history."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.events_analytics import b_ev_sessionize

        out = b_ev_sessionize(spark, SF)
        n_events = load_table(spark, SF, "events").count()
        agg = out.agg(
            F.sum("n_events").alias("tot"), F.min("duration_us").alias("mind")
        ).collect()[0]
        assert agg.tot == n_events
        assert agg.mind >= 0

    def test_session_seq_dense_from_one(self, spark):
        from stellarsql_spark.operators.events_analytics import b_ev_sessionize

        out = b_ev_sessionize(spark, SF)
        bad = out.groupBy("user_id").agg(
            F.min("session_seq").alias("lo"),
            F.max("session_seq").alias("hi"),
            F.count("*").alias("n"),
        ).where((F.col("lo") != 1) | (F.col("hi") != F.col("n")))
        assert bad.count() == 0


class TestInterpolate:
    def test_spine_complete_and_filled(self, spark):
        from stellarsql_spark.operators.timeseries import b_ts_interpolate

        out = b_ts_interpolate(spark, SF)
        rows = out.collect()
        assert len(rows) == 720  # 30 days x 24 hours
        assert all(r.filled_value is not None for r in rows)

    def test_interp_rows_between_neighbors(self, spark):
        """A linearly interpolated value lies within [min, max] of its
        bracketing observations — check against the actual rows."""
        from stellarsql_spark.operators.timeseries import b_ts_interpolate

        rows = sorted(
            b_ts_interpolate(spark, SF).collect(), key=lambda r: r.bucket
        )
        actuals = [
            (i, r.filled_value) for i, r in enumerate(rows) if r.fill_src == "actual"
        ]
        idx = [i for i, _ in actuals]
        for i, r in enumerate(rows):
            if r.fill_src != "interp":
                continue
            prev = max(j for j in idx if j < i)
            nxt = min(j for j in idx if j > i)
            lo = min(rows[prev].filled_value, rows[nxt].filled_value)
            hi = max(rows[prev].filled_value, rows[nxt].filled_value)
            assert lo - 1e-9 <= r.filled_value <= hi + 1e-9


class TestCuration:
    def test_repetition_fraction_bounds(self, spark):
        from stellarsql_spark.pipeline.curation import b_llm_repetition

        bad = (
            b_llm_repetition(spark, SF)
            .where(
                (F.col("dup_word_frac") < 0)
                | (F.col("dup_word_frac") >= 1)
                | (F.col("n_distinct_words") > F.col("n_words"))
                | (F.col("top_word_n") < 1)
            )
        )
        assert bad.count() == 0

    def test_contamination_excludes_benchmark(self, spark):
        from stellarsql_spark.pipeline.curation import _BENCH_MOD, b_llm_contamination

        out = b_llm_contamination(spark, SF)
        assert out.where(F.col("doc_id") % _BENCH_MOD == 0).count() == 0
        bad = out.where(
            (F.col("n_shared") > F.col("n_grams")) | (F.col("n_shared") < 1)
        )
        assert bad.count() == 0

    def test_stratified_predicate_and_determinism(self, spark):
        from stellarsql_spark.pipeline.curation import b_llm_stratified

        a = {r.doc_id for r in b_llm_stratified(spark, SF).collect()}
        b = {r.doc_id for r in b_llm_stratified(spark, SF).collect()}
        assert a == b and a, "digest sample must be non-empty and reproducible"
        import hashlib

        for doc_id in list(a)[:20]:
            assert hashlib.md5(str(doc_id).encode()).hexdigest()[0] in "01"


class TestImageResize:
    def test_gradient_codec_resize_identity(self):
        """Resizing a 4x4 gradient to 4x4 is the identity: sums equal
        the direct pixel-formula sums."""
        from stellarsql_spark.pipeline.multimodal import (
            _bmp_encode_gradient,
            _bmp_resize_nn,
        )

        img = _bmp_encode_gradient(4, 4, (10, 20, 30))
        w, h, sr, sg, sb = _bmp_resize_nn(img)
        assert (w, h) == (4, 4)
        exp_r = sum((10 + 7 * x + 13 * y) % 256 for x in range(4) for y in range(4))
        exp_g = sum((20 + 11 * x + 3 * y) % 256 for x in range(4) for y in range(4))
        exp_b = sum((30 + 5 * x + 17 * y) % 256 for x in range(4) for y in range(4))
        assert (sr, sg, sb) == (exp_r, exp_g, exp_b)

    def test_downsample_picks_strided_pixels(self):
        from stellarsql_spark.pipeline.multimodal import (
            _bmp_encode_gradient,
            _bmp_resize_nn,
        )

        img = _bmp_encode_gradient(8, 8, (0, 0, 0))
        _, _, sr, _, _ = _bmp_resize_nn(img)
        # nearest-neighbor with W=8 -> source columns/rows 0,2,4,6
        exp_r = sum((7 * (2 * dx) + 13 * (2 * dy)) % 256 for dx in range(4) for dy in range(4))
        assert sr == exp_r

    def test_padding_does_not_leak(self):
        """Width 5 rows carry a pad byte; the resample must never read
        it (a wrong row stride would)."""
        from stellarsql_spark.pipeline.multimodal import (
            _bmp_encode_gradient,
            _bmp_resize_nn,
        )

        img = _bmp_encode_gradient(5, 4, (1, 2, 3))
        _, _, sr, sg, sb = _bmp_resize_nn(img)
        cols = [0, 1, 2, 3]  # dx*5//4
        exp_r = sum((1 + 7 * x + 13 * y) % 256 for x in cols for y in range(4))
        assert sr == exp_r


class TestContaminationPlan:
    def test_benchmark_side_is_broadcast(self, spark):
        from stellarsql_spark.pipeline.curation import b_llm_contamination
        from stellarsql_spark.plans.explain import assert_in_plan

        assert_in_plan(b_llm_contamination(spark, SF), "BroadcastHashJoin")
