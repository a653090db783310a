"""Round-8 second-batch component tests: metric/overlap/drift
operators added after the judge items landed — NDCG (C160), PSI
drift (C161), DISTINCT ON (C162), M4 downsampling (C163), OOV rate
(C164), neighborhood Jaccard (C165), BLEU-2 pairs (C166).

Each test asserts a mathematical property of the metric the hash
oracle alone can't express (bounds, conservation, per-key
uniqueness), at sf0.001/sf0.01 — the same split the other rounds
use."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestNdcg:
    def test_bounds_and_ideal(self, spark):
        """DCG can never exceed IDCG (rel grades are a permutation of
        the ideal at best), NDCG is in (0, 1], and IDCG@k is the same
        constant for every query (all queries share the graded-gain
        ladder k..1)."""
        from stellarsql_spark.pipeline.vectors import b_llm_ndcg

        rows = b_llm_ndcg(spark, SF).collect()
        assert rows
        idcgs = {r.idcg_m for r in rows}
        assert len(idcgs) == 1
        for r in rows:
            assert 0 < r.dcg_m <= r.idcg_m
            assert 0.0 < r.ndcg <= 1.0


class TestPsiDrift:
    def test_terms_nonnegative_and_conserved(self, spark):
        """Every PSI term (p_cur - p_ref)·ln(p_cur/p_ref) is >= 0 by
        construction (both factors share sign), and the psi_b column
        must equal the exact sum of the emitted terms on every row."""
        from stellarsql_spark.operators.quality import b_quality_drift

        rows = b_quality_drift(spark, SF_MED).collect()
        assert rows
        total = sum(r.term_b for r in rows)
        for r in rows:
            assert r.term_b >= 0
            assert r.psi_b == total
            assert r.n_ref > 0 and r.n_cur > 0


class TestDistinctOn:
    def test_one_row_per_key_is_the_max(self, spark):
        """Exactly one row per customer, and it carries that
        customer's maximum order total."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.modern_sql import b_sql_distinct_on

        rows = b_sql_distinct_on(spark, SF).collect()
        keys = [r.o_custkey for r in rows]
        assert len(keys) == len(set(keys)) > 0
        maxes = {
            r.o_custkey: r.mx
            for r in load_table(spark, SF, "orders")
            .where(F.col("o_custkey") < 500)
            .groupBy("o_custkey")
            .agg(F.max("o_totalprice").alias("mx"))
            .collect()
        }
        for r in rows:
            assert r.o_totalprice == maxes[r.o_custkey]


class TestM4Downsample:
    def test_extrema_bracket_endpoints_and_counts_conserve(self, spark):
        """v_min <= {v_first, v_last} <= v_max per bucket, and the
        per-bucket point counts must sum to the filtered row count
        (M4 partitions the series; it never drops or double-counts)."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.timeseries import b_ts_downsample_m4

        rows = b_ts_downsample_m4(spark, SF).collect()
        assert rows
        for r in rows:
            assert r.v_min <= r.v_first <= r.v_max
            assert r.v_min <= r.v_last <= r.v_max
        n_src = (
            load_table(spark, SF, "events").where(F.col("event_type") == "click").count()
        )
        assert sum(r.n_pts for r in rows) == n_src


class TestOovRate:
    def test_every_source_measured_with_sane_rates(self, spark):
        """The alternating-block split must leave every source with
        held-out tokens (plain doc_id parity would drop half the
        sources — the bug this test pins), and rates live in [0, 1)."""
        from stellarsql_spark.pipeline.textstats import b_llm_oov_rate

        rows = b_llm_oov_rate(spark, SF_MED).collect()
        assert len(rows) == 20
        for r in rows:
            assert 0 <= r.n_oov <= r.n_tokens
            assert 0.0 <= r.oov_rate < 1.0


class TestGraphJaccard:
    def test_intersection_bounded_by_degrees(self, spark):
        """cn <= min(du, dv) - 1 is not guaranteed (endpoints are
        excluded from both neighborhoods already), but cn < min(du,
        dv) always holds since v in N(u) never matches as a common
        neighbor; jaccard in (0, 1]; ranks unique."""
        from stellarsql_spark.operators.graph import b_graph_jaccard

        rows = b_graph_jaccard(spark, SF).collect()
        assert rows
        assert len({r.rn for r in rows}) == len(rows)
        for r in rows:
            assert 0 < r.cn < min(r.du, r.dv)
            assert 0.0 < r.jaccard <= 1.0


class TestBleuPairs:
    def test_clipping_and_penalty_bounds(self, spark):
        """Clipped counts can't exceed candidate totals, the brevity
        penalty is at most 1, and BLEU is bounded by the penalty
        (the geometric-mean factor is a precision <= 1)."""
        from stellarsql_spark.pipeline.textstats import b_llm_bleu_pairs

        rows = b_llm_bleu_pairs(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 <= r.c1 <= r.t1
            assert 0 <= r.c2 <= r.t2
            assert 0 < r.bp_m <= 1_000_000
            assert 0 <= r.bleu2_m <= r.bp_m
