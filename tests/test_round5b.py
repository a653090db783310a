"""Round-5 batch-2 component tests: python data source partitioning,
scene-cut/frame-sample consistency, stream outer-join emission rules,
state-reader shard coverage, and funnel monotonicity."""

from __future__ import annotations

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


class TestPythonDataSource:
    def test_partitions_deliver_disjoint_slices(self, spark):
        """Every row exactly once across the 8 planned partitions."""
        from stellarsql_spark.sources.python_ds import (
            _N_ROWS,
            _make_datasource,
        )

        spark.dataSource.register(_make_datasource())
        src = spark.read.format("stellar_synth").option("rows", str(_N_ROWS)).load()
        assert src.count() == _N_ROWS
        assert src.select("id").distinct().count() == _N_ROWS
        mn, mx = src.agg(F.min("id"), F.max("id")).first()
        assert (mn, mx) == (0, _N_ROWS - 1)


class TestSceneCut:
    def test_consistent_with_frame_sampler(self, spark):
        """Same demuxer, two consumers: scene-cut's n_frames must match
        the frame sampler's reconstruction of the stream length."""
        from stellarsql_spark.pipeline.multimodal import (
            FRAME_STRIDE,
            b_mm_frame_sample,
            b_mm_scene_cut,
        )

        cuts = {r.doc_id: r.n_frames for r in b_mm_scene_cut(spark, SF).collect()}
        sampled = (
            b_mm_frame_sample(spark, SF)
            .groupBy("doc_id")
            .agg(F.max("frame_idx").alias("last_idx"), F.count("*").alias("n_sampled"))
            .collect()
        )
        for r in sampled:
            n = cuts[r.doc_id]
            # sampled indices are 0, STRIDE, ... <= last valid index
            assert r.last_idx == ((n - 1) // FRAME_STRIDE) * FRAME_STRIDE
            assert r.n_sampled == (n + FRAME_STRIDE - 1) // FRAME_STRIDE

    def test_first_cut_is_a_cut(self, spark):
        from stellarsql_spark.pipeline.multimodal import b_mm_scene_cut

        for r in b_mm_scene_cut(spark, SF).limit(50).collect():
            if r.n_cuts == 0:
                assert r.first_cut == -1
            else:
                assert 1 <= r.first_cut < r.n_frames


class TestStreamOuterJoin:
    def test_null_rows_respect_watermark_margin(self, spark):
        """No null-padded row may come from a click inside the final
        watermark margin, and every emitted inner match must satisfy
        the interval condition."""
        from stellarsql_spark.streaming.parity import b_stream_outer_join
        from stellarsql_spark.catalog import load_table

        out = b_stream_outer_join(spark, SF)
        ev = load_table(spark, SF, "events")
        us = F.unix_micros("ts")
        maxc = ev.where(F.col("event_type") == "click").agg(F.max(us)).first()[0]
        maxp = ev.where(F.col("event_type") == "purchase").agg(F.max(us)).first()[0]
        wm = min(maxc, maxp) - 30 * 60 * 1_000_000
        rows = out.collect()
        for r in rows:
            cus = int(r.click_ts.timestamp() * 1_000_000)
            if r.purchase_id is None:
                assert cus + 30 * 60 * 1_000_000 < wm
            else:
                pus = int(r.purchase_ts.timestamp() * 1_000_000)
                assert cus < pus <= cus + 30 * 60 * 1_000_000


class TestStateReader:
    def test_every_key_in_exactly_one_shard(self, spark):
        from stellarsql_spark.streaming.parity import b_stream_state_reader

        st = b_stream_state_reader(spark, SF)
        assert st.count() == st.select("user_id").distinct().count()


class TestCurationFunnel:
    def test_stage_counts_monotone_nonincreasing(self, spark):
        from stellarsql_spark.pipeline.curation import b_llm_curation_funnel

        rows = sorted(
            b_llm_curation_funnel(spark, SF).collect(), key=lambda r: r.stage
        )
        names = [r.stage_name for r in rows]
        assert names == ["total", "langid", "quality", "exact_dedup", "decontaminated"]
        counts = [r.n_kept for r in rows]
        assert counts == sorted(counts, reverse=True)
        assert counts[0] > 0 and counts[-1] > 0
