"""Round-5 batch-3 component tests (C96–C103): mask semantics,
timestamp-arithmetic cross-engine invariants, QUALIFY lowering plan
shape, grouping-id bit conventions, parquet bloom metadata, the AQE
skew split (plan-asserted post-execution), BFS frontier invariants,
and bigram-novelty bounds."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

SF = "/root/testdata/sf0.001"


class TestMask:
    def test_default_mask_shape(self, spark):
        from stellarsql_spark.functions.families import b_fn_mask

        rows = b_fn_mask(spark, SF).collect()
        assert rows
        for r in rows:
            # Customer#000000123 → Xxxxxxxx#nnnnnnnnn
            assert r.name_masked.startswith("Xxxxxxxx#")
            assert set(r.name_masked[9:]) == {"n"}
            assert r.name_custom.startswith("Ulllllll#")
            # digit-only variant keeps the alpha prefix verbatim
            assert r.digits_only.startswith("Customer#")
            assert set(r.digits_only[9:]) == {"9"}
            assert set(r.seg_masked) == {"X"}  # segments are pure uppercase


class TestTsArith:
    def test_diff_matches_floor_of_elapsed(self, spark):
        """timestampdiff from a boundary-aligned origin must equal
        floor(elapsed seconds / unit) — the invariant that makes the
        DuckDB boundary-crossing oracle agree."""
        from stellarsql_spark.functions.families import b_fn_tsarith
        from stellarsql_spark.catalog import load_table

        got = {r.event_id: r for r in b_fn_tsarith(spark, SF).collect()}
        ev = (
            load_table(spark, SF, "events")
            .where(F.col("event_id") % 83 == 0)
            .select(
                "event_id",
                F.unix_timestamp("ts").alias("s"),
                "ts",
            )
            .collect()
        )
        import datetime

        origin = datetime.datetime(2024, 1, 1)
        for r in ev:
            elapsed = (r.ts - origin).total_seconds()
            assert got[r.event_id].h_elapsed == int(elapsed // 3600)
            assert got[r.event_id].d_elapsed == int(elapsed // 86400)
            assert got[r.event_id].plus_90m - r.ts == datetime.timedelta(minutes=90)
            assert r.ts - got[r.event_id].minus_36h == datetime.timedelta(hours=36)
            assert got[r.event_id].plus_1500ms - r.ts == datetime.timedelta(
                milliseconds=1500
            )


class TestQualify:
    def test_rides_window_group_limit(self, spark):
        """The QUALIFY lowering must compile to the rank-pushdown plan
        (WindowGroupLimit), not a full-rank materialization."""
        from stellarsql_spark.operators.modern_sql import b_sql_qualify

        df = b_sql_qualify(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        rows = df.collect()
        by_grp: dict[str, list] = {}
        for r in rows:
            by_grp.setdefault(r.o_orderpriority, []).append(r)
        for grp in by_grp.values():
            assert len(grp) <= 3
            ranks = sorted(r.rk for r in grp)
            assert ranks == list(range(1, len(grp) + 1))
            prices = [r.price for r in sorted(grp, key=lambda r: r.rk)]
            assert prices == sorted(prices, reverse=True)


class TestGroupingId:
    def test_bit_vector_convention(self, spark):
        from stellarsql_spark.operators.aggregates import b_agg_grouping_id

        rows = b_agg_grouping_id(spark, SF).collect()
        for r in rows:
            assert r.gid == r.g_status * 2 + r.g_priority
            if r.g_status:
                assert r.status == "ALL"
            if r.g_priority:
                assert r.priority == "ALL"
        gids = {r.gid for r in rows}
        assert gids == {0, 1, 3}  # ROLLUP: detail, per-status, grand


class TestParquetBloom:
    def test_bloom_bytes_written(self, spark):
        """The bloom-enabled copy must carry extra footer bytes vs a
        plain write of the same data — the cheap proxy that the bloom
        filters actually landed in the files."""
        from stellarsql_spark.sources.io import _scratch
        from stellarsql_spark.catalog import load_table

        o = load_table(spark, SF, "orders")
        base = _scratch("bloom_meta_test")
        plain, bloom = f"{base}/plain", f"{base}/bloom"
        o.coalesce(1).write.mode("overwrite").parquet(plain)
        (
            o.coalesce(1)
            .write.mode("overwrite")
            .option("parquet.bloom.filter.enabled", "true")
            .option("parquet.bloom.filter.max.bytes", 64 * 1024)
            .parquet(bloom)
        )

        def total(d):
            return sum(os.path.getsize(p) for p in glob.glob(f"{d}/part-*.parquet"))

        assert total(bloom) > total(plain) + 1024

    def test_probe_matches_source(self, spark):
        from stellarsql_spark.sources.io import (
            _PQ_BLOOM_KEYS,
            b_layout_parquet_bloom,
        )
        from stellarsql_spark.catalog import load_table

        got = {r.o_custkey: (r.n_orders, r.spend) for r in b_layout_parquet_bloom(spark, SF).collect()}
        o = load_table(spark, SF, "orders")
        want = {
            r.o_custkey: (r.n, round(r.s, 2))
            for r in o.where(F.col("o_custkey").isin(list(_PQ_BLOOM_KEYS)))
            .groupBy("o_custkey")
            .agg(
                F.count("*").alias("n"),
                (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0).alias("s"),
            )
            .collect()
        }
        assert {k: (n, round(s, 2)) for k, (n, s) in got.items()} == want


class TestSkewAqe:
    def test_skew_split_applied(self, spark):
        """Post-execution, the adaptive plan must carry the skew=true
        marker — the whole point of the key. Runs at sf0.01 where the
        hot partition clears the pinned 8KB threshold."""
        from stellarsql_spark.operators.skew import b_join_skew_aqe

        df = b_join_skew_aqe(spark, "/root/testdata/sf0.01")
        rows = df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "isFinalPlan=true" in plan
        # klen 3 = 'hot' (90%), 6/7 = cold_X
        got = {r.klen: r.n_events for r in rows}
        assert set(got) == {3, 6, 7}
        assert got[3] == 9 * sum(got.values()) // 10

    def test_confs_do_not_leak(self, spark):
        """The cloned-session conf pinning must leave the caller's
        session untouched."""
        from stellarsql_spark.operators.skew import _SKEW_CONFS, b_join_skew_aqe

        before = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
        b_join_skew_aqe(spark, SF).collect()
        after = {k: spark.conf.get(k, None) for k in _SKEW_CONFS}
        assert before == after


class TestBfs:
    def test_hops_monotone_and_rooted(self, spark):
        from stellarsql_spark.operators.graph import _BFS_MAX_HOPS, b_graph_bfs
        from stellarsql_spark.catalog import load_table

        rows = {r.hops: r.n_users for r in b_graph_bfs(spark, SF).collect()}
        assert set(rows) <= {-1} | set(range(_BFS_MAX_HOPS + 1))
        n_users = (
            load_table(spark, SF, "events").select("user_id").distinct().count()
        )
        assert sum(rows.values()) == n_users
        n_seeds = (
            load_table(spark, SF, "events")
            .where(F.col("user_id") % 100 == 0)
            .select("user_id")
            .distinct()
            .count()
        )
        assert rows.get(0, 0) == n_seeds


class TestBigramNovelty:
    def test_bounds_and_reconstruction(self, spark):
        """n_unique ≤ n_bigrams, and n_bigrams equals the doc's
        distinct-bigram count recomputed directly."""
        from stellarsql_spark.pipeline.textstats import b_llm_bigram_novelty
        from stellarsql_spark.catalog import load_table

        got = {
            r.doc_id: (r.n_bigrams, r.n_unique)
            for r in b_llm_bigram_novelty(spark, SF).collect()
        }
        docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
        assert len(got) == len(docs)
        for d in docs:
            toks = d.text.split(" ")
            bigrams = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
            n_bg, n_uq = got[d.doc_id]
            assert n_bg == len(bigrams)
            assert 0 <= n_uq <= n_bg


class TestString3:
    def test_initcap_and_instr_invariants(self, spark):
        from stellarsql_spark.functions.families import b_fn_string3
        from stellarsql_spark.catalog import load_table

        got = {r.p_partkey: r for r in b_fn_string3(spark, SF).collect()}
        src = {
            r.p_partkey: (r.p_name, r.p_type)
            for r in load_table(spark, SF, "part")
            .where(F.col("p_partkey") % 13 == 0)
            .collect()
        }
        assert set(got) == set(src)
        for k, (name, ptype) in src.items():
            r = got[k]
            assert r.name_second == name.split(" ")[1]
            assert r.name_title == " ".join(w[:1].upper() + w[1:] for w in name.split(" "))
            assert r.type_patched == ptype[:2] + "XX" + ptype[4:]
            if r.first_ox:
                assert name[r.first_ox - 1] == "o"  # 1-indexed match position


class TestMapHof:
    def test_zip_recovers_original(self, spark):
        """map_zip_with(m, 3m, b - 2a) must equal m — key-aligned, not
        position-aligned."""
        from stellarsql_spark.functions.families import b_fn_map_hof

        for r in b_fn_map_hof(spark, SF).collect():
            assert r.rediff == r.m_str
            assert r.upper_keys == r.m_str.upper()
            # doubled: every value is 2x the original
            orig = dict(kv.split("=") for kv in r.m_str.split(","))
            dbl = dict(kv.split("=") for kv in r.doubled.split(","))
            assert {k: int(v) * 2 for k, v in orig.items()} == {
                k: int(v) for k, v in dbl.items()
            }


class TestBitmap:
    def test_matches_count_distinct(self, spark):
        from stellarsql_spark.operators.aggregates import b_agg_bitmap
        from stellarsql_spark.catalog import load_table

        got = {r.o_orderstatus: (r.n_cust, r.n_orders) for r in b_agg_bitmap(spark, SF).collect()}
        want = {
            r.o_orderstatus: (r.nc, r.no)
            for r in load_table(spark, SF, "orders")
            .groupBy("o_orderstatus")
            .agg(
                F.countDistinct("o_custkey").alias("nc"),
                F.count("*").alias("no"),
            )
            .collect()
        }
        assert got == want


class TestUnionByName:
    def test_schema_and_null_fill(self, spark):
        from stellarsql_spark.operators.setops import b_set_union_byname

        df = b_set_union_byname(spark, SF)
        assert df.columns == ["id", "src", "seg", "bal", "nat"]
        rows = df.collect()
        assert rows
        for r in rows:
            if r.src == "customer":
                assert r.seg is not None and r.bal is not None and r.nat is None
            else:
                assert r.seg is None and r.bal is None and r.nat is not None


class TestExists:
    def test_lowered_to_semi_and_anti_joins(self, spark):
        from stellarsql_spark.operators.subqueries import b_sql_exists

        df = b_sql_exists(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan
        rows = df.collect()
        assert rows
        from stellarsql_spark.catalog import load_table

        orders = load_table(spark, SF, "orders")
        f_cust = {r.o_custkey for r in orders.where("o_orderstatus = 'F'").select("o_custkey").collect()}
        big_cust = {r.o_custkey for r in orders.where("o_totalprice > 450000").select("o_custkey").collect()}
        got = {r.c_custkey for r in rows}
        cust = {r.c_custkey for r in load_table(spark, SF, "customer").select("c_custkey").collect()}
        assert got == (cust & f_cust) - big_cust


class TestAvailableNow:
    def test_incremental_pickup(self, spark):
        from stellarsql_spark.streaming.parity import b_stream_available_now
        from stellarsql_spark.catalog import load_table

        r = b_stream_available_now(spark, SF).first()
        ev = load_table(spark, SF, "events")
        even = ev.where(F.col("event_id") % 2 == 0).count()
        odd = ev.where(F.col("event_id") % 2 == 1).count()
        assert (r.run1_rows, r.run2_new_rows, r.total_rows) == (even, odd, even + odd)


class TestSemDedup:
    def test_census_consistent_with_pairs(self, spark):
        """Every dropped vec must have a lower-id >=threshold pair;
        kept + dropped must partition the corpus."""
        from stellarsql_spark.pipeline.similarity import (
            b_llm_embed_neardup,
            b_llm_semdedup,
        )
        from stellarsql_spark.catalog import load_table

        census = b_llm_semdedup(spark, SF).collect()
        total = sum(r.n_vecs for r in census)
        assert total == load_table(spark, SF, "embeddings").count()
        for r in census:
            assert r.n_kept + r.n_dropped == r.n_vecs
        n_dropped = sum(r.n_dropped for r in census)
        drop_ids = {r.id2 for r in b_llm_embed_neardup(spark, SF).collect()}
        assert n_dropped == len(drop_ids)


class TestFullOuterStream:
    def test_partitions_into_three_emission_classes(self, spark):
        """matched + click-only + purchase-only must be disjoint and
        every null-padded row must be outside the other side's match
        reach under the final watermark."""
        from stellarsql_spark.streaming.parity import b_stream_full_outer

        rows = b_stream_full_outer(spark, SF).collect()
        matched = [r for r in rows if r.click_id is not None and r.purchase_id is not None]
        click_only = [r for r in rows if r.purchase_id is None]
        purch_only = [r for r in rows if r.click_id is None]
        assert len(matched) + len(click_only) + len(purch_only) == len(rows)
        assert all(r.click_id is not None for r in click_only)
        assert all(r.purchase_id is not None for r in purch_only)
        # no click/purchase id appears both matched and null-padded
        m_clicks = {r.click_id for r in matched}
        m_purch = {r.purchase_id for r in matched}
        assert m_clicks.isdisjoint({r.click_id for r in click_only})
        assert m_purch.isdisjoint({r.purchase_id for r in purch_only})


class TestChunking:
    def test_windows_cover_and_overlap(self, spark):
        """Chunks must tile each doc with the declared stride/window:
        reconstruct token coverage from (chunk_idx, n_chunk_tokens)."""
        from stellarsql_spark.pipeline.textstats import (
            CHUNK_S,
            CHUNK_W,
            b_llm_chunking,
        )
        from stellarsql_spark.catalog import load_table

        per_doc: dict[int, list] = {}
        for r in b_llm_chunking(spark, SF).collect():
            per_doc.setdefault(r.doc_id, []).append(r)
        toks = {
            r.doc_id: len(r.text.split(" "))
            for r in load_table(spark, SF, "documents").collect()
        }
        assert set(per_doc) == set(toks)
        for doc, chunks in per_doc.items():
            n = toks[doc]
            chunks.sort(key=lambda r: r.chunk_idx)
            expect_chunks = (max(n - 1, 0)) // CHUNK_S + 1
            assert len(chunks) == expect_chunks
            for i, c in enumerate(chunks):
                assert c.chunk_idx == i
                start = i * CHUNK_S
                assert c.n_chunk_tokens == min(CHUNK_W, n - start)


class TestRfm:
    def test_quartiles_partition_users(self, spark):
        from stellarsql_spark.operators.events_analytics import b_ev_rfm
        from stellarsql_spark.catalog import load_table

        cells = b_ev_rfm(spark, SF).collect()
        n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
        assert sum(r.n_users for r in cells) == n_users
        for r in cells:
            assert 1 <= r.r_score <= 4 and 1 <= r.f_score <= 4 and 1 <= r.m_score <= 4


class TestArrowUdf:
    def test_matches_jvm_aggregate(self, spark):
        from stellarsql_spark.functions.udfs import b_udf_arrow
        from stellarsql_spark.catalog import load_table

        got = {
            r.l_returnflag: (r.n_items, round(r.revenue, 2), r.total_qty)
            for r in b_udf_arrow(spark, SF).collect()
        }
        li = load_table(spark, SF, "lineitem").where(F.col("l_orderkey") % 101 == 0)
        want = {
            r.l_returnflag: (r.n, round(r.rev, 2), r.q)
            for r in li.groupBy("l_returnflag")
            .agg(
                F.count("*").alias("n"),
                (F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")) / 100.0).alias("rev"),
                F.sum(F.col("l_quantity").cast("bigint")).alias("q"),
            )
            .collect()
        }
        assert got == want


class TestKnnGraph:
    def test_exact_against_numpy(self, spark):
        """Recompute the full similarity matrix in-process and compare
        every (vec, rank) edge."""
        import numpy as np

        from stellarsql_spark.pipeline.similarity import KNN_K, b_llm_knn_graph
        from stellarsql_spark.catalog import load_table

        rows = b_llm_knn_graph(spark, SF).collect()
        emb = (
            load_table(spark, SF, "embeddings")
            .select("vec_id", "embedding")
            .collect()
        )
        ids = np.array([r.vec_id for r in emb])
        m = np.array([r.embedding for r in emb], dtype="float64")
        norm = np.sqrt((m * m).sum(axis=1))
        sims = np.round((m @ m.T) / np.outer(norm, norm), 6)
        np.fill_diagonal(sims, -np.inf)
        got = {}
        for r in rows:
            got.setdefault(r.vec_id, []).append((r.rank, r.neighbor_id, r.sim))
        assert len(rows) == len(ids) * KNN_K
        order = np.argsort(ids)
        for pos in order[:50]:  # spot-check 50 vectors exhaustively
            vid = ids[pos]
            row = sims[pos]
            want = sorted(
                ((row[j], ids[j]) for j in range(len(ids)) if j != pos),
                key=lambda t: (-t[0], t[1]),
            )[:KNN_K]
            mine = sorted(got[vid])
            assert [(n, s) for _, n, s in mine] == [(n, s) for s, n in want]


class TestCsvCorrupt:
    def test_census_consistent(self, spark):
        from stellarsql_spark.sources.io import b_read_csv_corrupt
        from stellarsql_spark.catalog import load_table

        r = b_read_csv_corrupt(spark, SF).first()
        n = load_table(spark, SF, "nation").count()
        assert r.n_good + r.n_corrupt == n
        assert r.n_dropmalformed == r.n_good
        assert r.n_corrupt > 0  # the corruption patterns must fire


class TestMergeSchema:
    def test_union_schema_null_fills(self, spark):
        from stellarsql_spark.sources.io import b_layout_merge_schema
        from stellarsql_spark.catalog import load_table

        rows = b_layout_merge_schema(spark, SF).collect()
        nation = load_table(spark, SF, "nation")
        per_region = {
            r.n_regionkey: r.c for r in nation.groupBy("n_regionkey").agg(F.count("*").alias("c")).collect()
        }
        for r in rows:
            assert r.n_rows == 2 * per_region[r.n_regionkey]
            assert r.n_upper == per_region[r.n_regionkey]


class TestCalendarDim:
    def test_spine_complete_and_conserved(self, spark):
        from stellarsql_spark.operators.timeseries import b_ts_calendar_dim
        from stellarsql_spark.catalog import load_table

        rows = b_ts_calendar_dim(spark, SF).collect()
        assert len(rows) == 31  # every January day, empty or not
        assert sum(r.n_events for r in rows) == (
            load_table(spark, SF, "events")
            .where(F.to_date("ts").between("2024-01-01", "2024-01-31"))
            .count()
        )
        by_day = {r.day: r for r in rows}
        assert by_day["2024-01-06"].is_weekend  # Saturday
        assert by_day["2024-01-06"].iso_dow == 6
        assert not by_day["2024-01-08"].is_weekend  # Monday
        assert by_day["2024-01-08"].iso_dow == 1


class TestStreamProgress:
    def test_conservation(self, spark):
        from stellarsql_spark.streaming.parity import b_stream_progress
        from stellarsql_spark.catalog import load_table

        r = b_stream_progress(spark, SF).first()
        ev = load_table(spark, SF, "events")
        assert r.input_rows_total == ev.count()
        assert r.sink_rows == ev.select("event_type").distinct().count()
        assert r.state_rows_nonneg
