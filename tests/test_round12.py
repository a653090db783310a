"""Round-12 tests: the r11 VERDICT next-round items — the audit-driven
join dispatcher (C272), the standing-corpus dedup fold (C273), LPA to
convergence (C274), concurrent multi-query streaming isolation (C275),
and the composed IVF-PQ (C276)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestJoinAuto:
    def test_uniform_corpus_dispatches_plain(self, spark):
        """C272 through the key itself: on the uniform corpus the audit
        must pick 'plain' (no key can overflow a partition) and the
        result rows must equal the plain join."""
        from stellarsql_spark.operators.skew import b_join_auto

        out = b_join_auto(spark, SF_MED).collect()
        assert out and all(r["verdict"] == "plain" for r in out)

        from stellarsql_spark.catalog import load_table

        o = load_table(spark, SF_MED, "orders")
        li = load_table(spark, SF_MED, "lineitem")
        want = sorted(
            tuple(r)
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("gross"),
            )
            .collect()
        )
        got = sorted((r["o_orderstatus"], r["n_items"], r["gross"]) for r in out)
        assert got == want

    def test_zipfian_corpus_dispatches_bypass(self, spark, tmp_path):
        """C272 through the key itself on the zipfian corpus: the top-8
        hot keys hold ~50% of lineitem, so the audit must pick 'bypass'
        — and the dispatched bypass form must still equal the plain
        join on the same skewed parquet (the skew family's founding
        result-identity contract)."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.skew import b_join_auto
        from stellarsql_spark.scale import ensure_skewed_corpus

        d = ensure_skewed_corpus(spark, SF, 2, out_root=str(tmp_path))
        out = b_join_auto(spark, d).collect()
        assert out and all(r["verdict"] == "bypass" for r in out)

        o = load_table(spark, d, "orders")
        li = load_table(spark, d, "lineitem")
        want = sorted(
            tuple(r)
            for r in li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("gross"),
            )
            .collect()
        )
        got = sorted((r["o_orderstatus"], r["n_items"], r["gross"]) for r in out)
        assert got == want


class TestDedupFold:
    def test_fold_equals_full_recompute(self, spark):
        """C273: the three-batch fold (keep-min within batch, anti-join
        vs the standing on-disk hash set, append survivors) must equal
        the one-shot recompute where the first batch containing a hash
        wins."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.pipeline.dedup import b_llm_dedup_fold

        out = b_llm_dedup_fold(spark, SF_MED).collect()
        d = load_table(spark, SF_MED, "documents").select(
            "doc_id",
            (F.col("doc_id") % 3).cast("int").alias("batch_id"),
            F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
        )
        rows = d.collect()
        by_hash: dict = {}
        for r in rows:
            by_hash.setdefault(r["h"], []).append((r["batch_id"], r["doc_id"]))
        want = set()
        for h, members in by_hash.items():
            b0 = min(b for b, _ in members)
            in_b0 = [doc for b, doc in members if b == b0]
            want.add((b0, min(in_b0), h, len(in_b0)))
        got = {
            (r["batch_id"], r["doc_id"], r["text_hash"], r["n_in_batch"])
            for r in out
        }
        assert got == want

    def test_standing_set_and_idempotence(self, spark):
        """The final standing hash-set artifact must equal the distinct
        hash set of the whole corpus (nothing lost, nothing invented),
        and a re-call with an unchanged corpus must be a fingerprinted
        no-op (no rebuild)."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.pipeline.dedup import ensure_dedup_hashset

        root = ensure_dedup_hashset(spark, SF_MED)
        final = {
            r["text_hash"]
            for r in spark.read.parquet(os.path.join(root, "hashset_b2")).collect()
        }
        want = {
            r["h"]
            for r in load_table(spark, SF_MED, "documents")
            .select(F.md5(F.lower(F.trim(F.col("text")))).alias("h"))
            .distinct()
            .collect()
        }
        assert final == want
        marker = os.path.join(root, "_FOLD_DONE")
        mtime = os.stat(marker).st_mtime_ns
        assert ensure_dedup_hashset(spark, SF_MED) == root
        assert os.stat(marker).st_mtime_ns == mtime  # no rebuild


class TestLPAConverged:
    def test_fixpoint_or_cap(self, spark):
        """C274: the loop stops within the pinned cap; if it stopped
        EARLY the labels must be a genuine fixpoint (one more
        synchronous round changes nothing), which is exactly why the
        early exit and the oracle's full cap-round unroll agree."""
        from pyspark.sql import Window

        from stellarsql_spark.operators.graph import (
            LP_CONV_CAP,
            _lpa_converged,
            _minute_edges,
        )

        labels, rounds = _lpa_converged(spark, SF_MED)
        assert 1 <= rounds <= LP_CONV_CAP
        if rounds < LP_CONV_CAP:
            edges = _minute_edges(spark, SF_MED)
            bidir = edges.select("u", "v").unionAll(
                edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            votes = bidir.join(
                labels.select(F.col("node").alias("v"), "lbl"), "v"
            ).select(F.col("u").alias("node"), "lbl")
            w = Window.partitionBy("node").orderBy(F.col("n").desc(), F.col("lbl"))
            nxt = (
                votes.groupBy("node", "lbl")
                .agg(F.count("*").alias("n"))
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("node", "lbl")
            )
            changed = (
                nxt.join(labels.withColumnRenamed("lbl", "old"), "node")
                .where(F.col("lbl") != F.col("old"))
                .count()
            )
            assert changed == 0

    def test_partitions_all_nodes(self, spark):
        """Community sizes must partition the node set of the minute
        graph exactly once."""
        from stellarsql_spark.operators.graph import (
            _minute_edges,
            b_graph_label_prop_converged,
        )

        out = b_graph_label_prop_converged(spark, SF_MED)
        n_members = out.agg(F.sum("n_members")).first()[0]
        edges = _minute_edges(spark, SF_MED)
        n_nodes = (
            edges.select(F.col("u").alias("n"))
            .unionAll(edges.select(F.col("v").alias("n")))
            .distinct()
            .count()
        )
        assert n_members == n_nodes


class TestStreamConcurrent:
    def test_isolated_checkpoints_and_batch_parity(self, spark):
        """C275: both queries must drain all 4 micro-batches through
        their OWN commit logs, and both sinks must equal their batch
        SQL."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.streaming.parity import b_stream_concurrent

        seen = {}

        def probe(ckpt_a, ckpt_b):
            for tag, ckpt in (("a", ckpt_a), ("b", ckpt_b)):
                commits = [
                    n
                    for n in os.listdir(os.path.join(ckpt, "commits"))
                    if not n.startswith(".")
                ]
                seen[tag] = sorted(commits)

        out = b_stream_concurrent(spark, SF, _probe=probe).collect()
        assert seen["a"] == ["0", "1", "2", "3"], seen
        assert seen["b"] == ["0", "1", "2", "3"], seen

        ev = load_table(spark, SF, "events")
        want_tum = sorted(
            (r[0], r[1], r[2], r[3])
            for r in ev.groupBy(
                F.unix_micros(F.date_trunc("hour", "ts")).alias("k"),
                "event_type",
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("tv"),
            )
            .collect()
        )
        got_tum = sorted(
            (r["k_num"], r["k_str"], r["n_events"], r["total_value"])
            for r in out
            if r["qtag"] == "tumbling"
        )
        assert got_tum == want_tum
        want_usr = sorted(
            (r[0], r[1])
            for r in ev.groupBy(F.col("user_id").cast("bigint").alias("u"))
            .agg(F.count("*").alias("n"))
            .collect()
        )
        got_usr = sorted(
            (r["k_num"], r["n_events"]) for r in out if r["qtag"] == "peruser"
        )
        assert got_usr == want_usr


class TestHoltWinters:
    def test_recurrence_matches_python_fold(self, spark):
        """C277: the Spark fold must equal a literal Python Holt-Winters
        recurrence over the same per-type daily series (exact float
        equality — every op is a halving/add of integer-valued doubles
        plus the one shared /7.0 init division)."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.timeseries import b_ts_holt_winters

        sf = "/root/testdata/sf0.01"
        out = {r["event_type"]: r for r in b_ts_holt_winters(spark, sf).collect()}
        ev = load_table(spark, sf, "events")
        daily = (
            ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
            .agg(
                F.sum(F.round(F.col("value") * 100).cast("bigint"))
                .cast("double")
                .alias("x")
            )
            .collect()
        )
        series: dict = {}
        for r in daily:
            series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
        for et, pts in series.items():
            pts.sort()
            xs = [x for _, x in pts]
            if len(xs) <= 7:
                assert et not in out
                continue
            l = sum(xs[:7]) / 7.0
            b = 0.0
            s = [x - l for x in xs[:7]]
            for x in xs[7:]:
                l_new = 0.5 * (x - s[0]) + 0.5 * (l + b)
                b = 0.5 * (l_new - l) + 0.5 * b
                s = s[1:] + [0.5 * (x - l_new) + 0.5 * s[0]]
                l = l_new
            r = out[et]
            assert r["n_days"] == len(xs)
            assert r["level_cents"] == l
            assert r["trend_cents"] == b
            assert r["seasonal_cents"] == s[-1]
            assert r["forecast7_cents"] == l + 7 * b + s[-1]


class TestDedupBloom:
    def test_no_false_negatives_and_fp_routing(self, spark):
        """C278: the Bloom-prefiltered survivors must equal C269's
        plain anti-join survivors exactly (no false negatives), and
        `bloom_hit` must mark precisely the survivors whose k probe
        positions all collide with the standing set (the measured FP
        set — typically small at m=2^16 on this corpus)."""
        from stellarsql_spark.pipeline.dedup import (
            b_llm_dedup_bloom,
            b_llm_dedup_incremental,
        )

        sf = "/root/testdata/sf0.01"
        got = b_llm_dedup_bloom(spark, sf).collect()
        want = {
            (r["doc_id"], r["text_hash"], r["n_in_batch"])
            for r in b_llm_dedup_incremental(spark, sf).collect()
        }
        assert {(r["doc_id"], r["text_hash"], r["n_in_batch"]) for r in got} == want
        fp = sum(r["bloom_hit"] for r in got)
        # every survivor is by definition NOT in the standing set, so a
        # bloom_hit survivor is a genuine false positive; at m=65536
        # with ~333 standing hashes the FP fraction must stay small
        assert fp / max(len(got), 1) < 0.2


class TestIvfpq:
    def test_pruning_and_recall_annotation(self, spark):
        """C276: every query's candidate set is a strict subset of the
        corpus (IVF pruning really pruned) yet still yields a full
        top-k; the ADC ranking is annotated against the exact int8
        top-k with measurable recall (0.18 measured on this corpus —
        the seeded coarse quantizer's honest number)."""
        import duckdb

        from stellarsql_spark.pipeline.vectors import b_llm_ivfpq
        from stellarsql_spark.registry import all_specs

        rows = b_llm_ivfpq(spark, SF_MED).collect()
        assert len(rows) == 5 * 10  # full top-k per query despite pruning
        per_q = {}
        for r in rows:
            per_q.setdefault(r["query_id"], []).append(r)
        assert set(per_q) == {0, 1, 2, 3, 4}
        for q, rs in per_q.items():
            rns = sorted(r["rn"] for r in rs)
            assert rns == list(range(1, 11))
            dists = [r["adc_dist"] for r in sorted(rs, key=lambda r: r["rn"])]
            assert dists == sorted(dists)
        recall = sum(r["in_exact_topk"] for r in rows) / len(rows)
        assert recall >= 0.1

        # candidate-count ordering from the oracle's own CTEs: IVF-PQ
        # scores a strict subset of what plain ADC scores (which is the
        # full corpus minus self)
        sql = all_specs()["b_llm_ivfpq"].oracle
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{SF_MED}/embeddings.parquet')"
        )
        n_total = con.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
        pre = sql[: sql.rindex("SELECT r.query_id")]
        cand = dict(
            con.execute(
                pre + "SELECT p.query_id, COUNT(*) FROM af f "
                "JOIN probe p ON f.cell = p.cell "
                "WHERE f.vec_id <> p.query_id GROUP BY 1"
            ).fetchall()
        )
        con.close()
        assert set(cand) == {0, 1, 2, 3, 4}
        for q, n in cand.items():
            assert 10 <= n < n_total - 1  # pruned, but top-k still fillable

    def test_served_equals_plain_minus_annotation(self, spark):
        """C280: the served form (codes read from the materialized
        artifact) must return exactly the plain PQ-ADC ranking minus
        the recall-annotation column, and the artifact build must be a
        fingerprinted no-op on re-call."""
        from stellarsql_spark.pipeline.vectors import (
            b_llm_pq_adc,
            b_llm_pq_adc_served,
            ensure_pq_codes,
        )

        sf = "/root/testdata/sf0.01"
        served = {
            (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rn"])
            for r in b_llm_pq_adc_served(spark, sf).collect()
        }
        plain = {
            (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rn"])
            for r in b_llm_pq_adc(spark, sf).collect()
        }
        assert served == plain and len(served) == 50
        codes_dir, _ = ensure_pq_codes(spark, sf)
        marker = os.path.join(codes_dir, "_PQ_DONE")
        mtime = os.stat(marker).st_mtime_ns
        ensure_pq_codes(spark, sf)
        assert os.stat(marker).st_mtime_ns == mtime

    def test_residual_training_beats_plain(self, spark):
        """C279: residual encoding + the trained codebook must beat the
        plain seeded-codebook IVF-PQ's recall on this corpus (measured
        0.26 vs 0.18; the CB_ITERS ablation showed residuals WITHOUT
        training are a wash, so the > relation is the certified claim
        for the composed refinement)."""
        from stellarsql_spark.pipeline.vectors import (
            b_llm_ivfpq,
            b_llm_ivfpq_residual,
        )

        sf = "/root/testdata/sf0.01"
        plain = [r["in_exact_topk"] for r in b_llm_ivfpq(spark, sf).collect()]
        resid = [
            r["in_exact_topk"] for r in b_llm_ivfpq_residual(spark, sf).collect()
        ]
        assert len(plain) == len(resid) == 50
        assert sum(resid) > sum(plain)
