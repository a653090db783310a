"""Round-10 tests: skew cold-lane eager-agg form, prefix hardening,
and the served groupby lineage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestSkewColdagg:
    @pytest.fixture(scope="class")
    def skewed_dir(self, tmp_path_factory):
        """Same mini corpus as TestSkewBypass: orderkey 0 holds 30k of
        ~34k lineitem rows, far above the sampled detector's bar."""
        import numpy as np
        import pandas as pd

        d = tmp_path_factory.mktemp("skewmini10")
        n_cold_keys, cold_mult, n_hot = 199, 20, 30_000
        orders = pd.DataFrame(
            {
                "o_orderkey": np.arange(n_cold_keys + 1, dtype=np.int64),
                "o_orderstatus": [
                    ("F", "O", "P")[i % 3] for i in range(n_cold_keys + 1)
                ],
            }
        )
        keys = np.concatenate(
            [
                np.zeros(n_hot, dtype=np.int64),
                np.repeat(np.arange(1, n_cold_keys + 1, dtype=np.int64), cold_mult),
            ]
        )
        li = pd.DataFrame(
            {
                "l_orderkey": keys,
                "l_linenumber": (np.arange(len(keys)) % 7 + 1).astype(np.int32),
                "l_extendedprice": np.round(
                    (np.arange(len(keys)) % 9973) * 1.01 + 1.0, 2
                ),
            }
        )
        orders.to_parquet(os.path.join(d, "orders.parquet"))
        li.to_parquet(os.path.join(d, "lineitem.parquet"))
        return str(d)

    def test_hot_path_fires_and_matches_plain_join(self, spark, skewed_dir):
        """Detection finds the hot key, the hot lane's broadcast join
        runs, and the result equals the plain shuffle join exactly —
        the cold lane's pre-aggregation must not change any value."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.skew import b_join_skew_coldagg

        df = b_join_skew_coldagg(spark, skewed_dir)
        rows = sorted(df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # the hot lane really ran

        o = load_table(spark, skewed_dir, "orders")
        li = load_table(spark, skewed_dir, "lineitem")
        plain = sorted(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("gross"),
            )
            .collect()
        )
        assert [tuple(r) for r in rows] == [tuple(r) for r in plain]

    def test_uniform_corpus_degenerates_to_single_lane(self, spark):
        """On the uniform tiny corpus no hot key clears the sampled
        bar, so the form is one eager-agg join — no broadcast lane,
        no union — and still value-identical to the plain join."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.skew import b_join_skew_coldagg

        df = b_join_skew_coldagg(spark, SF)
        rows = sorted(df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan

        o = load_table(spark, SF, "orders")
        li = load_table(spark, SF, "lineitem")
        plain = sorted(
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n_items"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("gross"),
            )
            .collect()
        )
        assert [tuple(r) for r in rows] == [tuple(r) for r in plain]


class TestPrefixHardening:
    def test_collision_guard_rejects_clashing_names(self, spark):
        """A sums out-name or row_number_as that collides with an input
        column (or a reserved internal) must fail loudly at the call
        site, not emit ambiguous duplicate columns downstream."""
        from stellarsql_spark.functions.prefix import ordered_running

        df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
        with pytest.raises(ValueError, match="collide"):
            ordered_running(df, [F.col("id")], {"v": F.col("v")})
        with pytest.raises(ValueError, match="collide"):
            ordered_running(
                df, [F.col("id")], {"s": F.col("v")}, row_number_as="id"
            )
        with pytest.raises(ValueError, match="collide"):
            ordered_running(
                df, [F.col("id")], {"__prefix_pid": F.col("v")}
            )

    def test_total_count_matches_without_rescan(self, spark):
        """total_count_as returns the exact row count, derived from the
        npart-row partition totals rather than a second input scan."""
        from stellarsql_spark.functions.prefix import ordered_running

        df = spark.range(777).select(
            F.col("id"), (F.col("id") % 13).alias("v")
        )
        out = ordered_running(
            df,
            [F.col("v"), F.col("id")],
            {"rs": F.col("v")},
            row_number_as="rn",
            total_count_as="n_total",
        )
        rows = out.collect()
        assert len(rows) == 777
        assert all(r["n_total"] == 777 for r in rows)

    def test_lineage_is_truncated(self, spark):
        """The partitioned frame must be pinned by lineage truncation
        (localCheckpoint), so a recompute through fresh range-boundary
        sampling is impossible — the r9 ADVICE recompute-drift class."""
        from stellarsql_spark.functions.prefix import ordered_running

        df = spark.range(100).select(F.col("id"), (F.col("id") % 7).alias("v"))
        out = ordered_running(df, [F.col("v"), F.col("id")], {"rs": F.col("v")})
        out.collect()
        # the logical plan of the result must bottom out in a
        # checkpointed relation, not re-derive from the range source
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan


class TestGroupbyServed:
    def test_served_equals_plain(self, spark):
        """The served flagship must be value-identical to the plain
        recompute — SUM-of-partials distributes over the day rollup
        and the final double arithmetic is expression-identical."""
        from stellarsql_spark.operators.aggregates import b_agg_groupby
        from stellarsql_spark.sources.bucketed import b_agg_groupby_served

        plain = sorted(
            tuple(r) for r in b_agg_groupby(spark, SF).collect()
        )
        served = sorted(
            tuple(r) for r in b_agg_groupby_served(spark, SF).collect()
        )
        assert served == plain

    def test_rollup_is_day_keyed_and_small(self, spark):
        """The maintained artifact keeps the day key (serving-time
        cutoffs stay answerable) and is |days|x|groups|-sized."""
        from stellarsql_spark.sources.bucketed import ensure_pricing_rollup

        d = ensure_pricing_rollup(spark, SF)
        ru = spark.read.parquet(d)
        assert {"l_shipdate", "l_returnflag", "l_linestatus"} <= set(ru.columns)
        n = ru.count()
        days = ru.select("l_shipdate").distinct().count()
        assert n <= days * 6  # at most |days| x (flag,status) combos
