"""Round-14 OPTIMIZATION tests: internals changed by the optimization
round keep their contracts — the packed-long top-3 kernel matches the
window/struct semantics exactly (including ties and bound-edge keys),
and the rewritten graph builders reproduce the registered results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestTopkPacked:
    def _window_reference(self, o, c):
        w = Window.partitionBy("o_custkey").orderBy(
            F.col("o_totalprice").desc(), F.col("o_orderkey")
        )
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("c_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("int"))
        )

    def test_packed_kernel_matches_window_on_adversarial_frame(self, spark):
        """Pack/unpack parity on a constructed frame that exercises
        every edge the encoding depends on: exact price ties (broken
        by orderkey ASC), cents at .99/.01/.00, orderkeys near the
        2^34 bound, groups with fewer and more than 3 rows, and a
        custkey absent from the customer side (join filter)."""
        from stellarsql_spark.operators.sorts import topk3_packed

        near_bound = (1 << 34) - 2  # largest encodable orderkey
        rows = [
            # custkey 1: 5 orders, a 3-way price tie at the top
            (1, 101, 500.00), (1, 102, 500.00), (1, 103, 500.00),
            (1, 104, 499.99), (1, 105, 0.01),
            # custkey 2: 2 orders only (short group)
            (2, near_bound, 123.45), (2, 7, 123.45),
            # custkey 3: absent from customer — must be filtered
            (3, 301, 999.99),
            # custkey 4: cents edge values
            (4, 401, 0.00), (4, 402, 0.99), (4, 403, 1.00), (4, 404, 0.98),
        ]
        o = spark.createDataFrame(
            rows, "o_custkey long, o_orderkey long, o_totalprice double"
        )
        c = spark.createDataFrame([(1,), (2,), (4,)], "c_custkey long")
        got = sorted(map(tuple, topk3_packed(o, c, repartition_key=True).collect()))
        want = sorted(map(tuple, self._window_reference(o, c).collect()))
        assert got == want
        # tie-break explicit: custkey 1's top-3 are the tied 500.00
        # orders in orderkey-ASC order
        top1 = [t for t in got if t[0] == 1]
        assert [(t[1], t[3]) for t in top1] == [(101, 1), (102, 2), (103, 3)]
        # the near-bound orderkey decodes exactly
        assert (2, near_bound, 123.45, 2) in got

    def test_packed_headline_matches_window_on_corpus(self, spark):
        """The registered b_topk_per_group (packed + repartition-first)
        equals the window form on the real sf0.01 corpus — doubles
        compared bit-exactly via exceptAll."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.sorts import b_topk_per_group

        got = b_topk_per_group(spark, SF_MED)
        o = load_table(spark, SF_MED, "orders")
        c = load_table(spark, SF_MED, "customer")
        want = self._window_reference(o, c)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0

    def test_bucketed_twin_still_zero_exchange_and_equal(self, spark):
        """The packed kernel with repartition_key=False keeps the
        bucketed twin's zero-exchange plan and its result set."""
        from stellarsql_spark.operators.sorts import b_topk_per_group
        from stellarsql_spark.plans.explain import physical_plan
        from stellarsql_spark.sources.bucketed import b_topk_per_group_bucketed

        df = b_topk_per_group_bucketed(spark, SF_MED)
        plan = physical_plan(df)
        assert "Exchange hashpartitioning" not in plan, plan
        base = b_topk_per_group(spark, SF_MED)
        assert df.count() == base.count()
        assert df.exceptAll(base).count() == 0
