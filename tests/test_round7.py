"""Round-7 component tests: the custkey-bucketed headline twin (plan
shape + result equivalence with the exchange-bearing form) and the
artifact-sync guards the round-6 verdict asked for (PLANS.md and
SURVEY.md can no longer silently drift from the registry)."""

from __future__ import annotations

import os
import re

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestBucketedJoinInner:
    def test_single_shuffle_exchange(self, spark):
        """The whole point of the at-rest layout: the custkey pre-agg
        and the orders⋈customer join run on bucket-local data, so the
        ONLY shuffle Exchange left is the 25-row final rollup (the two
        dimension joins are BroadcastExchange, not shuffles)."""
        from stellarsql_spark.sources.bucketed import b_join_inner_bucketed

        df = b_join_inner_bucketed(spark, SF_MED)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shuffles = [
            line
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line and "Broadcast" not in line
        ]
        assert len(shuffles) == 1, plan

    def test_matches_unbucketed_result(self, spark):
        """Layout must never change answers: the bucketed twin and the
        exchange-bearing headline produce identical row sets."""
        from stellarsql_spark.operators.joins import b_join_inner
        from stellarsql_spark.sources.bucketed import b_join_inner_bucketed

        a = {tuple(r) for r in b_join_inner(spark, SF_MED).collect()}
        b = {tuple(r) for r in b_join_inner_bucketed(spark, SF_MED).collect()}
        assert a == b and len(a) > 0

    def test_bucket_reuse_is_metadata_only(self, spark):
        """Second ensure within a session is a catalog no-op; the
        on-disk fingerprint marker survives for cross-session reuse."""
        from urllib.parse import urlparse

        from stellarsql_spark.sources.bucketed import ensure_custkey_bucketed

        to, tc = ensure_custkey_bucketed(spark, SF_MED)
        assert (to, tc) == ensure_custkey_bucketed(spark, SF_MED)
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        assert os.path.exists(os.path.join(warehouse, to, "_BUCKETS_DONE"))


class TestArtifactSyncGuards:
    def test_plans_md_covers_registry(self):
        """PLANS.md (the no-cartesian / no-row-python audit) must list
        exactly the registry's keys — a new operator that skips the
        audit regeneration fails here instead of silently escaping the
        net (VERDICT r6 item 4)."""
        from stellarsql_spark.registry import all_specs

        with open(os.path.join(REPO, "PLANS.md")) as f:
            rows = re.findall(r"^\| (\w+) \|", f.read(), flags=re.M)
        plan_keys = set(rows) - {"query"}
        registry = set(all_specs())
        assert plan_keys == registry, (
            f"missing from PLANS.md: {sorted(registry - plan_keys)}; "
            f"stale in PLANS.md: {sorted(plan_keys - registry)}"
        )

    def test_survey_inventory_count_matches_registry(self):
        """SURVEY.md §2's declared inventory line must equal the
        registry: total key count and full-hash-oracle count both
        (VERDICT r6 item 10 — the count drifted twice in round 6)."""
        from stellarsql_spark.registry import all_specs

        with open(os.path.join(REPO, "SURVEY.md")) as f:
            m = re.search(
                r"(\d+) `queries\(\)` keys, (\d+) with full\s+hash oracles",
                f.read(),
            )
        assert m, "SURVEY.md inventory line not found"
        specs = all_specs()
        declared_total, declared_hash = int(m.group(1)), int(m.group(2))
        assert declared_total == len(specs)
        assert declared_hash == sum(1 for s in specs.values() if s.oracle)
