"""Round-14 tests: the r13 VERDICT next-round items — the bucketed
standing-set incremental-dedup twin (C284, VERDICT #1), the
minute-graph PageRank depth twin (C285, VERDICT #2), the pinned-rate
socket-source contract (VERDICT #5), and the r13 ADVICE hardening
(the unconditional dedup-auto audit row, sustained-rate retry).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestDedupIncrementalBucketed:
    def test_equals_plain_incremental(self, spark):
        """C284: the bucketed-layout twin must return exactly the plain
        anti-join's survivors (one shared oracle; the layout is the
        only thing being changed)."""
        from stellarsql_spark.pipeline.dedup import (
            b_llm_dedup_incremental,
            b_llm_dedup_incremental_bucketed,
        )

        want = {
            (r["doc_id"], r["text_hash"], r["n_in_batch"])
            for r in b_llm_dedup_incremental(spark, SF_MED).collect()
        }
        got = {
            (r["doc_id"], r["text_hash"], r["n_in_batch"])
            for r in b_llm_dedup_incremental_bucketed(spark, SF_MED).collect()
        }
        assert got == want and len(got) > 0

    def test_standing_side_has_no_exchange(self, spark):
        """The plan contract the twin exists for: a bucket-aligned
        SortMergeJoin LeftAnti whose ONLY shuffle is the batch's own
        pre-agg — the standing (corpus-sized) side is read bucketed,
        with no Exchange and no Sort above its scan (sorted at rest,
        one file per bucket)."""
        from stellarsql_spark.pipeline.dedup import (
            b_llm_dedup_incremental_bucketed,
        )

        df = b_llm_dedup_incremental_bucketed(spark, SF_MED)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan and "LeftAnti" in plan, plan
        shuffles = [
            line
            for line in plan.splitlines()
            if "Exchange hashpartitioning" in line and "Broadcast" not in line
        ]
        assert len(shuffles) == 1, plan  # the batch pre-agg, nothing else
        assert "text_hash" in shuffles[0], plan
        # the bucketed scan is actually bucket-read (not a plain scan)
        assert "Bucketed: true" in plan, plan

    def test_build_is_idempotent(self, spark):
        from stellarsql_spark.pipeline.dedup import (
            ensure_standing_hashset_bucketed,
        )
        from urllib.parse import urlparse

        name = ensure_standing_hashset_bucketed(spark, SF_MED)
        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        marker = os.path.join(warehouse, name, "_BUCKETS_DONE")
        mtime = os.stat(marker).st_mtime_ns
        assert ensure_standing_hashset_bucketed(spark, SF_MED) == name
        assert os.stat(marker).st_mtime_ns == mtime

    def test_standing_set_content(self, spark):
        """The artifact holds exactly the standing corpus's distinct
        hashes (doc_id % 3 != 0), bucketed into ≤N one-file buckets."""
        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.pipeline.dedup import (
            N_HASHSET_BUCKETS,
            ensure_standing_hashset_bucketed,
        )

        name = ensure_standing_hashset_bucketed(spark, SF_MED)
        got = {r["text_hash"] for r in spark.table(name).collect()}
        want = {
            r["text_hash"]
            for r in load_table(spark, SF_MED, "documents")
            .where(F.col("doc_id") % 3 != 0)
            .select(F.md5(F.lower(F.trim(F.col("text")))).alias("text_hash"))
            .distinct()
            .collect()
        }
        assert got == want
        from urllib.parse import urlparse

        warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        files = [
            f
            for f in os.listdir(os.path.join(warehouse, name))
            if f.endswith(".parquet") or (f.startswith("part-") and not f.endswith(".crc"))
        ]
        assert 1 <= len(files) <= N_HASHSET_BUCKETS


class TestDedupAutoAuditRow:
    def test_audit_row_always_present(self, spark):
        """r13 ADVICE: the verdict must be certified even on a batch
        with zero survivors — one (verdict, -1, '__audit__',
        n_standing) row rides along unconditionally."""
        from stellarsql_spark.pipeline.dedup import b_llm_dedup_auto

        out = b_llm_dedup_auto(spark, SF).collect()
        audit = [r for r in out if r["text_hash"] == "__audit__"]
        assert len(audit) == 1
        assert audit[0]["doc_id"] == -1
        assert audit[0]["verdict"] in ("plain", "bloom")
        assert audit[0]["n_in_batch"] >= 0
