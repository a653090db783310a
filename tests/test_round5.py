"""Round-5 component tests: transformWithState protobuf shim plumbing
and the data-size session tiers."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


class TestPbShim:
    def test_protobuf_available_idempotent(self):
        from stellarsql_spark.streaming.runtime import protobuf_available

        first = protobuf_available()
        assert protobuf_available() == first

    def test_shim_propagation_sets_worker_pythonpath(self, spark):
        import os

        from stellarsql_spark.streaming.runtime import (
            _PBSHIM_DIR,
            _propagate_pbshim,
        )

        _propagate_pbshim(spark)
        _propagate_pbshim(spark)  # idempotent: no duplicate entries
        pp = spark.sparkContext.environment["PYTHONPATH"].split(os.pathsep)
        assert pp.count(_PBSHIM_DIR) == 1
