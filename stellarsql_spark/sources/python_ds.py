"""Custom Python data source (SURVEY.md §2 C87, Spark 4
``pyspark.sql.datasource`` API): the extension point for connectors
Spark has no built-in reader for (internal services, bespoke formats).

The source here is a deterministic synthetic generator — id, id²
mod a prime, and a bucket label — split across 8 input partitions, so
the key exercises the REAL connector plumbing (registration, schema
declaration, partition planning, per-partition iterators feeding
Arrow batches) while staying hash-checkable: the DuckDB oracle
rebuilds the same rows from ``range()``.

Scale shape: partition planning happens driver-side and each
partition's ``read`` streams rows independently on an executor — the
same contract a production connector (e.g. a paginated REST source)
implements, where partitions map to shards/page ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stellarsql_spark.registry import register

_N_ROWS = 40_000
_N_PARTS = 8
_PRIME = 9973


def _make_datasource():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    class _SynthReader(DataSourceReader):
        def __init__(self, options):
            self._n = int(options.get("rows", _N_ROWS))

        def partitions(self):
            return [InputPartition(i) for i in range(_N_PARTS)]

        def read(self, partition):
            i = partition.value
            lo = i * self._n // _N_PARTS
            hi = (i + 1) * self._n // _N_PARTS
            for rid in range(lo, hi):
                yield (rid, rid * rid % _PRIME, f"b{rid % 7}")

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return "stellar_synth"

        def schema(self):
            return "id BIGINT, sq BIGINT, bucket STRING"

        def reader(self, schema):
            return _SynthReader(self.options)

    return SynthDataSource


_PYDS_ORACLE = f"""
SELECT 'b' || CAST(id % 7 AS VARCHAR) AS bucket,
       COUNT(*) AS n,
       CAST(SUM(id * id % {_PRIME}) AS BIGINT) AS sum_sq,
       CAST(MIN(id) AS BIGINT) AS min_id,
       CAST(MAX(id) AS BIGINT) AS max_id
FROM range({_N_ROWS}) t(id)
GROUP BY bucket
"""


@register("b_source_python_ds", oracle=_PYDS_ORACLE, tags=("source", "python-datasource"))
def b_source_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C87: read through a registered custom Python data source and
    aggregate per bucket — row counts, modular-square sums, and id
    ranges must reproduce the oracle's ``range()`` reconstruction
    (proving every partition delivered exactly its slice)."""
    spark.dataSource.register(_make_datasource())
    src = spark.read.format("stellar_synth").option("rows", str(_N_ROWS)).load()
    return src.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.sum("sq").cast("bigint").alias("sum_sq"),
        F.min("id").cast("bigint").alias("min_id"),
        F.max("id").cast("bigint").alias("max_id"),
    )
