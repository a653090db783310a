"""Read/write connectors (SURVEY.md §2 B2–B3).

The reference persists rows through its own disk interface
(fixed-width encoded records + JSON metadata, ``src/storage/
{diskinterface,file,bytescoder}.rs`` [pub, unverified]). The
Spark-native equivalents are the built-in columnar/row sources with
explicit schemas (never inferSchema in the engine path). Scratch
output lives under the repo so nothing outside it is touched.

Scale notes: partitioned parquet writes (`partitionBy`) create the
directory layout that later enables static partition pruning;
`maxRecordsPerFile`/AQE coalescing control file sizing at real scale.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellarsql_spark.catalog import load_table
from stellarsql_spark.registry import register

SCRATCH_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")


def _scratch(name: str) -> str:
    """Fresh scratch dir per call; prior runs of the SAME operator are
    pruned first so repeated bench/verify sweeps don't accumulate
    orphaned output directories."""
    import shutil

    os.makedirs(SCRATCH_ROOT, exist_ok=True)
    for old in os.listdir(SCRATCH_ROOT):
        if old.startswith(f"{name}_"):
            shutil.rmtree(os.path.join(SCRATCH_ROOT, old), ignore_errors=True)
    return tempfile.mkdtemp(prefix=f"{name}_", dir=SCRATCH_ROOT)


NATION_DDL = "n_nationkey INT, n_name STRING, n_regionkey INT"

_B2_ORACLE = """
SELECT n_nationkey, n_name, n_regionkey, 'csv' AS fmt FROM nation
UNION ALL
SELECT n_nationkey, n_name, n_regionkey, 'json' AS fmt FROM nation
"""


@register("b_read_csv_json", oracle=_B2_ORACLE, tags=("source", "csv", "json"))
def b_read_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV + JSON round-trip with explicit schemas (no inference)."""
    n = load_table(spark, sf_dir, "nation")
    base = _scratch("csv_json")
    csv_path, json_path = f"{base}/nation_csv", f"{base}/nation_json"
    n.write.mode("overwrite").option("header", True).csv(csv_path)
    n.write.mode("overwrite").json(json_path)
    csv_back = (
        spark.read.schema(NATION_DDL)
        .option("header", True)
        .csv(csv_path)
        .withColumn("fmt", F.lit("csv"))
    )
    json_back = spark.read.schema(NATION_DDL).json(json_path).withColumn("fmt", F.lit("json"))
    return csv_back.unionByName(json_back)


_ORC_ORACLE = """
SELECT n_regionkey, COUNT(*) AS n_nations,
       array_to_string(list_sort(list(n_name)), ',') AS names
FROM nation
GROUP BY n_regionkey
"""


@register("b_write_orc", oracle=_ORC_ORACLE, tags=("sink", "orc"))
def b_write_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip (second columnar format, built into Spark):
    write nation as ORC, read back, aggregate — oracle runs the same
    aggregate on the original table."""
    n = load_table(spark, sf_dir, "nation")
    out = _scratch("orc")
    n.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"),
    )


_B3_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus IN ('F', 'O')
GROUP BY o_orderstatus
"""


@register("b_write_roundtrip", oracle=_B3_ORACLE, tags=("sink", "parquet", "partitioned"))
def b_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet write + partition-pruned read-back.

    The read-back filter on the partition column prunes directories
    (visible as PartitionFilters in the scan node) — the mechanism
    that turns a 100 TB scan into a per-partition one.
    """
    o = load_table(spark, sf_dir, "orders")
    out = _scratch("part_write")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    back = spark.read.parquet(out).where(F.col("o_orderstatus").isin("F", "O"))
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )


COMPACT_TARGET_FILES = 4


_COMPACT_ORACLE = f"""
SELECT 'fragmented' AS layout, 64 AS n_files, COUNT(*) AS n_rows FROM orders
UNION ALL
SELECT 'compacted', {COMPACT_TARGET_FILES}, COUNT(*) FROM orders
"""


@register("b_compact_files", oracle=_COMPACT_ORACLE, tags=("sink", "compaction", "ops"))
def b_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction: write orders fragmented (64 files),
    rewrite coalesced to COMPACT_TARGET_FILES, verify row parity, and
    report both layouts. The streaming-ingest follow-up job every lake
    needs — at 100 TB, compaction targets ~1 GiB files via
    maxRecordsPerFile / repartition(bytes/1GiB), and runs per
    partition-date so it parallelizes and never rewrites cold data.
    File counts are deterministic layout facts (repartition(64) and
    coalesce(4) yield exactly that many non-empty files on this
    corpus), so the oracle asserts them with the row-parity counts."""
    import glob

    o = load_table(spark, sf_dir, "orders")
    frag_dir, compact_dir = _scratch("frag"), _scratch("compact")
    o.repartition(64).write.mode("overwrite").parquet(frag_dir)
    frag = spark.read.parquet(frag_dir)
    frag.coalesce(COMPACT_TARGET_FILES).write.mode("overwrite").parquet(compact_dir)
    back = spark.read.parquet(compact_dir)

    def n_files(d: str) -> int:
        return len(glob.glob(f"{d}/part-*.parquet"))

    return spark.createDataFrame(
        [
            ("fragmented", n_files(frag_dir), frag.count()),
            ("compacted", n_files(compact_dir), back.count()),
        ],
        schema="layout string, n_files int, n_rows bigint",
    )


_LAYOUT_ORACLE = """
SELECT CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY 1
"""


@register("b_layout_sorted_scan", oracle=_LAYOUT_ORACLE, tags=("sink", "layout", "clustering"))
def b_layout_sorted_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-clustered data layout: rewrite lineitem range-partitioned
    and sorted by l_shipdate, then serve a narrow date-range query
    from the clustered copy. Because each output file covers a tight
    l_shipdate range, the parquet min/max footer statistics let the
    filtered read skip whole files/row-groups — at 100 TB this is the
    difference between scanning the full fact table and touching ~one
    file per queried day (the plain-Spark analogue of Z-ordering /
    liquid clustering on a single sort key). The oracle runs the same
    aggregate on the unclustered source, proving the rewrite is
    content-preserving."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_extendedprice"
    )
    out = _scratch("sorted_layout")
    li.repartitionByRange(8, "l_shipdate").sortWithinPartitions("l_shipdate").write.mode(
        "overwrite"
    ).parquet(out)
    back = spark.read.parquet(out).where(
        (F.col("l_shipdate") >= "1997-03-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    return back.groupBy(F.col("l_shipdate").cast("date").cast("string").alias("ship_day")).agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )


# --- Z-order (Morton) multidimensional layout ------------------------

_ZBITS = 8  # 8 bits per dimension → 65536 cells, bucketed to 256


def _morton_sql(a: str, b: str, bits: int = _ZBITS) -> str:
    """Bit-interleave SQL text valid in both Spark and DuckDB:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1."""
    parts = [
        f"(((({a}) >> {i}) & 1) << {2 * i}) + (((({b}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return " + ".join(parts)


_ZORDER_ORACLE = f"""
WITH keyed AS (
  SELECT o_custkey % 256 AS ck, o_orderkey % 256 AS ok,
         {_morton_sql('o_custkey % 256', 'o_orderkey % 256')} AS zval
  FROM orders
)
SELECT CAST(zval // 256 AS BIGINT) AS zbucket,
       COUNT(*) AS n_rows,
       MIN(ck) AS ck_lo, MAX(ck) AS ck_hi,
       MIN(ok) AS ok_lo, MAX(ok) AS ok_hi
FROM keyed
GROUP BY zbucket
"""


@register("b_layout_zorder", oracle=_ZORDER_ORACLE, tags=("io", "layout", "zorder"))
def b_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key: interleave the bits of
    two scan dimensions so files sorted by `zval` are simultaneously
    clustered on BOTH columns — per-bucket min/max ranges stay narrow
    in ck AND ok (the emitted bounds prove it), which is what lets
    min/max file statistics skip files for predicates on either
    column at 100 TB. Pure integer bit arithmetic, identical in both
    engines, so the layout key itself is hash-verified."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        (F.col("o_custkey") % 256).alias("ck"),
        (F.col("o_orderkey") % 256).alias("ok"),
        F.expr(_morton_sql("o_custkey % 256", "o_orderkey % 256")).alias("zval"),
    )
    return (
        keyed.groupBy((F.col("zval") / 256).cast("bigint").alias("zbucket"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("ck").alias("ck_lo"),
            F.max("ck").alias("ck_hi"),
            F.min("ok").alias("ok_lo"),
            F.max("ok").alias("ok_hi"),
        )
    )


_PRUNE_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY o_orderpriority
"""


@register("b_layout_partition_prune", oracle=_PRUNE_ORACLE, tags=("io", "layout", "pruning"))
def b_layout_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-style partitioned layout + static partition pruning: write
    orders partitioned by o_orderpriority (directory-per-value), then
    serve a priority-filtered aggregate from the partitioned copy. The
    filter is resolved against DIRECTORY NAMES at plan time — the scan
    lists only the two matching partitions and never opens the other
    three (PartitionFilters in the scan node; at 100 TB this is the
    coarse pruning tier above file min/max skipping, and the layout
    dimension is chosen to match the dominant filter column). The
    oracle runs the same aggregate on the unpartitioned source,
    proving the rewrite is content-preserving."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = _scratch("partitioned_layout")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    back = spark.read.parquet(out).where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
    )


_TEXT_ORACLE = """
SELECT source,
       COUNT(*) AS n_lines,
       CAST(SUM(len(text)) AS BIGINT) AS sum_chars,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc
FROM documents
GROUP BY source
"""


@register("b_read_text", oracle=_TEXT_ORACLE, tags=("source", "text"))
def b_read_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw text-file ingestion (the 5th built-in source, completing
    csv/json/parquet/orc): documents serialize to
    ``source\\x1fdoc_id\\x1fbase64(text)`` lines, round-trip through
    ``spark.read.text``, and are re-parsed with substring_index — the
    one-record-per-line raw-corpus shard format an LLM pipeline
    starts from. The payload is base64-encoded so the round trip is
    TOTAL: a document containing \\r or \\n (which spark.read.text
    splits on) or the \\x1f delimiter itself round-trips losslessly
    instead of splitting into corrupt extra lines — the same
    binary-safe framing JSONL shards get from string escaping. (An
    earlier raise_error-on-CRLF form aborted on hostile corpora;
    tools/adversarial_corpus.py now pins the lossless behavior.)
    Per-source line counts, char totals, and doc-id ranges must
    reconstruct the parquet ground truth exactly."""
    d = load_table(spark, sf_dir, "documents")
    out = _scratch("read_text")
    (
        d.select(
            F.concat_ws(
                "\x1f",
                "source",
                "doc_id",
                # Spark's base64 is MIME-flavored: it wraps output in
                # \r\n every 76 chars, which would re-split long docs —
                # strip the wrapping (unbase64 doesn't need it back)
                F.regexp_replace(F.base64(F.encode("text", "UTF-8")), "[\\r\\n]", ""),
            )
        )
        .write.mode("overwrite")
        .text(out)
    )
    lines = spark.read.text(out)
    sep = "\x1f"
    parsed = lines.select(
        F.substring_index("value", sep, 1).alias("source"),
        F.substring_index(F.substring_index("value", sep, 2), sep, -1)
        .cast("bigint")
        .alias("doc_id"),
        F.decode(
            F.unbase64(
                F.expr(
                    f"substring(value, length(substring_index(value, '{sep}', 2)) + 2)"
                )
            ),
            "UTF-8",
        ).alias("text"),
    )
    return parsed.groupBy("source").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.length("text")).alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# C93 — DYNAMIC partition pruning: the runtime twin of
# b_layout_partition_prune. There the pruning literal is in the query
# text; here it is only discoverable by executing the DIM side first
# — Catalyst plants a DynamicPruning subquery on the fact scan's
# partition column, the broadcast of the filtered dim doubles as the
# pruning value set, and the fact scan lists only surviving
# directories at runtime. At 100 TB this is what keeps star-schema
# queries from scanning every date partition when the filter lives on
# the dimension table.
_DPP_ORACLE = """
WITH dim(prio, tier) AS (
  VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
         ('3-MEDIUM', 'std'), ('4-NOT SPECIFIED', 'std'), ('5-LOW', 'lazy')
)
SELECT tier,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders JOIN dim ON o_orderpriority = dim.prio
WHERE dim.tier = 'rush'
GROUP BY tier
"""


@register("b_layout_dpp", oracle=_DPP_ORACLE, tags=("io", "layout", "pruning", "dpp"))
def b_layout_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C93: dynamic partition pruning — fact partitioned by
    o_orderpriority, dim filter on a DIFFERENT column (tier), join on
    the partition column. The pruning set exists only at runtime
    (plan-asserted: `dynamicpruning` in the fact scan's
    PartitionFilters, tests/test_plans.py). The oracle computes the
    same join on the unpartitioned source."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = _scratch("dpp_layout")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [
            ("1-URGENT", "rush"),
            ("2-HIGH", "rush"),
            ("3-MEDIUM", "std"),
            ("4-NOT SPECIFIED", "std"),
            ("5-LOW", "lazy"),
        ],
        schema="prio string, tier string",
    ).where(F.col("tier") == "rush")
    return (
        fact.join(F.broadcast(dim), fact.o_orderpriority == dim.prio)
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_PQ_BLOOM_KEYS = (7, 107, 207, 307, 407)

_PQ_BLOOM_ORACLE = f"""
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS spend
FROM orders
WHERE o_custkey IN {_PQ_BLOOM_KEYS}
GROUP BY o_custkey
"""


@register("b_layout_parquet_bloom", oracle=_PQ_BLOOM_ORACLE, tags=("source", "layout", "bloom"))
def b_layout_parquet_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C100: parquet bloom-filter layout — the point-lookup companion
    to min/max row-group stats. Sorted layout + min/max
    (b_layout_sorted_scan) prunes RANGE predicates, but a point IN
    probe on an UNSORTED high-cardinality column hits every row group
    (each group's [min,max] spans the key space). Writing a bloom
    filter on that column (`parquet.bloom.filter.enabled#o_custkey`)
    lets parquet-mr's row-group filter drop groups whose bloom
    provably excludes all probe keys — at 100 TB a needle query reads
    a handful of row groups instead of the table, with no re-sort of
    the data. The write pins a small row-group size so the sf corpus
    actually spans many groups; the read path keeps filter pushdown
    on, and the result must hash-match the same probe against the
    original table (bloom filtering only ever skips groups with no
    matching rows — false positives cost IO, never correctness)."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    base = _scratch("pq_bloom")
    path = f"{base}/orders_bloom"
    # Measured against this build's parquet-mr: the global
    # `parquet.bloom.filter.enabled` and `...max.bytes` writer options
    # take effect (bloom bytes appear in the files, asserted in
    # tests); the per-column `#o_custkey` and `expected.ndv` forms are
    # silently ignored, so the write projects down to the two needed
    # columns first — blooms on exactly the probe key + payload, the
    # column-pruned equivalent of per-column enablement.
    (
        o.write.mode("overwrite")
        .option("parquet.bloom.filter.enabled", "true")
        .option("parquet.bloom.filter.max.bytes", 64 * 1024)
        .option("parquet.block.size", 256 * 1024)
        .parquet(path)
    )
    back = spark.read.parquet(path)
    keys = list(_PQ_BLOOM_KEYS)
    return (
        back.where(F.col("o_custkey").isin(keys))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0
            ).cast("double").alias("spend"),
        )
    )


# Deterministic corruption: every 7th nation row is written with a
# non-numeric n_nationkey, every 11th with too few fields.
_CSV_BAD_ORACLE = """
WITH tagged AS (
  SELECT n_nationkey, n_name, n_regionkey,
         CASE WHEN n_nationkey % 7 = 0 THEN 'badint'
              WHEN n_nationkey % 11 = 0 THEN 'short'
              ELSE 'good' END AS kind
  FROM nation
)
SELECT (SELECT COUNT(*) FROM tagged WHERE kind = 'good') AS n_good,
       (SELECT COUNT(*) FROM tagged WHERE kind <> 'good') AS n_corrupt,
       (SELECT COUNT(*) FROM tagged WHERE kind = 'good') AS n_dropmalformed,
       (SELECT CAST(SUM(n_regionkey) AS BIGINT) FROM tagged WHERE kind = 'good')
         AS sum_region_good
"""


@register("b_read_csv_corrupt", oracle=_CSV_BAD_ORACLE, tags=("source", "csv", "quality"))
def b_read_csv_corrupt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C116: malformed-record handling on CSV ingestion — the
    PERMISSIVE / DROPMALFORMED contract every lake ingest needs (at
    100 TB, bad rows are a statistical certainty; a FAILFAST pipeline
    is an outage). The builder writes nation as CSV with two
    deterministic corruption patterns (non-numeric key on n%7 rows, a
    truncated record on n%11 rows), then reads it back twice:
    PERMISSIVE with columnNameOfCorruptRecord quarantines bad lines
    into a side column (the dead-letter pattern — nothing is silently
    lost), DROPMALFORMED keeps only clean rows. The oracle recomputes
    all four census numbers from the corruption rule. Spark caveat
    baked in: the corrupt-record column must be materialized before
    filtering on it (cached here), per SPARK-21610."""
    n = load_table(spark, sf_dir, "nation")
    base = _scratch("csv_corrupt")
    path = f"{base}/nation_bad.csv"
    rows = n.select("n_nationkey", "n_name", "n_regionkey").collect()
    with open(path, "w") as f:
        for r in rows:
            if r.n_nationkey % 7 == 0:
                f.write(f"K{r.n_nationkey},{r.n_name},{r.n_regionkey}\n")
            elif r.n_nationkey % 11 == 0:
                f.write(f"{r.n_nationkey}\n")
            else:
                f.write(f"{r.n_nationkey},{r.n_name},{r.n_regionkey}\n")
    ddl = "n_nationkey INT, n_name STRING, n_regionkey INT, _bad STRING"
    permissive = (
        spark.read.schema(ddl)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(path)
        .cache()  # SPARK-21610: can't filter on the corrupt column in one pass
    )
    n_good = permissive.where(F.col("_bad").isNull()).count()
    n_corrupt = permissive.where(F.col("_bad").isNotNull()).count()
    sum_region = (
        permissive.where(F.col("_bad").isNull())
        .agg(F.sum("n_regionkey").cast("bigint"))
        .first()[0]
    )
    # Two measured traps in counting DROPMALFORMED survivors: plain
    # count() prunes all columns (nothing parsed → nothing dropped),
    # and ANY aggregate — even one referencing every column — rides
    # the CSV count-pushdown path, which skips malformed detection
    # (returns the raw line count). Only a row-producing plan applies
    # the drop, so pin a non-foldable filter over all columns between
    # the scan and the count.
    drop_df = (
        spark.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )
    allcols = F.md5(
        F.concat_ws(
            ",",
            F.coalesce(F.col("n_nationkey").cast("string"), F.lit("")),
            F.coalesce("n_name", F.lit("")),
            F.coalesce(F.col("n_regionkey").cast("string"), F.lit("")),
        )
    )
    dropped = drop_df.where(F.length(allcols) == 32).count()
    permissive.unpersist()
    return spark.createDataFrame(
        [(n_good, n_corrupt, dropped, sum_region)],
        schema="n_good bigint, n_corrupt bigint, n_dropmalformed bigint, sum_region_good bigint",
    )


_MERGE_SCHEMA_ORACLE = """
SELECT n_regionkey,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN gen = 2 THEN n_nationkey END) AS BIGINT) AS sum_key_gen2,
       COUNT(CASE WHEN gen = 2 THEN upper_name END) AS n_upper
FROM (
  SELECT n_regionkey, n_nationkey, 1 AS gen, CAST(NULL AS VARCHAR) AS upper_name
  FROM nation
  UNION ALL
  SELECT n_regionkey, n_nationkey, 2 AS gen, UPPER(n_name) AS upper_name
  FROM nation
)
GROUP BY n_regionkey
"""


@register("b_layout_merge_schema", oracle=_MERGE_SCHEMA_ORACLE, tags=("source", "layout", "schema-evolution"))
def b_layout_merge_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C117: parquet schema evolution at the FILE level — two
    generations of files in one directory (gen-2 adds an upper_name
    column), read back with mergeSchema=true: the unified schema is
    the union, gen-1 rows null-fill the new column. This is the
    at-rest twin of C107's logical UNION BY NAME — the situation a
    100 TB lake is ALWAYS in, because nobody rewrites history when a
    column is added. mergeSchema pays a footer read per file (not a
    data scan), which is why production sets it per-table, not
    globally; the oracle rebuilds both generations relationally."""
    n = load_table(spark, sf_dir, "nation")
    base = _scratch("merge_schema")
    path = f"{base}/nation_evolving"
    gen1 = n.select("n_regionkey", "n_nationkey", F.lit(1).alias("gen"))
    gen2 = n.select(
        "n_regionkey",
        "n_nationkey",
        F.lit(2).alias("gen"),
        F.upper("n_name").alias("upper_name"),
    )
    gen1.write.mode("overwrite").parquet(path)
    gen2.write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy("n_regionkey").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("gen") == 2, F.col("n_nationkey"))).cast("bigint").alias("sum_key_gen2"),
        F.count(F.when(F.col("gen") == 2, F.col("upper_name"))).alias("n_upper"),
    )


# --- dynamic partition overwrite -------------------------------------

_DYNOVER_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(CAST(SUM(CAST(ROUND(
         (CASE WHEN o_orderpriority = '1-URGENT'
               THEN o_totalprice + 1000.0 ELSE o_totalprice END) * 100
       ) AS BIGINT)) AS BIGINT) / 100.0 AS DOUBLE) AS total_price
FROM orders
GROUP BY o_orderpriority
"""


@register("b_layout_dynamic_overwrite", oracle=_DYNOVER_ORACLE, tags=("layout", "write", "partition"))
def b_layout_dynamic_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C130: dynamic partition overwrite — the idempotent-backfill
    primitive: with partitionOverwriteMode=dynamic, an INSERT
    OVERWRITE of a partitioned table replaces ONLY the partitions the
    incoming batch touches and leaves every other partition's files
    untouched (static mode would truncate the whole table first).
    Here orders land partitioned by o_orderpriority, then a corrected
    batch (+1000.00 on every 1-URGENT order) overwrites just that
    partition; the read-back rollup proves the other four partitions
    survived byte-identical while 1-URGENT carries the correction —
    exactly the nightly-reprocess-one-day pattern a 100 TB
    date-partitioned lake runs, where rewriting the full table is a
    non-starter. Money totals use the cents convention
    (functions.exact)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    out = _scratch("dynover")
    o.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        patch = o.where(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "o_totalprice", F.col("o_totalprice") + 1000.0
        )
        patch.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    back = spark.read.parquet(out)
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        (F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")) / 100.0)
        .cast("double")
        .alias("total_price"),
    )


# --- deterministic training-shard writer -----------------------------

_N_SHARDS = 8

# shard = (first two md5 hex chars of the doc id) mod N — engine-
# portable (instr/strpos hex arithmetic, see pipeline/spans.py) and
# STABLE: re-running the writer years later yields byte-identical
# shard membership, unlike hash-partitioning by engine-internal hash.
_SHARD_EXPR = (
    "((({fn}('0123456789abcdef', substring(md5(CAST(doc_id AS {sty})), 1, 1)) - 1) * 16"
    " + ({fn}('0123456789abcdef', substring(md5(CAST(doc_id AS {sty})), 2, 1)) - 1)) % {n})"
)

_SHARD_ORACLE = f"""
WITH sharded AS (
  SELECT {_SHARD_EXPR.format(fn="strpos", sty="VARCHAR", n=_N_SHARDS)} AS shard,
         doc_id,
         len(string_split(text, ' ')) AS n_tokens,
         (strpos('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16
           + (strpos('0123456789abcdef', substring(md5(text), 2, 1)) - 1) AS fp
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(fp) AS BIGINT) AS content_checksum
FROM sharded GROUP BY shard
"""


@register("b_llm_shard_writer", oracle=_SHARD_ORACLE, tags=("pipeline", "write", "shards"))
def b_llm_shard_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C139: deterministic training-shard writer — every doc is
    assigned a shard by a content-stable md5 rule (NOT engine-hash
    partitioning: the assignment must be re-derivable across engines
    and years, the same argument as b_llm_stratified), written as
    shard-partitioned parquet, and the read-back census (doc count,
    token total, an order-independent md5-prefix checksum per shard)
    must reconstruct the source exactly — proving the lake round trip
    dropped and duplicated nothing. Scale shape: shard assignment is
    map-side; the write's repartition("shard") gives one task per
    shard writing sequentially (at 100 TB: repartition(shard, n) for
    parallelism within shards + maxRecordsPerFile for bounded file
    sizes — the knobs are on the same writer)."""
    d = load_table(spark, sf_dir, "documents")
    sharded = d.select(
        F.expr(_SHARD_EXPR.format(fn="instr", sty="STRING", n=_N_SHARDS)).alias("shard"),
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.expr(
            "(instr('0123456789abcdef', substring(md5(text), 1, 1)) - 1) * 16"
            " + (instr('0123456789abcdef', substring(md5(text), 2, 1)) - 1)"
        ).alias("fp"),
    )
    out = _scratch("shards")
    sharded.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(out)
    back = spark.read.parquet(out)
    return back.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("fp").alias("content_checksum"),
    )


# --- ANALYZE-style column statistics (C189) -------------------------------

# The stats-collection pass a cost-based optimizer runs (ANALYZE
# TABLE ... COMPUTE STATISTICS FOR COLUMNS): per-column null count,
# exact NDV, and min/max, emitted as one row per column.  Values
# serialize engine-identically: integers and exact cents as decimal
# strings, dates through TIMESTAMP (the documented DATE-stringify
# gotcha), plain strings verbatim.  One pass over the table computes
# every column's stats (a single global aggregate — no per-column
# re-scan).
_COLSTATS_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         CAST(CAST(o_orderdate AS TIMESTAMP) AS VARCHAR) AS o_orderdate_s,
         CAST(ROUND(100 * o_totalprice) AS BIGINT) AS o_totalprice_c
  FROM orders
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(COUNT(o_orderkey) AS BIGINT) AS nn1, CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS nd1,
         CAST(MIN(o_orderkey) AS VARCHAR) AS mn1, CAST(MAX(o_orderkey) AS VARCHAR) AS mx1,
         CAST(COUNT(o_custkey) AS BIGINT) AS nn2, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nd2,
         CAST(MIN(o_custkey) AS VARCHAR) AS mn2, CAST(MAX(o_custkey) AS VARCHAR) AS mx2,
         CAST(COUNT(o_orderstatus) AS BIGINT) AS nn3, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nd3,
         MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
         CAST(COUNT(o_orderpriority) AS BIGINT) AS nn4, CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nd4,
         MIN(o_orderpriority) AS mn4, MAX(o_orderpriority) AS mx4,
         CAST(COUNT(o_orderdate_s) AS BIGINT) AS nn5, CAST(COUNT(DISTINCT o_orderdate_s) AS BIGINT) AS nd5,
         MIN(o_orderdate_s) AS mn5, MAX(o_orderdate_s) AS mx5,
         CAST(COUNT(o_totalprice_c) AS BIGINT) AS nn6, CAST(COUNT(DISTINCT o_totalprice_c) AS BIGINT) AS nd6,
         CAST(MIN(o_totalprice_c) AS VARCHAR) AS mn6, CAST(MAX(o_totalprice_c) AS VARCHAR) AS mx6
  FROM base
)
SELECT col, n_rows, n_null, ndv, min_s, max_s FROM (
  SELECT 'o_orderkey' AS col, n_rows, n_rows - nn1 AS n_null, nd1 AS ndv, mn1 AS min_s, mx1 AS max_s FROM agg
  UNION ALL SELECT 'o_custkey', n_rows, n_rows - nn2, nd2, mn2, mx2 FROM agg
  UNION ALL SELECT 'o_orderstatus', n_rows, n_rows - nn3, nd3, mn3, mx3 FROM agg
  UNION ALL SELECT 'o_orderpriority', n_rows, n_rows - nn4, nd4, mn4, mx4 FROM agg
  UNION ALL SELECT 'o_orderdate', n_rows, n_rows - nn5, nd5, mn5, mx5 FROM agg
  UNION ALL SELECT 'o_totalprice_cents', n_rows, n_rows - nn6, nd6, mn6, mx6 FROM agg
)
"""


@register("b_layout_colstats", oracle=_COLSTATS_ORACLE, tags=("layout", "stats", "analyze"))
def b_layout_colstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C189: ANALYZE-style per-column statistics (null count, exact
    NDV, min/max) for the orders table in ONE scan — the stats pass
    a cost-based optimizer feeds on, and the operational data-profile
    report (b_quality_profile covers rule checks; this is the
    optimizer-stats contract).

    Scale shape: a single global aggregate computes every column's
    stats in one pass — 6 exact count-distincts share the scan (at
    extreme cardinality swap exact NDV for HLL, the b_agg_hll_merge
    path); the unpivot to rows touches one row.  Serialization: see
    _COLSTATS_ORACLE (integers/cents as decimal strings, dates via
    TIMESTAMP)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_orderdate").cast("timestamp").cast("string").alias("o_orderdate_s"),
        F.round(100 * F.col("o_totalprice")).cast("bigint").alias("o_totalprice_c"),
    )
    cols = [
        ("o_orderkey", "o_orderkey", True),
        ("o_custkey", "o_custkey", True),
        ("o_orderstatus", "o_orderstatus", False),
        ("o_orderpriority", "o_orderpriority", False),
        ("o_orderdate", "o_orderdate_s", False),
        ("o_totalprice_cents", "o_totalprice_c", True),
    ]
    aggs = [F.count("*").cast("bigint").alias("n_rows")]
    for i, (_, src, numeric) in enumerate(cols):
        aggs += [
            F.count(src).cast("bigint").alias(f"nn{i}"),
            F.countDistinct(src).cast("bigint").alias(f"nd{i}"),
            (F.min(src).cast("string") if numeric else F.min(src)).alias(f"mn{i}"),
            (F.max(src).cast("string") if numeric else F.max(src)).alias(f"mx{i}"),
        ]
    agg = base.agg(*aggs)
    stack_args = []
    for i, (name, _, _) in enumerate(cols):
        stack_args.append(f"'{name}'")
        stack_args.append(f"n_rows - nn{i}")
        stack_args.append(f"nd{i}")
        stack_args.append(f"mn{i}")
        stack_args.append(f"mx{i}")
    return agg.select(
        F.expr(
            f"stack({len(cols)}, "
            + ", ".join(stack_args)
            + ") as (col, n_null, ndv, min_s, max_s)"
        ),
        "n_rows",
    ).select(
        "col",
        "n_rows",
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("ndv").cast("bigint").alias("ndv"),
        "min_s",
        "max_s",
    )


# --- XML source round trip (C241) -----------------------------------------------------

# Spark 4 absorbed spark-xml as a NATIVE datasource; config-heavy
# enterprise feeds still arrive as XML, so the engine's source matrix
# needs the round trip proven, not assumed.  The oracle runs on the
# ORIGINAL table — the contract is that writing XML and reading it
# back is lossless for the aggregate.
_XML_ORACLE = """
SELECT n_regionkey,
       COUNT(*) AS n_nations,
       CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
       MIN(n_name) AS first_name
FROM nation
GROUP BY n_regionkey ORDER BY n_regionkey
"""


@register("b_read_xml", oracle=_XML_ORACLE, tags=("sources", "xml"))
def b_read_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C241: XML round trip through Spark 4's native xml datasource
    (the absorbed spark-xml): write the nation dimension as
    <nations><nation>…</nation></nations>, read it back with an
    explicit rowTag, and aggregate — the oracle runs on the original
    table, so any loss or type drift in the XML round trip fails the
    hash.

    Scale shape: dimension-sized by design (XML is a config/feed
    format, not a fact format — the docstring IS the advice: land
    facts as parquet); the read is schema-inferred here to exercise
    inference, with the aggregate casting back to exact types."""
    n = load_table(spark, sf_dir, "nation")
    out = _scratch("xml_rt")
    n.write.format("xml").option("rootTag", "nations").option(
        "rowTag", "nation"
    ).mode("overwrite").save(out)
    back = spark.read.format("xml").option("rowTag", "nation").load(out)
    return (
        back.groupBy(F.col("n_regionkey").cast("bigint").alias("n_regionkey"))
        .agg(
            F.count("*").alias("n_nations"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
            F.min("n_name").alias("first_name"),
        )
    )


# --- binaryFile lake ingest (C242) -----------------------------------------------------

# The REAL first mile of a multimodal lake: opaque media files on
# disk → Spark's binaryFile source (path, length, content) → route by
# magic bytes.  C239 sniffs an in-plan binary column; this key proves
# the SOURCE — files land individually on storage and the engine
# discovers, reads, and classifies them.
_BINARYFILE_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(text), 1, 2)) AS INT) AS b0,
         CAST(concat('0x', substring(md5(text), 3, 2)) AS INT) AS b1,
         CAST(concat('0x', substring(md5(text), 11, 2)) AS INT) AS b5
  FROM documents WHERE doc_id < 100
),
sized AS (
  SELECT doc_id,
         CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'wav'
                         WHEN 2 THEN 'y4m' ELSE 'unknown' END AS kind,
         CASE doc_id % 4
           WHEN 0 THEN 54 + ((3 * (1 + b0 % 16) + 3) // 4) * 4 * (1 + b1 % 16)
           WHEN 1 THEN 44 + 2 * (32 + (b5 % 32) * 2)
           WHEN 2 THEN 71
           ELSE 16 END AS n_bytes
  FROM m
)
SELECT kind, COUNT(*) AS n_files,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
FROM sized GROUP BY kind ORDER BY kind
"""


@register("b_source_binaryfile", oracle=_BINARYFILE_ORACLE, tags=("sources", "binary", "multimodal"))
def b_source_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C242: binaryFile-source lake ingest — land the first 100 docs'
    mixed containers (C239's real BMP/WAV/Y4M/raw encoders) as
    INDIVIDUAL files, then discover and classify them with Spark's
    binaryFile datasource (path, length, content columns).  The
    length column comes from the FILESYSTEM and the magic bytes from
    the CONTENT read, so the key proves the source delivers both
    faithfully; the oracle predicts every size arithmetically.

    Scale shape: binaryFile parallelizes over files (one task per
    file up to maxPartitionBytes packing); the classify expressions
    are the JVM-native C239 sniff; 4-row rollup out.  At 100 TB this
    is the ingest pattern for media crawls — pair with
    spark.sql.files.maxPartitionBytes and openCostInBytes for
    small-file packing (the C68 compaction key's lesson)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    from stellarsql_spark.pipeline.multimodal import _mixed_encode_batch

    out = _scratch("binfiles")
    blobs = d.select("doc_id", F.unhex(F.md5("text")).alias("payload")).mapInPandas(
        _mixed_encode_batch, schema="doc_id bigint, blob binary"
    )
    for r in blobs.collect():  # 100 dimension-sized fixture files
        with open(os.path.join(out, f"doc_{r.doc_id}.bin"), "wb") as f:
            f.write(bytes(r.blob))
    src = spark.read.format("binaryFile").load(out)
    magic2 = F.hex(F.substring(F.col("content"), 1, 2))
    magic4 = F.hex(F.substring(F.col("content"), 1, 4))
    magic9 = F.hex(F.substring(F.col("content"), 1, 9))
    kind = (
        F.when(magic2 == F.lit("424D"), "bmp")
        .when(magic4 == F.lit("52494646"), "wav")
        .when(magic9 == F.lit("595556344D50454732"), "y4m")
        .otherwise("unknown")
    )
    return (
        src.select(kind.alias("kind"), F.col("length").alias("n_bytes"))
        .groupBy("kind")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        )
    )


# --- Zone-map audit: footer stats vs logical truth (C246) -------------------------------

# Trust-but-verify for the pruning stack: partition pruning, row-group
# skipping and min/max zone maps all believe the parquet FOOTER — this
# key writes a key-bucketed layout, reads the footers back with
# pyarrow IN EXECUTORS, and hash-compares the footer-derived
# (rows, min, max) per bucket against the logical truth computed from
# the table.  A writer that mis-stats a column (the bug class that
# silently breaks pruning) fails the hash.
_ZONEMAP_ORACLE = """
WITH w AS (SELECT (MAX(o_orderkey) // 4) + 1 AS w FROM orders)
SELECT CAST(o_orderkey // (SELECT w FROM w) AS BIGINT) AS kb,
       COUNT(*) AS n_rows,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_k,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_k
FROM orders GROUP BY 1 ORDER BY 1
"""


@register("b_layout_zonemap_audit", oracle=_ZONEMAP_ORACLE, tags=("layout", "zonemap", "audit"))
def b_layout_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C246: zone-map audit — write orders key-bucketed into four hive
    dirs, then read ONLY THE FOOTERS back (pyarrow metadata, executed
    distributed in mapInPandas over the file list — row data is never
    re-read) and emit per-bucket (rows, min, max) from row-group
    statistics.  The oracle computes the same numbers logically from
    the table, so the key certifies that footer stats faithfully
    describe written data — the property every pruning optimization
    (C40 partition pruning, C72 sorted scan, C100 parquet bloom)
    silently relies on.

    Scale shape: the write is one bucket-keyed shuffle; the audit
    reads O(files) footers, never data bytes — at 100 TB this audit
    costs megabytes."""
    import glob as _glob

    o = load_table(spark, sf_dir, "orders")
    w_row = o.agg((F.floor(F.max("o_orderkey") / 4) + 1).alias("w")).collect()[0]
    width = int(w_row.w)
    out = _scratch("zonemap")
    (
        o.select("o_orderkey", F.expr(f"o_orderkey div {width}").alias("kb"))
        .repartition("kb")
        .write.mode("overwrite")
        .partitionBy("kb")
        .parquet(out)
    )
    files = [
        (int(p.split("kb=")[1].split("/")[0]), p)
        for p in _glob.glob(os.path.join(out, "kb=*", "*.parquet"))
    ]
    fdf = spark.createDataFrame(files, "kb bigint, path string")

    def read_footers(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            rows = []
            for kb, path in zip(pdf["kb"], pdf["path"]):
                md = pq.ParquetFile(path).metadata
                idx = md.schema.names.index("o_orderkey")
                n = md.num_rows
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    mins.append(st.min)
                    maxs.append(st.max)
                rows.append((kb, n, min(mins), max(maxs)))
            yield pd.DataFrame(
                rows, columns=["kb", "n_rows", "min_k", "max_k"]
            )

    footer = fdf.mapInPandas(
        read_footers, schema="kb bigint, n_rows bigint, min_k bigint, max_k bigint"
    )
    return footer.groupBy("kb").agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        F.min("min_k").cast("bigint").alias("min_k"),
        F.max("max_k").cast("bigint").alias("max_k"),
    )
