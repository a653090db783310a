"""Corpus-drift armor (VERDICT r3 §next-round #3).

The driver regenerated the test corpus between rounds 2 and 3,
changing `events.ts` from parquet TIMESTAMP(NANOS) to timestamp[us]
NTZ — which silently broke every `unix_micros` call site and
compressed streaming event time 1000×. These tests encode the
normalization contract so the NEXT regeneration fails loudly in-repo
instead of at the driver:

  * on every sf dir, `load_table(events).ts` is µs-precision
    TimestampType (LTZ) — never NTZ, never a raw long;
  * `unix_micros(ts)` resolves and yields plausible 2024-era epochs;
  * the streaming source sees byte-identical event time to the batch
    path (min/max/count agree).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stellarsql_spark.catalog import load_table

ALL_SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "events.parquet"))
]

# Sanity band for `unix_micros(ts)`: the corpus is generated around
# 2024; anything outside [2000-01-01, 2100-01-01) means a unit error
# (ns misread as µs lands in year ~48000; µs÷1000 lands in 1970).
_EPOCH_US_LO = 946_684_800_000_000  # 2000-01-01
_EPOCH_US_HI = 4_102_444_800_000_000  # 2100-01-01


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_events_ts_is_ltz_timestamp(spark, sf):
    df = load_table(spark, sf, "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType), (
        f"{sf}: events.ts must normalize to TimestampType (LTZ), got "
        f"{df.schema['ts'].dataType} — corpus encoding drifted; update "
        "catalog._read_table's normalization"
    )


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_events_ts_epoch_in_sane_band(spark, sf):
    row = (
        load_table(spark, sf, "events")
        .agg(
            F.min(F.unix_micros("ts")).alias("lo"),
            F.max(F.unix_micros("ts")).alias("hi"),
        )
        .first()
    )
    assert _EPOCH_US_LO <= row["lo"] <= row["hi"] < _EPOCH_US_HI, (
        f"{sf}: unix_micros(ts) ∈ [{row['lo']}, {row['hi']}] is outside "
        "the 2000-2100 band — a unit error (ns↔µs) in ts normalization"
    )


def test_stream_event_time_matches_batch(spark, sf_dir):
    """The streaming source must see the SAME event time as the batch
    path — this is exactly the invariant the round-3 corpus
    regeneration broke (µs read as ns ÷ 1000 → 1970 timestamps)."""
    from stellarsql_spark.streaming.runtime import events_stream, run_to_memory

    batch = load_table(spark, sf_dir, "events").agg(
        F.count("*").alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    )
    streamed = run_to_memory(
        events_stream(spark, sf_dir), output_mode="append"
    ).agg(
        F.count("*").alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    )
    assert batch.first().asDict() == streamed.first().asDict()


def test_stream_stream_join_row_count_pinned(spark):
    """VERDICT r3 #2: pin the stream-stream join to its batch
    equivalent so a corpus/time regression fails here, not at the
    driver. At sf0.001 the click⋈purchase-within-1h join has a small,
    corpus-determined row count that must equal the batch interval
    join exactly."""
    from tests.conftest import SF_SMALL
    from stellarsql_spark.streaming.parity import b_stream_stream_join

    ev = load_table(spark, SF_SMALL, "events")
    clicks = ev.where(F.col("event_type") == "click").select("user_id", F.col("ts").alias("cts"))
    purch = ev.where(F.col("event_type") == "purchase").select("user_id", F.col("ts").alias("pts"))
    batch_n = clicks.join(
        purch,
        (clicks.user_id == purch.user_id)
        & (purch.pts > clicks.cts)
        & (purch.pts <= clicks.cts + F.expr("INTERVAL 1 HOUR")),
    ).count()
    stream_n = b_stream_stream_join(spark, SF_SMALL).count()
    assert stream_n == batch_n > 0


# Full-corpus schema pin — the drift alarm generalized beyond
# events.ts: the driver has regenerated the corpus mid-project with a
# changed physical encoding once already, so every table's normalized
# (post-load_table) schema is pinned at every SF. A regeneration that
# changes any column's type fails here with a readable diff instead
# of as a cryptic AnalysisException inside some operator.
EXPECTED_SCHEMAS = {
    "region": "r_regionkey:int, r_name:string",
    "nation": "n_nationkey:int, n_name:string, n_regionkey:int",
    "customer": "c_custkey:bigint, c_name:string, c_nationkey:int, c_acctbal:double, c_mktsegment:string",
    "supplier": "s_suppkey:bigint, s_name:string, s_nationkey:int, s_acctbal:double",
    "part": "p_partkey:bigint, p_name:string, p_brand:string, p_type:string, p_size:int, p_retailprice:double",
    "orders": "o_orderkey:bigint, o_custkey:bigint, o_orderstatus:string, o_totalprice:double, o_orderdate:timestamp_ntz, o_orderpriority:string",
    "lineitem": "l_orderkey:bigint, l_partkey:bigint, l_suppkey:bigint, l_linenumber:int, l_quantity:double, l_extendedprice:double, l_discount:double, l_tax:double, l_returnflag:string, l_linestatus:string, l_shipdate:timestamp_ntz",
    # ts is NORMALIZED to LTZ by load_table regardless of the file's
    # physical encoding (ns longs or us NTZ) — that is the contract.
    "events": "event_id:bigint, ts:timestamp, user_id:bigint, event_type:string, value:double, props:string",
    "documents": "doc_id:bigint, text:string, lang:string, source:string, n_chars:bigint",
    "embeddings": "vec_id:bigint, embedding:array<float>, label:int",
}


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_all_table_schemas_pinned(spark, sf):
    from stellarsql_spark.catalog import TABLES, load_table

    got = {
        t: ", ".join(
            f"{f.name}:{f.dataType.simpleString()}"
            for f in load_table(spark, sf, t).schema.fields
        )
        for t in TABLES
    }
    assert got == EXPECTED_SCHEMAS
