"""Round-9 component tests.

1. The served join lineage (C254): plain == bucketed == served, and
   the served plan touches only the 25-row rollup artifacts.
2. The hot-key bypass skew join (C255): on a synthetic corpus whose
   hot key is large enough for the sampled detector, the bypass plan
   broadcasts the hot build rows and still matches the plain join
   row for row.
3. Adversarial ingest gates for the two r8 surfaces the fuzz didn't
   cover (r8 VERDICT next-round #7): the schema-inferring XML reader
   (entity bombs, malformed tags, truncation → deterministic
   quarantine, no expansion) and the binaryFile source
   (empty/truncated/lying-header payloads → deterministic routing,
   filesystem-true sizes).  Same contract class as
   tests/test_round8c.py's codec fuzz.
"""

from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


class TestJoinServed:
    def test_three_forms_agree_and_query_is_tiny(self, spark):
        """plain == bucketed == served, row for row; and the served
        plan reads the maintained rollup + name dim, never the raw
        fact/dim parquet."""
        from stellarsql_spark.operators.joins import b_join_inner
        from stellarsql_spark.sources.bucketed import (
            b_join_inner_bucketed,
            b_join_inner_served,
        )

        key = lambda r: (r.r_name, r.n_name)
        as_t = lambda rows: [
            (r.r_name, r.n_name, r.n_orders, round(r.revenue, 2)) for r in rows
        ]
        plain = sorted(b_join_inner(spark, SF).collect(), key=key)
        bucketed = sorted(b_join_inner_bucketed(spark, SF).collect(), key=key)
        served = sorted(b_join_inner_served(spark, SF).collect(), key=key)
        assert as_t(plain) == as_t(bucketed) == as_t(served)
        assert len(served) == 25

        df = b_join_inner_served(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "join_nation_rollup_" in plan and "nation_names_" in plan
        for raw in ("orders.parquet", "customer.parquet",
                    "nation.parquet", "region.parquet"):
            assert raw not in plan

    def test_rollup_artifacts_are_nation_sized(self, spark):
        """The served artifacts really are 25-row tables (the whole
        point: O(nations) at query time), and the custkey pre-agg
        exists as the delta-maintainable intermediate."""
        from stellarsql_spark.sources.bucketed import ensure_join_rollup

        rollup_dir, names_dir = ensure_join_rollup(spark, SF)
        assert spark.read.parquet(rollup_dir).count() == 25
        assert spark.read.parquet(names_dir).count() == 25
        preagg_dir = rollup_dir.replace("join_nation_rollup_", "join_ck_preagg_")
        pre = spark.read.parquet(preagg_dir)
        assert set(pre.columns) == {"o_custkey", "n_orders_p", "rev_p"}
        # conservation: the pre-agg re-aggregates to the same totals
        from pyspark.sql import functions as F

        tot_pre = pre.agg(F.sum("n_orders_p"), F.sum("rev_p")).collect()[0]
        tot_roll = (
            spark.read.parquet(rollup_dir)
            .agg(F.sum("n_orders"), F.sum("rev_cts"))
            .collect()[0]
        )
        assert tuple(tot_pre) == tuple(tot_roll)


class TestSkewBypass:
    @pytest.fixture(scope="class")
    def skewed_dir(self, tmp_path_factory):
        """A mini corpus with one genuinely hot key: orderkey 0 holds
        30k of ~34k lineitem rows, so the 2% sampled count (~600) is
        far above the detector's 50-row bar."""
        import numpy as np
        import pandas as pd

        d = tmp_path_factory.mktemp("skewmini")
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
        """Detection finds the hot key, the executed plan contains the
        hot lane's BroadcastHashJoin, and the result equals the plain
        shuffle join exactly."""
        from pyspark.sql import functions as F

        from stellarsql_spark.catalog import load_table
        from stellarsql_spark.operators.skew import b_join_skew_bypass

        df = b_join_skew_bypass(spark, skewed_dir)
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
        # the hot status bucket really carries the hot key's 30k rows
        hot_status = {r.o_orderstatus: r.n_items for r in rows}
        assert hot_status["F"] >= 30_000  # orderkey 0 -> status 'F'

    def test_uniform_corpus_degenerates_to_plain_join(self, spark):
        """On the uniform tiny corpus no hot key clears the sampled
        bar, so the bypass is exactly the plain join (no broadcast
        lane, no union)."""
        from stellarsql_spark.operators.skew import b_join_skew_bypass

        df = b_join_skew_bypass(spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan


_XML_SCHEMA = "k BIGINT, v STRING, _corrupt_record STRING"


class TestXMLAdversarial:
    """Hostile-input gates for the schema-inferring XML surface
    b_read_xml exercises (sources/io.py).  Explicit schema pins the
    quarantine column; assertions pin the behaviors probed on this
    Spark build (Woodstox with DTD processing disabled)."""

    def _read(self, spark, d):
        return (
            spark.read.format("xml")
            .schema(_XML_SCHEMA)
            .option("rowTag", "row")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .load(str(d))
        )

    def test_entity_bomb_never_expands(self, spark, tmp_path):
        """A DOCTYPE entity chain (billion-laughs head) must NOT
        expand: the parser refuses undeclared entities (DTDs are not
        processed), the hostile file quarantines deterministically,
        and a clean sibling file still parses."""
        (tmp_path / "evil.xml").write_text(
            '<?xml version="1.0"?>\n'
            "<!DOCTYPE lolz [\n"
            ' <!ENTITY lol "lol">\n'
            ' <!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">\n'
            ' <!ENTITY lol3 "&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;">\n'
            "]>\n"
            "<rows><row><k>1</k><v>&lol3;</v></row>"
            "<row><k>2</k><v>ok</v></row></rows>"
        )
        (tmp_path / "clean.xml").write_text(
            "<rows><row><k>10</k><v>alpha</v></row>"
            "<row><k>11</k><v>beta</v></row></rows>"
        )
        rows = self._read(spark, tmp_path).collect()
        good = {r.k: r.v for r in rows if r._corrupt_record is None}
        bad = [r for r in rows if r._corrupt_record is not None]
        # the entity-bearing row quarantines (its k parses, its v does
        # not); every other row in both files survives untouched
        assert good == {2: "ok", 10: "alpha", 11: "beta"}
        assert len(bad) == 1 and bad[0].v is None
        for r in rows:  # the expansion itself never happened anywhere
            assert r.v is None or "lollol" not in r.v
            assert r._corrupt_record is None or "lollol" not in r._corrupt_record

    def test_malformed_tail_quarantines_prefix_survives(self, spark, tmp_path):
        """Rows before a malformation parse; the malformed remainder
        of the document lands in ONE corrupt record (the pinned
        quarantine unit for a rowTag stream)."""
        (tmp_path / "bad.xml").write_text(
            "<rows><row><k>1</k><v>good</v></row>"
            "<row><k>oops<v>unclosed</row>"
            "<row><k>3</k><v>fine</v></row></rows>"
        )
        rows = self._read(spark, tmp_path).collect()
        good = {r.k: r.v for r in rows if r._corrupt_record is None}
        bad = [r for r in rows if r._corrupt_record is not None]
        assert good == {1: "good"}
        assert len(bad) == 1

    def test_truncated_file_is_one_corrupt_record(self, spark, tmp_path):
        (tmp_path / "trunc.xml").write_text("<rows><row><k>1</k><v>go")
        rows = self._read(spark, tmp_path).collect()
        assert len(rows) == 1
        assert rows[0]._corrupt_record is not None
        assert rows[0].k is None


class TestBinaryFileAdversarial:
    """Hostile-payload gates for the binaryFile lake-ingest surface
    (b_source_binaryfile): truncated magic, lying container headers,
    empty files.  The source must deliver filesystem-true lengths and
    the magic-prefix router must classify deterministically — a
    truncated container still ROUTES by its magic (the downstream
    decode gates own the quarantine, the C239/C195 layering)."""

    @pytest.fixture(scope="class")
    def hostile_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("hostile_bins")
        files = {
            "empty.bin": b"",
            "one_byte.bin": b"B",
            "bmp_magic_only.bin": b"BM",
            # RIFF/WAVE header CLAIMING 2 GiB of data after 12 bytes
            "wav_lying_size.bin": b"RIFF" + (2**31 - 1).to_bytes(4, "little") + b"WAVE",
            # y4m magic truncated one byte short of the full signature
            "y4m_partial.bin": b"YUV4MPEG",
            "unknown.bin": b"\x00" * 16,
        }
        for name, blob in files.items():
            (d / name).write_bytes(blob)
        return str(d), {n: len(b) for n, b in files.items()}

    def test_routing_and_filesystem_truth(self, spark, hostile_dir):
        from pyspark.sql import functions as F

        d, sizes = hostile_dir
        src = spark.read.format("binaryFile").load(d)
        magic2 = F.hex(F.substring(F.col("content"), 1, 2))
        magic4 = F.hex(F.substring(F.col("content"), 1, 4))
        magic9 = F.hex(F.substring(F.col("content"), 1, 9))
        kind = (
            F.when(magic2 == F.lit("424D"), "bmp")
            .when(magic4 == F.lit("52494646"), "wav")
            .when(magic9 == F.lit("595556344D50454732"), "y4m")
            .otherwise("unknown")
        )
        rows = src.select(
            F.element_at(F.split("path", "/"), -1).alias("name"),
            kind.alias("kind"),
            F.col("length").alias("n_bytes"),
        ).collect()
        got = {r.name: (r.kind, r.n_bytes) for r in rows}
        # PINNED source behavior: binaryFile silently drops
        # zero-length files (a listing-level filter, found by this
        # gate) — an ingest audit must therefore count manifests
        # against the listing, not trust the source for 0-byte
        # objects. Every non-empty file arrives with its
        # filesystem-true length, never a lying header's claim.
        assert "empty.bin" not in got
        assert {n: s for n, (_, s) in got.items()} == {
            n: s for n, s in sizes.items() if s > 0
        }
        assert got["one_byte.bin"][0] == "unknown"
        assert got["bmp_magic_only.bin"][0] == "bmp"  # routes; decode gates own it
        assert got["wav_lying_size.bin"][0] == "wav"
        assert got["wav_lying_size.bin"][1] == 12  # NOT the claimed 2 GiB
        assert got["y4m_partial.bin"][0] == "unknown"  # 8 of 9 magic bytes
        assert got["unknown.bin"][0] == "unknown"

    def test_truncated_bmp_quarantines_downstream(self, spark, hostile_dir):
        """The layered contract end-to-end: a magic-routed truncated
        BMP reaching the real decoder must land a -1 quarantine row,
        never crash the task or fabricate pixels."""
        d, _ = hostile_dir
        from stellarsql_spark.pipeline.multimodal import (
            DECODE_SCHEMA,
            decode_image_batch,
        )

        src = (
            spark.read.format("binaryFile")
            .load(d)
            .selectExpr("CAST(1 AS BIGINT) AS doc_id", "content AS img")
            .where("hex(substring(img, 1, 2)) = '424D'")
        )
        out = src.mapInPandas(decode_image_batch, schema=DECODE_SCHEMA).collect()
        assert len(out) == 1
        assert (out[0].width, out[0].height) == (-1, -1)
