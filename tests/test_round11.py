"""Round-11 tests: the r10 ADVICE hardenings (plan-audit build-fail
counting, prefix duplicate-name guard, directory-corpus fingerprints)
and this round's new surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestRestartRecovery:
    def test_kill_after_two_batches_then_recover(self, spark):
        """C264: the offset log must show exactly 2 committed batches at
        the kill point and 4 after the restarted query drains — i.e. the
        restart resumed from the checkpoint instead of replaying — and
        the final sink must equal the batch aggregate."""
        import os

        from stellarsql_spark.streaming.parity import b_stream_restart_recovery

        seen = {}

        def probe(phase, ckpt):
            commits = [
                n
                for n in os.listdir(os.path.join(ckpt, "commits"))
                if not n.startswith(".")
            ]
            seen[phase] = sorted(commits)

        out = b_stream_restart_recovery(spark, SF, _probe=probe)
        got = sorted(tuple(r) for r in out.collect())

        assert seen[1] == ["0", "1"], seen  # killed after batch 2
        assert seen[2] == ["0", "1", "2", "3"], seen  # resumed, not replayed

        from stellarsql_spark.catalog import load_table

        ev = load_table(spark, SF, "events")
        want = sorted(
            tuple(r)
            for r in ev.groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double")
                .alias("total_value"),
            )
            .collect()
        )
        assert got == want


class TestSkewChooser:
    """r10 VERDICT #7: the exact audit (C261) drives the documented
    join-strategy decision table."""

    def test_zipfian_hot_head_picks_bypass(self, spark, tmp_path):
        """A corpus where one key owns ~88% of the rows: the audit's
        verdict must be the broadcast hot-lane bypass."""
        import numpy as np
        import pandas as pd

        from stellarsql_spark.operators.quality import b_quality_keyskew
        from stellarsql_spark.operators.skew import choose_join_strategy

        keys = np.concatenate(
            [
                np.zeros(30_000, dtype=np.int64),
                np.repeat(np.arange(1, 200, dtype=np.int64), 20),
            ]
        )
        pd.DataFrame(
            {"l_orderkey": keys, "l_extendedprice": np.ones(len(keys))}
        ).to_parquet(os.path.join(tmp_path, "lineitem.parquet"))
        row = b_quality_keyskew(spark, str(tmp_path)).first()
        assert choose_join_strategy(row) == "bypass"

    def test_uniform_corpus_picks_plain(self, spark):
        """The driver corpus's l_orderkey is near-uniform (≤7 rows per
        key): no mitigation — plain join, per the measured negatives."""
        from stellarsql_spark.operators.quality import b_quality_keyskew
        from stellarsql_spark.operators.skew import choose_join_strategy

        row = b_quality_keyskew(spark, SF).first()
        assert choose_join_strategy(row) == "plain"

    def test_heavy_tail_picks_aqe_split(self):
        """One key at 15% (over the 4×-fair-share bar at 32 partitions)
        but top-8 under 25%: too big for plain, too diffuse to
        enumerate — AQE's runtime partition split."""
        from stellarsql_spark.operators.skew import choose_join_strategy

        row = {
            "n_rows": 100_000,
            "max_n": 15_000,
            "top8_share_m": 150_700,
        }
        assert choose_join_strategy(row) == "aqe_split"


class TestAdviceHardenings:
    def test_prefix_rejects_duplicate_requested_names(self, spark):
        """Duplicates AMONG the requested output names (sums key ==
        row_number_as, etc.) must raise, not collapse in a set and emit
        an ambiguous duplicate column (r10 ADVICE)."""
        from stellarsql_spark.functions.prefix import ordered_running

        df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("v"))
        with pytest.raises(ValueError, match="duplicate"):
            ordered_running(
                df, [F.col("id")], {"rs": F.col("v")}, row_number_as="rs"
            )
        with pytest.raises(ValueError, match="duplicate"):
            ordered_running(
                df,
                [F.col("id")],
                {"s": F.col("v")},
                row_number_as="n",
                total_count_as="n",
            )

    def test_plan_audit_counts_build_failures(self, spark, monkeypatch, capsys):
        """A registered key whose builder raises at plan-build time must
        fail the audit (exit 1), not be silently SKIPped (r10 ADVICE,
        medium)."""
        import tools.plan_audit as pa

        class _BoomSpec:
            def builder(self, spark, sf_dir):
                raise RuntimeError("synthetic build failure")

        monkeypatch.setattr(pa, "all_specs", lambda: {"zz_boom": _BoomSpec()})
        monkeypatch.setattr(
            "sys.argv", ["plan_audit.py", "--sf", SF, "zz_boom"]
        )
        assert pa.main() == 1
        out = capsys.readouterr().out
        assert "BUILD-FAIL" in out and "zz_boom" in out

    def test_content_fingerprint_file_format_is_stable(self, tmp_path):
        """For a plain file the fingerprint must keep the historical
        `path:size:mtime_ns` format — derived-layout caches key on it,
        and a format change would force full rebuilds."""
        from stellarsql_spark.catalog import content_fingerprint

        p = tmp_path / "t.parquet"
        p.write_bytes(b"x" * 10)
        st = os.stat(p)
        assert content_fingerprint(str(p)) == f"{p}:{st.st_size}:{st.st_mtime_ns}"

    def test_prefix_reliable_checkpoint_matches_local(self, spark):
        """reliable=True (cluster-FS checkpoint, survives executor
        loss) must produce bit-identical prefixes to the local path and
        still cut the lineage (r10 VERDICT #6)."""
        from stellarsql_spark.functions.prefix import ordered_running

        df = spark.range(500).select(
            F.col("id"), ((F.col("id") * 37) % 101 - 50).alias("v")
        )
        kw = dict(
            order=[F.col("v"), F.col("id")],
            sums={"rs": F.col("v")},
            row_number_as="rn",
        )
        rel = ordered_running(df, **kw, reliable=True)
        loc = ordered_running(df, **kw)
        got = sorted(tuple(r) for r in rel.collect())
        want = sorted(tuple(r) for r in loc.collect())
        assert got == want
        plan = rel._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan or "Scan ExistingRDD" in plan
        # the checkpoint dir really is set (reliable, not local)
        assert not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()

    def test_content_fingerprint_sees_inplace_dir_rewrite(self, tmp_path):
        """For a directory corpus, rewriting a same-named member file
        in place must change the fingerprint even when the directory
        inode's own size/mtime is restored (r10 ADVICE)."""
        from stellarsql_spark.catalog import content_fingerprint

        d = tmp_path / "events.parquet"
        d.mkdir()
        f = d / "part-00000.parquet"
        f.write_bytes(b"a" * 100)
        os.utime(f, ns=(1_000_000_000, 1_000_000_000))
        os.utime(d, ns=(1_000_000_000, 1_000_000_000))
        fp1 = content_fingerprint(str(d))
        # in-place rewrite: same name, same size, new mtime; pin the
        # DIRECTORY times back so only the member file differs
        f.write_bytes(b"b" * 100)
        os.utime(f, ns=(2_000_000_000, 2_000_000_000))
        os.utime(d, ns=(1_000_000_000, 1_000_000_000))
        fp2 = content_fingerprint(str(d))
        assert fp1 != fp2
        # _SUCCESS / dotfiles are not data and must not perturb it
        (d / "_SUCCESS").write_bytes(b"")
        assert content_fingerprint(str(d)) == fp2
