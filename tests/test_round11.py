"""Round-11 tests: the r10 ADVICE hardenings (plan-audit build-fail
counting, prefix duplicate-name guard, directory-corpus fingerprints)
and this round's new surface."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


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
