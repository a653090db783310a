"""Round-4 component tests: the MinHash-LSH recall contract.
The full-value correctness gate is tools/check_oracle.py; these pin
the algorithmic invariants the oracle compare can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestMinhashRecall:
    def test_recall_flags_true_on_corpus(self, spark):
        """Every jaccard band >= 0.8 present in the corpus must be
        recovered at >= 80% by the banded candidate path (measured
        1.0 at sf0.001/0.01/0.1)."""
        from stellarsql_spark.pipeline.dedup import b_llm_minhash_recall

        rows = b_llm_minhash_recall(spark, SF).collect()
        assert rows, "corpus has no >=0.8-jaccard truth pairs?"
        assert all(r.recall_ge_08 for r in rows)
        assert all(r.jac_band >= 0.8 for r in rows)

    def test_truth_counts_match_exact_jaccard(self, spark):
        """n_truth per band is exactly the band histogram of the
        hash-oracle-verified exact Jaccard pairs — the contract key
        introduces no second definition of truth."""
        from stellarsql_spark.pipeline.dedup import (
            MINHASH_RECALL_BAND,
            b_llm_jaccard,
            b_llm_minhash_recall,
        )

        exact = (
            b_llm_jaccard(spark, SF)
            .where(F.col("jaccard") >= MINHASH_RECALL_BAND)
            .select((F.floor(F.col("jaccard") * 10) / 10).alias("jac_band"))
            .groupBy("jac_band")
            .count()
        )
        expected = {r.jac_band: r["count"] for r in exact.collect()}
        got = {
            r.jac_band: r.n_truth
            for r in b_llm_minhash_recall(spark, SF).collect()
        }
        assert got == expected

    def test_found_pairs_are_truth_subset(self, spark):
        """b_llm_dedup_near verifies candidates with exact Jaccard, so
        its output must be a subset of the exact pair set — LSH can
        lose pairs, never invent them."""
        from stellarsql_spark.pipeline.dedup import b_llm_dedup_near, b_llm_jaccard

        truth = {
            (r.doc1, r.doc2) for r in b_llm_jaccard(spark, SF).collect()
        }
        found = {
            (r.doc1, r.doc2) for r in b_llm_dedup_near(spark, SF).collect()
        }
        assert found <= truth
