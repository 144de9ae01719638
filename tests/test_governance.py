"""Unit tests for operators/governance.py — k-anonymity, canary
census, template novelty, and tombstone (right-to-erasure) delete."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators.governance import (
    canary_extract,
    k_anonymity,
    template_novelty,
    tombstone_delete,
)


class TestKAnonymity:
    def test_boundary_at_k(self, spark):
        rows = [("a", "x")] * 5 + [("a", "y")] * 4 + [("b", "x")] * 1
        df = spark.createDataFrame(rows, "r string, t string")
        got = {
            (x["r"], x["t"]): (x["n"], x["at_risk"])
            for x in k_anonymity(df, qi_cols=("r", "t"), k=5).collect()
        }
        assert got == {
            ("a", "x"): (5, False),  # exactly k is safe
            ("a", "y"): (4, True),
            ("b", "x"): (1, True),
        }

    def test_rejects_bad_k(self, spark):
        df = spark.createDataFrame([("a",)], "r string")
        with pytest.raises(ValueError):
            k_anonymity(df, qi_cols=("r",), k=0)


class TestCanaryExtract:
    def test_counts_groups_and_hits(self, spark):
        df = spark.createDataFrame(
            [
                ("c1", "x CANARY-00000000 y CANARY-00000000"),  # 2 hits 1 conv
                ("c2", "z CANARY-00000000"),
                ("c2", "plain text"),
                ("c3", "CANARY-deadbeef"),
            ],
            "conv_id string, text string",
        )
        got = {
            r["canary"]: (r["n_groups"], r["n_hits"])
            for r in canary_extract(df).collect()
        }
        assert got == {
            "CANARY-00000000": (2, 3),
            "CANARY-deadbeef": (1, 1),
        }

    def test_no_matches_empty(self, spark):
        df = spark.createDataFrame([("c1", "clean")], "conv_id string, text string")
        assert canary_extract(df).count() == 0


class TestTemplateNovelty:
    def test_day_one_all_new_then_decay(self, spark):
        rows = [
            (1, "A"), (1, "B"),        # day 1: A,B new
            (2, "A"), (2, "C"),        # day 2: C new of 2 active
            (3, "A"), (3, "B"), (3, "C"),  # day 3: nothing new
        ]
        df = spark.createDataFrame(rows, "day int, template string")
        got = {
            r["day"]: (r["n_active"], r["n_new"], r["new_ppm"])
            for r in template_novelty(df).collect()
        }
        assert got == {
            1: (2, 2, 1_000_000),
            2: (2, 1, 500_000),
            3: (3, 0, 0),
        }


class TestTombstoneDelete:
    def _base(self, spark):
        df = spark.createDataFrame(
            [
                ("c1", "2024-01-01 00:00:00"),
                ("c1", "2024-01-01 01:00:00"),
                ("c2", "2024-01-01 02:00:00"),
                ("c2", "2024-01-02 00:00:00"),
                ("c3", "2024-01-02 01:00:00"),
            ],
            "conv_id string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        tomb = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")
        return df, tomb

    def test_survivors_and_manifest(self, spark):
        df, tomb = self._base(spark)
        survivors, manifest = tombstone_delete(df, tomb)
        assert [r["conv_id"] for r in survivors.collect()] == ["c3"]
        got = {
            str(r["day"].date()): (r["n_deleted"], r["n_kept"], r["n_keys_deleted"])
            for r in manifest.collect()
        }
        assert got == {
            "2024-01-01": (3, 0, 2),
            "2024-01-02": (1, 1, 1),
        }

    def test_tombstone_side_is_broadcast(self, spark):
        df, tomb = self._base(spark)
        survivors, _ = tombstone_delete(df, tomb)
        plan = survivors._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan
        assert "SortMergeJoin" not in plan
