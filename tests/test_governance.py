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


class TestRouteDiff:
    def test_verdicts_and_deltas(self, spark):
        from fluent_bit_spark.operators.route import route_diff

        df = spark.createDataFrame(
            [("errors.a",)] * 3 + [("chat.u",)] * 2 + [("misc.x",)],
            "tag string",
        )
        old = [("s_err", "errors.*"), ("s_all", "*")]
        new = [("s_err", "errors.*"), ("s_chat", "chat.*")]
        got = {
            r["tag"]: (
                r["n_rows"], r["routes_old"], r["routes_new"],
                r["added"], r["removed"], r["verdict"],
            )
            for r in route_diff(df, old, new).collect()
        }
        assert got == {
            "errors.a": (3, "s_all,s_err", "s_err", "", "s_all", "rerouted"),
            "chat.u": (2, "s_all", "s_chat", "s_chat", "s_all", "rerouted"),
            "misc.x": (1, "s_all", "", "", "s_all", "newly_dropped"),
        }

    def test_unchanged_and_newly_routed(self, spark):
        from fluent_bit_spark.operators.route import route_diff

        df = spark.createDataFrame([("a.x",), ("b.y",)], "tag string")
        old = [("sa", "a.*")]
        new = [("sa", "a.*"), ("sb", "b.*")]
        got = {r["tag"]: r["verdict"] for r in route_diff(df, old, new).collect()}
        assert got == {"a.x": "unchanged", "b.y": "newly_routed"}


class TestHeartbeatGaps:
    def test_interior_gap_only(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import heartbeat_gaps

        rows = [
            ("h", "2024-01-01 00:05:00"),
            ("h", "2024-01-01 01:10:00"),  # 1h step: fine
            ("h", "2024-01-01 09:00:00"),  # 8h gap: flagged
            ("h", "2024-01-01 12:00:00"),  # 3h gap: under threshold
            ("i", "2024-01-01 00:00:00"),  # single heartbeat: no gap rows
        ]
        df = spark.createDataFrame(rows, "source string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = [
            (r["source"], r["gap_start"].hour, r["gap_end"].hour, r["gap_hours"])
            for r in heartbeat_gaps(df, threshold_hours=6).collect()
        ]
        assert got == [("h", 1, 9, 8)]

    def test_multiple_events_in_hour_collapse(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import heartbeat_gaps

        rows = [("h", f"2024-01-01 00:{m:02d}:00") for m in (1, 2, 3)] + [
            ("h", "2024-01-01 10:00:00")
        ]
        df = spark.createDataFrame(rows, "source string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )
        got = heartbeat_gaps(df, threshold_hours=6).collect()
        assert len(got) == 1 and got[0]["gap_hours"] == 10


class TestCardinalityGuard:
    def test_explosion_shrink_and_first_day(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import cardinality_guard

        rows = []
        rows += [("2024-01-01", i) for i in range(4)]    # 4 distinct
        rows += [("2024-01-02", i) for i in range(10)]   # +150% -> alarm
        rows += [("2024-01-03", i) for i in range(3)]    # -70% -> negative delta
        df = spark.createDataFrame(rows, "d string, lab int").select(
            F.to_timestamp("d").alias("ts"), "lab"
        )
        got = {
            r["day"].day: (r["n_distinct"], r["n_prev"], r["delta_ppm"], r["alarm"])
            for r in cardinality_guard(df, "lab", growth_ppm=200_000).collect()
        }
        assert got[1] == (4, 0, 0, False)
        assert got[2] == (10, 4, 1_500_000, True)
        # floor(-7/10 * 1e6) = -700000 exactly
        assert got[3] == (3, 10, -700_000, False)

    def test_exact_negative_floor(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import cardinality_guard

        rows = [("2024-01-01", i) for i in range(3)] + [
            ("2024-01-02", i) for i in range(2)
        ]
        df = spark.createDataFrame(rows, "d string, lab int").select(
            F.to_timestamp("d").alias("ts"), "lab"
        )
        got = {
            r["day"].day: r["delta_ppm"]
            for r in cardinality_guard(df, "lab").collect()
        }
        # (2-3)*1e6 / 3 = -333333.33 -> both engines truncate toward
        # zero (Spark div == DuckDB //) -> -333333
        assert got[2] == -333_333


class TestLegalHold:
    def test_hold_overrides_tombstone(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.governance import tombstone_delete

        df = spark.createDataFrame(
            [("c1", "2024-01-01 00:00:00"), ("c1", "2024-01-01 01:00:00"),
             ("c2", "2024-01-01 02:00:00"), ("c3", "2024-01-01 03:00:00")],
            "conv_id string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        tomb = spark.createDataFrame([("c1",), ("c2",)], "conv_id string")
        hold = spark.createDataFrame([("c1",)], "conv_id string")
        survivors, manifest = tombstone_delete(df, tomb, holds=hold)
        assert sorted(r["conv_id"] for r in survivors.collect()) == [
            "c1", "c1", "c3",
        ]
        [m] = manifest.collect()
        assert (m["n_deleted"], m["n_kept"], m["n_keys_deleted"],
                m["n_held_rows"]) == (1, 3, 1, 2)


class TestContributionClamp:
    def test_caps_and_clamps_exactly(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.governance import contribution_clamp

        # user A: 3 events on one day (one over-cap), values 10, 80, 30;
        # user B: 1 event, value 200 (clamped)
        rows = [
            (1, "A", "2024-01-01 00:00:00", 10.0),
            (2, "A", "2024-01-01 01:00:00", 80.0),
            (3, "A", "2024-01-01 02:00:00", 30.0),
            (4, "B", "2024-01-01 03:00:00", 200.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        [r] = contribution_clamp(
            df, max_rows_per_user_day=2, value_cap_cents=5_000
        ).collect()
        assert r["n_raw"] == 4 and r["n_kept"] == 3  # A loses 1 row
        assert r["users"] == 2
        # A loses a row (clipped); B's 200.00 > 50.00 cap (clipped)
        assert r["clipped_users"] == 2
        assert r["sum_raw_cents"] == 1000 + 8000 + 3000 + 20000
        # A keeps 2 md5-chosen rows (each <= 5000 after clamp),
        # B keeps 5000; total is deterministic:
        assert r["sum_clamped_cents"] <= 2 * 5000 + 5000
        assert r["sum_clamped_cents"] > 0

    def test_selection_is_content_keyed(self, spark):
        """Same rows in a different arrival order keep the SAME subset."""
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.governance import contribution_clamp

        rows = [(i, "A", "2024-01-01 00:00:00", float(i)) for i in range(6)]
        mk = lambda rs: spark.createDataFrame(
            rs, "event_id long, user_id string, ts string, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        a = contribution_clamp(mk(rows), 3, 10_000).collect()
        b = contribution_clamp(mk(rows[::-1]), 3, 10_000).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
