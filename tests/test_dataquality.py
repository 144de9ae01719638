"""Unit tests for operators/dataquality.py — blue/green data diff,
JSON-key schema drift, and integer-ppm TVD distribution drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.operators.dataquality import (
    data_diff,
    schema_drift,
    tvd_drift,
)


def _rows(df, *order_cols):
    return [tuple(r) for r in df.orderBy(*order_cols).collect()]


class TestDataDiff:
    def test_verdicts_and_changed_cols(self, spark):
        old = spark.createDataFrame(
            [
                ("a", 1, "user", "hi"),
                ("a", 2, "assistant", "yo"),
                ("b", 1, "user", "x"),
                ("c", 1, "tool", "z"),
            ],
            "conv_id string, turn_idx int, role string, text string",
        )
        new = spark.createDataFrame(
            [
                ("a", 1, "user", "hi"),  # identical -> absent from diff
                ("a", 2, "user", "yo2"),  # both columns changed
                ("c", 1, "tool", "z2"),  # text changed
                ("d", 9, "user", "new"),  # only_new
            ],
            "conv_id string, turn_idx int, role string, text string",
        )
        got = _rows(
            data_diff(old, new, key_cols=("conv_id", "turn_idx")),
            "conv_id",
            "turn_idx",
        )
        assert got == [
            ("a", 2, "changed", "role,text"),
            ("b", 1, "only_old", ""),
            ("c", 1, "changed", "text"),
            ("d", 9, "only_new", ""),
        ]

    def test_null_safe_compare(self, spark):
        # NULL == NULL must NOT count as a change; NULL vs value must.
        old = spark.createDataFrame(
            [("a", 1, None, "t"), ("a", 2, None, "t")],
            "conv_id string, turn_idx int, role string, text string",
        )
        new = spark.createDataFrame(
            [("a", 1, None, "t"), ("a", 2, "user", "t")],
            "conv_id string, turn_idx int, role string, text string",
        )
        got = _rows(data_diff(old, new), "conv_id", "turn_idx")
        assert got == [("a", 2, "changed", "role")]

    def test_explicit_compare_cols_ignores_others(self, spark):
        old = spark.createDataFrame(
            [("a", 1, "user", "t")],
            "conv_id string, turn_idx int, role string, text string",
        )
        new = spark.createDataFrame(
            [("a", 1, "assistant", "t")],
            "conv_id string, turn_idx int, role string, text string",
        )
        assert data_diff(old, new, compare_cols=("text",)).count() == 0


class TestSchemaDrift:
    def test_lifecycle_statuses(self, spark):
        rows = [
            (1, '{"stable": 1, "dropped": 2}'),
            (2, '{"stable": 1, "new": 3, "transient": 4}'),
            (3, '{"stable": 1, "new": 3}'),
        ]
        df = spark.createDataFrame(rows, "day int, props string").select(
            F.to_timestamp(F.format_string("2024-01-%02d", "day")).alias("day"),
            "props",
        )
        got = {
            r["key"]: (r["status"], r["n_days"], r["n_records"])
            for r in schema_drift(df, json_col="props").collect()
        }
        assert got == {
            "stable": ("stable", 3, 3),
            "dropped": ("dropped", 1, 1),
            "new": ("new", 2, 2),
            "transient": ("transient", 1, 1),
        }

    def test_single_day_span_is_stable(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01", '{"a": 1}')], "day string, props string"
        ).select(F.to_timestamp("day").alias("day"), "props")
        [r] = schema_drift(df, json_col="props").collect()
        assert r["status"] == "stable"


class TestTvdDrift:
    def _frame(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_type string, bin long, is_cur int"
        )

    def test_identical_windows_zero_tvd(self, spark):
        rows = [("e", b, c) for b in (0, 1, 2) for c in (0, 1) for _ in range(5)]
        [r] = tvd_drift(self._frame(spark, rows)).collect()
        assert (r["tvd_ppm"], r["drifted"]) == (0, False)
        assert r["n_ref"] == 15 and r["n_cur"] == 15

    def test_full_shift_is_million_ppm(self, spark):
        # ref all in bin 0, cur all in bin 1 -> 100% of mass moved.
        rows = [("e", 0, 0)] * 4 + [("e", 1, 1)] * 4
        [r] = tvd_drift(self._frame(spark, rows)).collect()
        assert (r["tvd_ppm"], r["drifted"]) == (1_000_000, True)

    def test_exact_integer_shares(self, spark):
        # ref: 2/3 in bin0, 1/3 in bin1 -> floor shares 666666/333333.
        # cur: uniform over bins 0,1 -> 500000/500000.
        # tvd = (|666666-500000| + |333333-500000|) // 2 = 166666.
        rows = [("e", 0, 0), ("e", 0, 0), ("e", 1, 0), ("e", 0, 1), ("e", 1, 1)]
        [r] = tvd_drift(self._frame(spark, rows), threshold_ppm=150_000).collect()
        assert (r["tvd_ppm"], r["drifted"]) == (166_666, True)

    def test_per_group_isolation(self, spark):
        rows = (
            [("shifted", 0, 0)] * 3
            + [("shifted", 3, 1)] * 3
            + [("calm", 1, 0)] * 3
            + [("calm", 1, 1)] * 3
        )
        got = {
            r["event_type"]: r["drifted"]
            for r in tvd_drift(self._frame(spark, rows)).collect()
        }
        assert got == {"shifted": True, "calm": False}
