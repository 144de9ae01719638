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


class TestKappaAgreement:
    def _kappa(self, spark, rows):
        from fluent_bit_spark.operators.dataquality import kappa_agreement

        df = spark.createDataFrame(rows, "a string, b string")
        [r] = kappa_agreement(df, "a", "b").collect()
        return r

    def test_perfect_agreement(self, spark):
        r = self._kappa(spark, [("x", "x")] * 3 + [("y", "y")] * 3)
        # po = 1, pe = 0.5 -> kappa = 1 exactly
        assert (r["po_ppm"], r["pe_ppm"], r["kappa_ppm"]) == (
            1_000_000, 500_000, 1_000_000,
        )

    def test_worse_than_chance_is_negative_and_floored(self, spark):
        # systematic disagreement: po = 0, pe = 0.5 -> kappa = -1.
        r = self._kappa(spark, [("x", "y")] * 2 + [("y", "x")] * 2)
        assert r["po_ppm"] == 0
        assert r["kappa_ppm"] == -1_000_000

    def test_null_safe_agreement(self, spark):
        from fluent_bit_spark.operators.dataquality import kappa_agreement

        df = spark.createDataFrame(
            [("x", "x"), (None, None), (None, "x"), ("x", None)],
            "a string, b string",
        )
        [r] = kappa_agreement(df, "a", "b").collect()
        assert r["po_ppm"] == 500_000  # both-null agrees, null-vs-x doesn't

    def test_degenerate_single_label_null_kappa(self, spark):
        # pe = 1 -> kappa undefined -> NULL
        r = self._kappa(spark, [("x", "x")] * 4)
        assert r["pe_ppm"] == 1_000_000 and r["kappa_ppm"] is None


class TestBackpressure:
    def test_lindley_replay(self, spark):
        from fluent_bit_spark.operators.aggregate import backpressure_sim

        # drain 10/hr: arrivals 30,0,0,25,0 -> q = 20,10,0,15,5
        rows = [("s", h, n) for h, n in enumerate([30, 0, 0, 25, 0])]
        df = spark.createDataFrame(rows, "sink string, hour int, n_in long")
        got = {
            r["hour"]: (r["queue_depth"], r["paused"])
            for r in backpressure_sim(
                df, drain_per_hour=10, mem_buf_limit=12
            ).collect()
        }
        assert got == {
            0: (20, True),
            1: (10, False),
            2: (0, False),
            3: (15, True),
            4: (5, False),
        }

    def test_queue_never_negative(self, spark):
        from fluent_bit_spark.operators.aggregate import backpressure_sim

        rows = [("s", h, 0) for h in range(4)]
        df = spark.createDataFrame(rows, "sink string, hour int, n_in long")
        depths = [
            r["queue_depth"]
            for r in backpressure_sim(df, 5, 100).collect()
        ]
        assert depths == [0, 0, 0, 0]

    def test_hour_spine_dense_and_zero_filled(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import hour_spine

        df = spark.createDataFrame(
            [
                ("a", "2024-01-01 00:10:00"),
                ("a", "2024-01-01 03:20:00"),
                ("b", "2024-01-01 01:00:00"),
            ],
            "sink string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        spine = hour_spine(df)
        # 2 sinks x 4 hours, zero-filled where no arrivals
        assert spine.count() == 8
        got = {
            (r["sink"], r["hour"].hour): r["n_in"] for r in spine.collect()
        }
        assert got[("a", 0)] == 1 and got[("a", 1)] == 0
        assert got[("b", 1)] == 1 and got[("b", 3)] == 0


class TestSeasonalAnomaly:
    def test_spike_flags_high(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import seasonal_anomaly

        rows = []
        # baseline: days 1..15, hod 0, 10 rows each; current day 16: 30 rows
        for d in range(1, 16):
            rows += [(f"2024-01-{d:02d} 00:30:00",)] * 10
        rows += [("2024-01-16 00:30:00",)] * 30
        rows += [("2024-01-17 00:30:00",)] * 10  # normal day
        rows += [("2024-01-18 00:30:00",)] * 4   # low day (4*1*2 < 10... no)
        df = (
            spark.createDataFrame(rows, "ts string")
            .withColumn("ts", F.to_timestamp("ts"))
            .withColumn("event_type", F.lit("e"))
        )
        got = {
            r["day"].day: r["verdict"]
            for r in seasonal_anomaly(df, split_day=15, factor=2).collect()
        }
        # baseline mean = 10/day: 30 > 2*10 high; 10 ok; 4*2 < 10 low
        assert got == {16: "high", 17: "ok", 18: "low"}

    def test_unseen_hod_no_baseline(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.aggregate import seasonal_anomaly

        df = (
            spark.createDataFrame(
                [("2024-01-01 00:00:00",), ("2024-01-20 05:00:00",)], "ts string"
            )
            .withColumn("ts", F.to_timestamp("ts"))
            .withColumn("event_type", F.lit("e"))
        )
        [r] = seasonal_anomaly(df).collect()
        assert r["verdict"] == "no_baseline" and r["hod"] == 5


class TestSchemaCompat:
    def _frames(self, spark, old_rows, new_rows):
        s = "field string, type string, has_default boolean"
        return spark.createDataFrame(old_rows, s), spark.createDataFrame(new_rows, s)

    def test_all_verdicts(self, spark):
        from fluent_bit_spark.operators.dataquality import schema_compat

        old, new = self._frames(
            spark,
            [("a", "string", False), ("b", "int", False),
             ("c", "string", False), ("gone", "int", False)],
            [("a", "string", False), ("b", "long", False),
             ("c", "int", False), ("d", "int", True),
             ("e", "int", False)],
        )
        got = {
            r["field"]: (r["verdict"], r["compatible"])
            for r in schema_compat(old, new).collect()
        }
        assert got == {
            "a": ("ok", True),
            "b": ("promoted", True),
            "c": ("breaking_type", False),
            "d": ("added_ok", True),
            "e": ("breaking_no_default", False),
            "gone": ("removed_ok", True),
        }

    def test_string_bytes_promotes_both_ways(self, spark):
        from fluent_bit_spark.operators.dataquality import schema_compat

        old, new = self._frames(
            spark, [("x", "bytes", False)], [("x", "string", False)]
        )
        [r] = schema_compat(old, new).collect()
        assert r["verdict"] == "promoted"


class TestPrioritySample:
    def test_rates_and_weights(self, spark):
        from fluent_bit_spark.operators.sampling import priority_sample

        df = spark.createDataFrame(
            [(i, "keep_all" if i % 2 else "drop_all") for i in range(200)],
            "event_id long, event_type string",
        )
        kept = priority_sample(
            df, {"keep_all": 1_000_000, "drop_all": 0},
            level_col="event_type", id_col="event_id",
        ).collect()
        assert len(kept) == 100
        assert all(r["event_type"] == "keep_all" for r in kept)
        assert all(r["weight_milli"] == 1000 for r in kept)

    def test_partial_rate_weight(self, spark):
        from fluent_bit_spark.operators.sampling import priority_sample

        df = spark.createDataFrame(
            [(i, "t") for i in range(2000)], "event_id long, event_type string"
        )
        kept = priority_sample(
            df, {"t": 250_000}, level_col="event_type", id_col="event_id"
        ).collect()
        # md5 is uniform: expect ~500 of 2000, deterministic exact count
        assert 400 < len(kept) < 600
        assert kept[0]["weight_milli"] == 4000

    def test_bad_rate_rejected(self, spark):
        import pytest as _pytest
        from fluent_bit_spark.operators.sampling import priority_sample

        df = spark.createDataFrame([(1, "t")], "event_id long, event_type string")
        with _pytest.raises(ValueError):
            priority_sample(df, {"t": 2_000_000}, "event_type", "event_id")


class TestProfileAndConstraints:
    def test_profile_stats(self, spark):
        from fluent_bit_spark.operators.dataquality import profile_columns

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (3, "b")], "k long, s string"
        )
        got = {
            r["column"]: (r["n"], r["n_null"], r["n_distinct"],
                          r["min_value"], r["max_value"])
            for r in profile_columns(df, ["k", "s"]).collect()
        }
        assert got["k"] == (4, 0, 3, "1", "3")
        assert got["s"] == (4, 1, 2, "a", "b")

    def test_constraints_exact_ppm(self, spark):
        from fluent_bit_spark.operators.dataquality import check_constraints

        df = spark.createDataFrame(
            [(1, "x"), (2, "x"), (2, None), (9, "y")], "v long, s string"
        )
        got = {
            r["rule"]: (r["metric_ppm"], r["passed"])
            for r in check_constraints(
                df,
                [
                    ("completeness", "s", 1_000_000),
                    ("uniqueness", "v", 800_000),
                    ("in_range", "v", 1, 5, 700_000),
                    ("matches", "s", "^x$", 500_000),
                ],
            ).collect()
        }
        assert got["completeness(s)"] == (750_000, False)
        assert got["uniqueness(v)"] == (750_000, False)  # 3 distinct / 4
        assert got["in_range(v,1,5)"] == (750_000, True)
        assert got["matches(s)"] == (500_000, True)

    def test_unknown_rule_rejected(self, spark):
        import pytest as _pytest
        from fluent_bit_spark.operators.dataquality import check_constraints

        df = spark.createDataFrame([(1,)], "v long")
        with _pytest.raises(ValueError):
            check_constraints(df, [("nonsense", "v", 1)])


class TestFkIntegrity:
    def test_orphans_exact(self, spark):
        from fluent_bit_spark.operators.dataquality import fk_integrity

        child = spark.createDataFrame([(1,), (1,), (2,), (3,)], "fk long")
        parent = spark.createDataFrame([(1,), (3,), (3,)], "pk long")
        [r] = fk_integrity(child, parent, "fk", "pk", name="c->p").collect()
        assert (r["relation"], r["n_child"], r["n_orphans"], r["orphan_ppm"]) == (
            "c->p", 4, 1, 250_000,
        )

    def test_clean_relation(self, spark):
        from fluent_bit_spark.operators.dataquality import fk_integrity

        child = spark.createDataFrame([(1,)], "fk long")
        parent = spark.createDataFrame([(1,)], "pk long")
        [r] = fk_integrity(child, parent, "fk", "pk").collect()
        assert r["n_orphans"] == 0 and r["orphan_ppm"] == 0


class TestNdcgEval:
    def test_hand_traced_ndcg(self, spark):
        from fluent_bit_spark.operators.text_analysis import (
            NDCG_DISC_MILLI,
            ndcg_eval,
        )

        results = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 99, 3),
             (2, 99, 1)],  # query 2 retrieved nothing relevant
            "query_id long, doc_id long, rank int",
        )
        qrels = spark.createDataFrame(
            [(1, 10, 3), (1, 11, 1), (2, 20, 2)],
            "query_id long, doc_id long, gain int",
        )
        got = {
            r["query_id"]: (r["dcg_milli"], r["idcg_milli"], r["ndcg_ppm"])
            for r in ndcg_eval(results, qrels, k=10).collect()
        }
        d1, d2 = NDCG_DISC_MILLI[1], NDCG_DISC_MILLI[2]
        # query 1 retrieved its qrels in ideal order -> ndcg = 1 exactly
        assert got[1] == (3 * d1 + 1 * d2, 3 * d1 + 1 * d2, 1_000_000)
        assert got[2] == (0, 2 * d1, 0)

    def test_suboptimal_order_below_one(self, spark):
        from fluent_bit_spark.operators.text_analysis import ndcg_eval

        results = spark.createDataFrame(
            [(1, 11, 1), (1, 10, 2)],  # low-gain doc first
            "query_id long, doc_id long, rank int",
        )
        qrels = spark.createDataFrame(
            [(1, 10, 3), (1, 11, 1)], "query_id long, doc_id long, gain int"
        )
        [r] = ndcg_eval(results, qrels).collect()
        assert 0 < r["ndcg_ppm"] < 1_000_000

    def test_rank_beyond_k_ignored(self, spark):
        from fluent_bit_spark.operators.text_analysis import ndcg_eval

        results = spark.createDataFrame(
            [(1, 10, 11)], "query_id long, doc_id long, rank int"
        )
        qrels = spark.createDataFrame(
            [(1, 10, 3)], "query_id long, doc_id long, gain int"
        )
        [r] = ndcg_eval(results, qrels, k=10).collect()
        assert r["ndcg_ppm"] == 0


class TestDegenerateInputsAnsiSafe:
    """Zero-divisor edge cases that would raise DIVIDE_BY_ZERO under
    ANSI mode without the explicit guards: one-sided drift windows,
    empty child/whole tables, and all-zero-gain qrels."""

    def test_tvd_one_sided_group(self, spark):
        from fluent_bit_spark.operators.dataquality import tvd_drift

        df = spark.createDataFrame(
            # 'only_cur' has no reference-window rows at all
            [("both", 0, 0), ("both", 0, 1), ("only_cur", 1, 1)],
            "event_type string, bin int, is_cur int",
        )
        got = {
            r["event_type"]: (r["n_ref"], r["n_cur"], r["tvd_ppm"])
            for r in tvd_drift(df).collect()
        }
        assert got["both"] == (1, 1, 0)
        # missing side contributes share 0 per bin by convention
        assert got["only_cur"] == (0, 1, 500_000)

    def test_fk_empty_child(self, spark):
        from fluent_bit_spark.operators.dataquality import fk_integrity

        child = spark.createDataFrame([], "fk long")
        parent = spark.createDataFrame([(1,)], "pk long")
        [r] = fk_integrity(child, parent, "fk", "pk").collect()
        assert (r["n_child"], r["n_orphans"], r["orphan_ppm"]) == (0, 0, 0)

    def test_constraints_empty_table(self, spark):
        from fluent_bit_spark.operators.dataquality import check_constraints

        df = spark.createDataFrame([], "v long, s string")
        got = {
            r["rule"]: (r["metric_ppm"], r["passed"])
            for r in check_constraints(
                df,
                [("completeness", "s", 1_000_000), ("completeness", "v", 0)],
            ).collect()
        }
        # no data certifies nothing: 0 ppm fails any positive threshold
        assert got["completeness(s)"] == (0, False)
        assert got["completeness(v)"] == (0, True)

    def test_ndcg_zero_gain_qrels(self, spark):
        from fluent_bit_spark.operators.text_analysis import ndcg_eval

        results = spark.createDataFrame(
            [(1, 10, 1)], "query_id long, doc_id long, rank int"
        )
        qrels = spark.createDataFrame(
            [(1, 10, 0)], "query_id long, doc_id long, gain int"
        )
        rows = ndcg_eval(results, qrels, k=10).collect()
        # idcg == 0 -> nDCG undefined -> NULL (never a div-0 crash)
        assert all(r["ndcg_ppm"] is None for r in rows)


class TestKsDrift:
    def test_identical_windows_zero_ks(self, spark):
        from fluent_bit_spark.operators.dataquality import ks_drift

        rows = [("g", v, c) for v in (1, 2, 3) for c in (0, 1) for _ in range(4)]
        df = spark.createDataFrame(rows, ["event_type", "value_bin", "is_cur"])
        out = ks_drift(df).collect()[0]
        assert out.ks_ppm == 0 and out.n_ref == 12 and out.n_cur == 12

    def test_disjoint_supports_full_gap(self, spark):
        from fluent_bit_spark.operators.dataquality import ks_drift

        # ref all at 1, cur all at 10: at v=1 the ref ECDF is 1.0 and
        # the cur ECDF 0.0 -> KS = 1_000_000 ppm
        rows = [("g", 1, 0)] * 5 + [("g", 10, 1)] * 5
        df = spark.createDataFrame(rows, ["event_type", "value_bin", "is_cur"])
        assert ks_drift(df).collect()[0].ks_ppm == 1_000_000

    def test_tail_shift_beats_tvd(self, spark):
        # KS exists because TVD under-reports ordered tail shifts:
        # shift every value by +1 and KS sees a large ordered gap.
        from fluent_bit_spark.operators.dataquality import ks_drift

        rows = [("g", v, 0) for v in range(10)] + [
            ("g", v + 1, 1) for v in range(10)
        ]
        df = spark.createDataFrame(rows, ["event_type", "value_bin", "is_cur"])
        assert ks_drift(df).collect()[0].ks_ppm == 100_000  # 1/10 step

    def test_empty_side_is_null_not_error(self, spark):
        from fluent_bit_spark.operators.dataquality import ks_drift

        df = spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 1)], ["event_type", "value_bin", "is_cur"]
        )
        assert ks_drift(df).collect()[0].ks_ppm is None
