"""Range lookup (geoip shape), regex-table lookup (ua-parser shape),
and session window tests."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from fluent_bit_spark.operators.aggregate import sessionize
from fluent_bit_spark.operators.enrich import (
    lookup_enrich,
    range_lookup_enrich,
    regex_table_enrich,
)


def test_range_lookup(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 55.0), (3, 500.0)], ["id", "v"])
    ranges = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 100.0, "mid")], ["lo", "hi", "tier"]
    )
    out = range_lookup_enrich(df, ranges, "v", defaults={"tier": "unknown"})
    got = {r.id: r.tier for r in out.collect()}
    assert got == {1: "low", 2: "mid", 3: "unknown"}


def test_regex_table_first_match_wins(spark):
    df = spark.createDataFrame(
        [(1, "Mozilla/5.0 Chrome/1"), (2, "Mozilla/5.0 Safari"), (3, "curl/8")],
        ["id", "ua"],
    )
    table = [
        ("Chrome", {"browser": "chrome", "engine": "blink"}),
        ("Mozilla", {"browser": "firefox-ish"}),
    ]
    out = regex_table_enrich(df, table, "ua", defaults={"browser": "other", "engine": "unknown"})
    got = {r.id: (r.browser, r.engine) for r in out.collect()}
    assert got == {
        1: ("chrome", "blink"),
        2: ("firefox-ish", "unknown"),
        3: ("other", "unknown"),
    }


def test_lookup_enrich_defaults(spark):
    df = spark.createDataFrame([(1, "bash"), (2, None), (3, "nope")], ["id", "tool"])
    dim = spark.createDataFrame([("bash", "shell")], ["tool_key", "category"])
    out = lookup_enrich(df, dim, "tool", "tool_key", defaults={"category": "Unknown"})
    got = {r.id: r.category for r in out.collect()}
    assert got == {1: "shell", 2: "Unknown", 3: "Unknown"}


def test_sessionize(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("c1", base),
        ("c1", base + dt.timedelta(minutes=10)),
        ("c1", base + dt.timedelta(hours=3)),  # new session (gap 2h)
        ("c2", base),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "ts"])
    out = sessionize(df, "conv_id", gap="2 hours")
    got = sorted((r.conv_id, r.n_turns) for r in out.collect())
    assert got == [("c1", 1), ("c1", 2), ("c2", 1)]


def _t(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_join_backward_inclusive(spark):
    from fluent_bit_spark.operators.enrich import asof_join

    left = spark.createDataFrame(
        [
            (1, _t("2024-01-01 00:30:00"), "early"),   # before any marker
            (1, _t("2024-01-01 01:00:00"), "at"),      # exactly at marker -> inclusive
            (1, _t("2024-01-01 02:30:00"), "mid"),     # between markers -> v1
            (1, _t("2024-01-01 04:00:00"), "late"),    # after both -> v2
            (2, _t("2024-01-01 05:00:00"), "nokey"),   # key with no markers
        ],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _t("2024-01-01 01:00:00"), "v1", 10),
            (1, _t("2024-01-01 03:00:00"), "v2", 20),
        ],
        ["k", "ts", "ver", "num"],
    )
    out = asof_join(left, right, key="k")
    got = {r.tag: (r.ver, r.num) for r in out.collect()}
    assert got == {
        "early": (None, None),
        "at": ("v1", 10),
        "mid": ("v1", 10),
        "late": ("v2", 20),
        "nokey": (None, None),
    }
    # left columns survive untouched
    assert set(out.columns) == {"k", "ts", "tag", "ver", "num"}


def test_asof_join_values_from_same_right_row(spark):
    """Both value columns must come from the SAME marker row (packed
    struct), never mixed across markers."""
    from fluent_bit_spark.operators.enrich import asof_join

    left = spark.createDataFrame(
        [(1, _t("2024-01-01 02:00:00"))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01 00:00:00"), "a", 1), (1, _t("2024-01-01 01:00:00"), "b", 2)],
        ["k", "ts", "s", "n"],
    )
    row = asof_join(left, right, key="k").collect()[0]
    assert (row.s, row.n) == ("b", 2)


def test_asof_join_null_key_and_null_ts_never_match(spark):
    """SQL ASOF semantics: NULL keys / NULL marker timestamps never
    match (DuckDB `p.k = m.k AND p.ts >= m.ts` is false on NULLs)."""
    from fluent_bit_spark.operators.enrich import asof_join

    left = spark.createDataFrame(
        [(None, _t("2024-01-01 02:00:00"), "nullkey"), (1, _t("2024-01-01 02:00:00"), "k1")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(None, _t("2024-01-01 01:00:00"), "mnull"),
         (1, None, "mnots"),
         (1, _t("2024-01-01 01:00:00"), "m1")],
        "k int, ts timestamp, mark string",
    )
    got = {r.tag: r.mark for r in asof_join(left, right, key="k").collect()}
    assert got == {"nullkey": None, "k1": "m1"}


def test_asof_join_rejects_colliding_and_empty_value_cols(spark):
    from fluent_bit_spark.operators.enrich import asof_join

    left = spark.createDataFrame([(1, _t("2024-01-01"), "x")], ["k", "ts", "note"])
    right = spark.createDataFrame([(1, _t("2024-01-01"), "y")], ["k", "ts", "note"])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="k")
    with pytest.raises(ValueError, match="non-empty"):
        asof_join(left, right.withColumnRenamed("note", "memo"), key="k", value_cols=[])


def test_asof_join_partition_invariant(spark):
    """Same answer at 1 and 7 input partitions (the window shuffle
    fully determines order)."""
    from fluent_bit_spark.operators.enrich import asof_join

    left = spark.createDataFrame(
        [(i % 3, _t("2024-01-01 00:00:00") + dt.timedelta(minutes=i), i) for i in range(40)],
        ["k", "ts", "idx"],
    )
    right = spark.createDataFrame(
        [(k, _t("2024-01-01 00:00:00") + dt.timedelta(minutes=10 * j), f"m{k}-{j}")
         for k in range(3) for j in range(4)],
        ["k", "ts", "mark"],
    )
    base = sorted(
        (r.idx, r.mark) for r in asof_join(left, right, key="k").collect()
    )
    for n in (1, 7):
        got = sorted(
            (r.idx, r.mark)
            for r in asof_join(left.repartition(n), right.repartition(n), key="k").collect()
        )
        assert got == base


def test_interval_overlap_join_exact_pairs(spark):
    import datetime as dt

    from fluent_bit_spark.operators.enrich import interval_overlap_join

    T = dt.datetime
    left = spark.createDataFrame(
        [
            # contained in i1
            ("s1", T(2024, 1, 1, 10, 15), T(2024, 1, 1, 10, 45)),
            # straddles i1's end
            ("s2", T(2024, 1, 1, 11, 30), T(2024, 1, 1, 12, 30)),
            # touches i1's end exactly: half-open => NO overlap
            ("s3", T(2024, 1, 1, 12, 0), T(2024, 1, 1, 13, 0)),
            # many-hour span bridging i1 and i2
            ("s4", T(2024, 1, 1, 9, 0), T(2024, 1, 2, 1, 0)),
            # empty interval: dropped
            ("s5", T(2024, 1, 1, 10, 0), T(2024, 1, 1, 10, 0)),
        ],
        "session_id string, s timestamp_ntz, e timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            ("i1", T(2024, 1, 1, 10, 0), T(2024, 1, 1, 12, 0)),
            ("i2", T(2024, 1, 2, 0, 0), T(2024, 1, 2, 2, 0)),
        ],
        "incident_id string, s timestamp_ntz, e timestamp_ntz",
    )
    got = {
        (r.session_id, r.incident_id): r.overlap_us
        for r in interval_overlap_join(
            left, right, "session_id", "incident_id", ("s", "e"), ("s", "e")
        ).collect()
    }
    m = 60 * 1_000_000
    assert got == {
        ("s1", "i1"): 30 * m,
        ("s2", "i1"): 30 * m,
        ("s4", "i1"): 120 * m,
        ("s4", "i2"): 60 * m,
    }


def test_m4_downsample_four_points_and_tiebreak(spark):
    import datetime as dt

    from fluent_bit_spark.operators.aggregate import m4_downsample

    T = dt.datetime
    rows = [
        # one 6h bucket (epoch 0..21599): first at 00:00 (id tie-break:
        # two events at the same ts, lower id wins first)
        (2, T(1970, 1, 1, 0, 0), "a", 5.0),
        (1, T(1970, 1, 1, 0, 0), "a", 7.0),
        (3, T(1970, 1, 1, 3, 0), "a", -1.0),
        (4, T(1970, 1, 1, 5, 59), "a", 2.0),
        # next bucket
        (5, T(1970, 1, 1, 6, 0), "a", 9.0),
        (6, T(1970, 1, 1, 1, 0), "b", 4.0),
        (7, None, "a", 99.0),  # NULL ts dropped
        (8, T(1970, 1, 1, 2, 0), "a", None),  # NULL value dropped
        # pre-epoch: FLOORS to the bucket starting before it (-21600),
        # not the truncate-toward-zero bucket 0
        (9, T(1969, 12, 31, 23, 0), "a", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, event_type string, value double"
    )
    got = {
        (r.event_type, r.bucket_start_s): (r.n, r.v_min, r.v_max, r.v_first, r.v_last)
        for r in m4_downsample(df).collect()
    }
    assert got == {
        ("a", -21600): (1, 3.0, 3.0, 3.0, 3.0),
        ("a", 0): (4, -1.0, 7.0, 7.0, 2.0),
        ("a", 21600): (1, 9.0, 9.0, 9.0, 9.0),
        ("b", 0): (1, 4.0, 4.0, 4.0, 4.0),
    }


def test_alert_edges_transitions_only(spark, sf_dir):
    from fluent_bit_spark.operators.aggregate import alert_edges, rate_anomalies

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = alert_edges(events).collect()
    verdicts = {
        (r.event_type, r.hour): bool(r.spike) if r.spike is not None else False
        for r in rate_anomalies(events).collect()
    }
    assert edges, "no transitions found in the test data"
    # every edge is a genuine state change vs the previous observed hour
    by_key = {}
    for (k, h), sp in sorted(verdicts.items()):
        by_key.setdefault(k, []).append((h, sp))
    expected = set()
    for k, seq in by_key.items():
        prev = False
        for h, sp in seq:
            if sp != prev:
                expected.add((k, h, "alert" if sp else "resolve"))
            prev = sp
    assert {(r.event_type, r.hour, r.kind) for r in edges} == expected


def test_ewma_hourly_known_values(spark):
    import datetime as dt

    from fluent_bit_spark.operators.aggregate import ewma_hourly

    T = dt.datetime
    # one key, hourly counts 2, 4, 8 (consecutive observed buckets)
    rows = (
        [(T(2024, 1, 1, 0, m), "a") for m in range(2)]
        + [(T(2024, 1, 1, 1, m), "a") for m in range(4)]
        + [(T(2024, 1, 1, 2, m), "a") for m in range(8)]
    )
    df = spark.createDataFrame(rows, "ts timestamp_ntz, event_type string")
    got = {r.hour.hour: (r.n, r.ewma) for r in ewma_hourly(df, alpha=0.3).collect()}
    fx = lambda x: int(x * 1_000_000 + 0.5)

    def ew(counts):
        num = sum(fx(c * 0.7 ** (len(counts) - 1 - i)) for i, c in enumerate(counts))
        den = sum(fx(0.7 ** (len(counts) - 1 - i)) for i, c in enumerate(counts))
        return round(num / den, 6)

    assert got[0] == (2, ew([2]))
    assert got[1] == (4, ew([2, 4]))
    assert got[2] == (8, ew([2, 4, 8]))
    # closed form: (2*0.49 + 4*0.7 + 8) / (0.49 + 0.7 + 1) ~ 5.36
    assert abs(got[2][1] - (2 * 0.49 + 4 * 0.7 + 8) / (0.49 + 0.7 + 1.0)) < 1e-5


def test_dim_trunc_eval_identical_when_info_in_kept_dims(spark):
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.similarity import dim_trunc_eval

    # all signal lives in the first 4 dims => truncation changes nothing
    rows = [(i, [float((i * 7 + j) % 5) for j in range(4)] + [0.0] * 4)
            for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = dim_trunc_eval(df, F.col("vec_id") < 2, keep_dims=4, k=5).collect()
    assert len(out) == 2
    for r in out:
        assert (r.n_common, r.overlap) == (5, 1.0)
