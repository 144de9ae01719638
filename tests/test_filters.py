"""Unit tests for the filter algebra, mirroring the reference's
runtime-test assertions (tests/runtime/filter_*.c patterns)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.operators import filters as FL


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        ("a1", "GET /index.html", 200, "alice", None),
        ("a2", "POST /login", 500, "bob", "x"),
        ("a3", "GET /health", 200, None, None),
        ("a4", "DELETE /admin", 403, "mallory", "y"),
        ("a5", "GET /metrics", 200, "carol", None),
    ]
    return spark.createDataFrame(rows, ["id", "request", "code", "user", "extra"])


# --- grep ------------------------------------------------------------------

def test_grep_regex_keep(records):
    out = FL.grep(records, [("regex", "request", r"^GET ")])
    assert sorted(r.id for r in out.collect()) == ["a1", "a3", "a5"]


def test_grep_exclude(records):
    out = FL.grep(records, [("exclude", "code", r"^5\d\d$")])
    assert sorted(r.id for r in out.collect()) == ["a1", "a3", "a4", "a5"]


def test_grep_ordered_first_decisive(records):
    # exclude 403 first; then regex keeps only GET; exclude runs first
    out = FL.grep(
        records,
        [("exclude", "code", "403"), ("regex", "request", r"^GET ")],
    )
    assert sorted(r.id for r in out.collect()) == ["a1", "a3", "a5"]


def test_grep_missing_field_drops_on_regex(records):
    # 'user' null on a3 -> regex rule non-match -> drop
    out = FL.grep(records, [("regex", "user", r".")])
    assert sorted(r.id for r in out.collect()) == ["a1", "a2", "a4", "a5"]


# --- record_modifier -------------------------------------------------------

def test_record_modifier_remove_and_append(records):
    out = FL.record_modifier(records, remove_keys=["extra"], records={"env": "prod"})
    assert "extra" not in out.columns and out.collect()[0].env == "prod"


def test_record_modifier_whitelist(records):
    out = FL.record_modifier(records, whitelist_keys=["id", "code"])
    assert out.columns == ["id", "code"]


def test_record_modifier_exclusive(records):
    with pytest.raises(ValueError):
        FL.record_modifier(records, remove_keys=["a"], whitelist_keys=["b"])


# --- modify ----------------------------------------------------------------

def test_modify_set_add(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("add", "user", "anon"), FL.ModifyRule("set", "code", "0")],
    )
    got = {r.id: (r.user, r.code) for r in out.collect()}
    assert got["a3"] == ("anon", "0")  # add fills absent
    assert got["a1"] == ("alice", "0")  # add skips present, set overwrites


def test_modify_conditional(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "flag", "hot")],
        [FL.Condition("key_value_matches", "code", "^5")],
    )
    got = {r.id: r.flag for r in out.collect()}
    assert got == {"a1": None, "a2": "hot", "a3": None, "a4": None, "a5": None}


def test_modify_rename_vs_hard_rename(records):
    out = FL.modify(records, [FL.ModifyRule("rename", "user", "extra")])
    got = {r.id: (r.user, r.extra) for r in out.collect()}
    assert got["a1"] == (None, "alice")  # extra absent -> renamed
    assert got["a2"] == ("bob", "x")  # extra present -> rename skipped
    out2 = FL.modify(records, [FL.ModifyRule("hard_rename", "user", "extra")])
    got2 = {r.id: (r.user, r.extra) for r in out2.collect()}
    assert got2["a2"] == (None, "bob")  # overwrites


def test_modify_remove_wildcard(records):
    out = FL.modify(records, [FL.ModifyRule("remove_wildcard", "ext*")])
    assert all(r.extra is None for r in out.collect())


def test_modify_copy(records):
    out = FL.modify(records, [FL.ModifyRule("copy", "user", "owner")])
    assert {r.id: r.owner for r in out.collect()}["a1"] == "alice"


def test_modify_key_exists_condition(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [FL.Condition("key_exists", "extra")],
    )
    got = {r.id: r.mark for r in out.collect()}
    assert got == {"a1": None, "a2": "1", "a3": None, "a4": "1", "a5": None}


# --- nest / lift -----------------------------------------------------------

def test_nest_then_lift_roundtrip(records):
    nested = FL.nest(records, "us*", "meta", add_prefix="n_")
    assert "user" not in nested.columns and "meta" in nested.columns
    lifted = FL.lift(nested, "meta", remove_prefix="n_")
    assert "user" in lifted.columns
    vals = {r.id: r.user for r in lifted.collect()}
    assert vals["a1"] == "alice"


# --- throttle --------------------------------------------------------------

def test_throttle(spark):
    rows = [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i)) for i in range(100)]
    df = spark.createDataFrame(rows, ["i", "ts"])
    out = FL.throttle(df, rate=0.5, window_seconds=10, order_cols=["i"])
    # budget 5 per 10s window, 10 windows -> 50 rows, first 5 of each
    got = sorted(r.i for r in out.collect())
    assert len(got) == 50
    assert got[:5] == [0, 1, 2, 3, 4] and 5 not in got


def test_throttle_size(spark):
    rows = [
        ("k", "x" * 40, dt.datetime(2024, 1, 1, 0, 0, 1)),
        ("k", "x" * 40, dt.datetime(2024, 1, 1, 0, 0, 2)),
        ("k", "x" * 40, dt.datetime(2024, 1, 1, 0, 0, 3)),
        ("j", "x" * 10, dt.datetime(2024, 1, 1, 0, 0, 4)),
    ]
    df = spark.createDataFrame(rows, ["k", "text", "ts"])
    out = FL.throttle_size(df, key="k", byte_limit=100, window_seconds=60)
    got = [(r.k, len(r.text)) for r in out.collect()]
    assert sorted(got) == [("j", 10), ("k", 40), ("k", 40)]


# --- expect ----------------------------------------------------------------

def test_expect_warn_and_exit(records):
    FL.expect(records, [("key_val_is_not_null", "user", None)], action="warn")
    with pytest.raises(FL.ExpectError):
        FL.expect(records, [("key_val_is_not_null", "user", None)], action="exit")
    FL.expect(records, [("key_exists", "id", None)], action="exit")  # passes


# --- alter_size ------------------------------------------------------------

def test_alter_size(records, spark):
    out = FL.alter_size(records, remove=2, order_cols=["id"])
    assert sorted(r.id for r in out.collect()) == ["a3", "a4", "a5"]


# --- record_function (lua analog) -----------------------------------------

def test_record_function_drop_modify_split(records):
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf[pdf.code != 500]  # drop
        dup = pdf[pdf.code == 403].copy()  # split: emit a copy
        dup["user"] = "copy-" + dup["user"].astype(str)
        return pd.concat([pdf, dup])

    out = FL.record_function(records, fn)
    users = sorted(str(r.user) for r in out.collect())
    assert "copy-mallory" in users and len(users) == 5


# --- throttle scale-shape (partition pre-limit) ----------------------------

def _brute_throttle_size(rows, limit):
    """Reference: running byte total per (key, hour) in (ts, i) order;
    keep while <= limit (heavy rows still poison the window)."""
    from collections import defaultdict

    running = defaultdict(int)
    keep = []
    for ts, i, k, text in sorted(rows, key=lambda r: (r[2], r[0], r[1])):
        b = running[k] = running[k] + len(text)
        if b <= limit:
            keep.append((k, i))
    return sorted(keep)


@pytest.mark.parametrize("nparts", [1, 3, 7])
def test_throttle_partition_invariance(spark, nparts):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [(base + dt.timedelta(seconds=i % 40), i) for i in range(200)]
    df = spark.createDataFrame(rows, ["ts", "i"]).repartition(nparts)
    out = FL.throttle(df, rate=0.5, window_seconds=10, order_cols=["i"])
    got = sorted(r.i for r in out.collect())
    # reference: first 5 per 10s window in (ts, i) order
    want = []
    from collections import defaultdict

    cnt = defaultdict(int)
    for ts, i in sorted(rows):
        w = (ts - base).total_seconds() // 10
        if cnt[w] < 5:
            cnt[w] += 1
            want.append(i)
    assert got == sorted(want)


@pytest.mark.parametrize("nparts", [1, 2, 5])
def test_throttle_size_huge_record_poisons_window(spark, nparts):
    """A record larger than the whole budget must still block later
    small records (the pre-filter keeps it as a sentinel); result is
    identical at any input partitioning."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(seconds=0), 0, "a", "x" * 50),
        (base + dt.timedelta(seconds=1), 1, "a", "y" * 200),  # over budget
        (base + dt.timedelta(seconds=2), 2, "a", "z"),  # must stay dropped
        (base + dt.timedelta(seconds=3), 3, "b", "w" * 80),
        (base + dt.timedelta(seconds=4), 4, "b", "v" * 20),
    ]
    df = spark.createDataFrame(rows, ["ts", "i", "k", "text"]).repartition(nparts)
    out = FL.throttle_size(
        df, key="k", byte_limit=100, window_seconds=3600, order_cols=["i"]
    )
    got = sorted((r.k, r.i) for r in out.collect())
    assert got == _brute_throttle_size(rows, 100) == [("a", 0), ("b", 3), ("b", 4)]


def test_throttle_plan_has_partition_prelimit(spark):
    """The first window must be keyed by SPARK_PARTITION_ID — no global
    single-task window over the raw stream."""
    import datetime as dt

    from tests.test_plan_quality import plan_of

    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1), 1)], ["ts", "i"]
    )
    out = FL.throttle(df, rate=1.0, window_seconds=10, order_cols=["i"])
    plan = plan_of(out, "simple")
    assert "SPARK_PARTITION_ID" in plan.upper(), plan
    assert plan.count("Window") >= 2, plan


def test_dlq_split_first_match_and_partition(spark):
    """Ordered first-failing-check reason; clean+dlq partition the
    input exactly; NULL check results count as passing."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.route import DlqCheck, dlq_split

    df = spark.createDataFrame(
        [(1, "", "a"), (2, "x", None), (3, "x", "bad"), (4, "x", "ok")],
        ["i", "txt", "status"],
    )
    clean, dlq = dlq_split(
        df,
        [
            DlqCheck("empty", F.col("txt") == ""),
            # row 2: NULL comparison result must count as passing
            DlqCheck("bad_status", F.col("status") == "bad"),
            # row 1 also fails this one, but "empty" was first
            DlqCheck("late", F.col("i") <= 1),
        ],
    )
    got = sorted((r.i, r.dlq_reason) for r in dlq.collect())
    assert got == [(1, "empty"), (3, "bad_status")]
    assert sorted(r.i for r in clean.collect()) == [2, 4]
    assert "dlq_reason" not in clean.columns
