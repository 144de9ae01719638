"""Regression tests for the round-1 ADVICE findings: modify-condition
single-matching-column crash, single-pass unescape semantics, unnamed
regex capture groups, and rewrite_tag first-matching-rule semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions import scalars as SC
from fluent_bit_spark.operators import filters as FL
from fluent_bit_spark.operators import parse as P
from fluent_bit_spark.operators.route import RewriteRule, rewrite_tag


@pytest.fixture(scope="module")
def records(spark):
    rows = [
        ("a1", "GET /index.html", 200, "alice", None),
        ("a2", "POST /login", 500, "bob", "x"),
        ("a3", "GET /health", 200, None, None),
    ]
    return spark.createDataFrame(rows, ["id", "request", "code", "user", "extra"])


# --- modify conditions with exactly one matching column (ADVICE #1) --------

def test_a_key_matches_single_column(records):
    # regex '^user$' matches exactly one column: used to crash F.greatest
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [FL.Condition("a_key_matches", "^user$")],
    )
    got = {r.id: r.mark for r in out.collect()}
    assert got == {"a1": "1", "a2": "1", "a3": None}  # a3.user is null


def test_no_key_matches_single_column(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [FL.Condition("no_key_matches", "^extra$")],
    )
    got = {r.id: r.mark for r in out.collect()}
    assert got == {"a1": "1", "a2": None, "a3": "1"}


def test_matching_keys_have_matching_values_single_column(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [FL.Condition("matching_keys_have_matching_values", "^request$", "^GET ")],
    )
    got = {r.id: r.mark for r in out.collect()}
    assert got == {"a1": "1", "a2": None, "a3": "1"}


def test_matching_keys_do_not_have_matching_values_single_column(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [
            FL.Condition(
                "matching_keys_do_not_have_matching_values", "^request$", "^GET "
            )
        ],
    )
    got = {r.id: r.mark for r in out.collect()}
    assert got == {"a1": None, "a2": "1", "a3": None}


def test_a_key_matches_no_columns(records):
    out = FL.modify(
        records,
        [FL.ModifyRule("set", "mark", "1")],
        [FL.Condition("a_key_matches", "^nosuch$")],
    )
    assert all(r.mark is None for r in out.collect())


# --- single-pass unescape (ADVICE #2) --------------------------------------

def test_decode_field_escaped_backslash_then_n(spark):
    # chars: a \ \ n b  -> single-pass left-to-right: a \ n b (literal)
    df = spark.createDataFrame([("a\\\\nb",), ("x\\ny",), ("q\\\\\\tz",)], ["f"])
    from fluent_bit_spark.operators.parse import decode_field_escaped

    got = [r.f for r in decode_field_escaped(df, "f").collect()]
    assert got[0] == "a\\nb"  # \\ -> \, then literal n
    assert got[1] == "x\ny"  # \n -> newline
    assert got[2] == "q\\\tz"  # \\ -> \, then \t -> tab


def test_decode_mysql_quoted_single_pass(spark):
    df = spark.createDataFrame([("a\\\\'b",), ("it\\'s",)], ["q"])
    got = [
        r.d
        for r in df.select(SC.decode_mysql_quoted(F.col("q")).alias("d")).collect()
    ]
    assert got[0] == "a\\'b"  # \\ -> \, then literal '
    assert got[1] == "it's"  # \' -> '


# --- unnamed capture groups (ADVICE #3) ------------------------------------

def test_regex_native_with_unnamed_group(spark):
    # pattern has a plain group BEFORE the named ones; indices must not shift
    pat = r"^(\w+) (?<verb>\w+) (?<path>\S+)$"
    df = spark.createDataFrame([("x1 GET /a",)], ["text"])
    cols = P.regex_extract_native(F.col("text"), pat)
    row = df.select(*cols.values()).collect()[0]
    assert (row.verb, row.path) == ("GET", "/a")


def test_regex_arrow_with_unnamed_group(spark):
    pat = r"^(\w+) (?<verb>\w+) (?<path>\S+)$"
    df = spark.createDataFrame([("x1 GET /a",), ("nope",)], ["text"])
    out = P.apply_regex_parser(df, pat, backend="arrow")
    rows = out.orderBy("text").collect()
    got = {r.text: (r.verb, r.path) for r in rows}
    assert got["x1 GET /a"] == ("GET", "/a")
    assert got["nope"] == (None, None)


# --- rewrite_tag first-matching-rule (ADVICE #4) ---------------------------

def test_rewrite_tag_keep_then_nonkeep_first_match_wins(spark):
    df = spark.createDataFrame(
        [("r1", "app.a"), ("r2", "app.b")], ["id", "tag"]
    )
    rules = [
        # r1 matches BOTH rules; reference stops at the first (keep):
        # original kept + one copy under kept.r1 — NOT also rewritten.
        RewriteRule(F.col("id") == "r1", F.lit("kept.r1"), keep=True),
        RewriteRule(F.col("tag").startswith("app."), F.lit("rewritten"), keep=False),
    ]
    got = sorted((r.id, r.tag) for r in rewrite_tag(df, rules).collect())
    assert got == [("r1", "app.a"), ("r1", "kept.r1"), ("r2", "rewritten")]


def test_rewrite_tag_nonkeep_then_keep_first_match_wins(spark):
    df = spark.createDataFrame([("r1", "app.a")], ["id", "tag"])
    rules = [
        RewriteRule(F.col("tag").startswith("app."), F.lit("rewritten"), keep=False),
        # would match too, but the first rule already did -> no copy
        RewriteRule(F.col("id") == "r1", F.lit("copied"), keep=True),
    ]
    got = sorted((r.id, r.tag) for r in rewrite_tag(df, rules).collect())
    assert got == [("r1", "rewritten")]


# --- Decode_Field merge mode (parser-decoder parity) ------------------------

def test_decode_field_json_merge_keeps_raw(spark):
    from fluent_bit_spark.operators.parse import decode_field_as_json, decode_field_json

    df = spark.createDataFrame([('{"a": 1, "b": "x"}',), ("nope",)], ["log"])
    merged = decode_field_json(df, "log", "a BIGINT, b STRING")
    rows = {r.log: (r.a, r.b) for r in merged.collect()}
    assert set(merged.columns) == {"log", "a", "b"}  # raw field preserved
    assert rows['{"a": 1, "b": "x"}'] == (1, "x")
    assert rows["nope"] == (None, None)
    # contrast: As-mode replaces the field value
    replaced = decode_field_as_json(df, "log", "a BIGINT, b STRING")
    assert dict(replaced.dtypes)["log"].startswith("struct")


def test_decode_field_json_merge_prefix(spark):
    from fluent_bit_spark.operators.parse import decode_field_json

    df = spark.createDataFrame([('{"a": 7}',)], ["log"])
    out = decode_field_json(df, "log", "a BIGINT", prefix="dec_")
    assert out.collect()[0].dec_a == 7 and "log" in out.columns
