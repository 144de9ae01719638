"""Record-accessor template tests, modeled on the reference's
tests/internal/record_accessor.c cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_bit_spark.functions.record_accessor import (
    ra_regex_match,
    ra_translate,
    regex_captures,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("errors.user.web", "alice", {"s": {"t": "v1"}}, "GET /api/x 500"),
        ("chat.ai", "bob", {"s": {"t": "v2"}}, "POST /api/y 200"),
    ]
    return spark.createDataFrame(rows, ["tag", "user", "payload", "request"])


def test_plain_key_and_literal(df):
    out = df.select(ra_translate(df, "user=$user!").alias("v")).collect()
    assert [r.v for r in out] == ["user=alice!", "user=bob!"]


def test_subkey_path(df):
    out = df.select(ra_translate(df, "$payload['s']['t']").alias("v")).collect()
    assert [r.v for r in out] == ["v1", "v2"]


def test_tag_and_tag_part(df):
    out = df.select(
        ra_translate(df, "$TAG | part1=$TAG[1] part9=$TAG[9]").alias("v")
    ).collect()
    assert out[0].v == "errors.user.web | part1=user part9="
    assert out[1].v == "chat.ai | part1=ai part9="


def test_missing_key_renders_empty(df):
    out = df.select(ra_translate(df, "[$nope]").alias("v")).collect()
    assert [r.v for r in out] == ["[]", "[]"]


def test_regex_captures(df):
    caps = regex_captures(F.col("request"), r"^(\S+) (\S+) (\d+)$", 3)
    out = df.select(ra_translate(df, "m=$1 code=$3", captures=caps).alias("v")).collect()
    assert [r.v for r in out] == ["m=GET code=500", "m=POST code=200"]


def test_ra_regex_match(df):
    m = ra_regex_match(df, "$request", r" 5\d\d$")
    assert [r.m for r in df.select(m.alias("m")).collect()] == [True, False]
    miss = ra_regex_match(df, "$nothere", r".")
    assert [r.m for r in df.select(miss.alias("m")).collect()] == [False, False]
