"""Run every __spark_entry__ query against its DuckDB oracle at
sf0.001 — the same comparison the driver performs at sf0.01."""

from __future__ import annotations

import importlib.util
import sys

import pytest

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)

from tests.oracle import assert_matches_oracle

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


# every query is oracle-checked since the md5-based cross-engine
# signature rework (round 2); the set stays for future genuinely
# non-SQL-expressible ops.
ROWS_ONLY: set[str] = set()


def test_every_query_has_oracle():
    missing = set(QUERIES) - set(ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLES:
        pytest.skip("rows-only query")
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
