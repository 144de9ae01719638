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


def _persisted_ids(spark) -> set[int]:
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def _warm_flagship_dims(spark) -> None:
    """Materialize the flagship's session-scoped dim caches (two tiny
    lookup frames, deliberately cached for the life of the session —
    plans/flagship.py _cached_dim) so the pre-query leak snapshot
    already contains them; otherwise whichever query builds the
    pipeline FIRST is misflagged as leaking them."""
    from fluent_bit_spark.plans.flagship import role_map_dim, tool_categories_dim

    tool_categories_dim(spark).count()
    role_map_dim(spark).count()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    if name not in ORACLES:
        pytest.skip("rows-only query")
    # no persisted frames may leak past a query + release: a driver
    # session runs ~85 gated queries back to back, and un-released
    # caches crowd the storage pool (r2's ann_topk regressed 39% from
    # exactly this). Compare against a pre-query snapshot — the session
    # is shared, and OTHER test modules may hold legitimate caches.
    from fluent_bit_spark.operators.dedup import release_persisted

    _warm_flagship_dims(spark)
    before = _persisted_ids(spark)
    df = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, ORACLES[name], sf_dir)
    release_persisted()
    leaked = _persisted_ids(spark) - before
    assert not leaked, (
        f"{name} leaked persisted frame(s) {sorted(leaked)} past release_persisted()"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0


def test_gate_rotation_partitions_all_queries():
    """No query ships ungated without a schedule: the r1-r3 driver-green
    union, the round-4 prefix (_GATE_PRIORITY), the round-5 plan
    (_GATE_PRIORITY_NEXT), and the documented local-only tail exactly
    partition _all_queries() -- no orphans, no duplicates, no name
    wasted re-gating an already-green query."""
    import json
    import os

    repo = os.path.dirname(os.path.abspath(entry_mod.__file__))
    green: set[str] = set()
    for r in ("01", "02", "03"):
        path = os.path.join(repo, f"CORRECTNESS_r{r}.json")
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for k, v in json.load(f).items():
                if v.get("rows_match") and v.get("schema_match") and not v.get("err"):
                    green.add(k)

    prio = entry_mod._GATE_PRIORITY
    nxt = entry_mod._GATE_PRIORITY_NEXT
    tail = entry_mod._GATE_LOCAL_TAIL
    allq = set(entry_mod._all_queries())

    assert len(prio) == 50, "driver gate window is exactly 50"
    assert len(nxt) <= 50, "round-5 prefix must fit the 50-slot gate window"
    sets = [set(prio), set(nxt), set(tail)]
    assert all(len(s) == len(l) for s, l in zip(sets, (prio, nxt, tail))), "duplicate names"
    union = set().union(*sets)
    assert len(union) == sum(len(s) for s in sets), "lists overlap"
    assert not union - allq, f"unknown names: {union - allq}"
    assert not union & green, f"slots wasted on green queries: {union & green}"
    orphans = allq - green - union
    assert not orphans, f"queries with no gate schedule: {orphans}"
