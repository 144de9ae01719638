"""Weighted fixed-iteration PageRank (operators/graph.py)."""

from __future__ import annotations

from fluent_bit_spark.operators.graph import pagerank


def test_pagerank_hub_outranks_leaves(spark):
    # star graph: everyone links to 'hub'
    edges = spark.createDataFrame(
        [("a", "hub", 1), ("b", "hub", 1), ("c", "hub", 1), ("hub", "a", 1)],
        "src string, dst string, w long",
    )
    pr = {r.node: r.pr for r in pagerank(edges).collect()}
    assert pr["hub"] > pr["a"] > pr["b"] == pr["c"]
    assert all(v > 0 for v in pr.values())


def test_pagerank_weights_shift_mass(spark):
    # x splits 9:1 between p and q -> p must outrank q
    edges = spark.createDataFrame(
        [("x", "p", 9), ("x", "q", 1), ("p", "x", 1), ("q", "x", 1)],
        "src string, dst string, w long",
    )
    pr = {r.node: r.pr for r in pagerank(edges).collect()}
    assert pr["p"] > pr["q"]


def test_pagerank_partition_invariant(spark):
    edges = spark.createDataFrame(
        [(f"n{i}", f"n{(i*3) % 7}", 1 + i % 3) for i in range(21)],
        "src string, dst string, w long",
    )
    base = sorted((r.node, r.pr) for r in pagerank(edges).collect())
    redo = sorted(
        (r.node, r.pr) for r in pagerank(edges.repartition(7)).collect()
    )
    assert base == redo  # per-iteration rounding kills order sensitivity


def test_pagerank_empty_graph_returns_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string, w long")
    assert pagerank(edges).count() == 0
