"""Transcript derivation parity: Spark and DuckDB must produce
byte-identical (conv_id, turn_idx, role, text, tool, ts) rows —
this underwrites every downstream oracle comparison, including the
per-turn text equality invariant."""

from __future__ import annotations

from fluent_bit_spark.transcripts import load_transcripts, oracle_cte

from tests.oracle import assert_matches_oracle


def test_transcripts_parity(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    assert_matches_oracle(df, oracle_cte() + "SELECT * FROM transcripts", sf_dir)


def test_transcripts_shape(spark, sf_dir):
    df = load_transcripts(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    ]
    n = df.count()
    assert n == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    # turn_idx dense per conversation starting at 0
    from pyspark.sql import functions as F

    agg = df.groupBy("conv_id").agg(
        F.min("turn_idx").alias("mn"),
        F.max("turn_idx").alias("mx"),
        F.count("*").alias("n"),
    )
    bad = agg.filter((F.col("mn") != 0) | (F.col("mx") != F.col("n") - 1)).count()
    assert bad == 0


def test_all_grammars_present(spark, sf_dir):
    from pyspark.sql import functions as F

    df = load_transcripts(spark, sf_dir)
    counts = {
        r["g"]: r["n"]
        for r in df.groupBy((F.length("text") % 1).alias("_"))
        .agg(F.count("*").alias("n"))
        .withColumn("g", F.lit(0))
        .collect()
    }
    assert sum(counts.values()) > 0
    # each grammar marker appears
    assert df.filter(F.col("text").startswith("10.0.")).count() > 0
    assert df.filter(F.col("text").startswith("level=")).count() > 0
    assert df.filter(F.col("text").startswith('{"id"')).count() > 0
    assert df.filter(F.col("text").startswith("<165>1 ")).count() > 0
    assert df.filter(F.col("text").startswith("k1:")).count() > 0


def test_synth_skew_and_salted_agg_invariance(spark, sf_dir):
    """hot_factor concentrates turns in few conversations; salted
    two-phase aggregation must agree exactly with the plain groupBy."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.skew import salted_agg
    from fluent_bit_spark.transcripts import synth_transcripts

    df = synth_transcripts(spark, sf_dir, replicate=2, hot_factor=10).cache()
    counts = df.groupBy("conv_id").count().collect()
    by_conv = {r.conv_id: r["count"] for r in counts}
    hot = max(by_conv.values())
    cold = min(by_conv.values())
    assert hot >= 5 * cold  # skew is real

    plain = {
        r.conv_id: (r.turns, r.bytes)
        for r in df.groupBy("conv_id")
        .agg(F.count("*").alias("turns"), F.sum(F.length("text")).alias("bytes"))
        .collect()
    }
    salted = {
        r.conv_id: (r.turns, r.bytes)
        for r in salted_agg(
            df.withColumn("tl", F.length("text")),
            "conv_id",
            {"turns": ("count", "conv_id"), "bytes": ("sum", "tl")},
            salt_buckets=8,
        ).collect()
    }
    assert plain == salted
    df.unpersist()


def test_read_transcripts_iceberg_gate(spark, sf_dir, tmp_path):
    """Missing Iceberg runtime must be an explicit error, never a
    silent parquet fallback (resume semantics differ)."""
    import pytest as _pytest

    from fluent_bit_spark.transcripts import iceberg_available, read_transcripts

    if iceberg_available(spark):
        _pytest.skip("iceberg runtime present")
    with _pytest.raises(NotImplementedError):
        read_transcripts(spark, str(tmp_path), table_format="iceberg")
    # explicit parquet path still works
    assert read_transcripts(spark, f"{sf_dir}/events.parquet").count() > 0


def test_stable_turn_order_skew_safe_equals_window(spark, sf_dir):
    """The range-sort + partition-offset ranking must reproduce the
    per-conv window row_number exactly — including under a
    pathologically hot key (half the corpus remapped to one conv) and
    across different partition counts — and clean up its helper
    columns."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.operators.dedup import release_persisted
    from fluent_bit_spark.operators.skew import (
        stable_turn_order,
        stable_turn_order_skew_safe,
    )
    from fluent_bit_spark.transcripts import load_transcripts

    df = load_transcripts(spark, sf_dir)
    hot = df.withColumn(
        "conv_id",
        F.when(F.xxhash64("conv_id") % 2 == 0, F.lit("conv-hot")).otherwise(
            F.col("conv_id")
        ),
    )
    for frame in (df, hot):
        want = stable_turn_order(frame).select(
            "conv_id", "turn_idx", "turn_rank"
        )
        for parts in (3, 17):
            got = stable_turn_order_skew_safe(frame, partitions=parts)
            assert set(got.columns) == set(frame.columns) | {"turn_rank"}
            diff = (
                got.select("conv_id", "turn_idx", "turn_rank")
                .exceptAll(want)
                .count()
                + want.exceptAll(
                    got.select("conv_id", "turn_idx", "turn_rank")
                ).count()
            )
            release_persisted()
            assert diff == 0, (parts, diff)
    # empty input: no driver-side offsets, still shaped correctly
    empty = stable_turn_order_skew_safe(df.filter(F.lit(False)))
    assert empty.count() == 0 and "turn_rank" in empty.columns
    release_persisted()
