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


def test_parse_span_group_derivations_match_per_group_regex(spark):
    """The apache pc / syslog ps span-group derivations must equal the
    per-group regexp_extract definition on adversarial lines: empty
    smsg, whitespace-only smsg, smsgid='-', smsg starting with '- ',
    smsg with interior runs of spaces, and non-matching detections."""
    from pyspark.sql import functions as F

    from fluent_bit_spark.plans.flagship import (
        APACHE_RE,
        SYSLOG_RE,
        parse_stage,
    )
    import re

    lines = [
        # apache: normal, /api path, malformed (detection ok, match fail)
        'h1 - u1 [10/Oct/2000:13:55:36 +0000] "GET /api/x HTTP/1.1" 200 5',
        'h2 - u2 [10/Oct/2000:13:55:37 +0000] "POST /y HTTP/1.1" 500 0',
        "h3 - u3 [broken",
        # syslog: normal, smsgid='-', empty smsg, whitespace smsg,
        # smsg starting '- ', interior double space, match fail
        "<5>1 t1 host app 1 mid - hello world",
        "<6>1 t2 host app 2 - - msg after dash id",
        "<7>1 t3 host app 3 mid - ",
        "<8>1 t4 host app 4 mid -   ",
        "<9>1 t5 host app 5 mid - - leading dash",
        "<10>1 t6 host app 6 mid - a  b",
        "<11>bad syslog line",
        # other formats
        "level=info msg=\"evt ok\" latency_cents=3",
        '{"id": 1, "word1": "w", "bytes": 2, "usage": 3}',
        "plain chat text",
    ]
    df = spark.createDataFrame(
        [(i, l) for i, l in enumerate(lines)], "turn_idx long, text string"
    )
    out = parse_stage(df).select("turn_idx", "text", "fmt", "path", "code", "pri", "smsg")
    apache_re = re.compile(APACHE_RE.replace("?P<", "?<").replace("?<", "?P<"))
    syslog_re = re.compile(SYSLOG_RE)
    for r in out.collect():
        am = apache_re.match(r.text) if r.fmt == "apache" else None
        sm = syslog_re.match(r.text) if r.fmt == "syslog" else None
        want_path = (am.group("path") or None) if am else None
        want_code = int(am.group("code")) if am else None
        want_pri = int(sm.group("pri")) if sm else None
        want_smsg = (sm.group("smsg") or None) if sm else None
        assert r.path == want_path, (r.text, r.path, want_path)
        assert r.code == want_code, (r.text, r.code, want_code)
        assert r.pri == want_pri, (r.text, r.pri, want_pri)
        assert r.smsg == want_smsg, (r.text, r.smsg, want_smsg)
