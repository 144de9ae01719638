"""Stream-processor SQL engine tests, modeled on the reference's
tests/internal/stream_processor.c (select/where variants :576-691,
subkeys :899-970, windows+GROUP BY+forecast :1342-1392, snapshots
:1583-1603, invalid queries :974-984) over a samples.json-shaped
corpus (ragged keys, string-typed number)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from fluent_bit_spark.sp import SpEngine, SpSqlError
from fluent_bit_spark.sp.parser import SpParseError, parse


@pytest.fixture(scope="module")
def engine(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        # id, word1, word2, word3, bytes, bool, usage, ts, tag
        Row(id=0, word1="alpha", word2=None, word3=None, bytes=10.0, flag=True, usage=1, ts=base, tag="samples.a"),
        Row(id=1, word1=None, word2="beta", word3=None, bytes=2.0, flag=False, usage=2, ts=base + dt.timedelta(seconds=1), tag="samples.a"),
        Row(id=2, word1="gamma", word2=None, word3="x", bytes=None, flag=None, usage=3, ts=base + dt.timedelta(seconds=2), tag="samples.b"),
        Row(id=3, word1=None, word2=None, word3="y", bytes="10.30", flag=True, usage=4, ts=base + dt.timedelta(seconds=3), tag="other.c"),
        Row(id=4, word1="delta", word2="eps", word3=None, bytes=5.0, flag=False, usage=5, ts=base + dt.timedelta(seconds=11), tag="samples.a"),
    ]
    df = spark.createDataFrame(rows)
    eng = SpEngine(spark, {"samples": df}, now=dt.datetime(2024, 6, 1, 12, 0, 0))
    return eng


def test_select_star(engine):
    out = engine.execute("SELECT * FROM STREAM:samples;")
    assert out.count() == 5 and "word1" in out.columns


def test_select_keys_missing_silently_null(engine):
    out = engine.execute("SELECT id, word9 FROM STREAM:samples;")
    rows = out.collect()
    assert out.columns == ["id", "word9"] and all(r.word9 is None for r in rows)


def test_where_comparison_and_bool(engine):
    # row 3's bytes is the STRING "10.30" — numeric coercion includes it
    out = engine.execute("SELECT id FROM STREAM:samples WHERE bytes >= 5 AND flag = true;")
    assert sorted(r.id for r in out.collect()) == [0, 3]


def test_where_string_number_coercion(engine):
    # "10.30" (string) must compare numerically (flb_sp.c:346)
    out = engine.execute("SELECT id FROM STREAM:samples WHERE bytes > 10.1;")
    assert sorted(r.id for r in out.collect()) == [3]


def test_where_is_null_and_contains(engine):
    out = engine.execute("SELECT id FROM STREAM:samples WHERE word1 IS NOT NULL;")
    assert sorted(r.id for r in out.collect()) == [0, 2, 4]
    out = engine.execute("SELECT id FROM STREAM:samples WHERE @record.contains(word2);")
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_where_not_parens_or(engine):
    out = engine.execute(
        "SELECT id FROM STREAM:samples WHERE NOT (flag = true) AND (usage = 2 OR usage = 5);"
    )
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_limit(engine):
    assert engine.execute("SELECT id FROM STREAM:samples LIMIT 2;").count() == 2


def test_aggregates_global(engine):
    out = engine.execute(
        "SELECT MIN(usage), MAX(usage), SUM(bytes), AVG(bytes), COUNT(*) FROM STREAM:samples;"
    ).collect()[0]
    assert out["MIN(usage)"] == 1 and out["MAX(usage)"] == 5
    assert abs(out["SUM(bytes)"] - 27.3) < 1e-9
    assert abs(out["AVG(bytes)"] - 27.3 / 4) < 1e-9
    assert out["COUNT(*)"] == 5


def test_count_key_skips_nulls(engine):
    out = engine.execute("SELECT COUNT(bytes) AS n FROM STREAM:samples;").collect()[0]
    assert out.n == 4


def test_group_by_with_alias(engine):
    out = engine.execute(
        "SELECT flag, SUM(usage) AS total FROM STREAM:samples GROUP BY flag;"
    )
    got = {r.flag: r.total for r in out.collect()}
    assert got == {True: 5.0, False: 7.0, None: 3.0}


def test_aggregate_bare_key_mix_rejected(engine):
    with pytest.raises(SpSqlError):
        engine.execute("SELECT word1, SUM(bytes) FROM STREAM:samples;")


def test_tumbling_window(engine):
    out = engine.execute(
        "SELECT COUNT(*) AS n FROM STREAM:samples WINDOW TUMBLING (10 SECOND);"
    )
    got = {r.window_start.second: r.n for r in out.collect()}
    assert got == {0: 4, 10: 1}


def test_hopping_window(engine):
    out = engine.execute(
        "SELECT COUNT(*) AS n FROM STREAM:samples WINDOW HOPPING (10 SECOND, ADVANCE BY 5 SECOND);"
    )
    rows = {(r.window_start.second - (60 if r.window_start.minute == 59 else 0)): r.n
            for r in out.collect()}
    # windows: [-5,5)=3? -> starts at :55(prev min) 2 rows(0,1,2? ts 0,1,2,3 in [55,05): all 4 w/ ts<5 -> ids 0..3)
    assert rows[0] == 4  # [0,10) -> ids 0..3
    assert rows[5] == 1 and rows[10] == 1  # [5,15) and [10,20) -> id 4


def test_record_and_time_fns(engine):
    out = engine.execute(
        "SELECT id, RECORD_TAG() AS t, RECORD_TIME() AS rt, NOW() AS now, UNIX_TIMESTAMP() AS ut FROM STREAM:samples LIMIT 1;"
    ).collect()[0]
    assert out.t == "samples.a" and out.now == "2024-06-01 12:00:00"
    assert isinstance(out.rt, float) and out.ut > 1_700_000_000


def test_tag_source_glob(engine):
    out = engine.execute("SELECT id FROM STREAM:samples WHERE flag = false;")
    assert out.count() == 2
    out = engine.execute("SELECT id FROM TAG:'samples.*';")
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 4]


def test_create_stream_chaining(engine):
    engine.execute(
        "CREATE STREAM hot WITH (tag='hot') AS SELECT id, usage FROM STREAM:samples WHERE usage >= 3;"
    )
    out = engine.execute("SELECT id FROM STREAM:hot;")
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]
    tagged = engine.streams["hot"]
    assert tagged.select("tag").distinct().collect()[0].tag == "hot"


def test_forecast(engine, spark):
    # y = 2x + 1 exactly -> forecast at max(x)+10 = 2*14+1 = 29
    rows = [Row(x=float(i), y=2.0 * i + 1.0, ts=dt.datetime(2024, 1, 1)) for i in range(5)]
    engine.register("lin", spark.createDataFrame(rows))
    out = engine.execute(
        "SELECT TIMESERIES_FORECAST(x, y, 10) AS fc FROM STREAM:lin;"
    ).collect()[0]
    assert abs(out.fc - 29.0) < 1e-6
    out = engine.execute("SELECT FORECAST_R(x, y, 29, 100) AS fx FROM STREAM:lin;").collect()[0]
    assert abs(out.fx - 14.0) < 1e-6


def test_snapshot_flush(engine):
    engine.execute("CREATE SNAPSHOT snap WITH (limit='3') AS SELECT * FROM STREAM:samples;")
    out = engine.execute("FLUSH SNAPSHOT snap;")
    assert sorted(r.id for r in out.collect()) == [2, 3, 4]  # latest 3 by ts


def test_flush_unknown_snapshot(engine):
    with pytest.raises(SpSqlError):
        engine.execute("FLUSH SNAPSHOT nope;")


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT FROM STREAM:samples;",
        "SELECT id FROM samples;",
        "SELECT id FROM STREAM:samples WHERE;",
        "SELECT id FROM STREAM:samples WINDOW SLIDING (5 SECOND);",
        "SELECT id FROM STREAM:samples GROUP BY;",
        "SELECT MAX(*) FROM STREAM:samples;",
        "SELECT id FROM STREAM:samples LIMIT x;",
        "CREATE STREAM x AS;",
    ],
)
def test_invalid_queries_rejected(bad):
    with pytest.raises((SpParseError, SpSqlError)):
        parse(bad)


def test_subkey_access(spark):
    rows = [
        Row(id=0, payload={"s": {"t": "v1"}}, ts=dt.datetime(2024, 1, 1), tag="x"),
        Row(id=1, payload={"s": {"t": "v2"}}, ts=dt.datetime(2024, 1, 1), tag="x"),
    ]
    df = spark.createDataFrame(rows)
    eng = SpEngine(spark, {"sub": df})
    out = eng.execute("SELECT id, payload['s']['t'] AS v FROM STREAM:sub;")
    assert {r.id: r.v for r in out.collect()} == {0: "v1", 1: "v2"}


def test_sp_engine_on_streaming_frame(spark, tmp_path_factory):
    """The compiled plans are pure column transforms, so the same SP
    SQL runs under Structured Streaming (the reference's native mode)."""
    import datetime as dt

    d = str(tmp_path_factory.mktemp("sp-stream"))
    rows = [Row(id=i, grp="g" + str(i % 3), usage=i, ts=dt.datetime(2024, 1, 1, 0, 0, i)) for i in range(30)]
    batch = spark.createDataFrame(rows)
    batch.coalesce(1).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(batch.schema).parquet(d)
    eng = SpEngine(spark, {"s": stream})
    out = eng.execute("SELECT grp, COUNT(*) AS n, SUM(usage) AS total FROM STREAM:s GROUP BY grp;")
    q = out.writeStream.outputMode("complete").format("memory").queryName("sp_stream").start()
    try:
        q.processAllAvailable()
        got = {r.grp: (r.n, r.total) for r in spark.sql("SELECT * FROM sp_stream").collect()}
    finally:
        q.stop()
    eng2 = SpEngine(spark, {"s": batch})
    want = {
        r.grp: (r.n, r.total)
        for r in eng2.execute(
            "SELECT grp, COUNT(*) AS n, SUM(usage) AS total FROM STREAM:s GROUP BY grp;"
        ).collect()
    }
    assert got == want


def test_snapshot_time_ring(engine):
    # newest record is at +11s; a 5-second ring retains only it
    engine.execute(
        "CREATE SNAPSHOT ring WITH (seconds='5') AS SELECT * FROM STREAM:samples;"
    )
    out = engine.execute("FLUSH SNAPSHOT ring;")
    assert sorted(r.id for r in out.collect()) == [4]


def test_snapshot_time_ring_wider(engine):
    # a 60-second ring spans every sample (newest-relative retention)
    engine.execute(
        "CREATE SNAPSHOT ring60 WITH (seconds='60') AS SELECT * FROM STREAM:samples;"
    )
    out = engine.execute("FLUSH SNAPSHOT ring60;")
    assert out.count() == 5


def test_snapshot_time_and_count_ring(engine):
    # seconds+limit compose: 60s ring then latest-2
    engine.execute(
        "CREATE SNAPSHOT ringc WITH (seconds='60', limit='2') AS SELECT * FROM STREAM:samples;"
    )
    out = engine.execute("FLUSH SNAPSHOT ringc;")
    assert sorted(r.id for r in out.collect()) == [3, 4]


def test_sp_tumbling_on_stream_matches_batch(spark, sf_dir, tmp_path):
    """SP SQL over a STREAMING source: TUMBLING window + GROUP BY with
    a watermark produces exactly the batch answer once drained."""
    from fluent_bit_spark.sp import SpEngine

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = str(tmp_path / "ev")
    events.coalesce(2).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    sql = (
        "SELECT event_type, COUNT(*) AS n FROM STREAM:events "
        "WINDOW TUMBLING (1 HOUR) GROUP BY event_type;"
    )
    seng = SpEngine(spark, {"events": stream}, watermark="2 hours")
    out = seng.execute(sql)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sp_stream_tumbling")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.event_type, r.window_start): r.n
            for r in spark.sql("SELECT * FROM sp_stream_tumbling").collect()
        }
    finally:
        q.stop()
    beng = SpEngine(spark, {"events": events})
    want = {
        (r.event_type, r.window_start): r.n for r in beng.execute(sql).collect()
    }
    assert got == want


def test_sp_hopping_on_stream_matches_batch(spark, sf_dir, tmp_path):
    from fluent_bit_spark.sp import SpEngine

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = str(tmp_path / "ev2")
    events.coalesce(2).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    sql = (
        "SELECT COUNT(*) AS n FROM STREAM:events "
        "WINDOW HOPPING (2 HOUR, ADVANCE BY 1 HOUR);"
    )
    out = SpEngine(spark, {"events": stream}, watermark="4 hours").execute(sql)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sp_stream_hopping")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.window_start: r.n
            for r in spark.sql("SELECT * FROM sp_stream_hopping").collect()
        }
    finally:
        q.stop()
    want = {
        r.window_start: r.n
        for r in SpEngine(spark, {"events": events}).execute(sql).collect()
    }
    assert got == want


def test_sp_create_stream_on_streaming_source(spark, sf_dir, tmp_path):
    """CREATE STREAM chaining works on a streaming frame: the derived
    stream stays streaming and carries the tag property."""
    from fluent_bit_spark.sp import SpEngine

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    src_dir = str(tmp_path / "ev3")
    events.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    eng = SpEngine(spark, {"events": stream})
    derived = eng.execute(
        "CREATE STREAM big WITH (tag='sp.big') AS "
        "SELECT event_id, value FROM STREAM:events WHERE value >= 100;"
    )
    assert derived.isStreaming and "big" in eng.streams
    q = derived.writeStream.format("memory").queryName("sp_big").start()
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sp_big").collect()
    finally:
        q.stop()
    want = events.filter("value >= 100").count()
    assert len(rows) == want and all(r.tag == "sp.big" for r in rows)
