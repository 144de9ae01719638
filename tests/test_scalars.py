from __future__ import annotations

from pyspark.sql import functions as F

from fluent_bit_spark.functions import scalars as SC


def test_url_normalize(spark):
    rows = [
        (1, "/users/12345/orders/99?page=2"),
        (2, "/files/550e8400-e29b-41d4-a716-446655440000/meta"),
        (3, "/static/app.js"),
        (4, "/blob/deadbeefdeadbeefdeadbeef"),
    ]
    df = spark.createDataFrame(rows, ["id", "url"])
    got = {r.id: r.u for r in df.select("id", SC.url_normalize(F.col("url")).alias("u")).collect()}
    assert got == {
        1: "/users/*/orders/*",
        2: "/files/*/meta",
        3: "/static/app.js",
        4: "/blob/*",
    }


def test_sha_uri_mysql(spark):
    df = spark.createDataFrame([(1, "a b", r"it\'s \"ok\"")], ["id", "s", "q"])
    row = df.select(
        SC.sha512_hex(F.col("s")).alias("h"),
        SC.uri_encode(F.col("s")).alias("e"),
        SC.uri_decode(SC.uri_encode(F.col("s"))).alias("rt"),
        SC.decode_mysql_quoted(F.col("q")).alias("mq"),
    ).collect()[0]
    assert len(row.h) == 128 and row.rt == "a b" and row.e in ("a+b", "a%20b")
    assert row.mq == 'it\'s "ok"'
