"""Reference-exact MurmurHash3_x64_128 (ES Generate_ID parity).

The hard-coded vectors were produced by compiling the reference's
public-domain murmur3 implementation (plugins/out_es/murmur3.c) together
with the es.c UUID formatting (es.c:488-494, seed 42) and running it on
the inputs below — i.e. they are the reference's actual output bytes,
regenerable with:

    gcc -O2 vecgen.c /root/reference/plugins/out_es/murmur3.c

Tail-length coverage: 0 (empty and the exact-one-block input), 1, 5, 8
(the k2/k1 switch boundary), 11 (>8, k2 path), plus multi-block bodies.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from fluent_bit_spark.functions.hashing import (
    es_uuid_batch,
    murmur3_x64_128_batch,
)

VECTORS = [
    ("", "8523fa1b-a77d-f02a-cbb9-da116610d101"),
    ("a", "26b0fdf6-9ca4-2825-2b15-25f8ca9125eb"),
    ("hello", "6f0860af-b3c9-c4b8-bc7a-b0efb8752334"),
    ("hello world", "78c047fc-92b7-c052-9315-19e5ab5e85bd"),
    (
        "The quick brown fox jumps over the lazy dog",
        "d5d7fe0b-cf93-740d-5c8f-ec706cf4c454",
    ),
    ("0123456789abcdef", "b2a4ed3c-a26b-818e-9fde-f926d245f604"),
    ("0123456789abcdef0", "63e3f71d-2273-66fb-eeee-978e3661c5a3"),
    (
        '{"conv_id":"c-1","turn_idx":3,"role":"user","text":"hi"}',
        "87022854-7c38-cbec-037c-575091865a77",
    ),
]


def test_reference_vectors_batch():
    got = es_uuid_batch([v for v, _ in VECTORS])
    assert got == [u for _, u in VECTORS]


@pytest.mark.parametrize("inp,expected", VECTORS)
def test_reference_vectors_singleton(inp, expected):
    # Singleton batches (different padding widths) agree with the batch.
    assert es_uuid_batch([inp]) == [expected]


@given(
    st.lists(st.binary(min_size=0, max_size=80), min_size=1, max_size=20)
)
@settings(max_examples=60, deadline=None)
def test_batch_equals_singletons(vals):
    """Mixed-length batching (shared padding, masked body rounds) must
    not change any row's digest vs hashing it alone."""
    bh1, bh2 = murmur3_x64_128_batch(vals)
    for i, v in enumerate(vals):
        s1, s2 = murmur3_x64_128_batch([v])
        assert (bh1[i], bh2[i]) == (s1[0], s2[0])


def test_bytes_and_str_utf8_agree():
    s = "héllo wörld ✓"
    b1, _ = murmur3_x64_128_batch([s])
    b2, _ = murmur3_x64_128_batch([s.encode("utf-8")])
    assert b1[0] == b2[0]


def test_empty_batch():
    h1, h2 = murmur3_x64_128_batch([])
    assert h1.shape == (0,) and h2.shape == (0,)
    assert h1.dtype == np.uint64


def test_es_sink_murmur3_ids(spark):
    from fluent_bit_spark.sinks import es_logstash_index
    import pyspark.sql.functions as F

    import datetime as dt

    # fixed-instant construction (epoch micros): the instant must not
    # depend on the session TZ or the TZ-invariance check below would
    # compare different instants
    epoch_us = int(
        dt.datetime(
            2026, 8, 17, 12, 0, 0, tzinfo=dt.timezone.utc
        ).timestamp()
        * 1_000_000
    )
    df = spark.createDataFrame(
        [("c-1", 3, "user", "hi"), ("c-2", 1, "assistant", "yo")],
        "conv_id string, turn_idx int, role string, text string",
    ).withColumn("ts", F.timestamp_micros(F.lit(epoch_us)))
    out = es_logstash_index(df, prefix="fluent", id_mode="murmur3")
    rows = {r["conv_id"]: r for r in out.collect()}
    assert rows["c-1"]["_index"] == "fluent-2026.08.17"
    # _id == murmur3-UUID of the TZ-normalized serialization (ts as
    # unix micros, other columns via to_json).
    fields = [
        F.unix_micros("ts").alias("ts") if c == "ts" else F.col(c)
        for c in df.columns
    ]
    ser = {
        r["conv_id"]: r["js"]
        for r in df.select(
            "conv_id", F.to_json(F.struct(*fields)).alias("js")
        ).collect()
    }
    for cid, row in rows.items():
        assert row["_id"] == es_uuid_batch([ser[cid]])[0]
    # Deterministic across runs AND across session timezones (the
    # serialization must not depend on spark.sql.session.timeZone).
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        shifted = {
            r["conv_id"]: r["_id"]
            for r in es_logstash_index(
                df, prefix="fluent", id_mode="murmur3"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert shifted == {k: v["_id"] for k, v in rows.items()}


def test_es_sink_bad_mode(spark):
    from fluent_bit_spark.sinks import es_logstash_index

    df = spark.range(1)
    with pytest.raises(ValueError):
        es_logstash_index(df, id_mode="sha1")


def test_skewed_batch_bucketing():
    """A single large record must not change (or inflate) the digests
    of the small rows batched with it — and digests must equal the
    rows' singleton digests regardless of bucketing layout."""
    vals = [b"tiny", b"x" * 17, b"mid " * 100, b"BIG" * 200_000, b"", b"y" * 33]
    b1, b2 = murmur3_x64_128_batch(vals)
    for i, v in enumerate(vals):
        s1, s2 = murmur3_x64_128_batch([v])
        assert (b1[i], b2[i]) == (s1[0], s2[0])


def test_es_murmur3_nested_timestamp_tz_invariant(spark):
    """Timestamps nested in structs/arrays must also serialize
    TZ-independently in the murmur3 id path."""
    import datetime as dt
    import pyspark.sql.functions as F
    from fluent_bit_spark.sinks import es_logstash_index

    us = int(
        dt.datetime(2026, 8, 17, 12, tzinfo=dt.timezone.utc).timestamp() * 1e6
    )
    df = (
        spark.createDataFrame([("c-1",)], "conv_id string")
        .withColumn("ts", F.timestamp_micros(F.lit(us)))
        .withColumn(
            "meta",
            F.struct(
                F.timestamp_micros(F.lit(us)).alias("created"),
                F.lit("k").alias("kind"),
            ),
        )
        .withColumn("seen", F.array(F.timestamp_micros(F.lit(us))))
    )
    ids = lambda: {r.conv_id: r._id for r in es_logstash_index(df, id_mode="murmur3").collect()}  # noqa: E731
    base = ids()
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        shifted = ids()
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)
    assert shifted == base


def test_pack_chunk_validation(spark):
    import pytest
    from fluent_bit_spark.operators.packing import chunk_documents, pack_offsets

    df = spark.createDataFrame([(1, "g", "a b")], ["doc_id", "source", "text"])
    with pytest.raises(ValueError):
        pack_offsets(df, 0)
    with pytest.raises(ValueError):
        pack_offsets(df, 2.5)  # type: ignore[arg-type]
    with pytest.raises(ValueError):
        chunk_documents(df, size=4, stride=10)
