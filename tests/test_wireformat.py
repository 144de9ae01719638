"""Wire-codec tests: canonical spec vectors (hand-derived from the
msgpack spec and the Avro binary-encoding spec) plus Spark-level
roundtrips — the vectors pin the actual byte layout, so a symmetric-
but-wrong codec cannot pass."""

from __future__ import annotations

import pytest

from fluent_bit_spark.functions.wire import (
    avro_decode,
    avro_encode,
    msgpack_pack,
    msgpack_unpack,
    pack_event,
    pack_eventtime,
    unpack_event,
)


class TestMsgpackVectors:
    def test_spec_example(self):
        # THE canonical example from msgpack.org
        assert (
            msgpack_pack({"compact": True, "schema": 0}).hex()
            == "82a7636f6d70616374c3a6736368656d6100"
        )

    @pytest.mark.parametrize(
        "value,hexpect",
        [
            (None, "c0"),
            (True, "c3"),
            (False, "c2"),
            (0, "00"),
            (127, "7f"),
            (128, "cc80"),
            (255, "ccff"),
            (256, "cd0100"),
            (65535, "cdffff"),
            (65536, "ce00010000"),
            (-1, "ff"),
            (-32, "e0"),
            (-33, "d0df"),
            (-129, "d1ff7f"),
            (1.5, "cb3ff8000000000000"),
            ("", "a0"),
            ("abc", "a3616263"),
            ("a" * 31, "bf" + "61" * 31),
            ("a" * 32, "d920" + "61" * 32),
            (b"\x01\x02", "c40201020102"[:8]),
            ([1, 2], "920102"),
            ({}, "80"),
        ],
    )
    def test_scalar_vectors(self, value, hexpect):
        assert msgpack_pack(value).hex() == hexpect

    @pytest.mark.parametrize(
        "value",
        [None, True, 0, 127, 128, 70000, -5, -1000, 1.25, "héllo",
         ["a", 1, None], {"k": [1, {"x": False}]}, b"\x00\xff"],
    )
    def test_roundtrip(self, value):
        got, pos = msgpack_unpack(msgpack_pack(value))
        assert got == value and pos == len(msgpack_pack(value))

    def test_eventtime_matches_flb_time_layout(self):
        # fixext8(0xd7) type 0, 4B sec BE + 4B nsec BE
        # (src/flb_time.c flb_time_append_to_msgpack)
        assert (
            pack_eventtime(0x01020304, 0x0A0B0C0D).hex()
            == "d700010203040a0b0c0d"
        )

    def test_event_envelope(self):
        buf = pack_event(100, 500, {"k": "v"})
        assert buf[0] == 0x92  # fixarray2
        sec, nsec, rec = unpack_event(buf)
        assert (sec, nsec, rec) == (100, 500, {"k": "v"})


class TestAvroVectors:
    SCHEMA = [
        ("a", "long"),
        ("b", "string"),
        ("c", ["null", "string"]),
        ("d", "boolean"),
        ("e", "double"),
    ]

    def test_spec_vector(self):
        # zigzag(1)=02 ; "foo"=06 66 6f 6f (the Avro spec's own
        # example values); union null branch = 00; true = 01;
        # double 1.0 little-endian
        buf = avro_encode(
            {"a": 1, "b": "foo", "c": None, "d": True, "e": 1.0},
            self.SCHEMA,
        )
        assert buf.hex() == "0206666f6f0001000000000000f03f"

    def test_union_value_branch(self):
        buf = avro_encode(
            {"a": -1, "b": "", "c": "x", "d": False, "e": 0.0},
            self.SCHEMA,
        )
        # zigzag(-1)=01 ; empty string 00 ; union idx 1 = 02 then "x"
        assert buf.hex().startswith("010002027800")

    @pytest.mark.parametrize("v", [0, 1, -1, 63, 64, -64, -65, 2**40, -(2**40)])
    def test_zigzag_roundtrip(self, v):
        schema = [("x", "long")]
        assert avro_decode(avro_encode({"x": v}, schema), schema)["x"] == v

    def test_null_in_required_field_raises(self):
        with pytest.raises(ValueError):
            avro_encode({"a": None, "b": "", "c": None, "d": False, "e": 0.0},
                        self.SCHEMA)


class TestSparkRoundtrips:
    def test_msgpack_preserves_rows_and_sizes(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.wireformat import msgpack_roundtrip

        df = spark.createDataFrame(
            [("c1", 0, "user", "hi", None, "2024-01-01 00:00:00.000001"),
             ("c1", 200, "assistant", "x" * 40, "bash", "2024-01-01 01:00:00")],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r["turn_idx"]: r for r in msgpack_roundtrip(df).collect()}
        assert out[0]["tool"] is None and out[0]["ts"].microsecond == 1
        # row 0: fixed 44 + conv_id(1+2) + turn 1 + role(1+4) + text(1+2)
        #        + tool nil 1
        assert out[0]["n_bytes"] == 44 + 3 + 1 + 5 + 3 + 1
        # row 2: text 40 bytes -> str8 header (2); turn 200 -> uint8 (2)
        assert out[200]["n_bytes"] == 44 + 3 + 2 + 10 + 42 + 5
        assert out[200]["text"] == "x" * 40

    def test_avro_preserves_rows(self, spark):
        from pyspark.sql import functions as F
        from fluent_bit_spark.operators.wireformat import avro_roundtrip

        df = spark.createDataFrame(
            [("c1", 5, "user", "héllo", "grep", "2024-06-01 12:34:56.789012")],
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        [r] = avro_roundtrip(df).collect()
        assert r["text"] == "héllo" and r["tool"] == "grep"
        assert r["ts"].microsecond == 789012
