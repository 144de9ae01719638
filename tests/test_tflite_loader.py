"""Real .tflite flatbuffer loader tests.

Reference surface: plugins/filter_tensorflow/tensorflow.c (the filter
loads a .tflite model file and runs it over a record field). The
loader here parses the public FlatBuffers wire format + TFLite schema
with no tflite-runtime.

Independence: test_reader_parses_hand_packed_buffer builds a
flatbuffer byte-by-byte with struct.pack straight from the published
layout rules — the reader is validated against the SPEC, not against
our own writer.
"""

import struct

import numpy as np
import pytest

from fluent_bit_spark.functions.flatbuf import (
    FlatBufferReader,
    FlatBufferWriter,
)
from fluent_bit_spark.operators.tensorflow_filter import (
    QuantizedMLP,
    export_tflite_model,
    load_tflite_model,
    tensorflow_filter,
)


def _model():
    return QuantizedMLP(
        w1=[[2, -1, 5], [1, 3, -2], [-1, 2, 4]],
        b1=[10, -20, 5],
        shift1=4,
        w2=[[3, -2, 6]],
        b2=[-40],
        shift2=2,
    )


# --- flatbuffer reader vs a hand-packed spec buffer ---------------------------

def test_reader_parses_hand_packed_buffer():
    """Table {field0: u32 = 7, field1: string 'hi', field2: vector<i32>
    [3,4]} laid out by hand per the published wire format."""
    buf = bytearray()
    # [0:4] root uoffset -> table at 20
    # [4:8] no identifier, padding
    # string at 8: len 2, 'hi', NUL, pad
    # vector at 16... build forward with explicit offsets:
    #
    # pos  0: u32 root = 24          (root table at 24)
    # pos  4: string: u32 len=2      (string object at 4)
    # pos  8: 'h','i',0,pad
    # pos 12: vector: u32 count=2    (vector object at 12)
    # pos 16: i32 3
    # pos 20: i32 4
    # pos 24: table: soffset32 = -12 -> vtable at 36
    # pos 28: u32 field0 = 7
    # pos 32: uoffset to string = 4 - 32 ... must be positive (forward)
    # -> strings must come AFTER the table; redo layout:
    #
    # pos  0: u32 root = 4           (root table at 4)
    # pos  4: table soffset32 = -16  (vtable at 20)
    # pos  8: u32 field0 = 7
    # pos 12: uoffset32 field1 -> string at 32: 32-12=20
    # pos 16: uoffset32 field2 -> vector at 40: 40-16=24
    # pos 20: vtable: u16 size=10, u16 tablebytes=16
    # pos 24:   u16 off(field0)=4, u16 off(field1)=8, u16 off(field2)=12
    # pos 30: pad 2
    # pos 32: string: u32 len=2, 'h','i',0, pad1
    # pos 40: vector: u32 count=2, i32 3, i32 4
    buf += struct.pack("<I", 4)
    buf += struct.pack("<i", -16)
    buf += struct.pack("<I", 7)
    buf += struct.pack("<I", 20)
    buf += struct.pack("<I", 24)
    buf += struct.pack("<HH", 10, 16)
    buf += struct.pack("<HHH", 4, 8, 12)
    buf += b"\x00\x00"
    buf += struct.pack("<I", 2) + b"hi\x00\x00"
    buf += struct.pack("<Iii", 2, 3, 4)
    fb = FlatBufferReader(bytes(buf))
    t = fb.root()
    assert t == 4
    assert fb.scalar(t, 0, "u32") == 7
    assert fb.string(t, 1) == "hi"
    assert fb.vector_i32s(t, 2) == [3, 4]
    assert fb.field(t, 3) is None  # beyond the vtable -> default


def test_writer_reader_roundtrip_table():
    fb = FlatBufferWriter()
    s = fb.string("hello")
    v64 = fb.scalar_vector("q", 8, [-1, 2, 3])
    child = fb.table([(0, "i32", 99)])
    t = fb.table(
        [
            (0, "u32", 7),
            (1, "off", s),
            (2, "off", v64),
            (3, "i8", -5),
            (4, "off", child),
            (6, "i64", 1 << 40),
        ]
    )
    blob = fb.finish(t, b"TEST")
    assert len(blob) % 8 == 0
    r = FlatBufferReader(blob)
    assert r.file_identifier() == b"TEST"
    rt = r.root()
    assert r.scalar(rt, 0, "u32") == 7
    assert r.string(rt, 1) == "hello"
    assert r.vector_i64s(rt, 2) == [-1, 2, 3]
    assert r.scalar(rt, 3, "i8") == -5
    assert r.scalar(r.table_field(rt, 4), 0, "i32") == 99
    assert r.scalar(rt, 5, "i32", default=123) == 123  # omitted
    assert r.scalar(rt, 6, "i64") == 1 << 40
    # 8-byte payloads really are 8-aligned in the final file
    v = r.indirect(r.field(rt, 2))
    assert (v + 4) % 8 == 0


# --- tflite export/load --------------------------------------------------------

def test_tflite_roundtrip_bitexact():
    m = _model()
    blob = export_tflite_model(m)
    assert blob[4:8] == b"TFL3"
    m2 = load_tflite_model(blob)
    for a, b in ((m.w1, m2.w1), (m.b1, m2.b1), (m.w2, m2.w2), (m.b2, m2.b2)):
        assert np.array_equal(a, b)
    assert (m2.shift1, m2.shift2) == (m.shift1, m.shift2)
    x = np.array([[100, 17, 1], [5, 0, 0], [9999, 1234, 1]], dtype=np.int64)
    assert np.array_equal(m.infer(x), m2.infer(x))


def test_tflite_load_from_path(tmp_path):
    p = tmp_path / "model.tflite"
    p.write_bytes(export_tflite_model(_model()))
    m2 = load_tflite_model(str(p))
    assert m2.shift1 == 4


def test_tflite_gates():
    with pytest.raises(ValueError):
        load_tflite_model(b"\x00\x00\x00\x00NOPE garbage")
    # non-power-of-two requantize -> honest NotImplementedError
    blob = export_tflite_model(_model())
    # corrupt the scales: every 16.0f (layer-1 output scale + the
    # bias scale that mirrors it) becomes 12.0 -> multiplier 1/12
    corrupted = blob.replace(struct.pack("<f", 16.0), struct.pack("<f", 12.0))
    assert corrupted != blob
    with pytest.raises(NotImplementedError):
        load_tflite_model(corrupted)


def test_tflite_filter_end_to_end(spark):
    """The reference contract: load model file -> score records ->
    keep/drop. Via the REAL flatbuffer loader."""
    m = load_tflite_model(export_tflite_model(_model()))
    df = spark.createDataFrame(
        [(10, 2, 1), (300, 50, 0)], "x_len long, x_words long, x_tool long"
    )
    out = {
        (r.x_len): (r.score, r.keep)
        for r in tensorflow_filter(
            df, m, ["x_len", "x_words", "x_tool"], threshold=0
        ).collect()
    }
    # closed-form check of row 1: h = relu([2,-1,5;1,3,-2;-1,2,4]@[10,2,1]
    #   + [10,-20,5]) >> 4 = relu([33,-6,3]) >> 4 = [2,0,0]
    # y = floor(([3,-2,6]@[2,0,0] - 40) / 4) = floor(-34/4) = -9
    assert out[10] == (-9, False)
    assert out[300][1] == (out[300][0] >= 0)
