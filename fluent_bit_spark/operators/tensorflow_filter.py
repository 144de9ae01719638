"""filter_tensorflow analog: quantized-MLP record inference.

The reference's tensorflow filter (plugins/filter_tensorflow/
tensorflow.c) runs a TFLite interpreter over a record field and
appends the output tensor to the record. This module reproduces that
filter contract with the math path quantized TFLite models actually
execute — int8/int32 integer matmul + ReLU + fixed-point requantize —
so inference is bit-exact, cross-engine reproducible, and needs no
TFLite runtime. Loading a real ``.tflite`` flatbuffer stays gated
(`load_tflite_model`, the only part this image cannot supply); the
inference engine, feature plumbing, and filter semantics are real.

Quantization scheme (per the TFLite quantization spec's integer-only
path, simplified to power-of-two rescale):

    h = relu(W1 @ x + b1) >> shift1          (int32 accumulate)
    y = (W2 @ h + b2) >> shift2              (int32 logit)
    keep/score appended to the record

Every operation is integer, so a SQL oracle states the same sums in
closed form and matches bit-for-bit — float matmul could not promise
that (BLAS accumulation order differs per engine).

Scale shape: weights are tiny (a filter model, not an LLM) and ship
inside the closure like a broadcast; inference is a shuffle-free
Arrow-batched map using vectorized numpy int ops per batch.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


class QuantizedMLP:
    """Integer-only 2-layer MLP: int feature vector -> int logit."""

    def __init__(self, w1, b1, shift1: int, w2, b2, shift2: int):
        self.w1 = np.asarray(w1, dtype=np.int64)
        self.b1 = np.asarray(b1, dtype=np.int64)
        self.shift1 = int(shift1)
        self.w2 = np.asarray(w2, dtype=np.int64)
        self.b2 = np.asarray(b2, dtype=np.int64)
        self.shift2 = int(shift2)
        if self.w1.shape[0] != self.b1.shape[0]:
            raise ValueError("w1/b1 hidden-size mismatch")
        if self.w2.shape[0] != self.b2.shape[0]:
            raise ValueError("w2/b2 output-size mismatch")
        if self.w2.shape[1] != self.w1.shape[0]:
            raise ValueError("layer-2 input != layer-1 hidden size")

    def infer(self, x: np.ndarray) -> np.ndarray:
        """x: (n, features) int64 -> (n, outputs) int64 logits.
        `>>` on non-negative post-ReLU ints is exact fixed-point
        rescale; layer-2 logits may be negative, so the final shift
        uses floor semantics (numpy >> floors, SQL mirrors it with
        explicit floor division)."""
        h = x @ self.w1.T + self.b1
        h = np.maximum(h, 0) >> self.shift1
        y = h @ self.w2.T + self.b2
        return np.floor_divide(y, 1 << self.shift2)


# TFLite schema constants (public schema.fbs, file identifier TFL3):
# Model fields: 0 version, 1 operator_codes, 2 subgraphs, 4 buffers
# SubGraph:     0 tensors, 1 inputs, 2 outputs, 3 operators
# Tensor:       0 shape, 1 type, 2 buffer, 3 name, 4 quantization
# Quantization: 2 scale[], 3 zero_point[]
# Operator:     0 opcode_index, 1 inputs, 2 outputs,
#               3 builtin_options_type, 4 builtin_options
# OperatorCode: 0 deprecated_builtin_code, 3 builtin_code
# FullyConnectedOptions: 0 fused_activation_function (0 NONE, 1 RELU)
_TFL_FULLY_CONNECTED = 9
_TFL_OPT_FULLY_CONNECTED = 8  # BuiltinOptions union member index
_TFL_INT8 = 9
_TFL_INT32 = 2
_ACT_NONE, _ACT_RELU = 0, 1


def export_tflite_model(model: QuantizedMLP) -> bytes:
    """Serialize a QuantizedMLP as a real ``.tflite`` flatbuffer: two
    int8 FULLY_CONNECTED ops (first with fused RELU), int32 biases,
    per-tensor power-of-two scales encoding the requantize shifts
    (scale_out = scale_in * 2^shift, all zero_points 0 — TFLite's
    symmetric integer-only profile). `load_tflite_model` and any
    schema-compliant TFLite reader can parse the output."""
    from fluent_bit_spark.functions.flatbuf import FlatBufferWriter

    if not (np.all(np.abs(model.w1) < 128) and np.all(np.abs(model.w2) < 128)):
        raise ValueError("int8 export needs |weights| < 128")
    fb = FlatBufferWriter()

    # children first (flatbuffers are built back-to-front)
    def buffer_tbl(data: bytes):
        return fb.table([(0, "off", fb.bytes_vector(data))])

    bufs = [
        buffer_tbl(b""),  # buffer 0: convention, the empty buffer
        buffer_tbl(model.w1.astype("<i1").tobytes()),
        buffer_tbl(model.b1.astype("<i4").tobytes()),
        buffer_tbl(model.w2.astype("<i1").tobytes()),
        buffer_tbl(model.b2.astype("<i4").tobytes()),
    ]
    buffers_vec = fb.offset_vector(bufs)

    def quant(scale: float):
        return fb.table(
            [
                (2, "off", fb.scalar_vector("f", 4, [scale])),
                (3, "off", fb.scalar_vector("q", 8, [0])),
            ]
        )

    def tensor(shape, ttype, buf_idx, name, scale):
        return fb.table(
            [
                (0, "off", fb.scalar_vector("i", 4, shape)),
                (1, "i8", ttype),
                (2, "u32", buf_idx),
                (3, "off", fb.string(name)),
                (4, "off", quant(scale)),
            ]
        )

    n_in = model.w1.shape[1]
    n_hid = model.w1.shape[0]
    n_out = model.w2.shape[0]
    s_in = 1.0
    s_h = float(1 << model.shift1)  # acc scale 1*1; out = acc >> shift1
    s_out = float((1 << model.shift1) * (1 << model.shift2))
    tensors = [
        tensor([1, n_in], _TFL_INT8, 0, "x", s_in),
        tensor([n_hid, n_in], _TFL_INT8, 1, "w1", 1.0),
        tensor([n_hid], _TFL_INT32, 2, "b1", s_in * 1.0),
        tensor([1, n_hid], _TFL_INT8, 0, "h", s_h),
        tensor([n_out, n_hid], _TFL_INT8, 3, "w2", 1.0),
        tensor([n_out], _TFL_INT32, 4, "b2", s_h * 1.0),
        tensor([1, n_out], _TFL_INT8, 0, "y", s_out),
    ]
    tensors_vec = fb.offset_vector(tensors)

    def fc_op(inputs, output, act):
        opts = fb.table([(0, "i8", act)])
        return fb.table(
            [
                (0, "u32", 0),  # opcode_index -> operator_codes[0]
                (1, "off", fb.scalar_vector("i", 4, inputs)),
                (2, "off", fb.scalar_vector("i", 4, [output])),
                (3, "u8", _TFL_OPT_FULLY_CONNECTED),
                (4, "off", opts),
            ]
        )

    ops_vec = fb.offset_vector(
        [fc_op([0, 1, 2], 3, _ACT_RELU), fc_op([3, 4, 5], 6, _ACT_NONE)]
    )
    subgraph = fb.table(
        [
            (0, "off", tensors_vec),
            (1, "off", fb.scalar_vector("i", 4, [0])),
            (2, "off", fb.scalar_vector("i", 4, [6])),
            (3, "off", ops_vec),
            (4, "off", fb.string("mlp")),
        ]
    )
    opcode = fb.table(
        [(0, "i8", _TFL_FULLY_CONNECTED), (3, "i32", _TFL_FULLY_CONNECTED)]
    )
    model_tbl = fb.table(
        [
            (0, "u32", 3),  # schema version
            (1, "off", fb.offset_vector([opcode])),
            (2, "off", fb.offset_vector([subgraph])),
            (3, "off", fb.string("fluent_bit_spark quantized MLP")),
            (4, "off", buffers_vec),
        ]
    )
    return fb.finish(model_tbl, b"TFL3")


def _pow2_shift(multiplier: float) -> int:
    """TFLite requantize multiplier -> right-shift; honest gate for
    anything that is not an exact power of two (general models use a
    fixed-point int32 multiplier; this engine's integer contract is
    the power-of-two subset)."""
    shift = round(np.log2(multiplier))
    if not np.isclose(2.0 ** shift, multiplier) or shift > 0:
        raise NotImplementedError(
            f"requantize multiplier {multiplier} is not a power-of-two "
            "right shift; only the shift-based integer profile is supported"
        )
    return -shift


def load_tflite_model(src) -> QuantizedMLP:
    """Parse a real ``.tflite`` flatbuffer (bytes or path) into a
    QuantizedMLP. Pure-Python flatbuffer walk (functions/flatbuf.py),
    no tflite-runtime needed. Supported subset = what the inference
    engine executes: a 2-layer int8 FULLY_CONNECTED chain (fused RELU
    on layer 1), int32 biases, symmetric (zero_point 0) power-of-two
    scales. Anything else raises NotImplementedError explicitly —
    reference surface: plugins/filter_tensorflow/tensorflow.c."""
    from fluent_bit_spark.functions.flatbuf import FlatBufferReader

    buf = src if isinstance(src, (bytes, bytearray)) else open(src, "rb").read()
    fb = FlatBufferReader(bytes(buf))
    if fb.file_identifier() != b"TFL3":
        raise ValueError("not a TFLite file (missing TFL3 identifier)")
    model = fb.root()
    if fb.scalar(model, 0, "u32", 0) != 3:
        raise NotImplementedError("only TFLite schema version 3")
    opcodes = []
    for oc in fb.vector_tables(model, 1):
        code = fb.scalar(oc, 3, "i32", 0) or fb.scalar(oc, 0, "i8", 0)
        opcodes.append(code)
    buffers = [fb.vector_u8s(b, 0) or b"" for b in fb.vector_tables(model, 4)]
    subgraphs = fb.vector_tables(model, 2)
    if len(subgraphs) != 1:
        raise NotImplementedError("exactly one subgraph supported")
    sg = subgraphs[0]
    tensors = fb.vector_tables(sg, 0)

    def tensor_info(idx):
        t = tensors[idx]
        shape = fb.vector_i32s(t, 0) or []
        ttype = fb.scalar(t, 1, "i8", 0)
        buf_idx = fb.scalar(t, 2, "u32", 0)
        q = fb.table_field(t, 4)
        scale = zp = None
        if q is not None:
            scales = fb.vector_f32s(q, 2)
            zps = fb.vector_i64s(q, 3)
            scale = scales[0] if scales else None
            zp = zps[0] if zps else 0
        return shape, ttype, buf_idx, scale, zp

    layers = []
    prev_out = None
    for op in fb.vector_tables(sg, 3):
        if opcodes[fb.scalar(op, 0, "u32", 0)] != _TFL_FULLY_CONNECTED:
            raise NotImplementedError(
                "only FULLY_CONNECTED chains are supported"
            )
        ins = fb.vector_i32s(op, 1)
        outs = fb.vector_i32s(op, 2)
        if len(ins) != 3 or len(outs) != 1:
            raise NotImplementedError("FC must have (input, weights, bias)")
        if prev_out is not None and ins[0] != prev_out:
            raise NotImplementedError("ops must form a single chain")
        opts = fb.table_field(op, 4)
        act = fb.scalar(opts, 0, "i8", 0) if opts is not None else _ACT_NONE
        x_shape, x_type, _, s_x, zp_x = tensor_info(ins[0])
        w_shape, w_type, w_buf, s_w, zp_w = tensor_info(ins[1])
        b_shape, b_type, b_buf, _s_b, zp_b = tensor_info(ins[2])
        y_shape, y_type, _, s_y, zp_y = tensor_info(outs[0])
        if w_type != _TFL_INT8 or x_type != _TFL_INT8 or y_type != _TFL_INT8:
            raise NotImplementedError("only the int8 profile is supported")
        if b_type != _TFL_INT32:
            raise NotImplementedError("bias must be int32")
        if any(z not in (None, 0) for z in (zp_x, zp_w, zp_b, zp_y)):
            raise NotImplementedError("only symmetric (zero_point=0) tensors")
        w = np.frombuffer(buffers[w_buf], dtype=np.int8).reshape(w_shape)
        b = np.frombuffer(buffers[b_buf], dtype="<i4")
        shift = _pow2_shift((s_x * s_w) / s_y)
        layers.append((w.astype(np.int64), b.astype(np.int64), shift, act))
        prev_out = outs[0]

    if len(layers) != 2:
        raise NotImplementedError(
            f"engine executes 2-layer MLPs; model has {len(layers)} FC ops"
        )
    (w1, b1, sh1, act1), (w2, b2, sh2, act2) = layers
    if act1 != _ACT_RELU or act2 != _ACT_NONE:
        raise NotImplementedError("layer activations must be RELU then NONE")
    return QuantizedMLP(w1, b1, sh1, w2, b2, sh2)


def tensorflow_filter(
    df: DataFrame,
    model: QuantizedMLP,
    feature_cols: list,
    out_col: str = "score",
    threshold: int | None = None,
) -> DataFrame:
    """Apply the model over integer feature columns and append the
    first output logit as ``out_col`` (the filter's 'attach the
    output tensor to the record' contract); with ``threshold`` also
    append ``keep = score >= threshold`` (the drop decision an
    inference filter feeds the pipeline).

    Scale shape: one Arrow-batched mapInPandas — no shuffle, no
    collect; weights ride the serialized closure (broadcast-sized).
    """
    fields = ", ".join(f"`{c}` long" for c in feature_cols)
    out_schema = f"{fields}, {out_col} long" + (
        ", keep boolean" if threshold is not None else ""
    )

    def fn(pdfs: Iterable[pd.DataFrame]):
        for pdf in pdfs:
            x = pdf[feature_cols].to_numpy(dtype=np.int64)
            y = model.infer(x)[:, 0]
            out = pdf[feature_cols].copy()
            out[out_col] = y
            if threshold is not None:
                out["keep"] = y >= threshold
            yield out

    return df.select(*feature_cols).mapInPandas(fn, out_schema)
