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


def load_tflite_model(path: str) -> QuantizedMLP:
    """Parse a .tflite flatbuffer into a QuantizedMLP — gated: this
    image has no flatbuffers/TFLite runtime. The inference engine
    above is the execution path a loaded model would use."""
    raise NotImplementedError(
        "TFLite flatbuffer parsing needs the tflite-runtime package, "
        "absent in this image; construct QuantizedMLP directly "
        "(plugins/filter_tensorflow/tensorflow.c is the reference "
        "surface this mirrors)"
    )


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
