"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): `decode_media` raises NotImplementedError unless
`fake=True`, which substitutes a deterministic fake decoder so the
Spark-side plumbing — schema, partitioning, mapInPandas batch shape,
feature vector layout — is real and tested end-to-end.

Design for 100 TB of media: payloads stay in `binary` columns (parquet
keeps them out of dictionary encoding), partition by (kind, dt);
feature extraction is a `mapInPandas` pass so each Arrow batch holds a
bounded number of payloads (`spark.sql.execution.arrow.
maxRecordsPerBatch` caps batch memory); never collect payloads to the
driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("mime", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes derived from
    sha256(seed, id) so every run (and every engine) agrees."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        digest = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        payload = (digest * ((256 + i) // len(digest) + 1))[: 256 + i]
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 8, 48 + i % 5, 1000 + 7 * i, f"{kind}/fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to a sample array. REAL DECODE IS
    STUBBED: no PIL/ffmpeg in this container."""
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libs not present in this "
            "runtime; pass fake=True for the deterministic test decoder"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def extract_features(
    df: DataFrame, fake_decode: bool = True, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """mapInPandas feature extraction: payload -> fixed-size feature
    vector (histogram of decoded samples) + basic stats. The batch
    iterator shape is the real production structure; only the decoder
    is fake."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("checksum", T.StringType()),
            T.StructField("features", T.ArrayType(T.FloatType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats = []
            sums = []
            for payload, kind in zip(b["payload"], b["kind"]):
                data = decode_media(bytes(payload), kind, fake=fake_decode)
                hist, _ = np.histogram(data, bins=feature_dim, range=(0.0, 1.0))
                total = hist.sum() or 1
                feats.append((hist / total).astype(np.float32).tolist())
                sums.append(hashlib.md5(bytes(payload)).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "n_bytes": b["payload"].map(len).astype("int32"),
                    "checksum": sums,
                    "features": feats,
                }
            )

    return df.mapInPandas(gen, out_schema)


def frame_sample(
    df: DataFrame, every_ms: int = 500, fake_decode: bool = True
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    offset (duration_ms / every_ms frames). The frame decode itself is
    the stubbed step; offsets and batch shape are real."""
    frames = F.sequence(
        F.lit(0), F.greatest((F.col("meta.duration_ms") / every_ms).cast("int") - 1, F.lit(0))
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(frames))
        .withColumn("frame_offset_ms", F.col("frame_idx") * every_ms)
        .select("media_id", "frame_idx", "frame_offset_ms", "meta")
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: records the target size in metadata; the pixel
    operation is the stubbed decode step."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).cast("int").alias("width"),
            F.lit(height).cast("int").alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.mime").alias("mime"),
        ),
    )


def byte_histogram_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    bins: int = FEATURE_DIM,
    fake_decode: bool = True,
) -> DataFrame:
    """Decode -> integer histogram feature vector, the exactly-
    checkable variant of extract_features: counts stay BIGINT (no
    float32 normalization), so a SQL oracle can re-derive every
    component from the payload bytes and the downstream ANN ranking is
    engine-exact. Bin = min(bins-1, byte * bins // 255) — the same
    edges np.histogram(range=(0,1)) assigns to byte/255 samples,
    in closed-form integer math.

    Same scale shape as extract_features: Arrow-batched mapInPandas,
    payloads never leave the executor."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("hist", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hists = []
            for payload in b[payload_col]:
                data = decode_media(bytes(payload), "image", fake=fake_decode)
                raw = np.frombuffer(bytes(payload), dtype=np.uint8)
                assert len(raw) == len(data)  # decode is 1 sample/byte
                idx = np.minimum(
                    bins - 1, raw.astype(np.int64) * bins // 255
                )
                hists.append(np.bincount(idx, minlength=bins).tolist())
            yield pd.DataFrame(
                {
                    id_col: b[id_col],
                    "n_bytes": b[payload_col].map(len).astype("int32"),
                    "hist": hists,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(gen, out_schema)
