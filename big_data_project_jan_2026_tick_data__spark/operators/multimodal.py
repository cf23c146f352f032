"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
per-item decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` (one batch per
partition slice — never row-at-a-time).

The actual codecs (PIL/librosa/av) are NOT in this container, so the
decode kernels are stubbed: ``decode_stub=True`` (default) produces a
deterministic fake feature vector from the bytes' hash; ``False`` raises
``NotImplementedError`` at the point a real codec would be invoked. The
Spark-side plumbing — schema, batch iteration, partitioning — is real and
tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decode→embed kernel: fold the
    byte content into ``dim`` floats. Replaces (not approximates) codec
    output; swap for PIL/librosa in a full deployment."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Real deployment would dispatch on ``kind`` to PIL (image resize +
    pooled pixels), librosa (mel stats) or av (frame sampling); here the
    kernel is the deterministic stub above.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media codecs (PIL/librosa/av) are not available in "
                    "this environment; use decode_stub=True"
                )
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "features": payloads.map(lambda b: _fake_features(b or b"")),
                }
            )

    return df.mapInPandas(kernel, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ms", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    payload_col: str = "payload",
    decode_stub: bool = True,
) -> DataFrame:
    """Frame sampling for video payloads: emit one row per sampled frame
    (every ``every_ms`` of duration, capped at ``max_frames``) with a
    per-frame feature vector — a cardinality-*increasing* mapInPandas
    kernel (n media rows → Σ frames rows), the batch shape a real
    av/ffmpeg sampler would produce.

    Stubbed decode: frame features hash (payload, frame_idx); with
    ``decode_stub=False`` raises NotImplementedError where a real
    demuxer/decoder would run.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real video demux/decode (av/ffmpeg) is not available "
                    "in this environment; use decode_stub=True"
                )
            out = {"media_id": [], "frame_idx": [], "frame_ms": [], "features": []}
            vids = pdf[pdf["kind"] == "video"]
            for _, row in vids.iterrows():
                dur = row["meta"]["duration_ms"] if row["meta"] is not None else 0
                n_frames = min(max_frames, max(int(dur or 0) // every_ms, 1))
                payload = row[payload_col] or b""
                for i in range(n_frames):
                    out["media_id"].append(row["media_id"])
                    out["frame_idx"].append(i)
                    out["frame_ms"].append(i * every_ms)
                    out["features"].append(
                        _fake_features(payload + i.to_bytes(4, "big"))
                    )
            # explicit dtypes: an empty dict-of-lists defaults every
            # column to float64, which Arrow can't cast to list<float>
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(out["media_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_ms": pd.Series(out["frame_ms"], dtype="int64"),
                    "features": pd.Series(out["features"], dtype="object"),
                }
            )

    return df.mapInPandas(kernel, schema=_FRAMES_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 7) -> DataFrame:
    """Deterministic synthetic media table for tests (binary payloads of
    varying size + typed metadata)."""
    base = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("media_id") % 3 + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("payload-"), F.sha2(F.concat(F.lit(seed), F.col("media_id")), 256)),
        "utf-8",
    )
    meta = F.struct(
        (F.col("media_id") % 640 + 32).cast("int").alias("width"),
        (F.col("media_id") % 480 + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("media_id") * 100).cast("long").alias("duration_ms"),
        F.lit("stub").alias("codec"),
    )
    return base.select("media_id", kind.alias("kind"), payload.alias("payload"), meta.alias("meta"))
