"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing — schemas, partition-preserving mapInPandas batch
transforms, Arrow binary transfer — is real and tested; the actual codec
calls (image decode/resize, audio resample, video frame sampling) are
STUBBED behind deterministic fakes because the media libraries are not in
this container. Swap `_fake_decode_*` for PIL/libav calls in production —
the dataflow does not change.

Schema convention:
    media(media_id: long, kind: string, payload: binary,
          meta: struct<width:int, height:int, duration_ms:int, codec:string>)
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
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_DDL = "media_id long, kind string, n_bytes int, digest string, feature array<float>"


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for tests."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed + i)
                kind = kinds[i % 3]
                payload = rng.integers(0, 256, size=256 + (i % 512), dtype=np.uint8).tobytes()
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "meta": {
                            "width": 64 + (i % 8) * 32 if kind == "image" else None,
                            "height": 64 + (i % 5) * 32 if kind == "image" else None,
                            "duration_ms": (i % 30) * 1000 if kind != "image" else None,
                            "codec": {"image": "png", "audio": "opus", "video": "h264"}[kind],
                        },
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_feature(payload: bytes, kind: str, dim: int = 16) -> list[float]:
    """STUB for the real decode + feature-extraction step.

    Production would decode the payload (PIL / torchaudio / pyav) and run a
    feature extractor; this deterministic fake hashes payload windows so the
    plumbing (batching, schema, downstream joins) is fully exercised.
    """
    if payload is None:
        raise NotImplementedError("real decoder required for NULL-payload media")
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h[: dim * 2], dtype=np.uint16).astype(np.float32)
    return (arr / 65535.0).tolist()


def extract_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media -> (media_id, kind, n_bytes, digest, feature) via mapInPandas.

    Arrow-batched binary transfer; one Python call per batch, numpy inside.
    Partitioning is preserved (no shuffle) — at 100 TB this runs entirely
    inside the scan stage.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0).astype("int32"),
                "digest": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else ""
                ),
                "feature": [
                    _fake_decode_feature(b, k, dim) if b is not None else None
                    for b, k in zip(pdf["payload"], pdf["kind"])
                ],
            }
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(op, FEATURES_DDL)


def resize_images(media: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image-resize plumbing: filters to images, rewrites meta, stubs the
    pixel work (payload passthrough; a real impl re-encodes)."""
    imgs = media.filter(F.col("kind") == "image")
    return imgs.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
            F.col("meta.codec").alias("codec"),
        ),
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: explodes one row per sampled frame
    timestamp from metadata (decode stubbed)."""
    vids = media.filter(F.col("kind") == "video").filter(
        F.col("meta.duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
