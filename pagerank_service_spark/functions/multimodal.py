"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step needs codec libraries this container doesn't ship, so
the actual pixel/sample decoding is STUBBED (``decode_real=True`` raises
NotImplementedError); everything Spark-side is real and tested —
schema, Arrow batch shapes, partitioning, the mapInPandas UDF
signatures, and a deterministic fake "feature extractor" so downstream
operators (dedup on features, ANN on features) can be exercised
end-to-end.

Design for 100 TB of media:
* binary payloads stay columnar Parquet/Iceberg; metadata (width,
  height, codec, duration) lives in sibling typed columns so predicate
  pushdown prunes media WITHOUT reading bytes;
* feature extraction is ``mapInPandas`` over Arrow record batches —
  payload bytes cross the JVM/Python boundary exactly once, batched;
* frame sampling/resize parameters are plan-time literals so identical
  inputs produce identical outputs (consensus-friendly, like the
  reference's determinism regime).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("codec", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16


def synthetic_media(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "audio", "video"]
        codecs = {"image": "png", "audio": "wav", "video": "mp4"}
        for b in batches:
            rows = []
            for i in b["id"].tolist():
                rng = np.random.default_rng(seed + int(i))
                kind = kinds[int(i) % 3]
                payload = rng.integers(0, 256, size=256 + int(i) % 512, dtype=np.uint8)
                rows.append(
                    {
                        "media_id": int(i),
                        "kind": kind,
                        "payload": payload.tobytes(),
                        "codec": codecs[kind],
                        "width": 64 if kind != "audio" else None,
                        "height": 64 if kind != "audio" else None,
                        "duration_ms": 1000 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, numPartitions=4).mapInPandas(gen, schema=MEDIA)


def extract_features(media: DataFrame, decode_real: bool = False) -> DataFrame:
    """mapInPandas feature extraction; decode stubbed (see module doc)."""
    if decode_real:
        raise NotImplementedError(
            "real image/audio decode requires codec libraries not present in "
            "this environment; the deterministic fake below exercises the "
            "identical Spark plumbing (schema, batching, partitioning)"
        )

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = []
            for _, r in b.iterrows():
                payload = bytes(r["payload"])
                digest = hashlib.sha256(payload).digest()
                # deterministic fake embedding from the content hash
                vec = (
                    np.frombuffer(digest, dtype=np.uint8)[:FEATURE_DIM].astype(
                        np.float32
                    )
                    / 255.0
                )
                out.append(
                    {
                        "media_id": r["media_id"],
                        "kind": r["kind"],
                        "payload_sha": hashlib.sha256(payload).hexdigest(),
                        "n_bytes": len(payload),
                        "feature": vec.tolist(),
                    }
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(feat, schema=FEATURES)


def frame_sample_plan(media: DataFrame, every_ms: int = 200) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (decode stubbed). Pure built-ins — sequence + explode."""
    v = media.filter(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
