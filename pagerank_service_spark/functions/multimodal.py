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
            # columnar over the Arrow batch: one sha256 per payload (the
            # digest-bound step), numpy for everything derived from it —
            # no per-row dict assembly
            digests = b["payload"].map(lambda p: hashlib.sha256(bytes(p)).digest())
            mat = np.frombuffer(b"".join(digests), dtype=np.uint8).reshape(
                len(b), 32
            )
            vecs = (mat[:, :FEATURE_DIM].astype(np.float32) / 255.0).tolist()
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "kind": b["kind"],
                    "payload_sha": digests.map(bytes.hex),
                    "n_bytes": b["payload"].map(len).astype("int64"),
                    "feature": vecs,
                }
            )

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


# --- driver-checked renditions over the documents table -------------------
# The real media path above works on opaque binary payloads; for the
# driver's DuckDB gate the same operators run with documents.text encoded
# as the payload bytes — identical plan shape (binary column + metadata
# columns + sequence/explode), fully JVM-side, ANSI-expressible.

from ..registry import FRONT, TAIL, load, op  # noqa: E402


@op(
    "media_features",
    # r05: green r04 row; rotated FRONT->DEFAULT (still in window)
    survey_ids="training-data: multimodal metadata extraction "
               "(payload sha256 + byte length, no decode)",
    oracle="""
    SELECT doc_id AS media_id,
           sha256(text) AS payload_sha,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def media_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.sha2(payload, 256).alias("payload_sha"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


@op(
    "frame_sample_plan",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    survey_ids="training-data: multimodal frame-sampling plan "
               "(sequence/explode per duration)",
    oracle="""
    SELECT doc_id AS media_id, UNNEST(generate_series(0,
             octet_length(encode(text)) - 1, 200))::INT AS frame_ts_ms
    FROM documents
    """,
)
def frame_sample_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """frame_sample_plan with byte length standing in for duration_ms."""
    d = load(spark, sf_dir, "documents")
    dur = F.octet_length(F.encode("text", "UTF-8"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.explode(F.sequence(F.lit(0), dur - 1, F.lit(200))).alias("frame_ts_ms"),
    )
