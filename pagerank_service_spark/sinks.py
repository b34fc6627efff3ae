"""Sinks (SURVEY.md §2.1 K1-K5).

The reference's determinism regime (sorted keys on every JSON write,
byte-identical across nodes — ``cache_util.py:134-137``,
``data_job.py:505-539``) maps to: sort before single-file writes,
schema-on-write parquet for real outputs, and a content manifest
(sha256 per file) standing in for the md5/IPFS publish step (K4).
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame


def write_deterministic_json(df: DataFrame, path: str, order_by: list[str]) -> str:
    """K1: byte-reproducible single JSON file — rows sorted on a total
    key order, keys emitted in schema order. Returns the file's sha256.

    Only for small fixture/consensus outputs (coalesce(1) serializes the
    write); big outputs use partitioned parquet (K2-style)."""
    rows = df.orderBy(*order_by).toJSON().collect()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = "\n".join(rows) + "\n"
    with open(path, "w") as f:
        f.write(blob)
    return hashlib.sha256(blob.encode()).hexdigest()


def write_partitioned(df: DataFrame, path: str, partition_by: list[str] | None = None,
                      mode: str = "overwrite") -> None:
    """K2/K5: the engine's real sink — partitioned parquet, written once
    (the reference's dual-write fanout collapses into partitioning)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def publish_manifest(out_dir: str, files: list[str]) -> dict:
    """K4 analog: content manifest (sha256 per file) for consensus-style
    byte comparison across independent runs."""
    manifest = {}
    for f in files:
        with open(f, "rb") as fh:
            manifest[os.path.basename(f)] = hashlib.sha256(fh.read()).hexdigest()
    mf_path = os.path.join(out_dir, "PUBLISH_MANIFEST.json")
    with open(mf_path, "w") as fh:
        json.dump(dict(sorted(manifest.items())), fh, indent=1, sort_keys=True)
    return manifest
