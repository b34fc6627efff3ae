"""Similarity search over the ``embeddings`` table (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  vectors, JVM-side dot products via ``zip_with``/``aggregate`` (no
  Python in the loop);
* LSH-bucketed ANN — the scale path: 16 deterministic random-hyperplane
  sign bits bucket the space; top-k runs only within multi-probe
  buckets. Recall vs brute force asserted in tests.

At 100 TB the brute force is a crossJoin(broadcast(queries)) — linear
scan, embarrassingly parallel, no shuffle of the big side; the LSH
variant turns it into a bucket-equi-join so each probe touches
|data|/2^bits rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import load, op

TOP_K = 10
N_QUERIES = 5
N_PLANES = 8   # 2^8 buckets; sized so bucket occupancy stays useful at sf0.01
DIM = 64
N_CENTROIDS = 32
N_PROBE = 8


def _as_double(col: str):
    return F.expr(f"transform({col}, x -> cast(x AS double))")


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def cosine_expr(a: str, b: str):
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return F.expr(f"({dot}) / (sqrt({na}) * sqrt({nb}))")


@op(
    "cosine_topk_bruteforce",
    survey_ids="training-data: ANN baseline (brute-force cosine top-k)",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    d AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
    scored AS (
      SELECT q.query_id, d.vec_id,
             list_inner_product(q.qe, d.de)
               / (sqrt(list_inner_product(q.qe, q.qe))
                  * sqrt(list_inner_product(d.de, d.de))) AS cs
      FROM q CROSS JOIN d WHERE q.query_id <> d.vec_id)
    SELECT query_id, vec_id, ROUND(cs, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """,
)
def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe")
    )
    d = e.select("vec_id", _as_double("embedding").alias("de"))
    scored = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("cs", 4).alias("cosine"))
    )


def _planes(seed: int = 7) -> list[list[float]]:
    """Deterministic random hyperplanes, shipped as literals (tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((N_PLANES, DIM)).tolist()


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """16-bit sign bucket: bit i = (vec . plane_i) >= 0."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
        dot = _DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def _probe_buckets_expr() -> str:
    """Query bucket + all buckets within hamming distance 2 (multi-probe)."""
    singles = (
        f"transform(sequence(0, {N_PLANES - 1}), "
        f"b -> cast(qbucket AS bigint) ^ shiftleft(1, b))"
    )
    pairs = (
        f"flatten(transform(sequence(0, {N_PLANES - 2}), i -> "
        f"transform(sequence(i + 1, {N_PLANES - 1}), j -> "
        f"cast(qbucket AS bigint) ^ shiftleft(1, i) ^ shiftleft(1, j))))"
    )
    return f"array_union(array_union(array(qbucket), {singles}), {pairs})"


@op(
    "ann_lsh_topk",
    survey_ids="training-data: ANN scale path (random-hyperplane LSH buckets)",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate top-k: candidates share any bucket within
    hamming<=2 of the query's 8-bit sign bucket (multi-probe). Rows-only
    driver check; recall vs brute force asserted in
    tests/test_similarity.py."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    planes = _planes()
    d = e.select(
        "vec_id",
        _as_double("embedding").alias("de"),
        lsh_bucket_col("embedding", planes).alias("bucket"),
    ).persist()
    q = d.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("de").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )
    probes = q.select(
        "query_id", "qe", F.explode(F.expr(_probe_buckets_expr())).alias("bucket")
    )
    scored = (
        probes.join(d, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("cs", 4).alias("cosine"))
    )


@op(
    "ann_ivf_topk",
    survey_ids="training-data: ANN scale path (IVF coarse quantizer + nprobe)",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF: vectors are assigned to their nearest of 32 deterministic
    centroids (vectorized Arrow UDF — one numpy matmul per batch);
    queries scan only their 8 nearest centroid partitions. At scale the
    centroid assignment is the partitioning key, so a probe is a
    partition-pruned scan, not a full pass."""
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "embeddings")
    cent = _centroids(e)  # (32, DIM) normalized numpy, broadcast as closure

    import pandas as pd
    from pyspark.sql.types import ArrayType, IntegerType

    def assign_topn(n: int):
        def fn(it):
            for b in it:
                M = np.stack(b["e"].to_numpy())
                M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                sims = M @ cent.T
                top = np.argsort(-sims, axis=1)[:, :n]
                yield pd.DataFrame(
                    {"vec_id": b["vec_id"], "cells": [row.tolist() for row in top]}
                )

        return fn

    base = e.select("vec_id", _as_double("embedding").alias("e"))
    d_assign = base.mapInPandas(
        assign_topn(1), "vec_id long, cells array<int>"
    ).select("vec_id", F.col("cells")[0].alias("cell"))
    d = (
        base.join(d_assign, "vec_id")
        .select("vec_id", F.col("e").alias("de"), "cell")
        .persist()
    )
    q_assign = base.filter(F.col("vec_id") < N_QUERIES).mapInPandas(
        assign_topn(N_PROBE), "vec_id long, cells array<int>"
    )
    probes = q_assign.select(
        F.col("vec_id").alias("query_id"), F.explode("cells").alias("cell")
    ).join(
        base.select(F.col("vec_id").alias("query_id"), F.col("e").alias("qe")),
        "query_id",
    )
    scored = (
        probes.join(d, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", F.round("cs", 4).alias("cosine"))
    )


def _centroids(e: DataFrame) -> np.ndarray:
    """Deterministic coarse quantizer: the N_CENTROIDS lowest-vec_id
    embeddings, L2-normalized. (A k-means refinement would drop in here;
    determinism matters more than optimality for this engine.)"""
    rows = (
        e.filter(F.col("vec_id") < N_CENTROIDS * 4)
        .orderBy("vec_id")
        .limit(N_CENTROIDS)
        .collect()
    )
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


@op(
    "embedding_label_centroids",
    survey_ids="training-data: per-label centroid norm (embedding aggregates)",
    oracle="""
    WITH flat AS (
      SELECT label, vec_id,
             UNNEST(embedding::DOUBLE[]) AS e,
             UNNEST(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ),
    cent AS (
      SELECT label, i, AVG(e) AS m, COUNT(DISTINCT vec_id) AS n
      FROM flat GROUP BY label, i
    )
    SELECT label, ROUND(SQRT(SUM(m * m)), 4) AS centroid_norm,
           MIN(n) AS n_vectors
    FROM cent GROUP BY label
    """,
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid L2 norm via posexplode + two-level groupBy —
    the scale-correct phrasing (no collect_list of whole groups; the
    (label, dim) partial aggregation is map-side combinable)."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select(
        "label", "vec_id", F.posexplode(_as_double("embedding")).alias("i", "e")
    )
    cent = flat.groupBy("label", "i").agg(
        F.avg("e").alias("m"), F.countDistinct("vec_id").alias("n")
    )
    return cent.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("m") * F.col("m"))), 4).alias("centroid_norm"),
        F.min("n").alias("n_vectors"),
    )
