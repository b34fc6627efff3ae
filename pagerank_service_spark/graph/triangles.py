"""Triangle counting via degree-ordered adjacency self-joins
(north-rule capability; matches ``networkx.triangles`` exactly).

Undirected semantics: edges are symmetrized and deduped to canonical
(a < b) pairs. To bound the self-join, each edge is oriented from the
endpoint with the SMALLER (degree, vid) toward the larger — every wedge
is then enumerated exactly once at its lowest-degree apex, which caps
per-vertex join fan-out at O(sqrt(|E|)) even on hub-skewed graphs (the
classic compact-forward trick). A wedge (a->b, a->c) closes into a
triangle iff oriented edge (b->c) exists — checked with a left-semi
join. Per-vertex counts come from exploding each triangle to its three
corners.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .loop import graph_partitions, shuffle_partitions_pinned


@dataclass
class TriangleResult:
    per_vertex: DataFrame  # (vid, triangles)
    total: int
    wall_secs: float


def triangle_counts(edges: DataFrame, num_partitions: int | None = None,
                    assume_canonical: bool = False) -> TriangleResult:
    """``assume_canonical=True`` declares the input already holds unique
    undirected pairs as (src < dst) — e.g. a bucketed canonical edge
    table maintained at write time — and skips the canonicalizing
    ``distinct``, the dominant shuffle at 10^11 edges (PLANS.md)."""
    import time

    t0 = time.time()
    spark = edges.sparkSession

    if assume_canonical:
        canon = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).persist()
    else:
        canon = (
            edges.select(
                F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .persist()
        )
    p = num_partitions or graph_partitions(spark, canon.count())
    deg = (
        canon.select(F.col("a").alias("vid"))
        .unionByName(canon.select(F.col("b").alias("vid")))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient low (deg, vid) -> high (deg, vid); carry the head's degree
    # so wedges can be ordered by the SAME key the orientation uses
    e = (
        canon.join(deg.select(F.col("vid").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("vid").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v"),
                         F.col("db").alias("dv")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v"),
                                F.col("da").alias("dv")))
            .alias("e")
        )
        .select("e.u", "e.v", "e.dv")
        .repartition(p, "u")
        .persist()
    )
    e.count()
    # order the wedge's endpoints by (deg, vid) — the orientation key —
    # so a closing edge between y and z can only be oriented y -> z and
    # the semi-join probes the oriented table itself (no 2x union)
    wedges = (  # heavy exchanges below run under the graph-sized p
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(
            (F.col("e1.dv") < F.col("e2.dv"))
            | ((F.col("e1.dv") == F.col("e2.dv")) & (F.col("e1.v") < F.col("e2.v")))
        )
        .select(
            F.col("e1.u").alias("x"), F.col("e1.v").alias("y"), F.col("e2.v").alias("z")
        )
    )
    closing = e.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["y", "z"], "left_semi").persist()
    with shuffle_partitions_pinned(spark, p):
        tris.count()  # materialize the wedge join at graph-sized shuffles
    per_vertex = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("vid"))
        .groupBy("vid")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    # vertices with no triangles -> 0 (deg already enumerates every vertex)
    all_v = deg.select("vid")
    per_vertex = all_v.join(per_vertex, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
    total = tris.count()
    canon.unpersist()
    e.unpersist()
    tris.unpersist()
    return TriangleResult(per_vertex, total, time.time() - t0)
