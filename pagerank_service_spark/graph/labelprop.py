"""Label propagation for community detection (north-rule capability).

Deterministic synchronous variant (so tests can match an oracle
exactly, FIXTURES.md §5):

* vertices start labeled with their own vid;
* each round every vertex adopts the label with the largest total
  incident edge WEIGHT among its neighbors (undirected view, both
  directions' weights summed); ties break toward the SMALLER label;
  a vertex keeps its current label only if no neighbor label strictly
  beats it (its own label competes with weight 0 — isolated vertices
  keep theirs);
* stops when no label changes or after ``max_iter`` rounds
  (synchronous LP can 2-cycle on bipartite structures; the cap plus
  deterministic ties keep it reproducible).

Spark shape: join labels to the symmetrized weighted edge list,
``groupBy(vid, label).sum(weight)``, then pick the per-vertex argmax via
``max_by`` over a struct ordered (weight desc, label asc) — one shuffle
for the groupBy, one for the argmax, no window sort over whole
partitions.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from .loop import graph_partitions, run_loop, shuffle_partitions_pinned


@dataclass
class LabelPropResult:
    labels: DataFrame  # (vid, label)
    iterations: int
    wall_secs: float


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    num_partitions: int | None = None,
) -> LabelPropResult:
    spark = edges.sparkSession
    und0 = (
        edges.select("src", "dst", "weight")
        .unionByName(
            edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("weight"))
        .persist()
    )
    p = num_partitions or graph_partitions(spark, und0.count())
    # LAZY: the loop's first materialization computes the repartition
    # and populates the cache (round-6 job-budget trim; und0 stays
    # cached until after the loop — see components.py)
    und = und0.repartition(p, "src").persist()
    labels = (
        und.select(F.col("src").alias("vid"))
        .distinct()
        .select("vid", F.col("vid").alias("label"), F.lit(1.0).alias("diff"))
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        cur = state.select("vid", "label")
        votes = (
            und.join(cur.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"), F.col("label"))
            .agg(F.sum("weight").alias("w"))
        )
        # argmax by (w desc, label asc): max over struct(w, ~label) —
        # bitwise NOT is the exact order-reversing involution on longs
        # (negation overflows at Long.MIN_VALUE, reachable for hashed
        # label spaces under ANSI mode)
        best = votes.groupBy("vid").agg(
            F.max(F.struct(F.col("w"),
                           F.bitwise_not("label").alias("nl"))).alias("m")
        ).select("vid", F.bitwise_not(F.col("m.nl")).alias("new_label"),
                 F.col("m.w").alias("best_w"))
        return (
            cur.join(best, "vid", "left")
            .select(
                "vid",
                F.coalesce("new_label", "label").alias("label"),
                # inequality, NOT subtraction: hashed labels near ±2^63
                # overflow long subtraction under ANSI mode
                (F.col("label") != F.coalesce("new_label", "label"))
                .cast("double").alias("diff"),
            )
        )

    def metric(state: DataFrame) -> float:
        return float(state.filter(F.col("diff") != 0).count())

    with shuffle_partitions_pinned(spark, p):
        res = run_loop(spark, labels, step, metric, tol=1.0, max_iter=max_iter)
    und0.unpersist()
    und.unpersist()
    return LabelPropResult(res.state.select("vid", "label"),
                           res.iterations, res.wall_secs)


def label_propagation_oracle(
    edges: list[tuple[int, int, float]], max_iter: int = 20
) -> dict[int, int]:
    """Pure-Python oracle implementing the same deterministic rule."""
    und: dict[tuple[int, int], float] = {}
    for s, d, w in edges:
        und[(s, d)] = und.get((s, d), 0.0) + float(w)
        und[(d, s)] = und.get((d, s), 0.0) + float(w)
    nbrs: dict[int, list[tuple[int, float]]] = {}
    for (s, d), w in und.items():
        nbrs.setdefault(s, []).append((d, w))
        nbrs.setdefault(d, [])
    labels = {v: v for v in nbrs}
    for _ in range(max_iter):
        new = {}
        changed = 0
        for v in nbrs:
            votes: dict[int, float] = {}
            for u, w in nbrs[v]:
                votes[labels[u]] = votes.get(labels[u], 0.0) + w
            if votes:
                best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            else:
                best = labels[v]
            new[v] = best
            changed += best != labels[v]
        labels = new
        if changed == 0:
            break
    return labels
