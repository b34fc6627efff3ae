"""Graph algorithms exposed through the ``queries()`` contract.

These run over the customer->supplier interaction graph derived from
the relational tables (see ``extract_edges_relational``) plus the
synthetic ``repos`` pipeline. Iterative algorithms are not
ANSI-SQL-expressible, so most are rows-only checks for the driver —
their strong correctness gates are the pytest oracles
(tests/test_pagerank.py, tests/test_components.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import op
from .relational import extract_edges_relational


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_edges_relational(spark, sf_dir).select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )


@op("pagerank_reference", survey_ids="§2.9 weighted PageRank (network_util.py:503-724)")
def pagerank_reference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.pagerank import pagerank

    res = pagerank(_edges(spark, sf_dir), mode="reference", tol=1e-6, max_iter=100)
    return res.ranks.select("vid", F.round("rank", 9).alias("rank"))


@op("pagerank_standard", survey_ids="§2.9 damped PageRank (north-rule generic mode)")
def pagerank_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.pagerank import pagerank

    res = pagerank(_edges(spark, sf_dir), mode="standard", tol=1e-6, max_iter=100)
    return res.ranks.select("vid", F.round("rank", 9).alias("rank"))


@op("connected_components", survey_ids="§2.9 CC via min-label hash-join propagation")
def connected_components_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.components import connected_components

    return connected_components(_edges(spark, sf_dir)).components


@op("label_propagation", survey_ids="§2.9 LP weighted plurality")
def label_propagation_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.labelprop import label_propagation

    return label_propagation(_edges(spark, sf_dir), max_iter=10).labels


@op("triangle_count", survey_ids="§2.9/J11 degree-ordered triangle counting")
def triangle_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.triangles import triangle_counts

    return triangle_counts(_edges(spark, sf_dir)).per_vertex


@op("bfs_distances", survey_ids="J10 bounded BFS distance (network_util.py:294-307)")
def bfs_distances_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..graph.bfs import bfs_distances

    e = _edges(spark, sf_dir)
    top = e.groupBy("src").agg(F.sum("weight").alias("w")).orderBy(
        F.desc("w"), F.asc("src")
    ).first()
    return bfs_distances(e, [int(top["src"])], max_hops=21, directed=False)


@op("repos_edge_extraction", survey_ids="§1.3 repos -> edges (reader_util.py analogue)")
def repos_edge_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full input_hint pipeline on the synthetic repos table: generate,
    extract references, dictionary-encode, collapse to weighted edges."""
    from ..datagen import repos_df
    from ..extract import build_edges

    repos = repos_df(spark, n_files=1000, files_per_repo=100, seed=42)
    _, edges = build_edges(repos)
    return edges
