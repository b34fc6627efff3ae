"""repos -> edges extraction (SURVEY.md §1.3, §7 step 2)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from pagerank_service_spark import datagen, extract


@pytest.fixture(scope="module")
def repos(spark):
    df = datagen.repos_df(spark, n_files=200, files_per_repo=50, seed=42).persist()
    df.count()
    return df


def _oracle_edges(rows):
    """Pure-Python regex oracle over the same content strings."""
    by_key = {}
    for r in rows:
        stem = re.sub(r"\.[a-z]+$", "", r["path"].split("/")[-1])
        by_key[(r["repo"], stem)] = (r["repo"], r["path"])
    edges = {}
    for r in rows:
        src = (r["repo"], r["path"])
        for m in re.finditer(r'(?m)^(?:import |use crate::|import ")(mod_\d+)', r["content"]):
            tgt = by_key.get((r["repo"], m.group(1)))
            if tgt and tgt != src:
                edges[(src, tgt)] = edges.get((src, tgt), 0) + 1
        for m in re.finditer(r"(?m)^from (org\d+)\.(repo\d+)\.(mod_\d+) import", r["content"]):
            repo = f"{m.group(1)}/{m.group(2)}"
            tgt = by_key.get((repo, m.group(3)))
            if tgt and tgt != src:
                edges[(src, tgt)] = edges.get((src, tgt), 0) + 1
    return edges


def test_generator_deterministic(spark):
    a = datagen.repos_df(spark, n_files=50, seed=7).orderBy("repo", "path").collect()
    b = datagen.repos_df(spark, n_files=50, seed=7, partitions=5).orderBy("repo", "path").collect()
    assert a == b


def test_edges_match_python_oracle(spark, repos):
    vertices, edges = extract.build_edges(repos)
    v = {(r["repo"], r["path"]): r["vid"] for r in vertices.collect()}
    got = {(r["src"], r["dst"]): r["weight"] for r in edges.collect()}
    want = {
        (v[s], v[d]): float(w) for (s, d), w in _oracle_edges(repos.collect()).items()
    }
    assert got == want
    assert len(got) > 50  # non-trivial graph


def test_dense_ids_are_dense_and_deterministic(spark, repos):
    v1 = extract.build_vertices(repos, id_strategy="dense").collect()
    v2 = extract.build_vertices(repos, id_strategy="dense").collect()
    assert sorted(r["vid"] for r in v1) == list(range(len(v1)))
    assert sorted(v1) == sorted(v2)


def test_sha256_invariant(spark, repos):
    # extraction must not perturb content: invariant checked per-row
    assert extract.verify_sha_invariant(repos, repos) == 0
    # and the annotated table carries sha2(content, 256)
    annotated = extract.with_content_sha(repos)
    row = annotated.select("content", "content_sha").first()
    import hashlib

    assert row["content_sha"] == hashlib.sha256(row["content"].encode()).hexdigest()


def test_hub_skew_exists(spark, repos):
    """Generator must produce hub files (Zipf in-degree) to exercise salting."""
    _, edges = extract.build_edges(repos)
    indeg = edges.groupBy("dst").agg(F.sum("weight").alias("w")).orderBy(F.desc("w"))
    top = [r["w"] for r in indeg.limit(5).collect()]
    med = indeg.agg(F.median("w")).first()[0]
    assert top[0] >= 5 * med


def test_dense_ids_dense_and_partition_invariant(spark):
    """dense strategy: ids are exactly 0..n-1, deterministic under any
    input partitioning, and contain no .rdd round-trip."""
    from pagerank_service_spark.datagen import repos_df
    from pagerank_service_spark.extract import build_vertices

    repos = repos_df(spark, n_files=500, files_per_repo=50, seed=3)
    v1 = build_vertices(repos, id_strategy="dense")
    v2 = build_vertices(repos.repartition(13), id_strategy="dense")
    m1 = {(r["repo"], r["path"]): r["vid"] for r in v1.collect()}
    m2 = {(r["repo"], r["path"]): r["vid"] for r in v2.collect()}
    assert m1 == m2
    assert sorted(m1.values()) == list(range(len(m1)))


def test_read_repos_source_resolution(spark, tmp_path):
    """sources.read_repos: parquet paths and catalog (table:/iceberg:)
    URIs resolve to the same pruned scan; snapshot options on a bare
    path are rejected instead of silently ignored."""
    import pytest

    from pagerank_service_spark.datagen import repos_df
    from pagerank_service_spark.sources import EXTRACT_COLUMNS, read_repos

    repos = repos_df(spark, n_files=120, files_per_repo=30, seed=7)
    pq = str(tmp_path / "repos.parquet")
    repos.write.parquet(pq)

    from_path = read_repos(spark, pq)
    assert from_path.columns == list(EXTRACT_COLUMNS)

    # catalog route, exercised through a registered view (the local
    # stand-in for an Iceberg catalog table — no runtime jar here)
    spark.read.parquet(pq).createOrReplaceTempView("repos_catalog_test")
    from_table = read_repos(spark, "table:repos_catalog_test")
    assert from_table.columns == list(EXTRACT_COLUMNS)
    assert from_table.count() == from_path.count() == 120

    with pytest.raises(ValueError, match="snapshot pinning"):
        read_repos(spark, pq, snapshot_id=123)
    # a catalog URI that resolves to a VIEW cannot honor snapshot
    # options either — Spark would silently ignore them, so the reader
    # must refuse rather than fake reproducibility
    with pytest.raises(ValueError, match="provider 'view'"):
        read_repos(spark, "table:repos_catalog_test", snapshot_id=123)
    with pytest.raises(ValueError, match="provider"):
        read_repos(spark, "iceberg:repos_catalog_test", as_of_ms=1)
    with pytest.raises(ValueError, match="missing required columns"):
        from pagerank_service_spark.sources import read_table

        read_table(spark, pq, columns=("repo", "nope"))
    # provider UNKNOWN (table invisible to the session catalog, e.g.
    # external v2 catalogs) -> hard error by DEFAULT (a non-Iceberg
    # provider could silently ignore the pin); explicit opt-in
    # (allow_unverified_snapshot) warns and attempts the read, and the
    # connector layer is then the authoritative failure point
    import warnings

    with pytest.raises(ValueError, match="allow_unverified_snapshot"):
        read_repos(spark, "iceberg:no_such_catalog_tbl", snapshot_id=1)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        with pytest.raises(Exception, match="(?i)cannot be found|not found"):
            read_repos(spark, "iceberg:no_such_catalog_tbl", snapshot_id=1,
                       allow_unverified_snapshot=True)
    assert any("cannot determine catalog provider" in str(x.message)
               for x in w)
