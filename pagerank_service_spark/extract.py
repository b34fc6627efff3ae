"""Edge extraction: ``repos`` table -> (vertices, edges).

The Spark analogue of the reference's event->edge ingestion
(``/root/reference/project/utils/reader_util.py:54-123`` +
``network_util.py:178-286``): parse link references out of each row,
resolve them against the universe of known targets, and collapse into a
weighted directed edge table ``edges(src, dst, weight)``.

Everything is built-in Column expressions (``regexp_extract_all`` /
``explode`` / joins) — no per-row Python (input_hint mandate). The one
non-relational step the reference does at this stage (distance/importance
scoring) lives in ``operators/importance.py``.

Scale notes (100 TB / 10^12 files):
* reference parsing is embarrassingly parallel — one projection over the
  parquet scan, column-pruned to (repo, path, content);
* resolution is a join whose build side is the *vertex* table projected
  to (repo, module, vid) — far smaller than the raw text, and Spark
  broadcast it automatically when under the threshold;
* vertex ids: ``hash64`` (default) is shuffle-free xxhash64(repo,path) —
  fine to ~10^9 vertices; ``dense`` produces collision-free dense ids
  for 10^12 scale via bucketed per-partition ranking + cumulative
  bucket offsets — pure DataFrame ops (no ``.rdd``, no
  ``monotonically_increasing_id``), deterministic under any input
  partitioning because the id is a function of (bucket hash, sort
  order within bucket) only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# same-repo reference:  import mod_123           (py)
#                       use crate::mod_123;      (rs)
#                       import "mod_123"         (go)
_SAME_REPO_RE = r'(?m)^(?:import |use crate::|import ")(mod_\d+)'
# cross-repo reference: from org1.repo23.mod_045 import x
_CROSS_REPO_RE = r"(?m)^from (org\d+)\.(repo\d+)\.(mod_\d+) import"


def with_content_sha(repos: DataFrame) -> DataFrame:
    """Attach the per-row invariant column: sha2(content, 256).

    This is the literal Spark form of the reference deployment's
    byte-equality consensus check (md5-per-file,
    ``/root/reference/project/jobs/data_job.py:505-539``) applied per row.
    """
    return repos.withColumn("content_sha", F.sha2(F.col("content"), 256))


def module_of(path_col):
    """module name = file stem (src/mod_007.py -> mod_007)."""
    return F.regexp_extract(path_col, r"([^/]+)\.[a-z]+$", 1)


def build_vertices(repos: DataFrame, id_strategy: str = "hash64") -> DataFrame:
    """Dictionary-encode (repo, path) file identities to long vids.

    Reference analogue: add2index / index2add
    (``network_util.py:19-21,66-75``) — there a mutable dict, here a
    deterministic pure function of the table.
    """
    files = repos.select("repo", "path").distinct()
    if id_strategy == "hash64":
        return files.withColumn("vid", F.xxhash64("repo", "path")).select(
            "vid", "repo", "path"
        )
    if id_strategy == "dense":
        # deterministic dense ids, DataFrame-native: hash rows into B
        # buckets, rank within each bucket (per-bucket window — no
        # single-partition sort), then add the cumulative count of all
        # lower buckets. The offsets window runs over B rows only.
        B = 1024
        fb = files.withColumn(
            "_b", F.pmod(F.xxhash64("repo", "path"), F.lit(B)).cast("int")
        )
        wl = Window.partitionBy("_b").orderBy("repo", "path")
        local = fb.withColumn("_rn", F.row_number().over(wl) - 1)
        wo = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
        offsets = (
            fb.groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
            .withColumn("_off", F.coalesce(F.sum("_c").over(wo), F.lit(0)))
            .select("_b", "_off")
        )
        return local.join(F.broadcast(offsets), "_b").select(
            (F.col("_off") + F.col("_rn")).cast("long").alias("vid"), "repo", "path"
        )
    raise ValueError(f"unknown id_strategy {id_strategy!r}")


def extract_references(repos: DataFrame) -> DataFrame:
    """Explode raw import statements into (src repo/path, target repo, module).

    Returns one row per reference:
    ``(repo, path, ref_repo, ref_module)`` — unresolved targets are kept
    (resolution drops them via the vertex join).
    """
    same = (
        repos.select(
            "repo",
            "path",
            F.explode(F.regexp_extract_all("content", F.lit(_SAME_REPO_RE), 1)).alias(
                "ref_module"
            ),
        )
        .withColumn("ref_repo", F.col("repo"))
    )
    cross = repos.select(
        "repo",
        "path",
        F.explode(
            F.arrays_zip(
                F.regexp_extract_all("content", F.lit(_CROSS_REPO_RE), 1),
                F.regexp_extract_all("content", F.lit(_CROSS_REPO_RE), 2),
                F.regexp_extract_all("content", F.lit(_CROSS_REPO_RE), 3),
            )
        ).alias("r"),
    ).select(
        "repo",
        "path",
        F.concat(F.col("r.0"), F.lit("/"), F.col("r.1")).alias("ref_repo"),
        F.col("r.2").alias("ref_module"),
    )
    return same.select("repo", "path", "ref_repo", "ref_module").unionByName(cross)


def build_edges(
    repos: DataFrame,
    vertices: DataFrame | None = None,
    id_strategy: str = "hash64",
    coarse: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """repos -> (vertices, edges(src, dst, weight)).

    weight = number of import references src makes to dst (>= 1).
    ``coarse=True`` collapses to repo-level vertices.
    """
    if vertices is None:
        vertices = build_vertices(repos, id_strategy)
    refs = extract_references(repos)

    v_src = vertices.select(
        F.col("vid").alias("src"), F.col("repo"), F.col("path")
    )
    v_dst = vertices.select(
        F.col("vid").alias("dst"),
        F.col("repo").alias("ref_repo"),
        module_of(F.col("path")).alias("ref_module"),
    )
    edges = (
        refs.join(v_src, ["repo", "path"])
        .join(v_dst, ["ref_repo", "ref_module"])  # drops unresolved refs
        .filter(F.col("src") != F.col("dst"))
    )
    if coarse:
        repo_ids = vertices.groupBy("repo").agg(F.min("vid").alias("rvid"))
        edges = (
            edges.join(repo_ids.select(F.col("repo"), F.col("rvid").alias("src_r")), "repo")
            .join(
                repo_ids.select(
                    F.col("repo").alias("ref_repo"), F.col("rvid").alias("dst_r")
                ),
                "ref_repo",
            )
            .select(F.col("src_r").alias("src"), F.col("dst_r").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
    out = (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )
    return vertices, out


def verify_sha_invariant(before: DataFrame, after: DataFrame) -> int:
    """Rows whose sha2(content,256) changed through the pipeline (must be 0)."""
    a = with_content_sha(before).select("repo", "path", "content_sha")
    b = with_content_sha(after).select(
        "repo", "path", F.col("content_sha").alias("content_sha_after")
    )
    return (
        a.join(b, ["repo", "path"], "full")
        .filter(
            (F.col("content_sha") != F.col("content_sha_after"))
            | F.col("content_sha").isNull()
            | F.col("content_sha_after").isNull()
        )
        .count()
    )
