"""Similarity search over the ``embeddings`` table (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the query
  vectors, JVM-side dot products via ``zip_with``/``aggregate`` (no
  Python in the loop);
* LSH-bucketed ANN — the scale path: 8 deterministic random-hyperplane
  sign bits bucket the space; top-k runs only within multi-probe
  (hamming<=2) buckets;
* IVF ANN — vectors assigned to the nearest of 32 deterministic
  data-seeded centroids (broadcast crossJoin + JVM argmax — no
  Python); queries scan only their 8 nearest cells.

All three carry DuckDB oracles: the hyperplanes are inlined as
literals into both the Spark plan and the generated SQL, and the IVF
centroids are derived from the data inside the SQL itself, so buckets,
candidates, and top-k match the oracle exactly. Recall vs brute force
is additionally asserted in tests/test_similarity.py.

At 100 TB the brute force is a crossJoin(broadcast(queries)) — linear
scan, embarrassingly parallel, no shuffle of the big side; the LSH/IVF
variants turn it into a bucket/cell equi-join so each probe touches
|data|/2^bits (resp. |data|*nprobe/cells) rows, and the cell is the
partitioning key so a probe is a partition-pruned scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import FRONT, TAIL, load, op

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


def _planes(seed: int = 7, n_planes: int = N_PLANES,
            dim: int = DIM) -> list[list[float]]:
    """Deterministic random hyperplanes, shipped as literals (tiny)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def auto_n_planes(n_rows: int, target_occupancy: int = 64) -> int:
    """Data-sized default: enough sign bits that the expected bucket
    occupancy is ~``target_occupancy`` (buckets ~ n/occupancy), clamped
    to [4, 24]. At 10^9 vectors this yields ~24 planes; the sf0.01
    fixtures use the 8-plane literal so the inlined-plane oracles stay
    byte-stable."""
    import math

    return max(4, min(24, math.ceil(math.log2(max(2, n_rows / target_occupancy)))))


def auto_n_centroids(n_rows: int) -> int:
    """IVF coarse-quantizer default: ~sqrt(n) cells (the standard IVF
    sizing), clamped to [4, 65536]."""
    import math

    return max(4, min(65_536, int(math.sqrt(n_rows))))


def lsh_bucket_col(vec_col: str, planes: list[list[float]]):
    """16-bit sign bucket: bit i = (vec . plane_i) >= 0."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ",".join(f"{x}D" for x in p) + ")"
        dot = _DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END)")
    return F.expr(" + ".join(bits))


def _probe_buckets_expr(n_planes: int = N_PLANES) -> str:
    """Query bucket + all buckets within hamming distance 2 (multi-probe)."""
    singles = (
        f"transform(sequence(0, {n_planes - 1}), "
        f"b -> cast(qbucket AS bigint) ^ shiftleft(1, b))"
    )
    pairs = (
        f"flatten(transform(sequence(0, {n_planes - 2}), i -> "
        f"transform(sequence(i + 1, {n_planes - 1}), j -> "
        f"cast(qbucket AS bigint) ^ shiftleft(1, i) ^ shiftleft(1, j))))"
    )
    return f"array_union(array_union(array(qbucket), {singles}), {pairs})"


def _probe_masks(n_planes: int = N_PLANES) -> list[int]:
    """XOR masks reaching every bucket within hamming<=2 (same set the
    engine's _probe_buckets_expr produces)."""
    masks = [0] + [1 << i for i in range(n_planes)]
    masks += [
        (1 << i) | (1 << j)
        for i in range(n_planes - 1)
        for j in range(i + 1, n_planes)
    ]
    return masks


def _duck_list(vec: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in vec) + "]"


_DUCK_COS = ("list_inner_product({a}, {b}) / (sqrt(list_inner_product({a}, {a}))"
             " * sqrt(list_inner_product({b}, {b})))")


def _ann_lsh_oracle() -> str:
    planes = _planes()
    bucket = " + ".join(
        f"(CASE WHEN list_inner_product(de, {_duck_list(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cs = _DUCK_COS.format(a="q.qe", b="dd.de")
    return f"""
    WITH d AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS de
      FROM embeddings),
    db AS MATERIALIZED (SELECT vec_id, de, ({bucket}) AS bucket FROM d),
    q AS MATERIALIZED (SELECT vec_id AS query_id, de AS qe, bucket AS qbucket
                       FROM db WHERE vec_id < {N_QUERIES}),
    probes AS (SELECT query_id, qe, xor(qbucket::BIGINT, m.m) AS bucket
               FROM q, UNNEST({_probe_masks()}) AS m(m)),
    scored AS (SELECT DISTINCT q.query_id, dd.vec_id, {cs} AS cs
               FROM probes q JOIN db dd ON dd.bucket = q.bucket
               WHERE dd.vec_id <> q.query_id)
    SELECT query_id, vec_id, ROUND(cs, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


@op(
    "ann_lsh_topk",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    survey_ids="training-data: ANN scale path (random-hyperplane LSH buckets)",
    oracle=_ann_lsh_oracle(),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed approximate top-k: candidates share any bucket within
    hamming<=2 of the query's sign bucket (multi-probe). The
    hyperplanes are plan-time literals inlined into both the Spark plan
    and the DuckDB oracle, so buckets and candidates match exactly;
    recall vs brute force asserted in tests/test_similarity.py. The
    8-plane literal here is fixture-sized to keep the inlined-plane
    oracle stable; production callers use ``lsh_topk_df`` whose
    ``n_planes=None`` sizes buckets to the data (auto_n_planes)."""
    return lsh_topk_df(load(spark, sf_dir, "embeddings"),
                       n_queries=N_QUERIES, top_k=TOP_K, n_planes=N_PLANES)


def _bucketed(e: DataFrame, n_planes: int, n_tables: int, dim: int,
              seed: int) -> DataFrame:
    """(vec_id, de, tbl, bucket) — one row per vector per hash table.
    Multi-table LSH is the standard recall lever when the bit count
    grows: a near pair missed by one table's bucket (plus multi-probe)
    is caught by another; candidates are the union over tables."""
    tables = [_planes(seed=seed + 101 * t, n_planes=n_planes, dim=dim)
              for t in range(n_tables)]
    buckets = F.array(*[lsh_bucket_col("embedding", pl) for pl in tables])
    return e.select(
        "vec_id", _as_double("embedding").alias("de"),
        F.posexplode(buckets).alias("tbl", "bucket"),
    )


def lsh_topk_df(
    e: DataFrame,
    n_queries: int,
    top_k: int = 10,
    n_planes: int | None = None,
    n_tables: int = 1,
    dim: int = DIM,
    seed: int = 7,
) -> DataFrame:
    """Parameterized LSH ANN core. ``n_planes=None`` -> data-sized
    (auto_n_planes over a count of ``e``); raise ``n_tables`` alongside
    ``n_planes`` to hold recall while buckets shrink (candidate work is
    ~n_tables * n^2 / 2^n_planes — each added plane halves it, each
    added table adds one unit)."""
    from pyspark.sql.window import Window

    if n_planes is None:
        n_planes = auto_n_planes(e.count())
    d = _bucketed(e, n_planes, n_tables, dim, seed)
    q = d.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("de").alias("qe"),
        "tbl",
        F.col("bucket").alias("qbucket"),
    )
    probes = q.select(
        "query_id", "qe", "tbl",
        F.explode(F.expr(_probe_buckets_expr(n_planes))).alias("bucket"),
    )
    scored = (
        probes.join(d, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "vec_id", F.round("cs", 4).alias("cosine"))
    )


def _ann_ivf_oracle() -> str:
    sim = ("list_inner_product(d.de, cent.ce)"
           " / sqrt(list_inner_product(cent.ce, cent.ce))")
    cs = _DUCK_COS.format(a="qv.qe", b="dd.de")
    return f"""
    WITH d AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS de
      FROM embeddings),
    cent AS MATERIALIZED (SELECT vec_id AS cell, de AS ce FROM d
                          ORDER BY vec_id LIMIT {N_CENTROIDS}),
    sims AS MATERIALIZED (
      SELECT d.vec_id, cent.cell, {sim} AS sim
      FROM d CROSS JOIN cent),
    assign AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims) WHERE rn = 1),
    qprob AS (SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn
        FROM sims WHERE vec_id < {N_QUERIES}) WHERE rn <= {N_PROBE}),
    qv AS (SELECT vec_id AS query_id, de AS qe FROM d
           WHERE vec_id < {N_QUERIES}),
    scored AS (SELECT DISTINCT q.query_id, dd.vec_id, {cs} AS cs
               FROM qprob q
               JOIN assign a ON a.cell = q.cell
               JOIN d dd ON dd.vec_id = a.vec_id
               JOIN qv ON qv.query_id = q.query_id
               WHERE dd.vec_id <> q.query_id)
    SELECT query_id, vec_id, ROUND(cs, 4) AS cosine
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                       ORDER BY cs DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= {TOP_K}
    """


@op(
    "ann_ivf_topk",
    # r05: green r04 row; rotated FRONT->DEFAULT (still in window)
    survey_ids="training-data: ANN scale path (IVF coarse quantizer + nprobe)",
    oracle=_ann_ivf_oracle(),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with the fixture-sized 32-cell/8-probe literals (the
    generated SQL oracle derives the same centroids in-query);
    production callers use ``ivf_topk_df`` whose defaults size cells to
    ~sqrt(n) (auto_n_centroids)."""
    return ivf_topk_df(load(spark, sf_dir, "embeddings"),
                       n_queries=N_QUERIES, top_k=TOP_K,
                       n_centroids=N_CENTROIDS, n_probe=N_PROBE)


def ivf_topk_df(
    e: DataFrame,
    n_queries: int,
    top_k: int = 10,
    n_centroids: int | None = None,
    n_probe: int | None = None,
    refine_iters: int = 0,
) -> DataFrame:
    """IVF: vectors are assigned to their nearest of ``n_centroids``
    deterministic data-seeded centroids (the lowest-vec_id embeddings).
    Assignment is a broadcast crossJoin + JVM argmax — whole-stage
    codegen, no Python. Queries scan only their ``n_probe`` nearest
    cells. At scale the cell is the partitioning key, so a probe is a
    partition-pruned scan, not a full pass.

    ``refine_iters`` runs that many Lloyd (k-means) rounds before the
    final assignment: members' coordinate-wise mean becomes the new
    centroid (posexplode + two-level groupBy — map-side combinable, no
    collect). Deterministic given the deterministic seed set; cells
    that lose every member simply disappear. One round materially
    evens cell populations at real scale (better probe recall per
    scanned row); default 0 keeps the fixture-literal registry oracle
    byte-stable."""
    from pyspark.sql.window import Window

    if n_centroids is None:
        n_centroids = auto_n_centroids(e.count())
    if n_probe is None:
        n_probe = max(1, n_centroids // 4)
    d = e.select("vec_id", _as_double("embedding").alias("de"))
    cent = (
        d.orderBy("vec_id").limit(n_centroids)
        .select(F.col("vec_id").alias("cell"), F.col("de").alias("ce"))
    )
    # sim(v, c) = dot(v, c) / ||c|| — argmax equals cosine argmax (the
    # data-side norm is a positive constant per row)
    dot = _DOT.format(a="de", b="ce")
    cnorm = _DOT.format(a="ce", b="ce")

    def _sims(c: DataFrame) -> DataFrame:
        return d.crossJoin(F.broadcast(c)).select(
            "vec_id", "cell", F.expr(f"({dot}) / sqrt({cnorm})").alias("sim")
        )

    def _argmax(s: DataFrame) -> DataFrame:
        return (
            s.groupBy("vec_id")
            .agg(F.max(F.struct(F.col("sim"),
                                (-F.col("cell")).alias("nc"))).alias("m"))
            .select("vec_id", (-F.col("m.nc")).cast("long").alias("cell"))
        )

    for _ in range(refine_iters):
        members = d.join(_argmax(_sims(cent)), "vec_id")
        comp = members.select(
            "cell", F.posexplode("de").alias("pos", "v")
        ).groupBy("cell", "pos").agg(F.avg("v").alias("m"))
        cent = comp.groupBy("cell").agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
        ).select("cell", F.expr("transform(pm, x -> x.m)").alias("ce"))

    sims = _sims(cent)
    best = _argmax(sims)
    assigned = d.join(best, "vec_id").select("vec_id", "de", "cell")
    wq = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cell"))
    qprob = (
        sims.filter(F.col("vec_id") < n_queries)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("query_id"), "cell")
    )
    qv = d.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("de").alias("qe")
    )
    scored = (
        qprob.join(qv, "query_id")
        .join(assigned, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
        .dropDuplicates(["query_id", "vec_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("query_id", "vec_id", F.round("cs", 4).alias("cosine"))
    )


DUP_TAU = 0.35  # tuned to the synthetic corpus (max pairwise cosine
# ~0.51 at sf0.01); a real near-dup corpus would run 0.9+ — the plan is
# threshold-independent


def _cosine_dups_oracle() -> str:
    planes = _planes()
    bucket = " + ".join(
        f"(CASE WHEN list_inner_product(de, {_duck_list(p)}) >= 0"
        f" THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cs = _DUCK_COS.format(a="a.de", b="b.de")
    return f"""
    WITH d AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS de
      FROM embeddings),
    db AS MATERIALIZED (SELECT vec_id, de, ({bucket}) AS bucket FROM d)
    SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
           ROUND({cs}, 4) AS cosine, a.vec_id AS keep_id
    FROM db a JOIN db b
      ON a.vec_id < b.vec_id
     AND bit_count(xor(a.bucket::BIGINT, b.bucket::BIGINT)) <= 2
    WHERE {cs} >= {DUP_TAU}
    """


@op(
    "embedding_cosine_dups",
    # r05: green r04 row; rotated FRONT->DEFAULT (still in window)
    survey_ids="training-data: dedup (embedding-cosine near-dup pairs, "
               "LSH-bucketed candidates + exact verify)",
    oracle=_cosine_dups_oracle(),
)
def embedding_cosine_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-sized wrapper (8-plane literal + DUP_TAU tuned to the
    synthetic corpus, max pairwise cosine ~0.51 at sf0.01; a real
    near-dup corpus would run tau 0.9+ — the plan is
    threshold-independent). Production callers use
    ``cosine_dup_pairs_df`` with data-sized planes."""
    return cosine_dup_pairs_df(load(spark, sf_dir, "embeddings"),
                               tau=DUP_TAU, n_planes=N_PLANES)


def cosine_dup_pairs_df(
    e: DataFrame,
    tau: float,
    n_planes: int | None = None,
    n_tables: int = 1,
    dim: int = DIM,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: candidates are pairs whose
    sign buckets differ in <= 2 planes (the multi-probe mask join — a
    pair's bucket-xor IS one specific mask, so each candidate pair is
    produced exactly once, no dedup pass), verified by exact
    cosine >= tau. ``keep_id`` = the lower vec_id — the survivor a
    dedup pass keeps. At 100 TB this is the same bucket-equi-join shape
    as ann_lsh_topk: no all-pairs anywhere; each vector only meets the
    ~|data|/2^bits vectors sharing a probed bucket."""
    if n_planes is None:
        n_planes = auto_n_planes(e.count())
    d = _bucketed(e, n_planes, n_tables, dim, seed)
    masks = ", ".join(str(m) for m in _probe_masks(n_planes))
    probes = d.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("de").alias("ae"),
        "tbl",
        F.explode(F.expr(
            f"transform(array({masks}), m -> cast(bucket AS bigint) ^ m)"
        )).alias("bucket"),
    )
    pairs = (
        probes.join(d, ["tbl", "bucket"])
        .filter(F.col("vec_id_a") < F.col("vec_id"))
        .select(
            "vec_id_a",
            F.col("vec_id").alias("vec_id_b"),
            cosine_expr("ae", "de").alias("cs"),
        )
    )
    if n_tables > 1:
        # a pair can collide in several tables; single-table keeps the
        # exactly-once mask-join property and skips this shuffle
        pairs = pairs.dropDuplicates(["vec_id_a", "vec_id_b"])
    return (
        pairs.filter(F.col("cs") >= tau)
        .select(
            "vec_id_a", "vec_id_b",
            F.round("cs", 4).alias("cosine"),
            F.col("vec_id_a").alias("keep_id"),
        )
    )


@op(
    "embedding_label_centroids",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
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
