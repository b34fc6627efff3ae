"""Similarity search: brute-force exactness + LSH recall (training-data
mandate), and multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


def test_bruteforce_matches_numpy(spark):
    from pagerank_service_spark.functions.similarity import (
        N_QUERIES,
        TOP_K,
        cosine_topk_bruteforce,
    )

    got = cosine_topk_bruteforce(spark, SF).collect()
    emb = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()}
    ids = sorted(emb)
    M = np.stack([emb[i] for i in ids])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["cosine"]))
    assert set(by_q) == set(range(N_QUERIES))
    for q in range(N_QUERIES):
        sims = Mn @ Mn[ids.index(q)]
        order = [
            ids[i]
            for i in np.lexsort((ids, -np.round(sims, 12)))
            if ids[i] != q
        ][:TOP_K]
        got_ids = [v for v, _ in by_q[q]]
        assert got_ids == order
        for vid, cos in by_q[q]:
            assert abs(cos - sims[ids.index(vid)]) < 1e-3  # rounded to 4


def test_ann_recall_vs_bruteforce(spark):
    from pagerank_service_spark.functions.similarity import (
        ann_ivf_topk,
        ann_lsh_topk,
        cosine_topk_bruteforce,
    )

    brute = cosine_topk_bruteforce(spark, SF).collect()
    b = {(r["query_id"], r["vec_id"]) for r in brute}
    ivf = {(r["query_id"], r["vec_id"]) for r in ann_ivf_topk(spark, SF).collect()}
    ivf_recall = len(ivf & b) / len(b)
    assert ivf_recall >= 0.5, f"IVF recall {ivf_recall} too low"
    lsh = {(r["query_id"], r["vec_id"]) for r in ann_lsh_topk(spark, SF).collect()}
    lsh_recall = len(lsh & b) / len(b)
    # LSH on isotropic random vectors is the weak variant; bar reflects it
    assert lsh_recall >= 0.15, f"LSH recall {lsh_recall} too low"


def test_multimodal_plumbing(spark):
    from pagerank_service_spark.functions.multimodal import (
        FEATURE_DIM,
        extract_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, n=60).persist()
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows[:5]:
        assert len(r["feature"]) == FEATURE_DIM
        assert len(r["payload_sha"]) == 64
    # deterministic across partitionings
    again = {
        r["media_id"]: tuple(r["feature"])
        for r in extract_features(media.repartition(7)).collect()
    }
    first = {r["media_id"]: tuple(r["feature"]) for r in rows}
    assert first == again
    # real decode is stubbed, loudly
    with pytest.raises(NotImplementedError):
        extract_features(media, decode_real=True)
    # frame sampling plan: one row per 200ms per video
    plan = frame_sample_plan(media, every_ms=200)
    n_videos = media.filter("kind = 'video'").count()
    assert plan.count() == n_videos * 5
    media.unpersist()


def test_scale_knobs_sf01_12planes(spark):
    """The LSH/IVF knobs are data-sized parameters, not fixture
    constants: at sf0.1 with >= 12 planes the candidate set stays
    sub-quadratic while recall vs brute force holds up (multi-probe
    covers the extra bits)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pagerank_service_spark.functions.similarity import (
        auto_n_centroids,
        auto_n_planes,
        cosine_dup_pairs_df,
        cosine_expr,
        ivf_topk_df,
        lsh_topk_df,
        _as_double,
    )

    e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = e.count()
    n_planes = max(12, auto_n_planes(n))

    # candidate pairs (tau=-1 keeps every bucket-collision candidate);
    # 4 hash tables: the recall lever that accompanies more planes
    cands = cosine_dup_pairs_df(e, tau=-1.0, n_planes=n_planes,
                                n_tables=4).count()
    assert 0 < cands < n * (n - 1) / 2 * 0.10, (cands, n)

    # brute-force top-10 for 5 queries
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), _as_double("embedding").alias("qe"))
    d = e.select("vec_id", _as_double("embedding").alias("de"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("vec_id"))
    brute = (
        d.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cosine_expr("qe", "de").alias("cs"))
        .withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    )
    b = {(r["query_id"], r["vec_id"]) for r in brute.collect()}

    lsh = {(r["query_id"], r["vec_id"])
           for r in lsh_topk_df(e, n_queries=5, n_planes=n_planes,
                                n_tables=4).collect()}
    assert len(lsh & b) / len(b) >= 0.15, "LSH recall collapsed at 12+ planes"

    ivf = {(r["query_id"], r["vec_id"])
           for r in ivf_topk_df(e, n_queries=5).collect()}  # auto ~sqrt(n)
    assert len(ivf & b) / len(b) >= 0.5, "IVF recall collapsed at auto knobs"
    assert auto_n_centroids(n) == int(n ** 0.5)


def test_ivf_lloyd_refinement_recall_and_determinism(spark):
    """refine_iters=1 runs one Lloyd round (members' mean becomes the
    centroid) before the final assignment: recall vs brute force must
    not drop below the unrefined path's (the round can only improve the
    quantizer given the same deterministic seed set), the result stays
    deterministic across invocations, and emptied cells are allowed."""
    from pagerank_service_spark.functions.similarity import (
        N_CENTROIDS,
        N_PROBE,
        N_QUERIES,
        TOP_K,
        cosine_topk_bruteforce,
        ivf_topk_df,
    )
    from pagerank_service_spark.registry import load

    e = load(spark, SF, "embeddings")
    brute = {(r["query_id"], r["vec_id"])
             for r in cosine_topk_bruteforce(spark, SF).collect()}

    def run(refine):
        return {(r["query_id"], r["vec_id"])
                for r in ivf_topk_df(e, n_queries=N_QUERIES, top_k=TOP_K,
                                     n_centroids=N_CENTROIDS,
                                     n_probe=N_PROBE,
                                     refine_iters=refine).collect()}

    r0 = run(0)
    r1 = run(1)
    rec0 = len(r0 & brute) / len(brute)
    rec1 = len(r1 & brute) / len(brute)
    assert rec1 >= rec0, (rec1, rec0)
    assert r1 == run(1)  # deterministic
