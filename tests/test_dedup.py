"""Dedup family: MinHash+LSH, SimHash, n-gram Jaccard, exact (SURVEY §2 +
training-data mandate). Oracles: pure-Python Jaccard over the same
shingle definition; constructed near-dup corpora."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from pagerank_service_spark.functions.dedup import (
    minhash_lsh_pairs_df,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_dups_df,
)

WORDS = (
    "spark graph rank edge vertex join shuffle partition batch stream "
    "query filter agg sort hash scan table column row value"
).split()


def _mk_docs(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    docs = []
    base = None
    for i in range(40):
        toks = [WORDS[j] for j in rng.integers(0, len(WORDS), size=60)]
        docs.append((i, " ".join(toks)))
        if i == 0:
            base = toks
    # 100: exact duplicate of 0; 101: near-dup (3 token edits); 102: half-rewrite
    docs.append((100, " ".join(base)))
    nd = list(base)
    nd[5], nd[20], nd[40] = "XX", "YY", "ZZ"
    docs.append((101, " ".join(nd)))
    hr = list(base)
    import numpy as np  # noqa

    for j in range(0, 30):
        hr[j] = WORDS[(j * 7) % len(WORDS)]
    docs.append((102, " ".join(hr)))
    return spark.createDataFrame(docs, "doc_id long, text string")


def _py_jaccard(a: str, b: str, n=3) -> float:
    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


def test_shingles_match_python(spark):
    docs = _mk_docs(spark)
    got = {
        (r["doc_id"], r["s"])
        for r in shingles(docs).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = set()
    for did, text in rows.items():
        w = text.split()
        for i in range(len(w) - 2):
            want.add((did, " ".join(w[i : i + 3])))
    assert got == want


def test_minhash_exact_dup_has_identical_signature(spark):
    docs = _mk_docs(spark)
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs).collect()}
    assert sigs[0] == sigs[100]


def test_minhash_lsh_finds_near_dups(spark):
    docs = _mk_docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs_df(docs).collect()
    }
    assert (0, 100) in pairs and pairs[(0, 100)] == 1.0
    assert (0, 101) in pairs and pairs[(0, 101)] > 0.5
    # estimate is consistent with true jaccard for found pairs
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), est in pairs.items():
        true = _py_jaccard(rows[a], rows[b])
        assert abs(est - true) < 0.35  # 32-hash estimator tolerance


def test_simhash_exact_dup_and_near_dup(spark):
    docs = _mk_docs(spark)
    sims = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert sims[0] == sims[100]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dups_df(docs, max_hamming=6).collect()
    }
    assert pairs[(0, 100)] == 0
    assert (0, 101) in pairs  # 3-token edit stays within hamming 6


def test_simhash_deterministic_across_partitionings(spark):
    docs = _mk_docs(spark)
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs.repartition(1)).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash(docs.repartition(7)).collect()}
    assert a == b


def test_ngram_jaccard_pairs_vs_python(spark, tmp_path):
    # route through the registered op (reads parquet) to exercise it end-to-end
    from pagerank_service_spark.functions.dedup import ngram_jaccard_pairs

    docs = _mk_docs(spark)
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(spark, str(tmp_path)).collect()
    }
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = {}
    for a, b in itertools.combinations(sorted(rows), 2):
        j = _py_jaccard(rows[a], rows[b])
        if j >= 0.2:
            want[(a, b)] = j
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_dedup_pipeline_df_cap_bounds_stop_shingle_fanout(spark):
    """The composed pipeline's df-cap kills a pathological stop-shingle:
    every doc here ends with the same 3-word tail, so that shingle's
    document frequency is n_docs and an UNCAPPED shingle self-join fans
    C(n_docs, 2) pairs from it alone. With df_cap < n_docs the shingle
    is dropped before any join (capped max df <= cap, the fan-out
    bound), and the pipeline still finds the true near-dup pair and
    keeps everything else."""
    import numpy as np

    from pagerank_service_spark.functions.dedup import (
        dedup_verified_pairs_df,
        df_capped_shingles,
    )

    rng = np.random.default_rng(11)
    n_docs = 30
    stop = "end of transmission"
    docs = []
    for i in range(n_docs):
        toks = [WORDS[j] for j in rng.integers(0, len(WORDS), size=50)]
        docs.append((i, " ".join(toks) + " " + stop))
    # 100 = near-dup of 0 (2 token edits)
    base = docs[0][1].split()
    base[4], base[25] = "XX", "YY"
    docs.append((100, " ".join(base)))
    d = spark.createDataFrame(docs, "doc_id long, text string")

    cap = 10
    sh = shingles(d)
    uncapped_df = {r["s"]: r["df"] for r in
                   sh.groupBy("s").agg(F.count(F.lit(1)).alias("df")).collect()}
    assert uncapped_df[stop] == n_docs + 1  # the bomb: df == corpus size
    # ... which would fan C(n_docs+1, 2) rows in an uncapped self-join
    capped = df_capped_shingles(sh, cap)
    capped_max_df = (capped.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
                     .agg(F.max("df")).first()[0])
    assert capped_max_df <= cap  # per-shingle fan-out bounded by the cap
    assert capped.filter(F.col("s") == stop).count() == 0

    out = {r["doc_id"]: r["keep_id"]
           for r in dedup_verified_pairs_df(d, df_cap=cap, tau=0.2).collect()}
    assert len(out) == n_docs + 1          # a decision for EVERY doc
    assert out[100] == 0                   # true near-dup collapsed to min id
    assert all(out[i] == i for i in range(n_docs))  # everyone else survives


def test_dedup_pipeline_verifies_only_candidates(spark):
    """The exact-Jaccard stage runs on LSH candidate pairs only: two
    docs sharing a handful of shingles (below any band-collision
    probability at 32 hashes) must NOT meet the verify join, even when
    their true Jaccard would pass tau — that is the documented
    candidates-only contract (recall comes from the LSH knobs, not a
    hidden corpus-global join)."""
    from pagerank_service_spark.functions.dedup import (
        dedup_verified_pairs_df,
        lsh_candidates,
        minhash_signatures,
    )

    # doc 0/1: identical -> candidate + verified; doc 2: shares only a
    # 4-word run with doc 0 (jaccard << tau anyway, but the point is it
    # never even becomes a candidate)
    docs = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta nine ten eleven twelve thirteen xi"),
    ]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    cand = {(r["doc_a"], r["doc_b"])
            for r in lsh_candidates(minhash_signatures(d)).collect()}
    assert (0, 1) in cand
    out = {r["doc_id"]: r["keep_id"]
           for r in dedup_verified_pairs_df(d, df_cap=50, tau=0.2).collect()}
    assert out == {0: 0, 1: 0, 2: 2}


def test_dedup_pipeline_transitive_groups_via_cc(spark):
    """Cross-module composition documented in dedup_verified_pairs_df:
    the single-hop min-neighbor survivor is NOT transitively closed
    (a~b, b~c without a~c leaves c pointing at b), so group-level dedup
    feeds the verified pairs to graph.components.connected_components.
    Chain corpus of 40 distinct words: doc1 = doc0 with one interior
    word changed (3 of 41 shingles differ, jaccard 35/41 ~ 0.854),
    doc2 = doc1 with another interior word changed; jaccard(0,2) =
    32/44 ~ 0.727. tau=0.8 verifies exactly the chain edges — CC must
    still place all three docs in one group keyed by the min doc_id."""
    from pagerank_service_spark.functions.dedup import (
        df_capped_shingles,
        lsh_candidates,
        shingles,
        signatures_from_shingles,
    )
    from pagerank_service_spark.graph.components import connected_components

    base = [f"w{i:02d}" for i in range(40)]
    d1 = list(base); d1[10] = "XX"
    d2 = list(d1);   d2[30] = "YY"
    docs = [(0, " ".join(base)), (1, " ".join(d1)), (2, " ".join(d2)),
            (7, "totally different words nothing shared here at all ok")]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    sh = df_capped_shingles(shingles(d), 50)
    cand = lsh_candidates(signatures_from_shingles(sh))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "s"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "s"), ["doc_b", "s"])
        .groupBy("doc_a", "doc_b").agg(F.count(F.lit(1)).alias("c"))
    )
    verified = (
        common.join(sizes.select(F.col("doc_id").alias("doc_a"),
                                 F.col("n").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"),
                           F.col("n").alias("nb")), "doc_b")
        .filter(F.col("c") / (F.col("na") + F.col("nb") - F.col("c")) >= 0.8)
    )
    pairs = {(r["doc_a"], r["doc_b"]) for r in verified.collect()}
    assert pairs == {(0, 1), (1, 2)}  # chain only; (0,2) below tau
    cc = connected_components(
        verified.select(F.col("doc_a").alias("src"),
                        F.col("doc_b").alias("dst")))
    comp = {r["vid"]: r["component"] for r in cc.components.collect()}
    assert comp[0] == comp[1] == comp[2] == 0  # one group, min-id key
    assert 7 not in comp  # never a candidate -> not in the pair graph


def test_ngram_jaccard_df_cap_param(spark):
    """The standalone exact verifier's df_cap knob: with the cap, the
    corpus-wide stop-shingle no longer contributes to ANY pair's
    common count (pairs sharing only boilerplate vanish; true near-dups
    survive with jaccard computed over capped shingle sets)."""
    from pagerank_service_spark.functions.dedup import ngram_jaccard_pairs_df

    # 6-word boilerplate tail -> 4 fully-boilerplate shingles; each doc
    # is 8 unique words + the tail = 12 shingles; a non-dup pair shares
    # exactly the 4 boilerplate shingles: jaccard 4/20 = 0.2
    stop = "the end of this transmission block"
    docs = [(0, "w0 w1 w2 w3 w4 w5 w6 w7 " + stop),
            (1, "w0 w1 w2 w3 w4 w5 w6 w7 " + stop),          # dup of 0
            (2, "z0 z1 z2 z3 z4 z5 z6 z7 " + stop),          # only boilerplate
            (3, "y0 y1 y2 y3 y4 y5 y6 y7 " + stop)]          # only boilerplate
    d = spark.createDataFrame(docs, "doc_id long, text string")
    uncapped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
                for r in ngram_jaccard_pairs_df(d, tau=0.15).collect()}
    capped = {(r["doc_a"], r["doc_b"]): r["jaccard"]
              for r in ngram_jaccard_pairs_df(d, tau=0.15, df_cap=3).collect()}
    # uncapped: every pair shares the boilerplate shingles -> all 6 pairs
    assert len(uncapped) == 6
    # capped: only the true dup pair remains, at jaccard 1.0 over the
    # capped sets (boilerplate removed from numerator AND denominator)
    assert set(capped) == {(0, 1)}
    assert capped[(0, 1)] == 1.0


def test_df_cap_exclusion_is_broadcast_anti_join(spark):
    """PLANS.md round-5 claim, asserted on the executed plan: the
    hot-shingle exclusion in df_capped_shingles is a BROADCAST LeftAnti
    join (the hot set is tiny by construction), so the full shingle
    stream is never shuffled to drop stop-shingles."""
    from pagerank_service_spark.functions.dedup import (
        df_capped_shingles,
        shingles,
    )

    d = spark.createDataFrame(
        [(i, f"w{i} a b c d e f g common tail words") for i in range(20)],
        "doc_id long, text string")
    capped = df_capped_shingles(shingles(d), 5)
    capped.collect()  # finalize adaptive plan before reading it
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
