"""Resident-engine cache hygiene: ``queries()`` entries must leave no
session-global persisted RDDs behind after materialization (a long-lived
session otherwise accumulates one cache entry per invocation)."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.01"

# the paths that historically persisted without unpersisting
PATHS = [
    "minhash_lsh_pairs",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_dups",
    "cosine_topk_bruteforce",
    "exact_dedup_groups",
]


def _persistent_ids(spark):
    m = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in m.keySet().toArray()}


@pytest.mark.parametrize("name", PATHS)
def test_query_leaves_no_persistent_rdds(spark, name):
    from pagerank_service_spark.registry import all_queries

    qs = all_queries()
    before = _persistent_ids(spark)  # caches owned by earlier tests
    assert qs[name](spark, SF_DIR).count() >= 0
    leaked = _persistent_ids(spark) - before
    assert not leaked, f"{name} left persisted RDD ids {leaked} behind"
