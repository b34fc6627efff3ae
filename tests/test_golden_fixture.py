"""Golden byte-parity fixture — the engine analogue of the reference's
N-version consensus regime (data_job.py:505-539: every node computes the
full dataset independently and senators compare file bytes).

The frozen file tests/fixtures/pr_golden.json was produced by
``python tests/test_golden_fixture.py`` (regenerate only on a deliberate
semantic change). The test asserts three properties:

1. the engine reproduces the bytes exactly (regression / consensus);
2. the bytes are invariant under input repartitioning — the Spark
   deployment's consensus property: same code + same data on a
   different cluster layout must publish identical files (sink-level
   trunc-12 absorbs summation-order float noise, the role the
   reference's every-step trunc-14 + Decimal plays in its regime);
3. the values match the NumPy reference-semantics oracle to 1e-9, so
   the frozen bytes are semantically anchored, not just stable.
"""

from __future__ import annotations

import os

import pytest

from pagerank_service_spark.datagen import fixture_edges
from pagerank_service_spark.functions.truncate import trunc_py, trunc_udf
from pagerank_service_spark.graph.oracle import reference_pagerank
from pagerank_service_spark.graph.pagerank import pagerank
from pagerank_service_spark.sinks import write_deterministic_json

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "pr_golden.json")
GRAPH = "two_cliques_bridge"
TRUNC = 12


def _engine_file(spark, out_path: str, repartition: int | None = None) -> str:
    edges = spark.createDataFrame(
        [(int(s), int(d), float(w)) for s, d, w in fixture_edges(GRAPH)],
        "src long, dst long, weight double",
    )
    if repartition:
        edges = edges.repartition(repartition)
    res = pagerank(edges, mode="reference", tol=1e-12, max_iter=500)
    out = res.ranks.select("vid", trunc_udf(TRUNC)("rank").alias("rank"))
    write_deterministic_json(out, out_path, order_by=["vid"])
    return out_path


def test_golden_bytes_and_partition_invariance(spark, tmp_path):
    with open(FIXTURE, "rb") as f:
        golden = f.read()

    p1 = _engine_file(spark, str(tmp_path / "a.json"))
    with open(p1, "rb") as f:
        assert f.read() == golden, "engine output drifted from golden fixture"

    p2 = _engine_file(spark, str(tmp_path / "b.json"), repartition=13)
    with open(p2, "rb") as f:
        assert f.read() == golden, "bytes not invariant under repartitioning"


def test_golden_matches_numpy_oracle(spark, tmp_path):
    import json

    want = reference_pagerank(fixture_edges(GRAPH), tol=1e-12, max_iter=500)
    with open(FIXTURE) as f:
        got = {json.loads(l)["vid"]: json.loads(l)["rank"] for l in f if l.strip()}
    assert set(got) == set(want)
    for vid, rank in want.items():
        assert got[vid] == pytest.approx(trunc_py(rank, TRUNC), abs=1e-9)


if __name__ == "__main__":  # fixture (re)generation path
    from pagerank_service_spark.session import get_session

    s = get_session(app_name="golden", master="local[4]", shuffle_partitions=4)
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    _engine_file(s, FIXTURE)
    print("wrote", FIXTURE)
