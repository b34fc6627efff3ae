"""Bucketed oriented-edge storage for triangle counting (the 10^11-edge
plan): results identical to the from-scratch count, and the wedge
self-join on the prepared table needs NO Exchange — the canonical
distinct + degree join happen once at write time, and bucketing by the
wedge apex pre-co-locates both join sides."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

from pagerank_service_spark.datagen import zipf_random_edges
from pagerank_service_spark.graph.triangles import (
    prepare_oriented_edges,
    triangle_counts,
    triangle_counts_prepared,
)

from conftest import edges_df


@contextmanager
def _conf(spark, key, value):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


def test_prepared_matches_from_scratch(spark, tmp_path):
    triples = zipf_random_edges(600, n_nodes=120, seed=11)
    e = edges_df(spark, triples)
    base = triangle_counts(e)

    table = "tri_oriented_test"
    prepare_oriented_edges(e, table, buckets=4,
                           path=str(tmp_path / "tri_oriented"))
    try:
        prep = triangle_counts_prepared(spark, table)
        assert prep.total == base.total
        b = {r["vid"]: r["triangles"] for r in base.per_vertex.collect()}
        p = {r["vid"]: r["triangles"] for r in prep.per_vertex.collect()}
        assert p == b
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")


def test_prepared_wedge_join_has_no_exchange(spark, tmp_path):
    """The executed plan of the wedge self-join over the bucketed table
    must contain a join and ZERO Exchange operators — both sides come
    from the same bucketed scan, already hash-distributed by u. (AQE off
    for the assertion so executedPlan is final, mirroring the engine's
    loop doctrine.)"""
    triples = zipf_random_edges(400, n_nodes=100, seed=3)
    e = edges_df(spark, triples)
    table = "tri_oriented_plan_test"
    prepare_oriented_edges(e, table, buckets=4,
                           path=str(tmp_path / "tri_plan"))
    try:
        # broadcast off: at toy scale the planner would broadcast one
        # side (bypassing buckets entirely); the 10^11-edge regime this
        # test models is the sort-merge path, where bucketing is what
        # removes the exchange
        with _conf(spark, "spark.sql.adaptive.enabled", "false"), \
             _conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            t = spark.table(table)
            wedges = (
                t.alias("e1")
                .join(t.alias("e2"), F.col("e1.u") == F.col("e2.u"))
                .select(F.col("e1.v").alias("y"), F.col("e2.v").alias("z"))
            )
            plan = wedges._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
