"""Every SQL-oracled ``queries()`` entry vs DuckDB at sf0.01 — the same
comparison the driver's correctness gate runs (row count, schema,
order-insensitive values)."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle_parity import SF_DIR, TABLES, compare  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
_SQL_BACKED = sorted(n for n in _QUERIES if n in _ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_query_has_an_entry_or_documented_skip():
    # rows-only ops are the iterative/LSH ones by design
    rows_only = set(_QUERIES) - set(_ORACLES)
    allowed_rows_only = {
        "pagerank_reference",
        "pagerank_standard",
        "connected_components",
        "label_propagation",
        "triangle_count",
        "bfs_distances",
        "repos_edge_extraction",
        "minhash_lsh_pairs",
        "simhash_near_dups",
        "ann_lsh_topk",
        "ann_ivf_topk",
    }
    assert rows_only <= allowed_rows_only, rows_only - allowed_rows_only


@pytest.mark.parametrize("name", _SQL_BACKED)
def test_oracle_parity(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(_ORACLES[name]).fetchdf()
    verdict = compare(name, sdf, ddf)
    assert verdict == "OK", verdict
