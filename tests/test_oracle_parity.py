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
from pyspark.sql import functions as F  # noqa: E402

_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()
_SQL_BACKED = sorted(n for n in _QUERIES if n in _ORACLES)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_every_query_has_an_oracle():
    # as of round 2 EVERY queries() entry carries a DuckDB oracle
    # (iterative kernels via fixed-iteration unrolled SQL, LSH/ANN via
    # md5-derived hashes) — lock that in so a new rows-only query is a
    # deliberate, reviewed decision
    assert set(_QUERIES) == set(_ORACLES), set(_QUERIES) ^ set(_ORACLES)


@pytest.mark.parametrize("name", _SQL_BACKED)
def test_oracle_parity(spark, duck, name):
    sdf = _QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(_ORACLES[name]).fetchdf()
    verdict = compare(name, sdf, ddf)
    assert verdict == "OK", verdict


def test_finalized_gating_hole(spark):
    """W5 semantics (game_hub_util.py:137-231): an unfinalized day in
    the MIDDLE blocks the cursor — later finalized days are scanned but
    not emitted — and the live (max) day is structurally excluded."""
    from pagerank_service_spark.operators.relational import finalized_gated_days_df

    rows = []
    eid = 0

    def add(day, event_type, value=10.0):
        nonlocal eid
        rows.append((eid, f"2024-02-{day:02d} 12:00:00", 1, event_type, value))
        eid += 1

    add(1, "purchase")            # finalized
    add(2, "purchase")            # finalized
    add(3, "click")               # NOT finalized -> blocks the cursor
    add(4, "purchase")            # finalized but beyond the hole
    add(5, "purchase")            # live day (max) -> excluded anyway
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    got = sorted(r["day"] for r in finalized_gated_days_df(ev).collect())
    assert got == ["2024-02-01", "2024-02-02"]
