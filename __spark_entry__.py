"""Driver contract for the spark-graft builder (PySpark target).

``entry`` smoke-runs the flagship pipeline at sf0.001; ``queries()``
exposes every implemented operator (SURVEY.md §2) as
``(spark, sf_dir) -> DataFrame``; ``oracle_sql()`` gives the DuckDB
equivalent for EVERY query — iterative graph kernels run at a fixed
iteration count against unrolled/recursive-CTE SQL (oracles.py), and
the LSH/ANN pipelines use md5-derived hashes both engines compute
identically, so the driver's value-hash gate covers all entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: customer->supplier link graph at sf0.001 -> reference-mode
    weighted PageRank -> top-ranked vertices with their rank."""
    from pagerank_service_spark.operators.graph_queries import pagerank_reference

    return pagerank_reference(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pagerank_service_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pagerank_service_spark.registry import all_oracles

    return all_oracles()
