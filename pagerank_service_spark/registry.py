"""Operator registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 registers here with a
Spark callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics
are ANSI-SQL-expressible, a DuckDB oracle SQL string over the same
parquet tables. The driver compares the two at sf=0.01
(row count + schema + order-insensitive value hash), so:

* every computed column is aliased IDENTICALLY on both sides;
* float aggregates are rounded to 6 decimals on BOTH sides —
  double summation order differs between engines, and the value hash
  has no tolerance.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Op:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey_ids: str  # which SURVEY.md §2 rows this covers


REGISTRY: dict[str, Op] = {}


def op(name: str, survey_ids: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Op(name, fn, oracle, survey_ids)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {name: o.fn for name, o in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {name: o.oracle for name, o in REGISTRY.items() if o.oracle}


def _import_all() -> None:
    """Import every module that registers operators (idempotent)."""
    from .operators import relational, payouts, graph_queries  # noqa: F401
    from .functions import text, dedup, similarity, multimodal  # noqa: F401
