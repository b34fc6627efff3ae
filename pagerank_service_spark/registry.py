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
    priority: int    # emission order: lower first (see all_queries)
    seq: int         # registration tiebreak within a priority band


REGISTRY: dict[str, Op] = {}

# Emission-order bands. The driver validates queries() entries in the
# order this module emits them, so order is an explicit, reviewed
# property rather than an import-order accident:
#   FRONT (10) — entries that most need a fresh driver correctness row
#   (the ANN/multimodal surface, new operators);
#   DEFAULT (100) — everything else;
#   TAIL (900) — redundant demos whose SURVEY §2 rows are also covered
#   by other green entries AND which hold driver-green rows from
#   earlier rounds (CORRECTNESS_r01/r02) plus pytest oracle parity
#   (tests/test_oracle_parity.py runs ALL entries regardless of band).
FRONT, DEFAULT, TAIL = 10, 100, 900


def op(name: str, survey_ids: str, oracle: str | None = None,
       priority: int = DEFAULT):
    def deco(fn):
        REGISTRY[name] = Op(name, fn, oracle, survey_ids, priority,
                            len(REGISTRY))
        return fn

    return deco


def _ordered() -> list[Op]:
    return sorted(REGISTRY.values(), key=lambda o: (o.priority, o.seq))


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _import_all()
    return {o.name: o.fn for o in _ordered()}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {o.name: o.oracle for o in _ordered() if o.oracle}


def _import_all() -> None:
    """Import every module that registers operators (idempotent)."""
    from .operators import relational, payouts, graph_queries  # noqa: F401
    from .functions import text, dedup, similarity, multimodal  # noqa: F401
