"""Fixed-digit TRUNCATION (never rounding) — the reference's core
numeric invariant (``/root/reference/project/utils/value_util.py:7-74``,
``network_util.py:101-172``): every intermediate value is truncated to
k digits AFTER the decimal point by string slicing, with scientific
notation expanded first. It exists so independent nodes produce
byte-identical JSON; our correctness gate is allclose 1e-6, so the
engine keeps float64 math in the hot path and exposes this as a
vectorized pandas UDF for exact-fixture parity work only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def trunc_py(value: float, count: int = 15) -> float:
    """Reference-equivalent truncate-to-k-fraction-digits."""
    s = str(value)
    if "e" in s or "E" in s:
        # expand scientific notation to positional
        from decimal import Decimal

        s = format(Decimal(s), "f")
    if "." not in s:
        return float(s)
    i, f = s.split(".")
    return float(f"{i}.{f[:count]}" if f[:count] else i)


def trunc_udf(count: int = 15):
    @F.pandas_udf(DoubleType())
    def _trunc(col: pd.Series) -> pd.Series:
        return col.map(lambda v: trunc_py(v, count))

    return _trunc
