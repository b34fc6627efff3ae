"""Custom stateful streaming operator: the reference's rolling point
store (``/root/reference/project/utils/game_hub_util.py:279-335``,
``boost_memory.json``) as ``applyInPandasWithState``.

The reference keeps, per instance, a dict of ``{calendar_date: points}``
with two invariants:

* re-fetched dates REPLACE prior rows (upsert, never accumulate — W6,
  game_hub_util.py:309-317);
* dates older than ``lookback`` days behind the newest known date are
  EVICTED (W3, game_hub_util.py:323-324; 60 days in settings.cfg:182).

Here that state lives in Structured Streaming's state store, keyed by
``user_id``, updated per micro-batch by an Arrow-batched pandas
function; each update emits the instance's current rolling-window
total. Exactly-once across restarts comes from the checkpointed state
store (the cursor files' replacement), not hand-rolled mutexes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

ROLLING_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("window_total", DoubleType(), False),
        StructField("n_days", IntegerType(), False),
        StructField("newest_day", StringType(), False),
    ]
)

# state: parallel arrays (dates kept sorted ascending) — pandas-friendly
# and Arrow-serializable
ROLLING_STATE = StructType(
    [
        StructField("days", ArrayType(StringType()), True),
        StructField("points", ArrayType(DoubleType()), True),
    ]
)


def _update_factory(lookback_days: int):
    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            days, points = state.get
            store = dict(zip(list(days), list(points)))
        else:
            store = {}
        for pdf in pdfs:
            # per-day totals within this batch; REPLACE stored days
            # (the reference's upsert-not-accumulate rule)
            daily = pdf.groupby("day")["value"].sum()
            for day, v in daily.items():
                store[str(day)] = float(v)
        if store:
            newest = max(store)
            cutoff = (
                pd.Timestamp(newest) - pd.Timedelta(days=lookback_days)
            ).strftime("%Y-%m-%d")
            store = {d: v for d, v in store.items() if d >= cutoff}
            days_sorted = sorted(store)
            state.update((days_sorted, [store[d] for d in days_sorted]))
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "window_total": [float(sum(store.values()))],
                    "n_days": [len(store)],
                    "newest_day": [newest],
                }
            )

    return update


def rolling_point_store(
    events: DataFrame, lookback_days: int = 60
) -> DataFrame:
    """events(ts, user_id, value) stream -> per-instance rolling-window
    totals, state evicted past ``lookback_days``."""
    withday = events.withColumn("day", F.date_format(F.to_date("ts"), "yyyy-MM-dd"))
    return (
        withday.select("user_id", "day", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_factory(lookback_days),
            outputStructType=ROLLING_OUTPUT,
            stateStructType=ROLLING_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
