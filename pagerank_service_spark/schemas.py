"""Explicit StructTypes for every engine table.

The reference has no schema system — everything is dynamically-typed
dicts serialized to JSON/pickle (``/root/reference/project/models/entity.py:10-101``).
This engine is the opposite: schema-on-write Parquet everywhere.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Primary input (BASELINE.json input_hint): Iceberg/Parquet table of
# source-code repositories.
REPOS = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)

# Dictionary-encoded vertex table. The reference keeps add2index/index2add
# dicts (/root/reference/project/utils/network_util.py:19-21).
VERTICES = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
    ]
)

# Collapsed weighted edge table — the engine's central abstraction.
EDGES = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), False),
    ]
)

# Rank vector (reference: old_pr / pr_new dicts, network_util.py:23).
RANKS = StructType(
    [
        StructField("vid", LongType(), False),
        StructField("rank", DoubleType(), False),
    ]
)

# Link-contract fixture table mirroring the reference's event->contract
# records (reader_util.py:148-168, network_util.py:225-230).
LINK_EVENTS = StructType(
    [
        StructField("link_contract", StringType(), False),
        StructField("user_a", StringType(), False),
        StructField("user_b", StringType(), False),
        StructField("symbol", StringType(), False),
        StructField("amount_a", DoubleType(), False),
        StructField("amount_b", DoubleType(), False),
        StructField("percent_a", IntegerType(), False),
        StructField("lock_days", IntegerType(), False),
        StructField("start_time", LongType(), False),
        StructField("is_award", BooleanType(), False),
        StructField("chain", StringType(), False),
        StructField("event_seq", LongType(), False),
    ]
)

# Persistent contract state — the engine's rendition of the reference's
# ``edge_multi_contract`` dict-of-dicts (network_util.py:27-28, persisted
# via cache_util's contract_and_user pickle): one row per (chain,
# link_contract), carrying the attributes the reference stores at insert
# time (build_from_new_transaction, network_util.py:225-230) so each
# day's edge weights can be RECOMPUTED from state with that day's
# prices/deadline (_build_network "cal again since coin price and
# duration changed", network_util.py:433-500).
CONTRACTS = StructType(
    [
        StructField("chain", StringType(), False),
        StructField("link_contract", StringType(), False),
        StructField("user_a", StringType(), False),   # lowercased
        StructField("user_b", StringType(), False),   # lowercased
        StructField("symbol", StringType(), False),   # uppercased
        StructField("amount", DoubleType(), False),   # amount_a + amount_b
        StructField("percent_a", IntegerType(), False),
        StructField("lock_days", IntegerType(), False),
        StructField("start_time", LongType(), False),
        StructField("init_ab", DoubleType(), False),  # stored I, a->b
        StructField("init_ba", DoubleType(), False),  # stored I, b->a
        StructField("distance", DoubleType(), False),  # stored D at insert
    ]
)

COIN_INFO = StructType(
    [
        StructField("symbol", StringType(), False),
        StructField("coefficient", DoubleType(), False),
        StructField("decimals", IntegerType(), False),
        StructField("price", DoubleType(), False),
        StructField("status", IntegerType(), False),
        StructField("alone_calculate", IntegerType(), False),
    ]
)
