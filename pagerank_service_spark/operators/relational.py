"""Core relational operators over the driver's TPC-H-ish tables.

Each function is the Spark-first rendition of a reference operator
family (citations in each docstring point into ``/root/reference``);
the paired DuckDB oracle SQL lives in the ``@op`` decorator. Catalyst
handles pushdown/pruning/broadcast — these are declarative plans, not
hand-scheduled pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import FRONT, TAIL, load, op


@op(
    "q1_pricing_summary",
    survey_ids="A1,A12 (groupBy-sum over measures; network_util.py:461-501 shape)",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4)                              AS sum_qty,
           ROUND(SUM(l_extendedprice), 4)                         AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)      AS sum_disc_price,
           ROUND(AVG(l_quantity), 6)                              AS avg_qty,
           COUNT(*)                                               AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "sum_disc_price"
        ),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@op(
    "region_rollup",
    survey_ids="J1 (small-dim broadcast join chain; calcalate_util.py:52-58)",
    oracle="""
    SELECT r.r_name AS region,
           COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 4) AS total_acctbal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("total_acctbal"),
        )
    )


@op(
    "threshold_filter",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="F3 (USD-threshold validity; network_util.py:288-292)",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
    FROM lineitem
    WHERE NOT (l_discount = 0 AND l_extendedprice < 1000)
      AND l_quantity > 0
    """,
)
def threshold_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        ~((F.col("l_discount") == 0) & (F.col("l_extendedprice") < 1000))
        & (F.col("l_quantity") > 0)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")


@op(
    "method_dispatch",
    survey_ids="F8,F9 (method-id routing; reader_util.py:125-170)",
    oracle="""
    SELECT CASE WHEN event_type = 'purchase' THEN 'revenue'
                WHEN event_type IN ('click','view') THEN 'engagement'
                ELSE 'other' END AS bucket,
           COUNT(*) AS n,
           ROUND(SUM(value), 4) AS total_value
    FROM events GROUP BY 1
    """,
)
def method_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("event_type") == "purchase", "revenue")
        .when(F.col("event_type").isin("click", "view"), "engagement")
        .otherwise("other")
    )
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total_value")
    )


@op(
    "anti_join_no_returns",
    survey_ids="J6 (anti-join rescinded links; reader_util.py:95-122)",
    oracle="""
    SELECT o.o_orderstatus, COUNT(*) AS n_orders
    FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderstatus
    """,
)
def anti_join_no_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@op(
    "semi_join_eligibility",
    survey_ids="F7 (PR-eligibility semi-join; calculate_boost_job.py:39-49)",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 30000)
    """,
)
def semi_join_eligibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 30000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


_TIERS = [(0.0, 10.0, "bronze"), (10.0, 25.0, "silver"), (25.0, 1e9, "gold")]


@op(
    "range_join_tiers",
    survey_ids="J3 (tier-cap range join; calculate_boost_job.py:52-82)",
    oracle="""
    WITH tiers(lo, hi, tier) AS (VALUES (0.0, 10.0, 'bronze'),
                                        (10.0, 25.0, 'silver'),
                                        (25.0, 1e9, 'gold'))
    SELECT t.tier, COUNT(*) AS n, ROUND(SUM(l.l_quantity), 4) AS qty
    FROM lineitem l JOIN tiers t ON l.l_quantity >= t.lo AND l.l_quantity < t.hi
    GROUP BY t.tier
    """,
)
def range_join_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    tiers = spark.createDataFrame(_TIERS, "lo double, hi double, tier string")
    return (
        li.join(
            F.broadcast(tiers),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
    )


@op(
    "window_first_order",
    survey_ids="W9 (intra-day first-partner window; network_util.py:327-364)",
    oracle="""
    SELECT c_custkey, first_total FROM (
      SELECT o_custkey AS c_custkey, o_totalprice AS first_total,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders) WHERE rn = 1
    """,
)
def window_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("o_totalprice").alias("first_total"),
        )
    )


@op(
    "topk_per_group",
    survey_ids="W10 (ranking/top-k; eth_util.py:145-154, SERVER_NUMBER cap)",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice")
    )


@op(
    "dedup_pairs",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="A13 (set-dedupe; earnings_trans_job.py:106-108 etc.)",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@op(
    "netflow_ledger",
    survey_ids="A9,F10 (transfer net-flow with exclusions; earnings_trans_job.py:89-139)",
    oracle="""
    SELECT user_id,
           ROUND(GREATEST(SUM(CASE WHEN event_type = 'purchase' THEN value
                                   WHEN event_type = 'error' THEN -value
                                   ELSE 0 END), 0), 4) AS net
    FROM events
    WHERE user_id % 100 <> 0
    GROUP BY user_id
    """,
)
def netflow_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 100 != 0)
    signed = (
        F.when(F.col("event_type") == "purchase", F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    return ev.groupBy("user_id").agg(
        F.round(F.greatest(F.sum(signed), F.lit(0.0)), 4).alias("net")
    )


@op(
    "rolling_window_lookback",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="W3 (60-day rolling lookback; game_hub_util.py:176-184)",
    oracle="""
    SELECT user_id, COUNT(*) AS n, ROUND(SUM(value), 4) AS total
    FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL 7 DAY FROM events)
    GROUP BY user_id
    """,
)
def rolling_window_lookback(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cutoff = ev.agg((F.max("ts") - F.expr("INTERVAL 7 DAYS")).alias("cutoff"))
    return (
        ev.join(F.broadcast(cutoff))
        .filter(F.col("ts") >= F.col("cutoff"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )


@op(
    "logical_day",
    survey_ids="W1 (21:00 UTC logical-day boundary; date_util.py:9-36)",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    oracle="""
    SELECT CAST(CAST(ts + INTERVAL 3 HOUR AS DATE) AS VARCHAR) AS belong_date,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def logical_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dates travel as strings so the driver's value hash is type-stable
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_format(
            F.to_date(F.col("ts") + F.expr("INTERVAL 3 HOURS")), "yyyy-MM-dd"
        ).alias("belong_date")
    ).agg(F.count(F.lit(1)).alias("n"))


@op(
    "median_by_group",
    survey_ids="A14 (np.median default PR; network_util.py:802)",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    oracle="""
    SELECT o_orderpriority, ROUND(MEDIAN(o_totalprice), 4) AS med
    FROM orders GROUP BY o_orderpriority
    """,
)
def median_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.median("o_totalprice"), 4).alias("med")
    )


@op(
    "grouping_rollup",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="A15 (+free Spark grouping sets; SURVEY §2.4 note)",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )


@op(
    "except_returned_customers",
    survey_ids="§2.6 set ops (union/except as anti-join)",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT DISTINCT o.o_custkey AS custkey
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    """,
)
def except_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    all_c = o.select(F.col("o_custkey").alias("custkey")).distinct()
    ret_c = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("custkey"))
        .distinct()
    )
    return all_c.exceptAll(ret_c)


@op(
    "share_of_total",
    survey_ids="A7 (shares of total; calculate_boost_job.py:128-138)",
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
    oracle="""
    SELECT c_custkey,
           ROUND(c_acctbal / SUM(c_acctbal) OVER (), 8) AS share
    FROM customer WHERE c_acctbal > 0
    """,
)
def share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    total = c.agg(F.sum("c_acctbal").alias("_total"))
    return (
        c.join(F.broadcast(total))
        .select(
            "c_custkey", F.round(F.col("c_acctbal") / F.col("_total"), 8).alias("share")
        )
    )


@op(
    "extract_edges_relational",
    survey_ids="A1 + §1.3 (edge extraction as groupBy-sum; network_util.py:461-501)",
    oracle="""
    SELECT o.o_custkey AS src, l.l_suppkey AS dst,
           ROUND(SUM(l.l_quantity), 4) AS weight
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_custkey, l.l_suppkey
    HAVING SUM(l.l_quantity) > 0
    """,
)
def extract_edges_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer->supplier interaction graph from the relational tables —
    the same collapse-to-weighted-edges shape the link-graph pipeline
    uses, and the input for the graph demo queries."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("src"), F.col("l_suppkey").alias("dst"))
        .agg(F.round(F.sum("l_quantity"), 4).alias("weight"))
        .filter(F.col("weight") > 0)
    )


@op(
    "sort_limit_topn",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="§2.6 sorts/limits (deterministic sort before write)",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@op(
    "dedupe_latest_upsert",
    survey_ids="W6 (upsert-replace by key; game_hub_util.py:309-317)",
    oracle="""
    SELECT user_id, event_type, value AS latest_value FROM (
      SELECT user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1
    """,
)
def dedupe_latest_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("value").alias("latest_value"))
    )


@op(
    "backfill_hole_detection",
    survey_ids="W7 (missing-date detection; game_hub_util.py:197-211)",
    oracle="""
    WITH days AS (
      SELECT UNNEST(GENERATE_SERIES(DATE '2024-01-01', DATE '2024-01-30',
                                    INTERVAL 1 DAY))::DATE AS day
    ), present AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
                   WHERE user_id = 42 AND event_type = 'purchase')
    SELECT CAST(d.day AS VARCHAR) AS day FROM days d
    WHERE NOT EXISTS (SELECT 1 FROM present p WHERE p.day = d.day)
    """,
)
def backfill_hole_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        (F.col("user_id") == 42) & (F.col("event_type") == "purchase")
    )
    days = spark.sql(
        "SELECT explode(sequence(DATE '2024-01-01', DATE '2024-01-30', "
        "INTERVAL 1 DAY)) AS day"
    )
    present = ev.select(F.to_date("ts").alias("day")).distinct()
    return days.join(present, "day", "left_anti").select(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    )


@op(
    "watermark_confirmed_only",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="W4 (confirmation-lag watermark; liquidity_events_job.py:135)",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE ts <= (SELECT MAX(ts) - INTERVAL 36 MINUTE FROM events)
    GROUP BY event_type
    """,
)
def watermark_confirmed_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    tip = ev.agg((F.max("ts") - F.expr("INTERVAL 36 MINUTES")).alias("tip"))
    return (
        ev.join(F.broadcast(tip))
        .filter(F.col("ts") <= F.col("tip"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@op(
    "finalized_gated_days",
    survey_ids="W5 (finalized-only cursor gating; game_hub_util.py:137-231)",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n, ROUND(SUM(value), 4) AS total,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) > 0
               AS finalized
      FROM events GROUP BY 1),
    live AS (SELECT MAX(day) AS live_day FROM daily),
    gate AS (SELECT COALESCE(MIN(day), DATE '9999-12-31') AS fu
             FROM daily WHERE NOT finalized)
    SELECT CAST(day AS VARCHAR) AS day, n, total FROM daily
    WHERE day < (SELECT live_day FROM live)
      AND day < (SELECT fu FROM gate)
    """,
)
def finalized_gated_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's finalized-run cursor (game_hub_util.py:137-231):
    process a day only if it sits in the LEADING run of finalized days —
    an unfinalized day blocks the cursor (later finalized days are
    scanned but NOT emitted), and the live day is structurally excluded.
    'Finalized' here = the day contains a purchase event (the driver
    tables' stand-in for the dailyPointsFinalized flag)."""
    return finalized_gated_days_df(load(spark, sf_dir, "events"))


def finalized_gated_days_df(ev: DataFrame) -> DataFrame:
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 4).alias("total"),
        (F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)) > 0)
        .alias("finalized"),
    ).persist()
    gate = daily.agg(
        F.max("day").alias("live_day"),
        F.coalesce(
            F.min(F.when(~F.col("finalized"), F.col("day"))),
            F.lit("9999-12-31").cast("date"),
        ).alias("fu"),
    )
    return (
        daily.join(F.broadcast(gate))
        .filter((F.col("day") < F.col("live_day")) & (F.col("day") < F.col("fu")))
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "n", "total")
    )


@op(
    "assets_balance",
    priority=FRONT,  # r06 rotation: newest green row was r04
    survey_ids="§3.3 assets read path (ledger minus unapplied prefetches; "
               "assets_service.py:97-111, data_job.py:302-348)",
    oracle="""
    WITH earned AS (SELECT user_id, SUM(value) AS e FROM events
                    WHERE event_type = 'purchase' GROUP BY user_id),
    pre AS (SELECT user_id, SUM(v) AS p FROM (
              SELECT user_id, event_id, MAX(value) AS v FROM events
              WHERE event_type = 'click' GROUP BY user_id, event_id)
            GROUP BY user_id)
    SELECT e.user_id, ROUND(e.e - COALESCE(pre.p, 0.0), 4) AS balance
    FROM earned e LEFT JOIN pre ON pre.user_id = e.user_id
    """,
)
def assets_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interactive asset query: total earned minus prefetched-but-
    unsettled withdrawals, deduped by (address, nonce) — here
    (user_id, event_id) with MAX(value) as the deterministic pick."""
    ev = load(spark, sf_dir, "events")
    earned = ev.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sum("value").alias("e")
    )
    pre = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "event_id")
        .agg(F.max("value").alias("v"))
        .groupBy("user_id")
        .agg(F.sum("v").alias("p"))
    )
    return earned.join(pre, "user_id", "left").select(
        "user_id",
        F.round(F.col("e") - F.coalesce("p", F.lit(0.0)), 4).alias("balance"),
    )
