"""Payout/earnings operators (SURVEY.md §2.4 A6-A11, §3.2 fan-out).

The reference fans out six earnings jobs after PageRank (rank x pool,
tier caps, signed ledgers, equal splits). Rendered here over the
driver's tables: customer.c_acctbal standing in for rank share,
events for the transfer ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import load, op


@op(
    "reward_rank_times_pool",
    survey_ids="A10,J8 (reward = rank x pool; earnings_pr_job.py:89-121)",
    oracle="""
    WITH pool AS (SELECT 10000.0 AS pool_amt),
    shares AS (SELECT c_custkey,
                      c_acctbal / SUM(c_acctbal) OVER () AS share
               FROM customer WHERE c_acctbal > 0)
    SELECT s.c_custkey AS addr,
           ROUND(s.share * p.pool_amt, 8) AS amount
    FROM shares s CROSS JOIN pool p
    WHERE ROUND(s.share * p.pool_amt, 8) > 0
    """,
)
def reward_rank_times_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    total = c.agg(F.sum("c_acctbal").alias("_t"))
    return (
        c.join(F.broadcast(total))
        .select(
            F.col("c_custkey").alias("addr"),
            F.round(F.col("c_acctbal") / F.col("_t") * 10000.0, 8).alias("amount"),
        )
        .filter(F.col("amount") > 0)
    )


@op(
    "windowed_points_clamped",
    survey_ids="A6 (per-user window points, clamp >= 0; calculate_boost_job.py:106-125)",
    oracle="""
    SELECT user_id,
           ROUND(GREATEST(SUM(CASE WHEN event_type = 'error'
                                   THEN -value ELSE value / 60 END), 0), 8)
           AS points
    FROM events GROUP BY user_id
    """,
)
def windowed_points_clamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    pts = F.when(F.col("event_type") == "error", -F.col("value")).otherwise(
        F.col("value") / 60
    )
    return ev.groupBy("user_id").agg(
        F.round(F.greatest(F.sum(pts), F.lit(0.0)), 8).alias("points")
    )


@op(
    "signed_stake_balance",
    survey_ids="A8 (pledge signed sums after key-dedupe; earnings_pledge_job.py:86-125)",
    oracle="""
    WITH deduped AS (
      SELECT DISTINCT ON (event_id) event_id, user_id, event_type, value
      FROM events ORDER BY event_id
    )
    SELECT user_id,
           ROUND(SUM(CASE WHEN event_type IN ('signup','purchase') THEN value
                          WHEN event_type = 'error' THEN -value
                          ELSE 0 END), 4) AS balance
    FROM deduped GROUP BY user_id
    """,
)
def signed_stake_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").dropDuplicates(["event_id"])
    signed = (
        F.when(F.col("event_type").isin("signup", "purchase"), F.col("value"))
        .when(F.col("event_type") == "error", -F.col("value"))
        .otherwise(F.lit(0.0))
    )
    return ev.groupBy("user_id").agg(F.round(F.sum(signed), 4).alias("balance"))


@op(
    "equal_split_capped",
    survey_ids="A11 (pool / min(n, 21) equal split; earnings_top_nodes_job.py:43-88)",
    oracle="""
    WITH top_s AS (SELECT s_suppkey FROM supplier
                   ORDER BY s_acctbal DESC, s_suppkey LIMIT 21),
    n AS (SELECT COUNT(*) AS cnt FROM top_s)
    SELECT t.s_suppkey AS addr, ROUND(50000.0 / n.cnt, 8) AS amount
    FROM top_s t CROSS JOIN n
    """,
)
def equal_split_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    top = s.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey")).limit(21)
    n = top.count()
    return top.select(
        F.col("s_suppkey").alias("addr"),
        F.round(F.lit(50000.0 / n), 8).alias("amount"),
    )


@op(
    "multiplier_capped",
    survey_ids="F11,J4 (AGF multiplier cap + renormalize; calcalate_util.py:149-197)",
    oracle="""
    WITH m AS (SELECT c_custkey,
                      CASE WHEN c_acctbal / 1000.0 > 1.5 THEN 1.0
                           ELSE GREATEST(c_acctbal / 1000.0, 0.1) END AS mult
               FROM customer),
    raw AS (SELECT c.c_custkey, c.c_acctbal * m.mult AS v
            FROM customer c JOIN m ON c.c_custkey = m.c_custkey
            WHERE c.c_acctbal > 0)
    SELECT c_custkey, ROUND(v / SUM(v) OVER (), 8) AS adj_share FROM raw
    """,
)
def multiplier_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    m = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") / 1000.0 > 1.5, 1.0)
        .otherwise(F.greatest(F.col("c_acctbal") / 1000.0, F.lit(0.1)))
        .alias("mult"),
    )
    raw = (
        c.filter(F.col("c_acctbal") > 0)
        .join(m, "c_custkey")
        .select("c_custkey", (F.col("c_acctbal") * F.col("mult")).alias("v"))
    )
    total = raw.agg(F.sum("v").alias("_t"))
    return raw.join(F.broadcast(total)).select(
        "c_custkey", F.round(F.col("v") / F.col("_t"), 8).alias("adj_share")
    )


@op(
    "running_ledger",
    survey_ids="K3 (per-address ledger fold; data_job.py:229-266)",
    oracle="""
    SELECT user_id,
           ROUND(SUM(SUM(value)) OVER (PARTITION BY user_id
                                       ORDER BY CAST(ts AS DATE)), 4)
             AS running_total,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS day
    FROM events WHERE event_type = 'purchase'
    GROUP BY user_id, CAST(ts AS DATE)
    """,
)
def running_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    daily = ev.groupBy(
        "user_id", F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day")
    ).agg(F.sum("value").alias("v"))
    w = Window.partitionBy("user_id").orderBy("day")
    return daily.select(
        "user_id",
        F.round(F.sum("v").over(w), 4).alias("running_total"),
        "day",
    )
