"""Payout/earnings operators (SURVEY.md §2.4 A6-A11, §3.2 fan-out).

The reference fans out six earnings jobs after PageRank (rank x pool,
tier caps, signed ledgers, equal splits). Rendered here over the
driver's tables: customer.c_acctbal standing in for rank share,
events for the transfer ledger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..registry import FRONT, TAIL, load, op


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
    priority=TAIL,  # r06 rotation: fresh r05 green row -> rotate out
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
    "earnings_fold",
    survey_ids="§3.2 end-to-end earnings fold (data_job.py:191-348: "
               "update_total_earnings folds six earnings files onto "
               "yesterday's per-address ledger, then "
               "_reduction_total_earnings subtracts nonce-deduped "
               "prefetch withdrawals floored at 0)",
    # r05: green r04 row; rotated FRONT->DEFAULT (still in window)
    oracle="""
    WITH base AS (
      SELECT c_custkey AS addr, c_acctbal AS amt
      FROM customer WHERE c_acctbal > 0),
    srv_top AS (SELECT s_suppkey FROM supplier
                ORDER BY s_acctbal DESC, s_suppkey LIMIT 21),
    server AS (SELECT s_suppkey AS addr,
                      50000.0 / (SELECT COUNT(*) FROM srv_top) AS amt
               FROM srv_top),
    pledge AS (SELECT user_id AS addr, SUM(value) AS amt
               FROM events WHERE event_type = 'signup' GROUP BY 1),
    transfer AS (SELECT user_id AS addr, SUM(value) / 60 AS amt
                 FROM events WHERE event_type = 'click' GROUP BY 1),
    pr AS (SELECT c_custkey AS addr,
                  c_acctbal / SUM(c_acctbal) OVER () * 10000.0 AS amt
           FROM customer WHERE c_acctbal > 0),
    netpr AS (SELECT user_id AS addr,
                     SUM(value) / (SELECT SUM(value) FROM events
                                   WHERE event_type = 'purchase')
                       * 5000.0 AS amt
              FROM events WHERE event_type = 'purchase' GROUP BY user_id),
    alonepr AS (SELECT user_id AS addr,
                       SUM(value) / (SELECT SUM(value) FROM events
                                     WHERE event_type = 'view')
                         * 2000.0 AS amt
                FROM events WHERE event_type = 'view' GROUP BY user_id),
    ledger AS (SELECT addr, SUM(amt) AS bal FROM (
        SELECT * FROM base UNION ALL SELECT * FROM server
        UNION ALL SELECT * FROM pledge UNION ALL SELECT * FROM transfer
        UNION ALL SELECT * FROM pr UNION ALL SELECT * FROM netpr
        UNION ALL SELECT * FROM alonepr) GROUP BY addr),
    prefetch AS (SELECT addr, SUM(amount) AS withdrawn FROM (
        SELECT DISTINCT user_id AS addr, event_id AS nonce, value AS amount
        FROM events WHERE event_type = 'error') GROUP BY addr)
    SELECT l.addr,
           ROUND(GREATEST(l.bal - COALESCE(p.withdrawn, 0), 0), 6) AS total
    FROM ledger l LEFT JOIN prefetch p USING (addr)
    """,
)
def earnings_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole post-PageRank earnings day in ONE plan
    (data_job.py:191-348): yesterday's ledger copied forward (base =
    customer balances), six earnings sources folded per address —
    SERVER (top-nodes equal split), PLEDGE, TRANSFER (liquidity),
    PR / NET_PR / ALONE_PR (rank-share x pool) — then prefetch
    withdrawals deduped by (address, nonce) and subtracted with a floor
    at 0 (sequential max(bal - a_i, 0) over non-negative amounts equals
    the closed form GREATEST(bal - SUM(a_i), 0)), applied only to
    addresses already in the ledger. Every total is a broadcast 1-row
    aggregate; the fold itself is one union + hash aggregate — no
    driver-side loop over six files like the reference."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    s = load(spark, sf_dir, "supplier")
    ev = load(spark, sf_dir, "events")

    base = c.select(F.col("c_custkey").alias("addr"),
                    F.col("c_acctbal").alias("amt"))

    top = s.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey")).limit(21)
    n_top = top.count()  # <= 21 rows — bounded driver work at any scale
    server = top.select(F.col("s_suppkey").alias("addr"),
                        F.lit(50000.0 / n_top).alias("amt"))

    def _per_user(etype: str, expr):
        return (ev.filter(F.col("event_type") == etype)
                  .groupBy(F.col("user_id").alias("addr"))
                  .agg(expr.alias("amt")))

    pledge = _per_user("signup", F.sum("value"))
    transfer = _per_user("click", F.sum("value") / 60)

    c_total = c.agg(F.sum("c_acctbal").alias("_t"))
    pr = c.join(F.broadcast(c_total)).select(
        F.col("c_custkey").alias("addr"),
        (F.col("c_acctbal") / F.col("_t") * 10000.0).alias("amt"))

    def _share_pool(etype: str, pool: float):
        sub = ev.filter(F.col("event_type") == etype)
        tot = sub.agg(F.sum("value").alias("_t"))
        return (sub.groupBy(F.col("user_id").alias("addr"))
                   .agg(F.sum("value").alias("v"))
                   .join(F.broadcast(tot))
                   .select("addr", (F.col("v") / F.col("_t") * pool)
                           .alias("amt")))

    netpr = _share_pool("purchase", 5000.0)
    alonepr = _share_pool("view", 2000.0)

    ledger = (base.unionByName(server).unionByName(pledge)
              .unionByName(transfer).unionByName(pr)
              .unionByName(netpr).unionByName(alonepr)
              .groupBy("addr").agg(F.sum("amt").alias("bal")))

    prefetch = (ev.filter(F.col("event_type") == "error")
                .select(F.col("user_id").alias("addr"),
                        F.col("event_id").alias("nonce"),
                        F.col("value").alias("amount"))
                .distinct()
                .groupBy("addr").agg(F.sum("amount").alias("withdrawn")))

    return ledger.join(prefetch, "addr", "left").select(
        "addr",
        F.round(F.greatest(F.col("bal") - F.coalesce("withdrawn", F.lit(0.0)),
                           F.lit(0.0)), 6).alias("total"),
    )


@op(
    "running_ledger",
    priority=FRONT,  # r06 rotation: newest green row was r04
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
