"""The reference's edge-weight (importance) model as DataFrame
transforms: importance = S * min(D, default_distance) * C * I
(``/root/reference/project/utils/network_util.py:174-428``, behavior
reimplemented from scratch).

Factors over a day's ``link_events`` batch (schemas.LINK_EVENTS) +
``coin_info`` dim + the prior day's rank checkpoint ``old_pr``:

* validity: is_award (F1), symbol whitelist against UPPERCASED symbol
  on both sides (F2; reference uppercases the event symbol before the
  lookup, network_util.py:191), coin status == 2 only (F6,
  calcalate_util.py:25-26), lock_days > 0 (F4, reader_util.py:144-146),
  usd threshold — reject percent_a==100 links under link_rate (F3);
* usd   = (amount_a + amount_b) * price / 10^decimals;
* S     = usd^1.01 * ln(duration), duration = max(lock_days,
  ceil((deadline - start_time)/86400)) + 1;
* C     = per-symbol coefficient;
* D     = prior-edge distance when the pair already has a contract,
  else ``default_distance``. The reference's per-insert BFS
  (network_util.py:294-307) runs over YESTERDAY's edge set — its nx
  graph gains edges only at load time (``_build_network``), never
  during ``build_from_new_transaction`` — so feeding
  ``prior_distances`` from ``lifecycle.pair_distances`` (batch BFS
  over yesterday's graph) reproduces the reference EXACTLY, including
  the fact that same-day inserts do not bridge later ones. Without a
  feeder the only divergence is pairs connected in yesterday's graph
  defaulting to ``default_distance``; tests/test_bfs.py quantifies
  that gap and tests/test_lifecycle.py proves the fed path exact;
* I     = the init-value state machine (network_util.py:309-405),
  branch for branch:
  - a pair that ALREADY has stored init values reuses them — across
    days via ``prior_inits`` (the checkpointed contracts table,
    network_util.py:311-326) and within the day via a first-per-pair
    window (the second same-day contract of a pair reuses the first's
    stored finals);
  - both endpoints known -> their old ranks;
  - known + new -> known side max(old, 3*default_pr); NEW side
    default_pr in BOTH the first-contract and later_come branches
    (network_util.py:366-405 — the new side never inherits first_pr
    when the partner is known);
  - both new -> default_pr at the user's first event of the day;
    LATER events reuse the init value their FIRST partner carried at
    the user's first event (W9 window over event_seq); same-day
    referral chains resolve by pointer-following joins, falling back
    to default_pr if a chain exceeds the round cap (never NULL);
  then pairwise normalize a/(a+b) and clamp to [0.1, 0.9];
  I_ab = final_b, I_ba = final_a (each direction weighted by the
  OTHER side's share).

Output: one row per (event, direction) with the importance, ready for
``groupBy(src, dst).sum`` (A1) -> PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# reference defaults: default_pr=0.5 (network_util.py:25), overridden in
# the daily pipeline with the MEDIAN of yesterday's ranks
# (network_util.py:802, A14); distance cap 21 (network_util.py:836)
DEFAULT_PR = 0.5
DEFAULT_DISTANCE = 21.0


def valid_links(
    events: DataFrame, coin_info: DataFrame, link_rate: float, deadline_ts: int
) -> DataFrame:
    """F1/F2/F3/F4/F6 + usd + duration + S + C, all built-in expressions."""
    coins = (
        coin_info.filter(F.col("status") == 2)  # F6: calcalate_util.py:25-26
        .withColumn("symbol", F.upper("symbol"))
    )
    e = (
        events.filter(F.col("is_award"))
        .filter(F.col("lock_days") > 0)  # F4: reader_util.py:144-146
        # F2 whitelist: the reference uppercases the event symbol before
        # the coin_info lookup (network_util.py:191)
        .withColumn("symbol", F.upper("symbol"))
        .join(F.broadcast(coins), "symbol")
        .withColumn(
            "usd",
            (F.col("amount_a") + F.col("amount_b"))
            * F.col("price")
            / F.pow(F.lit(10.0), F.col("decimals")),
        )
        .filter(~((F.col("percent_a") == 100) & (F.col("usd") < F.lit(link_rate))))
    )
    duration_days = (F.lit(deadline_ts) - F.col("start_time")) / 86400.0
    duration = F.greatest(F.col("lock_days").cast("double"), F.ceil(duration_days).cast("double")) + 1.0
    return e.withColumn("duration", duration).withColumn(
        "s_factor", F.pow(F.col("usd"), 1.01) * F.log(F.col("duration"))
    ).withColumn("c_factor", F.col("coefficient"))


def init_values(events: DataFrame, old_pr: DataFrame,
                default_pr: float = DEFAULT_PR,
                prior_inits: DataFrame | None = None) -> DataFrame:
    """The I factor: returns events + (i_ab, i_ba).

    old_pr: (user string, rank double) — prior-day converged ranks
    keyed by lowercase address (reference lowercases at aggregation
    boundaries, earnings_pr_job.py:113).

    prior_inits: optional (user_a, user_b, init_value) — the stored
    per-direction init values of pairs with still-active prior-day
    contracts (the checkpointed contracts table). The reference
    early-returns these in _cal_i (network_util.py:311-326); pairs
    present here have their finals reused verbatim.
    """
    ev = events.select("link_contract", "event_seq",
                       F.lower("user_a").alias("ua"),
                       F.lower("user_b").alias("ub"))
    pr = old_pr.select(F.lower("user").alias("u"), F.col("rank").alias("old"))

    ev = (
        ev.join(pr.withColumnRenamed("u", "ua").withColumnRenamed("old", "old_a"),
                "ua", "left")
        .join(pr.withColumnRenamed("u", "ub").withColumnRenamed("old", "old_b"),
              "ub", "left")
    )

    # per-user stream (both sides) to find each NEW user's first event
    # and the partner init they saw there (W9 window, network_util:327-364)
    side_a = ev.select(F.col("ua").alias("u"), F.col("old_a").alias("old_u"),
                       F.col("ub").alias("partner"), F.col("old_b").alias("old_p"),
                       "event_seq")
    side_b = ev.select(F.col("ub").alias("u"), F.col("old_b").alias("old_u"),
                       F.col("ua").alias("partner"), F.col("old_a").alias("old_p"),
                       "event_seq")
    stream = side_a.unionByName(side_b).filter(F.col("old_u").isNull())
    w = Window.partitionBy("u").orderBy("event_seq")
    # LAZY checkpoints: the chain-probe count below materializes
    # firsts_raw and base in ONE job (was two eager barriers plus the
    # probe — round-6 job-budget trim); the checkpoint still guards the
    # self-join on firsts_raw from recomputing the window twice
    firsts_raw = (
        stream.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("u", F.col("event_seq").alias("first_seq"), "partner", "old_p")
    ).localCheckpoint(eager=False)
    # first_pr(u) = the init the FIRST partner carried at u's first event:
    #   partner known yesterday        -> max(old_p, 3*default_pr)
    #   partner's own first event here -> default_pr
    #   partner new-but-seen-earlier   -> first_pr(partner)  [chain]
    # The chain always points to a strictly earlier first event, so a
    # pointer-following join loop resolves it (depth is the length of
    # the longest same-day referral chain — tiny in practice).
    p_first = firsts_raw.select(F.col("u").alias("partner"),
                                F.col("first_seq").alias("p_first_seq"))
    base = firsts_raw.join(p_first, "partner", "left").select(
        "u", "first_seq", "partner",
        F.when(F.col("old_p").isNotNull(),
               F.greatest(F.col("old_p"), F.lit(3 * default_pr)))
        .when(F.col("p_first_seq") >= F.col("first_seq"), F.lit(default_pr))
        .alias("first_pr"),
    ).localCheckpoint(eager=False)
    resolved = base.filter(F.col("first_pr").isNotNull()).select("u", "first_pr")
    pending = base.filter(F.col("first_pr").isNull()).select("u", "partner")
    for _ in range(64):
        # full count (not limit(1)): materializes the lazy checkpoints
        # completely in this one job; pending is at most one row per
        # new user
        if pending.count() == 0:
            break
        hit = pending.join(
            resolved.select(F.col("u").alias("partner"),
                            F.col("first_pr").alias("p_pr")),
            "partner", "left",
        ).localCheckpoint(eager=False)
        newly = hit.filter(F.col("p_pr").isNotNull()).select(
            "u", F.col("p_pr").alias("first_pr")
        )
        # lazy: the next round's pending.count() (or the caller's
        # materialization) computes hit+resolved together — one job per
        # chain round; depth is the longest same-day referral chain
        resolved = resolved.unionByName(newly).localCheckpoint(eager=False)
        pending = hit.filter(F.col("p_pr").isNull()).select("u", "partner")
    # a same-day referral chain deeper than the round cap leaves users
    # unresolved — fall back to default_pr rather than emitting NULL
    # importance weights (the reference resolves arbitrary depth
    # sequentially; >64-deep same-day chains are pathological input)
    leftover = pending.select("u", F.lit(default_pr).alias("first_pr"))
    resolved = resolved.unionByName(leftover)
    firsts = firsts_raw.select("u", "first_seq").join(resolved, "u", "left")

    ev = (
        ev.join(firsts.select(F.col("u").alias("ua"),
                              F.col("first_seq").alias("fseq_a"),
                              F.col("first_pr").alias("fpr_a")), "ua", "left")
        .join(firsts.select(F.col("u").alias("ub"),
                            F.col("first_seq").alias("fseq_b"),
                            F.col("first_pr").alias("fpr_b")), "ub", "left")
    )

    def raw_init(old_u, old_p, fseq, fpr):
        return (
            F.when(old_u.isNotNull() & old_p.isNotNull(), old_u)
            .when(old_u.isNotNull(), F.greatest(old_u, F.lit(3 * default_pr)))
            # new user, KNOWN partner: default_pr in BOTH the first and
            # later_come reference branches (network_util.py:366-405) —
            # first_pr never applies against a known partner
            .when(old_p.isNotNull(), F.lit(default_pr))
            # both new: first event of the day -> default; later -> the
            # init value their first partner carried (chain-resolved,
            # default_pr fallback keeps this non-null)
            .when(F.col("event_seq") == fseq, F.lit(default_pr))
            .otherwise(F.coalesce(fpr, F.lit(default_pr)))
        )

    ra = raw_init(F.col("old_a"), F.col("old_b"), F.col("fseq_a"), F.col("fpr_a"))
    rb = raw_init(F.col("old_b"), F.col("old_a"), F.col("fseq_b"), F.col("fpr_b"))
    fa = F.least(F.greatest(ra / (ra + rb), F.lit(0.1)), F.lit(0.9))
    fb = F.least(F.greatest(rb / (ra + rb), F.lit(0.1)), F.lit(0.9))
    per_event = ev.select(
        "link_contract", "event_seq", "ua", "ub",
        fb.alias("i_ab_ev"),  # A->B edge carries B's share
        fa.alias("i_ba_ev"),
    )

    # Per-pair init reuse (_cal_i early return, network_util.py:311-326):
    # the FIRST same-day event of each unordered pair stores its finals;
    # later events of the pair reuse them (direction-matched), and pairs
    # with active prior-day contracts reuse the checkpointed values.
    lo = F.least("ua", "ub")
    hi = F.greatest("ua", "ub")
    pe = per_event.withColumn("plo", lo).withColumn("phi", hi).withColumn(
        # init for the lo->hi direction / hi->lo direction of this event
        "i_lh_ev", F.when(F.col("ua") <= F.col("ub"), F.col("i_ab_ev")).otherwise(F.col("i_ba_ev")),
    ).withColumn(
        "i_hl_ev", F.when(F.col("ua") <= F.col("ub"), F.col("i_ba_ev")).otherwise(F.col("i_ab_ev")),
    )
    wp = Window.partitionBy("plo", "phi").orderBy("event_seq")
    pe = pe.withColumn("i_lh", F.first("i_lh_ev").over(wp)).withColumn(
        "i_hl", F.first("i_hl_ev").over(wp)
    )
    if prior_inits is not None:
        pi = prior_inits.select(
            F.lower("user_a").alias("pa"), F.lower("user_b").alias("pb"),
            F.col("init_value").alias("pi"),
        )
        stored = (
            pi.groupBy(
                F.least("pa", "pb").alias("plo"), F.greatest("pa", "pb").alias("phi")
            )
            .agg(
                F.max(F.when(F.col("pa") <= F.col("pb"), F.col("pi"))).alias("s_lh"),
                F.max(F.when(F.col("pa") > F.col("pb"), F.col("pi"))).alias("s_hl"),
            )
        )
        # the reference reuses only when BOTH directions are stored
        # (network_util.py:325-326)
        both = F.col("s_lh").isNotNull() & F.col("s_hl").isNotNull()
        pe = pe.join(stored, ["plo", "phi"], "left").withColumn(
            "i_lh", F.when(both, F.col("s_lh")).otherwise(F.col("i_lh"))
        ).withColumn("i_hl", F.when(both, F.col("s_hl")).otherwise(F.col("i_hl")))
    return pe.select(
        "link_contract",
        F.when(F.col("ua") <= F.col("ub"), F.col("i_lh")).otherwise(F.col("i_hl")).alias("i_ab"),
        F.when(F.col("ua") <= F.col("ub"), F.col("i_hl")).otherwise(F.col("i_lh")).alias("i_ba"),
    )


def contract_state(
    events: DataFrame,
    coin_info: DataFrame,
    old_pr: DataFrame,
    link_rate: float = 1.0,
    deadline_ts: int | None = None,
    prior_inits: DataFrame | None = None,
    default_pr: float = DEFAULT_PR,
) -> DataFrame:
    """The day's stored per-direction init values — (user_a, user_b,
    init_value), two rows per active pair — for checkpointing into the
    next day's ``prior_inits`` (the engine's rendition of the
    reference's edge_multi_contract persistence,
    cache_util.py:279-283). Pairs carried in via ``prior_inits`` that
    see no event today are passed through unchanged; rescission and
    expiry live one level up in ``lifecycle.roll_state`` (the
    ``remove_transactions`` rendition), which the full multi-day
    pipeline ``lifecycle.run_daily_lifecycle`` applies every day."""
    if deadline_ts is None:
        deadline_ts = int(events.agg(F.max("start_time")).first()[0]) + 86400
    v = valid_links(events, coin_info, link_rate, deadline_ts)
    iv = init_values(v, old_pr, default_pr, prior_inits=prior_inits)
    ev = v.select("link_contract", "event_seq",
                  F.lower("user_a").alias("ua"), F.lower("user_b").alias("ub"))
    first = ev.join(iv, "link_contract").withColumn(
        "plo", F.least("ua", "ub")
    ).withColumn("phi", F.greatest("ua", "ub"))
    w = Window.partitionBy("plo", "phi").orderBy("event_seq")
    first = first.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    today = first.select(F.col("ua").alias("user_a"), F.col("ub").alias("user_b"),
                         F.col("i_ab").alias("init_value")).unionByName(
        first.select(F.col("ub").alias("user_a"), F.col("ua").alias("user_b"),
                     F.col("i_ba").alias("init_value"))
    )
    if prior_inits is None:
        return today
    prior = prior_inits.select(F.lower("user_a").alias("user_a"),
                               F.lower("user_b").alias("user_b"),
                               F.col("init_value"))
    pairs_today = today.select("user_a", "user_b").distinct()
    untouched = prior.join(pairs_today, ["user_a", "user_b"], "left_anti")
    # today's values win where both exist (reference: stored values are
    # reused, so today's "new" values only exist for genuinely new pairs)
    return untouched.unionByName(today)


def importance_edges(
    events: DataFrame,
    coin_info: DataFrame,
    old_pr: DataFrame,
    link_rate: float = 1.0,
    deadline_ts: int | None = None,
    prior_distances: DataFrame | None = None,
    prior_inits: DataFrame | None = None,
    default_pr: float = DEFAULT_PR,
    default_distance: float = DEFAULT_DISTANCE,
) -> DataFrame:
    """Full model -> directed edges (src, dst, weight) keyed by address.

    Each valid link materializes BOTH directions (the reference's
    directed multigraph, network_util.py:280-286); weight = importance.
    """
    if deadline_ts is None:
        deadline_ts = int(events.agg(F.max("start_time")).first()[0]) + 86400
    v = valid_links(events, coin_info, link_rate, deadline_ts)
    iv = init_values(v, old_pr, default_pr, prior_inits=prior_inits)
    v = v.join(iv, "link_contract")

    if prior_distances is not None:
        pd_ = prior_distances.select(
            F.lower("user_a").alias("da"), F.lower("user_b").alias("db"),
            F.col("distance").alias("prior_d"),
        )
        v = v.join(
            pd_,
            (F.lower(v.user_a) == pd_.da) & (F.lower(v.user_b) == pd_.db),
            "left",
        )
        d = F.coalesce(F.col("prior_d"), F.lit(default_distance))
    else:
        d = F.lit(default_distance)
    d = F.least(d, F.lit(default_distance))

    base = v.select(
        F.lower("user_a").alias("src_addr"),
        F.lower("user_b").alias("dst_addr"),
        (F.col("s_factor") * d * F.col("c_factor")).alias("sdc"),
        "i_ab", "i_ba",
    )
    ab = base.select(
        F.col("src_addr").alias("src"), F.col("dst_addr").alias("dst"),
        (F.col("sdc") * F.col("i_ab")).alias("weight"),
    )
    ba = base.select(
        F.col("dst_addr").alias("src"), F.col("src_addr").alias("dst"),
        (F.col("sdc") * F.col("i_ba")).alias("weight"),
    )
    return ab.unionByName(ba)
