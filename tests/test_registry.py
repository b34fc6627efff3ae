"""Registry emission-order contract.

The driver validates ``queries()`` entries in emission order (first 50),
so which entries sit in that window is a reviewed property: the
ANN/multimodal surface is emitted FIRST (it had no driver correctness
row through round 2), and only redundant demos — whose SURVEY §2 rows
are also covered by other in-window entries and which hold green rows
from earlier rounds — may sit past the window.
"""

from __future__ import annotations

from pagerank_service_spark.registry import REGISTRY, all_oracles, all_queries

DRIVER_WINDOW = 50

# Round-6 FRONT (r05 verdict #6): the 9 entries whose newest green
# driver row was r04 rotate back into the window; round-5's FRONT set
# (all holding fresh r05 rows) takes their place past it.
FRONT_SET = [  # band-ordered, then registration order within the band
    "threshold_filter",
    "dedup_pairs",
    "rolling_window_lookback",
    "grouping_rollup",
    "sort_limit_topn",
    "watermark_confirmed_only",
    "assets_balance",
    "running_ledger",
    "sha256_content_hash",
]

# Round-6 rotation (round-5 verdict #6): the 9 r04-green entries are
# back in the window (FRONT above); the 9 r05-green entries take their
# place past it. Every name here must (a) carry a DuckDB oracle
# exercised by tests/test_oracle_parity.py, (b) hold a green driver row
# from the PREVIOUS round (all nine are green in CORRECTNESS_r05), and
# (c) have its SURVEY §2 rows covered by other in-window entries:
# logical_day/W1 -> the streaming logical-day boundary pytest + the
# lifecycle deadline math; median_by_group/A14 -> the lifecycle
# default_pr median (pytest); share_of_total/A7 + equal_split_capped/
# J5,A11 -> reward_rank_times_pool, windowed_points_clamped,
# earnings_fold; connected_components_star/§2.9 -> connected_components
# (identical oracle) + networkx-exact pytest; dedup_verified_pairs ->
# end-to-end pytest value oracle (test_dedup) + its stage operators
# (minhash_lsh_pairs, ngram_jaccard_pairs, exact_dedup_groups) all in
# window; ann_lsh_topk -> cosine_topk_bruteforce + ann_ivf_topk +
# recall pytest; embedding_label_centroids -> pytest + in-window
# embedding_cosine_dups; frame_sample_plan -> media_features + pytest.
REVIEWED_TAIL_OK = {
    "logical_day",
    "median_by_group",
    "share_of_total",
    "equal_split_capped",
    "connected_components_star",
    "dedup_verified_pairs",
    "ann_lsh_topk",
    "embedding_label_centroids",
    "frame_sample_plan",
}


def test_front_entries_lead():
    # SET comparison: within-band order follows registration seq, which
    # shifts when another test module imports an operator module before
    # the registry's _import_all runs — band membership (what decides
    # the driver window) is the reviewed property, not intra-band order
    names = list(all_queries())
    assert set(names[: len(FRONT_SET)]) == set(FRONT_SET)


def test_out_of_window_entries_are_reviewed():
    names = list(all_queries())
    out = set(names[DRIVER_WINDOW:])
    assert out <= REVIEWED_TAIL_OK, out - REVIEWED_TAIL_OK


def test_tail_entries_keep_their_oracles():
    all_queries()  # force registration
    oracles = all_oracles()
    for name in REVIEWED_TAIL_OK:
        assert name in oracles and oracles[name].strip(), name


def test_order_is_priority_then_registration():
    names = list(all_queries())
    ops = [REGISTRY[n] for n in names]
    keys = [(o.priority, o.seq) for o in ops]
    assert keys == sorted(keys)
