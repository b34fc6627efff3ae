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

FRONT_SET = [
    "earnings_fold",
    "contract_lifecycle_edges",
    "ann_ivf_topk",
    "embedding_cosine_dups",
    "media_features",
]

# Round-4 rotation (round-3 verdict #3): the 7 entries parked past the
# window on r02 rows are back in the window; 8 r03-green entries take
# their place. Every name here must (a) carry a DuckDB oracle exercised
# by tests/test_oracle_parity.py, (b) hold a green driver row from the
# PREVIOUS round, and (c) have its SURVEY §2 rows covered by other
# in-window entries: logical_day/W1 -> running_ledger day bucketing;
# median_by_group/A14 -> sort_limit_topn (promoted); share_of_total/
# A7,J8 -> reward_rank_times_pool; equal_split_capped/A11 ->
# earnings_fold (composes the same top-21 split);
# connected_components_star -> connected_components (same labels, both
# networkx-oracled in pytest); ann_lsh_topk -> ann_ivf_topk +
# embedding_cosine_dups (bucketed ANN family); embedding_label_centroids
# -> the centroid build inside ann_ivf_topk; frame_sample_plan ->
# media_features (multimodal plumbing).
REVIEWED_TAIL_OK = {
    "logical_day",
    "median_by_group",
    "share_of_total",
    "equal_split_capped",
    "connected_components_star",
    "ann_lsh_topk",
    "embedding_label_centroids",
    "frame_sample_plan",
}


def test_front_entries_lead():
    names = list(all_queries())
    assert names[: len(FRONT_SET)] == FRONT_SET


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
