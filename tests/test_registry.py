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
    "contract_lifecycle_edges",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_cosine_dups",
    "embedding_label_centroids",
    "media_features",
    "frame_sample_plan",
]

# every name here must (a) carry a DuckDB oracle exercised by
# tests/test_oracle_parity.py and (b) have its SURVEY §2 rows covered by
# other in-window entries: dedup_pairs/A13 -> dedupe_latest_upsert +
# exact_dedup_groups; sort_limit_topn/A14 -> median_by_group;
# grouping_rollup/A15 -> method_dispatch; assets_balance/J7 ->
# signed_stake_balance; sha256_content_hash/hash-family ->
# doc_fingerprint; extract_edges_relational/S1+A1 ->
# repos_edge_extraction + q1_pricing_summary; threshold_filter/F3 ->
# the importance-branch pytest oracle.
REVIEWED_TAIL_OK = {
    "dedup_pairs",
    "sort_limit_topn",
    "grouping_rollup",
    "threshold_filter",
    "assets_balance",
    "sha256_content_hash",
    "extract_edges_relational",
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
