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

# Round-5 FRONT: the 8 entries whose newest green row was r03 (rotated
# back into the window per the round-4 verdict) + the new composed dedup
# pipeline. Round-4's FRONT set (earnings_fold, contract_lifecycle_edges,
# ann_ivf_topk, embedding_cosine_dups, media_features) holds fresh r04
# rows and moved to DEFAULT — still in the window.
FRONT_SET = [  # band-ordered, then registration order within the band
    "logical_day",
    "median_by_group",
    "share_of_total",
    "equal_split_capped",
    "connected_components_star",
    "dedup_verified_pairs",
    "ann_lsh_topk",
    "embedding_label_centroids",
    "frame_sample_plan",
]

# Round-5 rotation (round-4 verdict #3): the 8 r03-green entries are
# back in the window (FRONT above); 9 r04-green entries take their
# place past it. Every name here must (a) carry a DuckDB oracle
# exercised by tests/test_oracle_parity.py, (b) hold a green driver row
# from the PREVIOUS round (all nine are green in CORRECTNESS_r04), and
# (c) have its SURVEY §2 rows covered by other in-window entries:
# threshold_filter/F3 -> pytest branch oracle (importance.py);
# dedup_pairs/A13 -> exact_dedup_groups + dedupe_latest_upsert;
# grouping_rollup/A15 -> method_dispatch; sort_limit_topn/§2.6 ->
# topk_per_group + the golden byte fixture; rolling_window_lookback/
# W3,S6 -> pytest streaming-state oracle; watermark_confirmed_only/
# F5,W4 -> finalized_gated_days + pytest streaming ingest;
# assets_balance/J7 -> signed_stake_balance; running_ledger/K3 ->
# earnings_fold; sha256_content_hash/§2.7-hash -> doc_fingerprint +
# media_features.
REVIEWED_TAIL_OK = {
    "threshold_filter",
    "dedup_pairs",
    "grouping_rollup",
    "sort_limit_topn",
    "rolling_window_lookback",
    "watermark_confirmed_only",
    "assets_balance",
    "running_ledger",
    "sha256_content_hash",
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
