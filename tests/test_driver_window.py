"""Pin the driver's 50-slot CORRECTNESS window.

The conformance driver hashes only the FIRST 50 entries of queries()
(insertion order).  This manifest freezes that window so future registry
growth cannot silently evict a flagship oracle from driver visibility:
any reordering must be deliberate (update the manifest in the same commit).
Every window entry must also carry an oracle_sql() so all 50 driver rows
can go green (rows + schema + value hash), never `no_oracle`.
"""

import __ray_entry__ as entrymod

DRIVER_WINDOW = [
    "cdc_replay_events",
    "cdc_replay_deletes",
    "cdc_replay_resume",
    "cdc_replay_chaos",
    "cdc_replay_evolution",
    "cdc_replay_rename",
    "cdc_replay_drop_column",
    "cdc_replay_alter_type",
    "cdc_replay_changed_cells",
    "cdc_replay_cells_compacted",
    "cdc_replay_cells_deletes_compacted",
    "cdc_replay_metrics",
    "cdc_replay_transcripts",
    "cdc_bootstrap_tail",
    "cdc_bulk_load",
    "cdc_tail_mode",
    "cdc_tail_evolution",
    "cdc_tail_compacting",
    "cdc_lease_failover",
    "cdc_downstream_replica",
    "cdc_replica_incremental",
    "cdc_epoch_snapshot",
    "cdc_delta_rollup",
    "cdc_log_compaction",
    "cdc_log_compaction_cells",
    "cdc_secondary_index",
    "cdc_dead_letter",
    "cdc_dlq_requeue",
    "cdc_ingest_dedup",
    "cdc_json_ingest",
    "cdc_training_export",
    "cdc_point_lookup",
    "cdc_repartition",
    "cdc_erasure",
    "cdc_lww_latest",
    "cdc_time_travel",
    "cdc_daily_counts",
    "cdc_event_type_filter",
    "cdc_counters",
    "q1_pricing_summary",
    "revenue_by_nation",
    "top_orders_per_segment",
    "dedup_exact",
    "dedup_minhash",
    "embedding_neardup_pairs",
    "ann_topk",
    "ann_ivf_exact_pruned",
    "pack_sequences",
    "asof_click_value",
    "multimodal_features"
]


def test_driver_window_pinned():
    assert len(DRIVER_WINDOW) == 50
    actual = list(entrymod.queries())[:50]
    assert actual == DRIVER_WINDOW, (
        "first-50 registry keys drifted from the pinned driver window; "
        "if intentional, update DRIVER_WINDOW in the same commit. diff: "
        + str([(i, a, b) for i, (a, b) in
               enumerate(zip(actual, DRIVER_WINDOW)) if a != b])
    )


def test_driver_window_fully_oracled():
    oracles = entrymod.oracle_sql()
    missing = [k for k in DRIVER_WINDOW if k not in oracles]
    assert not missing, f"window entries without a SQL oracle: {missing}"


def test_registry_complete_and_unique():
    qs = entrymod.queries()
    assert len(qs) == len(set(qs)) >= 112
    # every oracle key must point at a real registry entry
    stale = [k for k in entrymod.oracle_sql() if k not in qs]
    assert not stale, f"oracle_sql keys with no queries() entry: {stale}"
