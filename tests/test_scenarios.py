"""Scenario fixtures from FIXTURES.md §4: resume, chaos, time-travel,
delete/resurrect, ts ties, skew, redelivery (exactly-once)."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, replay
from rayrep.schema import CHANGELOG_SCHEMA
from rayrep.timetravel import as_of

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=7, n_conversations=40, max_turns=6, n_events=800, n_epochs=4, zipf_a=1.1)


def ev(seq, op, conv, turn, text=None, ts=0, role="user", tool=None, schema_ver=1, ddl=None):
    from rayrep.gen import T0_US

    return {
        "seq": seq, "txn_id": 0, "op": op, "schema_ver": schema_ver,
        "conv_id": conv, "turn_idx": turn, "role": None if op == "D" else role,
        "text": None if op == "D" else text, "tool": tool,
        "ts": T0_US + ts, "ddl": ddl,
    }


def write_epochs(d, *epoch_rows):
    os.makedirs(d, exist_ok=True)
    for e, rows in enumerate(epoch_rows):
        tbl = pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)
        pq.write_table(tbl, os.path.join(d, f"epoch-{e:05d}.parquet"))


def run(d, lake, **kw):
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, **kw)
    return cfg, replay(cfg)


# ---------------------------------------------------------------- exactly-once
def test_redelivered_events_are_skipped(tmp_path):
    """At-least-once delivery: epoch 1 re-contains epoch 0's events; the
    seq watermark must skip them (J5; pGTID safe-checkpoint analog)."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    e0 = [ev(0, "I", "a", 0, "v0", ts=0), ev(1, "I", "b", 0, "w0", ts=0)]
    e1 = [ev(0, "I", "a", 0, "v0", ts=0), ev(1, "I", "b", 0, "w0", ts=0),
          ev(2, "U", "a", 0, "v1", ts=5)]
    write_epochs(d, e0, e1)
    _, res = run(d, lake)
    t = res["totals"]
    assert t["skipped"] == 2 and t["applied"] == 3 and t["input_rows"] == 5
    got = final_table_pandas(lake)
    assert got[got.conv_id == "a"]["text"].iloc[0] == "v1"


def test_resume_after_partition_commit_but_before_epoch_commit(tmp_path):
    """Crash window between the last partition manifest and the global epoch
    manifest: on restart the epoch re-runs and every partition reports
    already_committed — final state and cumulative counters unchanged."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    cfg, res1 = run(d, lake)
    oracle_df, oracle_ctr = replay_oracle(generate_changelog(SPEC))
    # simulate the crash: epoch manifest regresses to epoch 1
    epath = os.path.join(lake, "_manifests", "epoch.json")
    with open(epath) as f:
        em = json.load(f)
    ctr_after_1 = {k: sum(e[k] for e in res1["epochs"][:2]) for k in em["totals"]}
    em["last_epoch"] = 1
    em["totals"] = ctr_after_1
    with open(epath, "w") as f:
        json.dump(em, f)
    _, res2 = run(d, lake)
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res2["totals"] == {k: oracle_ctr[k] for k in res2["totals"]}


# --------------------------------------------------------------------- chaos
def test_chaos_monkey_preserves_correctness(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    _, res = run(d, lake, chaos_fraction=0.2, chaos_seed=99)
    retries = sum(e["chaos_retries"] for e in res["epochs"])
    assert retries > 0, "chaos must have fired at 20%"
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


# --------------------------------------------------------------- time travel
def test_time_travel_matches_truncated_oracle(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    full = generate_changelog(SPEC)
    cut = int(np.quantile(full["ts"].cast(pa.int64()).to_numpy(), 0.6))
    oracle_df, _ = replay_oracle(full, as_of_ts_us=cut)
    got = (
        as_of(d, cut, num_partitions=4)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert_frames_equal(got, oracle_df)


# ------------------------------------------------------- LWW edge semantics
def test_delete_then_resurrect(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "I", "a", 0, "born", ts=0), ev(1, "D", "a", 0, ts=10),
            ev(2, "I", "a", 0, "reborn", ts=20)]
    write_epochs(d, rows)
    _, res = run(d, lake)
    got = final_table_pandas(lake)
    assert list(got["text"]) == ["reborn"]
    assert res["totals"]["deleted"] == 1


def test_tombstone_masks_older_reinsert(tmp_path):
    """HBase semantics: a put with a version OLDER than the delete marker
    stays masked — the tombstone's (ts, seq) participates in LWW."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "I", "a", 0, "born", ts=0), ev(1, "D", "a", 0, ts=100),
            ev(2, "I", "a", 0, "stale-reborn", ts=50)]
    write_epochs(d, rows)
    _, res = run(d, lake)
    assert len(final_table_pandas(lake)) == 0
    assert res["totals"]["conflict"] == 1


def test_ts_tie_broken_by_seq(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "I", "a", 0, "first", ts=5), ev(1, "U", "a", 0, "second", ts=5)]
    write_epochs(d, rows)
    _, _ = run(d, lake)
    assert list(final_table_pandas(lake)["text"]) == ["second"]


def test_delete_on_absent_key_is_noop_tombstone(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "D", "zz", 9, ts=5), ev(1, "I", "a", 0, "x", ts=6)]
    write_epochs(d, rows)
    _, res = run(d, lake)
    assert list(final_table_pandas(lake)["text"]) == ["x"]
    assert res["totals"]["applied"] == 2


# --------------------------------------------------------- schema evolution
def test_rename_column_evolution(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rename = json.dumps({"action": "rename_column", "from": "role", "to": "speaker"})
    e0 = [ev(0, "I", "a", 0, "x", ts=0, role="user")]
    e1 = [ev(1, "DDL", None, None, ddl=rename, schema_ver=2, ts=1)]
    # post-rename event: payload arrives under the NEW name
    t2 = ev(2, "U", "a", 0, "y", ts=2, schema_ver=2)
    e1.append(t2)
    write_epochs(d, e0, e1)
    # rewrite epoch 1 with `speaker` instead of `role`
    p1 = os.path.join(d, "epoch-00001.parquet")
    t = pq.read_table(p1).rename_columns(
        ["speaker" if c == "role" else c for c in pq.read_table(p1).column_names]
    )
    pq.write_table(t, p1)
    _, res = run(d, lake)
    got = final_table_pandas(lake)
    assert "speaker" in got.columns and "role" not in got.columns
    assert list(got["text"]) == ["y"]
    assert res["schema_version"] == 2


def test_add_column_backfills_null(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    add = json.dumps({"action": "add_column", "name": "tool", "type": "string"})
    e0 = [ev(0, "I", "a", 0, "pre", ts=0)]
    e1 = [ev(1, "DDL", None, None, ddl=add, schema_ver=2, ts=1),
          ev(2, "I", "b", 0, "post", ts=2, tool="search", schema_ver=2)]
    write_epochs(d, e0, e1)
    # epoch 0 physically lacks `tool`
    p0 = os.path.join(d, "epoch-00000.parquet")
    pq.write_table(pq.read_table(p0).drop_columns(["tool"]), p0)
    _, _ = run(d, lake)
    got = final_table_pandas(lake).set_index("conv_id")
    assert got.loc["a", "tool"] is None or pd.isna(got.loc["a", "tool"])
    assert got.loc["b", "tool"] == "search"


# ------------------------------------------------------------- changed cells
def test_changed_cells_update_merges_non_null(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    e0 = [ev(0, "I", "a", 0, "full", ts=0, role="user"),
          {**ev(1, "U", "a", 0, None, ts=5, role=None), "text": None, "role": "assistant"}]
    write_epochs(d, e0)
    _, _ = run(d, lake, changed_cells_updates=True)
    got = final_table_pandas(lake)
    assert got["text"].iloc[0] == "full"          # unchanged cell survives
    assert got["role"].iloc[0] == "assistant"     # changed cell applied


def test_changed_cells_delta_chain_multi_epoch(tmp_path):
    """Changed-cells mode is now a DELTA path: multiple epochs append
    partial-row deltas to the chain (O(delta) per epoch) and the cell fold
    happens at read/compaction. Low compact_interval forces a mid-stream
    cells compaction; results must still equal the merging oracle."""
    from rayrep.gen import generate_changelog

    spec = GenSpec(seed=13, n_conversations=25, max_turns=4, n_events=800,
                   n_epochs=6, changed_cells_frac=0.7)
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, spec)
    _, res = run(d, lake, changed_cells_updates=True, state_snapshot_interval=2)
    oracle_df, octr = replay_oracle(generate_changelog(spec), changed_cells=True)
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    assert res["totals"]["conflict"] == octr["conflict"]


def test_per_cell_conflicts_hbase_semantics(tmp_path):
    """per_cell_conflicts=True (HBase parity): a ts-INVERTED partial update
    still applies to columns no newer event touched; per column the max
    (ts, seq) non-null version wins; a delete masks only OLDER versions."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    e0 = [
        ev(0, "I", "a", 0, "t0", ts=0, role="r0"),
        # newer event updates text only (role null = unchanged)
        {**ev(1, "U", "a", 0, "t10", ts=10), "role": None},
        # LATE partial update at ts=5: row-level mode would reject it;
        # per-cell mode applies its role (no newer event touched role)
        # but must NOT override text (t10 is a newer version)
        {**ev(2, "U", "a", 0, "t5", ts=5), "role": "r5"},
        # late delete at ts=3 masks nothing newer; row 'a' stays live
        ev(3, "D", "a", 0, ts=3),
        # second key: delete at ts=20, then LATE update at ts=15 → masked
        ev(4, "I", "b", 0, "b0", ts=0),
        ev(5, "D", "b", 0, ts=20),
        {**ev(6, "U", "b", 0, "b15", ts=15), "role": "rb"},
    ]
    write_epochs(d, e0)
    _, res = run(d, lake, changed_cells_updates=True, per_cell_conflicts=True)
    got = final_table_pandas(lake).set_index("conv_id")
    assert got.loc["a", "text"] == "t10"       # newest text version
    assert got.loc["a", "role"] == "r5"        # late cell applied per-cell
    assert "b" not in got.index                # delete at ts=20 wins for b
    assert res["totals"]["conflict"] == 0      # no row-level rejections
    assert res["totals"]["applied"] == 7


def test_per_cell_multi_epoch_and_prior_state(tmp_path):
    """Per-cell resolution across EPOCHS: a later epoch's out-of-order
    event must resolve against prior-state cell versions, incl. liveness
    bookkeeping when the prior version is newer than the whole epoch."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    e0 = [ev(0, "I", "a", 0, "t20", ts=20, role="r20"),
          ev(1, "I", "b", 0, "b20", ts=20)]
    # epoch 1 arrives later but carries OLDER versions
    e1 = [{**ev(2, "U", "a", 0, "t15", ts=15), "role": None},  # text older → masked
          ev(3, "D", "b", 0, ts=10)]                           # delete older → no-op
    write_epochs(d, e0, e1)
    _, res = run(d, lake, changed_cells_updates=True, per_cell_conflicts=True)
    got = final_table_pandas(lake).set_index("conv_id")
    assert got.loc["a", "text"] == "t20" and got.loc["a", "role"] == "r20"
    assert got.loc["b", "text"] == "b20"       # late delete masked by newer I
    assert len(got) == 2
    # resume validation: per-cell lake refuses row-level resume
    with pytest.raises(ValueError, match="conflict semantics"):
        run(d, lake, changed_cells_updates=True)


def test_per_cell_versions_survive_compaction(tmp_path):
    """Compaction must preserve PER-CELL versions. A write landing BETWEEN
    a cell's true last version and the key's newest row version must still
    win after the chain has been compacted: round-3 compaction collapsed
    each key to one row stamped with the row's LAST (ts, seq), so such a
    write wrongly lost — the prune-compaction fix keeps each cell's
    winning row (with its own version) in the compacted file instead."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    # epoch 0: full insert — text and role both at version 100
    e0 = [ev(0, "I", "a", 0, "t100", ts=100, role="r100")]
    # epoch 1: newer text only (role untouched; its version stays 100)
    e1 = [{**ev(1, "U", "a", 0, "t200", ts=200), "role": None}]
    # epoch 2: role at ts=150 — newer than role's version (100), older
    # than the key's newest row version (200) → must win per-cell
    e2 = [{**ev(2, "U", "a", 0, None, ts=150), "role": "r150"}]
    write_epochs(d, e0, e1, e2)
    # snapshot_interval=1 forces a cells compaction after EVERY epoch, so
    # the e2 event resolves against an already-compacted chain
    _, res = run(d, lake, changed_cells_updates=True, per_cell_conflicts=True,
                 state_snapshot_interval=1)
    got = final_table_pandas(lake).set_index("conv_id")
    assert got.loc["a", "text"] == "t200"
    assert got.loc["a", "role"] == "r150"
    # same stream WITHOUT compaction must agree (compaction is invisible)
    lake2 = str(tmp_path / "lake2")
    run(d, lake2, changed_cells_updates=True, per_cell_conflicts=True,
        state_snapshot_interval=99)
    assert_frames_equal(final_table_pandas(lake), final_table_pandas(lake2))


def test_per_cell_delete_masking_survives_compaction(tmp_path):
    """The compacted file must also retain the last-DELETE row with its
    own version: a post-compaction write OLDER than the delete must stay
    masked, and one NEWER must resurrect the key."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    e0 = [ev(0, "I", "a", 0, "a0", ts=100), ev(1, "I", "b", 0, "b0", ts=100)]
    e1 = [ev(2, "D", "a", 0, ts=300), ev(3, "D", "b", 0, ts=300)]
    # post-compaction: a's write is older than the delete → masked;
    # b's write is newer → resurrects
    e2 = [ev(4, "U", "a", 0, "a250", ts=250),
          ev(5, "U", "b", 0, "b400", ts=400)]
    write_epochs(d, e0, e1, e2)
    _, _ = run(d, lake, changed_cells_updates=True, per_cell_conflicts=True,
               state_snapshot_interval=1)
    got = final_table_pandas(lake).set_index("conv_id")
    assert "a" not in got.index
    assert got.loc["b", "text"] == "b400"


def test_durable_sync_mode_matches_oracle(tmp_path):
    """durable_sync=True (fsync before manifest commit, power-loss
    durability) must be behavior-identical; only the sync cost differs."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    spec = GenSpec(seed=5, n_conversations=20, max_turns=4, n_events=300, n_epochs=2)
    write_changelog(d, spec)
    _, res = run(d, lake, durable_sync=True)
    oracle_df, octr = replay_oracle(generate_changelog(spec))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["applied"] == octr["applied"]


# ---------------------------------------------------------- combine parity
def test_uncombined_replay_matches_oracle(tmp_path):
    """map_combine=False (the fallback path used when a resumed round
    overlaps a watermark) must produce identical state AND counters."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    _, res = run(d, lake, map_combine=False)
    oracle_df, octr = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    assert res["totals"]["conflict"] == octr["conflict"]


# ------------------------------------------------------------------ skew
def test_skewed_one_huge_conversation(tmp_path):
    spec = GenSpec(seed=3, n_conversations=5, max_turns=4, n_events=600,
                   n_epochs=2, zipf_a=2.0)
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, spec)
    _, _ = run(d, lake)
    oracle_df, _ = replay_oracle(generate_changelog(spec))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


# ------------------------------------------------------------------ bootstrap
def test_bootstrap_snapshot_prefix(tmp_path):
    import ray.data as rd

    from rayrep.bootstrap import bootstrap_snapshot
    from rayrep.gen import T0_US

    base = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": np.array([0, 1, 0], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": ["hi", "hello", "yo"],
            "ts": pd.to_datetime([T0_US] * 3, unit="us"),
        }
    )
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    m = bootstrap_snapshot(rd.from_pandas(base), d, ts_us=T0_US)
    assert m == {"rows": 3, "next_seq": 3}
    # tail epoch continues after the snapshot
    write_epochs_dir = [ev(3, "U", "a", 0, "hi2", ts=50)]
    tbl = pa.Table.from_pylist(write_epochs_dir, schema=CHANGELOG_SCHEMA)
    pq.write_table(tbl, os.path.join(d, "epoch-00001.parquet"))
    _, res = run(d, lake)
    got = final_table_pandas(lake)
    assert len(got) == 3 and got[got.turn_idx == 0].set_index("conv_id").loc["a", "text"] == "hi2"


def test_changed_cells_generated_stream(tmp_path):
    """E2E changed-cells mode: generated partial-U stream replayed with
    changed_cells_updates=True equals the merging oracle."""
    from rayrep.gen import generate_changelog

    spec = GenSpec(seed=11, n_conversations=30, max_turns=5, n_events=600,
                   n_epochs=2, changed_cells_frac=0.6)
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, spec)
    _, res = run(d, lake, changed_cells_updates=True)
    oracle_df, octr = replay_oracle(generate_changelog(spec), changed_cells=True)
    got = final_table_pandas(lake)
    assert_frames_equal(got, oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    assert res["totals"]["conflict"] == octr["conflict"]


def test_staged_exchange_matches_oracle(tmp_path):
    """exchange='staged' (filesystem shuffle files) must produce the same
    converged table and counters as the groupby path."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    _, res = run(d, lake, exchange="staged")
    oracle_df, octr = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    assert res["totals"]["conflict"] == octr["conflict"]
    assert res["totals"]["skipped"] == 0
    # staging dirs cleaned after commit
    assert not os.path.exists(os.path.join(lake, "_stage")) or not os.listdir(
        os.path.join(lake, "_stage")
    )


def test_pack_exchange_auto_resolution():
    """pack_exchange="auto" (the default) packs exactly when the exchange
    crosses node boundaries. In this single-node session it must resolve
    to False (plain groupby — no pack/unpack ALU cost on one box); bools
    pass through; non-groupby exchanges never pack; a typo'd string is a
    config error, not a silent plain-exchange run."""
    from rayrep.pipeline import resolve_pack_exchange

    cfg = EngineConfig(changelog_dir="x", lake_dir="y")
    assert cfg.pack_exchange == "auto"
    assert resolve_pack_exchange(cfg) is False  # ray.nodes() == 1 here
    for want in (True, False):
        cfg = EngineConfig(changelog_dir="x", lake_dir="y", pack_exchange=want)
        assert resolve_pack_exchange(cfg) is want
    cfg = EngineConfig(changelog_dir="x", lake_dir="y",
                       exchange="staged", pack_exchange=True)
    assert resolve_pack_exchange(cfg) is False
    cfg = EngineConfig(changelog_dir="x", lake_dir="y", pack_exchange="always")
    with pytest.raises(ValueError, match="pack_exchange"):
        resolve_pack_exchange(cfg)


def test_packed_exchange_matches_oracle(tmp_path):
    """pack_exchange=True (per-partition compressed IPC blobs through the
    sort shuffle, rayrep/exchange.pack_batch) must be invisible: same
    converged table AND counters as the plain groupby path, in both
    applier modes, including a kill/resume window."""
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    oracle_df, octr = replay_oracle(generate_changelog(SPEC))
    for mode in ("tasks", "actors"):
        lake = str(tmp_path / f"lake-{mode}")
        _, res = run(d, lake, pack_exchange=True, applier_mode=mode)
        assert_frames_equal(final_table_pandas(lake), oracle_df)
        assert res["totals"]["applied"] == octr["applied"]
        assert res["totals"]["conflict"] == octr["conflict"]
    # codec="none": blob-pack without compression (pure sort-row win)
    lake = str(tmp_path / "lake-nocodec")
    _, res = run(d, lake, pack_exchange=True, pack_codec="none")
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["applied"] == octr["applied"]
    # resume: epoch 0 committed packed, rest replayed packed
    lake = str(tmp_path / "lake-resume")
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, pack_exchange=True)
    replay(cfg, end_epoch=0)
    res = replay(cfg)
    assert [e["epoch"] for e in res["epochs"]] == [1, 2, 3]
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_tail_consumes_progressively_published_epochs(tmp_path):
    """Continuous tail mode: a producer thread publishes epochs atomically
    while tail() polls; the final lake equals a batch replay of the full
    log (reference: long-running binlog tailer)."""
    import threading
    import time as _t

    from rayrep.gen import generate_changelog, publish_epoch
    from rayrep.pipeline import tail

    full = generate_changelog(SPEC)
    n = full.num_rows
    bounds = [0, n // 3, 2 * n // 3, n]
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    os.makedirs(d)
    publish_epoch(d, 0, full.slice(0, bounds[1]))

    def producer():
        for e in (1, 2):
            _t.sleep(1.5)
            publish_epoch(d, e, full.slice(bounds[e], bounds[e + 1] - bounds[e]))

    th = threading.Thread(target=producer)
    th.start()
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4)
    res = tail(cfg, poll_interval_s=0.5, idle_timeout_s=6.0)
    th.join()
    assert len(res["epochs"]) >= 1
    oracle_df, octr = replay_oracle(full)
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["input_rows"] == octr["input_rows"]


def test_drop_column_evolution(tmp_path):
    """DDL drop_column mid-stream: the dropped column disappears from the
    canonical schema and the converged table; pre-drop rows keep their
    remaining payload."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    drop = json.dumps({"action": "drop_column", "name": "tool"})
    addv = json.dumps({"action": "add_column", "name": "tool", "type": "string"})
    e0 = [ev(0, "DDL", None, None, ddl=addv, schema_ver=2, ts=0),
          ev(1, "I", "a", 0, "x", ts=1, tool="search", schema_ver=2)]
    e1 = [ev(2, "DDL", None, None, ddl=drop, schema_ver=3, ts=2),
          ev(3, "I", "b", 0, "y", ts=3, schema_ver=3)]
    write_epochs(d, e0, e1)
    _, res = run(d, lake)
    got = final_table_pandas(lake)
    assert "tool" not in got.columns
    assert sorted(got["text"]) == ["x", "y"]
    assert res["schema_version"] == 3


def test_rename_between_deltas_survives_compaction(tmp_path):
    """Regression: a column rename between delta epochs must not strand
    pre-rename rows' payload when the chain compacts — the fold conforms
    each file to the current schema BEFORE merging."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rename = json.dumps({"action": "rename_column", "from": "text", "to": "body"})
    e0 = [ev(0, "I", "a", 0, "keepme", ts=0)]
    e1 = [ev(1, "DDL", None, None, ddl=rename, schema_ver=2, ts=1)]
    e2 = [{**ev(2, "I", "b", 0, None, ts=2, schema_ver=2), "text": None}]
    e3 = [{**ev(3, "I", "c", 0, None, ts=3, schema_ver=2), "text": None}]
    write_epochs(d, e0, e1, e2, e3)
    # post-rename epochs carry the payload under the NEW name
    for i, val in ((2, "post1"), (3, "post2")):
        p = os.path.join(d, f"epoch-{i:05d}.parquet")
        t = pq.read_table(p)
        t = t.rename_columns(["body" if c == "text" else c for c in t.column_names])
        t = t.set_column(t.schema.get_field_index("body"), "body",
                         pa.array([val], pa.string()))
        pq.write_table(t, p)
    # compact on every second epoch so the rename sits mid-chain
    _, _ = run(d, lake, state_snapshot_interval=2)
    got = final_table_pandas(lake).set_index("conv_id")
    assert "body" in got.columns and "text" not in got.columns
    assert got.loc["a", "body"] == "keepme"      # pre-rename payload intact
    assert got.loc["b", "body"] == "post1" and got.loc["c", "body"] == "post2"


def test_manifest_old_format_migrates(tmp_path):
    """A round-1-layout manifest (single `state_file`) must load as a
    one-entry chain instead of raising TypeError on resume."""
    import json as _json

    from rayrep.manifests import PartitionManifest

    lake = str(tmp_path / "lake")
    os.makedirs(os.path.join(lake, "_manifests"))
    old = {"part_id": 0, "epoch": 3, "last_seq": 99,
           "state_file": "part-00000/state-e00003.parquet",
           "counters": {}, "epoch_counters": {}, "max_ts_us": 7}
    with open(os.path.join(lake, "_manifests", "p00000.json"), "w") as f:
        _json.dump(old, f)
    m = PartitionManifest.load(lake, 0)
    assert m.state_chain == ["part-00000/state-e00003.parquet"]
    assert m.epoch == 3 and m.last_seq == 99


def test_empty_epoch_advances_frontier(tmp_path):
    """A zero-row epoch file must advance the epoch manifest without
    touching partitions or breaking the counter invariant."""
    from rayrep.schema import CHANGELOG_SCHEMA

    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_epochs(d, [ev(0, "I", "a", 0, "x", ts=0)], [])
    # epoch 1 written empty via the helper (schema-typed, zero rows)
    _, res = run(d, lake)
    assert [e["epoch"] for e in res["epochs"]] == [0, 1]
    assert list(final_table_pandas(lake)["text"]) == ["x"]


def test_large_zipf_replay_matches_oracle(tmp_path):
    """200k-event zipf(1.5) stream (heavy hot-key skew, map-combine on):
    exact row AND counter parity with the sequential oracle."""
    spec = GenSpec(seed=13, n_conversations=3000, max_turns=10,
                   n_events=200_000, n_epochs=3, zipf_a=1.5)
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, spec)
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=8,
                       applier_concurrency=3)
    res = replay(cfg)
    oracle_df, octr = replay_oracle(generate_changelog(spec))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    for k in ("applied", "conflict", "deleted", "input_rows"):
        assert res["totals"][k] == octr[k], k


def test_epoch_with_only_ddl_events(tmp_path):
    """An epoch containing nothing but a DDL event must advance the epoch
    manifest and the schema version without touching partitions."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    add = json.dumps({"action": "add_column", "name": "tool", "type": "string"})
    e0 = [ev(0, "I", "a", 0, "x", ts=0)]
    e1 = [ev(1, "DDL", None, None, ddl=add, schema_ver=2, ts=1)]
    e2 = [ev(2, "U", "a", 0, "y", ts=5, tool="search", schema_ver=2)]
    write_epochs(d, e0, e1, e2)
    _, res = run(d, lake)
    assert [e["epoch"] for e in res["epochs"]] == [0, 1, 2]
    assert res["schema_version"] == 2
    got = final_table_pandas(lake)
    assert list(got["text"]) == ["y"] and got["tool"].iloc[0] == "search"


def test_replica_from_deltas_equals_final_table(tmp_path):
    """The delta-stream consumer (sinks.replica_from_deltas) rebuilds the
    exact converged table from the daily-delta files alone, on a random
    generator changelog with deletes, conflicts, and zipf-hot keys —
    live rows AND their payload must match final_table bit-for-bit."""
    from rayrep.sinks import replica_from_deltas

    d = str(tmp_path / "cl")
    lake = str(tmp_path / "lake")
    write_changelog(d, SPEC)
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=8,
                       applier_concurrency=2, delta_output=True)
    replay(cfg)
    want = final_table_pandas(lake)
    got = (replica_from_deltas(os.path.join(lake, "delta"), num_partitions=4)
           .to_pandas())
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert_frames_equal(
        got[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        want[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )


def test_salt_turn_keys_equal_table_balanced_and_pinned(tmp_path):
    """Hot-key salting: (a) the salted replay converges to the identical
    table (routing is correctness-neutral — every contract is per
    (conv_id, turn_idx)); (b) a zipf-hot conversation's load actually
    spreads (max per-partition input share drops); (c) flipping the flag
    on an existing lake is refused (LakeMeta pin)."""
    from rayrep.manifests import PartitionManifest

    spec = GenSpec(seed=3, n_conversations=5, max_turns=64, n_events=2000,
                   n_epochs=2, zipf_a=2.5)
    d = str(tmp_path / "cl")
    write_changelog(d, spec)

    def run(salt: bool, name: str):
        lake = str(tmp_path / name)
        cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=8,
                           applier_concurrency=2, delta_output=False,
                           salt_turn_keys=salt)
        replay(cfg)
        loads = [PartitionManifest.load(lake, p).counters.get("input_rows", 0)
                 for p in range(8)]
        return lake, final_table_pandas(lake), np.array(loads)

    lake_plain, t_plain, load_plain = run(False, "lake_plain")
    _, t_salt, load_salt = run(True, "lake_salt")

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert_frames_equal(
        t_salt[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
        t_plain[cols].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True),
    )
    # 5 zipf-2.5 convs over 8 partitions: unsalted pins the hot conv to one
    # partition; salted spreads its turns
    assert load_salt.max() < load_plain.max()
    assert (load_salt > 0).sum() >= (load_plain > 0).sum()

    with pytest.raises(ValueError, match="salt_turn_keys"):
        replay(EngineConfig(changelog_dir=d, lake_dir=lake_plain,
                            num_partitions=8, salt_turn_keys=True))


def test_validate_events_refuses_malformed_rows(tmp_path):
    """With validate_events=True a data event with a null routing/version
    column fails the epoch with a counted, named error (fail-fast +
    supervisor model) instead of undefined grouping; a clean changelog
    passes untouched."""
    d = str(tmp_path / "cl")
    good = [ev(1, "I", "c0", 0, "hello", ts=10), ev(2, "U", "c1", 0, "there", ts=20)]
    bad = dict(ev(3, "U", "c2", 0, "x", ts=30))
    bad["conv_id"] = None
    write_epochs(d, good + [bad])

    cfg = EngineConfig(changelog_dir=d, lake_dir=str(tmp_path / "lake"),
                       num_partitions=4, applier_concurrency=2,
                       delta_output=False, validate_events=True)
    import ray

    with pytest.raises(ray.exceptions.RayTaskError, match="malformed data event"):
        replay(cfg)

    # clean changelog: validation is a no-op
    d2 = str(tmp_path / "cl2")
    write_epochs(d2, good)
    cfg2 = EngineConfig(changelog_dir=d2, lake_dir=str(tmp_path / "lake2"),
                        num_partitions=4, applier_concurrency=2,
                        delta_output=False, validate_events=True)
    replay(cfg2)
    assert len(final_table_pandas(str(tmp_path / "lake2"))) == 2
