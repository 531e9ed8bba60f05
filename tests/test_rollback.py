"""In-place rollback (rayrep/rollback.py): rewinding to barrier k must be
BIT-identical to a replay that only ever reached k — state, watermarks,
counters, live_rows — and a resumed replay afterwards must converge to
the full-history table with the same counters as a straight run."""

import glob
import json
import os

import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.manifests import EpochManifest, PartitionManifest
from rayrep.pipeline import final_table_pandas, replay
from rayrep.rollback import RollbackError, rollback_lake

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=77, n_conversations=60, max_turns=5, n_events=1500,
               n_epochs=4, delete_frac=0.05)


def _manifest_view(lake):
    """Comparable per-partition commit state (paths are lake-relative so
    two lakes compare equal)."""
    out = {}
    for p in sorted(glob.glob(os.path.join(lake, "_manifests", "p*.json"))):
        with open(p) as f:
            d = json.load(f)
        out[d["part_id"]] = {
            "epoch": d["epoch"], "last_seq": d["last_seq"],
            "live_rows": d["live_rows"], "counters": d["counters"],
            "chain": d["state_chain"], "max_ts_us": d["max_ts_us"],
        }
    return out


def test_rollback_bit_equals_bounded_replay(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    # lake A: full replay then rollback to epoch 1
    lake_a = str(tmp_path / "lake_a")
    cfg_a = EngineConfig(changelog_dir=d, lake_dir=lake_a, num_partitions=4,
                         applier_concurrency=2)
    replay(cfg_a)
    res = rollback_lake(lake_a, to_epoch=1)
    assert res["barrier"] == 1 and res["restored"] >= 1
    # lake B: replay that only ever reached epoch 1
    lake_b = str(tmp_path / "lake_b")
    cfg_b = EngineConfig(changelog_dir=d, lake_dir=lake_b, num_partitions=4,
                         applier_concurrency=2)
    replay(cfg_b, end_epoch=1)
    assert_frames_equal(final_table_pandas(lake_a), final_table_pandas(lake_b))
    assert _manifest_view(lake_a) == _manifest_view(lake_b)
    assert EpochManifest.load(lake_a).last_epoch == 1
    # no state file above epoch 1 survives anywhere
    for sp in glob.glob(os.path.join(lake_a, "part-*", "state-e*.parquet")):
        assert "e0000" in os.path.basename(sp) and \
            int(os.path.basename(sp)[7:12]) <= 1, sp


def test_rollback_then_resume_converges(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    r1 = replay(cfg)
    rollback_lake(lake, to_epoch=0)
    r2 = replay(cfg)  # re-applies epochs 1..3
    assert [e["epoch"] for e in r2["epochs"]] == [1, 2, 3]
    oracle_df, octr = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    # counters after rollback+resume equal a straight run's (exactly-once:
    # the rolled-back epochs re-applied as if for the first time)
    assert r2["totals"] == r1["totals"]


def test_rollback_horizon_compaction_and_gc(tmp_path):
    """Pre-gc, rollback below a compaction point still works (the old
    chain files survive as superseded artifacts); after gc the horizon
    has moved and rollback refuses."""
    from rayrep.compact import compact_lake, gc_lake

    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    compact_lake(lake)  # chains fold to one full file at the barrier
    # pre-gc: superseded epoch files still on disk → rollback works
    rollback_lake(lake, to_epoch=2)
    lake_b = str(tmp_path / "lake_b")
    replay(EngineConfig(changelog_dir=d, lake_dir=lake_b, num_partitions=4,
                        applier_concurrency=2), end_epoch=2)
    assert_frames_equal(final_table_pandas(lake), final_table_pandas(lake_b))
    # resume to the full barrier, compact, gc → horizon gone
    replay(cfg)
    compact_lake(lake)
    gc_lake(lake)
    with pytest.raises(RollbackError, match="horizon"):
        rollback_lake(lake, to_epoch=1)
    # refusal validated up front: the lake is still intact at its barrier
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_rollback_deletes_partition_born_later(tmp_path):
    """A partition whose first event arrives after the target barrier is
    deleted by rollback and recreated by the resume."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayrep.schema import CHANGELOG_SCHEMA

    from .test_scenarios import ev

    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    os.makedirs(d)
    # conv ids chosen so epoch-1's key routes to a partition untouched in
    # epoch 0 (probe the hash at P=4)
    from rayrep.hashing import partition_ids

    base_key = "conv-base"
    p0 = int(partition_ids(np.array([base_key], dtype=object), 4)[0])
    other = next(f"conv-{i}" for i in range(100)
                 if int(partition_ids(np.array([f"conv-{i}"], dtype=object), 4)[0]) != p0)
    pq.write_table(pa.Table.from_pylist(
        [ev(0, "I", base_key, 0, "x", ts=0)], schema=CHANGELOG_SCHEMA),
        os.path.join(d, "epoch-00000.parquet"))
    pq.write_table(pa.Table.from_pylist(
        [ev(1, "I", other, 0, "y", ts=1)], schema=CHANGELOG_SCHEMA),
        os.path.join(d, "epoch-00001.parquet"))
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    assert len(final_table_pandas(lake)) == 2
    res = rollback_lake(lake, to_epoch=0)
    assert res["deleted_partitions"] == 1
    got = final_table_pandas(lake)
    assert list(got["conv_id"]) == [base_key]
    replay(cfg)
    assert len(final_table_pandas(lake)) == 2


def test_rollback_refuses_no_history_and_bad_epoch(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    with pytest.raises(ValueError, match="to_epoch"):
        rollback_lake(lake, to_epoch=99)
    with pytest.raises(ValueError, match="to_epoch"):
        rollback_lake(lake, to_epoch=-1)
    # strip history from one manifest → legacy-lake refusal, lake intact
    mp = sorted(glob.glob(os.path.join(lake, "_manifests", "p*.json")))[0]
    with open(mp) as f:
        m = json.load(f)
    m["history"] = []
    with open(mp, "w") as f:
        json.dump(m, f)
    with pytest.raises(RollbackError, match="history"):
        rollback_lake(lake, to_epoch=1)
    assert EpochManifest.load(lake).last_epoch == 3


def test_rollback_idempotent_rerun_and_distributed(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    want = None
    rollback_lake(lake, to_epoch=1, distributed=True)
    want = _manifest_view(lake)
    # re-run (crash-recovery semantics): no-op, same state
    res = rollback_lake(lake, to_epoch=1)
    assert res["restored"] == 0 and res["deleted_partitions"] == 0
    assert _manifest_view(lake) == want


def test_rollback_prunes_delta_sideoutput(tmp_path):
    """Day-delta files for rolled-back epochs are removed so a replica
    refresh can never consume rolled-back changes."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, SPEC)
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, delta_output=True)
    replay(cfg)
    assert glob.glob(os.path.join(lake, "delta", "p*", "e*.parquet"))
    rollback_lake(lake, to_epoch=0)
    for p in glob.glob(os.path.join(lake, "delta", "p*", "e*.parquet")):
        e = int(os.path.basename(p)[1:-8])
        assert e <= 0, p
