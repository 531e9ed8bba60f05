"""E2E golden replay: engine vs pure-Python oracle (SURVEY.md §5.2).

The gate is the north-star invariant: per-turn `text` equality under stable
(conv_id, turn_idx) ordering, plus full-row equality and counter
reconciliation (CHANGES.txt:113-116 analog).
"""

import pandas as pd
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, replay, replay_batch

from .oracle import replay_oracle

SPEC = GenSpec(seed=42, n_conversations=50, max_turns=8, n_events=1000, n_epochs=4)


def assert_frames_equal(engine: pd.DataFrame, oracle: pd.DataFrame):
    assert len(engine) == len(oracle), f"row count {len(engine)} != {len(oracle)}"
    # the north-star invariant first: per-turn text equality, stable order
    pd.testing.assert_series_equal(
        engine["text"].reset_index(drop=True),
        oracle["text"].reset_index(drop=True),
        check_names=False,
    )
    cols = sorted(set(engine.columns) & set(oracle.columns))
    e = engine[cols].reset_index(drop=True)
    o = oracle[cols].reset_index(drop=True)
    for c in cols:
        ev, ov = e[c], o[c]
        if ev.dtype == object:
            ev = ev.where(pd.notna(ev), None)
            ov = ov.where(pd.notna(ov), None)
        pd.testing.assert_series_equal(ev, ov, check_names=False, check_dtype=False)


@pytest.fixture(scope="module")
def changelog_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cl"))
    write_changelog(d, SPEC)
    return d


@pytest.fixture(scope="module")
def oracle_result():
    return replay_oracle(generate_changelog(SPEC))


def test_generator_properties(changelog_dir):
    import pyarrow.parquet as pq
    import glob
    import numpy as np

    tables = []
    for p in sorted(glob.glob(changelog_dir + "/epoch-*/part-*.parquet")):
        tables.append(pq.read_table(p).to_pandas())
    df = pd.concat(tables, ignore_index=True).sort_values("seq")
    seq = df["seq"].to_numpy()
    assert (np.diff(seq) == 1).all() and seq[0] == 0  # dense, strictly increasing
    assert set(df["op"].unique()) == {"I", "U", "D", "DDL"}
    # first event per key is I (or key is in the snapshot prefix, all I)
    rows = df[df["op"] != "DDL"]
    first = rows.groupby(["conv_id", "turn_idx"], sort=False).first()
    assert (first["op"] == "I").all()
    # U never directly follows an applied D within a key
    for _, g in rows.groupby(["conv_id", "turn_idx"], sort=False):
        ops = g.sort_values("seq")["op"].tolist()
        for a, b in zip(ops, ops[1:]):
            assert not (a == "D" and b == "U")


def test_clean_replay_streaming(changelog_dir, tmp_lake, oracle_result):
    oracle_df, oracle_ctr = oracle_result
    cfg = EngineConfig(
        changelog_dir=changelog_dir, lake_dir=tmp_lake, num_partitions=8,
        applier_concurrency=2, augmenter_concurrency=2,
    )
    res = replay(cfg)
    got = final_table_pandas(tmp_lake)
    assert_frames_equal(got, oracle_df)
    t = res["totals"]
    assert t["input_rows"] == oracle_ctr["input_rows"]
    assert t["applied"] == oracle_ctr["applied"]
    assert t["conflict"] == oracle_ctr["conflict"]
    assert t["deleted"] == oracle_ctr["deleted"]
    assert t["skipped"] == 0
    assert res["schema_version"] == 2


def test_clean_replay_batch(changelog_dir, oracle_result):
    oracle_df, _ = oracle_result
    ds = replay_batch(changelog_dir, num_partitions=8)
    got = (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"], kind="stable")
        .reset_index(drop=True)
    )
    assert_frames_equal(got, oracle_df)


def test_replay_is_idempotent(changelog_dir, tmp_lake, oracle_result):
    """Re-running a finished replay must be a no-op (all epochs committed)."""
    oracle_df, _ = oracle_result
    cfg = EngineConfig(
        changelog_dir=changelog_dir, lake_dir=tmp_lake, num_partitions=8,
        applier_concurrency=2, augmenter_concurrency=2,
    )
    replay(cfg)
    res2 = replay(cfg)
    assert res2["epochs"] == []  # nothing re-applied
    assert_frames_equal(final_table_pandas(tmp_lake), oracle_df)


def test_replay_restores_session_block_size(changelog_dir, tmp_lake):
    """target_block_mb applies only for the duration of replay(): the
    caller's DataContext must come back untouched (the driver process may
    run non-engine datasets afterwards)."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    before = ctx.target_max_block_size
    cfg = EngineConfig(
        changelog_dir=changelog_dir, lake_dir=tmp_lake, num_partitions=4,
        applier_concurrency=2, augmenter_concurrency=2, target_block_mb=64,
    )
    replay(cfg)
    assert ctx.target_max_block_size == before


def test_partition_routing_golden_values():
    """Routing must stay stable across library upgrades — every existing
    lake's state placement depends on it (stable_hash_strings delegates
    to pandas' fixed-key SipHash). If this test ever fails, the hash
    changed underneath us and existing lakes need a full re-route
    migration before resuming."""
    import numpy as np

    from rayrep.hashing import partition_ids, partition_ids_salted

    keys = ["conv-00000", "conv-12345", "hot-conversation"]
    assert partition_ids(keys, 32).tolist() == [30, 15, 13]
    assert partition_ids_salted(
        keys, np.array([0, 7, 63]), 32).tolist() == [30, 6, 28]
