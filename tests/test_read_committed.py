"""Barrier-consistent concurrent reads (pipeline.read_committed).

`final_table` reads each partition's LATEST commit — correct on a quiet
lake, but while a replay round is mid-commit some partitions are at
epoch k+1 with the barrier still at k: a concurrent reader could see a
HALF-COMMITTED round across partitions. `read_committed` honors the
global barrier (the reference's metrics-gated checkpoint,
CHANGES.txt:113-116): partitions ahead of it serve their `.prev`
manifest (kept one version back on every save; manifests advance once
per round, so one version always spans the gap).
"""

import json
import os
import threading

import pandas as pd
import pyarrow as pa
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, read_committed, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(n_events=1200, n_conversations=60, n_epochs=4,
               zipf_a=1.1, delete_frac=0.1)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    if df.empty:
        return df
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


def _read_committed_pandas(lake: str) -> pd.DataFrame:
    return _canon(read_committed(lake).to_pandas())


def _rewind_barrier(lake: str, to_epoch: int) -> None:
    p = os.path.join(lake, "_manifests", "epoch.json")
    with open(p) as f:
        em = json.load(f)
    em["last_epoch"] = to_epoch
    with open(p, "w") as f:
        json.dump(em, f)


def test_read_committed_serves_prev_during_commit_window(tmp_path):
    """Simulate the mid-round window: every partition committed epoch 3
    but the barrier is rewound to 2 — read_committed must serve the
    `.prev` manifests, i.e. the exact epochs≤2 table; final_table (by
    design) already shows epoch 3."""
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    full = _canon(final_table_pandas(lake))

    # the epochs<=2 truth, from an independent bounded replay
    lake2 = str(tmp_path / "lake2")
    cfg2 = EngineConfig(changelog_dir=cl, lake_dir=lake2, num_partitions=4,
                        applier_concurrency=2)
    replay(cfg2, end_epoch=2)
    upto2 = _canon(final_table_pandas(lake2))
    assert not upto2.equals(full)  # epoch 3 must actually change something

    _rewind_barrier(lake, 2)
    got = _read_committed_pandas(lake)
    assert_frames_equal(got, upto2)
    # final_table reads latest commits — the contrast that motivates both
    assert_frames_equal(_canon(final_table_pandas(lake)), full)

    # quiet lake: barrier == manifests, both reads identical
    _rewind_barrier(lake, 3)
    assert_frames_equal(_read_committed_pandas(lake), full)


def test_read_committed_raises_if_gap_exceeds_one_round(tmp_path):
    """`.prev` spans exactly one round; a barrier rewound two rounds back
    is unreachable and must be an error, not a silently wrong table."""
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    replay(cfg)
    _rewind_barrier(lake, 1)  # manifests at 3, .prev at 2: both > 1
    with pytest.raises(RuntimeError, match="barrier"):
        read_committed(lake)


def test_gc_keeps_prev_chain_files(tmp_path):
    """`compact --gc` must not delete files a `.prev` chain still
    references — the commit-window reader depends on them."""
    from rayrep.compact import gc_lake

    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2,
                       state_snapshot_interval=1)  # compact every epoch:
    # each epoch's commit REPLACES the chain, so superseded files exist
    replay(cfg, end_epoch=2)
    replay(cfg)
    lake2 = str(tmp_path / "lake2")
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake2, num_partitions=4,
                        applier_concurrency=2, state_snapshot_interval=1),
           end_epoch=2)
    upto2 = _canon(final_table_pandas(lake2))

    _rewind_barrier(lake, 2)
    gc_lake(lake, keep_epochs=0)  # aggressive: would delete .prev files
    assert_frames_equal(_read_committed_pandas(lake), upto2)


def test_concurrent_reader_only_observes_committed_barriers(tmp_path):
    """A reader polling read_committed WHILE replay runs must only ever
    observe exact per-barrier tables — never a half-committed round."""
    spec = GenSpec(n_events=1500, n_conversations=50, n_epochs=6,
                   zipf_a=1.1, delete_frac=0.1)
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, spec)

    # per-barrier truths from the sequential oracle over epoch prefixes
    import pyarrow.parquet as pq
    import glob as _glob
    epochs = sorted(_glob.glob(os.path.join(cl, "epoch-*")))
    tables = [pq.read_table(e) if e.endswith(".parquet") else
              pa.concat_tables([pq.read_table(f) for f in
                                sorted(_glob.glob(os.path.join(e, "*.parquet")))])
              for e in epochs]
    truths = []
    for k in range(len(tables)):
        # pre-DDL epoch files physically lack `tool`: promote to the union
        prefix = pa.concat_tables(tables[:k + 1], promote_options="default")
        oracle_df, _ = replay_oracle(prefix)
        truths.append(_canon(oracle_df))

    def key(df: pd.DataFrame):
        if df.empty:
            return ()
        return tuple(map(tuple, df[["conv_id", "turn_idx", "text"]]
                         .itertuples(index=False)))

    valid_keys = {key(t) for t in truths} | {()}

    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    err: list = []

    def run():
        try:
            replay(cfg)
        except Exception as e:  # surface thread failures in the test
            err.append(e)

    th = threading.Thread(target=run)
    th.start()
    seen = set()
    observations = 0
    while th.is_alive():
        try:
            got = _read_committed_pandas(lake)
        except RuntimeError:
            continue  # barrier advanced twice mid-scan: documented retry-out
        k = key(got)
        assert k in valid_keys, "observed a non-barrier table"
        seen.add(k)
        observations += 1
    th.join()
    assert not err, err
    # converged final view equals the full oracle
    assert_frames_equal(_read_committed_pandas(lake), truths[-1])
    assert observations >= 2  # the poll loop genuinely raced the replay
