"""Regression tests for the round-4 advisor findings:

1. DLQ quarantine files are named deterministically from the batch's
   content, so a mid-round Ray task retry overwrites its own file instead
   of appending a uuid-named duplicate (exactly-once for read_dlq /
   requeue_dlq).
2. Lease acquire/renew reassert loops raise instead of silently claiming
   success when the token is never confirmed on disk (covered by
   construction — the for/else raises; exercised via normal paths in
   test_lease.py).
3. Log-compaction's map stage evolves each distinct schema_ver slice at
   its own stamped version when a batch mixes physical schema versions,
   instead of silently evolving the whole batch from max(schema_ver).
4. retain_latest refuses (CompactedLogError) null conv_id/turn_idx rows
   instead of folding them into the (conv, turn 0) key.
5. requeue_dlq takes the writer lease, so a live leased writer fences it
   out; and it re-verifies the changelog tail before publishing.
"""

import glob
import os

import pandas as pd
import pyarrow as pa
import pytest

from rayrep.schema import SchemaVersion, apply_ddl


def _poison(n=3):
    return pa.table({
        "seq": pa.array([None, 7, None], pa.int64())[:n],
        "conv_id": pa.array([None, "cX", None], pa.string())[:n],
        "turn_idx": pa.array([0, None, None], pa.int32())[:n],
        "text": pa.array(["p"] * 3)[:n],
    })


def test_quarantine_retry_overwrites(tmp_path):
    from rayrep.augment import Augmenter

    aug = Augmenter.__new__(Augmenter)
    aug.dead_letter_dir = str(tmp_path / "dlq")
    aug.dlq_epoch = 2
    bad = _poison()
    aug._quarantine(bad)
    aug._quarantine(bad)  # simulated Ray task retry: same rows again
    files = glob.glob(os.path.join(aug.dead_letter_dir, "e00002", "part-*"))
    assert len(files) == 1, files
    # different content -> different file (no collision)
    aug._quarantine(_poison(2))
    files = glob.glob(os.path.join(aug.dead_letter_dir, "e00002", "part-*"))
    assert len(files) == 2
    # no stray tmp files left behind
    assert not glob.glob(os.path.join(aug.dead_letter_dir, "e00002", ".*"))


def _history_v1_v2():
    v1 = SchemaVersion(1, pa.schema([
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("body", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]))
    v2 = apply_ddl(v1, '{"action": "rename_column", "from": "body", "to": "text"}')
    return {1: v1, 2: v2}


def test_evolve_route_handles_mixed_schema_ver_batch():
    from rayrep.logcompact import _evolve_route_batch

    hist = _history_v1_v2()
    kwargs = {
        "history_json": {v: sv.to_json() for v, sv in hist.items()},
        "final_version": 2,
        "n_tasks": 4,
    }
    ts = pa.array([pd.Timestamp("2024-01-01")] * 3, pa.timestamp("us"))
    # one batch mixing a v1 row (column still named `body`) with v2 rows:
    # per-slice evolution must carry the v1 row's body into `text`
    v1_rows = pa.table({
        "seq": pa.array([1], pa.int64()), "op": pa.array(["I"]),
        "schema_ver": pa.array([1], pa.int32()),
        "conv_id": pa.array(["a"]), "turn_idx": pa.array([0], pa.int32()),
        "body": pa.array(["old-row"]), "ts": ts[:1],
    })
    v2_rows = pa.table({
        "seq": pa.array([2, 3], pa.int64()), "op": pa.array(["I", "U"]),
        "schema_ver": pa.array([2, 2], pa.int32()),
        "conv_id": pa.array(["b", "c"]), "turn_idx": pa.array([0, 0], pa.int32()),
        "body": pa.array([None, None], pa.string()),
        "ts": ts[1:],
    })
    # v2 files physically carry `text`, not `body`
    v2_rows = v2_rows.drop_columns(["body"]).append_column(
        "text", pa.array(["new-b", "new-c"]))
    mixed = pa.concat_tables([v1_rows, v2_rows], promote_options="permissive")
    out = _evolve_route_batch(mixed, kwargs)
    got = dict(zip(out.column("conv_id").to_pylist(),
                   out.column("text").to_pylist()))
    assert got == {"a": "old-row", "b": "new-b", "c": "new-c"}
    assert set(out.column("schema_ver").to_pylist()) == {2}


def test_retain_latest_refuses_null_keys():
    from rayrep.logcompact import retain_latest
    from rayrep.manifests import CompactedLogError

    tbl = pa.table({
        "conv_id": pa.array(["a", None], pa.string()),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "ts": pa.array([1, 2], pa.int64()),
        "seq": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(CompactedLogError, match="null conv_id/turn_idx"):
        retain_latest(tbl)
    # null turn_idx refused too
    tbl2 = pa.table({
        "conv_id": pa.array(["a", "a"], pa.string()),
        "turn_idx": pa.array([0, None], pa.int32()),
        "ts": pa.array([1, 2], pa.int64()),
        "seq": pa.array([1, 2], pa.int64()),
    })
    with pytest.raises(CompactedLogError, match="null conv_id/turn_idx"):
        retain_latest(tbl2)


def test_requeue_fenced_by_writer_lease(tmp_path):
    import pyarrow.parquet as pq

    from rayrep import lease as lease_mod
    from rayrep.sinks import requeue_dlq

    lake = str(tmp_path / "lake")
    cl = str(tmp_path / "cl")
    os.makedirs(os.path.join(lake, "dlq", "e00000"))
    os.makedirs(os.path.join(cl, "epoch-00000"))
    pq.write_table(_poison(), os.path.join(
        lake, "dlq", "e00000", "part-x.parquet"))
    held = lease_mod.acquire(lake, owner="live-writer", ttl_s=60)
    try:
        with pytest.raises(lease_mod.LeaseHeldError):
            requeue_dlq(lake, cl)
    finally:
        held.release()
