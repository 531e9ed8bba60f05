"""Incremental materialized view maintenance (rayrep/views.py): the view
must equal a full recompute after EVERY refresh, refresh only touched
partitions, survive crash-orphaned files, and refuse a respec."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.pipeline import replay
from rayrep.views import read_view, update_view

from .oracle import replay_oracle

SPEC = GenSpec(n_events=1500, n_conversations=50, n_epochs=4, zipf_a=1.1,
               delete_frac=0.15)


def _expected_view(cl_dir: str, up_to_epoch: int) -> pd.DataFrame:
    """Full recompute: LWW fold of epochs 0..up_to_epoch, then
    GROUP BY role: COUNT(*), SUM(turn_idx)."""
    files = []
    for e in range(up_to_epoch + 1):
        files += sorted(glob.glob(os.path.join(cl_dir, f"epoch-{e:05d}",
                                               "*.parquet")))
    cl = pa.concat_tables([pq.read_table(f) for f in files],
                          promote_options="permissive")
    df, _ = replay_oracle(cl)
    out = (df.groupby("role", dropna=False)
           .agg(n_rows=("role", "size"), sum_fp=("turn_idx", "sum"))
           .reset_index())
    out["sum_fp"] = out["sum_fp"].astype("int64")
    return out.sort_values("role").reset_index(drop=True)


def _got_view(view_dir: str) -> pd.DataFrame:
    t = read_view(view_dir, group_col="role").to_pandas()
    return t.sort_values("role").reset_index(drop=True)


def test_view_matches_recompute_after_every_refresh(tmp_path):
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=5,
                        delta_output=True))
    delta = os.path.join(lake, "delta")
    vdir = str(tmp_path / "view")

    for e in range(SPEC.n_epochs):
        update_view(delta, vdir, group_col="role", value_col="turn_idx",
                    scale=1, up_to_epoch=e)
        pd.testing.assert_frame_equal(_got_view(vdir), _expected_view(cl, e))

    # nothing new -> a refresh is a no-op (no partition read or written)
    assert update_view(delta, vdir, group_col="role", value_col="turn_idx",
                       scale=1)["partitions_refreshed"] == 0

    # respec refused: the view's definition is pinned like lake routing
    with pytest.raises(ValueError, match="pinned"):
        update_view(delta, vdir, group_col="text", value_col="turn_idx",
                    scale=1)
    with pytest.raises(ValueError, match="pinned"):
        update_view(delta, vdir, group_col="role", value_col="turn_idx",
                    scale=100)


def test_view_crash_orphans_are_redone_exactly(tmp_path):
    """Simulated crash between file writes and the manifest: orphaned
    sidecar/partial files for an uncommitted epoch must be overwritten by
    the redo, and the final view must still equal the recompute."""
    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=5,
                        delta_output=True))
    delta = os.path.join(lake, "delta")
    vdir = str(tmp_path / "view")
    update_view(delta, vdir, group_col="role", value_col="turn_idx",
                scale=1, up_to_epoch=1)

    # fake a crashed refresh: files for epoch 3 exist, manifest still at 1
    pdir = os.path.join(vdir, "p00000")
    garbage = pa.table({"conv_id": pa.array(["zzz"]),
                        "turn_idx": pa.array([np.int64(0)]),
                        "__group": pa.array(["bogus"]),
                        "__val_fp": pa.array([np.int64(10**9)]),
                        "__ts": pa.array([np.int64(0)]),
                        "__seq": pa.array([np.int64(0)]),
                        "__live": pa.array([True])})
    pq.write_table(garbage, os.path.join(pdir, "sidecar_e00003.parquet"))
    pq.write_table(
        pa.table({"__group": pa.array(["bogus"]),
                  "n_rows": pa.array([np.int64(1)]),
                  "sum_fp": pa.array([np.int64(10**9)])}),
        os.path.join(pdir, "partial_e00003.parquet"))

    update_view(delta, vdir, group_col="role", value_col="turn_idx", scale=1)
    got = _got_view(vdir)
    pd.testing.assert_frame_equal(got, _expected_view(cl, SPEC.n_epochs - 1))
    assert "bogus" not in set(got["role"])
    # exactly one (sidecar, partial) generation remains per partition
    for pd_ in glob.glob(os.path.join(vdir, "p*")):
        assert len(glob.glob(os.path.join(pd_, "sidecar_e*.parquet"))) == 1
        assert len(glob.glob(os.path.join(pd_, "partial_e*.parquet"))) == 1


def _write_delta_file(delta_dir: str, pid: int, epoch: int, rows: dict):
    pdir = os.path.join(delta_dir, f"p{pid:05d}")
    os.makedirs(pdir, exist_ok=True)
    n = len(rows["conv_id"])
    t = pa.table({
        "conv_id": pa.array(rows["conv_id"], pa.string()),
        "turn_idx": pa.array(rows["turn_idx"], pa.int32()),
        "ts": pa.array(rows["ts"], pa.timestamp("us")),
        "seq": pa.array(rows["seq"], pa.int64()),
        "op": pa.array(rows["op"], pa.string()),
        "grp": pa.array(rows["grp"], pa.string()),
        "val": pa.array(rows.get("val", [1.0] * n), pa.float64()),
    })
    pq.write_table(t, os.path.join(pdir, f"e{epoch:05d}.parquet"))


def test_view_retractions_group_move_delete_resurrect(tmp_path):
    """Hand-crafted stream: update moves a key between groups (subtract
    old group, add new), delete retracts, resurrection re-adds — and a
    partition with no new epochs is never refreshed."""
    delta = str(tmp_path / "delta")
    vdir = str(tmp_path / "view")
    # epoch 0: k1 -> A(1.5), k2 -> A(2.25); p1: k9 -> C(10.0)
    _write_delta_file(delta, 0, 0, {
        "conv_id": ["k1", "k2"], "turn_idx": [0, 0],
        "ts": [1_000_000, 1_000_000], "seq": [1, 2], "op": ["I", "I"],
        "grp": ["A", "A"], "val": [1.5, 2.25]})
    _write_delta_file(delta, 1, 0, {
        "conv_id": ["k9"], "turn_idx": [0], "ts": [1_000_000], "seq": [3],
        "op": ["I"], "grp": ["C"], "val": [10.0]})
    r = update_view(delta, vdir, group_col="grp", value_col="val")
    assert r["partitions_refreshed"] == 2
    v = read_view(vdir, "grp").to_pandas().set_index("grp")
    assert v.loc["A", "n_rows"] == 2 and v.loc["A", "sum_fp"] == 37500
    assert v.loc["C", "sum_fp"] == 100000

    # epoch 1 (p0 only): k1 moves A -> B with a new value; k2 deleted
    _write_delta_file(delta, 0, 1, {
        "conv_id": ["k1", "k2"], "turn_idx": [0, 0],
        "ts": [2_000_000, 2_000_000], "seq": [4, 5], "op": ["U", "D"],
        "grp": ["B", None], "val": [4.0, None]})
    r = update_view(delta, vdir, group_col="grp", value_col="val")
    assert r["partitions_refreshed"] == 1  # p1 untouched: no new epochs
    v = read_view(vdir, "grp").to_pandas().set_index("grp")
    assert "A" not in v.index          # fully retracted group vanishes
    assert v.loc["B", "n_rows"] == 1 and v.loc["B", "sum_fp"] == 40000
    assert v.loc["C", "n_rows"] == 1   # untouched partition still counted

    # epoch 2: k2 resurrected into B
    _write_delta_file(delta, 0, 2, {
        "conv_id": ["k2"], "turn_idx": [0], "ts": [3_000_000], "seq": [6],
        "op": ["U"], "grp": ["B"], "val": [0.5]})
    update_view(delta, vdir, group_col="grp", value_col="val")
    v = read_view(vdir, "grp").to_pandas().set_index("grp")
    assert v.loc["B", "n_rows"] == 2 and v.loc["B", "sum_fp"] == 45000
