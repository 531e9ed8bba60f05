"""Secondary index (rayrep/secindex.py): value → (conv_id, turn_idx),
maintained incrementally from the delta stream with before-image
sidecars for retractions, hash-partitioned by VALUE, exactly-once across
its two-stage refresh via a single global commit marker.
"""

import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.hashing import stable_hash_strings
from rayrep.pipeline import final_table, replay
from rayrep.secindex import (
    IndexSpecError,
    index_lookup,
    read_index,
    update_index,
)

SPEC = GenSpec(seed=77, n_conversations=60, max_turns=5, n_events=1500,
               n_epochs=4, delete_frac=0.15, zipf_a=1.1)


@pytest.fixture()
def lake_with_deltas(tmp_path):
    cl = str(tmp_path / "cl")
    lake = str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, delta_output=True)
    return cfg, lake


def _truth(lake, column="role"):
    ft = final_table(lake).to_pandas()
    t = ft[ft[column].notna()][[column, "conv_id", "turn_idx"]]
    t = t.rename(columns={column: "value"})
    return (t.sort_values(["value", "conv_id", "turn_idx"])
            .reset_index(drop=True).astype(str))


def _index_df(idx):
    t = read_index(idx).to_pandas()
    return (t.sort_values(["value", "conv_id", "turn_idx"])
            .reset_index(drop=True).astype(str))


def test_incremental_equals_rebuild_equals_lake(lake_with_deltas, tmp_path):
    """Two incremental refreshes (retractions from updates/deletes cross
    the boundary) == one full rebuild == the lake's live rows projected
    to (value, key)."""
    cfg, lake = lake_with_deltas
    replay(cfg)
    delta = os.path.join(lake, "delta")
    idx = str(tmp_path / "idx")
    r1 = update_index(delta, idx, column="role", num_index_partitions=8,
                      up_to_epoch=1, lake_dir=lake)
    r2 = update_index(delta, idx, column="role", num_index_partitions=8,
                      lake_dir=lake)
    assert r1["epoch"] == 1 and r2["epoch"] == 3
    idx2 = str(tmp_path / "idx2")
    update_index(delta, idx2, column="role", num_index_partitions=8)
    truth = _truth(lake)
    pd.testing.assert_frame_equal(_index_df(idx), truth)
    pd.testing.assert_frame_equal(_index_df(idx2), truth)


def test_retraction_delete_and_resurrect(tmp_path):
    """Hand-built delta stream: v1 asserted, changed to v2 (v1 retracts),
    deleted (v2 retracts), re-inserted as v3 — each refresh boundary
    crossing one transition."""
    delta = str(tmp_path / "delta")
    pdir = os.path.join(delta, "p00000")
    os.makedirs(pdir)

    def write_epoch(e, rows):
        t = pa.table({
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "seq": pa.array([r[3] for r in rows], pa.int64()),
            "op": pa.array([r[4] for r in rows]),
            "role": pa.array([r[5] for r in rows]),
        })
        pq.write_table(t, os.path.join(pdir, f"e{e:05d}.parquet"))

    idx = str(tmp_path / "idx")
    write_epoch(0, [("c1", 0, 1_000, 1, "I", "v1")])
    update_index(delta, idx, column="role", num_index_partitions=4)
    assert _index_df(idx).values.tolist() == [["v1", "c1", "0"]]

    write_epoch(1, [("c1", 0, 2_000, 2, "U", "v2")])
    update_index(delta, idx, column="role", num_index_partitions=4)
    assert _index_df(idx).values.tolist() == [["v2", "c1", "0"]]

    write_epoch(2, [("c1", 0, 3_000, 3, "D", None)])
    update_index(delta, idx, column="role", num_index_partitions=4)
    assert _index_df(idx).values.tolist() == []

    write_epoch(3, [("c1", 0, 4_000, 4, "I", "v3")])
    update_index(delta, idx, column="role", num_index_partitions=4)
    assert _index_df(idx).values.tolist() == [["v3", "c1", "0"]]


def test_null_values_not_indexed(tmp_path):
    delta = str(tmp_path / "delta")
    pdir = os.path.join(delta, "p00000")
    os.makedirs(pdir)
    t = pa.table({
        "conv_id": pa.array(["a", "b"]),
        "turn_idx": pa.array([0, 0], pa.int32()),
        "ts": pa.array([1, 2], pa.timestamp("us")),
        "seq": pa.array([1, 2], pa.int64()),
        "op": pa.array(["I", "I"]),
        "role": pa.array(["x", None]),
    })
    pq.write_table(t, os.path.join(pdir, "e00000.parquet"))
    idx = str(tmp_path / "idx")
    update_index(delta, idx, column="role", num_index_partitions=4)
    assert _index_df(idx).values.tolist() == [["x", "a", "0"]]


def test_probe_reads_only_its_q_partition(lake_with_deltas, tmp_path):
    """Deleting every OTHER q state file leaves a single-value probe
    intact — the probe's plan is exactly hash(value) % Q."""
    cfg, lake = lake_with_deltas
    replay(cfg)
    idx = str(tmp_path / "idx")
    update_index(os.path.join(lake, "delta"), idx, column="role",
                 num_index_partitions=8)
    want = index_lookup(idx, ["user"]).to_pandas()
    assert len(want) > 0
    qid = int(stable_hash_strings(np.array(["user"], dtype=object))[0]
              % np.uint64(8))
    for f in glob.glob(os.path.join(idx, "q*", "state_e*.parquet")):
        if f"q{qid:05d}" not in f:
            os.remove(f)
    got = index_lookup(idx, ["user"]).to_pandas()
    pd.testing.assert_frame_equal(got, want)


def test_crash_redo_identical(lake_with_deltas, tmp_path):
    """Crash window: target-epoch files staged but the global commit not
    written. The redo recomputes identical state and commits; the result
    equals an uninterrupted refresh."""
    cfg, lake = lake_with_deltas
    replay(cfg)
    delta = os.path.join(lake, "delta")
    idx = str(tmp_path / "idx")
    update_index(delta, idx, column="role", num_index_partitions=8,
                 up_to_epoch=1)
    # clean path on a copy
    idx_clean = str(tmp_path / "idx_clean")
    shutil.copytree(idx, idx_clean)
    update_index(delta, idx_clean, column="role", num_index_partitions=8)
    # crashed path: stage SOME of the target epoch's files, no commit
    idx_crash = str(tmp_path / "idx_crash")
    shutil.copytree(idx, idx_crash)
    staged = sorted(glob.glob(os.path.join(
        idx_clean, "q*", "state_e00003.parquet")))[:2]
    for src in staged:
        qdir = os.path.join(idx_crash, os.path.basename(os.path.dirname(src)))
        os.makedirs(qdir, exist_ok=True)
        shutil.copy2(src, os.path.join(qdir, "state_e00003.parquet"))
    with open(os.path.join(idx_crash, "_COMMITTED.json")) as f:
        assert json.load(f)["epoch"] == 1  # still at the old commit
    update_index(delta, idx_crash, column="role", num_index_partitions=8)
    pd.testing.assert_frame_equal(_index_df(idx_crash), _index_df(idx_clean))


def test_spec_pin_refused(lake_with_deltas, tmp_path):
    cfg, lake = lake_with_deltas
    replay(cfg, end_epoch=0)
    idx = str(tmp_path / "idx")
    delta = os.path.join(lake, "delta")
    update_index(delta, idx, column="role", num_index_partitions=8)
    with pytest.raises(IndexSpecError, match="column"):
        update_index(delta, idx, column="text", num_index_partitions=8)
    with pytest.raises(IndexSpecError, match="Q="):
        update_index(delta, idx, column="role", num_index_partitions=4)


def test_changed_cells_lake_refused(tmp_path):
    cl = str(tmp_path / "cl")
    lake = str(tmp_path / "lake")
    write_changelog(cl, GenSpec(seed=78, n_conversations=20, n_events=300,
                                n_epochs=2, changed_cells_frac=0.5))
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       delta_output=True, changed_cells_updates=True,
                       per_cell_conflicts=True)
    replay(cfg)
    with pytest.raises(IndexSpecError, match="row-image"):
        update_index(os.path.join(lake, "delta"), str(tmp_path / "idx"),
                     column="role", lake_dir=lake)


def test_cli_index_roundtrip(lake_with_deltas, tmp_path, capsys):
    from rayrep.cli import main

    cfg, lake = lake_with_deltas
    replay(cfg)
    idx = str(tmp_path / "idx")
    rc = main(["index-update", os.path.join(lake, "delta"), idx,
               "--column", "role", "--partitions", "8", "--num-cpus", "4"])
    assert rc == 0
    rc = main(["index-get", idx, "--value", "user"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    truth = _truth(lake)
    assert out["entries"] == int((truth["value"] == "user").sum())


def test_rebuild_from_lake_and_incremental_continuation(tmp_path):
    """Index bootstrap by full lake scan — the bulk-loaded-lake path
    (state written directly, NO delta history): rebuild at the barrier,
    then tail more epochs and refresh INCREMENTALLY — the merged index
    must equal a from-deltas-only index of the whole history."""
    cl = str(tmp_path / "cl")
    lake = str(tmp_path / "lake")
    write_changelog(cl, SPEC)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, delta_output=True)
    replay(cfg, end_epoch=1)
    from rayrep.secindex import rebuild_index

    idx = str(tmp_path / "idx")
    r = rebuild_index(lake, idx, column="role", num_index_partitions=8)
    assert r["epoch"] == 1 and r["entries"] > 0
    # bootstrap == incremental at the same barrier
    idx_d = str(tmp_path / "idx_d")
    update_index(os.path.join(lake, "delta"), idx_d, column="role",
                 num_index_partitions=8, up_to_epoch=1)
    pd.testing.assert_frame_equal(_index_df(idx), _index_df(idx_d))
    # continue: apply the rest, refresh BOTH paths, still equal + truthful
    replay(cfg)
    update_index(os.path.join(lake, "delta"), idx, column="role",
                 num_index_partitions=8)
    update_index(os.path.join(lake, "delta"), idx_d, column="role",
                 num_index_partitions=8)
    truth = _truth(lake)
    pd.testing.assert_frame_equal(_index_df(idx), truth)
    pd.testing.assert_frame_equal(_index_df(idx_d), truth)


def test_rebuild_from_bulk_loaded_lake(tmp_path):
    """The motivating case: a bulk-loaded lake emitted no deltas at all —
    rebuild scans its state directly and serves probes."""
    import pyarrow.parquet as _pq

    from rayrep.bulkload import bulk_load
    from rayrep.secindex import rebuild_index

    base = pa.table({
        "conv_id": pa.array([f"c{i:03d}" for i in range(60)]),
        "turn_idx": pa.array([0] * 60, pa.int32()),
        "role": pa.array(["user" if i % 3 else "assistant"
                          for i in range(60)]),
        "text": pa.array([f"t{i}" for i in range(60)]),
        "tool": pa.nulls(60, pa.string()),
        "ts": pa.array([1_000_000 + i for i in range(60)],
                       pa.timestamp("us")),
    })
    import ray.data as rd

    from rayrep.schema import SchemaVersion

    lake = str(tmp_path / "lake")
    payload = SchemaVersion(1, pa.schema(
        [f for f in base.schema])).to_json()
    cfg = EngineConfig(changelog_dir=str(tmp_path / "nolog"), lake_dir=lake,
                       num_partitions=4, initial_schema_json=payload)
    bulk_load(cfg, rd.from_arrow(base))
    idx = str(tmp_path / "idx")
    r = rebuild_index(lake, idx, column="role", num_index_partitions=8)
    assert r["entries"] == 60
    got = index_lookup(idx, ["assistant"]).to_pandas()
    assert sorted(got["conv_id"]) == sorted(
        c for i, c in enumerate(base.column("conv_id").to_pylist())
        if i % 3 == 0)


def test_erasure_respected_and_purgeable(lake_with_deltas, tmp_path):
    """GDPR composition: the erasure list anti-filters index reads AT
    ONCE (lake_dir param), and purge_index makes it physical — no state
    or sidecar file carries the key afterwards; the index keeps
    refreshing normally."""
    from rayrep.retention import erase_keys
    from rayrep.secindex import purge_index

    cfg, lake = lake_with_deltas
    replay(cfg)
    idx = str(tmp_path / "idx")
    delta = os.path.join(lake, "delta")
    update_index(delta, idx, column="role", num_index_partitions=8)
    full = read_index(idx).to_pandas()
    victim = full["conv_id"].iloc[0]
    erase_keys(lake, [victim])
    # read-side: hidden at once when the lake is named
    assert victim in set(read_index(idx)["conv_id"].to_pylist())
    assert victim not in set(read_index(idx, lake_dir=lake)
                             ["conv_id"].to_pylist())
    got = index_lookup(idx, ["user"], lake_dir=lake).to_pandas()
    assert victim not in set(got["conv_id"])
    # physical: no file carries the key after purge
    res = purge_index(idx, lake)
    assert res["dropped"] >= 1
    for f in glob.glob(os.path.join(idx, "*", "*.parquet")):
        t = pq.read_table(f)
        if "conv_id" in t.column_names:
            assert victim not in set(t["conv_id"].to_pylist()), f
    # purge is idempotent and the index still refreshes
    assert purge_index(idx, lake)["dropped"] == 0
    update_index(delta, idx, column="role", num_index_partitions=8)
