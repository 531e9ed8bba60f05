"""Bulk load (rayrep/bulkload.py): direct state-file ingestion of a base
table must be indistinguishable from bootstrap_snapshot + replay — same
final table, same resume behavior on a tail changelog — while never
writing the snapshot through the changelog. Reference anchor: the
binlog-flusher's snapshot was the pipeline's bottleneck until
parallelized (CHANGES.txt:97-98); HBase's native answer is bulkload."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rayrep.bulkload import BulkLoadError, bulk_load
from rayrep.config import EngineConfig
from rayrep.pipeline import final_table_pandas, replay
from rayrep.schema import CHANGELOG_SCHEMA

from .test_replay import assert_frames_equal
from .test_scenarios import ev


def _base(n_conv=17, turns=3):
    rows = []
    for c in range(n_conv):
        for t in range(turns):
            rows.append(
                {
                    "conv_id": f"c{c:03d}",
                    "turn_idx": np.int32(t),
                    "role": "user" if t % 2 == 0 else "assistant",
                    "text": f"text-{c}-{t}",
                    "ts": pd.Timestamp(2026, 1, 1) + pd.Timedelta(seconds=c * 10 + t),
                }
            )
    return pd.DataFrame(rows).astype({"turn_idx": "int32"})


def _tail_epoch(path, epoch, rows):
    tbl = pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)
    pq.write_table(tbl, os.path.join(path, f"epoch-{epoch:05d}.parquet"))


def test_bulk_load_equals_bootstrap_replay(tmp_path):
    """The headline contract: bulk_load(base) + tail replay produces the
    BIT-identical final table to bootstrap_snapshot(base) + full replay."""
    from rayrep.bootstrap import bootstrap_snapshot

    base = _base()
    # --- path A: bootstrap through the changelog -------------------------
    cl_a, lake_a = str(tmp_path / "cl_a"), str(tmp_path / "lake_a")
    os.makedirs(cl_a)
    man = bootstrap_snapshot(rd.from_pandas(base), cl_a, epoch=0)
    off = man["next_seq"]
    tail = [
        ev(off + 0, "U", "c001", 0, "updated-1-0", ts=10_000_000),
        ev(off + 1, "D", "c002", 1, ts=10_000_001),
        ev(off + 2, "I", "c900", 0, "brand-new", ts=10_000_002),
        ev(off + 3, "U", "c900", 0, "brand-new-2", ts=10_000_003),
    ]
    _tail_epoch(cl_a, 1, tail)
    cfg_a = EngineConfig(changelog_dir=cl_a, lake_dir=lake_a,
                         num_partitions=8, applier_concurrency=2)
    replay(cfg_a)

    # --- path B: bulk load + the same tail -------------------------------
    cl_b, lake_b = str(tmp_path / "cl_b"), str(tmp_path / "lake_b")
    os.makedirs(cl_b)
    cfg_b = EngineConfig(changelog_dir=cl_b, lake_dir=lake_b,
                         num_partitions=8, applier_concurrency=2)
    res = bulk_load(cfg_b, rd.from_pandas(base))
    assert res["rows"] == len(base) and res["conflict"] == 0
    assert res["next_seq"] >= len(base)
    # tail seqs must clear bulk_load's allocator too (same contract)
    off_b = res["next_seq"]
    tail_b = [dict(r) for r in tail]
    for i, r in enumerate(tail_b):
        r["seq"] = off_b + i
    _tail_epoch(cl_b, 1, tail_b)
    r2 = replay(cfg_b)
    assert [e["epoch"] for e in r2["epochs"]] == [1]

    assert_frames_equal(final_table_pandas(lake_a), final_table_pandas(lake_b))
    # nothing snapshot-sized in B's changelog: only the tail epoch exists
    assert sorted(p for p in os.listdir(cl_b) if p.startswith("epoch-")) == [
        "epoch-00001.parquet"
    ]


def test_bulk_load_duplicate_keys_lww_and_conflict_count(tmp_path):
    """In-base key duplicates resolve by the SAME rule as replay
    (argmax (ts, seq) per key) and are counted as `conflict`."""
    base = pd.DataFrame(
        {
            "conv_id": ["a", "a", "b"],
            "turn_idx": np.array([0, 0, 0], dtype="int32"),
            "role": ["user", "user", "user"],
            "text": ["old", "new", "only"],
            "ts": pd.to_datetime([100, 200, 100], unit="s"),
        }
    )
    cfg = EngineConfig(changelog_dir=str(tmp_path / "cl"),
                       lake_dir=str(tmp_path / "lake"), num_partitions=4)
    res = bulk_load(cfg, rd.from_pandas(base))
    assert res == {**res, "rows": 3, "applied": 2, "conflict": 1}
    got = final_table_pandas(cfg.lake_dir).set_index("conv_id")
    assert got.loc["a", "text"] == "new" and got.loc["b", "text"] == "only"


def test_bulk_load_refuses_non_fresh_lake_and_bad_semantics(tmp_path):
    base = _base(n_conv=3)
    cfg = EngineConfig(changelog_dir=str(tmp_path / "cl"),
                       lake_dir=str(tmp_path / "lake"), num_partitions=4)
    bulk_load(cfg, rd.from_pandas(base))
    with pytest.raises(BulkLoadError, match="fresh"):
        bulk_load(cfg, rd.from_pandas(base))
    cfg2 = EngineConfig(changelog_dir=str(tmp_path / "cl2"),
                        lake_dir=str(tmp_path / "lake2"), num_partitions=4,
                        changed_cells_updates=True)
    with pytest.raises(BulkLoadError, match="changed-cells"):
        bulk_load(cfg2, rd.from_pandas(base))


def test_bulk_load_partial_crash_rerun_is_idempotent(tmp_path):
    """Crash between the partition commits and the barrier: some manifests
    exist, epoch.json doesn't. A re-run with the same base must skip the
    committed partitions and converge to the same table."""
    base = _base(n_conv=11)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=str(tmp_path / "cl"), lake_dir=lake,
                       num_partitions=8, applier_concurrency=2)
    bulk_load(cfg, rd.from_pandas(base))
    want = final_table_pandas(lake)
    # simulate the crash window: barrier lost, one partition manifest lost
    os.remove(os.path.join(lake, "_manifests", "epoch.json"))
    lost = sorted(
        p for p in os.listdir(os.path.join(lake, "_manifests"))
        if p.startswith("p")
    )[0]
    os.remove(os.path.join(lake, "_manifests", lost))
    res = bulk_load(cfg, rd.from_pandas(base))
    assert res["rows"] == len(base)
    assert_frames_equal(final_table_pandas(lake), want)


def test_bulk_load_salted_routing_parity(tmp_path):
    """salt_turn_keys routes through partition_ids_salted; the final table
    is routing-invariant and the pin is recorded in LakeMeta."""
    from rayrep.manifests import LakeMeta

    base = _base(n_conv=9)
    plain = EngineConfig(changelog_dir=str(tmp_path / "cl1"),
                         lake_dir=str(tmp_path / "l1"), num_partitions=8)
    salted = EngineConfig(changelog_dir=str(tmp_path / "cl2"),
                          lake_dir=str(tmp_path / "l2"), num_partitions=8,
                          salt_turn_keys=True)
    bulk_load(plain, rd.from_pandas(base))
    bulk_load(salted, rd.from_pandas(base))
    assert_frames_equal(final_table_pandas(plain.lake_dir),
                        final_table_pandas(salted.lake_dir))
    assert LakeMeta.load(salted.lake_dir).salt_turn_keys is True
    # a resume with the other salting must be refused by the pin
    os.makedirs(salted.changelog_dir, exist_ok=True)
    _tail_epoch(salted.changelog_dir, 1,
                [ev(10_000, "U", "c001", 0, "x", ts=999)])
    import dataclasses

    with pytest.raises(ValueError, match="salt_turn_keys"):
        replay(dataclasses.replace(salted, salt_turn_keys=False))


def test_bulk_load_state_is_key_sorted_and_stamped(tmp_path):
    """Bulk-loaded state files follow the compacted-lake conventions:
    key-sorted rows (row-group pruning for point lookups) and a schema
    version stamp (version-exact chain conformance later)."""
    from rayrep.schema import stamped_version

    base = _base(n_conv=13)
    cfg = EngineConfig(changelog_dir=str(tmp_path / "cl"),
                       lake_dir=str(tmp_path / "lake"), num_partitions=4)
    bulk_load(cfg, rd.from_pandas(base))
    import glob

    files = glob.glob(os.path.join(cfg.lake_dir, "part-*", "state-*.parquet"))
    assert files
    for f in files:
        t = pq.read_table(f)
        assert stamped_version(t) == 1
        df = t.select(["conv_id", "turn_idx"]).to_pandas()
        assert df.equals(df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
