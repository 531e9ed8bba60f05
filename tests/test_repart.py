"""Lake repartitioning (rayrep/repart.py): rescale between replays.

Contracts under test: the folded image is invariant under repartition
(any P -> any P'), a continued replay into the rescaled lake converges
identically to a fresh full replay at P', pins move with the lake
(salted routing, changed-cells, dedup-ingest + re-bucketed claim index),
and the destination refuses to double-commit."""

import os

import pandas as pd
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.ingest_dedup import cumulative_deduped
from rayrep.pipeline import final_table_pandas, replay
from rayrep.repart import repartition_lake

from .test_ingest_dedup import _epoch


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (df.sort_values(["conv_id", "turn_idx"])
              .reset_index(drop=True)[sorted(df.columns)])


@pytest.fixture(scope="module")
def changelog(tmp_path_factory):
    cl = str(tmp_path_factory.mktemp("cl"))
    write_changelog(cl, GenSpec(n_events=1200, n_conversations=60,
                                n_epochs=4, zipf_a=1.1))
    return cl


def test_repartition_preserves_final_table(changelog, tmp_path):
    src = str(tmp_path / "src")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=5, delta_output=False))
    want = _sorted(final_table_pandas(src))
    for new_p in (3, 8, 1):
        dst = str(tmp_path / f"dst{new_p}")
        res = repartition_lake(src, dst, new_p)
        assert res["partitions"] == new_p
        got = _sorted(final_table_pandas(dst))
        pd.testing.assert_frame_equal(got, want)
        assert res["rows"] == len(want)


def test_continued_replay_matches_fresh(changelog, tmp_path):
    src = str(tmp_path / "src")
    cfg5 = EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=5, delta_output=False)
    replay(cfg5, end_epoch=1)                      # commit epochs 0,1 at P=5
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 3)
    res = replay(EngineConfig(changelog_dir=changelog, lake_dir=dst,
                              num_partitions=3, delta_output=False))
    assert [e["epoch"] for e in res["epochs"]] == [2, 3]   # watermark held
    fresh = str(tmp_path / "fresh")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=fresh,
                        num_partitions=3, delta_output=False))
    pd.testing.assert_frame_equal(_sorted(final_table_pandas(dst)),
                                  _sorted(final_table_pandas(fresh)))


def test_counters_survive_repartition(changelog, tmp_path):
    """Lifetime counters are monotone across a rescale: repartition zeroes
    the per-partition counters but moves the totals into
    LakeMeta.counters_baseline, so a continued replay's committed totals
    equal a fresh full replay's (T5 metrics continuity)."""
    src = str(tmp_path / "src")
    cfg5 = EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=5, delta_output=False)
    replay(cfg5, end_epoch=1)
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 3)
    cont = replay(EngineConfig(changelog_dir=changelog, lake_dir=dst,
                               num_partitions=3, delta_output=False))
    fresh = replay(EngineConfig(changelog_dir=changelog,
                                lake_dir=str(tmp_path / "fresh"),
                                num_partitions=3, delta_output=False))
    assert cont["totals"] == fresh["totals"]
    # chained rescale: baseline folds forward exactly
    dst2 = str(tmp_path / "dst2")
    repartition_lake(dst, dst2, 2)
    from rayrep.pipeline import aggregate_partition_counters
    assert aggregate_partition_counters(dst2) == fresh["totals"]


def test_pin_checks_and_refusals(changelog, tmp_path):
    src = str(tmp_path / "src")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=4, delta_output=False))
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 6)
    # resuming dst with the OLD count hits the LakeMeta pin
    with pytest.raises(ValueError, match="num_partitions"):
        replay(EngineConfig(changelog_dir=changelog, lake_dir=dst,
                            num_partitions=4, delta_output=False))
    # a committed lake is never an overwrite target
    with pytest.raises(ValueError, match="refusing to overwrite"):
        repartition_lake(src, dst, 6)
    # a non-lake source is rejected up front
    with pytest.raises(ValueError, match="LakeMeta"):
        repartition_lake(str(tmp_path / "nope"), str(tmp_path / "d2"), 2)


def test_salted_lake_repartitions_with_salted_routing(changelog, tmp_path):
    src = str(tmp_path / "src")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=4, delta_output=False,
                        salt_turn_keys=True))
    want = _sorted(final_table_pandas(src))
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 7)
    pd.testing.assert_frame_equal(_sorted(final_table_pandas(dst)), want)
    # continued salted replay still passes the pin and converges
    res = replay(EngineConfig(changelog_dir=changelog, lake_dir=dst,
                              num_partitions=7, delta_output=False,
                              salt_turn_keys=True))
    assert res["epochs"] == []  # all epochs were committed already


def test_changed_cells_lake_repartitions(changelog, tmp_path):
    src = str(tmp_path / "src")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=4, delta_output=False,
                        changed_cells_updates=True))
    want = _sorted(final_table_pandas(src))
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 3)
    pd.testing.assert_frame_equal(_sorted(final_table_pandas(dst)), want)


def test_dedup_index_rebuckets_and_still_bites(tmp_path):
    cl = str(tmp_path / "cl")
    _epoch(os.path.join(cl, "epoch-00000.parquet"), [
        (0, "I", "A", 0, "dup"), (1, "I", "B", 0, "dup"),
        (2, "I", "C", 0, "solo"),
    ])
    src = str(tmp_path / "src")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=src, num_partitions=4,
                       dedup_ingest=True, delta_output=False)
    replay(cfg)
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 3)
    assert cumulative_deduped(dst) == cumulative_deduped(src) == 1
    # a later epoch re-posting claimed content dedups against the
    # RE-BUCKETED index (ckey % 3 routing)
    _epoch(os.path.join(cl, "epoch-00001.parquet"),
           [(10, "I", "Z", 0, "dup"), (11, "I", "Y", 0, "solo"),
            (12, "I", "X", 0, "new")])
    res = replay(EngineConfig(changelog_dir=cl, lake_dir=dst,
                              num_partitions=3, dedup_ingest=True,
                              delta_output=False))
    assert res["epochs"][-1]["deduped"] == 2  # Z and Y both dropped
    df = final_table_pandas(dst)
    assert sorted(df["conv_id"]) == ["A", "C", "X"]


def test_repartition_crash_resume(changelog, tmp_path):
    """A repartition that crashed after SOME shards wrote but before the
    manifests/LakeMeta published must be re-runnable into the same dst
    and converge identically — deterministic shard names + tmp/rename +
    manifest-last publication."""
    from rayrep.repart import _repart_one
    from rayrep.manifests import LakeMeta
    from rayrep.registry import SchemaRegistry

    src = str(tmp_path / "src")
    replay(EngineConfig(changelog_dir=changelog, lake_dir=src,
                        num_partitions=5, delta_output=False))
    want = _sorted(final_table_pandas(src))
    dst = str(tmp_path / "dst")
    # simulate the crash: two source partitions' shards land, nothing
    # publishes (no manifests, no LakeMeta)
    lm = LakeMeta.load(src)
    tj = SchemaRegistry(persist_dir=src).current_json()
    for p in (0, 1):
        _repart_one(src, dst, p, 3, tj, lm)
    assert LakeMeta.load(dst) is None          # not a committed lake yet
    res = repartition_lake(src, dst, 3)        # full re-run over leftovers
    assert res["partitions"] == 3
    pd.testing.assert_frame_equal(_sorted(final_table_pandas(dst)), want)


def test_repartition_preserves_per_cell_versions(tmp_path):
    """Repartition REWRITES per-cell state, so it must keep each cell's
    winning row with its ORIGINAL (ts, seq) — a post-repartition write
    landing between a cell's true version and the key's newest row
    version must still win, and a pre-repartition delete must still mask
    an older post-repartition write (same prune_cells contract as
    compaction; the lossy one-row fold broke both)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rayrep.gen import T0_US
    from rayrep.schema import CHANGELOG_SCHEMA

    def ev(seq, op, conv, text, ts, role):
        return {"seq": seq, "txn_id": 0, "op": op, "schema_ver": 1,
                "conv_id": conv, "turn_idx": 0,
                "role": None if op == "D" else role,
                "text": None if op == "D" else text, "tool": None,
                "ts": T0_US + ts, "ddl": None}

    cl = str(tmp_path / "cl")
    os.makedirs(cl)
    # epoch 0: full insert (text+role @100); newer text only (@200);
    # plus key "b" inserted then deleted @300
    e0 = [ev(0, "I", "a", "t100", 100, "r100"),
          {**ev(1, "U", "a", "t200", 200, None), "role": None},
          ev(2, "I", "b", "b0", 100, "u"),
          ev(3, "D", "b", None, 300, None)]
    # epoch 1 (post-repartition): role @150 — between role's true version
    # (100) and the key's newest row version (200) → must win per-cell;
    # b's write @250 is older than the delete @300 → stays masked
    e1 = [{**ev(4, "U", "a", None, 150, "r150"), "text": None},
          ev(5, "U", "b", "b250", 250, "u")]
    for e, rows in enumerate([e0, e1]):
        pq.write_table(pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA),
                       os.path.join(cl, f"epoch-{e:05d}.parquet"))
    src = str(tmp_path / "src")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=src, num_partitions=4,
                       changed_cells_updates=True, per_cell_conflicts=True,
                       delta_output=False)
    replay(cfg, end_epoch=0)
    dst = str(tmp_path / "dst")
    repartition_lake(src, dst, 2)
    import dataclasses
    replay(dataclasses.replace(cfg, lake_dir=dst, num_partitions=2))
    got = final_table_pandas(dst).set_index("conv_id")
    assert got.loc["a", "text"] == "t200"
    assert got.loc["a", "role"] == "r150"
    assert "b" not in got.index
    # and the whole table equals an uninterrupted single-lake replay
    fresh = str(tmp_path / "fresh")
    replay(dataclasses.replace(cfg, lake_dir=fresh))
    pd.testing.assert_frame_equal(_sorted(final_table_pandas(dst)),
                                  _sorted(final_table_pandas(fresh)))
