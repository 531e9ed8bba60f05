"""Coverage for the remaining SURVEY §2 surfaces: delta side-output
content (S7), pluggable sinks (S5/S6), table-filter hook (M7), lake GC,
distributed label propagation, YAML config loader (§2.10)."""

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rayrep.compact import gc_lake
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, write_changelog
from rayrep.pipeline import final_table_pandas, replay

from .test_scenarios import ev, run, write_epochs


def test_delta_side_output_contents(tmp_path):
    """S7 (per-event path): the delta holds the NET applied image per
    (key, utc-day) — the same contract as the combined path, so resume
    fallbacks never mix granularities. Conflict losers and superseded
    same-day versions are excluded; UTC yyyymmdd stamped
    (CHANGES.txt:123,55 analog)."""
    day2 = 86_400_000_000
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "I", "a", 0, "x", ts=0),
            ev(1, "U", "a", 0, "y", ts=5_000_000),        # same-day net winner
            ev(2, "I", "b", 0, "w", ts=0),
            ev(3, "U", "b", 0, "loser", ts=-5_000_000),   # conflict (older ts)
            ev(4, "D", "a", 0, ts=day2)]                  # day-2 tombstone
    write_epochs(d, rows)
    _, res = run(d, lake, map_combine=False)
    assert res["totals"]["conflict"] == 1
    files = glob.glob(os.path.join(lake, "delta", "p*", "e*.parquet"))
    assert files
    delta = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
        .sort_values(["change_date", "conv_id"])
    # net images: (a, day1)=y, (b, day1)=w, (a, day2)=D; x and the loser excluded
    assert list(delta["change_date"]) == ["20231114", "20231114", "20231115"]
    assert list(delta["op"]) == ["U", "I", "D"]
    assert list(delta["text"])[:2] == ["y", "w"]


def test_orphan_delta_cleanup_and_partition_pinning(tmp_path):
    """(a) A delta file left by a crashed uncommitted round (epoch above
    the committed one) is removed at the next commit instead of
    double-counting; (b) resuming a lake with a different num_partitions
    fails fast instead of silently splitting keys."""
    from rayrep.pipeline import replay as _replay

    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_epochs(d, [ev(0, "I", "a", 0, "x", ts=0)], [ev(1, "U", "a", 0, "y", ts=5)])
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    _replay(cfg, end_epoch=0)
    # fake an orphan from a crashed future round
    committed = glob.glob(os.path.join(lake, "delta", "p*", "e00000.parquet"))[0]
    orphan = committed.replace("e00000", "e00099")
    import shutil

    shutil.copy(committed, orphan)
    _replay(cfg)  # applies epoch 1 → cleanup must remove the orphan
    assert not os.path.exists(orphan)
    # partition-count pinning
    import dataclasses

    import pytest as _pytest

    bad = dataclasses.replace(cfg, num_partitions=cfg.num_partitions * 2)
    with _pytest.raises(ValueError, match="num_partitions"):
        _replay(bad)


def test_delta_side_output_combined_net_daily(tmp_path):
    """S7 with map-side combining: the delta holds the NET change per
    (key, utc-day) — one row, the day's winning image (the same contract
    as the per-event path)."""
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    day2 = 86_400_000_000
    rows = [ev(0, "I", "a", 0, "x", ts=0),
            ev(1, "U", "a", 0, "y", ts=5_000_000),
            ev(2, "U", "a", 0, "z", ts=day2 + 1_000_000)]
    write_epochs(d, rows)
    _, res = run(d, lake, map_combine=True)
    assert res["totals"]["applied"] == 3
    files = glob.glob(os.path.join(lake, "delta", "p*", "e*.parquet"))
    delta = pq.read_table(files[0]).to_pandas().sort_values("change_date")
    assert list(delta["change_date"]) == ["20231114", "20231115"]
    assert list(delta["text"]) == ["y", "z"]     # net image per day


def test_combined_delta_day_winner_across_batches(tmp_path):
    """Regression: a (key, day)'s unrestricted argmax can be a conflict
    LOSER (a cross-day ts inversion raises the running max in between);
    the daily delta must then emit the day's real last winner from
    another batch, not drop the day entirely."""
    from rayrep.apply import Applier
    from rayrep.augment import Augmenter
    from rayrep.combine import combine_batch
    from rayrep.schema import CANONICAL_SCHEMA_V2, CHANGELOG_SCHEMA, SchemaVersion

    day = 86_400_000_000
    sv = SchemaVersion(2, CANONICAL_SCHEMA_V2).to_json()
    aug = Augmenter(sv, 1)
    b1 = pa.Table.from_pylist(
        [ev(3, "I", "a", 0, "A-day0", ts=5_000_000),
         ev(5, "U", "a", 0, "X-day1", ts=day + 1_000_000)],
        schema=CHANGELOG_SCHEMA)
    b2 = pa.Table.from_pylist(
        [ev(10, "U", "a", 0, "B-day0-stale", ts=6_000_000)],  # loses to X
        schema=CHANGELOG_SCHEMA)
    group = pa.concat_tables([combine_batch(aug(b1), by_day=True),
                              combine_batch(aug(b2), by_day=True)])
    lake = str(tmp_path / "lake")
    summary = Applier(lake, 0, sv)(group)
    assert summary["applied"][0].as_py() == 2
    assert summary["conflict"][0].as_py() == 1
    delta = pq.read_table(glob.glob(os.path.join(lake, "delta", "p*", "e*.parquet"))[0]).to_pandas()
    assert sorted(delta["text"]) == ["A-day0", "X-day1"]  # day0's real winner kept


def test_delta_disabled(tmp_path):
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_epochs(d, [ev(0, "I", "a", 0, "x", ts=0)])
    run(d, lake, delta_output=False)
    assert not os.path.exists(os.path.join(lake, "delta"))


def test_parquet_topic_and_counting_sinks(tmp_path):
    from rayrep.sinks import CountingSink, ParquetTopicSink, write_delta_by_day

    df = pd.DataFrame({"a": np.arange(100), "change_date": ["20240101"] * 50 + ["20240102"] * 50})
    ds = rd.from_pandas(df)
    out = ParquetTopicSink(str(tmp_path / "topics")).write(ds)
    assert pq.read_table(out["topic_dir"]).num_rows == 100
    assert CountingSink().write(rd.from_pandas(df)) ["rows"] == 100
    # day-partitioned delta compaction (S7 downstream import layout)
    ds.write_parquet(str(tmp_path / "delta_raw"))
    res = write_delta_by_day(str(tmp_path / "delta_raw"), str(tmp_path / "delta_by_day"))
    days = sorted(os.path.basename(p) for p in glob.glob(os.path.join(res["out_dir"], "*")))
    assert days == ["change_date=20240101", "change_date=20240102"]


def test_table_filter_regex(tmp_path):
    """M7: a `table` column + filter regex selects which tables flow to
    the applier (CHANGES.txt:41-42 analog)."""
    import pyarrow as pa

    from rayrep.schema import CHANGELOG_SCHEMA

    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    rows = [ev(0, "I", "a", 0, "keepme", ts=0), ev(1, "I", "b", 0, "dropme", ts=0)]
    tbl = pa.Table.from_pylist(rows, schema=CHANGELOG_SCHEMA)
    tbl = tbl.append_column("table", pa.array(["transcripts", "other"]))
    os.makedirs(d)
    pq.write_table(tbl, os.path.join(d, "epoch-00000.parquet"))
    _, res = run(d, lake, table_filter_regex="^transcripts$")
    got = final_table_pandas(lake)
    assert list(got["text"]) == ["keepme"]


def test_compact_and_gc_lake(tmp_path):
    """Delta-chain lifecycle: per-epoch delta files accumulate → explicit
    major compaction folds each chain to one full file → GC removes the
    superseded deltas; the folded lake reads identically."""
    from rayrep.compact import compact_lake

    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(d, GenSpec(n_events=400, n_conversations=20, n_epochs=4))
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4)
    replay(cfg)
    table_before = final_table_pandas(lake)
    before = len(glob.glob(os.path.join(lake, "part-*", "state-e*.parquet")))
    assert before > 4                           # per-epoch deltas accumulated
    res_c = compact_lake(lake)
    assert res_c["compacted"] >= 1
    res = gc_lake(lake)
    after = len(glob.glob(os.path.join(lake, "part-*", "state-e*.parquet")))
    assert res["deleted"] == before + res_c["compacted"] - after
    assert after <= 2 * 4                       # ≤ (live full + last delta) per partition
    # lake reads identically after compaction + GC
    pd.testing.assert_frame_equal(final_table_pandas(lake), table_before)


@pytest.mark.parametrize("convergence", ["sum", "count"])
def test_label_propagation_matches_union_find(convergence):
    from rayrep.ops.dedup import label_propagation, union_find

    edges = [(1, 2), (2, 3), (5, 6), (8, 8)]
    uf = union_find([1, 2, 3, 5, 6, 8], edges)
    eds = rd.from_pandas(pd.DataFrame({"a": [a for a, _ in edges],
                                       "b": [b for _, b in edges]}))
    lp = label_propagation(eds, convergence=convergence).to_pandas() \
        .set_index("node")["label"].to_dict()
    for n, rep in lp.items():
        assert uf[n] == rep


def test_label_propagation_huge_ids_exact():
    """Regression: node ids above 2^53 (e.g. content-hash-derived) must
    survive the null-bearing columns exactly — a float64 round-trip would
    silently round them to neighboring values."""
    from rayrep.ops.dedup import label_propagation

    base = (1 << 62) + 1  # not representable as float64 (rounds to 2^62)
    edges = [(base, base + 1), (base + 1, base + 3), (base + 10, base + 10)]
    eds = rd.from_pandas(pd.DataFrame({"a": [a for a, _ in edges],
                                       "b": [b for _, b in edges]}))
    lp = label_propagation(eds).to_pandas().set_index("node")["label"].to_dict()
    assert lp[base] == base and lp[base + 1] == base and lp[base + 3] == base
    assert lp[base + 10] == base + 10


def test_label_propagation_chain_and_random_graph():
    """Pointer-jump shortcuts must close a LONG chain in O(log n) join
    rounds (plain min-propagation would need n rounds), and a random
    multi-component graph must match union-find exactly."""
    from rayrep.ops.dedup import label_propagation, union_find

    rng = np.random.default_rng(7)
    # chain 0-1-2-...-199 (diameter 199)
    chain = [(i, i + 1) for i in range(199)]
    # plus random clusters over a disjoint id range
    ra = rng.integers(1000, 1400, size=300)
    rb = rng.integers(1000, 1400, size=300)
    edges = chain + list(zip(ra.tolist(), rb.tolist()))
    nodes = sorted({x for e in edges for x in e})
    uf = union_find(nodes, edges)
    eds = rd.from_pandas(pd.DataFrame({"a": [a for a, _ in edges],
                                       "b": [b for _, b in edges]}))
    lp = label_propagation(eds, max_rounds=40).to_pandas()  # early-stops on convergence
    assert len(lp) == len(nodes)
    # the overflow-free convergence mode must reach the same fixed point
    lp2 = label_propagation(eds, max_rounds=40, convergence="count").to_pandas()
    pd.testing.assert_frame_equal(
        lp.sort_values("node").reset_index(drop=True),
        lp2.sort_values("node").reset_index(drop=True))
    got = lp.set_index("node")["label"].to_dict()
    for n in nodes:
        assert got[n] == uf[n], f"node {n}: {got[n]} != {uf[n]}"


def test_yaml_config_roundtrip(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"num_partitions": 7, "chaos_fraction": 0.5}))
    cfg = EngineConfig.from_yaml(str(p))
    assert cfg.num_partitions == 7 and cfg.chaos_fraction == 0.5


def test_incremental_replica_matches_full_rebuild(tmp_path):
    """sinks.update_replica (watermarked refreshes) must converge to
    replica_from_deltas (full rebuild) exactly; re-applying a suffix
    after a simulated manifest crash is idempotent; the partition-count
    pin refuses a drifting consumer."""
    import json

    import pytest as _pytest

    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, write_changelog
    from rayrep.pipeline import replay
    from rayrep.sinks import (
        _replica_manifest_path,
        read_replica,
        replica_from_deltas,
        update_replica,
    )

    cl, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    write_changelog(cl, GenSpec(n_events=1500, n_conversations=50,
                                n_epochs=4, zipf_a=1.1))
    replay(EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=5))
    delta = os.path.join(lake, "delta")

    def norm(df):
        df = df[sorted(df.columns)]
        return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    full = norm(replica_from_deltas(delta, num_partitions=6).to_pandas()
                .drop(columns=["part_id"]))  # internal routing column
    rdir = str(tmp_path / "replica")
    r1 = update_replica(delta, rdir, num_partitions=6, up_to_epoch=1)
    assert r1["last_epoch"] == 1
    r2 = update_replica(delta, rdir, num_partitions=6)
    assert r2["last_epoch"] == 3
    inc = norm(read_replica(rdir).to_pandas()[full.columns])
    pd.testing.assert_frame_equal(inc, full)
    # nothing new -> no-op
    assert update_replica(delta, rdir, num_partitions=6)["applied_files"] == 0
    # crash simulation: roll the watermark back; re-applying epochs 2,3
    # over already-updated state must be idempotent
    with open(_replica_manifest_path(rdir), "w") as f:
        json.dump({"last_epoch": 1, "num_partitions": 6}, f)
    update_replica(delta, rdir, num_partitions=6)
    pd.testing.assert_frame_equal(
        norm(read_replica(rdir).to_pandas()[full.columns]), full)
    # consumer partition-count drift is refused
    with _pytest.raises(ValueError, match="num_partitions"):
        update_replica(delta, rdir, num_partitions=9)
