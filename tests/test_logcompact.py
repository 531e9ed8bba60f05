"""Kafka-style changelog compaction (rayrep/logcompact.py): epochs
[first, through] collapse to the minimal replay-equivalent event set —
latest event per key (row mode) or the per-cell winner set (cells mode),
plus tombstones and every DDL — in one span directory that still replays
from scratch to the exact same lake (unlike trim_changelog, which kills
fresh consumers).  The span rename is crash-monotone: the instant it
exists, the plain epochs it covers are shadow garbage.
"""

import glob
import os
import shutil

import pytest

from rayrep.checklog import check_changelog
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.logcompact import compact_changelog, compaction_horizon, span_meta
from rayrep.manifests import CompactedLogError
from rayrep.pipeline import discover_epochs, final_table_pandas, replay
from rayrep.timetravel import as_of

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=71, n_conversations=60, max_turns=5, n_events=1200,
               n_epochs=4, delete_frac=0.15, zipf_a=1.1)
CELL_SPEC = GenSpec(seed=72, n_conversations=60, max_turns=5, n_events=1200,
                    n_epochs=4, delete_frac=0.1, changed_cells_frac=0.5)


@pytest.fixture()
def cl(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    return d


def _mklake(cl, tmp_path, name="lake", **kw):
    lake = str(tmp_path / name)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, **kw)
    return cfg, lake


def test_fresh_replay_of_compacted_log_converges(cl, tmp_path):
    """Compact epochs 0-2 (tail epoch 3 stays plain), fresh-replay the
    result: the lake equals the full-history sequential oracle, with a
    real retention ratio and the span listed under its END epoch."""
    res = compact_changelog(cl, through_epoch=2)
    assert res["first_epoch"] == 0 and res["last_epoch"] == 2
    assert res["n_retained"] < res["n_original"]
    eps = discover_epochs(cl)
    assert [e for e, _ in eps] == [2, 3]
    assert eps[0][1].endswith("epoch-00000-c00002")
    cfg, lake = _mklake(cl, tmp_path)
    out = replay(cfg)
    # the span replays as ONE round at its end epoch number
    assert [e["epoch"] for e in out["epochs"]] == [2, 3]
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_resume_across_span_converges(cl, tmp_path):
    """Barrier at epoch 1, THEN compact 0-2 (span straddles the barrier),
    then resume: watermark anti-join skips the already-applied retained
    events and the lake still converges to the sequential oracle."""
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=1)
    compact_changelog(cl, through_epoch=2)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_tombstones_retained_and_deleted_keys_stay_deleted(cl, tmp_path):
    """A key whose last event is a delete survives compaction as a
    tombstone (op='D' with its original seq/ts), so a fresh replay of the
    compacted log deletes it — the converged table has no such keys."""
    import pyarrow.parquet as pq

    compact_changelog(cl, through_epoch=2)
    span = glob.glob(os.path.join(cl, "epoch-*-c*"))[0]
    ops = set()
    for f in glob.glob(os.path.join(span, "part-0*.parquet")):
        ops |= set(pq.read_table(f, columns=["op"])["op"].to_pylist())
    assert "D" in ops, "compaction must retain delete tombstones"
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_ddl_span_pre_evolves_payload(cl, tmp_path):
    """SPEC's add_column DDL lands mid-span: the compactor pre-evolves
    retained payload to the final schema, retains the DDL event with its
    original seq, and a fresh replay rebuilds the identical version
    chain + table (the oracle replays the UNcompacted log)."""
    import pyarrow.parquet as pq

    res = compact_changelog(cl, through_epoch=2)
    assert res["n_ddl"] >= 1
    span = glob.glob(os.path.join(cl, "epoch-*-c*"))[0]
    # every data part file is physically at the FINAL schema
    for f in glob.glob(os.path.join(span, "part-0*.parquet")):
        assert "tool" in pq.read_schema(f).names  # the added column
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_checklog_verifies_span_receipt(cl):
    """check-log passes on a compacted log (span receipt: retained count
    + hash-sum, seq envelope, chaining through seq_hwm) and catches a
    lost span part file as a receipt mismatch."""
    compact_changelog(cl, through_epoch=2)
    rep = check_changelog(cl)
    assert rep["ok"], rep["errors"]
    assert rep["epochs"][0]["compacted_span"] is True
    span = glob.glob(os.path.join(cl, "epoch-*-c*"))[0]
    os.remove(sorted(glob.glob(os.path.join(span, "part-0*.parquet")))[0])
    rep2 = check_changelog(cl)
    assert not rep2["ok"]
    assert any("receipt" in e for e in rep2["errors"])


def test_crash_monotone_shadowing_and_idempotent_rerun(cl, tmp_path):
    """Simulate a compactor crash after the span rename but before gc:
    the shadowed plain epochs are ignored by discovery, replay converges,
    and re-running the compactor completes the gc without rebuilding."""
    backup = str(tmp_path / "orig")
    shutil.copytree(cl, backup)
    compact_changelog(cl, through_epoch=2)
    for e in range(3):  # resurrect the originals = the crash window
        shutil.copytree(os.path.join(backup, f"epoch-{e:05d}"),
                        os.path.join(cl, f"epoch-{e:05d}"))
    eps = discover_epochs(cl)
    assert [e for e, _ in eps] == [2, 3], "span must shadow plain epochs"
    res = compact_changelog(cl, through_epoch=2)
    assert res.get("already_compacted") is True
    assert len(res["gc_removed"]) == 3
    assert not glob.glob(os.path.join(cl, "epoch-00000")), "gc incomplete"
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_recompaction_absorbs_prior_span(cl, tmp_path):
    """Compact 0-1, then recompact 0-2: the new span absorbs the old one
    (original-event accounting carries forward) and replay converges."""
    r1 = compact_changelog(cl, through_epoch=1)
    r2 = compact_changelog(cl, through_epoch=2)
    assert r2["first_epoch"] == 0 and r2["last_epoch"] == 2
    # accounting carries forward: the absorbed span's discarded events
    # still count as original history
    assert r2["n_original"] > r1["n_original"] > r1["n_retained"]
    eps = discover_epochs(cl)
    assert [e for e, _ in eps] == [2, 3]
    assert not glob.glob(os.path.join(cl, "epoch-00000-c00001"))
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_guards(cl, tmp_path):
    """end_epoch inside a span, as-of below the ts horizon, compacting
    the active tail, and a stale lake barrier are all refused."""
    with pytest.raises(ValueError, match="active tail"):
        compact_changelog(cl, through_epoch=3)
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=0)  # barrier at 0 < through
    with pytest.raises(ValueError, match="committed through"):
        compact_changelog(cl, through_epoch=2, lake_dir=lake)
    compact_changelog(cl, through_epoch=2)
    with pytest.raises(CompactedLogError, match="strictly inside"):
        replay(_mklake(cl, tmp_path, "lake2")[0], end_epoch=1)
    h = compaction_horizon(cl)
    assert h > 0
    with pytest.raises(CompactedLogError, match="horizon"):
        as_of(cl, ts_us=h - 1, num_partitions=4)
    # at/above the horizon the as-of read works (it is the final state
    # of the span plus the plain tail filtered by ts)
    as_of(cl, ts_us=h, num_partitions=4).materialize()


def test_cells_mode_preserves_per_cell_history(tmp_path):
    """Changed-cells log: row-mode compaction would lose older partial-
    update carriers, so (a) replaying a row-compacted span with
    changed_cells_updates=True is refused, and (b) cells-mode compaction
    retains the per-cell winner set and both fresh replay AND mid-span
    resume converge to the uncompacted per-cell replay."""
    src = str(tmp_path / "cl0")
    write_changelog(src, CELL_SPEC)
    kw = dict(changed_cells_updates=True, per_cell_conflicts=True)
    cfg0, lake0 = _mklake(src, tmp_path, "lake0", **kw)
    replay(cfg0)
    expect = final_table_pandas(lake0)

    cl_row = str(tmp_path / "cl_row")
    shutil.copytree(src, cl_row)
    compact_changelog(cl_row, through_epoch=2, mode="row")
    with pytest.raises(CompactedLogError, match="ROW-compacted"):
        replay(_mklake(cl_row, tmp_path, "lake_r", **kw)[0])

    cl_cells = str(tmp_path / "cl_cells")
    shutil.copytree(src, cl_cells)
    res = compact_changelog(cl_cells, through_epoch=2, mode="cells")
    assert span_meta(glob.glob(os.path.join(
        cl_cells, "epoch-*-c*"))[0])["mode"] == "cells"
    assert res["n_retained"] < res["n_original"]
    cfg1, lake1 = _mklake(cl_cells, tmp_path, "lake1", **kw)
    replay(cfg1)
    assert_frames_equal(final_table_pandas(lake1), expect)

    cl_mid = str(tmp_path / "cl_mid")
    shutil.copytree(src, cl_mid)
    cfg2, lake2 = _mklake(cl_mid, tmp_path, "lake2", **kw)
    replay(cfg2, end_epoch=1)
    compact_changelog(cl_mid, through_epoch=2, mode="cells")
    replay(cfg2)
    assert_frames_equal(final_table_pandas(lake2), expect)

    # recompacting a row span with mode=cells cannot restore history
    with pytest.raises(CompactedLogError, match="already gone"):
        compact_changelog(cl_row, through_epoch=2, mode="cells")


def test_cli_compact_log(cl, tmp_path):
    from rayrep.cli import main

    rc = main(["compact-log", cl, "--through-epoch", "2", "--num-cpus", "4"])
    assert rc == 0
    assert glob.glob(os.path.join(cl, "epoch-*-c*"))
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_self_maintaining_tail(tmp_path):
    """tail(compact_log_every=2, compact_lake_every=2): a producer thread
    publishes epochs while the tailer applies them AND compacts the log
    behind its own barrier and the lake's chains — the long-running
    replicator whose log and state both stay bounded.  Convergence to the
    sequential oracle + a real span on disk + a compacted chain."""
    import threading
    import time as _t

    from rayrep.gen import generate_changelog, publish_epoch
    from rayrep.pipeline import final_table_pandas as _ftp
    from rayrep.pipeline import tail

    spec = GenSpec(seed=73, n_conversations=50, max_turns=5, n_events=1200,
                   n_epochs=1, delete_frac=0.1)
    full = generate_changelog(spec)
    n = full.num_rows
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    os.makedirs(d)
    publish_epoch(d, 0, full.slice(0, bounds[1]))

    def producer():
        for e in (1, 2, 3):
            _t.sleep(1.2)
            publish_epoch(d, e,
                          full.slice(bounds[e], bounds[e + 1] - bounds[e]))

    th = threading.Thread(target=producer)
    th.start()
    cfg = EngineConfig(changelog_dir=d, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2)
    res = tail(cfg, poll_interval_s=0.4, idle_timeout_s=5.0,
               compact_log_every=2, compact_lake_every=2)
    th.join()
    assert res["maintenance"]["log_compactions"] >= 1, res["maintenance"]
    assert res["maintenance"]["lake_compactions"] >= 1, res["maintenance"]
    assert glob.glob(os.path.join(d, "epoch-*-c*")), "no span on disk"
    from .oracle import replay_oracle as _ro
    oracle_df, _ = _ro(full)
    assert_frames_equal(_ftp(lake), oracle_df)
    # the compacted log still serves a FRESH consumer
    lake2 = str(tmp_path / "lake2")
    replay(EngineConfig(changelog_dir=d, lake_dir=lake2, num_partitions=4,
                        applier_concurrency=2))
    assert_frames_equal(_ftp(lake2), oracle_df)


def test_targeted_repair_from_compacted_log(cl, tmp_path):
    """Targeted partition repair re-replays from epoch 0 — over a
    compacted log that means rebuilding from the span, which holds
    exactly the final-state event set: the rebuilt partition must be
    BIT-EQUAL (watermark + live_rows + folded rows) to its pre-damage
    self."""
    import shutil as _sh

    from rayrep.manifests import PartitionManifest
    from rayrep.repair import repair_partitions

    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    compact_changelog(cl, through_epoch=2)
    before = final_table_pandas(lake)
    m_before = PartitionManifest.load(lake, 1)
    # destroy partition 1's state files + manifest
    for f in m_before.state_chain:
        os.remove(os.path.join(lake, f))
    os.remove(PartitionManifest.path(lake, 1))
    repair_partitions(cfg, [1])
    m_after = PartitionManifest.load(lake, 1)
    # live rows are bit-equal; the watermark may legitimately sit LOWER
    # (the partition's max-seq event can be a discarded LWW loser) but
    # never higher, and resume safety only needs it at/above the last
    # retained seq — which it is by construction
    assert m_after.live_rows == m_before.live_rows
    assert m_after.last_seq <= m_before.last_seq
    assert_frames_equal(final_table_pandas(lake), before)


def test_dedup_ingest_replay_of_span_refused(cl, tmp_path):
    """Content-claim order is history-dependent: a compacted-away event
    may have been the first claimant, so dedup-on-ingest replay over a
    span is unsound and must refuse."""
    compact_changelog(cl, through_epoch=2)
    cfg, _ = _mklake(cl, tmp_path, dedup_ingest=True)
    with pytest.raises(CompactedLogError, match="dedup_ingest"):
        replay(cfg)


def test_multi_table_log_refused(tmp_path):
    """A changelog carrying a `table` column must not row-compact across
    tables that share (conv_id, turn_idx) keys."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cl = str(tmp_path / "cl")
    write_changelog(cl, SPEC)
    for e in range(SPEC.n_epochs):
        d = os.path.join(cl, f"epoch-{e:05d}")
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            t = pq.read_table(p)
            pq.write_table(t.append_column(
                "table", pa.array(["t1"] * t.num_rows)), p)
    with pytest.raises(CompactedLogError, match="multi-table"):
        compact_changelog(cl, through_epoch=2)
