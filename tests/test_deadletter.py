"""Dead-letter quarantine (EngineConfig.dead_letter): malformed events
divert to ``lake/dlq/e{epoch}/`` instead of refusing the epoch; the
replay converges on the valid subset and the quarantine holds exactly
the poison — across resume and even rollback→re-replay boundaries
(uncommitted epochs clear-and-rewrite their dlq dirs).
"""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.pipeline import final_table_pandas, replay
from rayrep.sinks import read_dlq

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=81, n_conversations=50, max_turns=5, n_events=900,
               n_epochs=4, delete_frac=0.1)


def _poison_row_table(n: int = 3) -> pa.Table:
    """Rows a buggy producer actually emits: null conv_id, null turn_idx,
    null everything — all with null seq (they never entered the binlog's
    dense sequence)."""
    return pa.table({
        "seq": pa.nulls(n, pa.int64()),
        "txn_id": pa.nulls(n, pa.int64()),
        "op": pa.array(["U"] * n),
        "schema_ver": pa.array([1] * n, pa.int32()),
        "conv_id": pa.array([None, "cXXX", None][:n], pa.string()),
        "turn_idx": pa.array([0, None, None][:n], pa.int32()),
        "role": pa.nulls(n, pa.string()),
        "text": pa.array(["poison"] * n),
        "tool": pa.nulls(n, pa.string()),
        "ts": pa.array([pd.Timestamp("2024-01-01"), None, None][:n],
                       pa.timestamp("us")),
        "ddl": pa.nulls(n, pa.string()),
    })


@pytest.fixture()
def poisoned_cl(tmp_path):
    cl = str(tmp_path / "cl")
    write_changelog(cl, SPEC)
    n = 0
    for e in range(SPEC.n_epochs):
        t = _poison_row_table()
        # pre-DDL epochs physically omit `tool`; match the file convention
        files = sorted(os.listdir(os.path.join(cl, f"epoch-{e:05d}")))
        sch = pq.read_schema(os.path.join(cl, f"epoch-{e:05d}", files[0]))
        if "tool" not in sch.names:
            t = t.drop_columns(["tool"])
        pq.write_table(t, os.path.join(cl, f"epoch-{e:05d}",
                                       "part-poison.parquet"))
        n += t.num_rows
    return cl, n


def _mklake(cl, tmp_path, name="lake", **kw):
    lake = str(tmp_path / name)
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, dead_letter=True, **kw)
    return cfg, lake


def test_quarantine_and_converge(poisoned_cl, tmp_path):
    """Poison diverts, valid rows converge to the clean-log oracle, the
    dlq holds exactly the injected rows, per-epoch metrics count them."""
    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    out = replay(cfg)
    assert sum(e["quarantined"] for e in out["epochs"]) == n_poison
    q = read_dlq(lake)
    assert q.num_rows == n_poison
    assert set(q.column("text").to_pylist()) == {"poison"}
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    # per-epoch narrowing
    assert read_dlq(lake, epoch=0).num_rows == n_poison // SPEC.n_epochs


def test_resume_boundary_no_duplicates(poisoned_cl, tmp_path):
    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg, end_epoch=1)
    assert read_dlq(lake).num_rows == n_poison // 2
    replay(cfg)
    assert read_dlq(lake).num_rows == n_poison
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_rollback_rereplay_clears_and_rewrites(poisoned_cl, tmp_path):
    """After rollback to barrier 1, the re-replayed epochs 2-3 CLEAR and
    rewrite their dlq dirs — the quarantine count is unchanged and the
    table still converges (exactly-once for the dlq side output)."""
    from rayrep.rollback import rollback_lake

    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    assert read_dlq(lake).num_rows == n_poison
    rollback_lake(lake, to_epoch=1)
    replay(cfg)
    assert read_dlq(lake).num_rows == n_poison  # no duplicates, no loss
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


def test_without_dead_letter_refuses(poisoned_cl, tmp_path):
    cl, _ = poisoned_cl
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                       applier_concurrency=2, validate_events=True)
    with pytest.raises(Exception, match="malformed"):
        replay(cfg)


def test_dry_run_writes_nothing(poisoned_cl, tmp_path):
    cl, _ = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path, dry_run=True)
    replay(cfg)
    assert not os.path.isdir(os.path.join(lake, "dlq"))


def test_cli_dead_letter(poisoned_cl, tmp_path):
    from rayrep.cli import main

    cl, n_poison = poisoned_cl
    lake = str(tmp_path / "lake")
    rc = main(["replay", cl, lake, "--partitions", "4", "--appliers", "2",
               "--dead-letter", "--num-cpus", "4"])
    assert rc == 0
    assert read_dlq(lake).num_rows == n_poison


def _fix_make_winner(start_key=9000):
    """fix_fn: give each quarantined row a FRESH key and a modern ts —
    the requeued rows become LWW winners (new rows in the table)."""
    def fix(t: pa.Table) -> pa.Table:
        n = t.num_rows
        t = t.set_column(t.column_names.index("conv_id"), "conv_id",
                         pa.array([f"z{start_key + i}" for i in range(n)]))
        t = t.set_column(t.column_names.index("turn_idx"), "turn_idx",
                         pa.array([0] * n, pa.int32()))
        return t.set_column(
            t.column_names.index("ts"), "ts",
            pa.array([pd.Timestamp("2024-06-01")] * n, pa.timestamp("us")))
    return fix


def test_requeue_roundtrip(poisoned_cl, tmp_path):
    """Quarantine → repair → republish as a proper epoch → resume: the
    repaired rows land in the table, the active dlq drains, and
    check-log passes on the EXTENDED log (the new epoch chains from the
    seq high-water mark)."""
    from rayrep.checklog import check_changelog
    from rayrep.sinks import requeue_dlq

    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    res = requeue_dlq(lake, cl, fix_fn=_fix_make_winner())
    assert res["requeued"] == n_poison
    assert res["epoch"] == SPEC.n_epochs  # appended after the last epoch
    out = replay(cfg)  # resume picks up the requeued epoch
    assert sum(e["applied"] for e in out["epochs"]) == n_poison
    assert read_dlq(lake).num_rows == 0
    ft = final_table_pandas(lake)
    assert (ft["conv_id"].str.startswith("z")).sum() == n_poison
    # the poison STAYS in the log (quarantine diverts, it never rewrites
    # history) so check-log flags epochs 0-3 with named null-seq errors —
    # while the REQUEUED epoch itself is dense and chains from the hwm
    rep = check_changelog(cl)
    assert not rep["ok"]
    assert any("NULL seq" in e for e in rep["errors"])
    req = [r for r in rep["epochs"] if r["epoch"] == SPEC.n_epochs]
    assert req and req[0]["dense"], req


def test_requeue_unfixable_refused(poisoned_cl, tmp_path):
    from rayrep.sinks import DlqRequeueError, requeue_dlq

    cl, _ = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    with pytest.raises(DlqRequeueError, match="still carry"):
        requeue_dlq(lake, cl)  # no fix: rows still malformed
    # nothing published, dlq untouched
    assert not os.path.isdir(os.path.join(cl, f"epoch-{SPEC.n_epochs:05d}"))
    assert read_dlq(lake).num_rows > 0


def test_requeue_crash_rerun_state_idempotent(poisoned_cl, tmp_path):
    """Crash window: epoch published but dlq files not yet moved. The
    re-run republishes under NEW seqs; duplicate rows carry identical
    (ts, payload) so the converged table is unchanged."""
    import shutil

    from rayrep.sinks import requeue_dlq

    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)
    dlq_backup = str(tmp_path / "dlq_backup")
    shutil.copytree(os.path.join(lake, "dlq"), dlq_backup)
    requeue_dlq(lake, cl, fix_fn=_fix_make_winner())
    # simulate the crash: active dlq files come back
    shutil.rmtree(os.path.join(lake, "dlq"))
    shutil.copytree(dlq_backup, os.path.join(lake, "dlq"))
    res2 = requeue_dlq(lake, cl, fix_fn=_fix_make_winner())
    assert res2["epoch"] == SPEC.n_epochs + 1  # a second epoch
    replay(cfg)
    ft = final_table_pandas(lake)
    # duplicates collapsed by LWW: exactly n_poison z-keys, once each
    z = ft[ft["conv_id"].str.startswith("z")]
    assert len(z) == n_poison and z["conv_id"].is_unique


def test_poisoned_log_compaction_interop(poisoned_cl, tmp_path):
    """Dead-letter × compaction interop: a poisoned changelog refuses
    plain compaction (null keys can't be LWW-retained), compacts cleanly
    with drop_malformed=True (the dropped rows are exactly what a
    dead-letter lake quarantines, counted in the span meta), and the
    compacted log replays a FRESH dead-letter lake to the same table with
    zero quarantined rows left."""
    from rayrep.logcompact import compact_changelog, span_meta
    from rayrep.manifests import CompactedLogError

    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    replay(cfg)  # commit the barrier so the span check passes
    expected = final_table_pandas(lake)
    with pytest.raises(CompactedLogError, match="null conv_id/turn_idx"):
        compact_changelog(cl, through_epoch=SPEC.n_epochs - 2,
                          lake_dir=lake)
    res = compact_changelog(cl, through_epoch=SPEC.n_epochs - 2,
                            lake_dir=lake, drop_malformed=True)
    n_span_poison = n_poison * (SPEC.n_epochs - 1) // SPEC.n_epochs
    assert res["n_dropped_malformed"] == n_span_poison
    import glob as _glob
    span = next(p for p in _glob.glob(os.path.join(cl, "epoch-*-c*"))
                if span_meta(p) is not None)
    assert span_meta(span)["n_dropped_malformed"] == n_span_poison
    # fresh replay of the compacted log: same table, nothing to quarantine
    cfg2, lake2 = _mklake(cl, tmp_path, name="lake2")
    out2 = replay(cfg2)
    # only the uncompacted tail epoch still carries its poison
    assert sum(e["quarantined"] for e in out2["epochs"]) == \
        n_poison - n_span_poison
    assert_frames_equal(final_table_pandas(lake2), expected)


def test_dead_letter_tail_self_compacts(poisoned_cl, tmp_path):
    """tail(dead_letter + compact_log_every) on a poisoned log: the tailer
    quarantines, self-compacts with the malformed rows dropped, and
    converges — the combination the drop_malformed plumbing exists for."""
    from rayrep.pipeline import tail

    cl, n_poison = poisoned_cl
    cfg, lake = _mklake(cl, tmp_path)
    res = tail(cfg, poll_interval_s=0.2, idle_timeout_s=2.0,
               compact_log_every=2)
    assert res["maintenance"]["log_compactions"] >= 1
    assert sum(e["quarantined"] for e in res["epochs"]) == n_poison
    clean_cfg, clean_lake = _mklake(cl, tmp_path, name="lake_ref")
    replay(clean_cfg)
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
