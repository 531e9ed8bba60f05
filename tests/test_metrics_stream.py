"""Continuous metrics stream (rayrep/metrics.py): one JSON line per epoch
barrier appended to ``<lake>/_manifests/metrics.jsonl`` by replay/tail,
plus maintenance-event lines — the codahale time-series analog
(CHANGES.txt:79-80). Covers: multi-round tail emission, resume continuity,
torn-line tolerance, rotation, the follow() consumer, and the CLI."""

import glob
import json
import os
import threading
import time as _t

import pytest

from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, publish_epoch, write_changelog
from rayrep.metrics import emit, follow, read_stream, stream_path
from rayrep.pipeline import replay, tail

SPEC = GenSpec(seed=91, n_conversations=40, max_turns=5, n_events=800,
               n_epochs=4, delete_frac=0.1)


@pytest.fixture()
def cl(tmp_path):
    d = str(tmp_path / "cl")
    write_changelog(d, SPEC)
    return d


def _cfg(cl, lake, **kw):
    return EngineConfig(changelog_dir=cl, lake_dir=lake, num_partitions=4,
                        applier_concurrency=2, **kw)


def test_replay_emits_one_line_per_epoch_and_resume_continues(cl, tmp_path):
    lake = str(tmp_path / "lake")
    r1 = replay(_cfg(cl, lake), end_epoch=1)  # simulated kill after epoch 1
    recs = read_stream(lake, kind="epoch")
    assert [r["epoch"] for r in recs] == [0, 1]
    r2 = replay(_cfg(cl, lake))               # resume applies 2, 3
    recs = read_stream(lake, kind="epoch")
    assert [r["epoch"] for r in recs] == [0, 1, 2, 3]
    # stream counters equal the ReplayResult's, totals are monotone
    by_epoch = {e["epoch"]: e for e in r1["epochs"] + r2["epochs"]}
    for r in recs:
        e = by_epoch[r["epoch"]]
        for k in ("input_rows", "applied", "skipped", "conflict", "deleted"):
            assert r[k] == e[k], (r["epoch"], k)
        assert "replication_delay_s" in r and "wall_s" in r
    applied_cum = [r["totals"]["applied"] for r in recs]
    assert applied_cum == sorted(applied_cum)
    # idempotent re-run emits nothing new
    replay(_cfg(cl, lake))
    assert len(read_stream(lake, kind="epoch")) == 4


def test_tail_streams_epochs_and_maintenance(tmp_path):
    """A producer publishes progressively; the tailer's stream carries
    every applied epoch in order plus a log_compaction event line."""
    spec = GenSpec(seed=92, n_conversations=40, max_turns=5, n_events=1000,
                   n_epochs=1, delete_frac=0.1)
    full = generate_changelog(spec)
    n = full.num_rows
    bounds = [0, n // 4, n // 2, 3 * n // 4, n]
    d, lake = str(tmp_path / "cl"), str(tmp_path / "lake")
    os.makedirs(d)
    publish_epoch(d, 0, full.slice(0, bounds[1]))

    def producer():
        for e in (1, 2, 3):
            _t.sleep(1.0)
            publish_epoch(d, e,
                          full.slice(bounds[e], bounds[e + 1] - bounds[e]))

    th = threading.Thread(target=producer)
    th.start()
    tail(_cfg(d, lake), poll_interval_s=0.3, idle_timeout_s=4.0,
         compact_log_every=2)
    th.join()
    eps = read_stream(lake, kind="epoch")
    assert [r["epoch"] for r in eps] == [0, 1, 2, 3]
    comps = read_stream(lake, kind="log_compaction")
    assert comps and comps[0]["n_retained"] <= comps[0]["n_original"]
    # every record carries an emission timestamp, in nondecreasing order
    all_ts = [r["emitted_ts_us"] for r in read_stream(lake)]
    assert all_ts == sorted(all_ts)


def test_torn_final_line_skipped_and_recovered(tmp_path):
    lake = str(tmp_path / "lake")
    emit(lake, {"kind": "epoch", "epoch": 0})
    emit(lake, {"kind": "epoch", "epoch": 1})
    with open(stream_path(lake), "a") as f:
        f.write('{"kind": "epoch", "epo')  # crash mid-write, no newline
    assert [r["epoch"] for r in read_stream(lake, kind="epoch")] == [0, 1]
    # the next emit appends after the torn bytes; the torn line stays
    # unparseable but everything else reads fine
    emit(lake, {"kind": "epoch", "epoch": 2})
    got = [r["epoch"] for r in read_stream(lake, kind="epoch")]
    assert got[:2] == [0, 1] and got[-1] == 2


def test_rotation_bounds_disk(tmp_path):
    lake = str(tmp_path / "lake")
    for i in range(50):
        emit(lake, {"kind": "epoch", "epoch": i}, rotate_max_bytes=600)
    assert os.path.exists(stream_path(lake) + ".1")
    live = read_stream(lake)
    both = read_stream(lake, include_rotated=True)
    assert len(both) > len(live)
    # windows are contiguous: rotated ∪ live is a suffix of 0..49
    eps = [r["epoch"] for r in both]
    assert eps == list(range(eps[0], 50))
    assert os.path.getsize(stream_path(lake)) <= 600


def test_follow_consumes_live_appends(tmp_path):
    lake = str(tmp_path / "lake")
    emit(lake, {"kind": "epoch", "epoch": 0})

    def producer():
        for i in (1, 2):
            _t.sleep(0.3)
            emit(lake, {"kind": "epoch", "epoch": i})

    th = threading.Thread(target=producer)
    th.start()
    got = [r["epoch"] for r in follow(lake, poll_interval_s=0.1,
                                      idle_timeout_s=1.5)]
    th.join()
    assert got == [0, 1, 2]


def test_metrics_cli(cl, tmp_path, capsys):
    from rayrep.cli import main

    lake = str(tmp_path / "lake")
    replay(_cfg(cl, lake))
    assert main(["metrics", lake, "--kind", "epoch"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert [r["epoch"] for r in lines] == [0, 1, 2, 3]
    assert main(["metrics", lake, "--last", "2"]) == 0
    lines = [json.loads(x) for x in
             capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 2 and lines[-1]["epoch"] == 3


def test_metrics_stream_off(cl, tmp_path):
    lake = str(tmp_path / "lake")
    replay(_cfg(cl, lake, metrics_stream=False))
    assert not os.path.exists(stream_path(lake))
    # dry-run writes nothing either
    lake2 = str(tmp_path / "lake2")
    replay(_cfg(cl, lake2, dry_run=True))
    assert not glob.glob(os.path.join(lake2, "_manifests", "metrics.jsonl*"))
