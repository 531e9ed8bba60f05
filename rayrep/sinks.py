"""Pluggable sinks (§2.10): the reference selects HBase / Kafka / STDOUT
appliers by config (CHANGES.txt:75,43,143). The primary Parquet-lake sink
lives in apply.py; this module provides the alternates behind one protocol
so a user of the reference finds the same surface.
"""

from __future__ import annotations

import json
import os
from typing import Protocol

import pyarrow as pa
import ray.data as rd


class Sink(Protocol):
    def write(self, ds: rd.Dataset) -> dict: ...


class ParquetTopicSink:
    """Kafka-applier analog (CHANGES.txt:75): publishes augmented rows to a
    per-table "topic" directory, many rows per file (the multi-row-batching
    perf fix, CHANGES.txt:30-31). A table-filter regex selects which tables
    flow (CHANGES.txt:41-42)."""

    def __init__(self, topic_root: str, topic: str = "transcripts",
                 min_rows_per_file: int = 100_000):
        self.dir = os.path.join(topic_root, topic)
        self.min_rows = min_rows_per_file

    def write(self, ds: rd.Dataset) -> dict:
        ds.write_parquet(self.dir, min_rows_per_file=self.min_rows)
        return {"topic_dir": self.dir}


class JsonDebugSink:
    """STDOUT/JSON applier analog (CHANGES.txt:43,143): bounded debug dump."""

    def __init__(self, limit: int = 20, to_dir: str | None = None):
        self.limit = limit
        self.to_dir = to_dir

    def write(self, ds: rd.Dataset) -> dict:
        if self.to_dir:
            ds.write_json(self.to_dir)
            return {"json_dir": self.to_dir}
        rows = ds.limit(self.limit).take_all()
        for r in rows:
            print(json.dumps(r, default=str))
        return {"printed": len(rows)}


class CountingSink:
    """Null sink: consumes the stream and returns row/byte counts — used to
    benchmark upstream stages without write amplification."""

    def write(self, ds: rd.Dataset) -> dict:
        rows = 0
        nbytes = 0
        for b in ds.iter_batches(batch_format="pyarrow"):
            rows += b.num_rows
            nbytes += b.nbytes
        return {"rows": rows, "bytes": nbytes}


def replica_from_deltas(delta_dir: str, num_partitions: int = 16) -> rd.Dataset:
    """Downstream exactly-once consumer (the reference's Kafka-applier
    analog): rebuild the latest-image table from the daily-delta stream
    ALONE — never touching engine state.  Sound because every key's final
    state winner is by construction among its day-net delta rows.  One
    hash shuffle of delta rows (already day-netted per epoch, << event
    count), then a per-partition vectorized (ts, seq) argmax and
    tombstone drop.  Returns a streaming Dataset — consume with
    ``write_parquet`` / ``iter_batches``; the table never lands on the
    driver."""
    import numpy as np
    import pyarrow.compute as pc

    from rayrep.apply import lww_last_rows
    from rayrep.hashing import partition_ids

    ds = rd.read_parquet(delta_dir)

    def tag(t: pa.Table) -> pa.Table:
        # delta files may already carry the engine's routing part_id;
        # re-derive with the replica's own partition count regardless (a
        # consumer can't assume the producer's P)
        if "part_id" in t.column_names:
            t = t.drop_columns(["part_id"])
        return t.append_column(
            "part_id",
            pa.array(partition_ids(t.column("conv_id"), num_partitions)))

    def fold(group: pa.Table) -> pa.Table:
        g = group.rename_columns(
            [c if c != "seq" else "__seq" for c in group.column_names])
        win = lww_last_rows(g)
        live = win.filter(pc.not_equal(win.column("op"), "D"))
        return live.rename_columns(
            [c if c != "__seq" else "seq" for c in live.column_names])

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("part_id")
            .map_groups(fold, batch_format="pyarrow"))


def write_delta_by_day(delta_dir: str, out_dir: str) -> dict:
    """Compact the applier's per-(partition, epoch) delta files into
    day-partitioned output (daily delta tables for cheap downstream import,
    CHANGES.txt:123; UTC suffix CHANGES.txt:55)."""
    ds = rd.read_parquet(delta_dir)
    ds.write_parquet(out_dir, partition_cols=["change_date"])
    return {"out_dir": out_dir}


def concat_small(ds: rd.Dataset) -> pa.Table:
    return pa.concat_tables(list(ds.iter_batches(batch_format="pyarrow", batch_size=None)))


# ---------------------------------------------------------------------------
# Incremental replica maintenance (the long-running Kafka-consumer shape):
# instead of re-folding the WHOLE delta stream per refresh
# (``replica_from_deltas``), a maintained replica applies only epochs
# past its own watermark — refresh I/O ∝ new deltas, not stream length.
# ---------------------------------------------------------------------------

def _replica_manifest_path(replica_dir: str) -> str:
    return os.path.join(replica_dir, "_replica", "manifest.json")


def _load_replica_manifest(replica_dir: str) -> dict:
    p = _replica_manifest_path(replica_dir)
    if not os.path.exists(p):
        return {"last_epoch": -1, "num_partitions": 0}
    import json

    with open(p) as f:
        return json.load(f)


def update_replica(delta_dir: str, replica_dir: str,
                   num_partitions: int = 16,
                   up_to_epoch: int | None = None) -> dict:
    """Apply every delta epoch past the replica's watermark (optionally
    capped at ``up_to_epoch``) to a maintained latest-image replica.

    State layout mirrors the engine lake: one parquet per replica
    partition (``part-NNNNN/state.parquet``), rows keep their ``op`` so
    TOMBSTONES PERSIST. Strictly, the producer's loser-exclusion (the
    applier emits only rows that WON against lake state) already keeps
    stale rows out of the stream; persisting the tombstone makes the
    replica's fold self-contained — correct even if a future producer
    emits losers, and exact under idempotent re-application of any
    epoch suffix. ``read_replica`` filters them out. Convergence
    matches the full rebuild (``replica_from_deltas``) exactly.

    Exactly-once without coordination, the engine's own discipline:
    per-partition rewrites are atomic and the watermark manifest
    publishes LAST, so a crashed refresh re-applies the same epochs —
    idempotent, because folding duplicate delta rows through the
    (ts, seq) argmax picks the same winners. One Ray task per touched
    partition; untouched partitions' files are not read or written."""
    import glob as _glob
    import re as _re

    import pyarrow.parquet as pq

    from rayrep.apply import lww_last_rows, write_parquet_atomic
    from rayrep.hashing import partition_ids
    from rayrep.manifests import atomic_write_json

    man = _load_replica_manifest(replica_dir)
    if man["num_partitions"] not in (0, num_partitions):
        raise ValueError(
            f"replica {replica_dir} is pinned to num_partitions="
            f"{man['num_partitions']}; got {num_partitions}")
    last = man["last_epoch"]
    new_files: list[str] = []
    hi = last
    for f in _glob.glob(os.path.join(delta_dir, "p*", "e*.parquet")):
        e = int(_re.search(r"e(\d+)\.parquet$", f).group(1))
        if e > last and (up_to_epoch is None or e <= up_to_epoch):
            new_files.append(f)
            hi = max(hi, e)
    if not new_files:
        return {"applied_files": 0, "last_epoch": last}

    ds = rd.read_parquet(new_files)

    def tag(t: pa.Table) -> pa.Table:
        if "part_id" in t.column_names:
            t = t.drop_columns(["part_id"])
        return t.append_column(
            "part_id",
            pa.array(partition_ids(t.column("conv_id"), num_partitions)))

    def fold_into(group: pa.Table) -> pa.Table:
        pid = int(group.column("part_id")[0].as_py())
        pdir = os.path.join(replica_dir, f"part-{pid:05d}")
        spath = os.path.join(pdir, "state.parquet")
        g = group.drop_columns(["part_id"])
        if os.path.exists(spath):
            old = pq.read_table(spath)
            g = pa.concat_tables([old, g], promote_options="permissive")
        g = g.rename_columns(
            [c if c != "seq" else "__seq" for c in g.column_names])
        win = lww_last_rows(g).rename_columns(
            [c if c != "__seq" else "seq" for c in g.column_names])
        os.makedirs(pdir, exist_ok=True)
        write_parquet_atomic(win, spath)
        import pyarrow.compute as _pc

        live = int(_pc.sum(_pc.not_equal(win.column("op"), "D")).as_py() or 0)
        return pa.table({"part_id": pa.array([pid], pa.int32()),
                         "rows": pa.array([win.num_rows], pa.int64()),
                         "live": pa.array([live], pa.int64())})

    summary = (ds.map_batches(tag, batch_format="pyarrow")
               .groupby("part_id")
               .map_groups(fold_into, batch_format="pyarrow")
               .take_all())  # P one-row summaries
    atomic_write_json(_replica_manifest_path(replica_dir),
                      {"last_epoch": hi, "num_partitions": num_partitions})
    return {"applied_files": len(new_files),
            "last_epoch": hi,
            "live_rows": int(sum(r["live"] for r in summary))}


def read_replica(replica_dir: str) -> rd.Dataset:
    """The maintained replica as a streaming Dataset (live rows only —
    internal tombstones filtered)."""
    import pyarrow.compute as _pc

    files = sorted(
        os.path.join(replica_dir, d, "state.parquet")
        for d in os.listdir(replica_dir)
        if d.startswith("part-")
        and os.path.exists(os.path.join(replica_dir, d, "state.parquet"))
    )
    if not files:
        return rd.from_arrow(pa.table({"conv_id": pa.array([], pa.string())}))

    def drop_tombstones(t: pa.Table) -> pa.Table:
        return t.filter(_pc.not_equal(t.column("op"), "D"))

    return rd.read_parquet(files).map_batches(
        drop_tombstones, batch_format="pyarrow")


def read_dlq(lake_dir: str, epoch: int | None = None) -> pa.Table:
    """The dead-letter quarantine (``EngineConfig.dead_letter``): the
    malformed events the replay diverted instead of applying — original
    bytes, pre-evolution, grouped per epoch for targeted repair.  Small
    by construction (a healthy producer quarantines ~nothing), so one
    driver-side concat; ``epoch`` narrows to one epoch's rows."""
    import glob as _glob

    import pyarrow.parquet as _pq

    pat = (f"e{epoch:05d}" if epoch is not None else "e*")
    files = sorted(_glob.glob(
        os.path.join(lake_dir, "dlq", pat, "part-*.parquet")))
    if not files:
        return pa.table({"seq": pa.array([], pa.int64())})
    return pa.concat_tables([_pq.read_table(f) for f in files],
                            promote_options="permissive")


class DlqRequeueError(ValueError):
    """Requeued rows are still malformed after ``fix_fn`` — refusing to
    publish an epoch the replay would immediately re-quarantine (or,
    without dead-letter mode, refuse)."""


def requeue_dlq(lake_dir: str, changelog_dir: str, fix_fn=None,
                lease_owner: str | None = None) -> dict:
    """Close the poison-message loop: repair the quarantined rows
    (``fix_fn: pa.Table -> pa.Table`` — operator-supplied; identity when
    the rows were fixed on disk) and republish them as a PROPER epoch
    appended to the changelog, with fresh dense seqs chaining from the
    log's high-water mark — so check-log still passes and the ordinary
    replay/tail applies them exactly-once through the standard path.

    SINGLE-WRITER: the published epoch number and seq range come from the
    log's current tail, so requeue must not race a live producer. It
    takes the lake's writer lease (``rayrep.lease``) for the duration —
    a live leased writer makes it fail fast with ``LeaseHeldError`` — and
    re-verifies the tail epoch is unchanged immediately before the atomic
    rename, refusing (``DlqRequeueError``) if a non-leased producer
    appended concurrently. Run it only while the producer is quiesced.

    Crash ordering is state-idempotent: the epoch publishes atomically
    FIRST (stage + rename), then the consumed dlq part files move to
    ``dlq/_requeued/e{epoch}/``.  A crash between the two leaves the rows
    both in the log and in the active dlq; re-running requeue publishes
    them again under NEW seqs — the duplicate rows carry identical
    (ts, payload), so LWW converges to the same state (counters differ,
    the table cannot).
    """
    import glob as _glob

    from rayrep.lease import acquire as _acquire_lease

    files = sorted(_glob.glob(
        os.path.join(lake_dir, "dlq", "e*", "part-*.parquet")))
    if not files:
        return {"requeued": 0, "epoch": None}
    _wl = _acquire_lease(lake_dir, owner=lease_owner or "dlq-requeue",
                         ttl_s=60.0)
    try:
        return _requeue_dlq_locked(lake_dir, changelog_dir, fix_fn, files)
    finally:
        _wl.release()


def _requeue_dlq_locked(lake_dir: str, changelog_dir: str, fix_fn,
                        files: list) -> dict:
    import glob as _glob
    import shutil as _shutil

    import numpy as np
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    from rayrep.logcompact import _file_footer_stats, span_meta
    from rayrep.pipeline import discover_epochs

    t = pa.concat_tables([_pq.read_table(f) for f in files],
                         promote_options="permissive")
    if fix_fn is not None:
        t = fix_fn(t)
    bad = _pc.is_null(t.column("conv_id"))
    for col in ("turn_idx", "ts"):
        bad = _pc.or_(bad, _pc.is_null(t.column(col)))
    n_bad = _pc.sum(bad).as_py() or 0
    if n_bad:
        raise DlqRequeueError(
            f"{n_bad} of {t.num_rows} quarantined row(s) still carry a "
            "null conv_id/turn_idx/ts after fix_fn — repair them or drop "
            "them from the dlq before requeueing")

    eps = discover_epochs(changelog_dir)
    if not eps:
        raise FileNotFoundError(f"no epochs in {changelog_dir}")
    last_e, last_p = eps[-1]
    sm = span_meta(last_p)
    if sm is not None and sm.get("seq_hwm") is not None:
        hwm = int(sm["seq_hwm"])
    else:
        st = _file_footer_stats(
            [last_p] if last_p.endswith(".parquet") else sorted(
                _glob.glob(os.path.join(last_p, "*.parquet"))))
        if st["seq_hi"] is None:
            raise DlqRequeueError(
                f"cannot determine the log's seq high-water mark from "
                f"{last_p} (no seq statistics)")
        hwm = int(st["seq_hi"])
    n = t.num_rows
    seqs = pa.array(np.arange(hwm + 1, hwm + 1 + n, dtype=np.int64))
    t = t.set_column(t.column_names.index("seq"), "seq", seqs)

    new_epoch = last_e + 1
    stage = os.path.join(changelog_dir, f"._requeue-{new_epoch:05d}.tmp")
    if os.path.isdir(stage):
        _shutil.rmtree(stage)
    os.makedirs(stage)
    _pq.write_table(t, os.path.join(stage, "part-00000.parquet"))
    # the lease fences leased writers; this re-check catches a NON-leased
    # producer that appended while we staged — publishing anyway would
    # mint an overlapping epoch/seq range and break check-log's dense-seq
    # contract, so refuse and let the operator re-run after quiescing
    cur_eps = discover_epochs(changelog_dir)
    if not cur_eps or cur_eps[-1][0] != last_e:
        _shutil.rmtree(stage, ignore_errors=True)
        raise DlqRequeueError(
            f"changelog tail advanced during requeue (epoch {last_e} -> "
            f"{cur_eps[-1][0] if cur_eps else '<none>'}); a producer is "
            "appending concurrently — quiesce it and re-run")
    target = os.path.join(changelog_dir, f"epoch-{new_epoch:05d}")
    os.replace(stage, target)

    done = os.path.join(lake_dir, "dlq", "_requeued", f"e{new_epoch:05d}")
    os.makedirs(done, exist_ok=True)
    for i, f in enumerate(files):
        os.replace(f, os.path.join(done, f"{i:04d}-" + os.path.basename(f)))
    # drop now-empty active epoch dirs (cosmetic)
    for d in _glob.glob(os.path.join(lake_dir, "dlq", "e*")):
        if os.path.isdir(d) and not os.listdir(d):
            os.rmdir(d)
    return {"requeued": n, "epoch": new_epoch,
            "seq_range": [int(hwm + 1), int(hwm + n)]}
