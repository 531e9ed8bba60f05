"""Staged (filesystem) exchange — an alternative to the in-memory sort
shuffle for the hash partition step.

Measured motivation (BENCH/BASELINE.md): the applier stage scales with
CPUs (32 parallel partition tasks), but Ray's sort-based groupby exchange
does not on one box — its merge path is bandwidth-bound. This exchange
routes rows through the shared filesystem instead:

  stage A (map, parallel):  augment task splits each batch by part_id and
      writes `stage/e{epoch}/p{pid}/s{min_seq}-{max_seq}.parquet`
      (deterministic names → a retried batch overwrites, never appends);
      nothing but a tiny summary flows through the object store.
  stage B (map, parallel):  one task per partition reads its directory and
      runs the normal Applier. Duplicate rows from re-tried overlapping
      batches are deduplicated by `seq` (counted as `skipped`, the same
      at-least-once semantics as re-delivered events).

On a multi-node cluster "the shared filesystem" is the object store /
S3 / HDFS the lake already lives on — the same durability assumption the
manifests make. This is the classic map-side shuffle-file design; it
keeps the `groupby` semantics (all rows of a key in one task) without an
all-to-all through plasma.

Select with ``EngineConfig.exchange="staged"`` (default remains
``"groupby"``, the Ray-native sort shuffle).
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from rayrep.apply import Applier


def stage_dir(lake_dir: str, epoch: int) -> str:
    return os.path.join(lake_dir, "_stage", f"e{epoch:05d}")


def write_staged(batch: pa.Table, sdir: str) -> pa.Table:
    """Stage-A kernel: split one augmented batch by part_id and write one
    deterministic file per (partition, batch-seq-range)."""
    pids = batch.column("part_id").to_numpy()
    seqs = batch.column("seq").to_numpy()
    order = np.argsort(pids, kind="stable")
    sorted_pids = pids[order]
    bounds = np.flatnonzero(np.r_[True, sorted_pids[1:] != sorted_pids[:-1]])
    bounds = np.r_[bounds, len(sorted_pids)]
    idx = pa.array(order)
    sorted_tbl = batch.take(idx)
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        pid = int(sorted_pids[lo])
        part = sorted_tbl.slice(lo, hi - lo)
        s = part.column("seq").to_numpy()
        pdir = os.path.join(sdir, f"p{pid:05d}")
        os.makedirs(pdir, exist_ok=True)
        name = f"s{int(s.min())}-{int(s.max())}-{len(s)}.parquet"
        # "_"-prefixed tmp: pyarrow dataset discovery ignores it, so a
        # crashed writer's orphan never corrupts StagedApplier's read
        tmp = os.path.join(pdir, f"_tmp{os.getpid()}-" + name)
        pq.write_table(part, tmp)
        os.replace(tmp, os.path.join(pdir, name))
    return pa.table({"rows": pa.array([batch.num_rows], pa.int64())})


def staged_partitions(sdir: str) -> list[int]:
    return sorted(
        int(os.path.basename(p)[1:]) for p in glob.glob(os.path.join(sdir, "p*"))
    )


class StagedApplier:
    """Stage-B kernel: a Dataset of partition ids; each call reads the
    partition's staged files, dedups by seq (overlap-safe), and runs the
    standard Applier. Data-plane bytes go disk→worker, never through a
    sort."""

    def __init__(self, sdir: str, applier_kwargs: dict):
        self.sdir = sdir
        self.applier = Applier(**applier_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for pid in batch.column("pid").to_pylist():
            pdir = os.path.join(self.sdir, f"p{pid:05d}")
            tbl = pq.read_table(pdir)
            seqs = tbl.column("seq").to_numpy()
            order = np.argsort(seqs, kind="stable")
            dup = np.zeros(len(order), dtype=bool)
            if len(order) > 1:
                s = seqs[order]
                dup[1:] = s[1:] == s[:-1]
            keep = order[~dup]
            tbl = tbl.take(pa.array(keep))
            outs.append(self.applier(tbl))
        return pa.concat_tables(outs)


def run_staged_exchange(
    augmented: rd.Dataset, lake_dir: str, epoch: int, applier_kwargs: dict
) -> list[dict]:
    """Execute both stages; returns the applier summary rows (one per
    touched partition). Cleans the staging dir after the epoch commits."""
    sdir = stage_dir(lake_dir, epoch)
    os.makedirs(sdir, exist_ok=True)
    augmented.map_batches(
        write_staged, fn_kwargs={"sdir": sdir}, batch_format="pyarrow",
        zero_copy_batch=True,
    ).sum("rows")  # barrier: all staged files visible

    pids = staged_partitions(sdir)
    if not pids:
        return []
    summaries = (
        rd.from_items([{"pid": p} for p in pids])
        .map_batches(
            StagedApplier,
            fn_constructor_kwargs={"sdir": sdir, "applier_kwargs": applier_kwargs},
            batch_size=1,
            batch_format="pyarrow",
            concurrency=(1, max(2, len(pids))),
            num_cpus=1,
        )
        .take_all()
    )
    shutil.rmtree(sdir, ignore_errors=True)
    return summaries
