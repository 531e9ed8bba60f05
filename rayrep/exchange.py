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


# ------------------------------------------------------- packed exchange
# The sort shuffle's cost on a fixed memory-bandwidth budget is per-row
# gather + raw bytes moved (BENCH/BASELINE.md per-stage breakdown: the
# sort is ~55% of replay wall at 32 cpus). Packing turns the exchange
# into ~P fat rows per map batch: one compressed Arrow-IPC blob per
# destination partition. The sort then samples/sorts thousands of rows
# instead of millions, and the all-to-all moves LZ4-compressed bytes.
# The row gather still happens exactly once (here, map-side, vectorized);
# the reducer's unpack is a zero-copy IPC read + concat.

PACKED_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("n_rows", pa.int64()),
        pa.field("blob", pa.large_binary()),
    ]
)


def pack_batch(batch: pa.Table, codec: str = "lz4") -> pa.Table:
    """Pack one (augmented or combined) batch into one compressed IPC blob
    per destination partition. Schema-agnostic: whatever columns arrive
    (payload, combine meta, evolved columns) ride inside the blob."""
    if batch.num_rows == 0:
        return PACKED_SCHEMA.empty_table()
    pids = batch.column("part_id").to_numpy()
    if len(pids) < 2 or np.all(pids[1:] >= pids[:-1]):
        # combine_batch emits part_id-contiguous rows (its lexsort keys
        # part_id outermost) — slice directly, no second full gather
        sp, sorted_tbl = pids, batch
    else:
        order = np.argsort(pids, kind="stable")
        sp = pids[order]
        sorted_tbl = batch.take(pa.array(order))
    bounds = np.flatnonzero(np.r_[True, sp[1:] != sp[:-1]])
    bounds = np.r_[bounds, len(sp)]
    # codec "none": pack without compressing — the sort still moves ~P
    # blobs per batch instead of every row (the dominant single-box win);
    # skipping LZ4 trades exchange bytes back for ALU, the right call when
    # cores, not the bus, are the scarce resource.
    opts = pa.ipc.IpcWriteOptions(
        compression=None if codec in (None, "none") else codec)
    out_pid, out_n, blobs = [], [], []
    for i in range(len(bounds) - 1):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        part = sorted_tbl.slice(lo, hi - lo)
        sink = pa.BufferOutputStream()
        with pa.ipc.new_stream(sink, part.schema, options=opts) as w:
            w.write_table(part)
        out_pid.append(int(sp[lo]))
        out_n.append(hi - lo)
        blobs.append(sink.getvalue().to_pybytes())
    return pa.table(
        {
            "part_id": pa.array(out_pid, pa.int32()),
            "n_rows": pa.array(out_n, pa.int64()),
            "blob": pa.array(blobs, pa.large_binary()),
        }
    )


def unpack_group(group: pa.Table) -> pa.Table:
    """Reassemble one partition's event table from its packed blobs.
    Blob order within the group is arbitrary — the applier orders by seq."""
    col = group.column("blob")
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    tables = []
    for chunk in chunks:
        for i in range(len(chunk)):
            tables.append(pa.ipc.open_stream(chunk[i].as_buffer()).read_all())
    # one contiguous buffer per column: the applier's lexsort/take kernels
    # degrade badly on ~100-chunk columns (per-element chunk resolution)
    return pa.concat_tables(tables).combine_chunks()


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
