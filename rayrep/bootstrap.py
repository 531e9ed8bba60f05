"""Initial-snapshot bootstrap (S2) — the binlog-flusher analog.

The reference copies every existing row through a blackhole-engine twin so
the full table contents land *in the binlog* as inserts, making the
snapshot a log prefix (/root/reference/README.md:14-15); failed operations
are retried and table-name mappings are recorded to a local file for
recovery (CHANGES.txt:25-27,32-36). We reproduce the elegant
"snapshot = log prefix" trick directly: a base transcript table is turned
into ``op='I'`` changelog events whose ``seq`` values all precede the tail.

Seq assignment is distributed: snapshot events don't need *dense* seqs,
only unique seqs strictly below the tail's first seq (each key appears
once, so intra-snapshot order is irrelevant). A tiny ``SeqAllocator``
actor hands out non-overlapping ranges per batch — one RPC per batch, no
global sort, no driver loop.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data as rd

from rayrep.schema import CHANGELOG_SCHEMA


@ray.remote(num_cpus=0)
class SeqAllocator:
    """Atomic fetch-add range allocator (the recovery-file analog: its final
    value is recorded in the bootstrap manifest so the tail knows where to
    start)."""

    def __init__(self, start: int = 0):
        self.next = start

    def allocate(self, n: int) -> int:
        s = self.next
        self.next += n
        return s

    def total(self) -> int:
        return self.next


class _ToInsertEvents:
    def __init__(self, allocator, schema_ver: int, ts_us: int | None,
                 payload_json: str | None = None):
        self.allocator = allocator
        self.schema_ver = schema_ver
        self.ts_us = ts_us
        # optional custom payload schema (SchemaVersion JSON): the snapshot
        # becomes a changelog prefix under THAT table's layout instead of
        # the default transcript schema
        self.payload_json = payload_json

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc  # noqa: F401

        n = batch.num_rows
        start = ray.get(self.allocator.allocate.remote(n))
        seq = pa.array(range(start, start + n), pa.int64())
        ts = batch.column("ts") if "ts" in batch.column_names else pa.array(
            [self.ts_us] * n, pa.timestamp("us")
        )
        cols = {
            "seq": seq,
            "txn_id": pa.array([0] * n, pa.int64()),
            "op": pa.array(["I"] * n),
            "schema_ver": pa.array([self.schema_ver] * n, pa.int32()),
        }
        if self.payload_json is not None:
            from rayrep.schema import SchemaVersion

            sv = SchemaVersion.from_json(self.payload_json)
            for f in sv.schema:
                if f.name == "ts":
                    continue
                cols[f.name] = (
                    batch.column(f.name).cast(f.type)
                    if f.name in batch.column_names
                    else pa.nulls(n, f.type)
                )
            cols["ts"] = ts.cast(pa.timestamp("us"))
            cols["ddl"] = pa.nulls(n, pa.string())
            return pa.table(cols)
        cols.update({
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx").cast(pa.int32()),
            "role": batch.column("role"),
            "text": batch.column("text"),
            "tool": batch.column("tool")
            if "tool" in batch.column_names
            else pa.nulls(n, pa.string()),
            "ts": ts.cast(pa.timestamp("us")),
            "ddl": pa.nulls(n, pa.string()),
        })
        return pa.table(cols, schema=CHANGELOG_SCHEMA)


def bootstrap_snapshot(
    base_table: rd.Dataset,
    changelog_dir: str,
    schema_ver: int = 1,
    ts_us: int | None = None,
    epoch: int = 0,
    payload_json: str | None = None,
) -> dict:
    """Write the snapshot prefix as changelog epoch ``epoch`` and a manifest
    recording the next free seq (tail events must start at/after it).
    ``payload_json`` (a ``SchemaVersion`` JSON) bootstraps a table with a
    custom payload layout instead of the default transcript schema."""
    allocator = SeqAllocator.remote(0)
    ds = base_table.map_batches(
        _ToInsertEvents,
        fn_constructor_kwargs={
            "allocator": allocator,
            "schema_ver": schema_ver,
            "ts_us": ts_us,
            "payload_json": payload_json,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 4),
    )
    os.makedirs(changelog_dir, exist_ok=True)
    # distributed write: each worker writes its own part files into a temp
    # dir, then ONE atomic rename publishes the epoch (same protocol as
    # gen.publish_epoch) — nothing snapshot-sized ever touches the driver
    out = os.path.join(changelog_dir, f"epoch-{epoch:05d}")
    # idempotent retry: sweep stale temp dirs from crashed runs, and remove
    # a pre-existing published epoch before the rename (os.replace onto a
    # non-empty directory raises OSError, which would make a repeated
    # bootstrap non-idempotent)
    import glob as _glob
    import shutil

    for stale in _glob.glob(out + ".tmp*"):
        shutil.rmtree(stale, ignore_errors=True)
    tmp = out + f".tmp{os.getpid()}"
    ds.write_parquet(tmp)
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.replace(tmp, out)
    rows = sum(
        pq.read_metadata(os.path.join(out, f)).num_rows
        for f in os.listdir(out)
        if f.endswith(".parquet")
    )
    manifest = {"rows": rows, "next_seq": ray.get(allocator.total.remote())}
    with open(os.path.join(changelog_dir, "_bootstrap_manifest.json"), "w") as f:
        json.dump(manifest, f)
    return manifest
