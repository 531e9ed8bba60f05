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
