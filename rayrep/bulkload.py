"""Bulk load — write a base table DIRECTLY into partition state files.

Reference anchor: the binlog-flusher's whole job is getting an initial
snapshot into the pipeline, and its mutation generator was the CPU
bottleneck until parallelized — "order of magnitude faster"
(/root/reference/CHANGES.txt:97-98, README.md:14-15). HBase's own answer
to the same problem is *bulkload*: write HFiles in the store's native
format and adopt them, skipping the write path entirely. This module is
that analog for the Parquet lake:

    bootstrap_snapshot path:  base → changelog epoch 0 (write) →
                              read → augment → shuffle → LWW apply → state
    bulk_load path:           base → route → shuffle → state

The snapshot rows never round-trip through the changelog (one full write
+ one full read of the snapshot saved) and skip the per-event LWW/
watermark machinery — each key appears once in a snapshot, so "apply"
degenerates to "write sorted". The result is indistinguishable from a
bootstrapped-and-replayed epoch-0 lake: same state-file layout (key-
sorted, version-stamped, `state-e00000-full.parquet`), same manifests
(epoch 0 committed, watermark below every tail seq), same barrier — a
tail changelog (epochs ≥ 1) then resumes on top exactly as after
``bootstrap_snapshot`` + ``replay``.

Seq contract (shared with rayrep/bootstrap.py): snapshot rows take unique
seqs from a fetch-add allocator; ``next_seq`` in the returned manifest is
the floor for every tail event's seq. The per-partition committed
watermark is set to ``next_seq - 1`` (the allocator total is final once
the exchange barrier has passed), so any tail event applies and any
replayed snapshot duplicate skips.

Crash safety: state files commit tmp+rename with deterministic names and
each partition manifest commits atomically AFTER its state file — the
same per-partition idempotence as the Applier (a re-run skips partitions
whose manifest already committed epoch 0). The global barrier
(EpochManifest) is written last, by the driver, once every partition
summary reconciles; a re-run after ANY crash is safe *for the same base
table* — loading a DIFFERENT table into a half-loaded lake is refused by
the freshness check (the barrier exists ⇒ not fresh).

Scale shape: ONE hash exchange (the same `part_id` shuffle as replay);
routing + casting are vectorized map_batches; each partition writes one
sorted run. Nothing corpus-sized touches the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from rayrep.config import EngineConfig
from rayrep.manifests import (
    EpochManifest,
    LakeMeta,
    PartitionManifest,
    atomic_write_json,
    zero_counters,
)


class BulkLoadError(RuntimeError):
    """Bulk load refused: the lake already has a committed barrier (bulk
    load is a FRESH-lake operation — resume/append goes through the
    changelog + ``replay``), or the config asks for semantics bulk load
    does not produce (changed-cells / dedup-on-ingest lakes carry state
    invariants only the replay path establishes)."""


def _route_and_stamp(batch: pa.Table, *, allocator, payload_json: str,
                     num_partitions: int, salt_turn_keys: bool,
                     ts_us: int | None) -> pa.Table:
    """Task-based map stage (NOT an actor pool: bulk load already runs a
    writer actor pool, and two fully-reserved pools starve the shuffle's
    reduce tasks of CPUs — measured 39 s → 17 s at 10M rows / 32 cpus):
    cast the base table to the payload schema, stamp ``part_id`` (the
    SAME pinned routing hash as replay — LakeMeta pins these params) and
    allocate ``__seq`` ranges."""
    from rayrep.hashing import partition_ids, partition_ids_salted
    from rayrep.schema import SchemaVersion

    sv = SchemaVersion.from_json(payload_json)  # tiny json, per-batch ok
    n = batch.num_rows
    cols: dict[str, pa.ChunkedArray | pa.Array] = {}
    for f in sv.schema:
        if f.name == "ts" and "ts" not in batch.column_names:
            if ts_us is None:
                raise BulkLoadError(
                    "base table has no `ts` column and no ts_us default "
                    "was given — every state row needs an LWW version"
                )
            cols["ts"] = pa.array([ts_us] * n, pa.timestamp("us"))
            continue
        if f.name not in batch.column_names:
            cols[f.name] = pa.nulls(n, f.type)
        else:
            cols[f.name] = batch.column(f.name).cast(f.type)
    turn = cols["turn_idx"]
    if turn.null_count:
        raise BulkLoadError("null turn_idx in base table (routing key)")
    if salt_turn_keys:
        pid = partition_ids_salted(
            cols["conv_id"],
            turn.to_numpy(zero_copy_only=False).astype(np.int64),
            num_partitions,
        )
    else:
        pid = partition_ids(cols["conv_id"], num_partitions)
    start = ray.get(allocator.allocate.remote(n))
    out = pa.table(cols)
    out = out.append_column("__seq", pa.array(np.arange(start, start + n)))
    out = out.append_column("__deleted", pa.array(np.zeros(n, bool)))
    return out.append_column("part_id", pa.array(pid))


class _PartitionWriter:
    """map_groups stage: one partition's rows → LWW-resolve in-snapshot
    key duplicates → key-sort → write the epoch-0 full state file →
    commit the partition manifest. Idempotent per partition."""

    def __init__(self, lake_dir: str, payload_json: str, allocator,
                 durable: bool):
        from rayrep.schema import SchemaVersion

        self.lake_dir = lake_dir
        self.sv = SchemaVersion.from_json(payload_json)
        self.allocator = allocator
        self.durable = durable

    def __call__(self, group: pa.Table) -> pa.Table:
        from rayrep.apply import (
            SUMMARY_SCHEMA,
            lww_last_rows,
            state_dir,
            write_parquet_atomic,
        )
        from rayrep.schema import stamp_version

        part_id = int(group.column("part_id")[0].as_py())
        manifest = PartitionManifest.load(self.lake_dir, part_id)
        if manifest.epoch >= 0:
            # re-run after a crash: this partition already committed.
            c = manifest.epoch_counters
            return pa.table(
                {
                    "part_id": [part_id], "epoch": [0],
                    **{k: [c.get(k, 0)] for k in
                       ("input_rows", "applied", "skipped", "conflict", "deleted")},
                    "live_rows": [manifest.live_rows],
                    "max_ts_us": [manifest.max_ts_us],
                    "already_committed": [True], "chaos_retries": [0],
                },
                schema=SUMMARY_SCHEMA,
            )
        n_in = group.num_rows
        state = group.drop_columns(["part_id"])
        # a base table is normally key-unique; if not, resolve duplicates
        # with the SAME rule as replay (argmax (ts, __seq) per key) and
        # count the losers as `conflict` — never write two rows per key.
        state = lww_last_rows(state)
        conflict = n_in - state.num_rows
        # key-sorted state: row-group min/max stats prune point lookups
        # (same convention as compact_lake's default output)
        state = state.take(
            pc.sort_indices(
                state, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
            )
        )
        rel = os.path.join(f"part-{part_id:05d}", "state-e00000-full.parquet")
        out = os.path.join(self.lake_dir, rel)
        os.makedirs(state_dir(self.lake_dir, part_id), exist_ok=True)
        write_parquet_atomic(
            stamp_version(state, self.sv.version), out, durable=self.durable
        )
        max_ts = pc.max(state.column("ts")).cast(pa.int64()).as_py() or 0
        # the exchange is a barrier: every allocate() has happened, so the
        # allocator total is final — the watermark covers every snapshot seq
        next_seq = ray.get(self.allocator.total.remote())
        counters = {
            "input_rows": n_in, "applied": state.num_rows,
            "skipped": 0, "conflict": conflict, "deleted": 0,
        }
        manifest.epoch = 0
        manifest.last_seq = next_seq - 1
        manifest.state_chain = [rel]
        manifest.live_rows = state.num_rows
        manifest.counters = dict(counters)
        manifest.epoch_counters = dict(counters)
        manifest.max_ts_us = int(max_ts)
        manifest.save(self.lake_dir)
        return pa.table(
            {
                "part_id": [part_id], "epoch": [0],
                **{k: [counters[k]] for k in
                   ("input_rows", "applied", "skipped", "conflict", "deleted")},
                "live_rows": [state.num_rows], "max_ts_us": [int(max_ts)],
                "already_committed": [False], "chaos_retries": [0],
            },
            schema=SUMMARY_SCHEMA,
        )


def bulk_load(
    cfg: EngineConfig,
    base: rd.Dataset,
    payload_json: str | None = None,
    ts_us: int | None = None,
) -> dict:
    """Load ``base`` into a FRESH lake as committed epoch 0. Tail epochs
    (numbered ≥ 1, seq ≥ the returned ``next_seq``) then resume via
    ``replay(cfg)`` exactly as after a bootstrap-and-replay.

    Returns ``{"rows", "applied", "conflict", "next_seq", "partitions"}``.
    """
    from rayrep.bootstrap import SeqAllocator
    from rayrep.schema import CANONICAL_SCHEMA_V1, SchemaVersion

    if cfg.changed_cells_updates or cfg.dedup_ingest:
        raise BulkLoadError(
            "bulk_load writes plain row-LWW state; changed-cells and "
            "dedup-on-ingest lakes must bootstrap through replay"
        )
    em = EpochManifest.load(cfg.lake_dir)
    if em.last_epoch >= 0:
        raise BulkLoadError(
            f"lake {cfg.lake_dir} already committed through epoch "
            f"{em.last_epoch}; bulk_load only initializes a fresh lake — "
            "append new events through the changelog + replay"
        )
    payload_json = payload_json or (
        cfg.initial_schema_json or SchemaVersion(1, CANONICAL_SCHEMA_V1).to_json()
    )
    os.makedirs(cfg.lake_dir, exist_ok=True)
    # pin routing/semantics BEFORE any partition commit (same order as
    # replay) and persist the base schema version for later readers
    from rayrep.registry import SchemaRegistry

    SchemaRegistry(persist_dir=cfg.lake_dir, initial_json=payload_json)
    LakeMeta(
        num_partitions=cfg.num_partitions,
        changed_cells=False,
        per_cell=False,
        salt_turn_keys=cfg.salt_turn_keys,
        dedup_ingest=False,
    ).save(cfg.lake_dir)

    allocator = SeqAllocator.remote(0)
    routed = base.map_batches(
        _route_and_stamp,
        fn_kwargs={
            "allocator": allocator,
            "payload_json": payload_json,
            "num_partitions": cfg.num_partitions,
            "salt_turn_keys": cfg.salt_turn_keys,
            "ts_us": ts_us,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    summaries = (
        routed.groupby("part_id")
        .map_groups(
            _PartitionWriter,
            fn_constructor_kwargs={
                "lake_dir": cfg.lake_dir,
                "payload_json": payload_json,
                "allocator": allocator,
                "durable": cfg.durable_sync,
            },
            batch_format="pyarrow",
            concurrency=(1, cfg.applier_concurrency),
            num_cpus=1,
        )
        .take_all()  # tiny: one row per touched partition
    )
    totals = zero_counters()
    max_ts = 0
    for row in summaries:
        for k in totals:
            totals[k] += row[k]
        max_ts = max(max_ts, row["max_ts_us"])
    if totals["applied"] + totals["skipped"] + totals["conflict"] != totals["input_rows"]:
        raise RuntimeError(f"bulk_load counter invariant violated: {totals}")
    next_seq = int(ray.get(allocator.total.remote()))
    # a re-run (idempotent retry) re-allocates fresh seqs but every
    # committed partition kept its original watermark — harmless: both
    # watermarks sit below next_seq of the NEW run only if the re-run
    # allocated at least as many rows, which a same-base re-run does.
    EpochManifest(
        last_epoch=0,
        totals=totals,
        replication_delay_s=0.0,
        num_partitions=cfg.num_partitions,
    ).save(cfg.lake_dir)
    atomic_write_json(
        os.path.join(cfg.lake_dir, "_manifests", "bulkload.json"),
        {"rows": totals["input_rows"], "next_seq": next_seq},
    )
    return {
        "rows": totals["input_rows"],
        "applied": totals["applied"],
        "conflict": totals["conflict"],
        "next_seq": next_seq,
        "partitions": len(summaries),
    }
