"""Multi-table replay: one changelog, one read, ONE shuffle, N lakes.

The reference replicates a whole MySQL schema — every table's changes
arrive interleaved in the same binlog, and the applier maintains one
HBase table per MySQL table (README.md:14-16; the augmenter resolves
each event against ITS table's active schema, CHANGES.txt:87).  Running
``replay()`` once per table would re-read the 10^10-event log T times;
the scale-correct shape reads it once and still shuffles once.

The trick that makes one exchange carry heterogeneous schemas is the
packed exchange (rayrep/exchange.py): rows travel as schema-agnostic
Arrow-IPC blobs keyed only by ``part_id``.  Give table i the composite
id range ``[i*P, (i+1)*P)`` and the single ``groupby("part_id")``
routes every table's keys to per-(table, partition) applier groups:

    read_parquet(epoch)                         # ONE pass over the log
      → map_batches(_mt_augment_pack)           # split by table, conform
                                                #   each to ITS schema,
                                                #   stamp composite pid,
                                                #   pack to IPC blobs
      → groupby("part_id")                      # STILL one all-to-all
      → map_groups(_mt_applier)                 # unpack, restore local
                                                #   pid, delegate to the
                                                #   table's Applier
      → per-table counter invariant + barrier   # N EpochManifests

Every per-table lake is a completely ordinary single-table lake —
``final_table``, resume, fsck, compaction, time-travel and diff all work
on it unchanged; partition manifests give per-(table, partition)
idempotence, so a killed multi-table replay resumes exactly like a
single-table one.

v1 scope (documented, enforced): full-row LWW, no changed-cells / no
dedup-ingest / no map-side combine / no delta side output; events for
table names absent from ``tables`` are dropped (the M7 table filter's
semantics).  DDL rows must carry a ``table`` column to route to the
right registry.
"""

from __future__ import annotations

import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from rayrep.apply import Applier
from rayrep.augment import Augmenter
from rayrep.manifests import (
    COUNTER_KEYS,
    EpochManifest,
    LakeMeta,
    atomic_write_json,
    merge_counters,
    zero_counters,
)
from rayrep.pipeline import aggregate_partition_counters, discover_epochs
from rayrep.registry import SchemaRegistry

_MT_AUG_CACHE: dict = {}
_MT_APPLIER_CACHE: dict = {}


def _ddl_events_by_table(path: str) -> dict[str, list[tuple[int, str]]]:
    """Driver-side scan of one epoch for DDL rows, routed by the ``table``
    column — metadata-pruned via ``pipeline.ddl_rows_table`` (footer-only
    when the epoch's ``ddl`` null_count stats prove no DDL rows exist)."""
    from rayrep.pipeline import ddl_rows_table

    tbl = ddl_rows_table(path, ["seq", "ddl", "table"])
    out: dict[str, list[tuple[int, str]]] = {}
    if tbl is None:
        return out
    for s, d, t in zip(tbl["seq"].to_pylist(), tbl["ddl"].to_pylist(),
                       tbl["table"].to_pylist()):
        out.setdefault(t, []).append((s, d))
    return out


def _mt_augment_pack_fn(batch: pa.Table, kwargs: dict) -> pa.Table:
    """Split one raw batch by table, conform each slice with ITS table's
    cached Augmenter, offset part_id into the table's composite range,
    and pack each slice to IPC blobs — so the downstream sort shuffle
    sees ONE homogeneous (part_id, n_rows, blob) schema regardless of
    how many payload schemas ride inside."""
    from rayrep.exchange import PACKED_SCHEMA, pack_batch

    specs: dict = kwargs["specs"]  # name -> {"idx": int, "schema_json": str}
    P: int = kwargs["num_partitions"]
    codec: str = kwargs["codec"]
    if "table" not in batch.column_names:
        raise ValueError(
            "multi-table replay requires a 'table' column in the "
            "changelog (which table does each event belong to?)")
    tcol = batch.column("table")
    outs = []
    for name, sp in specs.items():
        sub = batch.filter(pc.equal(tcol, name))
        if sub.num_rows == 0:
            continue
        akey = (sp["schema_json"], P)
        aug = _MT_AUG_CACHE.get(akey)
        if aug is None:
            aug = Augmenter(target_schema_json=sp["schema_json"],
                            num_partitions=P)
            _MT_AUG_CACHE[akey] = aug
        a = aug(sub.drop_columns(["table"]))
        if a.num_rows == 0:
            continue
        i = a.schema.get_field_index("part_id")
        comp = pc.add(a.column(i).cast(pa.int64()),
                      pa.scalar(sp["idx"] * P, pa.int64()))
        a = a.set_column(i, "part_id", comp.cast(pa.int32()))
        outs.append(pack_batch(a, codec))
    if not outs:
        return PACKED_SCHEMA.empty_table()
    return pa.concat_tables(outs)


def _mt_applier_task_fn(group: pa.Table, kwargs: dict) -> pa.Table:
    """One (table, partition) group: unpack the blobs, restore the local
    partition id the table's manifests are keyed by, and delegate to a
    process-cached Applier bound to that table's lake."""
    from rayrep.exchange import unpack_group

    P: int = kwargs["num_partitions"]
    by_idx: list = kwargs["by_idx"]  # idx -> (name, lake_dir, schema_json)
    epoch: int = kwargs["epoch"]
    comp = int(group.column("part_id")[0].as_py())
    idx, local = comp // P, comp % P
    name, lake_dir, schema_json = by_idx[idx]
    g = unpack_group(group)
    j = g.schema.get_field_index("part_id")
    g = g.set_column(
        j, "part_id",
        pa.array(np.full(g.num_rows, local, dtype=np.int32)))
    akey = (lake_dir, epoch, schema_json)
    app = _MT_APPLIER_CACHE.get(akey)
    if app is None:
        if _MT_APPLIER_CACHE and next(
                iter(_MT_APPLIER_CACHE))[1] != epoch:
            # one epoch in flight at a time: drop stale epochs only —
            # within an epoch every table keeps its own cached Applier
            _MT_APPLIER_CACHE.clear()
        app = Applier(lake_dir=lake_dir, epoch=epoch,
                      target_schema_json=schema_json, delta_output=False)
        _MT_APPLIER_CACHE[akey] = app
    out = app(g)
    return out.append_column("table", pa.array([name] * out.num_rows))


def replay_multi(
    changelog_dir: str,
    tables: dict[str, dict],
    num_partitions: int = 32,
    end_epoch: int | None = None,
    pack_codec: str = "lz4",
    batch_size: int = 65536,
) -> dict:
    """Replay one interleaved multi-table changelog into one lake per
    table.  ``tables`` maps table name → ``{"lake_dir": str,
    "schema_json": str}`` (initial schema; later DDL rows routed by their
    ``table`` column evolve each registry independently).  Returns
    ``{"totals": {table: counters}, "epochs": [...]}``.

    Resume contract: identical to ``replay()`` — the run restarts from
    the LOWEST committed barrier across the table lakes, and partitions
    (per table) that already committed an epoch skip it idempotently via
    their own manifests, so a crash between two tables' barrier writes
    re-applies only the genuinely uncommitted groups."""
    epochs = discover_epochs(changelog_dir)
    if not epochs:
        raise FileNotFoundError(f"no epoch-* under {changelog_dir}")
    names = sorted(tables)  # deterministic composite index assignment
    registries: dict[str, SchemaRegistry] = {}
    for name in names:
        lake = tables[name]["lake_dir"]
        os.makedirs(lake, exist_ok=True)
        lm = LakeMeta.load(lake)
        if lm is None:
            lm = LakeMeta(num_partitions=num_partitions)
        elif lm.num_partitions != num_partitions:
            raise ValueError(
                f"lake {lake} pinned num_partitions={lm.num_partitions}; "
                f"resuming with {num_partitions} would duplicate state")
        lm.save(lake)
        registries[name] = SchemaRegistry(
            persist_dir=lake, initial_json=tables[name]["schema_json"])

    start = 1 + min(
        EpochManifest.load(tables[n]["lake_dir"]).last_epoch for n in names)
    per_epoch = []
    for e, path in epochs:
        if e < start or (end_epoch is not None and e > end_epoch):
            continue
        t0 = time.perf_counter()
        ddl = _ddl_events_by_table(path)
        for name, evs in ddl.items():
            if name in registries:
                registries[name].apply_ddl_events(evs)
        specs = {
            name: {"idx": i, "schema_json": registries[name].current_json()}
            for i, name in enumerate(names)
        }
        by_idx = [
            (name, tables[name]["lake_dir"], specs[name]["schema_json"])
            for name in names
        ]
        summaries = (
            rd.read_parquet(path)
            .map_batches(_mt_augment_pack_fn,
                         fn_kwargs={"kwargs": {
                             "specs": specs,
                             "num_partitions": num_partitions,
                             "codec": pack_codec}},
                         batch_format="pyarrow", zero_copy_batch=True,
                         batch_size=batch_size)
            .groupby("part_id")
            .map_groups(_mt_applier_task_fn,
                        fn_kwargs={"kwargs": {
                            "num_partitions": num_partitions,
                            "by_idx": by_idx, "epoch": e}},
                        batch_format="pyarrow", num_cpus=1)
            .take_all()  # tiny: one row per touched (table, partition)
        )
        entry = {"epoch": e, "wall_s": round(time.perf_counter() - t0, 4)}
        totals = {}
        for name in names:
            ctr = zero_counters()
            for row in summaries:
                if row["table"] == name and not row["already_committed"]:
                    ctr = merge_counters(
                        ctr, {k: row[k] for k in COUNTER_KEYS})
            # A3 barrier invariant, per table — refuse a checkpoint whose
            # counters don't reconcile (real raise, python -O safe)
            if ctr["applied"] + ctr["skipped"] + ctr["conflict"] \
                    != ctr["input_rows"]:
                raise RuntimeError(
                    f"epoch {e} table {name}: counter invariant: {ctr}")
            lake = tables[name]["lake_dir"]
            totals[name] = aggregate_partition_counters(lake)
            # never REGRESS a table's barrier: on resume-from-min a table
            # whose barrier is already ahead only re-acks older epochs
            if e > EpochManifest.load(lake).last_epoch:
                EpochManifest(last_epoch=e, totals=totals[name],
                              num_partitions=num_partitions).save(lake)
            entry[name] = ctr
        per_epoch.append(entry)

    result = {"epochs": per_epoch,
              "totals": {n: aggregate_partition_counters(
                  tables[n]["lake_dir"]) for n in names}}
    for name in names:
        atomic_write_json(
            os.path.join(tables[name]["lake_dir"], "_manifests",
                         "metrics.json"),
            {"totals": result["totals"][name],
             "epochs": [{k: v for k, v in ent.items()
                         if k in ("epoch", "wall_s", name)}
                        for ent in per_epoch],
             "schema_version": registries[name].current_version()})
    return result
