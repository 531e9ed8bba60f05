"""Lake repartitioning: rescale a committed lake to a new partition count.

``num_partitions`` is pinned in ``LakeMeta`` because resuming with a
different count would route keys to fresh partitions and duplicate state
(rayrep/pipeline.py pin check). But a real deployment MUST be able to
rescale — the reference redeploys its applier fleet against the same
store when capacity changes (README.md:17-20: the store, not the worker
count, owns the data); here partition count IS the store layout, so
rescaling is an explicit offline operator between replays.

Scale shape (the part that must survive 100 TB):

- **No all-to-all.** Each key lives in exactly ONE source partition, so
  source partitions hold pairwise-disjoint key sets. One Ray task per
  source partition folds its chain (bounded memory — the incremental
  fold), splits the folded image by the NEW routing stamp, and writes one
  shard per touched destination partition. Destination chains are just
  the union of shards: with disjoint keys, merge-on-read is order-
  independent, so shards need no coordination, no shuffle, no barrier
  beyond "all tasks done before manifests publish".
- **Resumable.** Every shard has a deterministic name
  (``part-NNNNN/repart-SSSSS.parquet``) written via tmp+rename; a crashed
  run re-executes into the same destination and overwrites byte-
  identically. Nothing is visible to readers/resumes until the manifests
  and ``LakeMeta`` publish at the very end (manifest-last, like the
  engine's epoch commit).
- **Continuation-correct.** Destination watermark = max committed seq of
  the source (epochs partition the seq order, and every source partition
  committed the same epoch set — so every event at-or-below it is
  applied, every future event is above it). A subsequent ``replay`` of
  later epochs into the destination converges identically to a fresh
  full replay at the new count (SQL-oracled: ``cdc_repartition``).
- The dedup-ingest **content index** re-buckets by ``ckey % new_P``
  (bucket count == partition count in ``pipeline.replay``); claim files
  merge by min-seq on read, so re-bucketed shards need no dedup pass.

Deliberate contract: the destination's history starts at the
repartition point (chains fold to one image — epoch-level time travel
into the past uses the SOURCE lake or ``timetravel.as_of`` over the
changelog, which is exact at any T). Cumulative per-partition counters
reset to zero (they are not attributable across the new layout); the
lake-level totals move into ``LakeMeta.counters_baseline`` (and the
copied ``EpochManifest``), so ``aggregate_partition_counters`` — and
therefore every subsequent replay's committed totals — stays exact and
monotone across any number of rescales.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest

_SHARD_FMT = "repart-{src:05d}.parquet"


def _repart_one(
    src_lake: str,
    dst_lake: str,
    src_part: int,
    new_p: int,
    target_json: str,
    lm: LakeMeta,
) -> dict:
    """Fold ONE source partition and write its destination shards.
    Returns per-destination stats for the driver's manifest merge."""
    from rayrep.apply import (
        _live_count,
        _live_count_cells,
        fold_state_chain,
        prune_state_chain_cells,
        write_parquet_atomic,
    )
    from rayrep.hashing import partition_ids, partition_ids_salted
    from rayrep.schema import SchemaVersion

    m = PartitionManifest.load(src_lake, src_part)
    target = SchemaVersion.from_json(target_json)
    # repartition REWRITES state, so per-cell lakes must keep the
    # version-preserving pruned row set (each cell winner with its own
    # ts/__seq), never the one-row fold — a post-repartition late event
    # still resolves against true per-cell versions (rayrep.apply.
    # prune_cells; same contract as compact_lake/purge_lake)
    fold = prune_state_chain_cells if lm.changed_cells else fold_state_chain
    state = fold(src_lake, m.state_chain, target)
    out: dict[int, dict] = {}
    if state.num_rows:
        conv = state.column("conv_id")
        if lm.salt_turn_keys:
            turn = state.column("turn_idx").to_numpy(zero_copy_only=False)
            pids = partition_ids_salted(conv, turn, new_p)
        else:
            pids = partition_ids(conv, new_p)
        for pid in np.unique(pids):
            shard = state.filter(pa.array(pids == pid))
            pdir = os.path.join(dst_lake, f"part-{pid:05d}")
            os.makedirs(pdir, exist_ok=True)
            from rayrep.schema import stamp_version

            write_parquet_atomic(
                stamp_version(shard, target.version),
                os.path.join(pdir, _SHARD_FMT.format(src=src_part)),
            )
            mx = shard.column("ts").cast(pa.int64())
            mx_v = pc.max(mx).as_py() if shard.num_rows else None
            out[int(pid)] = {
                "rows": shard.num_rows,
                # pruned per-cell shards hold several rows per key: count
                # live KEYS via the per-cell argmax, not per-row masks
                "live_rows": (_live_count_cells(shard) if lm.changed_cells
                              else _live_count(shard)),
                "max_ts_us": int(mx_v) if mx_v is not None else 0,
            }
    return {"src_part": src_part, "last_seq": m.last_seq, "epoch": m.epoch,
            "shards": out}


def _rebucket_index(src_lake: str, dst_lake: str, new_p: int) -> None:
    """Re-bucket the dedup-ingest content index: claim pairs move to
    ``ckey % new_P``; the ``deduped`` footer of each source file rides on
    its first destination shard so lifetime metrics stay exact. Driver-
    side loop — the index is 16 B per unique content, and each bucket is
    one bounded read+fan-out (a Ray task per bucket at very large lakes,
    same note as ``compact_lake``)."""
    from rayrep.apply import write_parquet_atomic
    from rayrep.ingest_dedup import INDEX_DIR, _DEDUPED_META

    for bdir in sorted(glob.glob(os.path.join(src_lake, INDEX_DIR, "b*"))):
        src_b = int(os.path.basename(bdir)[1:])
        acc: dict[int, list[pa.Table]] = {}
        deduped_total = 0
        for f in sorted(glob.glob(os.path.join(bdir, "*.parquet"))):
            md = pq.read_metadata(f).metadata or {}
            deduped_total += int(md.get(_DEDUPED_META, b"0"))
            t = pq.read_table(f, columns=["ckey", "seq"])
            if t.num_rows == 0:
                continue
            k = t.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
            nb = (k % np.uint64(new_p)).astype(np.int64)
            for b in np.unique(nb):
                acc.setdefault(int(b), []).append(t.filter(pa.array(nb == b)))
        targets = sorted(acc) or []
        for i, b in enumerate(targets):
            merged = pa.concat_tables(acc[b])
            # footer on the first shard only: global sum is preserved
            meta = {_DEDUPED_META: str(deduped_total if i == 0 else 0).encode()}
            merged = merged.replace_schema_metadata(meta)
            odir = os.path.join(dst_lake, INDEX_DIR, f"b{b:05d}")
            os.makedirs(odir, exist_ok=True)
            write_parquet_atomic(
                merged, os.path.join(odir, f"from-{src_b:05d}.parquet")
            )
        if not targets and deduped_total:
            # claims all empty but a count to carry: park it on bucket 0
            odir = os.path.join(dst_lake, INDEX_DIR, "b00000")
            os.makedirs(odir, exist_ok=True)
            empty = pa.table({"ckey": pa.array([], pa.uint64()),
                              "seq": pa.array([], pa.int64())})
            write_parquet_atomic(
                empty.replace_schema_metadata(
                    {_DEDUPED_META: str(deduped_total).encode()}),
                os.path.join(odir, f"from-{src_b:05d}.parquet"),
            )


def repartition_lake(
    src_lake: str, dst_lake: str, num_partitions: int
) -> dict:
    """Rescale ``src_lake`` into ``dst_lake`` with ``num_partitions``
    partitions. The source is read-only; the destination is a fully
    committed lake ready for ``replay`` of subsequent epochs. Returns
    ``{"partitions": new_P, "rows": total_live, "shards": n}``."""
    import ray

    from rayrep.registry import SchemaRegistry

    if num_partitions < 1:
        raise ValueError("num_partitions must be >= 1")
    lm = LakeMeta.load(src_lake)
    if lm is None:
        raise ValueError(
            f"{src_lake} has no LakeMeta (pre-LakeMeta lake or not a lake); "
            "replay it once to migrate before repartitioning"
        )
    dst_meta = LakeMeta.load(dst_lake)
    if dst_meta is not None:
        raise ValueError(
            f"{dst_lake} is already a committed lake "
            f"(num_partitions={dst_meta.num_partitions}); refusing to overwrite"
        )
    em = EpochManifest.load(src_lake)
    src_parts = sorted(
        int(os.path.basename(p)[1:-5])
        for p in glob.glob(os.path.join(src_lake, "_manifests", "p*.json"))
    )
    target_json = SchemaRegistry(persist_dir=src_lake).current_json()

    os.makedirs(dst_lake, exist_ok=True)
    task = ray.remote(num_cpus=1)(_repart_one)
    results = ray.get([
        task.remote(src_lake, dst_lake, p, num_partitions, target_json, lm)
        for p in src_parts
    ])

    # ---- driver-side merge: manifests publish only after every shard wrote
    last_seq = max((r["last_seq"] for r in results), default=-1)
    last_epoch = em.last_epoch
    per_dst: dict[int, dict] = {}
    n_shards = 0
    for r in results:
        for pid, s in r["shards"].items():
            d = per_dst.setdefault(pid, {"chain": [], "live": 0, "max_ts": 0})
            d["chain"].append(
                os.path.join(f"part-{pid:05d}", _SHARD_FMT.format(src=r["src_part"]))
            )
            d["live"] += s["live_rows"]
            d["max_ts"] = max(d["max_ts"], s["max_ts_us"])
            n_shards += 1

    # side trees: schema history verbatim; delta stream verbatim (it is the
    # epoch-ordered CDC output, layout-independent); content index re-bucketed
    sv_src = os.path.join(src_lake, "schema_versions")
    if os.path.isdir(sv_src):
        shutil.copytree(sv_src, os.path.join(dst_lake, "schema_versions"),
                        dirs_exist_ok=True)
    delta_src = os.path.join(src_lake, "delta")
    if os.path.isdir(delta_src):
        shutil.copytree(delta_src, os.path.join(dst_lake, "delta"),
                        dirs_exist_ok=True)
    if lm.dedup_ingest:
        _rebucket_index(src_lake, dst_lake, num_partitions)

    for pid in range(num_partitions):
        d = per_dst.get(pid, {"chain": [], "live": 0, "max_ts": 0})
        PartitionManifest(
            part_id=pid,
            epoch=last_epoch,
            last_seq=last_seq,
            state_chain=sorted(d["chain"]),
            live_rows=d["live"],
            max_ts_us=d["max_ts"],
        ).save(dst_lake)
    new_em = EpochManifest(
        last_epoch=last_epoch,
        totals=dict(em.totals),
        replication_delay_s=em.replication_delay_s,
        num_partitions=num_partitions,
    )
    new_em.save(dst_lake)
    LakeMeta(
        num_partitions=num_partitions,
        changed_cells=lm.changed_cells,
        per_cell=lm.per_cell,
        salt_turn_keys=lm.salt_turn_keys,
        dedup_ingest=lm.dedup_ingest,
        # em.totals already folds any prior baseline, so chained rescales
        # stay exact: lifetime counters never reset or double-count
        counters_baseline=dict(em.totals),
    ).save(dst_lake)  # publish LAST: a crash before this leaves no lake
    total_live = sum(d["live"] for d in per_dst.values())
    return {"partitions": num_partitions, "rows": total_live,
            "shards": n_shards, "last_epoch": last_epoch, "last_seq": last_seq}
