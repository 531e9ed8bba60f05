"""Dedup-on-ingest: content-level first-writer-wins dedup inside the replay.

The LLM-corpus ingest story for a CDC engine: a training-data lake does not
want the same document body ingested twice, even when it arrives under
different keys (re-crawls, cross-posted conversations, mirrored forums).
This stage drops an INSERT event whose content column's value was already
claimed by an earlier event (smaller ``seq``), either in a previously
committed round (persisted content index) or within the same round
(min-``seq`` wins). U/D events and null content always pass through —
dedup is an *ingest* policy, not an update policy (an update to a key whose
insert was deduped re-materializes the row under normal LWW upsert rules;
documented, tested).

Reference analog: none — the reference replicates faithfully
(README.md:17-20). This is one of the beyond-reference training-data
operators, integrated with the engine's exactly-once machinery.

Scale shape (the part that must survive 100 TB):

- ONE extra all-to-all per round, hash-bucketed by ``ckey =
  stable_hash(content)``: the dedup decision for a content value is made by
  exactly one task, with no corpus-sized driver state and no all-pairs
  anything. Bypass rows (U/D/null content) ride the same exchange on an
  arbitrary stable bucket and pass through untouched.
- The **content index** is a lake-side Parquet directory
  ``content_index/b{bucket:05d}/e{epoch:05d}.parquet`` of (ckey:uint64,
  seq:int64) pairs — 16 B per *first-seen* content, hive-split by bucket so
  each dedup task reads only its own bucket's files (merge-on-read;
  ``compact_content_index`` folds a long chain, the same LSM discipline as
  the state chain).
- Exactly-once without coordination: delta files have deterministic names
  and are written atomically, so a retried/resumed round overwrites its own
  claims byte-identically. Reads EXCLUDE the round's own file, and the drop
  rule is *strictly smaller seq wins* — a claim re-read at equal ``seq`` is
  the event's own (crashed-round) claim and keeps the row, so every crash
  window is self-healing.
- Precondition (shared with the watermark skip in ``pipeline.replay``):
  epochs partition the ``seq`` order — all seqs in epoch k precede epoch
  k+1's. The generator and bootstrap both guarantee it.

Determinism: the winner for a content value is the globally smallest
``seq`` — independent of batch boundaries, task retries, round sizing
(``epochs_per_round``) and resume points.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.hashing import stable_hash_strings

INDEX_DIR = "content_index"
_DEDUPED_META = b"rayrep.deduped"

CKEY = "ckey"
CBUCKET = "cbucket"


def bucket_dir(lake_dir: str, bucket: int) -> str:
    return os.path.join(lake_dir, INDEX_DIR, f"b{bucket:05d}")


def _delta_name(epoch: int) -> str:
    return f"e{epoch:05d}.parquet"


def stamp_content(batch: pa.Table, content_col: str, num_buckets: int) -> pa.Table:
    """Vectorized map stage: append ``ckey`` (uint64 content hash, null for
    bypass rows) and ``cbucket`` (the dedup exchange's routing key).

    Dedupable = op == 'I' AND content is non-null. Bypass rows route on
    ``part_id % num_buckets`` — any *stable* bucket works, they are passed
    through untouched by the group task."""
    n = batch.num_rows
    dd = pc.and_(
        pc.equal(batch["op"], "I"), pc.is_valid(batch[content_col])
    ).to_numpy(zero_copy_only=False)
    keys = np.zeros(n, np.uint64)
    if dd.any():
        # hash only the dedupable rows' content (skip U/D payload bytes)
        vals = batch[content_col].to_numpy(zero_copy_only=False)
        keys[dd] = stable_hash_strings(vals[dd])
    ckey = pa.array(keys, pa.uint64(), mask=~dd)
    part = batch["part_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bucket = np.where(
        dd, keys % np.uint64(num_buckets), part % np.uint64(num_buckets)
    ).astype(np.int32)
    return batch.append_column(CKEY, ckey).append_column(
        CBUCKET, pa.array(bucket, pa.int32())
    )


def read_bucket_claims(
    lake_dir: str, bucket: int, exclude_epoch: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """All committed claims of one bucket as (sorted unique ckeys, min seq
    per ckey). ``exclude_epoch`` skips the in-flight round's own delta so a
    retry never reads its previous (crashed) attempt as a *prior* claim."""
    bdir = bucket_dir(lake_dir, bucket)
    skip = _delta_name(exclude_epoch) if exclude_epoch is not None else None
    files = [
        f for f in sorted(glob.glob(os.path.join(bdir, "*.parquet")))
        if skip is None or os.path.basename(f) != skip
    ]
    if not files:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    tabs = [pq.read_table(f, columns=["ckey", "seq"]) for f in files]
    t = pa.concat_tables(tabs)
    k = t.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
    s = t.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((s, k))
    k, s = k[order], s[order]
    first = np.ones(len(k), bool)
    first[1:] = k[1:] != k[:-1]
    return k[first], s[first]  # min seq per key (duplicate claims merge here)


def dedup_group(
    group: pa.Table,
    lake_dir: str,
    epoch: int,
    persist: bool = True,
    durable: bool = False,
) -> pa.Table:
    """Per-bucket dedup task (runs inside ``groupby(cbucket).map_groups``).

    Drop rule: a dedupable row is dropped iff some claim — a committed
    index entry or another row of this round — has the SAME ckey and a
    STRICTLY smaller seq. Winners not yet in the index are appended as the
    round's claim delta (deterministic name + tmp/rename, retry-safe)."""
    from rayrep.apply import write_parquet_atomic

    helper = [c for c in (CKEY, CBUCKET) if c in group.column_names]
    ck = group[CKEY]
    dd_mask = pc.is_valid(ck).to_numpy(zero_copy_only=False)
    n_dd = int(dd_mask.sum())
    if n_dd == 0:
        return group.drop_columns(helper)
    bucket = int(group[CBUCKET][0].as_py())

    # fill nulls BEFORE to_numpy: a null-bearing uint64 Arrow array converts
    # through float64 (nulls → NaN), which silently zeroes the hash's low
    # bits for EVERY key in the group — fill_null keeps the dtype integral
    k = pc.fill_null(ck, 0).to_numpy(zero_copy_only=False)[dd_mask].astype(np.uint64)
    s = group["seq"].to_numpy(zero_copy_only=False)[dd_mask].astype(np.int64)
    order = np.lexsort((s, k))
    k_s, s_s = k[order], s[order]
    first = np.ones(n_dd, bool)
    first[1:] = k_s[1:] != k_s[:-1]

    ik, iseq = read_bucket_claims(lake_dir, bucket, exclude_epoch=epoch)
    if len(ik):
        pos = np.searchsorted(ik, k_s)
        pos_c = np.minimum(pos, len(ik) - 1)
        has = ik[pos_c] == k_s
        claimed_lt = has & (iseq[pos_c] < s_s)  # strictly-smaller: crash-safe
    else:
        has = np.zeros(n_dd, bool)
        claimed_lt = has
    keep_s = first & ~claimed_lt
    keep_dd = np.empty(n_dd, bool)
    keep_dd[order] = keep_s
    deduped = n_dd - int(keep_dd.sum())

    new_claim = keep_s & ~has  # winners not already claimed
    if persist and (deduped or new_claim.any()):
        delta = pa.table({
            "ckey": pa.array(k_s[new_claim], pa.uint64()),
            "seq": pa.array(s_s[new_claim], pa.int64()),
        }).replace_schema_metadata({_DEDUPED_META: str(deduped).encode()})
        os.makedirs(bucket_dir(lake_dir, bucket), exist_ok=True)
        write_parquet_atomic(
            delta,
            os.path.join(bucket_dir(lake_dir, bucket), _delta_name(epoch)),
            durable=durable,
        )

    keep = np.ones(group.num_rows, bool)
    keep[dd_mask] = keep_dd
    return group.filter(pa.array(keep)).drop_columns(helper)


def dedup_stage(
    ds,
    lake_dir: str,
    epoch: int,
    num_buckets: int,
    content_col: str,
    persist: bool = True,
    durable: bool = False,
    batch_size: int = 131072,
):
    """Attach the dedup exchange to an augmented Dataset: stamp → hash
    shuffle by content bucket → per-bucket first-claim filter. Output rows
    keep the augmented schema exactly (helper columns dropped), so the
    stage composes transparently with combine/pack/the conv exchange."""

    stamped = ds.map_batches(
        stamp_content,
        fn_kwargs={"content_col": content_col, "num_buckets": num_buckets},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
    return stamped.groupby(CBUCKET).map_groups(
        dedup_group,
        fn_kwargs={
            "lake_dir": lake_dir,
            "epoch": epoch,
            "persist": persist,
            "durable": durable,
        },
        batch_format="pyarrow",
        num_cpus=1,
    )


def deduped_for_epoch(lake_dir: str, epoch: int) -> int:
    """Round metric: dropped-event count, summed from the round's delta
    footers (one metadata read per touched bucket — no data scan)."""
    total = 0
    for f in glob.glob(
        os.path.join(lake_dir, INDEX_DIR, "b*", _delta_name(epoch))
    ):
        md = pq.read_metadata(f).metadata or {}
        total += int(md.get(_DEDUPED_META, b"0"))
    return total


def cumulative_deduped(lake_dir: str) -> int:
    """Lifetime dropped-event count across every index delta."""
    total = 0
    for f in glob.glob(os.path.join(lake_dir, INDEX_DIR, "b*", "*.parquet")):
        md = pq.read_metadata(f).metadata or {}
        total += int(md.get(_DEDUPED_META, b"0"))
    return total


def compact_content_index(lake_dir: str) -> int:
    """Fold each bucket's delta chain into one base file (min seq per ckey,
    deduped-count footers summed into the base so lifetime metrics
    survive). Crash-safe: the base is written atomically under the highest
    epoch's name before the superseded files are removed — a crash between
    the two leaves duplicate claims, which the min-merge in
    ``read_bucket_claims`` already tolerates. Returns files removed."""
    removed = 0
    for bdir in sorted(glob.glob(os.path.join(lake_dir, INDEX_DIR, "b*"))):
        files = sorted(glob.glob(os.path.join(bdir, "*.parquet")))
        if len(files) <= 1:
            continue
        total_deduped = 0
        for f in files:
            md = pq.read_metadata(f).metadata or {}
            total_deduped += int(md.get(_DEDUPED_META, b"0"))
        t = pa.concat_tables(
            [pq.read_table(f, columns=["ckey", "seq"]) for f in files]
        )
        k = t.column("ckey").to_numpy(zero_copy_only=False).astype(np.uint64)
        s = t.column("seq").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((s, k))
        k, s = k[order], s[order]
        first = np.ones(len(k), bool)
        first[1:] = k[1:] != k[:-1]
        base = pa.table({
            "ckey": pa.array(k[first], pa.uint64()),
            "seq": pa.array(s[first], pa.int64()),
        }).replace_schema_metadata({_DEDUPED_META: str(total_deduped).encode()})
        from rayrep.apply import write_parquet_atomic

        target = files[-1]  # highest epoch name: future deltas sort after it
        write_parquet_atomic(base, target)
        for f in files[:-1]:
            os.remove(f)
            removed += 1
    return removed
