"""Applier — keyed, versioned, exactly-once upsert into the Parquet lake.

Reference analog: the HBase applier (README.md:17-20) — a parallel task
pool writing versioned puts where the row key is salted
(CHANGES.txt:102-104), updates write only changed cells (CHANGES.txt:173),
deletes ignore all columns (CHANGES.txt:184), and a row's current image is
the per-column latest version — last-writer-wins by version timestamp
(README.md:18). Checkpoints advance only when every task committed
(CHANGES.txt:6-7, 113-116); 1% of tasks are chaos-failed in normal runs
(CHANGES.txt:126).

Ray-Data-native shape: one ``Applier`` callable-class instance per actor in
``groupby("part_id").map_groups(Applier, ...)``; each call receives ONE
partition's epoch slice as a zero-copy Arrow table and

1. sorts it by ``seq`` (binlog order is never inferred from block order),
2. anti-joins against the committed watermark (``seq <= last_seq`` →
   ``skipped``; exactly-once on retry/resume, J5),
3. folds LWW by ``(ts, seq)`` per ``(conv_id, turn_idx)`` — vectorized with
   grouped cummax, no per-row Python — producing winners + ``conflict``
   counts (J3/A4),
4. writes the new partition state (live rows + tombstones) to a
   deterministically-named Parquet file via tmp+rename, then commits the
   partition manifest atomically (T3),
5. emits a one-row counter summary; the driver asserts
   ``applied + skipped + conflict == input_rows`` (A3) before advancing the
   epoch barrier.

State is durable in Parquet, not in the actor heap: a retried task recomputes
from the previous committed state and overwrites the same filenames, so
retries and resumes are idempotent by construction. The per-partition
key→(ts, seq) map lives in the actor only for the duration of a call (plus
an optional cross-call cache keyed by manifest epoch).
"""

from __future__ import annotations

import glob
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.combine import DAY_US
from rayrep.manifests import PartitionManifest, merge_counters, zero_counters
from rayrep.schema import SchemaVersion

STATE_META = ["__seq", "__deleted"]  # + canonical payload columns incl. `ts`

SUMMARY_SCHEMA = pa.schema(
    [
        pa.field("part_id", pa.int32()),
        pa.field("epoch", pa.int32()),
        pa.field("input_rows", pa.int64()),
        pa.field("applied", pa.int64()),
        pa.field("skipped", pa.int64()),
        pa.field("conflict", pa.int64()),
        pa.field("deleted", pa.int64()),
        pa.field("live_rows", pa.int64()),
        pa.field("max_ts_us", pa.int64()),
        pa.field("already_committed", pa.bool_()),
        pa.field("chaos_retries", pa.int64()),
    ]
)


class ChaosError(RuntimeError):
    """Injected applier failure (reference Chaos Monkey, CHANGES.txt:126)."""


def decode_transport(t: pa.Table) -> pa.Table:
    """Undo the augmenter's transport dictionary-encoding (plain strings for
    downstream kernels and the durable state layout)."""
    for i, f in enumerate(t.schema):
        if pa.types.is_dictionary(f.type):
            t = t.set_column(i, f.name, t.column(i).cast(f.type.value_type))
    return t


def events_as_state(events: pa.Table, payload_cols: list[str]) -> pa.Table:
    """Project changelog events to state-row layout (payload + __seq/__deleted)."""
    events = decode_transport(events)
    cols = {c: events.column(c) for c in payload_cols}
    tbl = pa.table(cols)
    tbl = tbl.append_column("__seq", events.column("seq"))
    tbl = tbl.append_column("__deleted", pc.equal(events.column("op"), "D").combine_chunks())
    return tbl


def _key_ids(comb: pa.Table) -> np.ndarray:
    """Dense collision-free int64 id per (conv_id, turn_idx): factorized
    conv << 32 | turn. Hash-based — avoids string sorts in the hot path."""
    conv = comb.column("conv_id").to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(conv, sort=False)
    return (codes.astype(np.int64) << 32) | comb.column("turn_idx").to_numpy().astype(
        np.int64
    )


def lww_last_rows(comb: pa.Table) -> pa.Table:
    """Keep the argmax-(ts, __seq) row per (conv_id, turn_idx) — the core
    grouped LWW reduction (A4; HBase per-cell versioning analog,
    README.md:18). Output row order is by key id, not lexicographic —
    callers needing a stable presentation order sort afterwards."""
    if comb.num_rows == 0:
        return comb
    kid = _key_ids(comb)
    ts = comb.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    seq = comb.column("__seq").to_numpy()
    return comb.filter(pa.array(group_argmax_mask(kid, ts, seq)))


def _live_count(state: pa.Table) -> int:
    if state.num_rows == 0:
        return 0
    return int(state.num_rows - (pc.sum(state["__deleted"]).as_py() or 0))


def group_argmax_mask(
    kid: np.ndarray, ts: np.ndarray, seq: np.ndarray, day: np.ndarray | None = None
) -> np.ndarray:
    """Input-order mask marking each (kid[, day]) group's argmax-(ts, seq)
    row — THE LWW tie-break rule, defined once (every winner-selection site
    shares this; a divergent copy caused the combined-delta drop bug)."""
    n = len(kid)
    o = np.lexsort((seq, ts, day, kid)) if day is not None else np.lexsort((seq, ts, kid))
    last = np.ones(n, dtype=bool)
    if n > 1:
        k = kid[o]
        if day is not None:
            d = day[o]
            last[:-1] = (k[1:] != k[:-1]) | (d[1:] != d[:-1])
        else:
            last[:-1] = k[1:] != k[:-1]
    m = np.zeros(n, dtype=bool)
    m[o[last]] = True
    return m


def _fsync_path(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def write_parquet_atomic(table: pa.Table, path: str, durable: bool = False) -> None:
    """write → [fsync(file)] → rename → [fsync(dir)]. Rename atomicity alone
    gives exactly-once under PROCESS/VM crashes (the chaos/resume model);
    ``durable=True`` additionally syncs data before the manifest can
    reference it, extending the guarantee to power loss — at the cost of
    forcing synchronous writeback of the full state volume (~40% headline
    on this sandbox's disk; the Spark/Flink file-commit protocols make the
    same default trade)."""
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    if durable:
        _fsync_path(tmp)
    os.replace(tmp, path)
    if durable:
        _fsync_path(os.path.dirname(path))


def last_per_key_mask(comb: pa.Table) -> np.ndarray:
    """Keep-mask for the LAST occurrence per key in ARRAY ORDER — the state
    chain fold (a key's later chain entries are strictly newer by
    construction, so positional last == LWW winner). O(n) hash-based."""
    kid = _key_ids(comb)
    return ~pd.Series(kid[::-1]).duplicated().to_numpy()[::-1]


def fold_state_files(
    paths: list[str], columns: list[str] | None = None, by_version: bool = False
) -> pa.Table:
    """Merge-on-read: concat a partition's state chain (base + per-epoch
    deltas, oldest→newest) and keep each key's newest row. ``columns``
    prunes the read (the per-epoch counter seed needs only 4 narrow
    columns, never the payload). ``by_version=True`` selects the per-key
    argmax-(ts, __seq) row instead of the positional last — required for
    per-cell lakes, where late events append chain rows with OLDER
    versions. The engine columns (conv_id, turn_idx, ts, __seq,
    __deleted) are rename-stable, so a permissive concat is safe here;
    full-payload folds must conform per file first (``fold_state_chain``)."""
    tabs = [pq.read_table(p, columns=columns) for p in paths]
    comb = (
        pa.concat_tables(tabs, promote_options="permissive")
        if len(tabs) > 1
        else tabs[0]
    )
    if comb.num_rows == 0:
        return comb
    if by_version:
        kid = _key_ids(comb)
        ts = comb.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return comb.filter(pa.array(group_argmax_mask(kid, ts, comb.column("__seq").to_numpy())))
    return comb.filter(pa.array(last_per_key_mask(comb)))


def state_schema(target: SchemaVersion) -> pa.Schema:
    return pa.schema(
        list(target.schema)
        + [pa.field("__seq", pa.int64()), pa.field("__deleted", pa.bool_())]
    )


def conform_state(
    state: pa.Table,
    target: SchemaVersion,
    history: dict[int, SchemaVersion] | None = None,
) -> pa.Table:
    """Evolve a prior-epoch state table to the current canonical schema
    (schema evolution between epochs: add columns as nulls, renames).
    When the file is version-stamped and ``history`` covers the range,
    the mapping replays the exact DDL steps (``evolve_table_from``) —
    required once a column name is dropped and later re-added, where
    name-based conformance would resurrect the dropped data."""
    from rayrep.schema import evolve_table, evolve_table_from, stamped_version

    if state.num_rows == 0 and not state.column_names:
        return state_schema(target).empty_table()
    ver = stamped_version(state)
    meta = {c: state.column(c) for c in STATE_META if c in state.column_names}
    payload = state.drop_columns([c for c in STATE_META if c in state.column_names])
    if ver is not None and ver < target.version and history:
        payload = evolve_table_from(payload, ver, target, history)
    else:
        payload = evolve_table(payload, target)
    out = payload
    for c in STATE_META:
        out = out.append_column(c, meta[c])
    return out


def load_schema_history(lake_dir: str) -> dict[int, "SchemaVersion"]:
    """The lake's persisted schema history (S8), for version-aware chain
    conformance. Tiny JSON reads — cheap relative to any chain fold."""
    from rayrep.registry import SchemaRegistry

    return dict(SchemaRegistry(persist_dir=lake_dir).versions)


# Collapse threshold for the incremental chain fold: once the running
# accumulator exceeds this many rows it is reduced to one row per key
# before the next file loads.  Peak memory per fold task is therefore
# bounded by ~(live keys in partition + one delta file + this slack), NOT
# by the sum of the whole chain — the per-partition envelope is the live
# key set, which ``num_partitions`` must be sized to fit in a worker heap
# (COVERAGE.md "state-memory envelope").
FOLD_COLLAPSE_ROWS = 4_000_000


def fold_state_chain(lake_dir: str, chain: list[str], target: SchemaVersion,
                     collapse_rows: int = FOLD_COLLAPSE_ROWS,
                     read_filter=None) -> pa.Table:
    """Full-payload merge-on-read of a state chain: each file is conformed
    to the target schema FIRST (so a rename between deltas doesn't strand
    old rows' payload in a dead column), then the newest row per key wins.

    The fold is INCREMENTAL: files load oldest→newest and the accumulator
    collapses to one row per key whenever it crosses ``collapse_rows`` —
    positional-last-per-key is associative under ordered concatenation,
    so any collapse schedule yields the identical result (property-
    tested) while bounding peak memory to live-keys + one file instead of
    the whole chain (r3 advice: the chain used to concatenate whole).

    ``read_filter`` (a pyarrow dataset Expression over the KEY columns,
    e.g. ``pc.field("conv_id").isin([...])``) pushes a key predicate into
    every chain-file read — sound because the fold is per-key independent
    (fold(filter_K(chain)) ≡ filter_K(fold(chain)) for any key set K) and
    key columns are engine-level, never touched by DDL. The point-lookup
    read path (rayrep/lookup.py) rides on this."""
    from rayrep.schema import stamped_version

    acc = None
    history = None
    for f in chain:
        raw = pq.read_table(os.path.join(lake_dir, f), filters=read_filter)
        v = stamped_version(raw)
        if v is not None and v < target.version and history is None:
            history = load_schema_history(lake_dir)
        t = conform_state(raw, target, history)
        acc = t if acc is None else pa.concat_tables([acc, t])
        if acc.num_rows > collapse_rows:
            acc = acc.filter(pa.array(last_per_key_mask(acc))).combine_chunks()
    if acc is None:
        return state_schema(target).empty_table()
    if acc.num_rows == 0:
        return acc
    return acc.filter(pa.array(last_per_key_mask(acc)))


def _segmented_last_pos(seg_id: np.ndarray, mark: np.ndarray) -> np.ndarray:
    """Running 'position of the last True so far' per segment (rows are
    segment-contiguous): the per-segment reset comes free from packing
    (seg_id, pos+1) into one int64 and taking a prefix max — the same
    compressed-accumulate trick as _sequential_win."""
    n = len(seg_id)
    val = np.where(mark, np.arange(n, dtype=np.int64), np.int64(-1))
    base = seg_id * np.int64(n + 1)
    return np.maximum.accumulate(base + val + 1) - base - 1  # -1 = none yet


def fold_cells(comb: pa.Table, payload_cols: list[str]) -> pa.Table:
    """Changed-cells fold (CHANGES.txt:173 / HBase per-cell versioning,
    README.md:18): ONE state row per (conv_id, turn_idx) from a chain of
    full/partial state rows. Ordering is by (ts, __seq) — the HBase version
    order; for row-level-conflict chains this coincides with apply order
    because every chain row won at its time (nondecreasing ts per key).
    Per column the final value is the LAST NON-NULL among rows strictly
    after the key's last delete in that order (a delete masks every older
    cell version, CHANGES.txt:184); the key is a tombstone iff its last
    version is a delete. Fully vectorized — lexsort + per-segment
    running-max position tricks, no pandas (this replaces the round-2
    ``to_pandas().groupby().agg("last")`` fold, the last pandas-object hot
    path in the engine)."""
    n = comb.num_rows
    if n == 0:
        return comb
    kid = _key_ids(comb)
    ts = comb.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    seqv = comb.column("__seq").to_numpy()
    order = np.lexsort((seqv, ts, kid))
    s = comb.take(pa.array(order))
    ks = kid[order]
    first = np.ones(n, dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    seg_id = (np.cumsum(first) - 1).astype(np.int64)
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n) - 1  # last row per key
    deleted = s.column("__deleted").to_numpy(zero_copy_only=False)
    # the key's FINAL last-delete position, broadcast back to every row
    # (the running value at earlier rows would let pre-delete cells leak)
    lastdel = _segmented_last_pos(seg_id, deleted)[ends]
    seg_len = np.diff(np.append(starts, n))
    cur = np.arange(n, dtype=np.int64) > np.repeat(lastdel, seg_len)
    ends_arr = pa.array(ends)
    out_cols = {}
    for name in payload_cols:
        col = s.column(name)
        if name in ("conv_id", "turn_idx", "ts"):
            out_cols[name] = col.take(ends_arr)  # key/version cols: last row
            continue
        valid = cur & ~pc.is_null(col).to_numpy(zero_copy_only=False)
        take_at = _segmented_last_pos(seg_id, valid)[ends]
        idx = pa.array(np.maximum(take_at, 0), pa.int64(), mask=take_at < 0)
        out_cols[name] = col.take(idx)  # null index → null cell
    tbl = pa.table(out_cols)
    tbl = tbl.append_column("__seq", s.column("__seq").take(ends_arr))
    tbl = tbl.append_column("__deleted", s.column("__deleted").take(ends_arr))
    return tbl


def prune_cells(comb: pa.Table, payload_cols: list[str]) -> pa.Table:
    """Version-preserving compaction for per-cell chains: keep, per key,
    the minimal set of ORIGINAL rows ``fold_cells`` could ever need —
    each payload column's current winning row, the key's last-delete row,
    and the key's last (ts, __seq) row. Rows keep their own versions, so
    ``fold_cells(prune(prefix) ∪ suffix) ≡ fold_cells(prefix ∪ suffix)``
    for ANY suffix (per-cell argmax and delete-masking are associative
    over row subsets that contain every potential winner — property-
    tested). The round-3 full collapse instead stamped every surviving
    cell with the ROW's last version, so a later write landing between a
    cell's true version and the row version wrongly lost, and a delete's
    own version vanished entirely (HBase keeps per-cell timestamps
    through compaction; CHANGES.txt:173,184 semantics). Chain stays
    bounded: ≤ n_payload_cols + 2 rows per key, and pre-delete / beaten
    versions are garbage-collected exactly as before."""
    n = comb.num_rows
    if n == 0:
        return comb
    kid = _key_ids(comb)
    ts = comb.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    seqv = comb.column("__seq").to_numpy()
    order = np.lexsort((seqv, ts, kid))
    s = comb.take(pa.array(order))
    ks = kid[order]
    first = np.ones(n, dtype=bool)
    first[1:] = ks[1:] != ks[:-1]
    seg_id = (np.cumsum(first) - 1).astype(np.int64)
    starts = np.flatnonzero(first)
    ends = np.append(starts[1:], n) - 1
    deleted = s.column("__deleted").to_numpy(zero_copy_only=False)
    lastdel = _segmented_last_pos(seg_id, deleted)[ends]
    seg_len = np.diff(np.append(starts, n))
    cur = np.arange(n, dtype=np.int64) > np.repeat(lastdel, seg_len)
    keep = np.zeros(n, dtype=bool)
    keep[ends] = True                      # tombstone / last-version row
    keep[lastdel[lastdel >= 0]] = True     # delete masks future older writes
    for name in payload_cols:
        if name in ("conv_id", "turn_idx", "ts"):
            continue
        col = s.column(name)
        valid = cur & ~pc.is_null(col).to_numpy(zero_copy_only=False)
        take_at = _segmented_last_pos(seg_id, valid)[ends]
        keep[take_at[take_at >= 0]] = True
    return s.filter(pa.array(keep))


def _live_count_cells(state: pa.Table) -> int:
    """Live-key count for a (possibly pruned, multi-row-per-key) per-cell
    state table: a key is live iff its max-(ts, __seq) row is not a
    delete — ``_live_count`` would overcount pruned rows."""
    if state.num_rows == 0:
        return 0
    kid = _key_ids(state)
    ts = state.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    mask = group_argmax_mask(kid, ts, state.column("__seq").to_numpy())
    dead = state.column("__deleted").to_numpy(zero_copy_only=False)[mask]
    return int(len(dead) - dead.sum())


def _chain_tables(lake_dir: str, chain: list[str], target: SchemaVersion,
                  collapse_rows: int = FOLD_COLLAPSE_ROWS,
                  read_filter=None) -> pa.Table | None:
    """Load a per-cell chain with each file conformed to the target
    schema FIRST (renames don't strand old cells). INCREMENTAL like the
    row fold: whenever the accumulator crosses ``collapse_rows`` it is
    reduced to the version-preserving minimal row set — ``prune_cells``
    is exactly the prefix-collapse the per-cell fold is invariant under
    (``fold(prune(prefix) ∪ suffix) ≡ fold(prefix ∪ suffix)`` for any
    suffix, property-tested), so any collapse schedule yields the same
    result while peak memory stays ≤ (n_payload+2)·live-keys + one file,
    not the whole chain."""
    from rayrep.schema import stamped_version

    payload = [f.name for f in target.schema]
    acc = None
    history = None
    for f in chain:
        raw = pq.read_table(os.path.join(lake_dir, f), filters=read_filter)
        v = stamped_version(raw)
        if v is not None and v < target.version and history is None:
            history = load_schema_history(lake_dir)
        t = conform_state(raw, target, history)
        acc = t if acc is None else pa.concat_tables([acc, t])
        if acc.num_rows > collapse_rows:
            acc = prune_cells(acc, payload).combine_chunks()
    return acc


def fold_state_chain_cells(
    lake_dir: str, chain: list[str], target: SchemaVersion,
    read_filter=None,
) -> pa.Table:
    """Changed-cells merge-on-read: conform each chain file to the target
    schema first (renames don't strand old cells), then cell-fold.
    ``read_filter``: key-column pushdown, sound per-key like the row fold
    (per-cell argmax + delete masking are per-(conv_id, turn_idx))."""
    comb = _chain_tables(lake_dir, chain, target, read_filter=read_filter)
    if comb is None:
        return state_schema(target).empty_table()
    return fold_cells(comb, [f.name for f in target.schema])


def prune_state_chain_cells(
    lake_dir: str, chain: list[str], target: SchemaVersion
) -> pa.Table:
    """Compaction/rewrite fold for per-cell chains: the version-preserving
    minimal row set (``prune_cells``) instead of the lossy one-row image —
    the file a compactor/repartitioner/purger may write back as state."""
    comb = _chain_tables(lake_dir, chain, target)
    if comb is None:
        return state_schema(target).empty_table()
    return prune_cells(comb, [f.name for f in target.schema])


def state_dir(lake_dir: str, part_id: int) -> str:
    # no "=" in the dir name: hive-partition inference would add a spurious
    # column on read_parquet of the state files
    return os.path.join(lake_dir, f"part-{part_id:05d}")


def state_path(lake_dir: str, part_id: int, epoch: int) -> str:
    return os.path.join(state_dir(lake_dir, part_id), f"state-e{epoch:05d}.parquet")


class Applier:
    def __init__(
        self,
        lake_dir: str,
        epoch: int,
        target_schema_json: str,
        changed_cells: bool = False,
        per_cell: bool = False,
        delta_output: bool = True,
        chaos_fraction: float = 0.0,
        chaos_seed: int = 1234,
        compact_interval: int = 4,
        durable_sync: bool = False,
        lease_token: int = 0,
    ):
        self.lake_dir = lake_dir
        self.epoch = epoch
        self.target = SchemaVersion.from_json(target_schema_json)
        self.payload_cols = [f.name for f in self.target.schema]
        self.changed_cells = changed_cells
        # HBase parity option: conflicts resolve per (key, COLUMN) by
        # version (ts, seq) instead of rejecting a ts-inverted partial
        # update wholesale — a late event's cells apply to columns no newer
        # event touched. Only meaningful with changed_cells.
        self.per_cell = per_cell and changed_cells
        self.delta_output = delta_output
        self.chaos_fraction = chaos_fraction
        self.chaos_seed = chaos_seed
        # write a delta per epoch; fold to one full file when the chain
        # would exceed this many entries (1 = full rewrite every epoch)
        self.compact_interval = max(1, compact_interval)
        self.durable_sync = durable_sync
        # Fencing stamp (rayrep/lease.py): commits under a lease carry the
        # token so a fenced-out zombie's overwrite is refused at save time.
        self.lease_token = lease_token

    # ------------------------------------------------------------------ call
    def __call__(self, group: pa.Table) -> pa.Table:
        group = decode_transport(group)  # strings again after the shuffle
        part_id = int(group.column("part_id")[0].as_py())
        manifest = PartitionManifest.load(self.lake_dir, part_id)

        if manifest.epoch >= self.epoch:
            # Retried / resumed task for an already-committed epoch: the
            # manifest IS the truth — return its stored counters (idempotence).
            return self._summary(
                part_id, manifest.epoch_counters, manifest, already=True, retries=0
            )

        rng = np.random.default_rng(
            (self.chaos_seed * 1_000_003 + part_id) * 31 + self.epoch
        )
        retries = 0
        while True:
            try:
                counters, new_manifest = self._apply_once(part_id, group, manifest, rng)
                break
            except ChaosError:
                # The reference's supervisor restarts the failed task
                # (CHANGES.txt:66-69); all writes below are tmp+rename with
                # deterministic names, so the retry is safe.
                retries += 1
        return self._summary(part_id, counters, new_manifest, already=False, retries=retries)

    # ----------------------------------------------------------- core apply
    def _apply_once(
        self,
        part_id: int,
        group: pa.Table,
        manifest: PartitionManifest,
        rng: np.random.Generator,
    ) -> tuple[dict, PartitionManifest]:
        if "m_seq" in group.column_names:
            return self._apply_once_combined(part_id, group, manifest, rng)
        # (1) binlog order: sort by seq; never trust block order.
        group = group.take(pc.sort_indices(group["seq"]))
        seq = group.column("seq").to_numpy()
        n_in = len(seq)

        # (2) watermark anti-join (J5): exactly-once under re-delivery.
        keep = seq > manifest.last_seq
        n_skipped = int(n_in - keep.sum())
        events = group.filter(pa.array(keep)) if n_skipped else group

        if self.changed_cells:
            return self._apply_once_cells(
                part_id, events, manifest, rng, n_in, n_skipped, seq
            )

        # --- delta path: epoch cost ∝ delta size, never partition state ---
        conv = events.column("conv_id").to_numpy(zero_copy_only=False)
        ts_us = events.column("ts").cast(pa.int64()).to_numpy()
        is_del = events.column("op").to_numpy(zero_copy_only=False) == "D"
        codes, uniques = pd.factorize(conv, sort=False)
        kid = (codes.astype(np.int64) << 32) | events.column("turn_idx").to_numpy().astype(
            np.int64
        )
        narrow = self._load_state_narrow(manifest)
        seed, prior_live = self._seed_maps(narrow, uniques)
        win = self._sequential_win(kid, ts_us, seed)
        ctr = zero_counters()
        ctr["input_rows"] = n_in
        ctr["skipped"] = n_skipped
        ctr["applied"] = int(win.sum())
        ctr["conflict"] = int((~win).sum())
        ctr["deleted"] = int((win & is_del).sum())
        winners = events.filter(pa.array(win))
        # per-key argmax winner = the key's new state row (kid reused from
        # the factorization above — no second factorize / string sort)
        kid_w = kid[win]
        if len(kid_w):
            ts_w = ts_us[win]
            seq_w = events.column("seq").to_numpy()[win]
            kmask = group_argmax_mask(kid_w, ts_w, seq_w)
            delta_state = self._events_as_state(winners.filter(pa.array(kmask)))
            d_kid = kid_w[kmask]
            if self.delta_output:
                # S7 delta = NET applied image per (key, utc-day): the SAME
                # contract as the combined path, so a resumed round that
                # falls back to this per-event path never leaves
                # mixed-granularity delta files for one epoch
                dmask = group_argmax_mask(kid_w, ts_w, seq_w, day=ts_w // DAY_US)
                delta_rows = winners.filter(pa.array(dmask))
            else:
                delta_rows = winners.schema.empty_table()
        else:
            delta_state = self._state_schema().empty_table()
            d_kid = np.empty(0, dtype=np.int64)
            delta_rows = events.schema.empty_table()
        live_delta = self._live_delta(delta_state, d_kid, prior_live)
        last_seq = int(seq.max()) if n_in else manifest.last_seq
        return self._commit(
            part_id, manifest, delta_state, delta_rows, ctr, last_seq, rng,
            chain=manifest.state_chain, live_rows=manifest.live_rows + live_delta,
        )

    def _apply_once_cells(
        self,
        part_id: int,
        events: pa.Table,
        manifest: PartitionManifest,
        rng: np.random.Generator,
        n_in: int,
        n_skipped: int,
        seq: np.ndarray,
    ) -> tuple[dict, PartitionManifest]:
        """Changed-cells DELTA path (round 3): every winning PARTIAL row
        enters the state chain as-is — "null = unchanged" can only be
        resolved against prior cells, and that resolution happens at fold
        time (``fold_cells``, read/compaction), so the epoch writes
        O(delta) rows instead of the round-2 full-state rewrite + pandas
        merge. Conflict semantics:

        - default (row-level): a ts-inverted partial update is rejected
          entirely (``conflict``), even for columns the newer event left
          untouched — a documented deviation from HBase pinned by the
          in-repo oracle;
        - ``per_cell=True``: HBase parity — no row-level rejection; every
          non-skipped event applies and each CELL resolves by (ts, seq)
          at fold time (a delete masks only older versions)."""
        conv = events.column("conv_id").to_numpy(zero_copy_only=False)
        ts_us = events.column("ts").cast(pa.int64()).to_numpy()
        is_del = events.column("op").to_numpy(zero_copy_only=False) == "D"
        codes, uniques = pd.factorize(conv, sort=False)
        kid = (codes.astype(np.int64) << 32) | events.column(
            "turn_idx"
        ).to_numpy().astype(np.int64)
        narrow = self._load_state_narrow(manifest)
        seed, prior_live = self._seed_maps(narrow, uniques)
        if self.per_cell:
            win = np.ones(len(kid), dtype=bool)
        else:
            win = self._sequential_win(kid, ts_us, seed)
        ctr = zero_counters()
        ctr["input_rows"] = n_in
        ctr["skipped"] = n_skipped
        ctr["applied"] = int(win.sum())
        ctr["conflict"] = int((~win).sum())
        ctr["deleted"] = int((win & is_del).sum())
        winners = events if win.all() else events.filter(pa.array(win))
        delta_state = self._events_as_state(winners)

        # liveness bookkeeping: the key's liveness flips to the epoch's
        # argmax-(ts, seq) winner — unless (per-cell mode) the prior state
        # version is NEWER, in which case it is unchanged.
        kid_w, ts_w = kid[win], ts_us[win]
        live_delta = 0
        if len(kid_w):
            seq_w = events.column("seq").to_numpy()[win]
            kmask = group_argmax_mask(kid_w, ts_w, seq_w)
            d_kid = kid_w[kmask]
            now_live = ~is_del[win][kmask]
            if len(prior_live):
                was = pd.Series(d_kid).map(prior_live).eq(True).to_numpy()
            else:
                was = np.zeros(len(d_kid), dtype=bool)
            if self.per_cell and len(seed):
                pri = pd.Series(d_kid).map(seed).to_numpy(dtype=np.float64)
                upd = ~(ts_w[kmask] < pri)  # NaN (no prior) compares False
            else:
                upd = np.ones(len(d_kid), dtype=bool)
            live_delta = int(np.where(upd, now_live, was).sum() - was.sum())

        # daily-delta side output: per-EVENT winning partial rows — a
        # documented exception to the net-image contract (ADVICE r2): a
        # per-(key, day) argmax would destroy cell granularity, and partial
        # patches are only meaningful event-by-event to a consumer.
        delta_rows = winners if self.delta_output else events.schema.empty_table()
        last_seq = int(seq.max()) if n_in else manifest.last_seq
        return self._commit(
            part_id, manifest, delta_state, delta_rows, ctr, last_seq, rng,
            chain=manifest.state_chain,
            live_rows=manifest.live_rows + live_delta,
        )

    def _apply_once_combined(
        self,
        part_id: int,
        group: pa.Table,
        manifest: PartitionManifest,
        rng: np.random.Generator,
    ) -> tuple[dict, PartitionManifest]:
        """Reducer for map-side-combined input (rayrep/combine.py): rows are
        the retained payload rows of each source batch plus (ts, seq, del)
        meta lists for every original event. Reproduces the exact
        sequential counters from the meta lists and folds winner payloads
        into state by the same LWW argmax. Every event that can be a state
        or day winner is present as a payload row (level-1 contiguous-range
        group argmax composed with level-2 prefix-max retention — see the
        combine module docstring), so both the state image and the
        per-(key,day) daily deltas are EXACTLY the per-event path's.
        Precondition (driver-enforced): no event seq is at or below this
        partition's committed watermark."""
        from rayrep.combine import COMBINE_META, DAY_US, _arr

        group = decode_transport(group)
        payload = group.drop_columns(COMBINE_META)
        pay_seq = payload.column("seq").to_numpy()
        pay_ts = payload.column("ts").cast(pa.int64()).to_numpy()
        pay_del = pc.equal(payload.column("op"), "D").to_numpy(zero_copy_only=False)
        # meta lists EXCLUDE each payload row's own (ts, seq, del) triple
        # (combine.py ships it once, in the payload columns) — reconstruct
        # the full event set by appending the payload rows' own triples
        m_seq = _arr(group.column("m_seq"))
        lens = pc.list_value_length(m_seq).to_numpy()
        all_seq = np.concatenate([pc.list_flatten(m_seq).to_numpy(), pay_seq])
        all_ts = np.concatenate(
            [pc.list_flatten(_arr(group.column("m_ts"))).to_numpy(), pay_ts])
        all_del = np.concatenate(
            [pc.list_flatten(_arr(group.column("m_del"))).to_numpy(
                zero_copy_only=False), pay_del])
        n_in = len(all_seq)
        if n_in and int(all_seq.min()) <= manifest.last_seq:
            raise RuntimeError(
                "combined round overlaps the committed watermark "
                f"(min seq {int(all_seq.min())} <= last_seq {manifest.last_seq}); "
                "the driver must disable map_combine for this round"
            )

        conv_row = group.column("conv_id").to_numpy(zero_copy_only=False)
        turn_row = group.column("turn_idx").to_numpy().astype(np.int64)
        codes_row, uniques = pd.factorize(conv_row, sort=False)
        kid_row = (codes_row.astype(np.int64) << 32) | turn_row

        ctr = zero_counters()
        ctr["input_rows"] = n_in
        narrow = self._load_state_narrow(manifest)
        seed, prior_live = self._seed_maps(narrow, uniques)
        if n_in:
            kid = np.concatenate([np.repeat(kid_row, lens), kid_row])
            order = np.argsort(all_seq, kind="stable")
            win_s = self._sequential_win(kid[order], all_ts[order], seed)
            win = np.empty(n_in, dtype=bool)
            win[order] = win_s  # back to flattened-meta order
            ctr["applied"] = int(win.sum())
            ctr["conflict"] = int((~win).sum())
            ctr["deleted"] = int((win & all_del).sum())
            # each payload row is a real event; its win bit is found by
            # seq (seqs are globally unique)
            row_win = win_s[np.searchsorted(all_seq[order], pay_seq)]
            # per-key argmax payload row = the key's new state iff it won.
            # (Sound: the global per-key argmax is a weak prefix max of its
            # batch, so it is always present among payload rows, and if it
            # loses — only possible to the prior-state seed — every event
            # of the key loses.)
            smask = group_argmax_mask(kid_row, pay_ts, pay_seq) & row_win
            d_kid = kid_row[smask]
            if self.delta_output:
                # daily delta = per (key, utc-day) argmax among the rows
                # that WON sequentially — EXACT: every event that can win
                # is retained as a payload row (prefix-max retention), and
                # row_win is its true sequential win bit, so this argmax
                # equals the per-event path's day winner.
                wi = np.flatnonzero(row_win)
                dmask = group_argmax_mask(
                    kid_row[wi], pay_ts[wi], pay_seq[wi], day=pay_ts[wi] // DAY_US
                )
                wmask = np.zeros(len(pay_seq), dtype=bool)
                wmask[wi[dmask]] = True
                winners = payload.filter(pa.array(wmask))
                # state rows ⊆ day winners (the key argmax is its last
                # day's winner) → re-select from the small winners table
                delta_state = self._events_as_state(
                    winners.filter(pa.array(smask[wmask]))
                )
            else:
                winners = payload.schema.empty_table()
                delta_state = self._events_as_state(payload.filter(pa.array(smask)))
        else:
            delta_state = self._state_schema().empty_table()
            d_kid = np.empty(0, dtype=np.int64)
            winners = payload.schema.empty_table()

        live_delta = self._live_delta(delta_state, d_kid, prior_live)
        last_seq = int(all_seq.max()) if n_in else manifest.last_seq
        return self._commit(
            part_id, manifest, delta_state, winners, ctr, last_seq, rng,
            chain=manifest.state_chain, live_rows=manifest.live_rows + live_delta,
        )

    def _commit(
        self,
        part_id: int,
        manifest: PartitionManifest,
        new_state: pa.Table,
        delta_events: pa.Table,
        ctr: dict,
        last_seq: int,
        rng: np.random.Generator,
        chain: list[str] | None,
        live_rows: int,
    ) -> tuple[dict, PartitionManifest]:
        """Durable effects, all deterministic-name + tmp/rename (a chaos
        retry overwrites, never appends). ``chain=None`` → ``new_state`` is
        a FULL image replacing the chain; otherwise ``new_state`` is this
        epoch's DELTA appended to ``chain`` — unless that would exceed
        ``compact_interval``, in which case the chain is folded here and a
        full image is written instead (minor compaction)."""
        if ctr["applied"] + ctr["skipped"] + ctr["conflict"] != ctr["input_rows"]:
            # metrics-gated checkpoint (CHANGES.txt:113-116): refuse to
            # commit — a real `raise`, not an assert, so `python -O` cannot
            # compile the exactly-once gate away
            raise RuntimeError(f"A3 invariant violated for p{part_id}: {ctr}")

        if chain is None:
            out, new_chain = new_state, []
        elif new_state.num_rows == 0:
            out, new_chain = None, list(chain)  # nothing changed: no new file
        elif len(chain) + 1 > self.compact_interval:
            # fold conforms EACH file before concat: a rename between delta
            # epochs would otherwise strand the pre-rename rows' payload in
            # a dead column and silently null it
            if self.changed_cells:
                # cells compaction is the version-PRESERVING prune, not a
                # one-row collapse: each cell's winning row keeps its own
                # (ts, __seq), so post-compaction late events still resolve
                # against true per-cell versions (HBase parity; see
                # prune_cells)
                acc = _chain_tables(self.lake_dir, chain, self.target)
                comb = pa.concat_tables([acc, self._conform_state(new_state)])
                out = prune_cells(comb, self.payload_cols)
                live_rows = _live_count_cells(out)  # exact recount
            else:
                folded = fold_state_chain(self.lake_dir, chain, self.target)
                comb = pa.concat_tables([folded, self._conform_state(new_state)])
                out = comb.filter(pa.array(last_per_key_mask(comb)))
                live_rows = _live_count(out)  # exact recount at compaction
            new_chain = []
        else:
            out, new_chain = new_state, list(chain)

        max_ts = manifest.max_ts_us
        if out is not None:
            from rayrep.schema import stamp_version

            spath = state_path(self.lake_dir, part_id, self.epoch)
            os.makedirs(os.path.dirname(spath), exist_ok=True)
            tmp = spath + ".tmp"
            # record the schema version this file is written under: chain
            # conformance across later DDLs is version-exact, not by-name
            pq.write_table(stamp_version(out, self.target.version), tmp)
            if self.durable_sync:  # data durable BEFORE the manifest references it
                _fsync_path(tmp)
            self._maybe_chaos(rng)  # crash point A: state written but not visible
            os.replace(tmp, spath)
            if self.durable_sync:
                _fsync_path(os.path.dirname(spath))
            new_chain.append(os.path.relpath(spath, self.lake_dir))
            if out.num_rows:
                m = pc.max(out["ts"]).value
                if m is not None:
                    max_ts = max(max_ts, int(m))
        if self.delta_output:
            # drop uncommitted delta leftovers for this partition (epoch >
            # committed): a crash plus a changed epochs_per_round would
            # otherwise strand an orphan file double-counting these changes.
            # Per-partition subdir → the scan is O(this partition's files),
            # and the lake never accumulates one giant flat directory.
            for p in glob.glob(os.path.join(
                    self.lake_dir, "delta", f"p{part_id:05d}", "e*.parquet")):
                e = int(re.search(r"e(\d+)\.parquet$", p).group(1))
                if e > manifest.epoch:
                    os.remove(p)
            if delta_events.num_rows:
                self._write_delta(part_id, delta_events)
        self._maybe_chaos(rng)  # crash point B: state visible, manifest not

        merged = merge_counters(manifest.counters, ctr)
        from rayrep.manifests import MANIFEST_HISTORY_MAX

        history = (manifest.history + [{
            "epoch": self.epoch, "last_seq": last_seq, "live_rows": live_rows,
            "max_ts_us": max_ts, "counters": merged, "epoch_counters": ctr,
            "chain": list(new_chain),
        }])[-MANIFEST_HISTORY_MAX:]
        new_manifest = PartitionManifest(
            part_id=part_id,
            epoch=self.epoch,
            last_seq=last_seq,
            state_chain=new_chain,
            live_rows=live_rows,
            counters=merged,
            epoch_counters=ctr,
            max_ts_us=max_ts,
            lease_token=self.lease_token,
            history=history,
        )
        new_manifest.save(self.lake_dir)  # atomic commit — the epoch frontier
        return ctr, new_manifest

    def _maybe_chaos(self, rng: np.random.Generator) -> None:
        if self.chaos_fraction > 0 and rng.random() < self.chaos_fraction:
            raise ChaosError("injected applier failure")

    def _seed_maps(
        self, narrow: pa.Table, uniques, with_live: bool = True
    ) -> tuple[pd.Series, pd.Series]:
        """(per-key prior ts, per-key prior liveness) for keys touched this
        epoch, keyed in the batch factorization space — built from the
        NARROW chain fold (4 columns; the payload never leaves disk)."""
        if not narrow.num_rows:
            return pd.Series(dtype=np.int64), pd.Series(dtype=bool)
        st_conv = narrow.column("conv_id").to_pandas()
        st_codes = pd.Categorical(st_conv, categories=uniques).codes.astype(np.int64)
        st_mask = st_codes >= 0
        st_kid = (st_codes[st_mask] << 32) | narrow.column("turn_idx").to_numpy()[
            st_mask
        ].astype(np.int64)
        st_ts = narrow.column("ts").cast(pa.int64()).to_numpy()[st_mask]
        seed = pd.Series(st_ts, index=st_kid)
        seed = seed[~seed.index.duplicated()]
        if not with_live:  # changed-cells path needs only the ts seed
            return seed, pd.Series(dtype=bool)
        st_dead = narrow.column("__deleted").to_numpy(zero_copy_only=False)[st_mask]
        live = pd.Series(~st_dead, index=st_kid)
        return seed, live[~live.index.duplicated()]

    def _live_delta(self, delta_state: pa.Table, d_kid: np.ndarray,
                    prior_live: pd.Series) -> int:
        """Incremental live-row bookkeeping: Σ(now live) − Σ(was live) over
        the keys this epoch changed — no full-state scan per epoch.
        ``d_kid`` = the delta rows' key ids in the epoch factorization
        space (passed through; never re-factorized)."""
        if delta_state.num_rows == 0:
            return 0
        now_live = ~delta_state.column("__deleted").to_numpy(zero_copy_only=False)
        if len(prior_live):
            # .eq(True) treats unseen keys (NaN) as not-live without the
            # deprecated object->bool fillna downcast.
            n_was = int(pd.Series(d_kid).map(prior_live).eq(True).sum())
        else:
            n_was = 0
        return int(now_live.sum()) - n_was

    @staticmethod
    def _sequential_win(kid_s: np.ndarray, ts_s: np.ndarray, seed: pd.Series) -> np.ndarray:
        """win[i] ⇔ event i (inputs MUST be in seq order) has ts >= the
        running per-key max seeded from prior state — exactly the
        one-event-at-a-time semantics. Fast path: numpy segmented prefix
        max (one stable lexsort + one accumulate — no pandas DataFrame
        build, the hot-path profile's biggest Python cost); falls back to
        pandas grouped cummax when seg_count × ts_range would overflow the
        int64 offset trick."""
        n = len(kid_s)
        if n == 0:
            return np.zeros(0, dtype=bool)
        ts_i = ts_s.astype(np.int64, copy=False)
        order = np.lexsort((np.arange(n), kid_s))  # stable: keeps seq order per key
        ks, to = kid_s[order], ts_i[order]
        first = np.ones(n, dtype=bool)
        first[1:] = ks[1:] != ks[:-1]
        seg_id = (np.cumsum(first) - 1).astype(np.int64)
        nseg = int(seg_id[-1]) + 1
        tmin = int(to.min())
        R = int(to.max()) - tmin + 2
        if nseg * R < 2**62:
            comp = seg_id * np.int64(R) + (to - tmin + 1)
            incl = np.maximum.accumulate(comp) - seg_id * np.int64(R) - 1 + tmin
            prev = np.empty(n, dtype=np.float64)
            prev[0] = -np.inf
            prev[1:] = incl[:-1]
            prev[first] = -np.inf
            starts = np.flatnonzero(first)
            seg_len = np.diff(np.append(starts, n))
            if len(seed):
                sv = seed.reindex(ks[starts]).to_numpy(dtype=np.float64, na_value=-np.inf)
            else:
                sv = np.full(nseg, -np.inf)
            win_o = to >= np.fmax(prev, np.repeat(sv, seg_len))
            win = np.empty(n, dtype=bool)
            win[order] = win_o
            return win
        ev = pd.DataFrame({"kid": kid_s, "ts": ts_s})
        g = ev.groupby("kid", sort=False)["ts"]
        cm = g.cummax()
        prev_cm = cm.groupby(ev["kid"], sort=False).shift(1)
        state_ts = ev["kid"].map(seed)
        prev_max = np.fmax(
            prev_cm.to_numpy(dtype=np.float64, na_value=-np.inf),
            state_ts.to_numpy(dtype=np.float64, na_value=-np.inf),
        )
        return ts_s >= prev_max

    def _events_as_state(self, events: pa.Table) -> pa.Table:
        return events_as_state(events, self.payload_cols)

    NARROW_COLS = ["conv_id", "turn_idx", "ts", "__deleted"]

    def _state_schema(self) -> pa.Schema:
        return state_schema(self.target)

    def _conform_state(self, state: pa.Table) -> pa.Table:
        return conform_state(state, self.target)

    def _load_state_narrow(self, manifest: PartitionManifest) -> pa.Table:
        if not manifest.state_chain:
            return pa.schema(
                [
                    pa.field("conv_id", pa.string()),
                    pa.field("turn_idx", pa.int32()),
                    pa.field("ts", pa.timestamp("us")),
                    pa.field("__deleted", pa.bool_()),
                ]
            ).empty_table()
        return fold_state_files(
            [os.path.join(self.lake_dir, f) for f in manifest.state_chain],
            columns=self.NARROW_COLS + (["__seq"] if self.per_cell else []),
            by_version=self.per_cell,
        )

    # ------------------------------------------------------------ side output
    def _write_delta(self, part_id: int, events: pa.Table) -> None:
        """Daily-delta side output (S7): the NET applied image per
        (key, utc-day) for this epoch — conflict losers never changed lake
        state and are excluded; intermediate same-day versions collapse to
        the day's winner (one contract for BOTH the combined and per-event
        paths, so resume fallbacks never mix granularities) — stamped with
        a forced-UTC yyyymmdd (CHANGES.txt:123,55). One deterministic file
        per (partition, epoch) so retries overwrite."""
        date = pc.strftime(events.column("ts"), format="%Y%m%d")
        out = events.append_column("change_date", date)
        ddir = os.path.join(self.lake_dir, "delta", f"p{part_id:05d}")
        os.makedirs(ddir, exist_ok=True)
        path = os.path.join(ddir, f"e{self.epoch:05d}.parquet")
        write_parquet_atomic(out, path, durable=self.durable_sync)

    def _summary(
        self,
        part_id: int,
        ctr: dict,
        manifest: PartitionManifest,
        already: bool,
        retries: int,
    ) -> pa.Table:
        live = manifest.live_rows  # maintained incrementally; no state scan
        return pa.table(
            {
                "part_id": pa.array([part_id], pa.int32()),
                "epoch": pa.array([self.epoch], pa.int32()),
                "input_rows": pa.array([ctr["input_rows"]], pa.int64()),
                "applied": pa.array([ctr["applied"]], pa.int64()),
                "skipped": pa.array([ctr["skipped"]], pa.int64()),
                "conflict": pa.array([ctr["conflict"]], pa.int64()),
                "deleted": pa.array([ctr["deleted"]], pa.int64()),
                "live_rows": pa.array([live], pa.int64()),
                "max_ts_us": pa.array([manifest.max_ts_us], pa.int64()),
                "already_committed": pa.array([already], pa.bool_()),
                "chaos_retries": pa.array([retries], pa.int64()),
            },
            schema=SUMMARY_SCHEMA,
        )
