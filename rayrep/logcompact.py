"""Kafka-style changelog compaction: collapse a committed epoch span to
the minimal event set that still replays to the same final table.

Reference anchor: the reference's changelog is MySQL's binlog, whose only
retention tools are rotation + expiry (`trim_changelog` is that analog —
but a trimmed log can never serve a FRESH consumer again).  The public
answer to "the log is the biggest artifact in the system but consumers
only need the latest state per key" is Kafka's compacted topic
(log.cleanup.policy=compact): keep, per key, at least the newest record
(plus the tombstone if the key was deleted), so log storage becomes
O(live keys) instead of O(history) while every replay-from-zero still
converges to the exact same table.  At the 10^10-event design scale this
is the difference between an unboundedly growing log and one the size of
the lake itself.

Semantics (row mode, the default):

- retained per (conv_id, turn_idx): the single argmax-(ts, seq) event —
  the row the engine's LWW would end on.  Deletes are retained AS
  TOMBSTONES (op='D'), exactly like Kafka, so a resuming lake that
  already holds the key learns the deletion.
- every DDL event in the span is retained with its original seq, so a
  fresh replay rebuilds the identical schema-version chain (version
  numbers are cumulative DDL counts — dropping one would renumber every
  later version).
- retained events keep their ORIGINAL (seq, ts, txn_id): seq preserves
  the per-partition watermark anti-join (a resuming lake skips exactly
  the events it already applied), ts preserves LWW and the daily-delta
  day suffix.
- payload is pre-evolved to the span's FINAL schema version (the same
  stepwise ``evolve_table_from`` the augmenter would apply), so the span
  is single-physical-schema and replays through the common no-history
  fast path.  This is lossless: replaying event e (written under version
  v) through the full log evolves its payload v → final stepwise; the
  compactor just does it eagerly.

``mode="cells"`` (changed-cells logs, where a null payload cell means
"unchanged" — CHANGES.txt:173): latest-per-key would LOSE older events
that still own some cell's winning value, so retention is per-cell: each
payload column's argmax-(ts, seq) non-null carrier, the key's last
delete, and the key's last event — ``rayrep.apply.prune_cells``, the
version-preserving minimal row set the per-cell fold is invariant under
(property-tested there).  A row-compacted span replayed with
``changed_cells_updates=True`` is refused (`CompactedLogError`);
the converse is safe (cells retention is a superset of row retention
and both end on the key's argmax row).

Convergence from ANY barrier (why resume needs no special case): for a
lake at barrier b inside the span, every retained event with
seq <= watermark was already applied (epochs are contiguous seq slices,
so the watermark cleanly separates committed history) and is skipped by
the anti-join; every retained event above the watermark wins against the
lake's current row for its key (it is the key's overall argmax, and the
sequential-win rule admits any ts >= the seeded state ts); discarded
events above the watermark were ts-losers that the full replay would
have rejected as conflicts anyway.  Counters differ (fewer input rows —
inherent to compaction); the converged table is bit-identical, which is
the contract the SQL oracle pins.

What compaction FORFEITS (and how readers are protected): point-in-time
reconstruction below the span's ts horizon (``as_of`` with
``ts < max_ts_us`` raises ``CompactedLogError`` — intermediate versions
are gone) and per-epoch metrics granularity inside the span (it replays
as ONE round).  ``replay(end_epoch=k)`` with k strictly inside a span is
refused for the same reason — the span cannot be split.

Crash safety is monotone, like ``trim_changelog``: the span directory
``epoch-{first:05d}-c{last:05d}/`` is staged under a temp name and
RENAMED into place (a brand-new name — nothing is displaced), and from
that instant ``discover_epochs`` prefers it and shadows the plain epochs
it covers; deleting the originals afterwards is pure garbage collection
(re-running the compactor completes it idempotently).  A crash at any
point leaves a log that replays correctly.

Scale shape: one pruned pass over the span (read → per-batch evolve →
hash exchange on conv_id → per-group vectorized reduction → one part
file per reduce task, written by the task on the shared filesystem); the
driver holds only O(tasks) summary rows and the DDL rows (tiny).  The
reduce fan-out is sized from the span's byte size, independent of any
lake's partition count.
"""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from rayrep.hashing import partition_ids
from rayrep.manifests import CompactedLogError, atomic_rename
from rayrep.schema import (
    META_COLUMNS,
    SchemaVersion,
    apply_ddl,
    evolve_table_from,
)

SPAN_META = "_span.json"
# target bytes per reduce task (compressed parquet in, roughly state out)
_BYTES_PER_TASK = 256 << 20


def span_meta(path: str) -> dict | None:
    """The ``_span.json`` of a compacted span dir, or None for a plain
    epoch (file or dir)."""
    p = os.path.join(path, SPAN_META)
    if os.path.isdir(path) and os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _hashsum_seqs(seqs: np.ndarray) -> np.uint64:
    """Same mul-mod hash-sum family as rayrep.checklog (KMV multiplier),
    so check-log can verify a span's retained multiset end to end."""
    from rayrep.ops.sketch import KMV_MULT

    return np.sum(seqs.astype(np.uint64, copy=False) * KMV_MULT,
                  dtype=np.uint64)


def _span_files(paths: list[str]) -> list[str]:
    out = []
    for p in paths:
        if p.endswith(".parquet"):
            out.append(p)
        else:
            out.extend(sorted(glob.glob(os.path.join(p, "*.parquet"))))
    return out


def _file_footer_stats(files: list[str]) -> dict:
    """Driver-side footer-only pass: per-file row counts, seq min/max and
    stamped schema_ver range. O(files) metadata reads, zero data bytes."""
    info = {"n_rows": 0, "seq_lo": None, "seq_hi": None,
            "ver_lo": None, "file_ver": {}}
    for fp in files:
        md = pq.read_metadata(fp)
        names = md.schema.to_arrow_schema().names
        info["n_rows"] += md.num_rows
        si = names.index("seq") if "seq" in names else None
        vi = names.index("schema_ver") if "schema_ver" in names else None
        fver = None
        for rg in range(md.num_row_groups):
            if si is not None:
                st = md.row_group(rg).column(si).statistics
                if st is not None and st.has_min_max:
                    info["seq_lo"] = st.min if info["seq_lo"] is None \
                        else min(info["seq_lo"], st.min)
                    info["seq_hi"] = st.max if info["seq_hi"] is None \
                        else max(info["seq_hi"], st.max)
            if vi is not None:
                st = md.row_group(rg).column(vi).statistics
                if st is not None and st.has_min_max:
                    fver = st.max if fver is None else max(fver, st.max)
        info["file_ver"][fp] = fver  # None when stats are absent
    return info


def _ddl_already_reflected(cur: SchemaVersion, ddl_json: str) -> bool:
    """True when ``cur``'s PHYSICAL schema already shows this DDL's
    effect: add of a column that exists (same type), drop of a column
    that's absent, rename whose destination exists and source doesn't,
    alter to the type the column already has."""
    import json as _json

    from rayrep.schema import type_from_name

    d = _json.loads(ddl_json)
    a, names = d["action"], cur.schema.names
    if a == "add_column":
        i = cur.schema.get_field_index(d.get("name", ""))
        return i >= 0 and cur.schema.field(i).type == type_from_name(
            d.get("type", "string"))
    if a == "drop_column":
        return d.get("name") not in names
    if a == "rename_column":
        return d.get("to") in names and d.get("from") not in names
    if a == "alter_type":
        i = cur.schema.get_field_index(d.get("name", ""))
        return i >= 0 and cur.schema.field(i).type == type_from_name(
            d["type"])
    return False


def _build_history(files: list[str], ddl_tbl: pa.Table | None) -> tuple[
        dict[int, SchemaVersion], SchemaVersion]:
    """Reconstruct the schema-version chain the replay registry would
    hold, from the span alone: the base physical version is inferred
    from a file stamped at the lowest version present (the changelog
    contract — a file's physical schema is the one active at its newest
    event — makes that file's payload columns BE that version's schema),
    then the span's DDL rows (sorted by seq, each stamped with the
    version it creates) extend the chain exactly as
    ``SchemaRegistry.apply_ddl_events`` would."""
    stats = _file_footer_stats(files)
    # lowest PHYSICAL version with a known stamp; fall back to reading one
    # file's stamp when stats are missing
    base_fp, base_ver = None, None
    for fp, v in stats["file_ver"].items():
        if v is None:
            t = pq.read_table(fp, columns=["schema_ver"])
            v = pc.max(t["schema_ver"]).as_py()
            if v is None:
                continue
        if base_ver is None or v < base_ver:
            base_fp, base_ver = fp, int(v)
    if base_fp is None:
        raise CompactedLogError(
            "cannot infer the span's base schema version: no file carries "
            "a schema_ver stamp")
    phys = pq.read_schema(base_fp)
    payload = [f for f in phys
               if f.name not in META_COLUMNS and f.name != "part_id"]
    base = SchemaVersion(base_ver, pa.schema(payload))
    history = {base.version: base}
    cur = base
    if ddl_tbl is not None and ddl_tbl.num_rows:
        for seq, sv, dj in zip(ddl_tbl["seq"].to_pylist(),
                               ddl_tbl["schema_ver"].to_pylist(),
                               ddl_tbl["ddl"].to_pylist()):
            if sv is not None and int(sv) <= base.version:
                # a prior compaction pre-evolved every file past this DDL
                # (it created a version at/below the base physical
                # version); it rides the span for the replay registry's
                # version numbering but contributes nothing to payload
                # evolution here
                continue
            if _ddl_already_reflected(cur, dj):
                # the inferred base PHYSICALLY reflects this DDL already —
                # legitimate when a producer slices one final-schema table
                # into epochs (pre-DDL files carry the evolved columns as
                # nulls, stamped with the old version). The version number
                # still advances (numbering = cumulative DDL count); the
                # payload transform is a no-op.
                nxt = SchemaVersion(cur.version + 1, cur.schema,
                                    dict(cur.renames))
            else:
                nxt = apply_ddl(cur, dj)
            if sv is not None and int(sv) != nxt.version:
                raise CompactedLogError(
                    f"DDL event at seq {seq} is stamped schema_ver={sv} "
                    f"but replays to version {nxt.version} — the span's "
                    "version chain is inconsistent; refusing to compact")
            history[nxt.version] = nxt
            cur = nxt
    return history, cur


def _evolve_route_batch(batch: pa.Table, kwargs: dict) -> pa.Table:
    """Map stage: drop DDL rows, pre-evolve payload to the final schema
    (stepwise, from each row's stamped source version), re-stamp, and
    route by hash(conv_id).

    Ray Data 2.49 never emits a batch mixing files at different physical
    schema versions (probed up to 301-file spans straddling a rename
    DDL), but that is a batching-internals detail, not a contract — so a
    mixed batch is handled correctly by splitting per distinct
    ``schema_ver`` and evolving each slice at its own stamped version,
    instead of silently evolving the whole batch from max(schema_ver)
    (which would drop renamed-column data for older rows)."""
    history = {v: SchemaVersion.from_json(j)
               for v, j in kwargs["history_json"].items()}
    final: SchemaVersion = history[kwargs["final_version"]]
    n_tasks: int = kwargs["n_tasks"]
    if "op" in batch.column_names:
        batch = batch.filter(pc.not_equal(batch["op"], "DDL"))
    if batch.num_rows == 0:
        return _empty_routed(final)
    svers = batch.column("schema_ver")
    vmin, vmax = pc.min(svers).as_py(), pc.max(svers).as_py()
    if vmin is not None and vmax is not None and vmin != vmax:
        parts = [
            _evolve_route_batch(batch.filter(pc.equal(svers, v)), kwargs)
            for v in sorted(v for v in pc.unique(svers).to_pylist()
                            if v is not None)
        ]
        if pc.any(pc.is_null(svers)).as_py():
            parts.append(
                _evolve_route_batch(batch.filter(pc.is_null(svers)), kwargs))
        return pa.concat_tables(parts)
    meta = {c: (batch.column(c) if c in batch.column_names
                else pa.nulls(batch.num_rows, pa.int64()))
            for c in ("seq", "txn_id", "op")}
    if "op" not in batch.column_names:  # pure-insert logs (bootstrap dumps)
        meta["op"] = pa.array(["I"] * batch.num_rows)
    payload = batch.drop_columns(
        [c for c in META_COLUMNS + ["part_id"] if c in batch.column_names])
    src = pc.max(batch.column("schema_ver")).as_py()
    if src is not None and int(src) < final.version:
        if int(src) in history:
            # a slice of a (schema-unified) mixed batch carries null
            # padding for columns its version never had physically;
            # restrict to the stamped version's own fields so a later
            # rename step can't collide with a padded destination column
            own = [f.name for f in history[int(src)].schema
                   if f.name in payload.column_names]
            if len(own) != payload.num_columns:
                payload = payload.select(own)
        payload = evolve_table_from(payload, int(src), final, history)
    else:
        # already at the final version: conform column order only
        payload = payload.select([f.name for f in final.schema])
    out = pa.table({**meta, "schema_ver": pa.array(
        np.full(batch.num_rows, final.version, np.int32))})
    for f in final.schema:
        out = out.append_column(f.name, payload.column(f.name))
    out = out.append_column(
        "part_id", pa.array(partition_ids(out.column("conv_id"), n_tasks)))
    return out


def _empty_routed(final: SchemaVersion) -> pa.Table:
    fields = [pa.field("seq", pa.int64()), pa.field("txn_id", pa.int64()),
              pa.field("op", pa.string()), pa.field("schema_ver", pa.int32())]
    fields += list(final.schema)
    fields.append(pa.field("part_id", pa.int32()))
    return pa.schema(fields).empty_table()


def retain_latest(tbl: pa.Table) -> pa.Table:
    """Row-mode retention kernel: each (conv_id, turn_idx) key's
    argmax-(ts, seq) event — the row the engine's LWW would end on.
    Invariant (property-tested): for any split of an event stream,
    ``replay(retain_latest(prefix) ∪ suffix) == replay(prefix ∪ suffix)``
    on the final state — retention keeps exactly the prefix's converged
    state image, and sequential-win continuation depends only on state."""
    import pandas as pd

    n_bad = (pc.sum(pc.is_null(tbl.column("conv_id"))).as_py() or 0) + (
        pc.sum(pc.is_null(tbl.column("turn_idx"))).as_py() or 0)
    if n_bad:
        # Mirror the augmenter's malformed-event refusal: folding a
        # null-key row into (conv, turn 0) could displace that key's
        # legitimate LWW winner during compaction. Route such logs
        # through replay with dead_letter quarantine first.
        raise CompactedLogError(
            f"{n_bad} event(s) with null conv_id/turn_idx in the span; "
            "refusing to compact — quarantine or repair the malformed "
            "rows first (replay with dead_letter set)"
        )
    conv = tbl.column("conv_id").to_numpy(zero_copy_only=False)
    codes, _ = pd.factorize(conv, sort=False)
    kid = (codes.astype(np.int64) << 32) | tbl.column("turn_idx").to_numpy(
        zero_copy_only=False).astype(np.int64)
    ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
    seqv = tbl.column("seq").to_numpy()
    order = np.lexsort((seqv, ts, kid))
    ks = kid[order]
    last = np.ones(len(ks), dtype=bool)
    last[:-1] = ks[1:] != ks[:-1]
    return tbl.take(pa.array(order[last]))


def retain_cells(tbl: pa.Table, payload_names: list[str]) -> pa.Table:
    """Cells-mode retention kernel: the version-preserving per-cell
    winner set (``rayrep.apply.prune_cells`` over the event rows)."""
    from rayrep.apply import prune_cells

    work = tbl.append_column("__seq", tbl.column("seq"))
    work = work.append_column("__deleted", pc.equal(tbl.column("op"), "D"))
    work = prune_cells(work, payload_names)
    return work.drop_columns(["__seq", "__deleted"])


def _reduce_group(group: pa.Table, kwargs: dict) -> pa.Table:
    """Reduce stage (one hash partition): retain the minimal replay-
    equivalent event set, write it as one part file of the staged span,
    return a one-row summary. Fully vectorized."""
    import uuid

    mode: str = kwargs["mode"]
    stage_dir: str = kwargs["stage_dir"]
    payload_names: list[str] = kwargs["payload_names"]
    if group.num_rows == 0:
        return _summary_row(-1, 0, 0, 0, 0, 0)
    pid = int(group.column("part_id")[0].as_py())
    max_ts = pc.max(group.column("ts")).as_py()
    max_ts_us = int(pa.scalar(max_ts, pa.timestamp("us")).cast(
        pa.int64()).as_py()) if max_ts is not None else 0
    n_in = group.num_rows
    tbl = group.drop_columns(["part_id"])
    n_dropped = 0
    if kwargs.get("drop_malformed"):
        # dead-letter interop: a lake replaying this log QUARANTINES
        # null-key events, but the changelog retains them — dropping the
        # same rows here (same predicate as the augmenter's quarantine)
        # keeps the span replay-equivalent for that lake, and lets a
        # poisoned log compact at all (retain_latest refuses otherwise)
        bad = pc.is_null(tbl.column("conv_id"))
        for c in ("turn_idx", "ts", "seq"):
            bad = pc.or_(bad, pc.is_null(tbl.column(c)))
        n_dropped = pc.sum(bad).as_py() or 0
        if n_dropped:
            tbl = tbl.filter(pc.invert(bad))
            if tbl.num_rows == 0:
                return _summary_row(pid, n_in, 0, 0, max_ts_us, n_dropped)
    if mode == "cells":
        kept = retain_cells(tbl, payload_names)
    else:
        kept = retain_latest(tbl)
    kept = kept.sort_by("seq")
    # null `ddl` column: changelog file convention (and it keeps the
    # metadata-pruned DDL scan footer-only on the span)
    kept = kept.append_column("ddl", pa.nulls(kept.num_rows, pa.string()))
    seqs = kept.column("seq").to_numpy()
    hs = int(np.int64(_hashsum_seqs(seqs)))
    tmp = os.path.join(stage_dir, f".part-{pid:05d}.{uuid.uuid4().hex}.tmp")
    pq.write_table(kept, tmp)
    os.replace(tmp, os.path.join(stage_dir, f"part-{pid:05d}.parquet"))
    return _summary_row(pid, n_in, kept.num_rows, hs, max_ts_us, n_dropped)


def _summary_row(pid: int, n_in: int, n_out: int, hashsum: int,
                 max_ts_us: int, n_dropped: int = 0) -> pa.Table:
    return pa.table({
        "part_id": pa.array([pid], pa.int32()),
        "n_in": pa.array([n_in], pa.int64()),
        "n_out": pa.array([n_out], pa.int64()),
        "hashsum": pa.array([hashsum], pa.int64()),
        "max_ts_us": pa.array([max_ts_us], pa.int64()),
        "n_dropped": pa.array([n_dropped], pa.int64()),
    })


def _gc_shadowed(changelog_dir: str, first: int, last: int,
                 span_path: str) -> list[str]:
    """Delete plain epochs and older spans fully covered by [first, last]
    (everything the new span shadows). Trash-rename first so each entry
    disappears atomically from a live tailer's glob."""
    from rayrep.pipeline import EPOCH_RE, SPAN_RE

    removed = []
    for p in sorted(glob.glob(os.path.join(changelog_dir, "epoch-*"))):
        if os.path.abspath(p) == os.path.abspath(span_path):
            continue
        m2 = SPAN_RE.search(p)
        if m2 is not None:
            f2, l2 = int(m2.group(1)), int(m2.group(2))
            covered = first <= f2 and l2 <= last
        else:
            m = EPOCH_RE.search(p)
            if not m or not (os.path.isdir(p) or p.endswith(".parquet")):
                continue
            e = int(m.group(1))
            covered = first <= e <= last
        if not covered:
            continue
        trash = os.path.join(os.path.dirname(p),
                             f"_trash-{os.path.basename(p)}")
        os.replace(p, trash)
        if os.path.isdir(trash):
            shutil.rmtree(trash)
        else:
            os.remove(trash)
        removed.append(p)
    return removed


def compact_changelog(
    changelog_dir: str,
    through_epoch: int | None = None,
    lake_dir: str | None = None,
    mode: str = "row",
    num_tasks: int | None = None,
    drop_malformed: bool = False,
) -> dict:
    """Compact epochs ``[first, through_epoch]`` into one span directory.

    ``through_epoch`` defaults to last-but-one (the active tail epoch is
    never compacted — Kafka's active-segment rule — so a live tailer's
    frontier is untouched).  With ``lake_dir`` the span must be at or
    below that lake's committed barrier (live-tailer safety: a leased
    tailer only reads epochs above its barrier); without it the caller
    asserts no consumer is mid-span (a fresh replay of the result is
    always correct either way).
    """
    if mode not in ("row", "cells"):
        raise ValueError(f"mode must be 'row' or 'cells', got {mode!r}")
    from rayrep.pipeline import discover_epochs, ddl_rows_table

    epochs = discover_epochs(changelog_dir)
    if not epochs:
        raise ValueError(f"no epochs in {changelog_dir}")
    if through_epoch is None:
        through_epoch = epochs[-1][0] - 1
    if through_epoch >= epochs[-1][0]:
        raise ValueError(
            f"through_epoch={through_epoch} would compact the active tail "
            f"epoch {epochs[-1][0]} — compact at most last-1")
    span = [(e, p) for e, p in epochs if e <= through_epoch]
    if not span:
        raise ValueError(
            f"nothing to compact: no epochs <= {through_epoch}")
    first = min(e if span_meta(p) is None else span_meta(p)["first_epoch"]
                for e, p in span)
    prior_mode = None
    for e, p in span:
        sm = span_meta(p)
        if sm is not None:
            prior_mode = sm["mode"]
    if prior_mode == "row" and mode == "cells":
        raise CompactedLogError(
            "the existing span was row-compacted — per-cell history is "
            "already gone; a cells-mode recompaction cannot restore it")
    # idempotent re-run / gc completion: an identical span already exists
    existing = os.path.join(changelog_dir,
                            f"epoch-{first:05d}-c{through_epoch:05d}")
    if os.path.isdir(existing) and span_meta(existing) is not None:
        meta = span_meta(existing)
        if meta["mode"] != mode:
            # same-range mode change cannot swap the span dir atomically
            # (the name is taken); compacting through a later epoch
            # absorbs this span under a new name instead
            raise CompactedLogError(
                f"span {existing} already exists with mode="
                f"{meta['mode']!r}; recompact through a LATER epoch to "
                f"change retention mode")
        removed = _gc_shadowed(changelog_dir, first, through_epoch, existing)
        return {**meta, "already_compacted": True, "gc_removed": removed}
    if lake_dir is not None:
        from rayrep.manifests import EpochManifest

        em = EpochManifest.load(lake_dir)
        if em.last_epoch < through_epoch:
            raise ValueError(
                f"lake {lake_dir} has only committed through epoch "
                f"{em.last_epoch} < through_epoch={through_epoch}; a live "
                "tailer may still be reading the span — commit further or "
                "compact without lake_dir")
    files = _span_files([p for _, p in span])
    if not files:
        raise ValueError("span has no parquet files")
    for fp in files[:1] + files[-1:]:
        if "table" in pq.read_schema(fp).names:
            raise CompactedLogError(
                "multi-table changelog (a `table` column is present): "
                "row compaction must retain latest-per-(table, key), and "
                "schema evolution is per table — compact each table's "
                "exported log instead (rayrep/multitable.py)")
    stats = _file_footer_stats(files)
    # a prior span's files hold only RETAINED seqs — its ORIGINAL seq
    # range (needed for epoch chaining in check-log) rides its meta
    for _, p in span:
        sm = span_meta(p)
        if sm is not None:
            if sm.get("seq_lo") is not None:
                stats["seq_lo"] = sm["seq_lo"] if stats["seq_lo"] is None \
                    else min(stats["seq_lo"], sm["seq_lo"])
            if sm.get("seq_hwm") is not None:
                stats["seq_hi"] = sm["seq_hwm"] if stats["seq_hi"] is None \
                    else max(stats["seq_hi"], sm["seq_hwm"])
    bytes_before = sum(os.path.getsize(f) for f in files)

    # DDL rows (tiny, driver-side metadata-pruned scan) + version chain
    ddl_parts = []
    for _, p in span:
        t = ddl_rows_table(p, ["seq", "txn_id", "schema_ver", "ts", "ddl"])
        if t is not None and t.num_rows:
            ddl_parts.append(t)
    ddl_tbl = pa.concat_tables(ddl_parts).sort_by("seq") if ddl_parts else None
    history, final = _build_history(files, ddl_tbl)
    # prior spans carry forward their accumulated original-event count
    n_prior_original = sum(
        (span_meta(p) or {}).get("n_original", 0) -
        ((span_meta(p) or {}).get("n_retained", 0) or 0)
        for _, p in span if span_meta(p) is not None)

    if num_tasks is None:
        num_tasks = int(min(256, max(8, -(-bytes_before // _BYTES_PER_TASK))))

    stage = os.path.join(changelog_dir,
                         f"._compact-{first:05d}-{through_epoch:05d}.tmp")
    if os.path.isdir(stage):
        shutil.rmtree(stage)
    os.makedirs(stage)

    history_json = {v: sv.to_json() for v, sv in history.items()}
    # a LIST passed to read_parquet is treated as FILE paths (directories
    # in a list are not expanded) — hand it the explicit file list
    ds = rd.read_parquet(files)
    ds = ds.map_batches(
        _evolve_route_batch,
        fn_kwargs={"kwargs": {"history_json": history_json,
                              "final_version": final.version,
                              "n_tasks": num_tasks}},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    summaries = (
        ds.groupby("part_id")
        .map_groups(
            _reduce_group,
            fn_kwargs={"kwargs": {"mode": mode, "stage_dir": stage,
                                  "drop_malformed": drop_malformed,
                                  "payload_names": [f.name
                                                    for f in final.schema]}},
            batch_format="pyarrow",
        )
        .take_all()  # O(num_tasks) one-row summaries
    )
    n_in = sum(r["n_in"] for r in summaries)
    n_retained = sum(r["n_out"] for r in summaries)
    # wrapped mod-2^64 sum in Python ints (numpy scalar += warns on the
    # intended wraparound)
    hashsum = sum(r["hashsum"] % (1 << 64) for r in summaries) % (1 << 64)
    max_ts_us = max((r["max_ts_us"] for r in summaries), default=0)
    n_dropped_malformed = sum(r.get("n_dropped", 0) for r in summaries)

    n_ddl = 0
    if ddl_tbl is not None and ddl_tbl.num_rows:
        n_ddl = ddl_tbl.num_rows
        # DDL rows ride the span under the FINAL physical schema with null
        # payload (the augmenter splits them out before evolution; the
        # registry reads only seq/ddl via the metadata-pruned scan)
        cols = {
            "seq": ddl_tbl.column("seq"),
            "txn_id": ddl_tbl.column("txn_id"),
            "op": pa.array(["DDL"] * n_ddl),
            "schema_ver": ddl_tbl.column("schema_ver").cast(pa.int32()),
        }
        for f in final.schema:
            if f.name == "ts":
                cols["ts"] = ddl_tbl.column("ts").cast(f.type)
            else:
                cols[f.name] = pa.nulls(n_ddl, f.type)
        cols["ddl"] = ddl_tbl.column("ddl")
        pq.write_table(pa.table(cols),
                       os.path.join(stage, "part-ddl.parquet"))
        hashsum = (hashsum + int(_hashsum_seqs(
            ddl_tbl.column("seq").to_numpy().astype(np.int64)))) % (1 << 64)

    meta = {
        "first_epoch": int(first),
        "last_epoch": int(through_epoch),
        "mode": mode,
        "seq_lo": int(stats["seq_lo"]) if stats["seq_lo"] is not None else None,
        "seq_hwm": int(stats["seq_hi"]) if stats["seq_hi"] is not None else None,
        "n_original": int(n_in + n_ddl + n_prior_original),
        "n_retained": int(n_retained + n_ddl),
        "n_ddl": int(n_ddl),
        "retained_hashsum": int(hashsum - (1 << 64)
                                if hashsum >= (1 << 63) else hashsum),
        "max_ts_us": int(max_ts_us),
        "final_schema_version": int(final.version),
        "n_dropped_malformed": int(n_dropped_malformed),
    }
    with open(os.path.join(stage, SPAN_META), "w") as f:
        json.dump(meta, f)

    span_path = existing  # epoch-{first}-c{through}
    atomic_rename(stage, span_path)
    removed = _gc_shadowed(changelog_dir, first, through_epoch, span_path)
    bytes_after = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(span_path, "*.parquet")))
    return {**meta, "bytes_before": int(bytes_before),
            "bytes_after": int(bytes_after), "gc_removed": removed,
            "span_dir": span_path}


def compaction_horizon(changelog_dir: str) -> int:
    """Max ``max_ts_us`` across all compacted spans (0 = none): the event
    time below which point-in-time reconstruction is impossible —
    intermediate versions were compacted away."""
    from rayrep.pipeline import discover_epochs

    h = 0
    for _, p in discover_epochs(changelog_dir):
        sm = span_meta(p)
        if sm is not None:
            h = max(h, int(sm.get("max_ts_us", 0)))
    return h
