"""Secondary index over the lake, maintained incrementally from the
daily-delta stream: value → (conv_id, turn_idx), hash-partitioned BY
VALUE so a probe reads O(probed values / Q) of the index, never the lake.

Reference analog: the reference's HBase target has no native secondary
indexes — downstream teams that need "find rows where col = v" either
full-scan or maintain an index table from the replication stream
themselves (the Phoenix/Lily-indexer pattern: an index mutation per data
mutation, eventually consistent at the batch boundary).  Here the index
is a first-class derived table refreshed from the same per-partition
delta epochs the downstream replica consumes (`sinks.update_replica`),
consistent with the lake AT EPOCH BARRIERS.

Like the aggregate views (rayrep/views.py), index maintenance needs
RETRACTIONS — when a key's indexed column changes from v_old to v_new
the entry (v_old → key) must leave the index — and the delta stream
carries only after-images, so each LAKE partition keeps a sidecar
(key → current indexed value + version) that supplies the before-image.
Unlike the views (group partials merge at read time, no shuffle), index
entries must land in the partition OF THEIR VALUE, so a refresh is the
engine's one canonical exchange in miniature:

    per-lake-partition sidecar fold (no shuffle, O(new delta rows))
      → emit A(ssert)/R(etract) entry deltas
      → groupby(qid = hash(value) % Q)          # the one shuffle,
                                                #   O(changed entries)
      → per-q merge: newest (ts, seq) wins per (value, key),
        retracted entries drop, state sorted by value
        (row-group stats prune probes inside a q file)

Exactly-once across the two stages (the crash window a per-partition
manifest cannot close: stage-1 sidecars committed but stage-2 q-states
not): every file a refresh writes is named by its TARGET epoch, and one
global ``_COMMITTED.json`` flips visibility LAST.  A crash at any point
leaves the committed epoch's files intact; the redo recomputes the
target epoch's files from them (pure function → identical bytes) and
commits; superseded files are gc'd only after the commit.  Lake
partitions and q partitions untouched by a refresh carry forward as
hardlinks (O(P + Q) metadata, the clone discipline).

Probes (`index_lookup`) read ONLY the probed values' q files — a
value-equality query on a 10^10-row lake becomes one file read plus, via
`rayrep.lookup`, point-gets on exactly the partitions the pinned routing
hash names.  Changed-cells lakes are out of scope (a cells delta carries
null = "unchanged", which the sidecar fold cannot distinguish from a
real null): `update_index` refuses when the delta rows were produced by
a changed-cells applier (detected via the lake pin when available).
"""

from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from rayrep.apply import write_parquet_atomic
from rayrep.hashing import stable_hash_strings
from rayrep.manifests import atomic_write_json

_EPOCH_RE = re.compile(r"e(\d+)\.parquet$")


class IndexSpecError(ValueError):
    """The index exists with a different (column, Q) spec, or the lake's
    pins make this index unsound (changed-cells deltas)."""


def _committed(index_dir: str) -> dict:
    p = os.path.join(index_dir, "_COMMITTED.json")
    if not os.path.exists(p):
        return {"epoch": -1, "column": None, "num_index_partitions": None}
    with open(p) as f:
        return json.load(f)


def _sidecar_path(index_dir: str, pid: int, epoch: int) -> str:
    return os.path.join(index_dir, f"p{pid:05d}",
                        f"sidecar_e{epoch:05d}.parquet")


def _qstate_path(index_dir: str, qid: int, epoch: int) -> str:
    return os.path.join(index_dir, f"q{qid:05d}",
                        f"state_e{epoch:05d}.parquet")


def _link_or_copy(src: str, dst: str) -> None:
    if os.path.exists(dst):
        os.remove(dst)
    try:
        os.link(src, dst)
    except OSError:
        import shutil

        shutil.copy2(src, dst)


def _key_ids_np(conv: np.ndarray, turn: np.ndarray) -> np.ndarray:
    codes, _ = pd.factorize(conv, sort=False)
    return (codes.astype(np.int64) << 32) | turn.astype(np.int64)


def _stage1_partition(pid: int, index_dir: str, files: list[str],
                      target_epoch: int, committed_epoch: int,
                      column: str, num_q: int) -> pa.Table:
    """Fold one lake partition's new delta epochs into its key→value
    sidecar (written under the TARGET epoch; visibility flips at the
    global commit) and return the A/R entry deltas, qid-stamped.  Pure
    function of (committed sidecar, files) — a crash redo reproduces
    identical bytes."""
    pdir = os.path.join(index_dir, f"p{pid:05d}")
    os.makedirs(pdir, exist_ok=True)
    side = None
    cpath = _sidecar_path(index_dir, pid, committed_epoch)
    if committed_epoch >= 0 and os.path.exists(cpath):
        side = pq.read_table(cpath)

    cols = list(dict.fromkeys(
        ["conv_id", "turn_idx", "ts", "seq", "op", column]))
    news = []
    for f in files:
        t = pq.read_table(f, columns=cols)
        news.append(pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx").cast(pa.int64()),
            "__val": t.column(column),
            "__ts": t.column("ts").cast(pa.int64()),
            "__seq": t.column("seq").cast(pa.int64()),
            "__live": pc.invert(pc.equal(t.column("op"), "D")),
        }))
    new = pa.concat_tables(news, promote_options="permissive")

    n_side = side.num_rows if side is not None else 0
    comb = (pa.concat_tables([side, new], promote_options="permissive")
            if side is not None else new)
    kid = _key_ids_np(comb.column("conv_id").to_numpy(zero_copy_only=False),
                      comb.column("turn_idx").to_numpy())
    ts = comb.column("__ts").to_numpy()
    seq = comb.column("__seq").to_numpy()
    order = np.lexsort((seq, ts, kid))
    k_s = kid[order]
    last = np.ones(len(k_s), dtype=bool)
    last[:-1] = k_s[1:] != k_s[:-1]
    sel = order[last]
    new_side = comb.take(pa.array(sel))
    write_parquet_atomic(new_side, _sidecar_path(index_dir, pid,
                                                 target_epoch))

    # entry deltas for TOUCHED keys only (an untouched key's entry is
    # already correct in its q partition)
    touched = np.unique(kid[n_side:])
    live = comb.column("__live").to_numpy(zero_copy_only=False).astype(bool)
    val = comb.column("__val")
    val_str = val.cast(pa.string()).to_numpy(zero_copy_only=False)
    val_null = pc.is_null(val).to_numpy(zero_copy_only=False)

    def entries(pos: np.ndarray, opcode: str, ver_pos: np.ndarray):
        """Rows at ``pos`` become ``opcode`` entries stamped with the
        version at ``ver_pos`` (retractions carry the NEW version so the
        per-(value, key) LWW in q resolves A-after-R correctly)."""
        return pa.table({
            "op": pa.array([opcode] * len(pos)),
            "conv_id": comb.column("conv_id").take(pa.array(pos)),
            "turn_idx": comb.column("turn_idx").take(pa.array(pos)),
            "__val": val.take(pa.array(pos)),
            "__ts": pa.array(ts[ver_pos], pa.int64()),
            "__seq": pa.array(seq[ver_pos], pa.int64()),
        })

    out = []
    if len(touched):
        m_new = np.isin(kid[sel], touched)
        sel_t = sel[m_new]                       # folded (new) row per key
        # map each touched key to its OLD sidecar row, if any
        if n_side:
            old_kid = kid[:n_side]
            old_pos_of = {k: i for i, k in enumerate(old_kid.tolist())}
            old_pos = np.array([old_pos_of.get(k, -1)
                                for k in kid[sel_t].tolist()], dtype=np.int64)
        else:
            old_pos = np.full(len(sel_t), -1, dtype=np.int64)
        has_old = old_pos >= 0
        old_live = np.zeros(len(sel_t), dtype=bool)
        old_nonnull = np.zeros(len(sel_t), dtype=bool)
        old_val = np.full(len(sel_t), None, dtype=object)
        if has_old.any():
            op_idx = old_pos[has_old]
            old_live[has_old] = live[op_idx]
            old_nonnull[has_old] = ~val_null[op_idx]
            old_val[has_old] = val_str[op_idx]
        new_live = live[sel_t]
        new_nonnull = ~val_null[sel_t]
        new_val = val_str[sel_t]
        changed = np.not_equal(old_val.astype(object),
                               new_val.astype(object))
        retract = has_old & old_live & old_nonnull & (~new_live | ~new_nonnull
                                                      | changed)
        assert_ = new_live & new_nonnull & (~has_old | ~old_live
                                            | ~old_nonnull | changed)
        if retract.any():
            out.append(entries(old_pos[retract], "R",
                               sel_t[retract]))
        if assert_.any():
            out.append(entries(sel_t[assert_], "A", sel_t[assert_]))
    if not out:
        return _empty_entries(new.schema.field("__val").type)
    tbl = pa.concat_tables(out, promote_options="permissive")
    qid = (stable_hash_strings(tbl.column("__val").cast(pa.string()))
           % np.uint64(num_q)).astype(np.int32)
    return tbl.append_column("qid", pa.array(qid))


def _empty_entries(val_type: pa.DataType) -> pa.Table:
    return pa.schema(
        [pa.field("op", pa.string()), pa.field("conv_id", pa.string()),
         pa.field("turn_idx", pa.int64()), pa.field("__val", val_type),
         pa.field("__ts", pa.int64()), pa.field("__seq", pa.int64()),
         pa.field("qid", pa.int32())]).empty_table()


def _stage2_merge(group: pa.Table, index_dir: str, target_epoch: int,
                  committed_epoch: int) -> pa.Table:
    """Merge one q partition's entry deltas into its state: newest
    (ts, seq) wins per (value, key); retracted entries drop; state sorts
    by value so probe reads prune on row-group stats."""
    if group.num_rows == 0:
        return pa.table({"qid": pa.array([], pa.int32()),
                         "entries": pa.array([], pa.int64())})
    qid = int(group.column("qid")[0].as_py())
    qdir = os.path.join(index_dir, f"q{qid:05d}")
    os.makedirs(qdir, exist_ok=True)
    state = None
    spath = _qstate_path(index_dir, qid, committed_epoch)
    if committed_epoch >= 0 and os.path.exists(spath):
        state = pq.read_table(spath)

    deltas = pa.table({
        "__val": group.column("__val"),
        "conv_id": group.column("conv_id"),
        "turn_idx": group.column("turn_idx"),
        "__ts": group.column("__ts"),
        "__seq": group.column("__seq"),
        "__live": pc.equal(group.column("op"), "A"),
    })
    comb = (pa.concat_tables([state, deltas], promote_options="permissive")
            if state is not None else deltas)
    # per (value, key): newest version wins (an entry may be asserted,
    # retracted, re-asserted across refreshes)
    vcodes, _ = pd.factorize(
        comb.column("__val").cast(pa.string()).to_numpy(
            zero_copy_only=False), sort=False)
    kid = _key_ids_np(comb.column("conv_id").to_numpy(zero_copy_only=False),
                      comb.column("turn_idx").to_numpy())
    ts = comb.column("__ts").to_numpy()
    seq = comb.column("__seq").to_numpy()
    order = np.lexsort((seq, ts, kid, vcodes))
    vk = vcodes[order].astype(np.int64) << 32 | (
        pd.factorize(kid[order], sort=False)[0].astype(np.int64))
    last = np.ones(len(vk), dtype=bool)
    last[:-1] = vk[1:] != vk[:-1]
    folded = comb.take(pa.array(order[last]))
    folded = folded.filter(folded.column("__live"))
    folded = folded.sort_by([("__val", "ascending"),
                             ("conv_id", "ascending"),
                             ("turn_idx", "ascending")])
    write_parquet_atomic(folded, _qstate_path(index_dir, qid, target_epoch))
    return pa.table({"qid": pa.array([qid], pa.int32()),
                     "entries": pa.array([folded.num_rows], pa.int64())})


def update_index(delta_dir: str, index_dir: str, column: str,
                 num_index_partitions: int = 16,
                 up_to_epoch: int | None = None,
                 lake_dir: str | None = None) -> dict:
    """Refresh the secondary index from every delta epoch past the
    committed index epoch (optionally capped at ``up_to_epoch``).
    Spec (column, Q) pins on first refresh; a mismatched respec refuses.
    """
    os.makedirs(index_dir, exist_ok=True)
    com = _committed(index_dir)
    if com["column"] is not None:
        if com["column"] != column:
            raise IndexSpecError(
                f"index {index_dir} is pinned to column={com['column']!r}; "
                f"got {column!r}")
        if com["num_index_partitions"] != num_index_partitions:
            raise IndexSpecError(
                f"index {index_dir} is pinned to Q="
                f"{com['num_index_partitions']}; got {num_index_partitions}")
    if lake_dir is not None:
        from rayrep.manifests import LakeMeta

        lm = LakeMeta.load(lake_dir)
        if lm is not None and getattr(lm, "changed_cells", False):
            raise IndexSpecError(
                "secondary indexes require row-image deltas; this lake is "
                "pinned changed_cells (null = 'unchanged' is "
                "indistinguishable from a real null in the sidecar fold)")
    committed_epoch = int(com["epoch"])

    # work discovery: per lake partition, delta epochs in
    # (committed_epoch, up_to]
    work, touched_pids, hi = [], set(), committed_epoch
    all_pids = []
    for pdir in sorted(glob.glob(os.path.join(delta_dir, "p*"))):
        pid = int(os.path.basename(pdir)[1:])
        all_pids.append(pid)
        files = []
        for f in glob.glob(os.path.join(pdir, "e*.parquet")):
            e = int(_EPOCH_RE.search(f).group(1))
            if e > committed_epoch and (up_to_epoch is None
                                        or e <= up_to_epoch):
                files.append((e, f))
                hi = max(hi, e)
        if files:
            work.append({"pid": pid,
                         "files": json.dumps([f for _, f in sorted(files)])})
            touched_pids.add(pid)
    if not work:
        return {"epoch": committed_epoch, "partitions_refreshed": 0,
                "entries_changed": 0}
    target_epoch = hi

    def run_stage1(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            outs.append(_stage1_partition(
                int(row["pid"]), index_dir, json.loads(row["files"]),
                target_epoch, committed_epoch, column,
                num_index_partitions))
        return pa.concat_tables(outs, promote_options="permissive")

    summaries = (
        rd.from_items(work, override_num_blocks=len(work))
        .map_batches(run_stage1, batch_format="pyarrow", batch_size=1)
        .groupby("qid")
        .map_groups(_stage2_merge,
                    fn_kwargs={"index_dir": index_dir,
                               "target_epoch": target_epoch,
                               "committed_epoch": committed_epoch},
                    batch_format="pyarrow")
        .take_all()  # O(Q) one-row summaries
    )
    touched_qids = {int(r["qid"]) for r in summaries if r["qid"] >= 0}

    # carry untouched partitions forward (hardlink, O(P+Q) metadata)
    if committed_epoch >= 0:
        for pid in all_pids:
            if pid in touched_pids:
                continue
            src = _sidecar_path(index_dir, pid, committed_epoch)
            if os.path.exists(src):
                _link_or_copy(src, _sidecar_path(index_dir, pid,
                                                 target_epoch))
        for qdir in glob.glob(os.path.join(index_dir, "q*")):
            qid = int(os.path.basename(qdir)[1:])
            if qid in touched_qids:
                continue
            src = _qstate_path(index_dir, qid, committed_epoch)
            if os.path.exists(src):
                _link_or_copy(src, _qstate_path(index_dir, qid,
                                                target_epoch))

    # the global commit flips visibility LAST; gc only after it
    atomic_write_json(os.path.join(index_dir, "_COMMITTED.json"), {
        "epoch": target_epoch, "column": column,
        "num_index_partitions": num_index_partitions,
    })
    for f in (glob.glob(os.path.join(index_dir, "p*", "sidecar_e*.parquet"))
              + glob.glob(os.path.join(index_dir, "q*",
                                       "state_e*.parquet"))):
        if f"_e{target_epoch:05d}." not in f:
            os.remove(f)
    return {"epoch": target_epoch,
            "partitions_refreshed": len(work),
            "entries_changed": int(sum(r["entries"] for r in summaries)),
            "q_partitions_touched": len(touched_qids)}


def rebuild_index(lake_dir: str, index_dir: str, column: str,
                  num_index_partitions: int = 16) -> dict:
    """Bootstrap (or disaster-rebuild) the index by a FULL SCAN of the
    committed lake — the path for lakes with no delta history: a
    bulk-loaded lake (rayrep/bulkload.py writes state directly, emitting
    no delta epochs) or an index whose files were lost.  One task per
    lake partition folds its chain (keeping each row's (ts, __seq)
    version so later INCREMENTAL refreshes LWW-merge correctly against
    the bootstrap entries), writes the partition's sidecar, and emits
    'A' entries; the same hash(value) exchange and per-q merge as the
    incremental path build the q states.  Commits at the lake's epoch
    barrier, so a subsequent ``update_index`` resumes from exactly the
    delta epochs the scan did not see."""
    from rayrep.apply import fold_state_chain
    from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest
    from rayrep.registry import SchemaRegistry
    from rayrep.schema import SchemaVersion

    lm = LakeMeta.load(lake_dir)
    if lm is not None and lm.changed_cells:
        raise IndexSpecError(
            "secondary indexes require row-LWW lakes; this lake is pinned "
            "changed_cells")
    com = _committed(index_dir)
    if com["column"] is not None and (com["column"] != column or
                                      com["num_index_partitions"]
                                      != num_index_partitions):
        raise IndexSpecError(
            f"index {index_dir} is pinned to (column="
            f"{com['column']!r}, Q={com['num_index_partitions']}); "
            "rebuild must keep the spec (delete the index dir to respec)")
    em = EpochManifest.load(lake_dir)
    barrier = em.last_epoch
    target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
    os.makedirs(index_dir, exist_ok=True)

    work = []
    for mp in sorted(glob.glob(os.path.join(lake_dir, "_manifests",
                                            "p*.json"))):
        pid = int(re.search(r"p(\d+)\.json$", mp).group(1))
        m = PartitionManifest.load(lake_dir, pid)
        if m.state_chain:
            work.append({"pid": pid, "files": json.dumps(m.state_chain)})
    if not work:
        atomic_write_json(os.path.join(index_dir, "_COMMITTED.json"), {
            "epoch": barrier, "column": column,
            "num_index_partitions": num_index_partitions})
        return {"epoch": barrier, "partitions_scanned": 0, "entries": 0}

    def scan_one(batch: pa.Table) -> pa.Table:
        outs = []
        for row in batch.to_pylist():
            pid = int(row["pid"])
            target = SchemaVersion.from_json(target_json)
            st = fold_state_chain(lake_dir, json.loads(row["files"]), target)
            live = pc.invert(st.column("__deleted"))
            st = st.filter(live)
            side = pa.table({
                "conv_id": st.column("conv_id"),
                "turn_idx": st.column("turn_idx").cast(pa.int64()),
                "__val": st.column(column),
                "__ts": st.column("ts").cast(pa.int64()),
                "__seq": st.column("__seq").cast(pa.int64()),
                "__live": pa.array([True] * st.num_rows),
            })
            pdir = os.path.join(index_dir, f"p{pid:05d}")
            os.makedirs(pdir, exist_ok=True)
            from rayrep.apply import write_parquet_atomic as _wpa

            _wpa(side, _sidecar_path(index_dir, pid, barrier))
            nn = side.filter(pc.invert(pc.is_null(side.column("__val"))))
            outs.append(pa.table({
                "op": pa.array(["A"] * nn.num_rows),
                "conv_id": nn.column("conv_id"),
                "turn_idx": nn.column("turn_idx"),
                "__val": nn.column("__val"),
                "__ts": nn.column("__ts"),
                "__seq": nn.column("__seq"),
            }))
        tbl = pa.concat_tables(outs, promote_options="permissive")
        if tbl.num_rows == 0:
            return _empty_entries(tbl.schema.field("__val").type)
        qid = (stable_hash_strings(tbl.column("__val").cast(pa.string()))
               % np.uint64(num_index_partitions)).astype(np.int32)
        return tbl.append_column("qid", pa.array(qid))

    summaries = (
        rd.from_items(work, override_num_blocks=len(work))
        .map_batches(scan_one, batch_format="pyarrow", batch_size=1)
        .groupby("qid")
        .map_groups(_stage2_merge,
                    fn_kwargs={"index_dir": index_dir,
                               "target_epoch": barrier,
                               "committed_epoch": -1},
                    batch_format="pyarrow")
        .take_all()
    )
    atomic_write_json(os.path.join(index_dir, "_COMMITTED.json"), {
        "epoch": barrier, "column": column,
        "num_index_partitions": num_index_partitions,
    })
    for f in (glob.glob(os.path.join(index_dir, "p*", "sidecar_e*.parquet"))
              + glob.glob(os.path.join(index_dir, "q*",
                                       "state_e*.parquet"))):
        if f"_e{barrier:05d}." not in f:
            os.remove(f)
    return {"epoch": barrier, "partitions_scanned": len(work),
            "entries": int(sum(r["entries"] for r in summaries))}


def index_lookup(index_dir: str, values: list,
                 lake_dir: str | None = None) -> pa.Table:
    """Index probe: entries (value, conv_id, turn_idx) for ``values``,
    reading ONLY the probed values' q state files (plan size ≤
    len(distinct values); row-group stats prune within each file because
    state sorts by value).  Compose with ``rayrep.lookup.lookup`` to
    fetch the full rows from the lake.

    ``lake_dir``: honor that lake's GDPR erasure list — erased keys are
    anti-filtered from the result AT ONCE (the same read-side contract
    as ``final_table``); ``purge_index`` makes it physical."""
    com = _committed(index_dir)
    if com["epoch"] < 0:
        raise FileNotFoundError(f"{index_dir}: no committed index epoch")
    Q = int(com["num_index_partitions"])
    vals = [v for v in values if v is not None]
    qids = sorted({int(q) for q in (
        stable_hash_strings(np.array([str(v) for v in vals], dtype=object))
        % np.uint64(Q))})
    out = []
    probe = pa.array([str(v) for v in vals])
    for qid in qids:
        p = _qstate_path(index_dir, qid, com["epoch"])
        if not os.path.exists(p):
            continue
        t = pq.read_table(p, columns=["__val", "conv_id", "turn_idx"])
        keep = pc.is_in(t.column("__val").cast(pa.string()), value_set=probe)
        out.append(t.filter(keep))
    if not out:
        return pa.table({"value": pa.array([], pa.string()),
                         "conv_id": pa.array([], pa.string()),
                         "turn_idx": pa.array([], pa.int64())})
    res = pa.concat_tables(out, promote_options="permissive")
    res = res.rename_columns(["value", "conv_id", "turn_idx"])
    if lake_dir is not None:
        from rayrep.retention import _erase_filter, load_erased

        res = _erase_filter(res, load_erased(lake_dir))
    return res


def read_index(index_dir: str, lake_dir: str | None = None) -> pa.Table:
    """The whole index (tests / small results): concat of all committed
    q states; ``lake_dir`` honors that lake's erasure list."""
    com = _committed(index_dir)
    outs = []
    for qdir in sorted(glob.glob(os.path.join(index_dir, "q*"))):
        qid = int(os.path.basename(qdir)[1:])
        p = _qstate_path(index_dir, qid, com["epoch"])
        if os.path.exists(p):
            outs.append(pq.read_table(
                p, columns=["__val", "conv_id", "turn_idx"]))
    if not outs:
        return pa.table({"value": pa.array([], pa.string()),
                         "conv_id": pa.array([], pa.string()),
                         "turn_idx": pa.array([], pa.int64())})
    t = pa.concat_tables(outs, promote_options="permissive")
    t = t.rename_columns(["value", "conv_id", "turn_idx"])
    if lake_dir is not None:
        from rayrep.retention import _erase_filter, load_erased

        t = _erase_filter(t, load_erased(lake_dir))
    return t


def purge_index(index_dir: str, lake_dir: str) -> dict:
    """Physical erasure pass for the index (the ``purge_lake``
    counterpart): rewrite every committed q state and sidecar dropping
    the lake's erased conv_ids.  In-place at the committed epoch
    (write_parquet_atomic per file), idempotent, O(index files)."""
    from rayrep.apply import write_parquet_atomic
    from rayrep.retention import _erase_filter, load_erased

    erased = load_erased(lake_dir)
    com = _committed(index_dir)
    dropped = 0
    if not erased or com["epoch"] < 0:
        return {"dropped": 0, "erased_keys": len(erased)}
    for f in (glob.glob(os.path.join(index_dir, "q*", "state_e*.parquet"))
              + glob.glob(os.path.join(index_dir, "p*",
                                       "sidecar_e*.parquet"))):
        t = pq.read_table(f)
        kept = _erase_filter(t, erased)
        if kept.num_rows != t.num_rows:
            dropped += t.num_rows - kept.num_rows
            write_parquet_atomic(kept, f)
    return {"dropped": int(dropped), "erased_keys": len(erased)}
