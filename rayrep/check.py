"""Lake consistency checker (fsck): verify the invariants every other
operator relies on, without mutating anything.

The engine's correctness story is a chain of invariants — manifests
reference only files that exist, every partition sits at the same epoch
barrier, live_rows matches the folded image, every state row routes to
the partition that holds it (the pin machinery's whole point). Each is
cheap to verify and catastrophic to violate silently (a misrouted row
duplicates state on the next resume; a dangling chain entry fails a
future fold mid-replay). ``check_lake`` is the explicit audit: shallow
mode is metadata-only (O(manifests)); ``deep=True`` folds every chain
and verifies row-level invariants, one bounded task per partition
(``distributed=True`` fans out via ``rayrep.maintenance``).

Reference analog: the reference leans on HBase's own fsck/region
consistency tooling (store-owned, README.md:17-20); with Parquet chains
the audit must be an engine operator.
"""

from __future__ import annotations

import glob
import os
import re

from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest


def check_lake(lake_dir: str, deep: bool = False,
               distributed: bool = False) -> dict:
    """Audit a lake. Returns ``{"ok": bool, "errors": [...],
    "warnings": [...], ...}`` — errors are invariant violations (the
    lake will misbehave), warnings are hygiene (orphan files)."""
    errors: list[str] = []
    warnings: list[str] = []

    lm = LakeMeta.load(lake_dir)
    em = EpochManifest.load(lake_dir)
    if lm is None:
        errors.append("no LakeMeta (pre-LakeMeta lake or not a lake)")
        return {"ok": False, "errors": errors, "warnings": warnings}
    if em.num_partitions and em.num_partitions != lm.num_partitions:
        errors.append(
            f"pin drift: EpochManifest.num_partitions={em.num_partitions} "
            f"!= LakeMeta.num_partitions={lm.num_partitions}")

    P = lm.num_partitions
    manifests: dict[int, PartitionManifest] = {}
    for pid in range(P):
        if not os.path.exists(PartitionManifest.path(lake_dir, pid)):
            errors.append(f"p{pid:05d}: manifest missing")
            continue
        m = PartitionManifest.load(lake_dir, pid)
        manifests[pid] = m
        if m.epoch > em.last_epoch:
            # a partition AHEAD of the barrier is a crash window a resume
            # has not yet repaired (partition committed, barrier didn't).
            # BEHIND is legal: the applier only runs on partitions an
            # epoch actually touched, so a partition with no rows in the
            # last epochs legitimately lags the barrier (its seq watermark
            # needs no advance for exactly-once).
            errors.append(
                f"p{pid:05d}: epoch {m.epoch} ahead of committed barrier "
                f"{em.last_epoch} (torn commit)")
        for f in m.state_chain:
            if not os.path.exists(os.path.join(lake_dir, f)):
                errors.append(f"p{pid:05d}: chain file missing: {f}")

    # orphan state files: on disk, in no live chain — hygiene, not error
    # (gc_lake's job), unless their epoch EXCEEDS the barrier (a torn
    # write a future replay round could double-count)
    live = {
        os.path.normpath(os.path.join(lake_dir, f))
        for m in manifests.values() for f in m.state_chain
    }
    n_orphans = 0
    for sp in glob.glob(os.path.join(lake_dir, "part-*", "state-e*.parquet")):
        if os.path.normpath(sp) in live:
            continue
        n_orphans += 1
        ep = int(re.search(r"state-e(\d+)", sp).group(1))
        if ep > em.last_epoch:
            warnings.append(
                f"uncommitted state file beyond the barrier: "
                f"{os.path.relpath(sp, lake_dir)} (crash leftover; the "
                f"applier's deterministic names make it overwrite-safe)")
    if n_orphans:
        warnings.append(f"{n_orphans} superseded state file(s) not in any "
                        f"chain (run `compact`/`gc`)")
    if lm.dedup_ingest and not os.path.isdir(
            os.path.join(lake_dir, "content_index")):
        warnings.append("dedup_ingest pinned but content_index/ missing "
                        "(valid only if no insert ever carried content)")

    result = {"partitions": P, "last_epoch": em.last_epoch,
              "orphans": n_orphans}
    if deep and manifests:
        from rayrep.maintenance import run_per_partition
        from rayrep.registry import SchemaRegistry

        target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
        cells = lm.changed_cells
        salted = lm.salt_turn_keys

        def one(pid: int) -> dict:
            from rayrep.apply import (
                _live_count,
                fold_state_chain,
                fold_state_chain_cells,
            )
            from rayrep.hashing import partition_ids, partition_ids_salted
            from rayrep.schema import SchemaVersion

            m = PartitionManifest.load(lake_dir, pid)
            # a chain with missing files can't fold — report, don't raise
            # (the corruption `repair_partitions` exists to fix)
            gone = [f for f in m.state_chain
                    if not os.path.exists(os.path.join(lake_dir, f))]
            if gone:
                return {"errors": [f"p{pid:05d}: unfoldable chain, "
                                   f"missing: {f}" for f in gone],
                        "rows": 0}
            target = SchemaVersion.from_json(target_json)
            fold_fn = fold_state_chain_cells if cells else fold_state_chain
            state = fold_fn(lake_dir, m.state_chain, target)
            errs: list[str] = []
            live_n = _live_count(state)
            if live_n != m.live_rows:
                errs.append(f"p{pid:05d}: live_rows {m.live_rows} != "
                            f"folded recount {live_n}")
            if state.num_rows:
                # routing: every row must hash to THIS partition — a
                # misroute means a resume will duplicate the key
                if salted:
                    pids = partition_ids_salted(
                        state.column("conv_id"),
                        state.column("turn_idx").to_numpy(
                            zero_copy_only=False), P)
                else:
                    pids = partition_ids(state.column("conv_id"), P)
                bad = int((pids != pid).sum())
                if bad:
                    errs.append(f"p{pid:05d}: {bad} row(s) routed to a "
                                f"different partition (misplaced state)")
                # key uniqueness after fold
                conv = state.column("conv_id").to_pylist()
                turn = state.column("turn_idx").to_pylist()
                keys = list(zip(conv, turn))
                if len(keys) != len(set(keys)):
                    errs.append(f"p{pid:05d}: duplicate (conv_id, "
                                f"turn_idx) after fold")
                seqs = state.column("__seq").to_numpy()
                if int(seqs.max()) > m.last_seq:
                    errs.append(f"p{pid:05d}: state seq {int(seqs.max())} "
                                f"beyond watermark {m.last_seq}")
            return {"errors": errs, "rows": state.num_rows}

        deep_res = run_per_partition(one, sorted(manifests), distributed)
        for r in deep_res:
            errors.extend(r["errors"])
        result["deep_rows"] = int(sum(r["rows"] for r in deep_res))

    result.update({"ok": not errors, "errors": errors, "warnings": warnings})
    return result


# ----------------------------------------------------------------- lake diff
def diff_lakes(lake_a: str, lake_b: str,
               distributed: bool = False) -> "pa.Table":
    """Row-level diff of two converged lakes — the replication-audit
    operator (reference analog: the validator service comparing MySQL
    rows against the replicated HBase table, README.md:24-26).

    Both lakes must share the same routing pins (partition count, salt
    mode, changed-cells mode): then key k lives in the SAME partition id
    in both, and the diff is P independent per-partition tasks — fold
    both chains, align keys with one sorted merge, hash-compare payloads
    — with NO shuffle and nothing corpus-sized on the driver (each task
    returns only its differing keys, which a healthy audit expects to be
    ~0). A primary-vs-DR-replica audit at 10^10 keys is therefore read
    bandwidth, not exchange.

    Returns an Arrow table (conv_id, turn_idx, status) where status ∈
    {'only_a', 'only_b', 'differs'}; erased keys are hidden exactly as
    ``final_table`` hides them (reads are erasure-filtered everywhere).
    """
    import numpy as np
    import pyarrow as pa

    from rayrep.maintenance import run_per_partition
    from rayrep.registry import SchemaRegistry

    la, lb = LakeMeta.load(lake_a), LakeMeta.load(lake_b)
    if la is None or lb is None:
        raise ValueError("diff_lakes: both paths must be lakes with LakeMeta")
    for attr in ("num_partitions", "salt_turn_keys", "changed_cells",
                 "hash_version"):
        va, vb = getattr(la, attr, None), getattr(lb, attr, None)
        if va != vb:
            raise ValueError(
                f"diff_lakes: routing pin mismatch on {attr}: "
                f"{va!r} != {vb!r} (diff requires aligned partitioning; "
                f"repartition_lake one side first)")
    target_a = SchemaRegistry(persist_dir=lake_a).current_json()
    target_b = SchemaRegistry(persist_dir=lake_b).current_json()
    if target_a != target_b:
        raise ValueError("diff_lakes: schema mismatch between lakes "
                         "(apply the missing DDL before auditing)")
    cells = bool(la.changed_cells)

    def one(pid: int) -> dict:
        import pandas as pd

        from rayrep.apply import fold_state_chain, fold_state_chain_cells
        from rayrep.retention import _erase_filter, load_erased
        from rayrep.schema import SchemaVersion

        fold_fn = fold_state_chain_cells if cells else fold_state_chain

        def live(lake: str) -> pd.DataFrame:
            import pyarrow.compute as pc

            m = PartitionManifest.load(lake, pid)
            t = fold_fn(lake, m.state_chain,
                        SchemaVersion.from_json(target_a))
            t = _erase_filter(t, load_erased(lake))
            t = t.filter(pc.invert(t["__deleted"]))
            return t.drop_columns(["__seq", "__deleted"]).to_pandas()

        a, b = live(lake_a), live(lake_b)
        keys = ["conv_id", "turn_idx"]
        payload = [c for c in a.columns if c not in keys]
        # one row-hash per side (vectorized; both sides hashed in THIS
        # process, so the hash is comparison-stable), then a sorted merge
        ha = pd.util.hash_pandas_object(a[payload], index=False).to_numpy()
        hb = pd.util.hash_pandas_object(b[payload], index=False).to_numpy()
        am = a[keys].assign(__h=ha)
        bm = b[keys].assign(__h=hb)
        j = am.merge(bm, on=keys, how="outer", suffixes=("_a", "_b"),
                     indicator=True)
        status = np.where(
            j["_merge"] == "left_only", "only_a",
            np.where(j["_merge"] == "right_only", "only_b",
                     np.where(j["__h_a"] != j["__h_b"], "differs", "same")))
        j = j.loc[status != "same", keys].assign(
            status=status[status != "same"])
        return {"pid": pid,
                "table": pa.Table.from_pandas(j, preserve_index=False)}

    parts = run_per_partition(one, list(range(la.num_partitions)),
                              distributed)
    tabs = [p["table"] for p in parts if p["table"].num_rows]
    if not tabs:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "turn_idx": pa.array([], pa.int32()),
                         "status": pa.array([], pa.string())})
    return pa.concat_tables(tabs)
