"""Point lookup: the serving-read path of the lake.

Reference anchor: the reference's primary store is HBase, whose whole
point is key-addressed reads — a replicated row is fetched by its salted
row key without scanning the table (CHANGES.txt:102-104 key layout;
README.md:17-20 store semantics). The lake here is hash-partitioned
Parquet chains, so the same capability is a two-level prune:

1. **Partition prune** — the SAME routing hash that placed a key at
   write time (``rayrep.hashing``, pinned in LakeMeta) names the one
   partition that can hold it; a request-sized key list probes
   ``≤ len(keys)`` of P partitions, never the lake.
2. **Chain-read prune** — inside a probed partition, the key predicate
   pushes into every chain-file read (``fold_state_chain(...,
   read_filter=...)``): only matching rows materialize, and on a
   key-sorted compacted state file (``compact_lake(sort_keys=True)``)
   parquet row-group min/max stats skip whole row groups, making the
   probe O(row-group) instead of O(partition).

Cost at the design scale: |probed partitions| bounded folds — a 100 TB
lake at P=4096 serves a 10-key lookup from ≤10 partitions' chains (and
post-compaction, ≤10 row groups), not a 100 TB scan.

Salting caveat (honest, enforced): a lake pinned with
``salt_turn_keys=True`` routes (conv_id, turn_idx>0) by a turn-mixed
hash, so a conv-level lookup cannot name its partitions — pass explicit
``(conv_id, turn_idx)`` pairs there (``LookupKeyError`` otherwise).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayrep.hashing import partition_ids, partition_ids_salted
from rayrep.manifests import EpochManifest, LakeMeta, PartitionManifest


class LookupKeyError(ValueError):
    """The key form cannot be routed on this lake (conv-level lookup on a
    salted lake): the turn-mixed hash spreads one conversation's turns
    across partitions, so only (conv_id, turn_idx) pairs are addressable."""


def _norm_keys(keys) -> tuple[list[str], list[tuple[str, int]] | None]:
    """Accept either conv_id strings (conv-level: every turn of each
    conversation) or (conv_id, turn_idx) pairs (turn-level: exact rows).
    Mixing forms in one request is refused — they route differently."""
    convs, pairs = [], []
    for k in keys:
        if isinstance(k, (tuple, list)):
            c, t = k
            pairs.append((str(c), int(t)))
        else:
            convs.append(str(k))
    if convs and pairs:
        raise LookupKeyError(
            "mixed key forms: pass either conv_id strings or "
            "(conv_id, turn_idx) pairs, not both")
    if pairs:
        return [c for c, _ in pairs], pairs
    return convs, None


def lookup_plan(lake_dir: str, keys) -> dict[int, list]:
    """Route ``keys`` to the partitions that can hold them (no IO beyond
    the two manifest jsons): ``{part_id: [keys routed there]}``. The
    probe set is what makes lookup scale — tests pin ``len(plan) <<
    num_partitions`` for request-sized key lists."""
    lm = LakeMeta.load(lake_dir)
    em = EpochManifest.load(lake_dir)
    P = lm.num_partitions if lm else em.num_partitions
    if P <= 0:
        return {}
    salted = bool(lm and lm.salt_turn_keys)
    convs, pairs = _norm_keys(keys)
    if not convs:
        return {}
    if pairs is None:
        if salted:
            raise LookupKeyError(
                f"{lake_dir} is pinned salt_turn_keys=True: conv-level "
                "lookup cannot name its partitions — pass "
                "(conv_id, turn_idx) pairs")
        pids = partition_ids(convs, P)
        items = convs
    else:
        turns = np.array([t for _, t in pairs], dtype=np.int64)
        pids = (partition_ids_salted(convs, turns, P) if salted
                else partition_ids(convs, P))
        items = pairs
    plan: dict[int, list] = {}
    for pid, item in zip(pids.tolist(), items):
        plan.setdefault(pid, []).append(item)
    return plan


def _probe_partition(lake_dir: str, part_id: int, part_keys: list,
                     target_json: str, cells: bool) -> pa.Table:
    """Fold ONE partition's chain under a key pushdown and return the
    matching live rows (helper cols still attached). Runs on the driver
    for small probes or as a Ray task when the probe set is wide."""
    from rayrep.apply import fold_state_chain, fold_state_chain_cells
    from rayrep.schema import SchemaVersion

    target = SchemaVersion.from_json(target_json)
    m = PartitionManifest.load(lake_dir, part_id)
    pairs = isinstance(part_keys[0], tuple)
    conv_set = sorted({(k[0] if pairs else k) for k in part_keys})
    # bloom sidecars (rayrep/bloom.py, HBase per-HFile bloom analog):
    # chain files proven key-free are never read at all
    from rayrep.bloom import chain_candidates

    chain = chain_candidates(lake_dir, m.state_chain, conv_set)
    if not chain:
        from rayrep.apply import state_schema

        return state_schema(target).empty_table()
    filt = pc.field("conv_id").isin(conv_set)
    fold_fn = fold_state_chain_cells if cells else fold_state_chain
    t = fold_fn(lake_dir, chain, target, read_filter=filt)
    if pairs and t.num_rows:
        # exact pair filter: the conv pushdown is coarse (one conv's other
        # turns may share the partition)
        want = {f"{c}\x00{i}" for c, i in part_keys}
        key = pc.binary_join_element_wise(
            t["conv_id"], pc.cast(t["turn_idx"], pa.string()), "\x00")
        mask = pa.array([k in want for k in key.to_pylist()])
        t = t.filter(mask)
    return t


def lookup(lake_dir: str, keys, parallel_threshold: int = 4) -> pa.Table:
    """Fetch the live converged rows for ``keys`` (conv_id strings or
    (conv_id, turn_idx) pairs) by probing only the partitions the routing
    hash names. Erasure is honored like every read (the anti-filter runs
    before rows leave); tombstoned keys are absent; unknown keys are
    simply missing rows. Probes fan out as Ray tasks when the plan is
    wider than ``parallel_threshold`` and Ray is up; a handful of probes
    run inline (a serving read shouldn't pay task latency)."""
    from rayrep.registry import SchemaRegistry
    from rayrep.retention import _erase_filter, load_erased
    from rayrep.schema import SchemaVersion

    plan = lookup_plan(lake_dir, keys)
    target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
    lm = LakeMeta.load(lake_dir)
    cells = bool(lm and lm.changed_cells)
    if not plan:
        from rayrep.apply import state_schema

        empty = state_schema(SchemaVersion.from_json(target_json)).empty_table()
        return empty.drop_columns(["__seq", "__deleted"])
    items = sorted(plan.items())
    if len(items) > parallel_threshold:
        import ray

        if ray.is_initialized():
            probe = ray.remote(num_cpus=1)(_probe_partition)
            outs = ray.get([probe.remote(lake_dir, pid, pk, target_json, cells)
                            for pid, pk in items])
        else:
            outs = [_probe_partition(lake_dir, pid, pk, target_json, cells)
                    for pid, pk in items]
    else:
        outs = [_probe_partition(lake_dir, pid, pk, target_json, cells)
                for pid, pk in items]
    t = pa.concat_tables(outs, promote_options="permissive")
    t = _erase_filter(t, load_erased(lake_dir))
    t = t.filter(pc.invert(t["__deleted"]))
    return t.drop_columns(["__seq", "__deleted"])
