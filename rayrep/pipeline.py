"""Epoch driver: read → augment → hash-shuffle by conv_id → apply → commit.

Reference analog: the replicator's PipelineOrchestrator loop (SURVEY.md
§3.1) — producer tails the binlog, the augmenter joins rows with the active
schema (CHANGES.txt:87,97-98), the HBase applier pool writes versioned puts
(CHANGES.txt:137), and the pGTID safe checkpoint advances only when every
task for it committed (CHANGES.txt:6-7,113-116).

Ray-Data shape per epoch (one bounded changelog slice):

    read_parquet(epoch file)
      → map_batches(Augmenter, pyarrow, zero-copy, actor pool)      # M2
      → groupby("part_id")                                          # THE shuffle (J1)
      → map_groups(Applier, pyarrow, actor pool)                    # S4/J3/J5
      → tiny counter summaries → invariant check → epoch barrier    # A3/T3

Exactly ONE all-to-all exchange per epoch (the hash partition by conv_id);
everything else is map-side. The epoch loop is the checkpoint cadence:
a killed run resumes from the global epoch manifest, and partitions that
already committed the crashed epoch are skipped idempotently by their own
manifests.

Never calls ``ray.init``/``ray.shutdown`` — the session is owned by the
caller (driver, tests, bench).
"""

from __future__ import annotations

import glob
import json
import os
import re
import time

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from rayrep.apply import Applier, events_as_state, lww_last_rows
from rayrep.augment import Augmenter
from rayrep.config import EngineConfig
from rayrep.manifests import (
    COUNTER_KEYS,
    EpochManifest,
    LakeMeta,
    PartitionManifest,
    CompactedLogError,
    TrimmedLogError,
    atomic_write_json,
    log_floor,
    merge_counters,
    require_full_history,
    zero_counters,
)
from rayrep.registry import SchemaRegistry
from rayrep.schema import SchemaVersion

EPOCH_RE = re.compile(r"epoch-(\d+)(\.parquet)?$")


SPAN_RE = re.compile(r"epoch-(\d+)-c(\d+)$")


def discover_epochs(changelog_dir: str) -> list[tuple[int, str]]:
    """Epochs are single files (`epoch-00000.parquet`, hand-built
    fixtures), directories of part files (`epoch-00000/part-*.parquet`,
    the parallel-read layout the generator produces), or COMPACTED SPANS
    (`epoch-00000-c00005/`, rayrep/logcompact.py): a span stands for the
    whole range ``[first, last]`` it was compacted from and is listed
    under its END epoch number (resume semantics: a lake whose barrier is
    anywhere inside the span re-reads it and converges via the watermark
    anti-join; a lake at/above the end skips it).  Plain epochs and older
    spans fully covered by a span are SHADOWED — they are garbage a
    crashed compactor hasn't deleted yet (the span dir renames into place
    atomically BEFORE originals are removed), so preferring the span is
    what makes compaction crash-monotone."""
    plain, spans = [], []
    for p in sorted(glob.glob(os.path.join(changelog_dir, "epoch-*"))):
        m2 = SPAN_RE.search(p)
        if m2 and os.path.isdir(p):
            spans.append((int(m2.group(1)), int(m2.group(2)), p))
            continue
        m = EPOCH_RE.search(p)
        if m and (os.path.isdir(p) or p.endswith(".parquet")):
            plain.append((int(m.group(1)), p))
    if not spans:
        return plain
    spans = [s for s in spans
             if not any(o is not s and o[0] <= s[0] and s[1] <= o[1]
                        for o in spans)]
    out = [(e, p) for e, p in plain
           if not any(f <= e <= l for f, l, _ in spans)]
    out += [(l, p) for _, l, p in spans]
    return sorted(out)


def _max_watermark(lake_dir: str) -> int:
    """Highest committed seq across all partition manifests (-1 = none)."""
    wm = -1
    for mp in glob.glob(os.path.join(lake_dir, "_manifests", "p*.json")):
        with open(mp) as f:
            wm = max(wm, json.load(f).get("last_seq", -1))
    return wm


def epoch_min_seq(path: str) -> int | None:
    """Min `seq` of an epoch from Parquet row-group statistics only (no
    data read). None when stats are unavailable → callers must assume the
    epoch may overlap the watermark."""
    import pyarrow.parquet as pq

    files = [path] if path.endswith(".parquet") else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    mn = None
    for fp in files:
        md = pq.read_metadata(fp)
        names = md.schema.to_arrow_schema().names
        if "seq" not in names:
            return None
        ci = names.index("seq")
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None
            mn = st.min if mn is None else min(mn, st.min)
    return mn


def ddl_rows_table(path: str, columns: list[str]) -> pa.Table | None:
    """DDL rows of one epoch as a seq-sorted table of ``columns``, pruned
    by Parquet METADATA: the ``ddl`` column is null on every data row
    (only DDL events carry a payload), so a row group whose ``ddl``
    null_count equals its num_rows provably holds none — the common case
    is a footer-only pass with ZERO data bytes read.  A pushed-down
    ``op == "DDL"`` filter cannot prune: string min/max stats keep "DDL"
    inside the ["D", "U"] range of ordinary I/U/D rows, so every row
    group's columns would decompress on the driver — ~0.76 s of serial
    fixed cost per 20M-event round that scaled with log size, not with
    cluster size.  Returns None when no file carries a ``ddl`` column."""
    import pyarrow.parquet as pq

    files = [path] if path.endswith(".parquet") else sorted(
        glob.glob(os.path.join(path, "*.parquet"))
    )
    chunks = []
    for fp in files:
        pf = pq.ParquetFile(fp)
        names = pf.metadata.schema.to_arrow_schema().names
        if "ddl" not in names:
            continue  # epoch written without a ddl column: no DDL events
        ci = names.index("ddl")
        keep = []
        for rg in range(pf.metadata.num_row_groups):
            rgm = pf.metadata.row_group(rg)
            st = rgm.column(ci).statistics
            # stats missing → cannot prove absence, must read
            if st is None or not st.has_null_count or st.null_count < rgm.num_rows:
                keep.append(rg)
        if keep:
            t = pf.read_row_groups(keep, columns=list(dict.fromkeys(["op", *columns])))
            chunks.append(t.filter(pc.equal(t["op"], "DDL")).select(columns))
    if not chunks:
        return None
    tbl = pa.concat_tables(chunks)
    if tbl.num_rows > 1:
        tbl = tbl.sort_by("seq")  # part files may split one epoch's DDLs
    return tbl


def extract_ddl_events(path: str, max_ts_us: int | None = None) -> list[tuple[int, str]]:
    """Driver-side metadata-pruned scan of one epoch for DDL rows (see
    ``ddl_rows_table``), optionally bounded by a point-in-time ``ts``."""
    tbl = ddl_rows_table(path, ["seq", "ddl", "ts"])
    if tbl is None:
        return []
    if max_ts_us is not None and tbl.num_rows:
        tbl = tbl.filter(pc.less_equal(tbl["ts"], pa.scalar(max_ts_us, pa.timestamp("us"))))
    return [(s, d) for s, d in zip(tbl["seq"].to_pylist(), tbl["ddl"].to_pylist())]


class ReplayResult(dict):
    """Totals + per-epoch metrics from a replay run."""


def _augment(
    ds: rd.Dataset,
    target_json: str,
    num_partitions: int,
    table_filter_regex: str = "",
    batch_size: int = 16384,
    concurrency: int | None = None,
    carry_txn: bool = False,
    salt_turn_keys: bool = False,
    validate_events: bool = False,
    history_json: str = "",
    dead_letter_dir: str = "",
    dlq_epoch: int = -1,
):
    """Attach the augmenter stage. With ``concurrency=None`` it runs as
    stateless tasks (elastic, no idle CPU reservation — an idle actor pool
    plus another pool can starve the shuffle of CPUs and deadlock the
    streaming executor on small machines); with an int it becomes an
    autoscaling actor pool ``(1, N)``."""
    kwargs = dict(
        target_schema_json=target_json,
        num_partitions=num_partitions,
        table_filter_regex=table_filter_regex,
        carry_txn=carry_txn,
        salt_turn_keys=salt_turn_keys,
        validate_events=validate_events,
        history_json=history_json,
        dead_letter_dir=dead_letter_dir,
        dlq_epoch=dlq_epoch,
    )
    if concurrency is None:
        return ds.map_batches(
            _augment_task_fn,
            fn_kwargs={"kwargs": kwargs},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
        )
    return ds.map_batches(
        Augmenter,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def _applier_task_fn(group: pa.Table, kwargs: dict) -> pa.Table:
    """Task-mode applier: one cached Applier instance per (worker process,
    epoch config). Safe because every durable effect is deterministic-name
    + atomic-rename (retried tasks overwrite, never append)."""
    if "blob" in group.column_names:  # packed exchange (rayrep/exchange.py)
        from rayrep.exchange import unpack_group

        group = unpack_group(group)
    key = tuple(sorted((k, v) for k, v in kwargs.items()))
    app = _APPLIER_CACHE.get(key)
    if app is None:
        _APPLIER_CACHE.clear()  # one epoch in flight at a time; drop stale
        app = Applier(**kwargs)
        _APPLIER_CACHE[key] = app
    return app(group)


class _PackedApplier(Applier):
    """Actor-mode applier for the packed exchange: unpack, then apply."""

    def __call__(self, group: pa.Table) -> pa.Table:
        from rayrep.exchange import unpack_group

        return super().__call__(unpack_group(group))


_APPLIER_CACHE: dict = {}


def _augment_task_fn(batch: pa.Table, kwargs: dict) -> pa.Table:
    # Schema parse + regex compile cost ~µs; caching per process via lru
    # keeps the task path as cheap as the actor path.
    key = tuple(sorted((k, str(v)) for k, v in kwargs.items()))
    aug = _AUG_CACHE.get(key)
    if aug is None:
        if len(_AUG_CACHE) > 64:
            # dlq_epoch varies per epoch in dead-letter mode — bound the
            # cache so an endurance tail can't grow it without limit
            _AUG_CACHE.clear()
        aug = Augmenter(**kwargs)
        _AUG_CACHE[key] = aug
    return aug(batch)


_AUG_CACHE: dict = {}


def resolve_pack_exchange(cfg) -> bool:
    """Resolve ``cfg.pack_exchange`` (bool | "auto") to a concrete bool,
    once per replay.  "auto" packs exactly when the exchange crosses node
    boundaries: on a multi-node cluster every shuffled byte traverses a
    NIC, so the LZ4 Arrow-IPC packing (32.6 vs 72.4 B/event measured by
    ``bench.py --bytes``) is an unconditional win; on one box the plain
    sort shuffle avoids the pack/unpack ALU cost and auto stays off.
    Resolved ONCE so a node joining/leaving mid-replay cannot flip the
    exchange shape between epochs (both shapes are correct — the blob
    boundary is invisible to LWW/counters — but flip-flopping would make
    perf traces unreadable)."""
    if cfg.exchange != "groupby":
        return False
    if isinstance(cfg.pack_exchange, str):
        if cfg.pack_exchange != "auto":
            raise ValueError(
                f"pack_exchange must be a bool or 'auto', got {cfg.pack_exchange!r}")
        import ray

        if not ray.is_initialized():
            return False
        return sum(1 for n in ray.nodes() if n.get("Alive")) > 1
    return bool(cfg.pack_exchange)


def _epoch_bytes(path: str) -> int:
    """Compressed on-disk bytes of an epoch (file or dir)."""
    if path.endswith(".parquet"):
        return os.path.getsize(path)
    return sum(os.path.getsize(f)
               for f in glob.glob(os.path.join(path, "*.parquet")))


def _round_byte_budget() -> int:
    """Byte cap for one multi-epoch round, in COMPRESSED INPUT bytes.

    Empirical (2026-08-20, 40 GB store, 32 cpus): rounds up to ~0.9 GB
    input run clean (40M events, 24 s); a 1.8 GB-input round (80M
    events) stalls the sort exchange >10 min in spill thrash — the
    uncompressed augmented stream plus the sort's double-buffering
    amplifies input bytes ~10-20x through plasma. store/32 splits the
    measured-bad case and keeps the measured-good one whole, and scales
    with the store on bigger nodes. 0 = unknown store size, no cap."""
    try:
        import ray

        store = ray.cluster_resources().get("object_store_memory", 0)
        return int(store) // 32
    except Exception:
        return 0


def _scoped_block_size(fn):
    """Apply ``cfg.target_block_mb`` and ``cfg.read_min_blocks`` to the
    Ray DataContext for the duration of the call and restore the prior
    values after — the driver process may run non-engine datasets
    afterwards, so the engine must not leak its block preferences into
    the session.

    ``read_min_blocks``: Ray's ``read_op_min_num_blocks`` default (200)
    is a small-dataset heuristic — it shreds each epoch's parquet into
    ~2 MB blocks so toy reads still parallelize, and at 20 M events that
    means 800 blocks/round whose per-block scheduling/IPC overhead
    dominates the exchange (measured: dropping the floor to the core
    count cut the 32-cpu headline replay 8.1 s → 6.6 s, +37%, and the
    8-cpu one 21.7 s → 14.6 s, +49%). At the 100 TB design point reads
    produce abundant blocks naturally and the floor is irrelevant; on
    any cluster, per-core parallelism is the right lower bound — "auto"
    sets it to the cluster's CPU count."""
    import functools

    @functools.wraps(fn)
    def wrapper(cfg, *args, **kwargs):
        mb = getattr(cfg, "target_block_mb", None)
        rmb = getattr(cfg, "read_min_blocks", None)
        if not mb and not rmb:
            return fn(cfg, *args, **kwargs)
        import ray
        from ray.data import DataContext

        ctx = DataContext.get_current()
        old = ctx.target_max_block_size
        old_min = getattr(ctx, "read_op_min_num_blocks", None)
        if mb:
            ctx.target_max_block_size = mb * 1024 * 1024
        if rmb and old_min is not None:
            if rmb == "auto":
                try:
                    rmb = max(8, int(ray.cluster_resources().get("CPU", 8)))
                except Exception:
                    rmb = 8
            ctx.read_op_min_num_blocks = int(rmb)
        try:
            return fn(cfg, *args, **kwargs)
        finally:
            ctx.target_max_block_size = old
            if old_min is not None:
                ctx.read_op_min_num_blocks = old_min

    return wrapper


@_scoped_block_size
def replay(cfg: EngineConfig, end_epoch: int | None = None,
           _start_epoch: int | None = None,
           _only_part_ids: tuple[int, ...] | None = None,
           _lease=None) -> ReplayResult:
    """Run (or resume) the streaming replay. ``end_epoch`` bounds the run
    (inclusive) — the `--end-binlog-file` analog (CHANGES.txt:129); also used
    by the resume test to simulate a mid-replay kill.

    ``_start_epoch``/``_only_part_ids`` are the targeted-repair entry
    (``rayrep.repair.repair_partitions``): re-replay from an explicit
    epoch with the exchange filtered to the partitions being rebuilt.
    In repair mode the global epoch barrier is never advanced per round
    (the lake stays readable at its committed frontier throughout) and
    only refreshed — totals from the rebuilt manifests — at the end."""
    if cfg.exchange not in ("groupby", "staged"):
        raise ValueError(f"exchange must be 'groupby' or 'staged', got {cfg.exchange!r}")
    pack = resolve_pack_exchange(cfg)
    epochs = discover_epochs(cfg.changelog_dir)
    if not epochs:
        raise FileNotFoundError(f"no epoch-*.parquet under {cfg.changelog_dir}")
    os.makedirs(cfg.lake_dir, exist_ok=True)

    registry = SchemaRegistry(
        persist_dir=cfg.lake_dir, initial_json=cfg.initial_schema_json or None
    )
    em = EpochManifest.load(cfg.lake_dir)
    lm = LakeMeta.load(cfg.lake_dir)
    if lm is None:
        # Migration fallback for pre-LakeMeta lakes: the epoch-manifest pin
        # (written after the first full epoch) or, inside the epoch-0 crash
        # window, the committed partition ids (0..P-1 → max+1 is a lower
        # bound on the routing width the keys were hashed with).
        committed_parts = em.num_partitions
        ids = [
            int(re.search(r"p(\d+)\.json$", p).group(1))
            for p in glob.glob(os.path.join(cfg.lake_dir, "_manifests", "p*.json"))
        ]
        if not committed_parts and ids and max(ids) + 1 > cfg.num_partitions:
            committed_parts = max(ids) + 1
        # A lake with ANY committed state but no lake.json predates LakeMeta,
        # and therefore predates turn-key salting: it was necessarily written
        # unsalted. Pin salt_turn_keys=False so a resume with
        # cfg.salt_turn_keys=True fails the pin check below instead of
        # silently re-routing (conv_id, turn_idx>0) keys to different
        # partitions and duplicating state rows. A genuinely fresh lake (no
        # manifests at all) takes the config values — they get pinned on the
        # first commit.
        legacy = bool(em.num_partitions) or bool(ids)
        lm = LakeMeta(num_partitions=committed_parts or cfg.num_partitions,
                      changed_cells=cfg.changed_cells_updates,
                      per_cell=cfg.per_cell_conflicts and cfg.changed_cells_updates,
                      salt_turn_keys=False if legacy else cfg.salt_turn_keys,
                      dedup_ingest=False if legacy else cfg.dedup_ingest)
    if lm.num_partitions != cfg.num_partitions:
        raise ValueError(
            f"lake {cfg.lake_dir} was committed with num_partitions="
            f"{lm.num_partitions}; resuming with {cfg.num_partitions} would "
            "route keys to different partitions and duplicate state rows"
        )
    if lm.salt_turn_keys != cfg.salt_turn_keys:
        raise ValueError(
            f"lake {cfg.lake_dir} was committed with salt_turn_keys="
            f"{lm.salt_turn_keys}; resuming with {cfg.salt_turn_keys} would "
            "route keys to different partitions and duplicate state rows"
        )
    if lm.dedup_ingest != cfg.dedup_ingest:
        raise ValueError(
            f"lake {cfg.lake_dir} was committed with dedup_ingest="
            f"{lm.dedup_ingest}; resuming with {cfg.dedup_ingest} would "
            "change which rows exist (content claims are lake state)"
        )
    if lm.changed_cells != cfg.changed_cells_updates or lm.per_cell != (
        cfg.per_cell_conflicts and cfg.changed_cells_updates
    ):
        raise ValueError(
            f"lake {cfg.lake_dir} was written with changed_cells="
            f"{lm.changed_cells}/per_cell={lm.per_cell}; its state chain "
            "cannot be folded under different conflict semantics"
        )
    if not cfg.dry_run:
        lm.save(cfg.lake_dir)  # pin BEFORE any partition commit
    lease = _lease
    if lease is not None:
        # Caller-held lease (``tail`` holds ONE lease for its whole
        # session): verify it is still ours, renew, and DON'T release at
        # return — the caller owns the lifecycle.
        lease.renew()
    elif cfg.writer_lease and not cfg.dry_run:
        # HA single-writer contract (rayrep/lease.py): acquire before the
        # first commit; fail fast with LeaseHeldError if another writer is
        # live (unless this run is the elected successor: lease_takeover).
        from rayrep import lease as _lease_mod

        lease = _lease_mod.acquire(
            cfg.lake_dir,
            owner=cfg.lease_owner or None,
            ttl_s=cfg.lease_ttl_s,
            takeover=cfg.lease_takeover,
        )
    repair = _only_part_ids is not None
    start = _start_epoch if _start_epoch is not None else em.last_epoch + 1
    floor = log_floor(cfg.changelog_dir)
    if floor > start:
        # the log was trimmed past this run's starting epoch: a fresh
        # replay (or a repair, which re-replays from 0) would silently
        # miss the trimmed events — refuse instead. A lake whose barrier
        # is at/above floor-1 resumes normally.
        raise TrimmedLogError(
            f"replay of {cfg.changelog_dir} would start at epoch {start} "
            f"but the log was trimmed to first_epoch={floor} "
            f"(lake barrier {em.last_epoch}); "
            + ("targeted repair needs the full history — restore the "
               "archived epochs" if repair else
               "only a lake already committed through the trimmed epochs "
               "can resume against this log")
        )
    totals = dict(em.totals)
    per_epoch = []

    # Compacted-span guards (rayrep/logcompact.py): a span replays only as
    # a unit and only with semantics at least as fine as it retained.
    from rayrep.logcompact import span_meta as _span_meta

    for e, p in epochs:
        sm = _span_meta(p)
        if sm is None:
            continue
        if end_epoch is not None and sm["first_epoch"] <= end_epoch < e:
            raise CompactedLogError(
                f"end_epoch={end_epoch} falls strictly inside compacted "
                f"span [{sm['first_epoch']}, {e}] of {cfg.changelog_dir} — "
                "a span replays only as a whole (its intermediate epoch "
                "boundaries were compacted away)")
        if cfg.changed_cells_updates and sm["mode"] == "row" and e >= start:
            raise CompactedLogError(
                f"span [{sm['first_epoch']}, {e}] was ROW-compacted "
                "(latest event per key) but this replay runs with "
                "changed_cells_updates=True — older partial-update "
                "carriers are gone; recompact source logs with "
                "mode='cells' for per-cell lakes")
        if cfg.dedup_ingest and e >= start:
            # content-claim order is HISTORY-dependent: a compacted-away
            # event may have been the first claimant of its content, so
            # replaying the span under dedup-on-ingest can admit rows the
            # full history would have dropped (and vice versa)
            raise CompactedLogError(
                f"span [{sm['first_epoch']}, {e}] cannot replay with "
                "dedup_ingest=True — compaction discarded events whose "
                "content claims the dedup semantics depend on; keep "
                "dedup-on-ingest logs uncompacted (trim-log bounds them)")

    pending = [
        (e, p)
        for e, p in epochs
        if e >= start and (end_epoch is None or e <= end_epoch)
    ]
    k = max(1, cfg.epochs_per_round)
    rounds = [pending[i : i + k] for i in range(0, len(pending), k)]
    if k > 1 and rounds:
        # A round's whole exchange lives in the object store between the
        # map and reduce sides of the shuffle; a round much bigger than
        # the store thrashes the spiller (measured: one 80M-event round
        # stalls >10 min where 4x20M rounds finish in 22 s). Cap rounds
        # by INPUT BYTES (footer metadata only) at a fraction of the
        # store — augmented+packed exchange bytes are of the same order
        # as the compressed input. Commit granularity stays per round;
        # splitting only adds barriers, never changes the final state.
        budget = _round_byte_budget()
        if budget:
            sized, cur, cur_b = [], [], 0
            for rnd in rounds:
                for e, p in rnd:
                    b = _epoch_bytes(p)
                    if cur and cur_b + b > budget:
                        sized.append(cur)
                        cur, cur_b = [], 0
                    cur.append((e, p))
                    cur_b += b
                if cur:  # never merge ACROSS configured round boundaries
                    sized.append(cur)
                    cur, cur_b = [], 0
            rounds = sized

    for rnd in rounds:
        epoch = rnd[-1][0]  # commit frontier = last epoch of the round
        t0 = time.perf_counter()
        # M9/J2: DDL → registry (broadcast-small-side; never a shuffle).
        for _, path in rnd:
            registry.apply_ddl_events(extract_ddl_events(path))
        target_json = registry.current_json()
        # broadcast the version history only when this round may span
        # several schema versions (stepwise evolution is needed exactly
        # then): multi-epoch rounds, and ANY repair round (a from-zero
        # repair replays old epochs against the already-final registry);
        # the common single-version forward round ships nothing
        history_json = (
            registry.history_json() if len(rnd) > 1 or repair else ""
        )

        dlq_dir = ""
        if cfg.dead_letter and not cfg.dry_run:
            # exactly-once quarantine: only UNCOMMITTED epochs ever (re)run,
            # so clearing each pending epoch's dlq dir before augmenting
            # makes the quarantine a pure function of the committed barrier
            dlq_dir = os.path.join(cfg.lake_dir, "dlq")
            for e, _ in rnd:
                ed = os.path.join(dlq_dir, f"e{e:05d}")
                if os.path.isdir(ed):
                    import shutil

                    trash = ed + ".trash"
                    os.replace(ed, trash)
                    shutil.rmtree(trash)
        parts = []
        for e, path in rnd:
            eds = rd.read_parquet(path)
            parts.append(
                _augment(
                    eds,
                    target_json,
                    cfg.num_partitions,
                    cfg.table_filter_regex,
                    cfg.batch_size,
                    cfg.augmenter_concurrency,
                    carry_txn=cfg.txn_lineage,
                    salt_turn_keys=cfg.salt_turn_keys,
                    validate_events=cfg.validate_events,
                    history_json=history_json,
                    dead_letter_dir=dlq_dir,
                    dlq_epoch=e,
                )
            )
        ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
        if repair:
            # targeted rebuild: only the repaired partitions' rows enter
            # the exchange — repair cost is O(changelog read) + O(1/P of
            # the shuffle/apply), not a full re-replay
            _ids = pa.array(sorted(_only_part_ids), pa.int32())
            ds = ds.map_batches(
                lambda t, _v=_ids: t.filter(
                    pc.is_in(t.column("part_id"), value_set=_v)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        if cfg.dedup_ingest:
            # Dedup-on-ingest: content-bucket exchange + first-claim filter
            # BEFORE combine/pack/the conv exchange (rayrep/ingest_dedup.py).
            from rayrep.ingest_dedup import dedup_stage

            ds = dedup_stage(
                ds,
                lake_dir=cfg.lake_dir,
                epoch=epoch,
                num_buckets=cfg.num_partitions,
                content_col=cfg.dedup_content_col,
                persist=not cfg.dry_run,
                durable=cfg.durable_sync,
                batch_size=cfg.batch_size,
            )
        # Map-side combine (rayrep/combine.py): only when every event seq in
        # this round is provably above every committed watermark — always
        # true in normal forward replay; a resumed round that overlaps a
        # partial commit falls back to the full per-event path.
        combine = (
            cfg.map_combine
            and not cfg.changed_cells_updates
            and not cfg.dry_run
            and cfg.exchange == "groupby"
        )
        if combine:
            wm = _max_watermark(cfg.lake_dir)
            if wm >= 0:
                mins = [epoch_min_seq(p) for _, p in rnd]
                if any(m is None or m <= wm for m in mins):
                    combine = False
        if combine:
            from rayrep.combine import combine_batch, combine_combined

            ds = ds.map_batches(
                combine_batch,
                fn_kwargs={"by_day": cfg.delta_output},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            if cfg.map_combine2:
                # second level: collapse cross-batch duplicates of hot keys
                # (a combined batch spans several source batches' winners)
                ds = ds.map_batches(
                    combine_combined,
                    fn_kwargs={"keep_all_pmax": cfg.delta_output},
                    batch_format="pyarrow",
                    zero_copy_batch=True,
                    batch_size=cfg.batch_size,
                )
        if cfg.dry_run:
            # STDOUT/JSON debug sink (CHANGES.txt:43,143): no side effects.
            for row in ds.limit(5).take_all():
                print(json.dumps(row, default=str))
            continue
        packed = pack
        if packed:
            from rayrep.exchange import pack_batch

            ds = ds.map_batches(
                pack_batch,
                fn_kwargs={"codec": cfg.pack_codec},
                batch_format="pyarrow",
                zero_copy_batch=True,
                batch_size=cfg.batch_size,
            )
        applier_kwargs = {
            "lake_dir": cfg.lake_dir,
            "epoch": epoch,
            "target_schema_json": target_json,
            "changed_cells": cfg.changed_cells_updates,
            "per_cell": cfg.per_cell_conflicts,
            "delta_output": cfg.delta_output,
            "chaos_fraction": cfg.chaos_fraction,
            "chaos_seed": cfg.chaos_seed,
            "compact_interval": cfg.state_snapshot_interval,
            "durable_sync": cfg.durable_sync,
            "lease_token": lease.token if lease is not None else 0,
        }
        stage_stats = None
        if cfg.exchange == "staged":
            from rayrep.exchange import run_staged_exchange

            summaries = run_staged_exchange(ds, cfg.lake_dir, epoch, applier_kwargs)
        else:
            grouped = ds.groupby("part_id")
            if cfg.applier_mode == "tasks":
                applied = grouped.map_groups(
                    _applier_task_fn,
                    fn_kwargs={"kwargs": applier_kwargs},
                    batch_format="pyarrow",
                    num_cpus=1,
                )
            else:
                applied = grouped.map_groups(
                    _PackedApplier if packed else Applier,
                    fn_constructor_kwargs=applier_kwargs,
                    batch_format="pyarrow",
                    concurrency=(1, cfg.applier_concurrency),
                    num_cpus=1,
                )
            summaries = applied.take_all()  # tiny: one row per touched partition
            if cfg.collect_stats:
                stage_stats = applied.stats()

        ctr = zero_counters()
        max_ts = 0
        chaos_retries = 0
        for row in summaries:
            if not row["already_committed"]:
                # fresh applies only; a resumed epoch's committed partitions
                # are already in their cumulative manifests
                ctr = merge_counters(ctr, {k: row[k] for k in COUNTER_KEYS})
            max_ts = max(max_ts, row["max_ts_us"])
            chaos_retries += row["chaos_retries"]
        # A3: the metrics-gated barrier (CHANGES.txt:113-116) — refuse to
        # advance the checkpoint if counters don't reconcile. A real raise,
        # not an assert: `python -O` must not remove the exactly-once gate.
        if ctr["applied"] + ctr["skipped"] + ctr["conflict"] != ctr["input_rows"]:
            raise RuntimeError(f"epoch {epoch}: counter invariant violated: {ctr}")
        # cumulative totals come from the atomically-committed partition
        # manifests — robust to any crash/resume window
        totals = aggregate_partition_counters(cfg.lake_dir)
        delay_s = max(0.0, time.time() - max_ts / 1e6) if max_ts else 0.0
        if lease is not None:
            # Renew-at-barrier: a fenced-out writer (successor took over)
            # raises LeaseLostError HERE — before publishing a barrier the
            # successor would disagree with. The per-partition token stamp
            # (StaleWriterError at manifest save) backstops the window
            # inside this round.
            lease.renew()
        if not repair:
            # repair never advances (or regresses) the global barrier:
            # healthy partitions stay at the committed frontier and a
            # repaired one legitimately lags it until the rebuild is done
            EpochManifest(last_epoch=epoch, totals=totals,
                          replication_delay_s=delay_s,
                          num_partitions=cfg.num_partitions).save(cfg.lake_dir)
        entry = {
            "epoch": epoch,
            "round_epochs": [e for e, _ in rnd],
            **ctr,
            "chaos_retries": chaos_retries,
            "wall_s": round(time.perf_counter() - t0, 4),
            "replication_delay_s": round(delay_s, 3),
        }
        if dlq_dir:
            # per-round quarantine count from file metadata (footer-only)
            import pyarrow.parquet as _pq

            q = 0
            for e, _ in rnd:
                for f in glob.glob(os.path.join(dlq_dir, f"e{e:05d}",
                                                "part-*.parquet")):
                    q += _pq.read_metadata(f).num_rows
            entry["quarantined"] = q
        if cfg.dedup_ingest:
            from rayrep.ingest_dedup import deduped_for_epoch

            entry["deduped"] = deduped_for_epoch(cfg.lake_dir, epoch)
        if stage_stats:
            entry["stage_stats"] = stage_stats
        per_epoch.append(entry)
        if cfg.metrics_stream and not cfg.dry_run and not repair:
            # stream view of the barrier the manifests just committed:
            # per-epoch counters + the delay gauge + cumulative totals
            from rayrep import metrics as _metrics

            _metrics.emit(cfg.lake_dir, {
                "kind": "epoch", **{k: v for k, v in entry.items()
                                    if k != "stage_stats"},
                "totals": totals,
                "schema_version": registry.current_version(),
            })

    metrics = {"totals": totals, "epochs": per_epoch, "schema_version": registry.current_version()}
    if cfg.dedup_ingest:
        from rayrep.ingest_dedup import cumulative_deduped

        metrics["deduped_total"] = cumulative_deduped(cfg.lake_dir)
    if repair and rounds:
        # refresh the (unchanged) barrier's cached totals from the rebuilt
        # manifests; metrics.json keeps the last FULL replay's record (the
        # repair run's per-epoch rows cover only the filtered partitions)
        EpochManifest(last_epoch=em.last_epoch, totals=totals,
                      replication_delay_s=em.replication_delay_s,
                      num_partitions=cfg.num_partitions).save(cfg.lake_dir)
    elif not cfg.dry_run:
        atomic_write_json(os.path.join(cfg.lake_dir, "_manifests", "metrics.json"), metrics)
    if lease is not None and _lease is None:
        # Clean hand-off only: a crashed writer never reaches here, so its
        # lease goes stale and a successor takes over by TTL or takeover.
        # (A caller-held lease — tail mode — is released by the caller.)
        lease.release()
    return ReplayResult(metrics)


def aggregate_partition_counters(lake_dir: str) -> dict:
    """Global cumulative counters = LakeMeta baseline + sum over
    per-partition manifests (A1: partial per-task counters merged to
    totals, CHANGES.txt:171-172). The baseline is non-zero only after a
    ``repartition_lake`` (which zeroes the per-partition counters); it
    keeps lifetime totals monotone across layout rewrites."""
    lm = LakeMeta.load(lake_dir)
    totals = dict(lm.counters_baseline) if lm is not None else zero_counters()
    for mp in glob.glob(os.path.join(lake_dir, "_manifests", "p*.json")):
        with open(mp) as f:
            m = json.load(f)
        totals = merge_counters(totals, m.get("counters", {}))
    return totals


def tail(
    cfg: EngineConfig,
    poll_interval_s: float = 2.0,
    idle_timeout_s: float | None = 30.0,
    max_epochs: int | None = None,
    compact_log_every: int | None = None,
    compact_lake_every: int | None = None,
) -> ReplayResult:
    """Continuous CDC tail — the replicator's long-running mode: poll the
    changelog directory for newly published epochs and apply them as they
    arrive (reference: BinlogEventProducer tails the binlog; fail-fast +
    supervisor restart resumes from the checkpoint, CHANGES.txt:66-69 —
    here a restarted ``tail`` resumes from the manifests automatically).

    Producers must publish epochs ATOMICALLY: write the epoch under a
    temp name, then rename to ``epoch-NNNNN[/]`` (see
    ``gen.publish_epoch``); a half-written directory must never match the
    ``epoch-*`` glob. Stops after ``idle_timeout_s`` with no new epochs
    (None = run forever) or after ``max_epochs`` applied.

    With ``cfg.writer_lease`` the tailer holds ONE lease for its whole
    session — acquired up front (``lease_takeover`` elects this tailer
    over a crashed predecessor), renewed on every poll (including idle
    ones, so the TTL never lapses while the tailer is merely waiting),
    and released only on clean exit. A fenced-out tailer (a successor
    took over) raises ``LeaseLostError`` at its next poll instead of
    double-writing — the ZK session-expiry shutdown analog
    (README.md:17-20).

    Self-maintenance (the "tail forever" completion — a long-running
    replicator whose LOG and STATE both stay bounded without an external
    cron): ``compact_log_every=K`` runs Kafka-style log compaction
    (rayrep/logcompact.py) whenever ≥K committed plain epochs sit below
    the barrier — the span covers [first, barrier-1], the active epoch
    and anything uncommitted stay untouched, and the lake-barrier check
    makes it safe under this very tailer.  ``compact_lake_every=K``
    major-compacts the lake's state chains every K newly applied epochs.
    Both run inside the lease session, between polls — the single-writer
    contract covers maintenance exactly like applies."""
    applied = 0
    applied_since_lake_compact = 0
    last_new = time.monotonic()
    all_epochs: list = []
    last: ReplayResult | None = None
    maintenance = {"log_compactions": 0, "lake_compactions": 0}
    lease = None
    if cfg.writer_lease and not cfg.dry_run:
        from rayrep import lease as _lease_mod

        lease = _lease_mod.acquire(
            cfg.lake_dir,
            owner=cfg.lease_owner or None,
            ttl_s=cfg.lease_ttl_s,
            takeover=cfg.lease_takeover,
        )
    while True:
        if lease is not None:
            lease.renew()  # idle polls keep the lease fresh; fenced → raise
        try:
            res = replay(cfg, _lease=lease)
        except FileNotFoundError:
            # tailer started before the producer published its first epoch:
            # keep polling until idle_timeout_s, don't crash (long-running
            # consumer intent, CHANGES.txt:66-69)
            if idle_timeout_s is not None and time.monotonic() - last_new > idle_timeout_s:
                raise
            time.sleep(poll_interval_s)
            continue
        n = len(res["epochs"])
        if n:
            applied += n
            applied_since_lake_compact += n
            last_new = time.monotonic()
            all_epochs.extend(res["epochs"])
            last = res
        if n and compact_log_every:
            from rayrep.logcompact import compact_changelog, span_meta

            em_t = EpochManifest.load(cfg.lake_dir)
            plain_below = [e for e, p in discover_epochs(cfg.changelog_dir)
                           if span_meta(p) is None and e < em_t.last_epoch]
            if len(plain_below) >= compact_log_every:
                res_c = compact_changelog(
                    cfg.changelog_dir,
                    through_epoch=em_t.last_epoch - 1,
                    lake_dir=cfg.lake_dir,
                    mode="cells" if cfg.changed_cells_updates else "row",
                    # dead-letter lakes quarantine null-key events but the
                    # LOG retains them; drop the same rows from the span
                    # (counted in _span.json) or compaction would refuse
                    drop_malformed=cfg.dead_letter,
                )
                maintenance["log_compactions"] += 1
                if cfg.metrics_stream and not cfg.dry_run:
                    from rayrep import metrics as _metrics

                    _metrics.emit(cfg.lake_dir, {
                        "kind": "log_compaction",
                        "through_epoch": em_t.last_epoch - 1,
                        "n_original": (res_c or {}).get("n_original"),
                        "n_retained": (res_c or {}).get("n_retained"),
                        "bytes_before": (res_c or {}).get("bytes_before"),
                        "bytes_after": (res_c or {}).get("bytes_after"),
                    })
        if n and compact_lake_every \
                and applied_since_lake_compact >= compact_lake_every:
            from rayrep.compact import compact_lake

            compact_lake(cfg.lake_dir)
            maintenance["lake_compactions"] += 1
            applied_since_lake_compact = 0
            if cfg.metrics_stream and not cfg.dry_run:
                from rayrep import metrics as _metrics

                _metrics.emit(cfg.lake_dir, {"kind": "lake_compaction"})
        if max_epochs is not None and applied >= max_epochs:
            break
        if idle_timeout_s is not None and time.monotonic() - last_new > idle_timeout_s:
            break
        time.sleep(poll_interval_s)
    if last is None:
        last = replay(cfg, _lease=lease)
        all_epochs.extend(last["epochs"])
    last["epochs"] = all_epochs
    last["maintenance"] = maintenance
    if lease is not None:
        lease.release()
    return last


# --------------------------------------------------------------------- reads
def committed_state_chains(lake_dir: str) -> list[list[str]]:
    """Per-partition state chains (relative paths, oldest→newest) from the
    committed manifests (loaded via PartitionManifest so pre-chain-layout
    lakes migrate transparently)."""
    chains = []
    for mp in sorted(glob.glob(os.path.join(lake_dir, "_manifests", "p*.json"))):
        part_id = int(re.search(r"p(\d+)\.json$", mp).group(1))
        m = PartitionManifest.load(lake_dir, part_id)
        if m.state_chain:
            chains.append(m.state_chain)
    return chains


def committed_snapshot_chains(lake_dir: str) -> tuple[int, list[list[str]]]:
    """Barrier-consistent chain set: every partition's chain as of the
    GLOBAL epoch barrier. A partition whose manifest is ahead of the
    barrier (the in-flight commit window of the current round) serves its
    ``.prev`` manifest instead — manifests advance once per round, so one
    previous version always spans the gap. If the barrier advances twice
    underneath the scan (a very fast replay), the scan restarts against
    the fresh barrier (optimistic retry)."""
    for _ in range(8):
        k = EpochManifest.load(lake_dir).last_epoch
        chains: list[list[str]] = []
        ok = True
        for mp in sorted(glob.glob(os.path.join(lake_dir, "_manifests", "p*.json"))):
            part_id = int(re.search(r"p(\d+)\.json$", mp).group(1))
            m = PartitionManifest.load(lake_dir, part_id)
            if m.epoch > k:
                m = PartitionManifest.load_file(mp + ".prev", part_id)
                if m.epoch > k:
                    ok = False
                    break
            if m.state_chain:
                chains.append(m.state_chain)
        if ok:
            return k, chains
    raise RuntimeError(
        f"{lake_dir}: barrier kept advancing during the snapshot scan")


def read_committed(lake_dir: str) -> rd.Dataset:
    """The lake AS OF the last fully committed epoch barrier — the
    snapshot-isolated read for consumers running CONCURRENTLY with a
    replay: a half-committed round (some partitions at k+1, barrier at k)
    is never observable. Reference analog: the checkpoint is only
    advanced after every applier committed (CHANGES.txt:113-116) — this
    makes readers honor the same frontier. Caveat: `compact --gc` deletes
    superseded files a `.prev` chain may still reference; run gc with
    `keep_epochs >= 1` (the default CLI keep) when concurrent readers
    exist."""
    _, chains = committed_snapshot_chains(lake_dir)
    return _fold_chains_dataset(lake_dir, chains)


def final_table(lake_dir: str) -> rd.Dataset:
    """The converged lake table as a streaming Dataset (live rows only).

    Merge-on-read: one task per partition folds its state chain (base +
    per-epoch deltas → newest row per key; changed-cells lakes fold "last
    non-null cell after last delete" instead, per LakeMeta) and conforms
    it to the current registry schema — P parallel reads, no shuffle.
    Reads the LATEST per-partition commits (eventually consistent across
    partitions mid-round); use ``read_committed`` for the
    barrier-consistent view while a replay is running."""
    chains = committed_state_chains(lake_dir)
    return _fold_chains_dataset(lake_dir, chains)


def _fold_chains_dataset(lake_dir: str, chains: list[list[str]]) -> rd.Dataset:
    from rayrep.apply import fold_state_chain, fold_state_chain_cells
    from rayrep.registry import SchemaRegistry
    if not chains:
        return rd.from_arrow(
            pa.schema([pa.field("__seq", pa.int64()),
                       pa.field("__deleted", pa.bool_())]).empty_table()
        )
    target_json = SchemaRegistry(persist_dir=lake_dir).current_json()
    lm = LakeMeta.load(lake_dir)
    cells = bool(lm and lm.changed_cells)
    # Targeted erasure (rayrep/retention.py): reads anti-filter the
    # request list IMMEDIATELY — before any physical rewrite (`purge`)
    # runs. The set ships in the fold closure: erasure lists are
    # request-sized, not corpus-sized (ray.put it if one ever isn't).
    from rayrep.retention import _erase_filter, load_erased

    erased = load_erased(lake_dir)

    def fold(batch: pa.Table) -> pa.Table:
        target = SchemaVersion.from_json(target_json)
        fold_fn = fold_state_chain_cells if cells else fold_state_chain
        outs = []
        for files in batch.column("files").to_pylist():
            t = _erase_filter(fold_fn(lake_dir, files, target), erased)
            outs.append(
                t.filter(pc.invert(t["__deleted"])).drop_columns(["__seq", "__deleted"])
            )
        return pa.concat_tables(outs)

    return rd.from_items([{"files": c} for c in chains]).map_batches(
        fold, batch_size=1, batch_format="pyarrow"
    )


def final_table_pandas(lake_dir: str):
    """Small-scale convenience for tests: stable (conv_id, turn_idx) order."""
    import pandas as pd  # noqa: F401

    df = final_table(lake_dir).to_pandas()
    if df.empty:
        return df
    return df.sort_values(["conv_id", "turn_idx"], kind="stable").reset_index(drop=True)


# ------------------------------------------------------------- batch replay
def replay_batch(
    changelog_dir: str,
    num_partitions: int = 32,
    as_of_ts_us: int | None = None,
    concurrency: int | None = None,
    batch_size: int = 16384,
) -> rd.Dataset:
    """One-shot LWW convergence of a whole changelog without manifests — the
    compaction / time-travel read path (HBase-snapshotter analog,
    README.md:22-23: latest cell version ≤ T per row). Same operators (M2
    augment, J1 hash partition, A4 grouped LWW), different predicate.
    """
    # a trimmed log cannot converge from scratch: events in the trimmed
    # epochs may be LWW winners (at any as-of point) — refuse loudly
    require_full_history(changelog_dir, "batch replay / point-in-time read")
    if as_of_ts_us is not None:
        # a COMPACTED log still batch-replays to the exact final state,
        # but intermediate versions below a span's ts horizon are gone —
        # an as-of read there would fabricate a state that never existed
        from rayrep.logcompact import compaction_horizon

        h = compaction_horizon(changelog_dir)
        if h and as_of_ts_us < h:
            raise CompactedLogError(
                f"point-in-time read at ts={as_of_ts_us} is below the "
                f"compaction horizon {h} of {changelog_dir} — intermediate "
                "versions were compacted away (rayrep/logcompact.py); "
                "snapshot from a lake barrier or keep an archived log")
    epochs = discover_epochs(changelog_dir)
    registry = SchemaRegistry()
    for _, path in epochs:
        registry.apply_ddl_events(extract_ddl_events(path, max_ts_us=as_of_ts_us))
    target_json = registry.current_json()
    target = SchemaVersion.from_json(target_json)
    payload_cols = [f.name for f in target.schema]

    # Per-epoch files may have physically different schemas (pre-DDL files
    # lack evolved columns) → read each file separately, normalize in the
    # augmenter, then union. At scale each read is itself parallel over
    # row groups; union keeps streaming.
    parts = []
    for _, path in epochs:
        ds = rd.read_parquet(path)
        # one-shot over the whole log: batches span every schema version,
        # so stepwise evolution always gets the full history
        ds = _augment(ds, target_json, num_partitions, "", batch_size,
                      concurrency, history_json=registry.history_json())
        parts.append(ds)
    ds = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]

    if as_of_ts_us is not None:
        bound = pa.scalar(as_of_ts_us, pa.timestamp("us"))
        ds = ds.map_batches(
            lambda t, b=bound: t.filter(pc.less_equal(t["ts"], b)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    # pure LWW needs only per-batch winners through the shuffle (no
    # counters here), so the combiner's payload rows alone suffice
    from rayrep.combine import COMBINE_META, combine_batch

    ds = ds.map_batches(
        combine_batch, batch_format="pyarrow", zero_copy_batch=True
    )

    def reduce_group(group: pa.Table) -> pa.Table:
        group = group.drop_columns([c for c in COMBINE_META if c in group.column_names])
        state_rows = events_as_state(group, payload_cols)
        out = lww_last_rows(state_rows)
        out = out.filter(pc.invert(out["__deleted"]))
        return out.drop_columns(["__seq", "__deleted"])

    return ds.groupby("part_id").map_groups(reduce_group, batch_format="pyarrow")
