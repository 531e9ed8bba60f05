"""CLI entrypoint (ray-job style; mirrors the reference's flags:
--dryrun CHANGES.txt:43, --initial-snapshot CHANGES.txt:139,
--end-binlog-file CHANGES.txt:129, --delta on/off CHANGES.txt:118).

Owns the Ray session (library code never inits Ray).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="rayrep")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate a deterministic synthetic changelog")
    g.add_argument("out_dir")
    g.add_argument("--events", type=int, default=100_000)
    g.add_argument("--conversations", type=int, default=2000)
    g.add_argument("--epochs", type=int, default=4)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--zipf", type=float, default=0.0)

    r = sub.add_parser("replay", help="replay a changelog into a lake (resumable)")
    r.add_argument("changelog_dir")
    r.add_argument("lake_dir")
    r.add_argument("--partitions", type=int, default=32)
    r.add_argument("--appliers", type=int, default=8)
    r.add_argument("--end-epoch", type=int, default=None,
                   help="stop after this epoch (--end-binlog-file analog)")
    r.add_argument("--dry-run", action="store_true")
    r.add_argument("--no-delta", action="store_true")
    r.add_argument("--chaos", type=float, default=0.0)
    r.add_argument("--salt-turns", action="store_true",
                   help="route by (conv_id, turn_idx) to spread hot conversations")
    r.add_argument("--dead-letter", action="store_true",
                   help="divert malformed events to LAKE/dlq/e{epoch}/ "
                        "instead of refusing the epoch (poison-message "
                        "quarantine; implies event validation)")
    r.add_argument("--dedup-ingest", action="store_true",
                   help="drop INSERTs whose content was already ingested "
                        "(first-writer-wins per content; pinned in LakeMeta)")
    r.add_argument("--dedup-content-col", default="text")
    r.add_argument("--pack", choices=["auto", "on", "off"], default="auto",
                   help="packed exchange: compress the shuffle into per-"
                        "destination LZ4 IPC blobs (auto = on when the "
                        "cluster has >1 node; force 'on' for bus-bound "
                        "single boxes, 32.6 vs 72.4 B/event)")
    r.add_argument("--lease", action="store_true",
                   help="acquire the single-writer lease before committing "
                        "(fails if another writer is live; HA fencing)")
    r.add_argument("--lease-takeover", action="store_true",
                   help="with --lease: fence out the previous writer "
                        "immediately (elected-successor failover)")
    r.add_argument("--lease-ttl", type=float, default=60.0)
    r.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    le = sub.add_parser("lease", help="writer-lease operations (HA single-writer)")
    le.add_argument("op", choices=["status", "break"])
    le.add_argument("lake_dir")

    w = sub.add_parser("tail", help="continuous tail: apply epochs as they are published")
    w.add_argument("changelog_dir")
    w.add_argument("lake_dir")
    w.add_argument("--partitions", type=int, default=32)
    w.add_argument("--poll", type=float, default=2.0)
    w.add_argument("--idle-timeout", type=float, default=30.0,
                   help="stop after this many idle seconds (0 = run forever)")
    w.add_argument("--lease", action="store_true",
                   help="hold the single-writer lease for the whole tail "
                        "session (renewed on every poll)")
    w.add_argument("--lease-takeover", action="store_true")
    w.add_argument("--lease-ttl", type=float, default=60.0)
    w.add_argument("--compact-log-every", type=int, default=None,
                   help="Kafka-style-compact the changelog whenever this "
                        "many committed plain epochs sit below the barrier")
    w.add_argument("--compact-lake-every", type=int, default=None,
                   help="major-compact the lake's state chains every N "
                        "newly applied epochs")
    w.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    t = sub.add_parser("snapshot", help="point-in-time export (snapshotter analog)")
    t.add_argument("changelog_dir")
    t.add_argument("out_dir")
    t.add_argument("--ts-us", type=int, required=True)
    t.add_argument("--partitions", type=int, default=32)
    t.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    b = sub.add_parser("bootstrap", help="base table -> op='I' snapshot prefix")
    b.add_argument("base_parquet")
    b.add_argument("changelog_dir")
    b.add_argument("--num-cpus", type=int, default=8)

    bl = sub.add_parser("bulk-load",
                        help="base table -> partition state files DIRECTLY "
                             "(HBase bulkload analog; skips the changelog "
                             "round-trip). Fresh lakes only; tail epochs "
                             "(>=1, seq >= printed next_seq) resume via "
                             "`replay`.")
    bl.add_argument("base_parquet")
    bl.add_argument("lake_dir")
    bl.add_argument("--partitions", type=int, default=32)
    bl.add_argument("--salt-turn-keys", action="store_true")
    bl.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    k = sub.add_parser("replica",
                       help="rebuild the latest-image table from a lake's "
                            "daily-delta stream (Kafka-consumer analog)")
    k.add_argument("delta_dir")
    k.add_argument("out_dir")
    k.add_argument("--partitions", type=int, default=32)
    k.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    c = sub.add_parser("compact", help="major-compact state chains + GC old files")
    c.add_argument("lake_dir")
    c.add_argument("--keep-epochs", type=int, default=0,
                   help="retain superseded files newer than committed-N (forensics; use `snapshot` for point-in-time)")
    c.add_argument("--no-sort-keys", action="store_true",
                   help="skip the (conv_id, turn_idx) ordering that makes "
                        "point lookups row-group-prunable")

    gt = sub.add_parser("get",
                        help="point lookup: fetch keys' live rows by "
                             "probing only their routed partitions "
                             "(HBase key-addressed read analog)")
    gt.add_argument("lake_dir")
    gt.add_argument("--key", action="append", required=True,
                    help="conv_id, or conv_id:turn_idx (repeatable; "
                         "salted lakes need the pair form)")

    rp = sub.add_parser("repartition",
                        help="rescale a committed lake to a new partition "
                             "count (offline, between replays; src is "
                             "read-only, dst is a fresh lake)")
    rp.add_argument("src_lake")
    rp.add_argument("dst_lake")
    rp.add_argument("--partitions", type=int, required=True)
    rp.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    ck = sub.add_parser("check",
                        help="lake fsck: audit manifest/chain/routing "
                             "invariants without mutating anything")
    ck.add_argument("lake_dir")
    ck.add_argument("--deep", action="store_true",
                    help="fold every chain and verify row-level "
                         "invariants (live_rows, routing, key "
                         "uniqueness, watermark)")
    ck.add_argument("--distributed", action="store_true",
                    help="one Ray task per partition (with --deep)")

    cg = sub.add_parser("check-log",
                        help="changelog integrity audit: dense seq, "
                             "contiguous epochs, op/key hygiene "
                             "(source-side validator analog)")
    cg.add_argument("changelog_dir")
    cg.add_argument("--start-epoch", type=int, default=None,
                    help="first expected epoch (default: the log's trim floor)")

    cn = sub.add_parser("clone",
                        help="barrier-consistent lake clone (DR/backup: "
                             "hardlinked immutable files + as-of-barrier "
                             "manifests; resumable and independent)")
    cn.add_argument("src_lake")
    cn.add_argument("dst_lake")
    cn.add_argument("--copy", action="store_true",
                    help="copy bytes instead of hardlinking "
                         "(cross-filesystem targets)")
    cn.add_argument("--no-delta", action="store_true",
                    help="skip the daily-delta stream")

    ij = sub.add_parser("ingest-json",
                        help="ingest Debezium-style JSONL envelope files "
                             "(one per producer flush) into engine epochs")
    ij.add_argument("src_dir")
    ij.add_argument("changelog_dir")
    ij.add_argument("--start-epoch", type=int, default=0)
    ij.add_argument("--start-seq", type=int, default=0)
    ij.add_argument("--start-schema-ver", type=int, default=1)
    ij.add_argument("--files-per-epoch", type=int, default=1)
    ij.add_argument("--follow", action="store_true",
                    help="keep following the directory: ingest each newly "
                         "flushed file as it appears (crash-safe resume "
                         "via per-epoch source markers)")
    ij.add_argument("--poll", type=float, default=1.0,
                    help="with --follow: poll interval seconds")
    ij.add_argument("--idle-timeout", type=float, default=10.0,
                    help="with --follow: stop after this many seconds "
                         "with no new files (negative = run forever)")
    ij.add_argument("--max-files", type=int, default=None,
                    help="with --follow: stop after N files")

    ej = sub.add_parser("export-json",
                        help="export an engine changelog as Debezium-style "
                             "JSONL envelopes (egress/interchange)")
    ej.add_argument("changelog_dir")
    ej.add_argument("out_dir")

    tl = sub.add_parser("trim-log",
                        help="drop/archive changelog epochs the lake has "
                             "committed past (binlog expiry analog)")
    tl.add_argument("changelog_dir")
    tl.add_argument("lake_dir")
    tl.add_argument("--keep-from-epoch", type=int, required=True)
    tl.add_argument("--archive-dir", default=None)
    ck.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    lc = sub.add_parser("compact-log",
                        help="Kafka-style log compaction: collapse epochs "
                             "[first, through] to latest-event-per-key "
                             "(+tombstones +DDLs); the result still "
                             "replays from scratch, unlike trim-log")
    lc.add_argument("changelog_dir")
    lc.add_argument("--through-epoch", type=int, default=None,
                    help="default: last-but-one (the active tail epoch is "
                         "never compacted)")
    lc.add_argument("--lake", default=None, dest="lake_dir",
                    help="optional: require this lake's barrier at/past "
                         "the span (live-tailer safety)")
    lc.add_argument("--mode", choices=["row", "cells"], default="row",
                    help="cells = per-cell retention for changed-cells "
                         "logs (CHANGES.txt:173)")
    lc.add_argument("--drop-malformed", action="store_true",
                    help="drop null-key events from the span (counted in "
                         "_span.json) instead of refusing — use when the "
                         "consuming lake runs dead-letter quarantine")
    lc.add_argument("--tasks", type=int, default=None)
    lc.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    iu = sub.add_parser("index-update",
                        help="refresh a secondary index (value -> key) "
                             "from the lake's delta stream")
    iu.add_argument("delta_dir")
    iu.add_argument("index_dir")
    iu.add_argument("--column", required=True)
    iu.add_argument("--partitions", type=int, default=16,
                    help="index partition count Q (pins on first refresh)")
    iu.add_argument("--up-to-epoch", type=int, default=None)
    iu.add_argument("--lake", default=None, dest="lake_dir")
    iu.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    ir = sub.add_parser("index-rebuild",
                        help="bootstrap/disaster-rebuild a secondary "
                             "index by a full scan of the committed lake "
                             "(the bulk-loaded-lake path: no deltas)")
    ir.add_argument("lake_dir")
    ir.add_argument("index_dir")
    ir.add_argument("--column", required=True)
    ir.add_argument("--partitions", type=int, default=16)
    ir.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    il = sub.add_parser("index-get",
                        help="probe a secondary index for one or more "
                             "values (reads only their q partitions)")
    il.add_argument("index_dir")
    il.add_argument("--value", action="append", required=True,
                    dest="values", help="indexed value (repeatable)")
    il.add_argument("--lake", default=None, dest="lake_dir",
                    help="honor this lake's GDPR erasure list")

    rb = sub.add_parser("rebind",
                        help="source failover: translate the lake's "
                             "checkpoint onto a REPLACEMENT changelog "
                             "serving the same stream under different "
                             "epoch boundaries (pGTID translation, "
                             "CHANGES.txt:17-19); then resume replay/"
                             "tail against the new log")
    rb.add_argument("lake_dir")
    rb.add_argument("new_changelog_dir")

    mt = sub.add_parser("metrics",
                        help="read or follow the lake's continuous metrics "
                             "stream (_manifests/metrics.jsonl: one line "
                             "per epoch barrier + maintenance events)")
    mt.add_argument("lake_dir")
    mt.add_argument("--follow", action="store_true",
                    help="tail -f the live stream (a running tail session)")
    mt.add_argument("--idle-timeout", type=float, default=None,
                    help="with --follow: stop after this many idle seconds")
    mt.add_argument("--last", type=int, default=0,
                    help="print only the last N records")
    mt.add_argument("--kind", default="",
                    help="filter by record kind (epoch, log_compaction, ...)")
    mt.add_argument("--rotated", action="store_true",
                    help="include the rotated previous window")

    dq = sub.add_parser("dlq-requeue",
                        help="republish repaired dead-letter rows as a "
                             "proper epoch appended to the changelog "
                             "(rows must be fixed on disk first; takes "
                             "the writer lease — quiesce the producer, "
                             "single-writer only)")
    dq.add_argument("lake_dir")
    dq.add_argument("changelog_dir")

    er = sub.add_parser("erase",
                        help="targeted erasure (GDPR): reads hide the "
                             "keys at once; `purge` makes it physical")
    er.add_argument("lake_dir")
    er.add_argument("--key", action="append", required=True, dest="keys",
                    help="conv_id to erase (repeatable)")

    pu = sub.add_parser("purge",
                        help="physical retention pass: rewrite chains "
                             "without erased keys / expired rows")
    pu.add_argument("lake_dir")
    pu.add_argument("--before-ts-us", type=int, default=None,
                    help="drop rows (incl. tombstones) with ts below this "
                         "epoch-microsecond cutoff (HBase TTL analog)")
    for mp in (c, pu):
        mp.add_argument("--distributed", action="store_true",
                        help="one Ray task per partition (large lakes)")
        mp.add_argument("--num-cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    ci = sub.add_parser("compact-index",
                        help="fold the dedup-ingest content index's delta "
                             "chains (one base file per bucket)")
    ci.add_argument("lake_dir")

    rd_ = sub.add_parser("read",
                         help="export the lake table to parquet "
                              "(--committed = barrier-consistent snapshot "
                              "safe under a concurrent replay)")
    rd_.add_argument("lake_dir")
    rd_.add_argument("out_dir")
    rd_.add_argument("--committed", action="store_true")
    rd_.add_argument("--num-cpus", type=int,
                     default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    rb = sub.add_parser("rollback",
                        help="rewind a lake IN PLACE to an earlier epoch "
                             "barrier (O(files) metadata: restore per-"
                             "partition history entries, drop the chain "
                             "suffix). Refuses when compaction/purge/gc "
                             "moved the horizon past the target.")
    rb.add_argument("lake_dir")
    rb.add_argument("--to-epoch", type=int, required=True)
    rb.add_argument("--distributed", action="store_true")
    rb.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    rf = sub.add_parser("repair",
                        help="rebuild damaged partitions from the "
                             "changelog (targeted: only their rows are "
                             "shuffled/applied; barrier never moves)")
    rf.add_argument("changelog_dir")
    rf.add_argument("lake_dir")
    rf.add_argument("--parts", required=True,
                    help="comma-separated partition ids to rebuild")
    rf.add_argument("--partitions", type=int, default=32,
                    help="the lake's pinned partition count")
    rf.add_argument("--appliers", type=int, default=8)
    rf.add_argument("--no-delta", action="store_true")
    rf.add_argument("--salt-turns", action="store_true")
    rf.add_argument("--num-cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))

    args = p.parse_args(argv)

    def _maybe_ray():
        # filesystem maintenance is Ray-free unless fanned out per
        # partition with --distributed
        if getattr(args, "distributed", False):
            import ray

            if not ray.is_initialized():
                ray.init(address="local", num_cpus=args.num_cpus,
                         include_dashboard=False, logging_level="ERROR")

    if args.cmd == "compact":
        from rayrep.compact import compact_lake, gc_lake

        _maybe_ray()
        res = {"compact": compact_lake(args.lake_dir,
                                       distributed=args.distributed,
                                       sort_keys=not args.no_sort_keys),
               "gc": gc_lake(args.lake_dir, keep_epochs=args.keep_epochs)}
        print(json.dumps(res))
        return 0

    if args.cmd == "check":
        from rayrep.check import check_lake

        _maybe_ray()
        res = check_lake(args.lake_dir, deep=args.deep,
                         distributed=args.distributed)
        print(json.dumps(res))
        return 0 if res["ok"] else 3

    if args.cmd == "check-log":
        from rayrep.checklog import check_changelog

        _maybe_ray()
        res = check_changelog(args.changelog_dir,
                              expect_start_epoch=args.start_epoch)
        print(json.dumps(res))
        return 0 if res["ok"] else 3

    if args.cmd == "get":
        from rayrep.lookup import lookup

        keys: list = []
        for k in args.key:
            if ":" in k:
                c, t = k.rsplit(":", 1)
                keys.append((c, int(t)))
            else:
                keys.append(k)
        out = lookup(args.lake_dir, keys)
        print(json.dumps({"n": out.num_rows, "rows": out.to_pylist()},
                         default=str))
        return 0

    if args.cmd == "clone":
        from rayrep.clone import clone_lake

        print(json.dumps(clone_lake(
            args.src_lake, args.dst_lake,
            mode="copy" if args.copy else "hardlink",
            include_delta=not args.no_delta)))
        return 0

    if args.cmd == "ingest-json":
        if args.follow:
            from rayrep.ingest import ingest_cdc_json_tail

            print(json.dumps(ingest_cdc_json_tail(
                args.src_dir, args.changelog_dir,
                poll_interval_s=args.poll,
                idle_timeout_s=(None if args.idle_timeout is not None
                                and args.idle_timeout < 0
                                else args.idle_timeout),
                max_files=args.max_files)))
            return 0
        from rayrep.ingest import ingest_cdc_json

        print(json.dumps(ingest_cdc_json(
            args.src_dir, args.changelog_dir, start_epoch=args.start_epoch,
            start_seq=args.start_seq, start_schema_ver=args.start_schema_ver,
            files_per_epoch=args.files_per_epoch)))
        return 0

    if args.cmd == "export-json":
        from rayrep.ingest import export_envelopes

        print(json.dumps(export_envelopes(args.changelog_dir, args.out_dir)))
        return 0

    if args.cmd == "trim-log":
        from rayrep.retention import trim_changelog

        print(json.dumps(trim_changelog(args.changelog_dir, args.lake_dir,
                                        args.keep_from_epoch,
                                        archive_dir=args.archive_dir)))
        return 0

    if args.cmd == "compact-log":
        import ray

        from rayrep.logcompact import compact_changelog

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        print(json.dumps(compact_changelog(
            args.changelog_dir, through_epoch=args.through_epoch,
            lake_dir=args.lake_dir, mode=args.mode, num_tasks=args.tasks,
            drop_malformed=args.drop_malformed)))
        return 0

    if args.cmd == "index-update":
        import ray

        from rayrep.secindex import update_index

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        print(json.dumps(update_index(
            args.delta_dir, args.index_dir, column=args.column,
            num_index_partitions=args.partitions,
            up_to_epoch=args.up_to_epoch, lake_dir=args.lake_dir)))
        return 0

    if args.cmd == "index-rebuild":
        import ray

        from rayrep.secindex import rebuild_index

        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.num_cpus,
                     include_dashboard=False, logging_level="ERROR")
        print(json.dumps(rebuild_index(
            args.lake_dir, args.index_dir, column=args.column,
            num_index_partitions=args.partitions)))
        return 0

    if args.cmd == "index-get":
        from rayrep.secindex import index_lookup

        t = index_lookup(args.index_dir, args.values,
                         lake_dir=args.lake_dir)
        print(json.dumps({"entries": t.num_rows,
                          "rows": t.to_pylist()[:1000]}, default=str))
        return 0

    if args.cmd == "dlq-requeue":
        from rayrep.sinks import requeue_dlq

        print(json.dumps(requeue_dlq(args.lake_dir, args.changelog_dir)))
        return 0

    if args.cmd == "erase":
        from rayrep.retention import erase_keys

        print(json.dumps(erase_keys(args.lake_dir, args.keys)))
        return 0

    if args.cmd == "purge":
        from rayrep.retention import purge_lake

        _maybe_ray()
        print(json.dumps(purge_lake(args.lake_dir, args.before_ts_us,
                                    distributed=args.distributed)))
        return 0

    if args.cmd == "compact-index":
        from rayrep.ingest_dedup import compact_content_index, cumulative_deduped

        res = {"files_removed": compact_content_index(args.lake_dir),
               "deduped_total": cumulative_deduped(args.lake_dir)}
        print(json.dumps(res))
        return 0

    if args.cmd == "rebind":
        from rayrep.failover import rebind_source

        print(json.dumps(rebind_source(args.lake_dir,
                                       args.new_changelog_dir)))
        return 0

    if args.cmd == "metrics":
        from rayrep import metrics as metrics_mod

        if args.follow:
            for rec in metrics_mod.follow(
                    args.lake_dir, idle_timeout_s=args.idle_timeout):
                print(json.dumps(rec, sort_keys=True))
        else:
            recs = metrics_mod.read_stream(
                args.lake_dir, kind=args.kind or None,
                include_rotated=args.rotated)
            if args.last:
                recs = recs[-args.last:]
            for rec in recs:
                print(json.dumps(rec, sort_keys=True))
        return 0

    if args.cmd == "lease":
        from rayrep import lease as lease_mod

        if args.op == "status":
            print(json.dumps(lease_mod.status(args.lake_dir)))
        else:
            print(json.dumps({"broken": lease_mod.break_lease(args.lake_dir)}))
        return 0

    if args.cmd == "gen":
        from rayrep.gen import GenSpec, write_changelog

        m = write_changelog(
            args.out_dir,
            GenSpec(
                seed=args.seed,
                n_events=args.events,
                n_conversations=args.conversations,
                n_epochs=args.epochs,
                zipf_a=args.zipf,
            ),
        )
        print(json.dumps({"n_events": m["n_events"], "ddl_seq": m["ddl_seq"]}))
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "replay":
            from rayrep.config import EngineConfig
            from rayrep.pipeline import replay

            cfg = EngineConfig(
                changelog_dir=args.changelog_dir,
                lake_dir=args.lake_dir,
                num_partitions=args.partitions,
                applier_concurrency=args.appliers,
                dry_run=args.dry_run,
                delta_output=not args.no_delta,
                chaos_fraction=args.chaos,
                dead_letter=args.dead_letter,
                salt_turn_keys=args.salt_turns,
                dedup_ingest=args.dedup_ingest,
                dedup_content_col=args.dedup_content_col,
                pack_exchange={"auto": "auto", "on": True, "off": False}[args.pack],
                writer_lease=args.lease,
                lease_takeover=args.lease_takeover,
                lease_ttl_s=args.lease_ttl,
            )
            res = replay(cfg, end_epoch=args.end_epoch)
            print(json.dumps(res))
        elif args.cmd == "read":
            from rayrep.pipeline import final_table, read_committed

            ds = (read_committed if args.committed else final_table)(
                args.lake_dir)
            ds.write_parquet(args.out_dir)
            print(json.dumps({"out_dir": args.out_dir,
                              "committed": args.committed}))
        elif args.cmd == "rollback":
            from rayrep.rollback import rollback_lake

            print(json.dumps(rollback_lake(
                args.lake_dir, args.to_epoch, distributed=args.distributed)))
        elif args.cmd == "repair":
            from rayrep.config import EngineConfig
            from rayrep.repair import repair_partitions

            cfg = EngineConfig(
                changelog_dir=args.changelog_dir,
                lake_dir=args.lake_dir,
                num_partitions=args.partitions,
                applier_concurrency=args.appliers,
                delta_output=not args.no_delta,
                salt_turn_keys=args.salt_turns,
            )
            res = repair_partitions(
                cfg, [int(x) for x in args.parts.split(",") if x != ""])
            print(json.dumps(res))
        elif args.cmd == "repartition":
            from rayrep.repart import repartition_lake

            res = repartition_lake(args.src_lake, args.dst_lake,
                                   args.partitions)
            print(json.dumps(res))
        elif args.cmd == "tail":
            from rayrep.config import EngineConfig
            from rayrep.pipeline import tail

            cfg = EngineConfig(
                changelog_dir=args.changelog_dir,
                lake_dir=args.lake_dir,
                num_partitions=args.partitions,
                writer_lease=args.lease,
                lease_takeover=args.lease_takeover,
                lease_ttl_s=args.lease_ttl,
            )
            res = tail(cfg, poll_interval_s=args.poll,
                       idle_timeout_s=args.idle_timeout or None,
                       compact_log_every=args.compact_log_every,
                       compact_lake_every=args.compact_lake_every)
            print(json.dumps(res))
        elif args.cmd == "snapshot":
            from rayrep.timetravel import snapshot_to_parquet

            snapshot_to_parquet(
                args.changelog_dir, args.ts_us, args.out_dir,
                num_partitions=args.partitions,
            )
            print(json.dumps({"out_dir": args.out_dir}))
        elif args.cmd == "replica":
            from rayrep.sinks import replica_from_deltas

            ds = replica_from_deltas(args.delta_dir,
                                     num_partitions=args.partitions)
            ds.write_parquet(args.out_dir)
            print(json.dumps({"out_dir": args.out_dir}))
        elif args.cmd == "bootstrap":
            import ray.data as rd

            from rayrep.bootstrap import bootstrap_snapshot

            m = bootstrap_snapshot(rd.read_parquet(args.base_parquet), args.changelog_dir)
            print(json.dumps(m))
        elif args.cmd == "bulk-load":
            import ray.data as rd

            from rayrep.bulkload import bulk_load
            from rayrep.config import EngineConfig

            m = bulk_load(
                EngineConfig(changelog_dir="", lake_dir=args.lake_dir,
                             num_partitions=args.partitions,
                             salt_turn_keys=args.salt_turn_keys),
                rd.read_parquet(args.base_parquet),
            )
            print(json.dumps(m))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
