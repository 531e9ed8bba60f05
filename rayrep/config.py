"""Engine configuration.

The reference is driven by one YAML config (hosts, namespaces, delta-table
list, table-filter regex, pGTID prefix — CHANGES.txt:86,50-54,111,41-42,12).
Ours is one dataclass, YAML/JSON-loadable, passed to the pipeline driver.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field


@dataclass
class EngineConfig:
    # Layout
    changelog_dir: str = ""          # input: epoch-{e:05d}.parquet files
    lake_dir: str = ""               # output lake root (partition state + _manifests)
    # Partitioning (reference analog: md5-salt row-key spreading, CHANGES.txt:102-104)
    num_partitions: int = 32
    # Hot-key salting: route by hash(conv_id) ^ mix(turn_idx) instead of
    # hash(conv_id), spreading a zipf-hot conversation's turns across
    # partitions. Correctness-neutral (every engine contract is per
    # (conv_id, turn_idx)); pinned in LakeMeta because routing must stay
    # stable for the life of a lake.
    salt_turn_keys: bool = False
    # Fail-fast gate for malformed data events (null conv_id / turn_idx /
    # ts / seq): such rows can neither be routed nor LWW-resolved, so with
    # validation on the augmenter refuses the epoch with a counted, named
    # error (fail-fast + supervisor restart, the reference's model) rather
    # than let undefined grouping corrupt a partition. Off by default:
    # trusted changelogs skip the extra null-scan.
    validate_events: bool = False
    # Dead-letter quarantine (the poison-message answer every production
    # CDC consumer grows; reference model is fail-fast + restart, which
    # HALTS replication on one bad producer row): with dead_letter=True a
    # malformed data event (null routing key / ts / seq) is DIVERTED to
    # ``lake_dir/dlq/e{epoch}/`` — original bytes, pre-evolution, for
    # forensics/repair — and the epoch replays on. Implies the
    # validate_events null-scan. Exactly-once: a (re)played epoch's dlq
    # dir is cleared before augmenting (only uncommitted epochs ever
    # re-run), so the quarantine matches the committed barrier exactly.
    dead_letter: bool = False
    # Actor pool sizing for the applier stage (reference: HBase applier task
    # pool, CHANGES.txt:137) and the augmenter (CHANGES.txt:97-98).
    # The applier pool autoscales (1, N) so the groupby shuffle's tasks are
    # never starved of CPUs by idle pool reservations; the augmenter runs as
    # stateless tasks by default (its per-actor state is a parsed schema —
    # microseconds to rebuild), set a value to force an actor pool.
    applier_concurrency: int = 8
    # "tasks": applier runs as stateless Ray tasks (process-cached instance);
    # state is durable in Parquet + manifests, so tasks are exactly as safe
    # as actors and reuse warm worker processes across epochs (no per-epoch
    # actor-pool spin-up — measured ~2x on replay). "actors": explicit
    # autoscaling actor pool, useful when in-heap state caching across
    # batches matters more than pool startup.
    applier_mode: str = "tasks"
    # Ray Data target block size (MiB) during replay, applied around the
    # run and restored after. 256 beat the 128 default at EVERY machine
    # state in interleaved A/Bs on the 20M-event bench (15.0 vs 16.8 s
    # clean, 24.5 vs 64.4 s degraded): halving the object count through
    # the sort exchange cuts per-object scheduling/IPC overhead, which is
    # what the degraded-VM states amplify. 64 MiB measured WORSE than the
    # default. None leaves the session's DataContext untouched.
    target_block_mb: int | None = 256
    # Floor on blocks-per-read (Ray's read_op_min_num_blocks). Ray's
    # default 200 shreds epoch files into ~2 MB blocks at bench scale and
    # the per-block scheduling overhead dominates the exchange (measured:
    # "auto" = cluster CPU count cut the 32-cpu headline 8.1 -> 6.6 s and
    # the 8-cpu one 21.7 -> 14.6 s). At 100 TB reads produce abundant
    # blocks naturally and the floor never binds. int to pin, "auto" to
    # track the cluster's core count, None to keep Ray's default.
    read_min_blocks: int | str | None = "auto"
    # "groupby": Ray-native sort-shuffle groupby (default). "staged":
    # filesystem-staged exchange (rayrep/exchange.py) — map-side shuffle
    # files through the lake's shared storage; measured to scale better on
    # bandwidth-bound hosts because both stages are pure parallel maps.
    exchange: str = "groupby"
    augmenter_concurrency: int | None = None
    # Map-side LWW pre-combining (rayrep/combine.py): collapse each batch
    # to per-key winner payloads + compact per-event meta before the
    # shuffle — fewer rows/bytes through the sort exchange, identical
    # final state AND counters. Auto-disabled per round when the round
    # overlaps a committed watermark (resume of a partial epoch), in
    # changed-cells mode, in dry-run, and for the staged exchange.
    map_combine: bool = True
    # Second-level combine: re-combine already-combined rows across source
    # batches before the shuffle (rayrep/combine.combine_combined). Under
    # zipf skew a hot key's per-batch winners duplicate across every batch;
    # this collapses them once more at map side. Exact (meta lists are
    # re-grouped, never dropped). Only active when map_combine is.
    # Default OFF: measured on the 20M-event bench changelog (avg ~2
    # events/key), cross-batch duplicates are too rare to pay for the
    # extra pass (~1 s cost, no byte win) — enable for streams whose hot
    # keys recur across many batches within a round.
    map_combine2: bool = False
    # Packed exchange (rayrep/exchange.pack_batch): before the groupby sort
    # shuffle, pack each map batch into ONE compressed Arrow-IPC blob per
    # destination partition, so the exchange sorts/moves ~P rows per batch
    # instead of every event row, and text bytes cross the (single-box
    # bottleneck) memory bus compressed. The applier unpacks transparently.
    # Exact same rows delivered per partition — the blob boundary is
    # invisible to LWW/counters. Only applies to exchange="groupby".
    # "auto" (default): pack exactly when the exchange crosses node
    # boundaries (ray.nodes() reports >1 alive node) — the regime whose
    # bytes traverse a real NIC is where compressing the exchange pays
    # unconditionally, while on one box plain groupby avoids the pack/
    # unpack ALU cost. Single-box exception, measured 2026-08-18: when
    # the box's memory bus saturates at high parallelism (busprobe data
    # aggregate FALLING 8->32 procs) packing wins there too (1.30M vs
    # ~0.38-0.45M ev/s at 32 cpus) — force pack_exchange=True for that
    # regime; "auto" stays conservative because the bus state is not
    # cheaply observable at config time.
    pack_exchange: bool | str = "auto"
    pack_codec: str = "lz4"          # lz4 (fast) | zstd (smaller) | none (blob-pack only)
    # Carry the source transaction id through the shuffle into state/delta
    # outputs. Off by default: txn lineage is recoverable from the
    # changelog itself (seq is dense and the manifests record per-epoch seq
    # ranges), and the column is dead weight through the sort exchange
    # (~8 B/row). The reference's txn boundary handling (uuidBuffer,
    # CHANGES.txt:168-170) maps to our epoch/manifest atomicity either way.
    txn_lineage: bool = False
    # Large batches keep block counts low through the sort shuffle (fewer
    # blocks to merge in the reduce); at ~90 B/row of text this is ~12 MB
    # per batch — well inside worker heap even × concurrency.
    batch_size: int = 131072
    # Ops / semantics
    # Daily-delta side output (CHANGES.txt:123, --delta CHANGES.txt:118):
    # the NET applied image per (key, utc-day) per epoch — one contract in
    # both the combined and per-event paths.
    delta_output: bool = True
    delta_tables: list[str] = field(default_factory=lambda: ["transcripts"])
    table_filter_regex: str = ""     # applier table filter (CHANGES.txt:41-42); "" = all
    changed_cells_updates: bool = False  # U rows may carry nulls = "unchanged" (CHANGES.txt:173)
    # With changed_cells_updates: resolve conflicts per (key, COLUMN) by
    # version (ts, seq) — HBase parity (README.md:18) — instead of the
    # default row-level rule that rejects a ts-inverted partial update
    # wholesale. Per-cell lakes fold by version order at read time.
    per_cell_conflicts: bool = False
    # Durability: rename-atomic commits alone make the sink exactly-once
    # under process/VM crashes (the tested chaos/resume model). True adds
    # fsync of state/delta data before each manifest commit, extending the
    # guarantee to POWER loss — measured ~40% replay cost on this sandbox's
    # disk (Spark/Flink file sinks make the same off-by-default trade).
    durable_sync: bool = False
    # Fault injection (reference Chaos Monkey: 1% task failures, CHANGES.txt:126)
    chaos_fraction: float = 0.0
    chaos_seed: int = 1234
    # State layout: each epoch writes a per-partition DELTA file (only the
    # keys that changed — epoch I/O ∝ delta size, not lake size); the chain
    # is folded into one full snapshot when it would exceed this many
    # files (merge-on-read in between; the HBase-LSM analog, README.md:18).
    # 1 = rewrite the full state every epoch (the round-1 behavior).
    state_snapshot_interval: int = 4
    # Epochs applied per pipeline execution (one read→augment→shuffle→apply
    # round). >1 amortizes the per-execution fixed cost (sort barrier,
    # driver orchestration) over more data; commit/resume granularity
    # becomes the round boundary. 1 = the reference-faithful per-epoch
    # checkpoint cadence (default; bench raises it).
    epochs_per_round: int = 1
    # Dedup-on-ingest (rayrep/ingest_dedup.py): drop INSERT events whose
    # content column's value was already claimed by a smaller-seq event —
    # first-writer-wins at CONTENT level (the LLM-corpus ingest policy),
    # via one extra content-bucket exchange per round and a lake-side
    # (ckey, seq) claim index. U/D/null-content rows pass through. Pinned
    # in LakeMeta: flipping it mid-lake would silently change which rows
    # exist. In dry_run the stage previews (within-round dedup only, no
    # claims persisted).
    dedup_ingest: bool = False
    dedup_content_col: str = "text"
    # Single-writer lease + fencing (rayrep/lease.py) — the reference's
    # ZooKeeper leader-election/HA contract (README.md:17-20,
    # CHANGES.txt:74,82) re-expressed on the lake's shared filesystem.
    # Off by default: single-writer deployments (every test/bench here)
    # need no coordination. When on, replay acquires before the first
    # round, renews at every round barrier, and releases on clean return;
    # a crashed writer's lease expires after lease_ttl_s, and a successor
    # started with lease_takeover=True fences the old writer immediately
    # (it fails at its next barrier check, and its manifest overwrites
    # are refused by token order).
    writer_lease: bool = False
    lease_ttl_s: float = 60.0
    lease_takeover: bool = False
    lease_owner: str = ""            # "" = hostname:pid
    dry_run: bool = False            # STDOUT/JSON debug sink (CHANGES.txt:43,143)
    collect_stats: bool = False      # capture ds.stats() per round into metrics.json
    # Continuous metrics stream (rayrep/metrics.py): append one JSON line
    # per epoch barrier (+ maintenance events) to _manifests/metrics.jsonl
    # so a dashboard consumer can `rayrep metrics --follow` a live tail
    # session (reference: continuous codahale reporting, CHANGES.txt:79-80)
    metrics_stream: bool = True
    # Override the v1 payload schema (SchemaVersion JSON). Empty = the
    # canonical transcript schema. Lets the same engine replay any keyed
    # table that carries (conv_id, turn_idx, ts).
    initial_schema_json: str = ""

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "EngineConfig":
        return cls(**json.loads(s))

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        """YAML loader (reference: YAML-driven config, CHANGES.txt:86). Uses
        a JSON superset parse if PyYAML is unavailable in the sandbox."""
        try:
            import yaml  # type: ignore

            with open(path) as f:
                return cls(**yaml.safe_load(f))
        except ImportError:
            with open(path) as f:
                return cls(**json.load(f))
