"""Event augmenter — the flagship vectorized map stage (M1–M5, M9 routing).

Reference analog: EventAugmenter joins each raw row image with the active
schema to produce typed, named AugmentedRows; it was the reference's CPU
bottleneck until parallelized ("Parallelized the mutations generator since
that was the CPU bottleneck", CHANGES.txt:97-98; AugmentedRow,
CHANGES.txt:87). Our version is a columnar rewrite over zero-copy Arrow
batches inside ``map_batches``:

- classify: DDL rows are split out (driver handles them via the registry;
  reference: query-event classifier, CHANGES.txt:117);
- evolve: the payload columns are rewritten to the *target* canonical
  schema version — renames applied, missing columns null-filled, types
  cast (CHANGES.txt:57 position-scoped active schema);
- type-normalize: timestamps to ``timestamp[us]`` (epoch-long semantics,
  CHANGES.txt:162-163), binary stays real ``binary`` (vs the reference's
  hexification, CHANGES.txt:161);
- stamp: ``part_id = stable_hash(conv_id) % P`` — the md5-salt analog
  (CHANGES.txt:102-104) that drives the single hash shuffle;
- filter: optional table-regex hook (CHANGES.txt:41-42).

Used as a callable class so schema parsing / regex compilation happens once
per actor (``__init__``), not once per batch.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from rayrep.hashing import partition_ids
from rayrep.schema import META_COLUMNS, SchemaVersion, evolve_table

# Engine metadata carried alongside the canonical payload columns.
AUGMENT_META = ["seq", "txn_id", "op", "schema_ver", "part_id"]


class Augmenter:
    def __init__(
        self,
        target_schema_json: str,
        num_partitions: int,
        table_filter_regex: str = "",
        carry_txn: bool = False,
        salt_turn_keys: bool = False,
        validate_events: bool = False,
        history_json: str = "",
        dead_letter_dir: str = "",
        dlq_epoch: int = -1,
    ):
        self.target = SchemaVersion.from_json(target_schema_json)
        # Version history for stepwise (version-exact) payload evolution:
        # a batch whose file schema predates the target (multi-epoch round
        # crossing a DDL) must replay the exact steps — the cumulative
        # rename map alone misroutes a reused column name.
        self.history: dict[int, SchemaVersion] = {}
        if history_json:
            import json as _json

            for d in _json.loads(history_json):
                sv = SchemaVersion.from_json(_json.dumps(d))
                self.history[sv.version] = sv
        self.num_partitions = num_partitions
        self.salt_turn_keys = salt_turn_keys
        # fail-fast malformed-event gate: a data event with a null routing
        # key or version column can neither be routed nor LWW-resolved —
        # refuse the batch with a counted, named error instead of letting
        # undefined grouping corrupt a partition (reference analog:
        # fail-fast + supervisor restart, CHANGES.txt:66-69)
        self.validate_events = validate_events
        # dead-letter mode: divert malformed rows instead of refusing the
        # epoch (rayrep/config.py dead_letter) — the dir is per-epoch so
        # the driver can clear-and-rewrite uncommitted epochs exactly-once
        self.dead_letter_dir = dead_letter_dir
        self.dlq_epoch = dlq_epoch
        if dead_letter_dir:
            self.validate_events = True
        self.table_filter_regex = table_filter_regex or None
        # txn_id is pure lineage — nothing downstream computes on it, so by
        # default it is consumed here instead of shipped through the sort
        # exchange (8 B/row; cfg.txn_lineage restores carrying it).
        self.carry_txn = carry_txn
        self.table_re = None
        if self.table_filter_regex:
            try:
                # probe the pattern against Arrow's RE2 dialect once; fall
                # back to Python re for syntax RE2 lacks (lookaround,
                # backrefs) so existing configs keep working
                pc.match_substring_regex(pa.array(["x"]), self.table_filter_regex)
            except pa.ArrowInvalid:
                import re

                self.table_re = re.compile(self.table_filter_regex)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # M1: route DDL rows out of the data path (handled by the registry).
        if "op" in batch.column_names:
            mask = pc.not_equal(batch["op"], "DDL")
            if pc.any(pc.invert(mask)).as_py():
                batch = batch.filter(mask)
        # M7: table-filter hook (single logical table here, but the surface
        # exists: a `table` column is honored when present).
        if self.table_filter_regex is not None and "table" in batch.column_names:
            if self.table_re is None:
                # unanchored search semantics, vectorized (RE2 kernel)
                keep = pc.match_substring_regex(batch["table"], self.table_filter_regex)
            else:  # non-RE2 pattern: Python re fallback (rare config path)
                keep = pa.array(
                    [bool(self.table_re.search(t)) for t in batch["table"].to_pylist()]
                )
            batch = batch.filter(keep)
        if batch.num_rows == 0:
            return self._empty()

        if self.validate_events:
            bad = pc.is_null(batch["conv_id"])
            for col in ("turn_idx", "ts", "seq"):
                bad = pc.or_(bad, pc.is_null(batch[col]))
            n_bad = pc.sum(bad).as_py() or 0
            if n_bad and self.dead_letter_dir:
                self._quarantine(batch.filter(bad))
                batch = batch.filter(pc.invert(bad))
                if batch.num_rows == 0:
                    return self._empty()
            elif n_bad:
                seqs = batch.filter(bad).column("seq").to_pylist()[:5]
                raise ValueError(
                    f"{n_bad} malformed data event(s) in batch: null "
                    f"conv_id/turn_idx/ts/seq (first seqs: {seqs}); refusing "
                    "the epoch — fix or filter the changelog upstream"
                )

        meta_cols = {
            c: batch.column(c) for c in META_COLUMNS if c != "ddl" and c in batch.column_names
        }
        payload = batch.drop_columns(
            [c for c in META_COLUMNS if c in batch.column_names]
        )
        # M2/M3: evolve payload to the target canonical schema (vectorized).
        # Contract: a changelog file's PHYSICAL schema is the one active at
        # its newest event, so max(schema_ver) identifies the batch's source
        # version (Ray Data batches never span files). When it predates the
        # target (multi-epoch round crossing a DDL), replay the exact steps.
        src_ver = None
        if self.history and "schema_ver" in batch.column_names:
            src_ver = pc.max(batch.column("schema_ver")).as_py()
        if src_ver is not None and src_ver < self.target.version:
            from rayrep.schema import evolve_table_from

            payload = evolve_table_from(
                payload, int(src_ver), self.target, self.history
            )
        else:
            payload = evolve_table(payload, self.target)
        # M6: partition stamp (salt analog) — drives the one hash shuffle.
        if self.salt_turn_keys:
            from rayrep.hashing import partition_ids_salted

            # Routing must stay byte-stable for the life of the lake: a null
            # turn_idx would become NaN here and the uint64 cast inside
            # partition_ids_salted would yield a platform-dependent garbage
            # partition id (validate_events is off by default, so this is
            # NOT already guaranteed). Fail with the same named
            # malformed-event error instead of routing silently.
            tcol = batch.column("turn_idx")
            n_null = tcol.null_count
            if n_null:
                seqs = batch.filter(pc.is_null(tcol)).column("seq").to_pylist()[:5]
                raise ValueError(
                    f"{n_null} malformed data event(s) in batch: null "
                    f"turn_idx with salt_turn_keys=True (first seqs: {seqs}); "
                    "refusing the epoch — fix or filter the changelog upstream"
                )
            pid = pa.array(partition_ids_salted(
                batch.column("conv_id"),
                tcol.to_numpy(zero_copy_only=False),
                self.num_partitions))
        else:
            pid = pa.array(partition_ids(batch.column("conv_id"),
                                         self.num_partitions))
        out = payload
        for name, col in meta_cols.items():
            if name == "schema_ver":
                continue  # consumed here; dead weight through the shuffle
            if name == "txn_id" and not self.carry_txn:
                continue  # lineage-off: recoverable from the changelog
            out = out.append_column(name, col)
        out = out.append_column("part_id", pid)
        return out

    # NOTE (measured, round 1): dictionary-encoding op/role/tool for
    # transport (~20 B/row saved through the shuffle) was tried and is
    # throughput-neutral on this hardware — the encode/decode CPU cancels
    # the byte savings. The applier still decodes defensively
    # (apply.decode_transport) so dict-encoded inputs are accepted.

    def _quarantine(self, bad: pa.Table) -> None:
        """Write the malformed rows — ORIGINAL bytes, pre-evolution, for
        forensics and manual repair — into the epoch's dead-letter dir.

        The filename is DETERMINISTIC in the quarantined rows' content
        (sha1 of the batch's Arrow-IPC bytes — seq alone won't do, null
        seq is itself a quarantine trigger), so a mid-round Ray task retry
        (routine at design scale) re-writes the SAME file instead of
        appending a uuid-named duplicate; tmp+rename (tmp name salted
        per-attempt) keeps a killed writer from leaving a partial file
        while concurrent retries can't clobber each other's tmp. The
        driver additionally clears an uncommitted epoch's dlq dir before
        re-running it, so cross-run re-executions can't duplicate either —
        exactly-once for read_dlq counts and requeue_dlq."""
        import hashlib
        import os
        import uuid

        import pyarrow.ipc as pipc
        import pyarrow.parquet as pq

        d = os.path.join(self.dead_letter_dir, f"e{self.dlq_epoch:05d}")
        os.makedirs(d, exist_ok=True)
        sink = pa.BufferOutputStream()
        with pipc.new_stream(sink, bad.schema) as w:
            w.write_table(bad.combine_chunks())
        digest = hashlib.sha1(sink.getvalue().to_pybytes()).hexdigest()[:16]
        name = f"part-{digest}-{len(bad)}.parquet"
        tmp = os.path.join(d, f".{name}.{uuid.uuid4().hex[:8]}.tmp")
        pq.write_table(bad, tmp)
        os.replace(tmp, os.path.join(d, name))

    def _empty(self) -> pa.Table:
        fields = list(self.target.schema)
        fields.append(pa.field("seq", pa.int64()))
        if self.carry_txn:
            fields.append(pa.field("txn_id", pa.int64()))
        fields += [pa.field("op", pa.string()), pa.field("part_id", pa.int32())]
        return pa.schema(fields).empty_table()
