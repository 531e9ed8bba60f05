"""Deterministic synthetic changelog ("binlog") generator.

Produces the FIXTURES.md §2 changelog: a directory of epoch Parquet files
(`epoch-{e:05d}.parquet`) of I/U/D/DDL events over conversation-transcript
rows, with a snapshot prefix (binlog-flusher analog: the reference flushes
full table contents *into* the binlog so the stream bootstraps state,
/root/reference/README.md:14-15), a mid-stream DDL (active-schema analog,
CHANGES.txt:57,45-46), zipf-skewed conversation popularity (uuidBuffer
"few very large transactions" load pattern, CHANGES.txt:168-170), ts
inversions and ties (HBase version LWW analog, README.md:18).

Guaranteed properties (relied on by tests, FIXTURES.md §2):
- `seq` strictly increasing and dense across the whole log;
- for every key the first event is `I` (or the key is in the snapshot
  prefix); a `U`/`D` never targets a never-inserted key;
- a `D` may be followed by a re-`I` (resurrection), never directly by `U`;
- duplicate writers per key exist (conflict path); some `ts` ties are
  broken by `seq`; some `ts` are out of order w.r.t. `seq`.

Fully vectorized (numpy + pyarrow); ~50M events generate in seconds — the
generator itself must not be the bench bottleneck.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from rayrep.schema import CHANGELOG_SCHEMA

T0_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z in microseconds


@dataclass
class GenSpec:
    seed: int = 42
    n_conversations: int = 50
    max_turns: int = 8
    n_events: int = 1000
    zipf_a: float = 0.0          # 0 = uniform conversation popularity
    snapshot_frac: float = 0.2   # leading fraction of seq that is the snapshot prefix
    ddl_frac: float = 0.4        # position of the add_column DDL in the stream
    delete_frac: float = 0.12    # per-slot delete-attempt probability
    n_epochs: int = 4
    ts_tie_grain_us: int = 1_000_000   # quantize ts to 1s so same-key ties occur
    ts_jitter_us: int = 3_000_000      # +/- jitter causing seq/ts inversions
    files_per_epoch: int = 0           # 0 = auto (~500k rows/file); >1 enables parallel reads
    # fraction of U events that carry only CHANGED cells (other payload
    # columns null = "unchanged", CHANGES.txt:173); requires replaying with
    # EngineConfig.changed_cells_updates=True
    changed_cells_frac: float = 0.0
    # pad every text to roughly this many bytes (0 = the short debug
    # payload). Realistic transcript turns are hundreds of bytes — payload
    # width is what the map-side combiner's byte collapse is for. Padding
    # is deterministic (derived from the unique prefix), so the per-turn
    # text-equality invariant still identifies the winning writer.
    text_pad: int = 0

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)


def _conv_weights(rng: np.random.Generator, spec: GenSpec) -> np.ndarray:
    if spec.zipf_a and spec.zipf_a > 0:
        w = 1.0 / np.power(np.arange(1, spec.n_conversations + 1, dtype=np.float64), spec.zipf_a)
    else:
        w = np.ones(spec.n_conversations, dtype=np.float64)
    rng.shuffle(w)  # decouple popularity from conv id order
    return w / w.sum()


def generate_changelog(spec: GenSpec) -> pa.Table:
    """Build the full changelog as one Arrow table, ordered by seq."""
    rng = np.random.default_rng(spec.seed)

    # --- key universe: (conv, turn) ----------------------------------------
    turns_per_conv = rng.integers(1, spec.max_turns + 1, size=spec.n_conversations)
    conv_of_key = np.repeat(np.arange(spec.n_conversations), turns_per_conv)
    turn_of_key = np.concatenate([np.arange(t) for t in turns_per_conv]).astype(np.int64)
    n_keys = conv_of_key.size

    w = _conv_weights(rng, spec)
    key_w = w[conv_of_key] / turns_per_conv[conv_of_key]
    key_w = key_w / key_w.sum()

    # --- snapshot prefix (binlog-flusher analog) ---------------------------
    n_snap = min(int(spec.n_events * spec.snapshot_frac), n_keys)
    n_tail = spec.n_events - n_snap
    base_keys = np.sort(rng.choice(n_keys, size=n_snap, replace=False))
    is_base = np.zeros(n_keys, dtype=bool)
    is_base[base_keys] = True

    # --- tail: per-key event chains ----------------------------------------
    k_per_key = rng.multinomial(n_tail, key_w)
    key_idx = np.repeat(np.arange(n_keys), k_per_key)            # grouped by key
    j = np.concatenate([np.arange(k) for k in k_per_key]) if n_tail else np.array([], dtype=np.int64)

    # op state machine driven only by (j, base, d[j-1], d[j]) — vectorizable.
    d = rng.random(n_tail) < spec.delete_frac
    d_prev = np.empty_like(d)
    if n_tail:
        d_prev[0] = False
        d_prev[1:] = d[:-1]
        d_prev[j == 0] = False                                    # no carry across keys
    first_insert = (j == 0) & ~is_base[key_idx]
    resurrect = d_prev & ~first_insert
    is_D = d & ~d_prev & ~first_insert
    op_code = np.where(first_insert | resurrect, 0, np.where(is_D, 2, 1))  # 0=I,1=U,2=D

    # interleave: per-key ascending positions assigned to chain order, then
    # a global sort — preserves within-key order, randomizes across keys.
    pos = rng.random(n_tail)
    order = np.lexsort((pos, key_idx))
    assigned_pos = pos[order]                                     # grouped by key, asc within key
    g = np.argsort(assigned_pos, kind="stable")

    tail_key = key_idx[g]
    tail_turnpos = j[g]
    tail_op = op_code[g]

    # --- assemble the seq-ordered stream -----------------------------------
    all_key = np.concatenate([base_keys, tail_key])
    all_op = np.concatenate([np.zeros(n_snap, dtype=tail_op.dtype), tail_op])
    n = all_key.size
    seq = np.arange(n, dtype=np.int64)

    # DDL insertion point: bump seq >= ddl_seq by one, add the DDL row after.
    ddl_seq = max(int(n * spec.ddl_frac), n_snap)  # DDL lands after the snapshot
    seq = np.where(seq >= ddl_seq, seq + 1, seq)
    schema_ver = np.where(seq > ddl_seq, 2, 1).astype(np.int32)

    # timestamps: coarse-grained monotone base + jitter → ties and inversions.
    base_ts = T0_US + (seq.astype(np.float64) / max(n, 1) * n * spec.ts_tie_grain_us * 0.25)
    jitter = rng.integers(-spec.ts_jitter_us, spec.ts_jitter_us + 1, size=n)
    ts = ((base_ts + jitter) // spec.ts_tie_grain_us).astype(np.int64) * spec.ts_tie_grain_us
    ts[:n_snap] = T0_US  # snapshot rows share one ts → LWW ties broken by seq

    # transactions: random boundaries over the ordered stream (uuidBuffer analog)
    txn_id = np.cumsum(rng.random(n) < 0.125).astype(np.int64)

    conv = all_key  # conv index per event
    # build the n_conversations distinct id strings once, then gather —
    # O(n_keys) string work instead of O(n_events)
    conv_id_pool = pa.array([f"c{i:08d}" for i in range(spec.n_conversations)])
    turn_idx = turn_of_key[conv].astype(np.int32)

    op_str = np.array(["I", "U", "D"], dtype="U1")[all_op]

    # changed-cells mask draw stays HERE (before the chunk loop) so the
    # rng call order — jitter, txn, mask — is byte-identical to every
    # previously generated fixture/oracle stream
    r_mask = rng.random(n) if spec.changed_cells_frac > 0 else None

    # String columns are assembled in bounded chunks: one contiguous
    # Arrow string array caps at 2^31 bytes (ArrowCapacityError at
    # ~10^8 transcript rows — hit by the 200M endurance run), while a
    # chunked column has no such limit and every kernel below is
    # chunk-local anyway. Values are identical to the old single-shot
    # path; only the physical chunking differs.
    CHUNK = 16_000_000
    roles = np.array(["user", "assistant", "system", "tool"], dtype="U9")
    tools = np.array(["", "search", "python", "browser"], dtype="U7")
    empty = [pa.nulls(0, pa.string())]  # typed zero-chunk fallback (n == 0)
    conv_chunks, role_chunks, text_chunks, tool_chunks = (
        list(empty), list(empty), list(empty), list(empty)) if n == 0 else (
        [], [], [], [])
    for lo in range(0, n, CHUNK):
        hi = min(lo + CHUNK, n)
        m = hi - lo
        sl = slice(lo, hi)
        conv_c = conv_id_pool.take(pa.array(conv_of_key[conv[sl]]))
        # payload: text encodes (conv, turn, seq) so the winning writer is
        # observable — the per-turn text-equality invariant (BASELINE.json).
        seq_str = pa.array(seq[sl]).cast(pa.string())
        turn_str = pa.array(turn_idx[sl]).cast(pa.string())
        text = pc.binary_join_element_wise(conv_c, turn_str, seq_str, "-")
        if spec.text_pad > 0:
            filler = pa.scalar(
                " lorem-ipsum-filler-token" * max(1, spec.text_pad // 25))
            text = pc.binary_join_element_wise(text, filler, " ")
        role = roles[(conv[sl] + turn_idx[sl].astype(np.int64) + seq[sl]) % 4]

        # tool column: only meaningful for schema_ver=2 events
        sv2 = schema_ver[sl] >= 2
        tool = pa.array(np.where(sv2, tools[seq[sl] % 4], ""),
                        type=pa.string())
        tool = pc.if_else(pa.array(sv2), tool, pa.nulls(m, pa.string()))

        # deletes carry no payload (reference: "For deleted rows all
        # columns should be ignored", CHANGES.txt:184)
        is_del = pa.array(all_op[sl] == 2)
        null_s = pa.nulls(m, pa.string())
        role_a = pc.if_else(is_del, null_s, pa.array(role))
        text_a = pc.if_else(is_del, null_s, text)
        tool_a = pc.if_else(is_del, null_s, tool)

        if r_mask is not None:
            # changed-cells updates (CHANGES.txt:173): a masked U event
            # carries only some payload columns; null = "unchanged". Half
            # update text only (role/tool null), half role/tool only.
            r = r_mask[sl]
            masked = (all_op[sl] == 1) & (r < spec.changed_cells_frac)
            text_only = pa.array(masked & (r < spec.changed_cells_frac / 2))
            meta_only = pa.array(masked & (r >= spec.changed_cells_frac / 2))
            role_a = pc.if_else(text_only, null_s, role_a)
            tool_a = pc.if_else(text_only, null_s, tool_a)
            text_a = pc.if_else(meta_only, null_s, text_a)
        conv_chunks.append(conv_c)
        role_chunks.append(role_a)
        text_chunks.append(text_a)
        tool_chunks.append(tool_a)

    data = pa.table(
        {
            "seq": pa.array(seq),
            "txn_id": pa.array(txn_id),
            "op": pa.array(op_str),
            "schema_ver": pa.array(schema_ver),
            "conv_id": pa.chunked_array(conv_chunks),
            "turn_idx": pa.array(turn_idx),
            "role": pa.chunked_array(role_chunks),
            "text": pa.chunked_array(text_chunks),
            "tool": pa.chunked_array(tool_chunks),
            "ts": pa.array(ts).cast(pa.timestamp("us")),
            "ddl": pa.nulls(n, pa.string()),
        }
    )

    ddl_row = pa.table(
        {
            "seq": pa.array([ddl_seq], pa.int64()),
            "txn_id": pa.array([int(txn_id[min(ddl_seq, n - 1)])], pa.int64()),
            "op": pa.array(["DDL"]),
            "schema_ver": pa.array([2], pa.int32()),
            "conv_id": pa.nulls(1, pa.string()),
            "turn_idx": pa.nulls(1, pa.int32()),
            "role": pa.nulls(1, pa.string()),
            "text": pa.nulls(1, pa.string()),
            "tool": pa.nulls(1, pa.string()),
            "ts": pa.array([T0_US + ddl_seq], pa.timestamp("us")),
            "ddl": pa.array([json.dumps({"action": "add_column", "name": "tool", "type": "string"})]),
        }
    )

    # `data` is already seq-ascending by construction (arange + bump), and
    # the DDL row's seq slots exactly at row index ddl_seq — positional
    # insertion via zero-copy slices replaces the old global take-sort,
    # which materialized every string column contiguously (same 2^31-byte
    # cap the chunked build above exists to avoid).
    data = data.cast(CHANGELOG_SCHEMA)
    ddl_row = ddl_row.cast(CHANGELOG_SCHEMA)
    return pa.concat_tables(
        [data.slice(0, ddl_seq), ddl_row, data.slice(ddl_seq)])


def write_changelog(out_dir: str, spec: GenSpec,
                    table: pa.Table | None = None) -> dict:
    """Write the changelog as one DIRECTORY of part files per epoch
    (`epoch-{e:05d}/part-{i:04d}.parquet`) so the engine's read stage
    parallelizes across files (a single big file = a single serial read
    task). Pre-DDL epochs physically omit the `tool` column (schema
    evolution visible at the file level, like binlog events written under
    the then-active schema).  Pass ``table`` (a ``generate_changelog(spec)``
    result) to reuse an already-generated log instead of regenerating."""
    os.makedirs(out_dir, exist_ok=True)
    if table is None:
        table = generate_changelog(spec)
    n = table.num_rows
    bounds = np.linspace(0, n, spec.n_epochs + 1).astype(np.int64)
    ddl_seq = int(
        pc.min(table.filter(pc.equal(table["op"], "DDL"))["seq"]).as_py()
    )
    epochs = []
    for e in range(spec.n_epochs):
        chunk = table.slice(int(bounds[e]), int(bounds[e + 1] - bounds[e]))
        if chunk.num_rows and pc.max(chunk["seq"]).as_py() < ddl_seq:
            chunk = chunk.drop_columns(["tool"])  # pre-DDL file: column absent
        nf = spec.files_per_epoch or max(1, chunk.num_rows // 500_000)
        edir = os.path.join(out_dir, f"epoch-{e:05d}")
        os.makedirs(edir, exist_ok=True)
        fb = np.linspace(0, chunk.num_rows, nf + 1).astype(np.int64)
        for i in range(nf):
            part = chunk.slice(int(fb[i]), int(fb[i + 1] - fb[i]))
            pq.write_table(part, os.path.join(edir, f"part-{i:04d}.parquet"))
        epochs.append(
            {
                "epoch": e,
                "file": os.path.basename(edir),
                "files": nf,
                "rows": chunk.num_rows,
                "min_seq": pc.min(chunk["seq"]).as_py() if chunk.num_rows else None,
                "max_seq": pc.max(chunk["seq"]).as_py() if chunk.num_rows else None,
            }
        )
    manifest = {
        "spec": json.loads(spec.to_json()),
        "n_events": n,
        "ddl_seq": ddl_seq,
        "epochs": epochs,
    }
    with open(os.path.join(out_dir, "_gen_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def publish_epoch(out_dir: str, epoch: int, table: pa.Table, n_files: int = 1) -> str:
    """Atomically publish one epoch for a live `pipeline.tail` consumer:
    files are written under a temp directory, then the directory is
    renamed to `epoch-NNNNN` in one step — a tailer's `epoch-*` glob
    never observes a half-written epoch."""
    os.makedirs(out_dir, exist_ok=True)
    final = os.path.join(out_dir, f"epoch-{epoch:05d}")
    tmp = os.path.join(out_dir, f"_tmp-epoch-{epoch:05d}-{os.getpid()}")
    os.makedirs(tmp, exist_ok=True)
    fb = np.linspace(0, table.num_rows, n_files + 1).astype(np.int64)
    for i in range(n_files):
        part = table.slice(int(fb[i]), int(fb[i + 1] - fb[i]))
        pq.write_table(part, os.path.join(tmp, f"part-{i:04d}.parquet"))
    os.rename(tmp, final)
    return final
