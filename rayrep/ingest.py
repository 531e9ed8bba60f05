"""CDC-envelope JSON ingest: external change streams → engine changelog.

Reference anchor: the reference's S1 source is its own binlog supplier
(open-replicator/binlog-connector, README.md:11-14); downstream systems
speak the de-facto public CDC envelope popularized by Debezium — one JSON
document per change with an ``op`` code, ``before``/``after`` row images,
a millisecond timestamp and a binlog ``source`` position:

    {"op": "c|u|d|r",                      # create/update/delete/snapshot-read
     "before": {...}|null, "after": {...}|null,
     "ts_ms": 1700000000000,
     "source": {"file": "binlog.000007", "pos": 4711}}

plus, as an extension (Debezium ships schema changes on a side topic;
here they ride the stream in order, like the reference's binlog DDL):

    {"op": "ddl", "ddl": {"action": "add_column", "name": "tool",
     "type": "string"}, "ts_ms": ..., "source": {...}}

``ingest_cdc_json`` converts a directory of JSONL files — one file per
producer flush, file order = stream order — into the engine's atomic
epoch layout (``epoch-NNNNN/part-*.parquet``), assigning the engine's
DENSE global ``seq`` from cumulative line counts (so ``check-log``
passes on an ingested log) and version-exact ``schema_ver`` stamps from
the cumulative DDL count (so multi-version epoch rounds replay the
exact steps). A file's PHYSICAL payload columns are whatever its images
actually carry — never null-padded to a union — preserving the engine's
"file schema = producer's active schema" contract.

Scale shape: one bounded Ray task per input file parses (pyarrow's C++
JSON reader), orders by binlog position, stamps, and writes its epoch
under a temp name — parsed tables never land on the driver (object
refs flow task→task); the driver holds only O(files) counts for the
seq/version prefix sums and performs the final renames IN STREAM ORDER,
so a live tailer never observes epoch k+1 before k. Cross-file ordering
is verified ((file, pos) ranges must be increasing — ``IngestOrderError``);
malformed envelopes fail loudly with the offending positions
(``IngestFormatError``) — refuse, don't guess.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from rayrep.schema import CHANGELOG_SCHEMA, META_COLUMNS

_OPS = ["c", "r", "u", "d", "ddl"]
_MAPPED = ["I", "I", "U", "D", "DDL"]
KEY_COLS = ("conv_id", "turn_idx")


class IngestFormatError(ValueError):
    """An envelope violates the CDC contract (unknown op, missing image,
    null key on a data event) — the file and first offending positions
    are named; nothing is published for the failing file."""


class IngestOrderError(ValueError):
    """Input files are not in stream order: a file's (binlog file, pos)
    range overlaps its predecessor's. Epochs must append in binlog order
    or replay's LWW/seq semantics would be built on a lie."""


def _struct_col(tbl: pa.Table, name: str, field: str):
    """``tbl[name].field(field)`` or None when absent (envelope written
    under an older schema, or an all-null image column)."""
    if name not in tbl.column_names:
        return None
    col = tbl.column(name)
    if not pa.types.is_struct(col.type) or col.type.get_field_index(field) < 0:
        return None
    return pc.struct_field(col, field)


def parse_envelope_file(path: str) -> dict:
    """Parse + validate + order ONE JSONL envelope file into the engine
    event columns (everything except the globally-assigned ``seq`` /
    ``schema_ver``)."""
    from pyarrow import json as pj

    raw = pj.read_json(path)
    n = raw.num_rows
    base = os.path.basename(path)
    if n == 0:
        raise IngestFormatError(f"{base}: empty envelope file")
    for req in ("op", "ts_ms", "source"):
        if req not in raw.column_names:
            raise IngestFormatError(f"{base}: missing required field {req!r}")
    src_file = _struct_col(raw, "source", "file")
    src_pos = _struct_col(raw, "source", "pos")
    if src_file is None or src_pos is None:
        raise IngestFormatError(f"{base}: source.file/source.pos required")
    mapped = pc.take(pa.array(_MAPPED),
                     pc.index_in(raw.column("op"), value_set=pa.array(_OPS)))
    if mapped.null_count:
        bad = raw.filter(pc.is_null(mapped)).column("op").to_pylist()[:5]
        raise IngestFormatError(f"{base}: unknown op codes {bad}")
    # stream order WITHIN the file: (binlog file name, pos)
    fnames = np.asarray(src_file.to_numpy(zero_copy_only=False), dtype=object)
    pos = src_pos.cast(pa.int64()).to_numpy(zero_copy_only=False)
    order = np.lexsort((pos, fnames))
    raw = raw.take(pa.array(order))
    mapped = mapped.take(pa.array(order))
    fnames, pos = fnames[order], pos[order]

    is_d = pc.equal(mapped, "D")
    is_ddl = pc.equal(mapped, "DDL")
    not_ddl = pc.invert(is_ddl)

    def image(field: str, key: bool):
        aft = _struct_col(raw, "after", field)
        bef = _struct_col(raw, "before", field)
        ref = aft if aft is not None else bef
        if ref is None:
            return None
        null = pa.nulls(n, ref.type)
        a = aft if aft is not None else null
        b = bef if bef is not None else null
        if key:
            # key from the AFTER image except deletes (after = null)
            return pc.if_else(is_d, b, a)
        # payload: deletes carry nulls (engine D semantics); DDL rows too
        return pc.if_else(pc.and_(not_ddl, pc.invert(is_d)), a, null)

    conv = image("conv_id", key=True)
    turn = image("turn_idx", key=True)
    if conv is None or turn is None:
        raise IngestFormatError(f"{base}: no conv_id/turn_idx in any image")
    bad_key = pc.and_(not_ddl, pc.or_kleene(
        pc.is_null(conv), pc.is_null(turn)))
    if pc.any(bad_key).as_py():
        where = pos[bad_key.to_numpy(zero_copy_only=False).astype(bool)][:5]
        raise IngestFormatError(
            f"{base}: data event(s) with null key at pos {where.tolist()}")
    # payload columns = the fields the images actually carry, in image order
    payload_fields: list[str] = []
    for imgcol in ("after", "before"):
        if imgcol in raw.column_names and pa.types.is_struct(
                raw.column(imgcol).type):
            for f in raw.column(imgcol).type:
                if (f.name not in KEY_COLS and f.name not in payload_fields
                        and f.name not in META_COLUMNS):
                    payload_fields.append(f.name)
    txn = (raw.column("txn_id").cast(pa.int64()).fill_null(0)
           if "txn_id" in raw.column_names
           else pa.array(np.zeros(n, dtype=np.int64)))
    cols: dict = {
        "txn_id": txn,
        "op": mapped,
        "conv_id": conv.cast(pa.string()),
        "turn_idx": turn.cast(pa.int32()),
        # microsecond precision wins when the producer supplies it
        # (Debezium 2.5+ ships source.ts_us next to ts_ms); else ms*1000,
        # coalesced per row so mixed producers degrade gracefully
        "ts": pc.coalesce(
            (raw.column("ts_us").cast(pa.int64())
             if "ts_us" in raw.column_names else pa.nulls(n, pa.int64())),
            pc.multiply(raw.column("ts_ms").cast(pa.int64()),
                        pa.scalar(1000, pa.int64()))
        ).cast(pa.timestamp("us")),
    }
    for f in payload_fields:
        cols[f] = image(f, key=False)
    n_ddl = int(pc.sum(pc.cast(is_ddl, pa.int8())).as_py() or 0)
    if n_ddl:
        if "ddl" not in raw.column_names:
            raise IngestFormatError(f"{base}: op=ddl without a ddl object")
        ddl_objs = raw.column("ddl").to_pylist()
        cols["ddl"] = pa.array(
            [json.dumps(o) if d and o is not None else None
             for d, o in zip(is_ddl.to_pylist(), ddl_objs)], pa.string())
    else:
        cols["ddl"] = pa.nulls(n, pa.string())
    return {
        "table": pa.table(cols),
        "n": n,
        "n_ddl": n_ddl,
        "first_key": (str(fnames[0]), int(pos[0])),
        "last_key": (str(fnames[-1]), int(pos[-1])),
    }


def _meta_of(parsed: dict) -> dict:
    return {k: parsed[k] for k in ("n", "n_ddl", "first_key", "last_key")}


def stamp_and_stage(parsed: dict, out_dir: str, epoch: int,
                    seq_base: int, ver_base: int,
                    files_per_epoch: int = 1) -> str:
    """Stamp the globally-assigned columns and WRITE the epoch under a
    temp name (rename happens on the driver, in stream order).
    ``schema_ver`` = ver_base + running DDL count INCLUSIVE of the
    current row (a DDL row carries the version it creates, like the
    generator's)."""
    t = parsed["table"]
    n = t.num_rows
    is_ddl = pc.equal(t["op"], "DDL").to_numpy(zero_copy_only=False)
    ver = ver_base + np.cumsum(is_ddl.astype(np.int32))
    t = t.add_column(0, "seq",
                     pa.array(seq_base + np.arange(n, dtype=np.int64)))
    t = t.append_column("schema_ver", pa.array(ver, pa.int32()))
    names = [f.name for f in CHANGELOG_SCHEMA if f.name in t.column_names]
    extra = [c for c in t.column_names if c not in names]
    t = t.select(names + extra)
    import pyarrow.parquet as pq

    tmp = os.path.join(out_dir, f"_ingest-tmp-epoch-{epoch:05d}")
    os.makedirs(tmp, exist_ok=True)
    fb = np.linspace(0, n, files_per_epoch + 1).astype(np.int64)
    for i in range(files_per_epoch):
        pq.write_table(t.slice(int(fb[i]), int(fb[i + 1] - fb[i])),
                       os.path.join(tmp, f"part-{i:04d}.parquet"))
    return tmp


def export_envelopes(changelog_dir: str, out_dir: str,
                     binlog_prefix: str = "binlog") -> dict:
    """Engine changelog → Debezium-style JSONL, one flush file per epoch
    (the egress mirror of ``ingest_cdc_json``; the reference's Kafka
    applier publishes the same per-event envelopes downstream,
    README.md:16). I→``c``, U→``u``, D→``d`` (key in ``before``, after
    null), DDL→``ddl``; null payload cells are OMITTED from the image
    (producers don't emit what they didn't write), ``ts_ms`` plus the
    exact ``ts_us``, and ``source`` = (per-epoch binlog file name,
    pos = the engine's global seq) so a round-trip re-ingest reproduces
    the exact event order. One bounded Ray task per epoch when Ray is
    up; JSON text serialization is the honest cost here and dominates —
    this is an egress/interchange path, not the replay hot path."""
    from rayrep.pipeline import discover_epochs

    epochs = discover_epochs(changelog_dir)
    if not epochs:
        raise FileNotFoundError(f"{changelog_dir}: no epochs")
    os.makedirs(out_dir, exist_ok=True)

    def one(epoch: int, path: str) -> int:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            parts = [os.path.join(path, f) for f in sorted(os.listdir(path))
                     if f.endswith(".parquet")]
            t = pa.concat_tables([pq.read_table(p) for p in parts],
                                 promote_options="permissive")
        else:
            t = pq.read_table(path)
        t = t.take(pa.array(np.argsort(
            t.column("seq").to_numpy(zero_copy_only=False))))
        meta = set(META_COLUMNS) | {"ts"}
        payload = [c for c in t.column_names if c not in meta]
        rows = t.to_pylist()
        fname = f"{binlog_prefix}.{epoch + 1:06d}"
        tmp = os.path.join(out_dir, f"_tmp-flush-{epoch:05d}.jsonl")
        with open(tmp, "w") as f:
            for r in rows:
                ts_us = int(pa.scalar(r["ts"], pa.timestamp("us"))
                            .cast(pa.int64()).as_py())
                e: dict = {"ts_ms": ts_us // 1000, "ts_us": ts_us,
                           "source": {"file": fname, "pos": int(r["seq"])}}
                if r["op"] == "DDL":
                    e["op"] = "ddl"
                    e["ddl"] = json.loads(r["ddl"])
                    e["before"] = e["after"] = None
                else:
                    img = {k: r[k] for k in payload if r[k] is not None}
                    if r["op"] == "D":
                        e["op"] = "d"
                        e["before"] = {"conv_id": r["conv_id"],
                                       "turn_idx": r["turn_idx"]}
                        e["after"] = None
                    else:
                        e["op"] = "c" if r["op"] == "I" else "u"
                        e["before"] = None
                        e["after"] = img
                if r.get("txn_id") is not None:
                    e["txn_id"] = int(r["txn_id"])
                f.write(json.dumps(e) + "\n")
        os.replace(tmp, os.path.join(out_dir, f"flush-{epoch:05d}.jsonl"))
        return len(rows)

    import ray

    if ray.is_initialized() and len(epochs) > 1:
        onef = ray.remote(num_cpus=1)(one)
        counts = ray.get([onef.remote(e, p) for e, p in epochs])
    else:
        counts = [one(e, p) for e, p in epochs]
    return {"files": len(epochs), "rows": int(sum(counts))}


def ingest_cdc_json(src_dir: str, changelog_dir: str,
                    start_epoch: int = 0, start_seq: int = 0,
                    start_schema_ver: int = 1,
                    files_per_epoch: int = 1,
                    only_files: list[str] | None = None,
                    prev_last_key: tuple | None = None,
                    write_src_markers: bool = False) -> dict:
    """Ingest every ``*.json``/``*.jsonl`` file under ``src_dir`` (sorted
    by name = producer flush order), one engine epoch per file.
    Returns per-epoch stats plus the ``next_seq``/``next_schema_ver``
    cursor for the following ingest batch (continuous tailing of an
    external stream = ``ingest_cdc_json_tail``, which calls this with
    ``only_files`` = the newly appeared names, ``prev_last_key`` = the
    previous batch's last binlog position for the cross-batch order
    check, and ``write_src_markers`` so each published epoch atomically
    records its source file + post-file cursor for crash recovery)."""
    names = (sorted(only_files) if only_files is not None
             else sorted(f for f in os.listdir(src_dir)
                         if f.endswith((".json", ".jsonl"))))
    if not names:
        raise IngestFormatError(f"{src_dir}: no .json/.jsonl envelope files")
    paths = [os.path.join(src_dir, f) for f in names]
    os.makedirs(changelog_dir, exist_ok=True)
    import ray

    use_ray = ray.is_initialized() and len(paths) > 1
    if use_ray:
        parse = ray.remote(num_cpus=1)(parse_envelope_file)
        meta_of = ray.remote(num_cpus=0)(_meta_of)
        refs = [parse.remote(p) for p in paths]
        metas = ray.get([meta_of.remote(r) for r in refs])
    else:
        refs = [parse_envelope_file(p) for p in paths]
        metas = [_meta_of(p) for p in refs]
    if prev_last_key is not None and metas and \
            tuple(metas[0]["first_key"]) <= tuple(prev_last_key):
        raise IngestOrderError(
            f"{names[0]} starts at {metas[0]['first_key']} but the "
            f"previously ingested stream ends at {tuple(prev_last_key)} — "
            "a follower batch must continue the binlog order")
    for prev, cur, name in zip(metas, metas[1:], names[1:]):
        if cur["first_key"] <= prev["last_key"]:
            raise IngestOrderError(
                f"{name} starts at {cur['first_key']} but the previous "
                f"file ends at {prev['last_key']} — input files must be "
                "in binlog order")
    ns = np.array([m["n"] for m in metas], dtype=np.int64)
    dd = np.array([m["n_ddl"] for m in metas], dtype=np.int64)
    seq_bases = start_seq + np.concatenate(([0], np.cumsum(ns)[:-1]))
    ver_bases = start_schema_ver + np.concatenate(([0], np.cumsum(dd)[:-1]))
    if use_ray:
        stage = ray.remote(num_cpus=1)(stamp_and_stage)
        tmps = ray.get([
            stage.remote(refs[i], changelog_dir, start_epoch + i,
                         int(seq_bases[i]), int(ver_bases[i]),
                         files_per_epoch)
            for i in range(len(refs))])
    else:
        tmps = [stamp_and_stage(refs[i], changelog_dir, start_epoch + i,
                                int(seq_bases[i]), int(ver_bases[i]),
                                files_per_epoch)
                for i in range(len(refs))]
    epochs = []
    for i, tmp in enumerate(tmps):  # publish IN ORDER: tailers never see a gap
        e = start_epoch + i
        if write_src_markers:
            # the rename below atomically commits data AND cursor: a
            # restarted follower recovers from the max marker, so a crash
            # between batches re-ingests nothing and skips nothing
            with open(os.path.join(tmp, SRC_MARKER), "w") as f:
                json.dump({
                    "src": names[i],
                    "last_key": list(metas[i]["last_key"]),
                    "next_seq": int(seq_bases[i] + ns[i]),
                    "next_schema_ver": int(ver_bases[i] + dd[i]),
                }, f, sort_keys=True)
        os.rename(tmp, os.path.join(changelog_dir, f"epoch-{e:05d}"))
        epochs.append({"epoch": e, "rows": int(ns[i]),
                       "min_seq": int(seq_bases[i]),
                       "max_seq": int(seq_bases[i] + ns[i] - 1),
                       "n_ddl": int(dd[i])})
    return {"epochs": epochs, "rows": int(ns.sum()), "ddl": int(dd.sum()),
            "next_seq": int(start_seq + ns.sum()),
            "next_schema_ver": int(start_schema_ver + dd.sum())}


SRC_MARKER = "_ingest_src.json"


def _recover_ingest_cursor(changelog_dir: str) -> dict:
    """Resume point for a restarted follower, derived from the atomically
    published epochs themselves (the marker rides the epoch rename, so it
    can never disagree with the data)."""
    import glob as _glob
    import re as _re

    best = None
    best_epoch = -1
    for p in _glob.glob(os.path.join(changelog_dir, "epoch-*", SRC_MARKER)):
        m = _re.search(r"epoch-(\d+)", os.path.dirname(p))
        e = int(m.group(1))
        if e > best_epoch:
            best_epoch = e
            with open(p) as f:
                best = json.load(f)
    if best is None:
        return {"last_file": "", "last_key": None, "next_epoch": 0,
                "next_seq": 0, "next_schema_ver": 1}
    return {"last_file": best["src"],
            "last_key": tuple(best["last_key"]),
            "next_epoch": best_epoch + 1,
            "next_seq": int(best["next_seq"]),
            "next_schema_ver": int(best["next_schema_ver"])}


def ingest_cdc_json_tail(src_dir: str, changelog_dir: str,
                         poll_interval_s: float = 1.0,
                         idle_timeout_s: float | None = 10.0,
                         max_files: int | None = None) -> dict:
    """Follow a GROWING envelope directory — the ``tail`` counterpart for
    the Debezium path: a live producer keeps flushing JSONL files (names
    in flush order) and this loop ingests each new file as an engine
    epoch the moment it appears, without batch re-invocation. Producers
    must publish files atomically (write elsewhere + rename in).

    Crash-safe by construction: each epoch's directory carries a marker
    with its source filename and the post-file (seq, schema_ver, binlog
    position) cursor, committed by the same rename that publishes the
    data — a restarted follower resumes exactly after the last published
    file. Cross-batch binlog-order violations raise ``IngestOrderError``
    just like in-batch ones.

    Stops after ``idle_timeout_s`` with no new files (None = run
    forever) or once ``max_files`` have been ingested. Returns totals
    plus the final cursor."""
    import time as _time

    os.makedirs(changelog_dir, exist_ok=True)
    cur = _recover_ingest_cursor(changelog_dir)
    total_rows = total_ddl = total_files = 0
    batches = 0
    last_new = _time.monotonic()
    while True:
        try:
            fresh = sorted(
                f for f in os.listdir(src_dir)
                if f.endswith((".json", ".jsonl")) and f > cur["last_file"])
        except FileNotFoundError:
            fresh = []  # follower started before the producer's first flush
        if max_files is not None:
            fresh = fresh[: max(0, max_files - total_files)]
        if fresh:
            res = ingest_cdc_json(
                src_dir, changelog_dir,
                start_epoch=cur["next_epoch"], start_seq=cur["next_seq"],
                start_schema_ver=cur["next_schema_ver"],
                only_files=fresh, prev_last_key=cur["last_key"],
                write_src_markers=True)
            total_rows += res["rows"]
            total_ddl += res["ddl"]
            total_files += len(fresh)
            batches += 1
            cur = {"last_file": fresh[-1],
                   "last_key": None,  # refreshed from the marker below
                   "next_epoch": res["epochs"][-1]["epoch"] + 1,
                   "next_seq": res["next_seq"],
                   "next_schema_ver": res["next_schema_ver"]}
            cur["last_key"] = _recover_ingest_cursor(changelog_dir)["last_key"]
            last_new = _time.monotonic()
        if max_files is not None and total_files >= max_files:
            break
        if (idle_timeout_s is not None
                and _time.monotonic() - last_new > idle_timeout_s):
            break
        _time.sleep(poll_interval_s)
    return {"files": total_files, "rows": total_rows, "ddl": total_ddl,
            "batches": batches, "next_epoch": cur["next_epoch"],
            "next_seq": cur["next_seq"],
            "next_schema_ver": cur["next_schema_ver"]}
