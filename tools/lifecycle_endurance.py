"""Lifecycle endurance: the lake/log lifecycle operators at 50M+ events.

The replay path has 100M-event endurance evidence (tools/endurance.py);
this gives the round-4 lifecycle operators the same treatment on ONE
shared 50M-event fixture — each op timed with the hypervisor steal%% over
its own window, appended as one section to BENCH/BASELINE.md:

  1. ``replay``          — dead-letter + delta-output replay of the
                           poisoned 50M-event changelog (quarantines the
                           injected null-key rows while converging)
  2. ``secindex_build``  — full secondary-index build (value → keys with
                           retractions) from the 50M-event delta stream
  3. ``logcompact``      — row-mode span over the committed epochs with
                           ``drop_malformed`` (the dead-letter interop)
  4. ``dlq_requeue``     — repair + republication of the quarantine as a
                           proper epoch (lease + footer HWM scan)
  5. ``compacted_replay``— a FRESH lake replayed from the compacted log
                           (row-count parity with the original; value
                           equality at this scale is the SQL oracles'
                           job — this run is about walls)

Usage::

    python tools/lifecycle_endurance.py [--events 50000000] [--epochs 10]
                                        [--partitions 64] [--no-record]
"""
from __future__ import annotations

import argparse

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROOT = "/tmp/rayrep_bench"
POISON_PER_EPOCH = 200


def _cpu_sample():
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return (vals[7] if len(vals) > 7 else 0), sum(vals)


def _steal(before, after) -> float:
    dt = after[1] - before[1]
    return round(100.0 * (after[0] - before[0]) / dt, 1) if dt > 0 else 0.0


def _poison_table(n: int, with_tool: bool):
    import pandas as pd
    import pyarrow as pa

    cols = {
        "seq": pa.nulls(n, pa.int64()),
        "txn_id": pa.nulls(n, pa.int64()),
        "op": pa.array(["U"] * n),
        "schema_ver": pa.array([1] * n, pa.int32()),
        "conv_id": pa.nulls(n, pa.string()),
        "turn_idx": pa.nulls(n, pa.int32()),
        "role": pa.nulls(n, pa.string()),
        "text": pa.array(["poison"] * n),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * n, pa.timestamp("us")),
        "ddl": pa.nulls(n, pa.string()),
    }
    if with_tool:
        cols["tool"] = pa.nulls(n, pa.string())
    return pa.table(cols)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=50_000_000)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--no-record", action="store_true")
    ap.add_argument("--generate-only", action="store_true")
    args = ap.parse_args()

    base_cl = os.path.join(BENCH_ROOT,
                           f"cl-lifecycle-{args.events}-e{args.epochs}")
    if args.generate_only:
        from rayrep.gen import GenSpec, write_changelog

        shutil.rmtree(base_cl, ignore_errors=True)
        write_changelog(base_cl, GenSpec(
            seed=42, n_events=args.events,
            n_conversations=max(2000, args.events // 50),
            max_turns=50, n_epochs=args.epochs, zipf_a=1.1))
        return 0
    if not os.path.exists(os.path.join(base_cl, "_gen_manifest.json")):
        # child process: the generator's peak RSS is O(n_events)
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--events", str(args.events),
                        "--epochs", str(args.epochs), "--generate-only"],
                       check=True)

    import pyarrow.parquet as pq
    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # hardlink copy (compaction mutates the log) + poison each epoch
    work = os.path.join(BENCH_ROOT, "lifecycle_work")
    shutil.rmtree(work, ignore_errors=True)
    cl = os.path.join(work, "cl")
    os.makedirs(cl)
    for e in range(args.epochs):
        src = os.path.join(base_cl, f"epoch-{e:05d}")
        dst = os.path.join(cl, f"epoch-{e:05d}")
        os.makedirs(dst)
        for f in os.listdir(src):
            os.link(os.path.join(src, f), os.path.join(dst, f))
        sch = pq.read_schema(
            os.path.join(dst, sorted(os.listdir(dst))[0]))
        pq.write_table(
            _poison_table(POISON_PER_EPOCH, with_tool="tool" in sch.names),
            os.path.join(dst, "part-poison.parquet"))
    n_poison = POISON_PER_EPOCH * args.epochs

    from rayrep.config import EngineConfig
    from rayrep.logcompact import compact_changelog
    from rayrep.pipeline import replay
    from rayrep.secindex import update_index
    from rayrep.sinks import requeue_dlq

    lake = os.path.join(work, "lake")
    cfg = EngineConfig(changelog_dir=cl, lake_dir=lake,
                       num_partitions=args.partitions,
                       dead_letter=True, delta_output=True)
    ops: dict[str, dict] = {}

    def timed(name, fn):
        s0, t0 = _cpu_sample(), time.perf_counter()
        out = fn()
        ops[name] = {"wall_s": round(time.perf_counter() - t0, 2),
                     "steal_pct": _steal(s0, _cpu_sample())}
        return out

    r = timed("replay", lambda: replay(cfg))
    quarantined = sum(e["quarantined"] for e in r["epochs"])
    assert quarantined == n_poison, (quarantined, n_poison)
    ops["replay"]["events_per_sec"] = round(
        args.events / ops["replay"]["wall_s"])
    lake_rows = sum(e["applied"] - e["deleted"] for e in r["epochs"])

    idx = os.path.join(work, "index")
    ri = timed("secindex_build", lambda: update_index(
        os.path.join(lake, "delta"), idx, column="role",
        num_index_partitions=32, lake_dir=lake))
    ops["secindex_build"]["entries_changed"] = ri.get("entries_changed")

    rc = timed("logcompact", lambda: compact_changelog(
        cl, through_epoch=args.epochs - 2, lake_dir=lake,
        drop_malformed=True))
    ops["logcompact"].update({
        "events_in": rc["n_original"], "events_out": rc["n_retained"],
        "retention_x": round(rc["n_retained"] / max(1, rc["n_original"]), 3),
        "dropped_malformed": rc["n_dropped_malformed"],
        "mb_before": round(rc["bytes_before"] / 2**20, 1),
        "mb_after": round(rc["bytes_after"] / 2**20, 1),
    })

    import numpy as np
    import pyarrow as pa

    def fix(t):

        n = t.num_rows
        t = t.set_column(t.column_names.index("conv_id"), "conv_id",
                         pa.array([f"repaired-{i}" for i in range(n)]))
        t = t.set_column(t.column_names.index("turn_idx"), "turn_idx",
                         pa.array(np.zeros(n, np.int32)))
        return t

    rq = timed("dlq_requeue", lambda: requeue_dlq(lake, cl, fix_fn=fix))
    ops["dlq_requeue"]["rows"] = rq["requeued"]

    lake2 = os.path.join(work, "lake2")
    cfg2 = EngineConfig(changelog_dir=cl, lake_dir=lake2,
                        num_partitions=args.partitions, dead_letter=True,
                        delta_output=False)
    r2 = timed("compacted_replay", lambda: replay(cfg2))
    in2 = sum(e["input_rows"] for e in r2["epochs"])
    ops["compacted_replay"]["input_events"] = in2
    ops["compacted_replay"]["events_per_sec"] = round(
        in2 / ops["compacted_replay"]["wall_s"])

    result = {"metric": "lifecycle endurance", "events": args.events,
              "epochs": args.epochs, "partitions": args.partitions,
              "cpus": args.cpus, "poison_rows": n_poison,
              "lake_live_rows": lake_rows, "ops": ops}
    print(json.dumps(result))

    if not args.no_record:
        md = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "BASELINE.md")
        rows = "\n".join(
            f"| {k} | {v['wall_s']} | {v['steal_pct']} | "
            + "; ".join(f"{kk}={vv}" for kk, vv in v.items()
                        if kk not in ("wall_s", "steal_pct"))
            + " |" for k, v in ops.items())
        with open(md, "a") as f:
            f.write(f"""
## Lifecycle endurance run {time.strftime('%Y-%m-%d %H:%M:%S')}

- {args.events:,} events, {args.epochs} epochs, {args.partitions} partitions, {args.cpus} cpus; {n_poison} poison rows injected ({POISON_PER_EPOCH}/epoch)
- one shared fixture: dead-letter + delta replay -> secondary-index build -> drop-malformed log compaction -> DLQ requeue -> fresh replay from the compacted log

| op | wall s | steal % | detail |
|---|---|---|---|
{rows}

- compacted_replay row-count parity: fresh lake sees {in2:,} input events (span retention + requeued epoch + uncompacted tail) and quarantines 0 from the span
""")
    shutil.rmtree(work, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
