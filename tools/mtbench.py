"""Multi-table replay A/B: one-pass replay_multi vs per-table filtered
replay() on the SAME two-table changelog.

The quantity being measured is read/shuffle amplification: replicating T
tables by running the single-table engine T times with a table filter
reads the whole log T times and discards (T-1)/T of it each pass, while
``replay_multi`` reads once and routes everything through one composite
exchange.  Equality of the resulting lakes is checked with
``check.diff_lakes`` (both paths pin the same partition count, so the
diff is aligned).

Usage::

    python tools/mtbench.py [--events 5000000] [--cpus 32] [--no-record]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROOT = "/tmp/rayrep_bench"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=5_000_000)
    ap.add_argument("--tables", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa
    import pyarrow.compute as pc

    from rayrep.check import diff_lakes
    from rayrep.config import EngineConfig
    from rayrep.gen import GenSpec, write_changelog
    from rayrep.hashing import stable_hash_strings
    from rayrep.multitable import replay_multi
    from rayrep.pipeline import replay
    from rayrep.schema import CANONICAL_SCHEMA_V1, SchemaVersion

    os.makedirs(BENCH_ROOT, exist_ok=True)
    base_cl = os.path.join(BENCH_ROOT, f"cl-mtb-{args.events}-e{args.epochs}")
    if not os.path.exists(os.path.join(base_cl, "epoch-00000")):
        write_changelog(base_cl, GenSpec(
            seed=42, n_events=args.events,
            n_conversations=max(50, args.events // 50),
            n_epochs=args.epochs, zipf_a=1.1))

    # tag each event with its table (hash(conv_id) % 2) — one streaming
    # pass, cached next to the base changelog
    import ray.data as rd

    T = args.tables
    names = [f"t{i}" for i in range(T)]
    pool = None  # bound below, captured by tag()
    tagged_cl = base_cl + f"-tagged{T}"
    if not os.path.exists(os.path.join(tagged_cl, "_COMPLETE")):
        import glob as _g
        import uuid as _u

        import pyarrow.parquet as pq

        pool = pa.array(names)

        def tag(t: pa.Table, edir: str) -> pa.Table:
            # DDL rows dropped: this A/B measures the data path; both
            # paths then replay the identical stream under schema v1
            t = t.filter(pc.not_equal(t["op"], "DDL"))
            h = stable_hash_strings(t.column("conv_id"))
            t = t.append_column(
                "table", pool.take(pa.array((h % T).astype("int64"))))
            os.makedirs(edir, exist_ok=True)
            fp = os.path.join(edir, f"part-{_u.uuid4().hex}.parquet")
            pq.write_table(t, fp + ".tmp")
            os.replace(fp + ".tmp", fp)
            return pa.table({"n": pa.array([t.num_rows], pa.int64())})

        for ed in sorted(_g.glob(os.path.join(base_cl, "epoch-*"))):
            out_ed = os.path.join(tagged_cl, os.path.basename(ed))
            rd.read_parquet(ed).map_batches(
                tag, fn_kwargs={"edir": out_ed},
                batch_format="pyarrow").take_all()
        with open(os.path.join(tagged_cl, "_COMPLETE"), "w") as f:
            f.write("ok\n")

    sv = SchemaVersion(1, CANONICAL_SCHEMA_V1).to_json()
    run = str(int(time.time()))
    scratch = os.path.join(BENCH_ROOT, f"mtb-{run}-{os.getpid()}")

    # warmup (worker spawn + page cache), untimed
    replay_multi(tagged_cl, {
        n: {"lake_dir": os.path.join(scratch, f"warm_{n}"),
            "schema_json": sv} for n in names
    }, num_partitions=args.partitions, end_epoch=0)

    t0 = time.perf_counter()
    multi = {
        n: {"lake_dir": os.path.join(scratch, f"multi_{n}"),
            "schema_json": sv} for n in names
    }
    replay_multi(tagged_cl, multi, num_partitions=args.partitions)
    t_multi = time.perf_counter() - t0

    t0 = time.perf_counter()
    singles = {}
    for n in names:
        lake = os.path.join(scratch, f"single_{n}")
        singles[n] = lake
        replay(EngineConfig(
            changelog_dir=tagged_cl, lake_dir=lake,
            num_partitions=args.partitions, delta_output=False,
            initial_schema_json=sv, table_filter_regex=f"^{n}$"))
    t_single = time.perf_counter() - t0

    diffs = {n: diff_lakes(multi[n]["lake_dir"], singles[n],
                           distributed=True).num_rows for n in names}
    result = {
        "metric": "multi-table one-pass vs per-table filtered replays",
        "events": args.events, "tables": T, "num_cpus": args.cpus,
        "partitions": args.partitions,
        "sec_multi_one_pass": round(t_multi, 3),
        "sec_two_filtered_replays": round(t_single, 3),
        "speedup": round(t_single / t_multi, 3),
        "lakes_equal": all(v == 0 for v in diffs.values()),
        "diff_rows": diffs,
    }
    print(json.dumps(result))
    if not args.no_record:
        with open("BENCH/BASELINE.md", "a") as f:
            f.write(
                f"\n## Multi-table A/B {time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
                f"- {args.events:,} events, {T} tables, {args.cpus} cpus: "
                f"one-pass replay_multi {result['sec_multi_one_pass']}s vs "
                f"two filtered replay() passes "
                f"{result['sec_two_filtered_replays']}s "
                f"(**{result['speedup']}x**); lakes bit-equal per "
                f"diff_lakes: {result['lakes_equal']}\n"
                f"- at T tables the filtered path reads the log T times; "
                f"the one-pass path is read-once by construction\n"
                f"- table-filter regex: ^{{name}}$ per pass\n")
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
