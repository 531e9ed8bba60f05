"""Endurance run: a long multi-round replay as 10^10-scale evidence.

Replays an N-event (default 100M — 5x the bench changelog) zipf-skewed
changelog through the full engine in per-round commits and records what
the 10^10 design point actually depends on:

- sustained events/sec over the whole run (not a warm 20M burst);
- per-round wall times staying FLAT as the lake's converged state grows
  (the O(delta) apply path — a state-proportional regression shows up as
  monotonically growing rounds);
- bounded driver RSS (nothing corpus-sized lands on the driver).

Usage::

    python tools/endurance.py [--events 100000000] [--epochs 20]
                              [--epochs-per-round 4] [--partitions 64]

Appends a section to BENCH/BASELINE.md. The changelog is cached under
/tmp/rayrep_bench (content-keyed by its spec) and reused across runs.
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_ROOT = "/tmp/rayrep_bench"


def steal_pct() -> float:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts[:8]]
    return 100.0 * vals[7] / max(1, sum(vals))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=100_000_000)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--epochs-per-round", type=int, default=4)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--no-record", action="store_true")
    ap.add_argument("--cells", action="store_true",
                    help="changed-cells mode: 50%% of U events carry only "
                         "changed columns; per-cell LWW + version-"
                         "preserving prune compaction every 4 rounds — "
                         "flat rounds prove the pruned chain stays "
                         "bounded as the lake converges")
    ap.add_argument("--generate-only", action="store_true",
                    help="internal: build the changelog cache and exit")
    args = ap.parse_args()

    cl = os.path.join(
        BENCH_ROOT,
        f"cl-endurance-{args.events}-e{args.epochs}"
        + ("-cells" if args.cells else ""))
    if args.generate_only:
        from rayrep.gen import GenSpec, write_changelog

        shutil.rmtree(cl, ignore_errors=True)
        write_changelog(cl, GenSpec(
            seed=42, n_events=args.events,
            n_conversations=max(2000, args.events // 50),
            max_turns=50, n_epochs=args.epochs, zipf_a=1.1,
            changed_cells_frac=0.5 if args.cells else 0.0))
        return 0
    if not os.path.exists(os.path.join(cl, "_gen_manifest.json")):
        # Generate in a CHILD process: the in-driver generator builds the
        # whole changelog as one Arrow table, so its peak RSS is
        # O(n_events) — doing it in-process would dominate ru_maxrss and
        # make the recorded "driver RSS" measure the FIXTURE GENERATOR,
        # not the replay (the round-4 200M record's 45 GiB was exactly
        # this artifact; the replay itself stays ~1 GiB).
        print(f"generating {args.events:,} events x {args.epochs} epochs "
              f"in a subprocess (cached at {cl})...", flush=True)
        t0 = time.perf_counter()
        import subprocess

        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--generate-only",
             "--events", str(args.events), "--epochs", str(args.epochs)]
            + (["--cells"] if args.cells else []),
            check=True)
        print(f"generated in {time.perf_counter() - t0:.0f}s", flush=True)

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rayrep.config import EngineConfig
    from rayrep.pipeline import replay

    lake = os.path.join(BENCH_ROOT, f"endurance-lake-{os.getpid()}")
    shutil.rmtree(lake, ignore_errors=True)
    cfg = EngineConfig(
        changelog_dir=cl, lake_dir=lake, num_partitions=args.partitions,
        epochs_per_round=args.epochs_per_round,
        changed_cells_updates=args.cells, per_cell_conflicts=args.cells)

    rounds = []
    done = 0
    t_all = time.perf_counter()
    while done < args.epochs:
        end = min(done + args.epochs_per_round, args.epochs)
        s0 = steal_pct()
        t0 = time.perf_counter()
        res = replay(cfg, end_epoch=end - 1)
        dt = time.perf_counter() - t0
        applied = sum(e["applied"] for e in res["epochs"])
        inp = sum(e["input_rows"] for e in res["epochs"])
        rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 2**20
        rounds.append({
            "epochs": f"{done}-{end - 1}", "sec": round(dt, 1),
            "input_rows": inp, "ev_per_sec": int(inp / dt),
            "driver_rss_gb": round(rss_gb, 2),
            "steal_pct": round(steal_pct() - s0, 2)})
        print(json.dumps(rounds[-1]), flush=True)
        done = end
    total = time.perf_counter() - t_all

    # resume/idempotence at scale: a re-run must find nothing to do
    t0 = time.perf_counter()
    res = replay(cfg)
    assert res["epochs"] == [], "finished replay re-ran epochs!"
    noop_s = time.perf_counter() - t0

    lake_gb = 0
    for root, _, files in os.walk(lake):
        lake_gb += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    lake_gb /= 2**30

    out = {
        "metric": "endurance replay (changed-cells)" if args.cells
                  else "endurance replay",
        "events": args.events, "epochs": args.epochs,
        "num_cpus": args.cpus, "partitions": args.partitions,
        "total_sec": round(total, 1),
        "sustained_ev_per_sec": int(args.events / total),
        "rounds": rounds, "noop_resume_sec": round(noop_s, 1),
        "lake_gb": round(lake_gb, 2),
    }
    print(json.dumps(out), flush=True)
    if not args.no_record:
        times = [r["sec"] for r in rounds]
        with open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH", "BASELINE.md"),
                "a") as f:
            f.write(
                f"\n## Endurance run"
                f"{' (changed-cells)' if args.cells else ''} "
                f"{time.strftime('%Y-%m-%d %H:%M:%S')}\n\n"
                f"- {args.events:,} events, {args.epochs} epochs, "
                f"{args.partitions} partitions, {args.cpus} cpus\n"
                f"- total {out['total_sec']}s = "
                f"**{out['sustained_ev_per_sec']:,} ev/s sustained**\n"
                f"- per-round seconds (flat ⇒ O(delta) apply): {times}\n"
                f"- per-round steal%: {[r['steal_pct'] for r in rounds]}\n"
                f"- driver RSS end: {rounds[-1]['driver_rss_gb']} GiB; "
                f"lake {out['lake_gb']} GiB; "
                f"no-op resume {out['noop_resume_sec']}s\n")
    shutil.rmtree(lake, ignore_errors=True)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
