"""Distributed execution of per-partition lake maintenance.

``compact_lake`` and ``purge_lake`` are driver-side loops — fine for
small lakes, wrong at 10^3-partition scale where maintenance should be
one Ray task per partition (same granularity as the applier). This
module is the shared fan-out: each task runs a caller-supplied
per-partition function (fold + rewrite + manifest save — all
manifest-atomic, so tasks are independent and retry-safe) and the
driver only aggregates the returned counters.

Kept separate from ``compact.py``/``retention.py`` so those stay
importable and runnable without a Ray session (the CLI's Ray-free
subcommand path)."""

from __future__ import annotations

from typing import Callable


def run_per_partition(
    fn: Callable[[int], dict],
    part_ids: list[int],
    distributed: bool,
    num_cpus: int = 1,
) -> list[dict]:
    """Run ``fn(part_id) -> counters`` over every partition — serially on
    the driver, or as one Ray task per partition when ``distributed``.
    ``fn`` must be self-contained and idempotent (manifest-atomic): a
    task retry re-runs one partition's maintenance harmlessly."""
    if not distributed:
        return [fn(p) for p in part_ids]
    import ray

    task = ray.remote(num_cpus=num_cpus)(fn)
    return ray.get([task.remote(p) for p in part_ids])
