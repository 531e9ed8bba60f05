"""Point-in-time reconstruction (S9/J4) — the HBase-snapshotter analog.

The reference runs a Spark job that scans every cell version of the
versioned HBase table and keeps, per (rowkey, column), the latest version
with timestamp ≤ T, materializing the row images into a Hive table
(/root/reference/README.md:22-23). Here the cell versions ARE the
changelog, so time travel is the same replay with a ``ts <= T`` predicate
pushed ahead of the identical grouped-LWW reduction:

    read epochs → augment → filter(ts <= T) → hash partition → LWW → table
"""

from __future__ import annotations

import ray.data as rd

from rayrep.pipeline import replay_batch


def as_of(
    changelog_dir: str,
    ts_us: int,
    num_partitions: int = 32,
    concurrency: int | None = None,
) -> rd.Dataset:
    """Reconstruct the lake table as of event-time ``ts_us`` (inclusive)."""
    return replay_batch(changelog_dir, num_partitions=num_partitions, as_of_ts_us=ts_us,
                        concurrency=concurrency)


def snapshot_to_parquet(changelog_dir: str, ts_us: int, out_dir: str, **kw) -> None:
    """Materialize the as-of table (the "write a Hive table" step)."""
    as_of(changelog_dir, ts_us, **kw).write_parquet(out_dir)
