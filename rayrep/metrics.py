"""Continuous metrics emission — the time-series stream a Grafana-style
consumer tails while a long ``tail`` session runs.

Reference analog: the replicator reports codahale time-series metrics
continuously (CHANGES.txt:79-80) and gates its checkpoint on them
(CHANGES.txt:113-116). The engine already rolls counters into the
atomically-committed manifests and ``metrics.json`` (the *state* view);
this module adds the *stream* view: every epoch barrier appends ONE JSON
line to ``<lake>/_manifests/metrics.jsonl`` — counters, replication-delay
gauge, wall time, cumulative totals — and maintenance events (log/lake
compactions) append their own lines. ``rayrep metrics <lake> --follow``
tails it like ``tail -f``.

Write discipline: single-writer (the replay/tail process, under its
writer lease when enabled), append + flush + fsync per line. A crash can
tear at most the final line; readers skip any line not terminated by a
newline. Delivery is AT-MOST-ONCE per barrier: the line is appended
after the manifests commit, so a crash inside that window omits the
epoch's line (a resumed replay does not re-run committed epochs). The
manifests/metrics.json are the accounting source of truth; this stream
is the observability feed.

Rotation keeps a tail-forever session's stream bounded: when the
live file would exceed ``rotate_max_bytes`` it renames to
``metrics.jsonl.1`` (replacing the previous one), so disk usage is capped
at ~2x the window regardless of session length.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Iterator

STREAM_NAME = "metrics.jsonl"


def stream_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", STREAM_NAME)


def emit(lake_dir: str, record: dict,
         rotate_max_bytes: int = 64 << 20) -> None:
    """Append one metrics line (stamps ``emitted_ts_us`` if absent)."""
    p = stream_path(lake_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    if "emitted_ts_us" not in record:
        record = {**record, "emitted_ts_us": int(time.time() * 1e6)}
    line = json.dumps(record, sort_keys=True, separators=(",", ":"),
                      default=str) + "\n"
    try:
        if (rotate_max_bytes
                and os.path.getsize(p) + len(line) > rotate_max_bytes):
            os.replace(p, p + ".1")
    except FileNotFoundError:
        pass
    try:
        # a predecessor that crashed mid-write left unterminated bytes;
        # close them off so this record starts on its own line (the torn
        # fragment stays unparseable and is skipped by readers)
        with open(p, "rb") as rf:
            rf.seek(-1, os.SEEK_END)
            if rf.read(1) != b"\n":
                line = "\n" + line
    except (FileNotFoundError, OSError):
        pass
    with open(p, "a", encoding="utf-8") as f:
        f.write(line)
        f.flush()
        os.fsync(f.fileno())


def read_stream(lake_dir: str, kind: str | None = None,
                include_rotated: bool = False) -> list[dict]:
    """All parseable lines, oldest first; a torn final line is skipped
    (the crash window is exactly one in-flight ``emit``)."""
    paths = []
    if include_rotated:
        paths.append(stream_path(lake_dir) + ".1")
    paths.append(stream_path(lake_dir))
    out: list[dict] = []
    for p in paths:
        if not os.path.exists(p):
            continue
        with open(p, encoding="utf-8") as f:
            for ln in f:
                if not ln.endswith("\n"):
                    break  # torn tail write from a crashed emitter
                try:
                    out.append(json.loads(ln))
                except json.JSONDecodeError:
                    continue  # torn pre-rotation tail preserved in .1
    if kind is not None:
        out = [r for r in out if r.get("kind") == kind]
    return out


def follow(lake_dir: str, poll_interval_s: float = 0.5,
           idle_timeout_s: float | None = None) -> Iterator[dict]:
    """Generator yielding metrics records as the live stream grows —
    the consumer side of a running ``tail`` session. Tracks rotation
    (file shrank → reopen from 0). Stops after ``idle_timeout_s`` with
    no new data (None = forever)."""
    p = stream_path(lake_dir)
    offset = 0
    buf = ""
    last_new = time.monotonic()
    while True:
        size = os.path.getsize(p) if os.path.exists(p) else 0
        if size < offset:  # rotated under us: restart at the new file
            offset, buf = 0, ""
        if size > offset:
            with open(p, encoding="utf-8") as f:
                f.seek(offset)
                chunk = f.read()
            offset += len(chunk.encode("utf-8"))
            buf += chunk
            *lines, buf = buf.split("\n")
            got = False
            for ln in lines:
                if not ln:
                    continue
                try:
                    rec = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                got = True
                yield rec
            if got:
                last_new = time.monotonic()
        if (idle_timeout_s is not None
                and time.monotonic() - last_new > idle_timeout_s):
            return
        time.sleep(poll_interval_s)
