"""Single-writer lake lease with fencing tokens (HA / leader election).

Reference analog: mysql-time-machine runs replicators under ZooKeeper
leader election so exactly one applier writes HBase at a time, and a new
leader resumes from the pGTID safe checkpoint (README.md:17-20; position
in ZooKeeper, CHANGES.txt:74,82). This sandbox has no ZK and Ray core
deliberately ships no lock service, so the lake's own shared filesystem
— the one medium every writer already depends on — is the coordination
point. A lease file plus a monotonically increasing *fencing token*
reproduces the operational contract:

- **Mutual exclusion (cooperative):** ``acquire()`` fails with
  ``LeaseHeldError`` while another writer's lease is fresh (renewed
  within ``ttl_s``).
- **Failover:** a crashed leader never releases; its lease simply goes
  stale. A successor acquires after TTL expiry, or immediately with
  ``takeover=True`` — the explicit "I have been elected" operator /
  supervisor action (ZK session-expiry analog).
- **Fencing:** every acquisition increments the token. The replay
  driver re-checks the on-disk token at each round barrier and a
  fenced-out zombie fails with ``LeaseLostError`` before its next
  commit; additionally each partition manifest is stamped with the
  writer's token and ``PartitionManifest.save`` refuses to let a
  lower-token writer overwrite a higher-token commit
  (``StaleWriterError``) — the Kafka-style "reject smaller epoch"
  backstop for the window between two barrier checks.

Token uniqueness under concurrent acquisition does not rely on reading
``lease.json`` race-free: each acquirer must *claim* its token by
``os.link``-ing a unique temp file to ``claims/t{token}`` — link is
atomic on POSIX (EEXIST = lost the race), so two racing takeovers can
never mint the same token. ``lease.json`` itself is last-writer-wins,
which is safe because tokens are unique and totally ordered: whoever
holds the *lower* token observes a foreign token at its next
``check()`` and stops, and the higher holder's next renew re-asserts.

Storage assumption (named, and pluggable): the default
:class:`FileLeaseStore` relies on POSIX semantics of the lake
filesystem — ``os.replace`` is an atomic last-writer-wins publish and
``os.link`` is an atomic test-and-set. That holds on local disks and on
NFS with close-to-open consistency, but NOT on S3-style object stores,
where "rename" is copy+delete and creates no mutual exclusion. For such
backends implement :class:`LeaseStore` over a primitive that IS atomic
there (S3 conditional PUT ``If-None-Match:*``, DynamoDB conditional
writes, etcd/ZK) and pass it to :func:`acquire` — the token-ordering
protocol above is storage-agnostic and unchanged.

Limitations (documented, not hidden): fencing binds only writers that
use the lease — a ``lease_token=0`` writer (the default, lease
disabled) bypasses the manifest guard for compatibility with
maintenance tools and legacy lakes. And as with any lease scheme
without a fully serialized log, a zombie paused *inside* the
check→rename window of a single partition commit can still interleave;
the manifest token guard closes that for any partition the successor
has already stamped, and the deterministic-overwrite apply contract
makes a same-epoch double write content-identical.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from dataclasses import asdict, dataclass, fields



class LeaseHeldError(RuntimeError):
    """Another writer holds a live lease on this lake."""


class LeaseLostError(RuntimeError):
    """This writer's lease was taken over (fenced) or expired+reclaimed."""


def default_owner() -> str:
    return f"{socket.gethostname()}:{os.getpid()}"


@dataclass
class LeaseRecord:
    token: int
    owner: str
    acquired_ts_us: int
    renewed_ts_us: int
    ttl_s: float

    def age_s(self, now: float | None = None) -> float:
        return (now if now is not None else time.time()) - self.renewed_ts_us / 1e6

    def expired(self, now: float | None = None) -> bool:
        return self.age_s(now) >= self.ttl_s


def lease_path(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", "lease.json")


def _write_lease(lake_dir: str, rec: LeaseRecord) -> None:
    """Atomic last-writer-wins publish. Unlike manifests (one writer per
    partition by construction), lease.json is contended BY DESIGN during
    an election, so the temp name must be unique per writer — a shared
    ``.tmp`` would let one acquirer rename the other's file away."""
    path = lease_path(lake_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(rec), f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _claims_dir(lake_dir: str) -> str:
    return os.path.join(lake_dir, "_manifests", "lease_claims")


def read_lease(lake_dir: str) -> LeaseRecord | None:
    p = lease_path(lake_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        d = json.load(f)
    known = {f.name for f in fields(LeaseRecord)}
    return LeaseRecord(**{k: v for k, v in d.items() if k in known})


def _claim_token(lake_dir: str, token: int, owner: str) -> bool:
    """Atomically claim ``token`` for ``owner``. True iff we won it.

    ``os.link`` of a unique temp name onto the canonical claim name is
    the POSIX atomic test-and-set: exactly one linker succeeds per
    target name, even across hosts on a shared filesystem.
    """
    d = _claims_dir(lake_dir)
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(owner)
    try:
        os.link(tmp, os.path.join(d, f"t{token:020d}"))
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _max_claimed(lake_dir: str) -> int:
    """Highest token ever claimed. The claims directory — not lease.json,
    which a clean release removes — is the durable token frontier, so
    tokens are monotone for the life of the lake even across releases."""
    d = _claims_dir(lake_dir)
    if not os.path.isdir(d):
        return 0
    toks = [int(n[1:]) for n in os.listdir(d) if n.startswith("t") and n[1:].isdigit()]
    return max(toks, default=0)


def _gc_claims(lake_dir: str, keep_from_token: int) -> None:
    """Drop claim markers older than ``keep_from_token`` − 8 (any token
    that far below the frontier can never be claimed again — acquirers
    always start from the current lease's token)."""
    d = _claims_dir(lake_dir)
    if not os.path.isdir(d):
        return
    for name in os.listdir(d):
        if name.startswith("t") and name[1:].isdigit():
            if int(name[1:]) < keep_from_token - 8:
                try:
                    os.unlink(os.path.join(d, name))
                except OSError:
                    pass


class LeaseStore:
    """Pluggable storage for the lease protocol (strategy interface).

    Implementations need exactly two atomic primitives from their
    backend: a last-writer-wins ``publish`` and a test-and-set
    ``claim_token`` (create-if-absent). Everything else — token
    ordering, TTL, fencing, reassert loops — lives in the protocol
    functions and is backend-agnostic. The default is
    :class:`FileLeaseStore` (POSIX rename + link); an object-store
    deployment supplies e.g. a conditional-PUT implementation and
    passes it to :func:`acquire`.
    """

    def read(self) -> LeaseRecord | None:  # pragma: no cover - interface
        raise NotImplementedError

    def publish(self, rec: LeaseRecord) -> None:  # pragma: no cover
        raise NotImplementedError

    def claim_token(self, token: int, owner: str) -> bool:  # pragma: no cover
        raise NotImplementedError

    def max_claimed(self) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def gc_claims(self, keep_from_token: int) -> None:  # pragma: no cover
        raise NotImplementedError

    def remove_if_token(self, token: int | None) -> bool:
        """Best-effort cooperative removal (release / break). ``None``
        removes unconditionally. Returns True iff something was removed."""
        raise NotImplementedError  # pragma: no cover - interface

    def describe(self) -> str:  # pragma: no cover - interface
        raise NotImplementedError


class FileLeaseStore(LeaseStore):
    """The shared-filesystem default (see the module docstring for the
    POSIX atomicity assumption this relies on)."""

    def __init__(self, lake_dir: str):
        self.lake_dir = lake_dir

    def read(self) -> LeaseRecord | None:
        return read_lease(self.lake_dir)

    def publish(self, rec: LeaseRecord) -> None:
        _write_lease(self.lake_dir, rec)

    def claim_token(self, token: int, owner: str) -> bool:
        return _claim_token(self.lake_dir, token, owner)

    def max_claimed(self) -> int:
        return _max_claimed(self.lake_dir)

    def gc_claims(self, keep_from_token: int) -> None:
        _gc_claims(self.lake_dir, keep_from_token)

    def remove_if_token(self, token: int | None) -> bool:
        if token is not None:
            cur = read_lease(self.lake_dir)
            if cur is None or cur.token != token:
                return False
        try:
            os.unlink(lease_path(self.lake_dir))
            return True
        except FileNotFoundError:
            return False

    def describe(self) -> str:
        return f"lake {self.lake_dir}"


class WriterLease:
    """A held lease. Use :func:`acquire` to obtain one."""

    def __init__(self, lake_dir: str, record: LeaseRecord,
                 store: LeaseStore | None = None):
        self.lake_dir = lake_dir
        self.record = record
        self.store = store if store is not None else FileLeaseStore(lake_dir)

    @property
    def token(self) -> int:
        return self.record.token

    # ------------------------------------------------------------- checks
    def check(self) -> None:
        """Raise ``LeaseLostError`` if the stored lease is no longer ours."""
        cur = self.store.read()
        if cur is None or cur.token != self.record.token:
            raise LeaseLostError(
                f"lake {self.lake_dir}: lease token {self.record.token} "
                f"({self.record.owner}) superseded by "
                f"{'removal' if cur is None else f'token {cur.token} ({cur.owner})'}"
            )

    def renew(self) -> None:
        """Refresh the TTL clock. Checks ownership first, re-reads after
        the write, and *yields* if a higher token appears concurrently
        (lower token always loses — that is what makes last-writer-wins
        on ``lease.json`` safe)."""
        self.check()
        self.record.renewed_ts_us = int(time.time() * 1e6)
        self.store.publish(self.record)
        # same token-order discipline as acquire: yield to a HIGHER token,
        # reassert over a LOWER one that wrote after us
        for _ in range(64):
            cur = self.store.read()
            if cur is None or cur.token > self.record.token:
                raise LeaseLostError(
                    f"lake {self.lake_dir}: lease token {self.record.token} "
                    f"fenced by concurrent token "
                    f"{cur.token if cur else '<removed>'}"
                )
            if cur.token == self.record.token:
                break
            self.store.publish(self.record)
        else:  # never confirmed our token on disk: do NOT claim success
            raise LeaseLostError(
                f"lake {self.lake_dir}: could not reassert token "
                f"{self.record.token} after renew (pathological lower-token "
                "churn); treating the lease as lost"
            )

    def release(self) -> None:
        """Clean hand-off: remove the lease iff still ours. A crashed
        writer never gets here — its lease goes stale and expires."""
        self.store.remove_if_token(self.record.token)


def acquire(
    lake_dir: str,
    owner: str | None = None,
    ttl_s: float = 60.0,
    takeover: bool = False,
    store: LeaseStore | None = None,
) -> WriterLease:
    """Acquire the single-writer lease for ``lake_dir``.

    - live foreign lease + ``takeover=False`` → ``LeaseHeldError``;
    - expired / absent lease → acquired with token+1;
    - ``takeover=True`` → acquired with token+1 regardless of liveness
      (the elected-successor path; the old holder is fenced out at its
      next check/renew/commit).

    ``store`` selects the coordination backend (default: the lake
    filesystem via :class:`FileLeaseStore`; see the module docstring
    for the atomicity primitives an object-store impl must provide).
    """
    owner = owner or default_owner()
    store = store if store is not None else FileLeaseStore(lake_dir)
    for _ in range(16):  # bounded retry through claim races
        cur = store.read()
        if cur is not None and not cur.expired() and not takeover:
            raise LeaseHeldError(
                f"lake {lake_dir}: writer lease held by {cur.owner} "
                f"(token {cur.token}, renewed {cur.age_s():.1f}s ago, "
                f"ttl {cur.ttl_s}s); pass takeover=True to fence it out"
            )
        token = max(cur.token if cur is not None else 0,
                    store.max_claimed()) + 1
        if not store.claim_token(token, owner):
            continue  # lost the mint race for this token; re-read and retry
        now_us = int(time.time() * 1e6)
        rec = LeaseRecord(
            token=token, owner=owner, acquired_ts_us=now_us,
            renewed_ts_us=now_us, ttl_s=float(ttl_s),
        )
        store.publish(rec)
        # lease.json is last-writer-wins by WALL order but the fencing
        # contract is by TOKEN order: a concurrent HIGHER token fences us
        # (raise), while a concurrent LOWER token that happened to write
        # after us must not shadow us — reassert our record until the file
        # shows our token or a higher one. The lower racer's own re-read
        # then sees the higher token and raises, so this converges (only
        # the max token ever rewrites).
        for _ in range(64):
            latest = store.read()
            if latest is None or latest.token > token:
                raise LeaseHeldError(
                    f"lake {lake_dir}: lost acquisition race to token "
                    f"{latest.token if latest else '<removed>'}"
                )
            if latest.token == token:
                break
            store.publish(rec)
        else:  # never confirmed our token on disk: do NOT return a lease
            raise LeaseHeldError(
                f"lake {lake_dir}: could not assert minted token {token} "
                "(pathological lower-token churn); acquisition failed"
            )
        store.gc_claims(token)
        return WriterLease(lake_dir, rec, store=store)
    raise LeaseHeldError(f"lake {lake_dir}: could not mint a lease token (claim contention)")


def status(lake_dir: str, store: LeaseStore | None = None) -> dict:
    """Operator view (CLI ``lease status``)."""
    cur = (store if store is not None else FileLeaseStore(lake_dir)).read()
    if cur is None:
        return {"held": False}
    return {
        "held": not cur.expired(),
        "token": cur.token,
        "owner": cur.owner,
        "age_s": round(cur.age_s(), 3),
        "ttl_s": cur.ttl_s,
        "expired": cur.expired(),
    }


def break_lease(lake_dir: str, store: LeaseStore | None = None) -> bool:
    """Operator override (CLI ``lease break``): drop the lease record.
    The previous holder, if alive, fails its next check. Prefer
    ``takeover=True`` on the successor — it fences via token order;
    breaking merely clears the record."""
    return (store if store is not None
            else FileLeaseStore(lake_dir)).remove_if_token(None)
