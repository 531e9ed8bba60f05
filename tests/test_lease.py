"""Single-writer lease + fencing (rayrep/lease.py) — the reference's
ZooKeeper leader-election/HA contract (README.md:17-20, CHANGES.txt:74,82)
on the lake's shared filesystem.

Covers: acquire/renew/release lifecycle, TTL expiry, explicit takeover
(election), atomic token minting under a thread race, the manifest-level
fencing backstop (StaleWriterError), and an end-to-end failover replay
whose post-takeover lake matches the sequential oracle.
"""

import threading
import time

import pytest

from rayrep import lease as L
from rayrep.config import EngineConfig
from rayrep.gen import GenSpec, generate_changelog, write_changelog
from rayrep.manifests import PartitionManifest, StaleWriterError
from rayrep.pipeline import final_table_pandas, replay

from .oracle import replay_oracle
from .test_replay import assert_frames_equal

SPEC = GenSpec(seed=77, n_conversations=40, max_turns=6, n_events=600, n_epochs=3)


@pytest.fixture(scope="module")
def changelog_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cl_lease"))
    write_changelog(d, SPEC)
    return d


# --------------------------------------------------------------- lifecycle
def test_acquire_renew_release(tmp_path):
    lake = str(tmp_path)
    lease = L.acquire(lake, owner="a", ttl_s=60)
    assert lease.token == 1
    assert L.status(lake)["held"] and L.status(lake)["owner"] == "a"
    lease.check()
    before = lease.record.renewed_ts_us
    lease.renew()
    assert lease.record.renewed_ts_us >= before
    lease.release()
    assert L.status(lake) == {"held": False}
    # re-acquire after clean release mints the NEXT token (monotone forever)
    lease2 = L.acquire(lake, owner="b", ttl_s=60)
    assert lease2.token == 2


def test_live_lease_blocks_and_ttl_expiry(tmp_path):
    lake = str(tmp_path)
    a = L.acquire(lake, owner="a", ttl_s=0.2)
    with pytest.raises(L.LeaseHeldError):
        L.acquire(lake, owner="b", ttl_s=60)
    time.sleep(0.25)  # a's lease goes stale (crashed-writer model)
    assert L.status(lake)["expired"]
    b = L.acquire(lake, owner="b", ttl_s=60)
    assert b.token == a.token + 1
    with pytest.raises(L.LeaseLostError):
        a.check()
    with pytest.raises(L.LeaseLostError):
        a.renew()
    b.renew()  # the successor is unaffected


def test_takeover_fences_live_holder(tmp_path):
    lake = str(tmp_path)
    a = L.acquire(lake, owner="a", ttl_s=3600)  # very much alive
    b = L.acquire(lake, owner="b", ttl_s=3600, takeover=True)
    assert b.token == a.token + 1
    with pytest.raises(L.LeaseLostError):
        a.renew()  # the fenced writer must stop at its next barrier
    b.check()


def test_break_lease(tmp_path):
    lake = str(tmp_path)
    a = L.acquire(lake, owner="a", ttl_s=3600)
    assert L.break_lease(lake)
    assert not L.break_lease(lake)  # idempotent
    with pytest.raises(L.LeaseLostError):
        a.check()


# ------------------------------------------------------------ token minting
def test_concurrent_takeover_mints_unique_tokens(tmp_path):
    """8 racing takeovers: tokens must be unique (os.link claim is the
    atomic test-and-set) and exactly one holder survives check()."""
    lake = str(tmp_path)
    L.acquire(lake, owner="seed", ttl_s=3600)
    won: list[L.WriterLease] = []
    errs: list[Exception] = []
    lock = threading.Lock()

    def go(i):
        try:
            lz = L.acquire(lake, owner=f"w{i}", ttl_s=3600, takeover=True)
            with lock:
                won.append(lz)
        except L.LeaseHeldError as e:
            with lock:
                errs.append(e)

    ts = [threading.Thread(target=go, args=(i,)) for i in range(8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    tokens = [w.token for w in won]
    assert len(set(tokens)) == len(tokens), "duplicate fencing token minted"
    survivors = []
    for w in won:
        try:
            w.check()
            survivors.append(w)
        except L.LeaseLostError:
            pass
    assert len(survivors) == 1
    assert survivors[0].token == max(tokens)


# ------------------------------------------------------------ manifest fence
def test_manifest_fencing_refuses_lower_token(tmp_path):
    lake = str(tmp_path)
    m = PartitionManifest(part_id=3, epoch=5, last_seq=100, lease_token=7)
    m.save(lake)
    zombie = PartitionManifest(part_id=3, epoch=6, last_seq=120, lease_token=5)
    with pytest.raises(StaleWriterError):
        zombie.save(lake)
    # equal or higher token commits fine; token-0 (lease disabled) bypasses
    PartitionManifest(part_id=3, epoch=6, last_seq=120, lease_token=7).save(lake)
    PartitionManifest(part_id=3, epoch=7, last_seq=130, lease_token=9).save(lake)
    PartitionManifest(part_id=3, epoch=8, last_seq=140, lease_token=0).save(lake)
    assert PartitionManifest.load(lake, 3).epoch == 8


# --------------------------------------------------------------- leased tail
def test_tail_holds_one_lease_for_whole_session(changelog_dir, tmp_path):
    """Tail mode holds ONE lease for its lifetime: the same token stays
    held through apply and idle polls (renewed each poll), a concurrent
    non-takeover acquire is refused mid-tail, and the lease is released
    on clean (idle-timeout) exit."""
    from rayrep.pipeline import final_table_pandas, tail

    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=changelog_dir, lake_dir=lake,
                       num_partitions=4, applier_concurrency=2,
                       writer_lease=True, lease_owner="tailer")
    observed: list[int] = []
    refused = []
    done = threading.Event()

    def watcher():
        while not done.is_set():
            st = L.status(lake)
            if st.get("held"):
                observed.append(st["token"])
                if not refused:
                    try:
                        L.acquire(lake, owner="intruder", ttl_s=60)
                    except L.LeaseHeldError as e:
                        refused.append(e)
            time.sleep(0.1)

    th = threading.Thread(target=watcher)
    th.start()
    try:
        res = tail(cfg, poll_interval_s=0.3, idle_timeout_s=2.0)
    finally:
        done.set()
        th.join()
    assert observed and len(set(observed)) == 1, observed  # one token, held
    assert refused, "intruder acquire was never refused mid-tail"
    assert L.status(lake) == {"held": False}  # clean exit released
    oracle_df, octr = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)
    assert res["totals"]["input_rows"] == octr["input_rows"]


def test_tail_fenced_by_takeover_stops(changelog_dir, tmp_path):
    """A successor's takeover mid-tail fences the running tailer: it
    raises LeaseLostError at its next renew instead of double-writing,
    and the successor converges the lake (ZK session-expiry analog)."""
    from rayrep.pipeline import final_table_pandas, replay as _replay, tail

    lake = str(tmp_path / "lake")
    cfg = EngineConfig(changelog_dir=changelog_dir, lake_dir=lake,
                       num_partitions=4, applier_concurrency=2,
                       writer_lease=True, lease_owner="old-tailer")
    taken = {}

    def takeover():
        # wait until the tailer actually holds the lease, then fence it
        for _ in range(200):
            if L.status(lake).get("held"):
                break
            time.sleep(0.1)
        time.sleep(1.0)
        taken["lease"] = L.acquire(lake, owner="new-tailer", ttl_s=3600,
                                   takeover=True)

    th = threading.Thread(target=takeover)
    th.start()
    with pytest.raises(L.LeaseLostError):
        tail(cfg, poll_interval_s=0.3, idle_timeout_s=30.0)
    th.join()
    # the successor finishes the job under its own (held) lease
    cfg_b = EngineConfig(changelog_dir=changelog_dir, lake_dir=lake,
                         num_partitions=4, applier_concurrency=2)
    _replay(cfg_b, _lease=taken["lease"])
    taken["lease"].release()
    oracle_df, _ = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(lake), oracle_df)


# ----------------------------------------------------------------- failover
def test_replay_failover_matches_oracle(changelog_dir, tmp_lake):
    """Writer A replays epoch 0 under a lease and 'crashes' (stale lease
    left behind, simulated by re-acquiring as a dead owner). A successor
    without takeover is refused; the elected successor (takeover=True)
    fences A, resumes from the manifests, and the final lake matches the
    sequential oracle. A's later zombie commit attempt is refused."""
    base = dict(changelog_dir=changelog_dir, lake_dir=tmp_lake,
                num_partitions=8, applier_concurrency=2,
                augmenter_concurrency=2)
    cfg_a = EngineConfig(**base, writer_lease=True, lease_owner="writer-a")
    replay(cfg_a, end_epoch=0)  # releases cleanly at return
    # simulate the crash window: A's lease is live-but-abandoned
    dead = L.acquire(tmp_lake, owner="writer-a", ttl_s=3600)
    with pytest.raises(L.LeaseHeldError):
        replay(EngineConfig(**base, writer_lease=True, lease_owner="writer-b"))
    cfg_b = EngineConfig(**base, writer_lease=True, lease_owner="writer-b",
                         lease_takeover=True)
    replay(cfg_b)
    # the zombie is fenced at both layers
    with pytest.raises(L.LeaseLostError):
        dead.renew()
    m0 = PartitionManifest.load(tmp_lake, 0)
    assert m0.lease_token > dead.token  # successor's stamp is on the lake
    zombie = PartitionManifest(part_id=0, epoch=m0.epoch + 1,
                               last_seq=m0.last_seq,
                               lease_token=dead.token)
    with pytest.raises(StaleWriterError):
        zombie.save(tmp_lake)
    oracle_df, oracle_ctr = replay_oracle(generate_changelog(SPEC))
    assert_frames_equal(final_table_pandas(tmp_lake), oracle_df)


class _MemCASStore:
    """In-memory mock of an object-store LeaseStore: `publish` is a plain
    last-writer-wins put, `claim_token` a conditional create-if-absent
    (the S3 If-None-Match / DynamoDB attribute_not_exists analog). No
    filesystem involvement at all — proves the token-ordering protocol
    is storage-agnostic."""

    def __init__(self):
        from rayrep.lease import LeaseStore  # interface sanity

        self._lease = None
        self._claims = {}
        assert isinstance(self, object) and LeaseStore

    def read(self):
        return None if self._lease is None else type(self._lease)(
            **{f: getattr(self._lease, f) for f in
               ("token", "owner", "acquired_ts_us", "renewed_ts_us",
                "ttl_s")})

    def publish(self, rec):
        self._lease = rec

    def claim_token(self, token, owner):
        if token in self._claims:
            return False
        self._claims[token] = owner
        return True

    def max_claimed(self):
        return max(self._claims, default=0)

    def gc_claims(self, keep_from_token):
        for t in [t for t in self._claims if t < keep_from_token - 8]:
            del self._claims[t]

    def remove_if_token(self, token):
        if self._lease is None:
            return False
        if token is not None and self._lease.token != token:
            return False
        self._lease = None
        return True

    def describe(self):
        return "mem-cas"


def test_cas_store_acquire_renew_fence(tmp_path):
    """The full lease lifecycle over a CAS backend with no filesystem:
    acquire -> renew -> takeover fences the old holder -> release."""
    from rayrep import lease as lease_mod

    store = _MemCASStore()
    lake = str(tmp_path / "lake")  # never written by the store
    a = lease_mod.acquire(lake, owner="w1", ttl_s=60, store=store)
    assert a.token == 1 and store._lease.owner == "w1"
    a.renew()  # refreshes TTL through the store
    # a second writer without takeover is refused by the live lease
    with pytest.raises(lease_mod.LeaseHeldError):
        lease_mod.acquire(lake, owner="w2", ttl_s=60, store=store)
    # elected successor fences w1 out
    b = lease_mod.acquire(lake, owner="w2", ttl_s=60, takeover=True,
                          store=store)
    assert b.token == 2
    with pytest.raises(lease_mod.LeaseLostError):
        a.renew()
    with pytest.raises(lease_mod.LeaseLostError):
        a.check()
    # w1's stale release is a no-op; w2's release clears the record
    a.release()
    assert store.read() is not None and store.read().token == 2
    b.release()
    assert store.read() is None
    # token monotonicity survives the release (claims are the frontier)
    c = lease_mod.acquire(lake, owner="w3", ttl_s=60, store=store)
    assert c.token == 3
    # nothing ever touched the filesystem
    import os as _os

    assert not _os.path.exists(lake)
