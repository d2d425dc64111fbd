"""Advisory commit lease (r15): OCC fairness escalation after the
long-horizon soak starved writers under pure immediate-retry OCC.
The lease is ADVISORY — correctness stays with the hard-link child-id
claim — so these tests pin (a) the acquire/expiry/takeover protocol,
(b) publish yielding to a live foreign lease, (c) retry_commit's
escalation + release discipline."""

from __future__ import annotations

import threading
import time

import pytest
from pyspark.sql import Row

from hudi_glue_spark.table import KeyedTable
from hudi_glue_spark.table import manifest as M


def test_acquire_release_and_expiry(tmp_path):
    root = str(tmp_path / "t")
    import os

    os.makedirs(root)
    assert M.acquire_lease(root, "tokA", ttl_s=60)
    assert M.acquire_lease(root, "tokA", ttl_s=60)  # re-entrant
    # same thread holds it → not foreign
    assert not M.foreign_lease_live(root)
    # a live lease blocks a different token
    assert not M.acquire_lease(root, "tokB", ttl_s=60)
    M.release_lease(root, "tokA")
    assert M.read_lease(root) is None
    # expiry: a dead lease is taken over (guarded unlink on age)
    assert M.acquire_lease(root, "tokC", ttl_s=0.2)
    time.sleep(0.35)
    assert M.acquire_lease(root, "tokD", ttl_s=60)
    assert M.read_lease(root)["token"] == "tokD"
    M.release_lease(root, "tokD")


def test_publish_yields_to_foreign_lease(spark, tmp_path):
    root = str(tmp_path / "t")
    t = KeyedTable(root, key="pk", precombine="v")
    t.bulk_insert(spark.createDataFrame([Row(pk=1, v=1.0)]))
    # a DIFFERENT THREAD takes the lease (thread-local holder map:
    # this thread is not the holder even in the same process)
    ok = {}
    th = threading.Thread(
        target=lambda: ok.setdefault(
            "got", M.acquire_lease(root, "rival", ttl_s=60)
        )
    )
    th.start()
    th.join()
    assert ok["got"]
    with pytest.raises(M.ConcurrentCommitError, match="lease"):
        t.upsert(spark.createDataFrame([Row(pk=1, v=2.0)]))
    M.release_lease(root, "rival")
    t.upsert(spark.createDataFrame([Row(pk=1, v=3.0)]))
    assert {r.v for r in t.read(spark).collect()} == {3.0}


def test_retry_commit_escalates_to_lease_and_releases(spark, tmp_path):
    root = str(tmp_path / "t")
    t = KeyedTable(root, key="pk", precombine="v")
    t.bulk_insert(spark.createDataFrame([Row(pk=1, v=1.0)]))

    state = {"fails": 4, "lease_seen_at": None}

    def flaky():
        if state["fails"] > 0:
            state["fails"] -= 1
            if M.read_lease(root) is not None:
                state.setdefault("seen", []).append(4 - state["fails"])
            raise M.ConcurrentCommitError("simulated")
        # by the post-escalation attempt the lease must be held
        state["lease_seen_at"] = M.read_lease(root)
        return "done"

    out = t.retry_commit(
        flaky, retries=10, backoff_s=0.001, lease_after=2
    )
    assert out == "done"
    assert state["lease_seen_at"] is not None  # escalated before win
    assert M.read_lease(root) is None  # released on exit
    # budget exhaustion releases too, and re-raises
    state["fails"] = 99
    with pytest.raises(M.ConcurrentCommitError):
        t.retry_commit(
            flaky, retries=3, backoff_s=0.001, lease_after=2
        )
    assert M.read_lease(root) is None
    # lease_after<=0 disables escalation entirely
    state["fails"] = 2
    state["lease_seen_at"] = "sentinel"

    def flaky2():
        if state["fails"] > 0:
            state["fails"] -= 1
            raise M.ConcurrentCommitError("x")
        state["lease_seen_at"] = M.read_lease(root)
        return 1

    t.retry_commit(flaky2, retries=10, backoff_s=0.001, lease_after=0)
    assert state["lease_seen_at"] is None


def test_publish_unblocks_after_holder_crash(spark, tmp_path):
    """A crashed holder never releases — the TTL is the ONLY unblock
    path, and it must work end-to-end through a real publish: after
    expiry an upsert succeeds with NO release call (the live-lease
    yield itself is pinned by test_publish_yields_to_foreign_lease).
    Also: validate()/clean() must tolerate the abandoned lease file
    (it is engine metadata, not orphan debris)."""
    root = str(tmp_path / "t")
    t = KeyedTable(root, key="pk", precombine="v")
    t.bulk_insert(spark.createDataFrame([Row(pk=1, v=1.0)]))
    th = threading.Thread(
        target=lambda: M.acquire_lease(root, "crashed", ttl_s=0.5)
    )
    th.start()
    th.join()
    assert M.read_lease(root)["token"] == "crashed"
    time.sleep(0.6)
    t.upsert(spark.createDataFrame([Row(pk=1, v=3.0)]))  # no release
    assert {r.v for r in t.read(spark).collect()} == {3.0}
    assert t.validate() == []
    t.clean(retain_commits=1, orphan_grace_s=0.0)
    assert t.validate() == []


def test_two_writers_racing_escalation_both_commit(spark, tmp_path):
    """Two threads both driving retry_commit with immediate
    escalation (lease_after=1): the lease gates publishes but must
    never deadlock or drop a commit — both writers land, and the
    lease is released when the dust settles."""
    root = str(tmp_path / "t")
    t = KeyedTable(root, key="pk", precombine="v")
    t.bulk_insert(spark.createDataFrame([Row(pk=0, v=0.0)]))
    errs: list = []

    def writer(pk: int):
        try:
            t.retry_commit(
                lambda: t.upsert(
                    spark.createDataFrame([Row(pk=pk, v=float(pk))])
                ),
                retries=30,
                backoff_s=0.01,
                lease_after=1,
                lease_ttl_s=10.0,
            )
        except Exception as e:  # noqa: BLE001 — recorded for assert
            errs.append(e)

    ths = [threading.Thread(target=writer, args=(i,)) for i in (1, 2)]
    for th in ths:
        th.start()
    for th in ths:
        th.join(timeout=120)
        assert not th.is_alive(), "writer deadlocked"
    assert errs == []
    assert {r.pk for r in t.read(spark).collect()} == {0, 1, 2}
    assert M.read_lease(root) is None or not M.foreign_lease_live(root)
