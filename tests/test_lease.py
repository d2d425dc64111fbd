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
