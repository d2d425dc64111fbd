"""One op, one manifest — enforced (VERDICT r10 #1).

The bug class behind both the r9 unpinned read_isin/read_range race
and the r10 CoW plan/publish lost-update is a single public operation
consulting the commit-log HEAD more than once: a rival commit landing
between the two reads makes the op combine two snapshots and silently
produce wrong output. The randomized walk only catches interleavings
it happens to hit; this guard makes the NEXT violation fail loudly on
every run by counting HEAD manifest reads per public call.

Budgets (tools/audit_head_reads.py documents the measurement):
read/metadata/export paths 1 (the pin); mutations 2 (pin + _commit's
OCC conflict check, which MUST see the latest head); run_maintenance
DERIVED from the sub-ops its summary says actually ran (VERDICT r11
#6 — base advisor reads + per-sub-op declared costs, and a summary
key with no declared budget fails the guard, so a new sub-op cannot
smuggle an undeclared pin into the composite).
"""

from __future__ import annotations

from tools.audit_head_reads import (
    HeadReadCounter,
    build_fixture,
    call_surface,
)


def test_maintenance_budget_derivation():
    import pytest

    from tools.audit_head_reads import (
        MAINTENANCE_BASE_HEAD,
        maintenance_budget,
    )

    assert maintenance_budget({}) == MAINTENANCE_BASE_HEAD
    assert (
        maintenance_budget({"optimized": {"commit": "1"},
                            "cleaned_files": 3})
        == MAINTENANCE_BASE_HEAD + 2
    )
    assert (
        maintenance_budget({"column_index_compacted": ["a", "b"],
                            "folded_change_logs": 2})
        == MAINTENANCE_BASE_HEAD + 4
    )
    with pytest.raises(AssertionError, match="undeclared"):
        maintenance_budget({"brand_new_subop": 1})


def test_head_read_budget_across_public_api(spark):
    import os

    # per-process root: two pytest invocations overlapping on one
    # fixture table race each other's commits, and the loser's OCC
    # retries read HEAD extra times — a false budget violation
    t = build_fixture(spark, f"/tmp/head_read_guard_{os.getpid()}")
    ctr = HeadReadCounter()
    over: list[str] = []
    errs: list[str] = []
    for name, fn, budget in call_surface(t, spark):
        result = None
        with ctr.watch():
            try:
                result = fn()
            except Exception as e:  # noqa: BLE001 — count first
                errs.append(f"{name}: {type(e).__name__}: {e}")
                continue
        # derived budgets (run_maintenance): computed from what the
        # call REPORTS having done — an undeclared sub-op asserts
        # inside maintenance_budget, failing the test loudly
        b = budget(result) if callable(budget) else budget
        if ctr.head > b:
            over.append(f"{name}: {ctr.head} HEAD reads > budget {b}")
    assert not errs, f"surface calls failed: {errs}"
    assert not over, (
        "one-op-one-manifest violations (a rival commit between two "
        f"HEAD reads silently mixes snapshots): {over}"
    )
