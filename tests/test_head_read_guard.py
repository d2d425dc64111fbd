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
5 (a composite driver — each sub-op pins its own manifest).
"""

from __future__ import annotations

from tools.audit_head_reads import (
    HeadReadCounter,
    build_fixture,
    call_surface,
)


def test_head_read_budget_across_public_api(spark):
    t = build_fixture(spark, "/tmp/head_read_guard")
    ctr = HeadReadCounter()
    over: list[str] = []
    errs: list[str] = []
    for name, fn, budget in call_surface(t, spark):
        with ctr.watch():
            try:
                fn()
            except Exception as e:  # noqa: BLE001 — count first
                errs.append(f"{name}: {type(e).__name__}: {e}")
                continue
        if ctr.head > budget:
            over.append(f"{name}: {ctr.head} HEAD reads > budget {budget}")
    assert not errs, f"surface calls failed: {errs}"
    assert not over, (
        "one-op-one-manifest violations (a rival commit between two "
        f"HEAD reads silently mixes snapshots): {over}"
    )
