"""Diff two rounds' driver artifacts (VERDICT r2 follow-up: keep
per-round deltas so regressions are visible query-by-query).

Usage:
    python tools/diff_rounds.py BENCH_r02.json BENCH_r03.json
    python tools/diff_rounds.py CORRECTNESS_r02.json CORRECTNESS_r03.json

BENCH files: prints per-query wall deltas over a noise threshold plus
added/removed queries. CORRECTNESS files: prints status transitions
(green/red/missing) per query.
"""

from __future__ import annotations

import json
import sys


def _status(row: dict) -> str:
    if row.get("err"):
        return f"err:{row['err']}"
    checks = [row.get("rows_match"), row.get("schema_match"), row.get("hash_match")]
    if all(checks):
        return "green"
    if checks[0] and checks[1] and row.get("hash_match") is None:
        return "rows-only"
    return "RED:" + ",".join(
        n for n, v in zip(("rows", "schema", "hash"), checks) if not v
    )


def diff_correctness(old: dict, new: dict) -> int:
    bad = 0
    for name in sorted(set(old) | set(new)):
        s_old = _status(old[name]) if name in old else "absent"
        s_new = _status(new[name]) if name in new else "absent"
        if s_old != s_new:
            marker = ""
            if "RED" in s_new or "err" in s_new or s_new == "absent":
                marker = "  <-- regression"
                bad += 1
            print(f"{name}: {s_old} -> {s_new}{marker}")
    greens = sum(1 for r in new.values() if _status(r) == "green")
    print(f"\nnew round: {greens}/{len(new)} green")
    return bad


def diff_bench(old: dict, new: dict, threshold: float = 0.3) -> int:
    # Regressions are flagged on the RIG-NORMALIZED series when both
    # sides carry it (VERDICT r11 #2: four rounds of "is this +10%
    # real?" adjudication were all environmental). A side without
    # calibration (pre-r12 artifact) falls back to raw with a notice —
    # the comparison is then rig-confounded, exactly as before.
    def series(d: dict, label: str) -> tuple[dict, bool]:
        qn = d.get("queries_normalized")
        cal = d.get("calibration")
        if qn and cal:
            return qn, True
        q = d.get("queries", {})
        f = (cal or {}).get("factor")
        if q and f:  # compact line: calibration but no per-row map
            return {k: v * f for k, v in q.items()}, True
        return q, False
    qo, o_norm = series(old, "old")
    qn, n_norm = series(new, "new")
    if o_norm and n_norm:
        print(
            f"(normalized series: old factor "
            f"{old.get('calibration', {}).get('factor')}, new factor "
            f"{new.get('calibration', {}).get('factor')})"
        )
        for label, d in (("old", old), ("new", new)):
            if (d.get("calibration") or {}).get("drift_exceeds_20pct"):
                print(
                    f"WARNING: {label} side's calibration factor is "
                    "outside ±20% of the pinned epoch — normalization "
                    "is extrapolating; re-pin CALIBRATION_REF_S "
                    "(§9j#2 protocol, docs/SCALING.md epoch log)"
                )
    else:
        print(
            "(RAW series — calibration missing on "
            + ("both sides" if not (o_norm or n_norm)
               else ("old side" if not o_norm else "new side"))
            + "; rig drift is NOT factored out)"
        )
    regress = 0
    for name in sorted(set(qo) | set(qn)):
        if name not in qo:
            print(f"{name}: added ({qn[name]:.2f}s)")
            continue
        if name not in qn:
            print(f"{name}: removed (was {qo[name]:.2f}s)")
            continue
        a, b = qo[name], qn[name]
        if abs(b - a) >= threshold and abs(b - a) / max(a, 1e-9) >= 0.25:
            tag = "slower  <-- regression" if b > a else "faster"
            if b > a:
                regress += 1
            print(f"{name}: {a:.2f}s -> {b:.2f}s  {tag}")
    print(
        f"\ntotal: {old.get('value')}s -> {new.get('value')}s "
        f"({old.get('n_queries')} -> {new.get('n_queries')} queries)"
    )
    if old.get("value_normalized") and new.get("value_normalized"):
        print(
            f"total normalized: {old['value_normalized']}s -> "
            f"{new['value_normalized']}s"
        )
    return regress


def _git_show(repo_dir: str, ref: str, name: str) -> dict | None:
    """Contents of ``name`` at commit ``ref``, or None."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", repo_dir, "show", f"{ref}:{name}"],
            capture_output=True, text=True, timeout=30,
        )
    except Exception:  # noqa: BLE001
        return None
    if out.returncode != 0:
        return None
    try:
        return json.loads(out.stdout)
    except ValueError:
        return None


def _last_touch(repo_dir: str, path: str) -> str | None:
    """The last commit that modified ``path`` (the round's close)."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", repo_dir, "log", "--format=%H", "-n1", "--",
             path],
            capture_output=True, text=True, timeout=30,
        )
    except Exception:  # noqa: BLE001
        return None
    sha = out.stdout.strip()
    return sha or None


def _load(path: str, sidecar_as_of: str | None = None):
    """Returns ``(data, resolved_sidecar_abspath | None)``.

    ``sidecar_as_of``: resolve the ``queries_full_file`` sidecar from
    git at that commit instead of the working tree — required when
    BOTH inputs sit in the repo and name the SAME sidecar file (e.g.
    BENCH_r09.json and BENCH_r10.json both point at BENCH_FULL.json):
    reading the current file for both sides silently self-compares
    and reports zero regressions (VERDICT r10 'what's wrong' #1)."""
    import os

    with open(path) as f:
        d = json.load(f)
    # bench.py's compact stdout line carries only the slowest-10; the
    # complete per-query map lives in the sidecar it names.
    full = d.get("queries_full_file") or (d.get("parsed") or {}).get(
        "queries_full_file"
    )
    if full:
        sib = os.path.join(os.path.dirname(os.path.abspath(path)), full)
        if sidecar_as_of:
            got = _git_show(os.path.dirname(sib), sidecar_as_of, full)
            if got is not None:
                return got, f"{sidecar_as_of}:{full}"
        if os.path.exists(sib):
            with open(sib) as f:
                return json.load(f), sib
    return _load_inline(d), None


def _load_inline(d: dict) -> dict:
    # driver BENCH_r{N}.json wraps the bench line: {"rc":…, "tail": "…"}
    if "tail" in d and "metric" not in d:
        if isinstance(d.get("parsed"), dict):
            return d["parsed"]
        tail = d["tail"]
        start = tail.rfind('{"metric"')
        if start >= 0:
            return json.loads(tail[start:])
        # tail truncated mid-line: salvage every complete "name": secs
        # pair (first pair may be cut — skipped by the regex)
        import re

        pairs = re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9.]+)', tail)
        qs = {
            k: float(v)
            for k, v in pairs
            if k not in ("sf", "value", "n_queries", "sec_per_query")
        }
        return {"metric": "partial", "queries": qs, "value": None}
    return d


def main() -> int:
    import os

    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, old_side = _load(sys.argv[1])
    new, new_side = _load(sys.argv[2])
    if old_side is not None and old_side == new_side:
        # Both inputs resolved to the SAME working-tree sidecar —
        # comparing it to itself is vacuous. Re-resolve the OLD side
        # from git at the last commit that touched the old input file
        # (the old round's close), which snapshots that round's full
        # per-query map.
        repo = os.path.dirname(os.path.abspath(sys.argv[1]))
        ref = _last_touch(repo, sys.argv[1])
        got = None
        if ref:
            old, old_side = _load(sys.argv[1], sidecar_as_of=ref)
            got = old_side if ":" in (old_side or "") else None
        if got is None:
            print(
                "ERROR: both inputs resolve to the same sidecar "
                f"({new_side}) and git history could not supply the "
                "old round's copy — refusing the vacuous self-compare."
            )
            return 2
        print(f"(old side from git: {old_side})")
    if old == new:
        print(
            "ERROR: the two sides are IDENTICAL — self-compare "
            "(same file or same resolved sidecar); nothing diffed."
        )
        return 2
    if "queries" in old and "metric" in old:
        n = diff_bench(old, new)
    else:
        n = diff_correctness(old, new)
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
