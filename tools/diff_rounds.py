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
    qo, qn = old.get("queries", {}), new.get("queries", {})
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
    return regress


def _load(path: str) -> dict:
    import os

    with open(path) as f:
        d = json.load(f)
    # bench.py's compact stdout line carries only the slowest-10; the
    # complete per-query map lives in the sidecar it names. Prefer a
    # sidecar next to the INPUT file (a committed per-round snapshot).
    full = d.get("queries_full_file") or (d.get("parsed") or {}).get(
        "queries_full_file"
    )
    if full:
        sib = os.path.join(os.path.dirname(os.path.abspath(path)), full)
        if os.path.exists(sib):
            with open(sib) as f:
                return json.load(f)
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
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    if "queries" in old and "metric" in old:
        n = diff_bench(old, new)
    else:
        n = diff_correctness(old, new)
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
