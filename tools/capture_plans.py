"""Capture .explain("formatted") for registry queries into files.

Usage: python tools/capture_plans.py <outdir> <suffix> [query ...]
  e.g. python tools/capture_plans.py plans/r15 before doc_winnowing_fingerprints
Writes <outdir>/<query>_<suffix>.txt for each query (all queries when
none named). Plans are captured at sf0.001 (plan SHAPE is
scale-independent; fixture scenario tables build fast there).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    import __spark_entry__ as entry_mod
    from hudi_glue_spark.session import get_spark

    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    if not names:
        names = sorted(qs)
    for name in names:
        try:
            df = qs[name](spark, "/root/testdata/sf0.001")
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001 — record, don't die
            txt = f"ERROR capturing plan: {type(e).__name__}: {e}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(f"captured {name}_{suffix}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
