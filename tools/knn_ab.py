"""Cooled-session A/B probe for a named query family (VERDICT r13 #1).

Times the given registry queries in THIS tree's ``__spark_entry__``
(cwd) — fresh JVM, universal tiny-sf warmup for the family, then N
timed samples per query, median reported. Run once per tree from each
tree's root; compare the JSON lines.

Usage: python tools/knn_ab.py q1,q2,... [sf_dir] [samples]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    samples = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    import __spark_entry__ as m
    from hudi_glue_spark.session import get_spark

    spark = get_spark(
        "knn-ab", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()
    # JIT warmup: same codegen shapes at ~1/100 the data, twice
    for n in names:
        for _ in range(2):
            qs[n](spark, "/root/testdata/sf0.001").count()
    out: dict[str, float] = {}
    for n in names:
        ts = []
        for _ in range(samples):
            t0 = time.perf_counter()
            qs[n](spark, sf_dir).count()
            ts.append(time.perf_counter() - t0)
        out[n] = round(statistics.median(ts), 3)
        print(f"# {n}: {out[n]}s  all={['%.2f' % t for t in ts]}",
              file=sys.stderr)
    print(json.dumps({"tree": os.getcwd(), "sf_dir": sf_dir,
                      "medians": out, "load1": os.getloadavg()[0]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
