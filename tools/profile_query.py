"""cProfile a registry query's driver-side call tree.

All Spark waits surface as py4j socket reads attributed to the calling
Python frames, so cumulative time per KeyedTable/operator method tells
us where a heavy scenario row's wall actually goes.

Usage: python tools/profile_query.py <query> [sf_dir] [--cold]
  default sf_dir /root/testdata/sf0.1; runs the query once un-profiled
  (JIT warm), then profiles the second run. --cold profiles the first.
"""

from __future__ import annotations

import cProfile
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cold = "--cold" in sys.argv
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as entry_mod
    from hudi_glue_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("profile", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    fn = entry_mod.queries()[name]
    fn(spark, "/root/testdata/sf0.001").count()  # codegen warm
    if not cold:
        fn(spark, sf_dir).count()

    prof = cProfile.Profile()
    prof.enable()
    n = fn(spark, sf_dir).count()
    prof.disable()
    print(f"rows={n}")
    st = pstats.Stats(prof)
    st.sort_stats("cumulative")
    st.print_stats(r"hudi_glue_spark|__spark_entry__", 60)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
