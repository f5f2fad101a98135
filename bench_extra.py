#!/usr/bin/env python
"""Per-query timing harness for optimization work (guide §1.4).

Reproduces bench.py's query-suite methodology EXACTLY — same session
(get_spark, cores=$SPARK_GRAFT_CPUS, shuffle_partitions=cores), same
Python-worker warmup, same noop sink, same untimed session-state reset
between queries — but over an arbitrary subset of queries with
repetitions, so a single optimization can be measured in seconds
instead of re-running the whole ~1 h bench.

bench.py itself stays frozen (driver contract); numbers quoted in
OPTIMIZATION_r06.md cite this file.

Usage:
  python bench_extra.py [-r REPS] query [query ...]
  python bench_extra.py --all          # every oracle query once, sorted

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON line: {"queries": {name: [s, ...]}, "sf_dir": ..., "cpus": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import bench as bench_mod
    import __spark_entry__ as em
    from text2mc_dataprocessor_spark.session import get_spark

    args = sys.argv[1:]
    reps = 1
    if args and args[0] in ("-r", "--reps"):
        reps = int(args[1])
        args = args[2:]
    qs = em.queries()
    if args == ["--all"]:
        names = sorted(em.oracle_sql())
    else:
        names = args
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"
    spark = get_spark("bench-extra", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    bench_mod._warm_python_workers(spark, CPUS)
    out: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra: {name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            out[name].append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            bench_mod._reset_session_state(spark)
    spark.stop()
    print(json.dumps({"queries": out, "sf_dir": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()
