#!/usr/bin/env python
"""Capture .explain("formatted") output for named queries into
plans/r06/<query>_<label>.txt (label = before|after).

Usage: python scripts/capture_plans.py <label> query [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT = os.path.join(REPO, "plans", "r06")


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as em
    from text2mc_dataprocessor_spark.session import get_spark

    spark = get_spark("capture-plans", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    os.makedirs(OUT, exist_ok=True)
    for n in names:
        df = qs[n](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{n}_{label}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
