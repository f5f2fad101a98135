#!/usr/bin/env python
"""Isolated per-query re-measure (VERDICT r4 #3).

The r4 suite recorded 1.5-4.6x walls on the three Python-NBT-codec
queries (mca_inhabited_chunks, schem_roundtrip_cells, world2vec_builds)
with UNCHANGED code — suspected suite-order effects (Python worker
pool state, GC debt from 60+ prior queries in one JVM) or host
interference. This script separates those hypotheses:

  for each query: REPS runs, each in a FRESH subprocess (new JVM, new
  Python worker pool, nothing else on the session), plus REPS runs
  back-to-back inside ONE session AFTER a deliberately heavy warm-up
  query mix (suite-order emulation).

Usage:
  python scripts/bench_isolated.py [query ...]   # default: the 3 NBT queries
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
     BENCH_ISOLATED_REPS (default 3).
Prints one JSON line: {"fresh": {q: [s,...]}, "suite_order": {q: [s,...]}}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_QUERIES = [
    "mca_inhabited_chunks", "schem_roundtrip_cells", "world2vec_builds",
]
#: queries run first inside the one-session leg to emulate the full
#: suite's accumulated JVM/Python-worker state (heaviest mixed load:
#: Arrow UDFs, big shuffles, caches)
WARMUP_MIX = [
    "minhash_lsh_pairs", "simhash_pairs", "cosine_topk", "gopher_repeated_ngrams",
    "voxel_block_freq", "anti_join_unseen",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_ISOLATED_REPS", "3"))


def _time_queries(names: list[str]) -> dict[str, float]:
    import __spark_entry__ as em
    from text2mc_dataprocessor_spark.session import get_spark

    os.environ["SPARK_GRAFT_DRIVER_MEM"] = "64g"
    spark = get_spark("bench-isolated", cores=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    out = {}
    for n in names:
        t0 = time.time()
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        out[n] = round(time.time() - t0, 3)
    spark.stop()
    return out


def _subprocess_leg(names: list[str]) -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--leg", ",".join(names)],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise RuntimeError(out.stdout[-2000:] + out.stderr[-2000:])


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    fresh: dict[str, list[float]] = {q: [] for q in queries}
    suite_order: dict[str, list[float]] = {q: [] for q in queries}
    for _ in range(REPS):
        # fresh: one subprocess per query, nothing before it
        for q in queries:
            fresh[q].append(_subprocess_leg([q])[q])
        # suite-order emulation: warm-up mix then the targets, one JVM
        t = _subprocess_leg(WARMUP_MIX + queries)
        for q in queries:
            suite_order[q].append(t[q])
    print(json.dumps({"fresh": fresh, "suite_order": suite_order,
                      "sf_dir": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--leg":
        print("LEG_RESULT " + json.dumps(_time_queries(sys.argv[2].split(","))))
    else:
        main()
