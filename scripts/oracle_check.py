"""Driver-style oracle check: run each __spark_entry__ query AND its
DuckDB oracle SQL at sf0.01, compare row count, schema (column names)
and a value hash over name-sorted columns — the same comparison shape
the round driver records in CORRECTNESS_r{N}.json.

Usage: python scripts/oracle_check.py [query ...]   (default: all)
"""

import hashlib
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    queries = entry.queries()
    oracles = entry.oracle_sql()
    want = sys.argv[1:] or list(queries)

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.maxPlanStringLength", "65536")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in want:
        if name not in queries:
            print(f"{name}: NOT A QUERY")
            failures += 1
            continue
        try:
            sdf = queries[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{name}: SPARK ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        rows_ok = len(srows) == len(orows)
        schema_ok = sorted(scols) == sorted(ocols)
        hash_ok = schema_ok and _hash(srows, scols) == _hash(orows, ocols)
        ok = rows_ok and schema_ok and hash_ok
        if not ok:
            failures += 1
        print(f"{name}: rows={rows_ok}({len(srows)}/{len(orows)}) "
              f"schema={schema_ok} hash={hash_ok}"
              + ("" if schema_ok else f" spark={sorted(scols)} oracle={sorted(ocols)}"))
    print(f"DONE failures={failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
