"""Local stand-in for the driver's correctness gate: run every
queries() entry against its oracle_sql() in DuckDB at sf0.01 and
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [query ...]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(norm_cell(r[i]) for i in idx) for r in rows),
        key=lambda t: tuple(("", "") if v is None else (type(v).__name__, v)
                            for v in t))


def main(argv):
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    selected = argv or list(qs)
    failures = []
    for name in selected:
        fn = qs[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows={len(rows)} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            continue
        t0 = time.time()
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(cols) == sorted(ocols)
        a = norm_rows(cols, rows)
        b = norm_rows(ocols, orows)
        ok = ok_cols and a == b
        status = "OK" if ok else "FAIL"
        print(f"  {name}: {status} spark_rows={len(rows)} "
              f"oracle_rows={len(orows)} [{t_spark:.1f}s/{t_duck:.1f}s]")
        if not ok:
            failures.append(name)
            if not ok_cols:
                print(f"    cols: spark={sorted(cols)} oracle={sorted(ocols)}")
            else:
                sa, sb = set(a), set(b)
                print(f"    extra={list(sa - sb)[:3]}")
                print(f"    missing={list(sb - sa)[:3]}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all oracles OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
