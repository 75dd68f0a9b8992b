"""Local emulation of the driver's t2 correctness gate: run each
queries() entry in Spark and its oracle_sql() in DuckDB on the same
sf dir; compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def row_key(row, cols_order):
    return tuple(norm(row[i]) for i in cols_order)


def compare(name, sdf, sql, con, verbose=False):
    spark_cols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    try:
        res = con.sql(sql)
        duck_cols = [d[0] for d in res.description]
        drows = res.fetchall()
    except Exception as e:
        return f"ORACLE-ERROR: {type(e).__name__}: {str(e)[:200]}"

    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA-MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(srows) != len(drows):
        return f"COUNT-MISMATCH spark={len(srows)} duck={len(drows)}"

    order = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
    dorder = [duck_cols.index(spark_cols[i]) for i in order]
    sset = sorted(row_key(r, order) for r in srows)
    dset = sorted(row_key(r, dorder) for r in drows)
    if sset != dset:
        diff = [(a, b) for a, b in zip(sset, dset) if a != b][:3]
        return f"VALUE-MISMATCH n={sum(1 for a,b in zip(sset,dset) if a!=b)} first={diff}"
    return f"OK rows={len(srows)}"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                status = compare(name, sdf, oracles[name], con)
            else:
                status = f"ROWS-ONLY rows={sdf.count()}"
        except Exception as e:
            status = f"SPARK-ERROR: {type(e).__name__}: {str(e)[:300]}"
        if not status.startswith(("OK", "ROWS-ONLY")):
            failures += 1
        print(f"{name:32s} {status}", flush=True)
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
