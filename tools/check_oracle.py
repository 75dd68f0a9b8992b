"""Local emulation of the driver's t2 correctness gate: run each
queries() entry in Spark and its oracle_sql() in DuckDB on the same
sf dir; compare row count, column names, RESULT DTYPES, and
order-insensitive full-precision values.

The round-1 driver hash caught two classes this tool's old ``%.10g``
string compare missed: (a) DuckDB ``SUM(int)`` returning HUGEINT
(int128) where Spark returns bigint — identical digits, different
dtype; (b) double divergence past the 10th significant digit. The
compare is therefore arrow-typed and bit-exact on floats now.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
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

# Spark simple dtype string -> acceptable DuckDB dtype strings.
# Calibrated against the round-1 driver: its hash goes through pandas,
# so any integer width that stays an integer dtype (int32/int64/uint64)
# hashes alike — q7/q8/q9 (int vs BIGINT) and map_pivot (UBIGINT) all
# passed. HUGEINT is fatal (pandas converts int128 to float64), as is
# DECIMAL where Spark emits double. Only the fatal ones are flagged.
INTS = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
        "USMALLINT", "UTINYINT"}
DTYPE_OK = {
    "bigint": INTS,
    "int": INTS,
    "smallint": INTS,
    "tinyint": INTS,
    "double": {"DOUBLE"},
    "float": {"FLOAT", "DOUBLE"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
}


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v.hex()  # bit-exact; driver hashes raw values
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def row_key(row, cols_order):
    return tuple(norm(row[i]) for i in cols_order)


def dtype_check(spark_dtypes, duck_cols, duck_types):
    """Return list of per-column dtype complaints."""
    sd = dict(spark_dtypes)
    out = []
    for col, dt in zip(duck_cols, duck_types):
        st = sd.get(col)
        if st is None:
            continue
        dts = str(dt).upper()
        ok = DTYPE_OK.get(st)
        if ok is None:
            # complex spark type (array/struct/map): only flag obvious
            # scalar mismatches, else trust the value compare
            continue
        if dts not in ok:
            out.append(f"{col}: spark={st} duck={dts}")
    return out


def compare(name, sdf, sql, con, verbose=False):
    spark_cols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    try:
        res = con.sql(sql)
        duck_cols = list(res.columns)
        duck_types = list(res.types)
        drows = res.fetchall()
    except Exception as e:
        return f"ORACLE-ERROR: {type(e).__name__}: {str(e)[:200]}"

    if sorted(spark_cols) != sorted(duck_cols):
        return f"SCHEMA-MISMATCH spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    if len(srows) != len(drows):
        return f"COUNT-MISMATCH spark={len(srows)} duck={len(drows)}"

    dtype_bad = dtype_check(sdf.dtypes, duck_cols, duck_types)
    if dtype_bad:
        return f"DTYPE-MISMATCH {dtype_bad}"

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
        # driver fixtures are single files; Spark-generated fixtures
        # (gen_scaled_fixtures.py) are part-file directories
        path = f"{sf_dir}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{pat}'")

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
