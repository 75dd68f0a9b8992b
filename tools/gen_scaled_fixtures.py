"""Generate key-coherent N× union fixtures for the at-scale ORACLE
parity sweep (round-11 unprompted campaign): every scale probe so far
measured WALL growth at N×; this writes the N× corpus to parquet so
`tools/check_oracle.py <out_dir> <gates...>` can verify VALUE parity
(Spark vs DuckDB, arrow-typed bit-exact compare) at ~sf1 volume —
correctness evidence at 10× the largest driver-checked scale.

Stride discipline matches cbo_probe/scale_probe: each join-key family
shifts by ONE shared stride per replica (derived from the owning
table's max+1), so foreign keys resolve across replicas and the
relational queries see a genuinely larger, internally-consistent
database. documents/embeddings get their own id offsets; text is NOT
salted (clone text changes nothing about engine parity — both engines
see the same bytes).

events (round-12, verdict task #2) is generated through DUCKDB, not
Spark: a Spark rewrite cannot round-trip the source timestamp
encoding (ns in the driver fixtures; tz-less µs here — either way the
rewritten file's arrow type diverges from the source and breaks the
shared oracle typing), while DuckDB reads and writes timestamp[us]
bit-identically. Each replica gets the shared id strides
(event_id/user_id, so user-keyed self-joins stay within-replica) AND
a constant time shift of i × 63 days — ≫ the 30-day corpus span, the
30-min watermark and every session gap, a whole number of weeks so
hour/day/week bucket structure is isomorphic per replica, and pure
int64 µs addition so intra-replica deltas are preserved exactly.
One part-file per replica, in time order, so the streaming twins
drain it as N monotonically-advancing micro-batches (real watermark
advancement + state eviction) instead of one batch.

Usage: python tools/gen_scaled_fixtures.py [sf_dir] [N] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

TPCH = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]

# key family -> (owning table, owning col, {referencing table: col})
KEY_FAMILIES = {
    "regionkey": ("region", "r_regionkey", {"nation": "n_regionkey"}),
    "nationkey": ("nation", "n_nationkey",
                  {"customer": "c_nationkey", "supplier": "s_nationkey"}),
    "custkey": ("customer", "c_custkey", {"orders": "o_custkey"}),
    "suppkey": ("supplier", "s_suppkey", {"lineitem": "l_suppkey"}),
    "partkey": ("part", "p_partkey", {"lineitem": "l_partkey"}),
    "orderkey": ("orders", "o_orderkey", {"lineitem": "l_orderkey"}),
}

SOLO = {"documents": ["doc_id"], "embeddings": ["vec_id"]}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf_union"
    spark = get_spark(app_name="gen_scaled_fixtures")

    dfs = {t: spark.read.parquet(f"{sf_dir}/{t}.parquet") for t in TPCH}
    stride = {
        fam: (dfs[owner].agg(F.max(col)).collect()[0][0] or 0) + 1
        for fam, (owner, col, _) in KEY_FAMILIES.items()
    }
    shift: dict[str, dict[str, int]] = {t: {} for t in TPCH}
    for fam, (owner, col, refs) in KEY_FAMILIES.items():
        shift[owner][col] = stride[fam]
        for t, c in refs.items():
            shift[t][c] = stride[fam]

    def write_union(name: str, df, col_strides: dict[str, int]) -> None:
        parts = []
        for i in range(n):
            part = df
            for c, st in col_strides.items():
                part = part.withColumn(c, F.col(c) + F.lit(i * st))
            parts.append(part)
        u = parts[0]
        for p in parts[1:]:
            u = u.union(p)
        u.write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"{name}: {n}x written", flush=True)

    for t in TPCH:
        write_union(t, dfs[t], shift[t])
    for t, id_cols in SOLO.items():
        df = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        st = (df.agg(F.max(id_cols[0])).collect()[0][0] or 0) + 1
        write_union(t, df, {id_cols[0]: st})
    write_events_replicas(sf_dir, n, out)
    spark.stop()


def write_events_replicas(sf_dir: str, n: int, out: str) -> None:
    """Replica-offset events fixture via DuckDB (docstring above)."""
    import duckdb

    src = f"{sf_dir}/events.parquet"
    con = duckdb.connect()
    src_rel = f"read_parquet('{src}')" if os.path.isfile(src) else (
        f"read_parquet('{src}/*.parquet')"
    )
    e_st, u_st = con.sql(
        f"SELECT MAX(event_id) + 1, MAX(user_id) + 1 FROM {src_rel}"
    ).fetchone()
    if e_st is None or u_st is None:
        raise ValueError(
            f"events source {src} is empty — nothing to replicate"
        )
    dest = f"{out}/events.parquet"
    # the destination may exist as a DIRECTORY (prior replica run) or
    # a plain FILE (the r11 verbatim-copy fixture) — remove either
    if os.path.isdir(dest):
        shutil.rmtree(dest)
    elif os.path.exists(dest):
        os.remove(dest)
    os.makedirs(dest)
    base_mtime = os.stat(src).st_mtime
    for i in range(n):
        part = f"{dest}/part-{i:03d}.parquet"
        con.sql(
            f"COPY (SELECT CAST(event_id + {i * e_st} AS BIGINT) AS event_id,"
            f"             ts + {i} * INTERVAL 63 DAYS AS ts,"
            f"             CAST(user_id + {i * u_st} AS BIGINT) AS user_id,"
            f"             event_type, value, props"
            f"      FROM {src_rel} ORDER BY ts, event_id)"
            f" TO '{part}' (FORMAT PARQUET)"
        )
        # Spark's file stream source orders micro-batches by file
        # MODIFICATION TIME, not name: fast sequential COPYs can tie
        # at filesystem timestamp granularity and a later-replica
        # batch draining first would put every earlier replica 63
        # days behind the watermark. Pin strictly increasing mtimes
        # so the drain order IS the replica time order.
        os.utime(part, (base_mtime + i, base_mtime + i))
    print(f"events: {n}x written (63-day replica offsets)", flush=True)


if __name__ == "__main__":
    main()
