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

events is EXCLUDED: its source parquet carries ns timestamps, which
Spark can only rewrite as µs/bigint — that changes the DuckDB view's
column type and breaks the shared oracle SQL. The events family keeps
its sf0.1 evidence.

Usage: python tools/gen_scaled_fixtures.py [sf_dir] [N] [out_dir]
"""

from __future__ import annotations

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
    spark.stop()


if __name__ == "__main__":
    main()
