"""Graph-family at-scale VALUE parity (round-12 verdict task #3).

The five kNN-graph gates (knn_graph / pagerank / knn_components /
graph_walks / knn_triangles) all build their edges from the exact
all-pairs kNN of the doc_id%5 sample — a QUADRATIC truth side on both
engines (the Spark scale path is knn_edges_lsh, whose recall gate's
truth is the same exact kNN). At the 10× fixture the sample is 50k
docs → 2.5G candidate pairs with a 2.5G-row ROW_NUMBER sort in
DuckDB: the oracle, not the operator, is the bottleneck, so those
gates keep their sf0.01/sf0.1 value evidence (same standing class as
ORACLE_SF01.md's quadratic-truth exclusions).

What CAN be value-verified at 10× is the iterative operators
themselves — pagerank's unrolled power iteration, the pointer-jumping
components, the hash-driven walks, the wedge-close triangles — on a
graph whose construction is LINEAR in both engines. This probe builds
a deterministic block-modular hash graph over the documents table of
any fixture dir:

  idx     = ROW_NUMBER() - 1 over doc_id (dense, both engines)
  block   = 50 consecutive idx values (trailing partial block
            excluded so every out-degree sequence is complete)
  out-deg = 1 + idx mod 4 (varied degrees → non-uniform PageRank)
  edge j  = idx -> block_start + (local + 7·j + idx mod 11) mod 50,
            rank = j  (never a self-loop: 7j + idx%11 ∈ [7, 38];
            never a duplicate: 7j distinct mod 50 for j ≤ 4)

Components are confined to blocks (diameter ≤ 50), so the recursive-
CTE closure oracle is O(50·n); pagerank/walks oracles are the same
unrolled shapes the driver gates use; triangles the same wedge-close.
Every comparison is tools/check_oracle.compare — arrow-typed,
bit-exact. Run against /tmp/sf_union10 (250k docs) this gives the
graph operators the 10×-volume value parity the r11 ladder had only
as wall-growth probes.

Usage: python tools/graph_scale_parity.py [fixture_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb

from pyspark.sql import Window
from pyspark.sql import functions as F

import __spark_entry__ as entry
from tools.check_oracle import compare
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    dedup as D,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
    graph as GR,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

B = 50  # block size


def hash_graph_edges(spark, fixture_dir: str):
    """(src, dst, rank) edge frame per the module docstring. The
    global ROW_NUMBER is probe plumbing, not the operator under test
    (at production scale ids come from the corpus; here they must be
    dense so the modular construction is expressible in both
    engines)."""
    docs = spark.read.parquet(f"{fixture_dir}/documents.parquet").select(
        "doc_id"
    )
    idx = docs.withColumn(
        "idx", F.row_number().over(Window.orderBy("doc_id")) - F.lit(1)
    )
    n = idx.count()
    n_trim = n - n % B
    idx = idx.filter(F.col("idx") < n_trim).localCheckpoint()
    local = F.col("idx") % B
    blk = F.col("idx") - local
    eidx = (
        idx.withColumn(
            "j", F.explode(F.sequence(F.lit(1), F.lit(1) + F.col("idx") % 4))
        )
        .withColumn(
            "dst_idx", blk + (local + 7 * F.col("j") + F.col("idx") % 11) % B
        )
        .select(
            F.col("idx").alias("src_idx"),
            "dst_idx",
            F.col("j").cast("int").alias("rank"),
        )
    )
    s = idx.select(F.col("idx").alias("src_idx"), F.col("doc_id").alias("src"))
    d = idx.select(F.col("idx").alias("dst_idx"), F.col("doc_id").alias("dst"))
    return eidx.join(s, "src_idx").join(d, "dst_idx").select(
        "src", "dst", "rank"
    ).localCheckpoint()


def edge_ctes() -> str:
    return f"""idx AS MATERIALIZED (
  SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS idx
  FROM documents),
trimmed AS MATERIALIZED (
  SELECT * FROM idx
  WHERE idx < (SELECT COUNT(*) - COUNT(*) % {B} FROM idx)),
eidx AS MATERIALIZED (
  SELECT i.idx AS src_idx,
         (i.idx - i.idx % {B})
           + ((i.idx % {B}) + 7 * j.j + (i.idx % 11)) % {B} AS dst_idx,
         CAST(j.j AS INT) AS rank
  FROM trimmed i
  JOIN (SELECT UNNEST(range(1, 5)) AS j) j ON j.j <= 1 + (i.idx % 4)),
e AS MATERIALIZED (
  SELECT s.doc_id AS src, d.doc_id AS dst, eidx.rank
  FROM eidx
  JOIN trimmed s ON s.idx = eidx.src_idx
  JOIN trimmed d ON d.idx = eidx.dst_idx)"""


def pagerank_sql(n_iter: int = 8) -> str:
    steps = []
    for i in range(1, n_iter + 1):
        steps.append(
            f"""p{i} AS MATERIALIZED (
  SELECT nd.id,
         (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / nn.n
         + CAST(0.85 AS DOUBLE) * COALESCE(c.s, CAST(0 AS DOUBLE)) AS pr
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS id, SUM(p.pr / d.outdeg) AS s
    FROM e JOIN p{i - 1} p ON e.src = p.id
           JOIN deg d ON d.id = e.src
    GROUP BY e.dst) c ON c.id = nd.id)"""
        )
    chain = ",\n".join(steps)
    return f"""WITH {edge_ctes()},
nodes AS MATERIALIZED (
  SELECT DISTINCT src AS id FROM e UNION SELECT DISTINCT dst FROM e),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM e GROUP BY 1),
nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
p0 AS MATERIALIZED (
  SELECT id, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn),
{chain}
SELECT id AS doc_id, ROUND(pr, 6) AS pr FROM p{n_iter}"""


COMPONENTS_SQL_TMPL = """WITH RECURSIVE {ctes},
edges2 AS (
  SELECT src, dst FROM e
  UNION SELECT dst, src FROM e),
reach(src, dst) AS (
  SELECT src, dst FROM edges2
  UNION
  SELECT r.src, e2.dst FROM reach r JOIN edges2 e2 ON r.dst = e2.src)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
FROM reach GROUP BY src"""


TRIANGLES_SQL_TMPL = """WITH {ctes},
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM e WHERE src <> dst),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
member AS (
  SELECT x AS id FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri),
nodes AS (SELECT src AS id FROM e UNION SELECT dst FROM e),
cnt AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n FROM member GROUP BY id)
SELECT n.id AS doc_id, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_triangles
FROM nodes n LEFT JOIN cnt ON cnt.id = n.id"""


def walks_sql(walk_len: int = 3) -> str:
    ctes = ["w0 AS (SELECT v AS start, v AS cur FROM deg)"]
    selects = []
    for i in range(1, walk_len + 1):
        h = entry._hash32_sql(f"((w.cur % 4294967296) * 1000003 + {i})")
        ctes.append(
            f"""w{i} AS MATERIALIZED (
  SELECT w.start, e.dst AS cur
  FROM w{i - 1} w
  JOIN deg d ON d.v = w.cur
  JOIN e ON e.src = w.cur
        AND e.rank = 1 + ({h} % d.outdeg))"""
        )
        selects.append(
            f"SELECT start, CAST({i} AS INT) AS step, cur AS node FROM w{i}"
        )
    cte_block = ",\n".join(ctes)
    select_block = "\nUNION ALL\n".join(selects)
    return f"""WITH {edge_ctes()},
deg AS MATERIALIZED (SELECT src AS v, COUNT(*) AS outdeg FROM e GROUP BY 1),
{cte_block}
{select_block}"""


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_union10"
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    path = f"{fixture}/documents.parquet"
    pat = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{pat}'")

    edges = hash_graph_edges(spark, fixture)
    n_edges = edges.count()
    print(f"hash graph: {n_edges} edges over {fixture}", flush=True)

    cases = {
        "pagerank_hashgraph": (
            GR.pagerank(edges, n_iter=8, damping=0.85).select(
                F.col("id").alias("doc_id"), F.round("pr", 6).alias("pr")
            ),
            pagerank_sql(8),
        ),
        "components_hashgraph": (
            D.connected_components(edges, "src", "dst"),
            COMPONENTS_SQL_TMPL.format(ctes=edge_ctes()),
        ),
        "triangles_hashgraph": (
            GR.triangle_counts(edges).select(
                F.col("id").alias("doc_id"), "n_triangles"
            ),
            TRIANGLES_SQL_TMPL.format(ctes=edge_ctes()),
        ),
        "walks_hashgraph": (
            GR.random_walks(edges, walk_len=3),
            walks_sql(3),
        ),
    }
    failures = 0
    for name, (sdf, sql) in cases.items():
        status = compare(name, sdf, sql, con)
        if not status.startswith("OK"):
            failures += 1
        print(f"{name:28s} {status}", flush=True)
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
