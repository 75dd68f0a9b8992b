"""MinHash cluster-family at-scale VALUE parity (round-13 verdict
task #5 — the last headline family verified at 10× only).

Why the family's own oracles cannot scale: the full-corpus truth is
all-pairs exact n-gram Jaccard — 5000 base docs are already 12.5M
DuckDB list-intersect pairs; 125k/500k docs are 7.8G/125G pairs. The
operators (LSH banding + bucket pairs + exact verify + pointer-
jumping components) are linear-ish by design; only the ORACLE is
quadratic — the same standing class as the kNN-graph 10× exclusions.

What CAN be value-verified at fixture scale, exactly: the N× union
fixture (tools/gen_scaled_fixtures.py) replicates sf0.1 documents
with doc_id offsets of one shared stride and UNSALTED text — every
base doc has N byte-identical clones. The exact-Jaccard truth at N×
is therefore derivable LINEARLY from the sf0.1 truth:

  * clones of one base doc form a clique (J = 1; sf0.1 has no
    blank/NULL texts, so every clone pair clears any threshold);
  * a clone of a is similar to a clone of b iff J(a, b) ≥ t in the
    BASE corpus (similarity depends only on text bytes);
  * hence N× connected components are the base components with each
    member expanded by its clone group — and the component min-id IS
    the base cluster id (replica-0 ids precede every offset id).

The Spark side runs the REAL operator pipeline on the full N×
corpus — minhash_bands Arrow pass over N·5000 docs, LSH bucket
self-join (clone groups of N collapse into shared buckets, the
near-adversarial shape the giant-bucket guard prices), exact-verify
Jaccard on every candidate, pointer-jumping components. Only the
oracle uses the construction — the same pattern as
tools/graph_scale_parity.py's linearly-constructed hash graph.

The PAIR-list gates stay at their 10× rung by contract: on a
clone-N corpus the verified pair list is Θ(N²) per base doc (24.7M
rows at 100×) — the per-row collect compare is the bottleneck
(compare-cost class), and above max_bucket_members the star guard
deliberately thins exhaustive pair lists anyway (connectivity-
equivalent, pair-list-inexact — dedup.py:bucket_pairs).

Usage: python tools/minhash_scale_parity.py [fixture_dir] [base_sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry
from tools.check_oracle import compare
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)


def _pat(d: str, t: str) -> str:
    p = f"{d}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_union10"
    base = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="minhash-scale-parity", master="local[8]",
        shuffle_partitions=32,
    )
    con = duckdb.connect()
    # `documents` view = BASE corpus: the quadratic truth runs ONLY
    # at base scale; the fixture is touched linearly.
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{_pat(base, 'documents')}'"
    )
    con.sql(
        f"CREATE VIEW fixture_docs AS "
        f"SELECT * FROM '{_pat(fixture, 'documents')}'"
    )
    (stride,) = con.sql("SELECT MAX(doc_id) + 1 FROM documents").fetchone()
    n_base = con.sql("SELECT COUNT(*) FROM documents").fetchone()[0]
    n_fix = con.sql("SELECT COUNT(*) FROM fixture_docs").fetchone()[0]
    if n_fix % n_base:
        raise SystemExit(
            f"fixture ({n_fix}) is not a whole multiple of base ({n_base})"
        )
    mult = n_fix // n_base
    blanks = con.sql(
        "SELECT COUNT(*) FROM documents "
        "WHERE text IS NULL OR trim(text) = ''"
    ).fetchone()[0]
    if blanks:
        raise SystemExit(
            f"{blanks} blank/NULL base docs: the clone-clique premise "
            f"(J=1 for identical texts) needs the empty-shingle "
            f"convention pinned first"
        )
    print(f"fixture={fixture} N={mult} stride={stride}", flush=True)

    # Base pairs via an INVERTED shingle index instead of the gate
    # oracle's all-pairs join: any pair with J ≥ 0.5 shares at least
    # one shingle, so joining the exploded shingle lists and deriving
    # |A∪B| = |A| + |B| - |A∩B| yields the IDENTICAL pair set and
    # jaccard values (same integer inputs, same double division, same
    # ROUND) — verified bit-identical against DEDUP_NGRAM_SQL at
    # sf0.01 (25/25 pairs) and ~8× faster there; at the sf0.1 base
    # the all-pairs form is 12.5M list_intersects (>15 min) while
    # this is linear in shared-shingle pairs (~1 min). This is the
    # "banded pair SQL" scale path the r12 verdict pointed at.
    # MATERIALIZED is load-bearing throughout: DuckDB inlines plain
    # CTEs, so the recursive `reach` term would otherwise re-evaluate
    # the pair computation on EVERY iteration (observed: >1 h).
    base_pairs = f"""
WITH sh AS (SELECT doc_id, {entry._SQL_SHINGLES} AS shingles
            FROM documents),
sizes AS (SELECT doc_id, len(shingles) AS sz FROM sh),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b
FROM inter
JOIN sizes sa ON inter.id_a = sa.doc_id
JOIN sizes sb ON inter.id_b = sb.doc_id
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
"""
    base_clusters = f"""
WITH RECURSIVE pairs AS MATERIALIZED ({base_pairs}),
edges AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
bcl AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
  FROM reach GROUP BY src
)"""

    qs = entry.queries()
    checks = {
        # N× components == base components expanded by clone groups;
        # min-id of each N× component is the base cluster id
        "dedup_cluster_docs": f"""{base_clusters}
SELECT f.doc_id,
       COALESCE(b.cluster_id, f.doc_id % {stride}) AS cluster_id
FROM fixture_docs f
LEFT JOIN bcl b ON f.doc_id % {stride} = b.doc_id
""",
        # representative selection: every N× cluster is a base
        # cluster (or base singleton) × its clone groups — members
        # multiply by N; the keep pick collapses to the base argmax
        # (clone nc ties break to the min id = the replica-0 doc)
        "dedup_best_quality_docs": f"""{base_clusters},
all_base AS (
  SELECT d.doc_id, COALESCE(b.cluster_id, d.doc_id) AS cluster_id,
         LENGTH(d.text) AS nc
  FROM documents d LEFT JOIN bcl b ON d.doc_id = b.doc_id)
SELECT cluster_id,
       CAST(COUNT(*) * {mult} AS BIGINT) AS n_members,
       MAX(CASE WHEN rn = 1 THEN doc_id END) AS keep_doc_id,
       CAST(MAX(nc) AS BIGINT) AS keep_n_chars
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id
                                   ORDER BY nc DESC, doc_id) AS rn
      FROM all_base)
GROUP BY cluster_id
""",
    }

    failures = 0
    for name, truth_sql in checks.items():
        sdf = qs[name](spark, fixture)
        status = compare(name, sdf, truth_sql, con)
        print(f"{name:32s} {status}", flush=True)
        if not status.startswith("OK"):
            failures += 1
    spark.stop()
    print(f"{failures} failures", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
