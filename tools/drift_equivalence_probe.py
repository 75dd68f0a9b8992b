"""Drift-mode equivalence at 10× (round-13 verdict task #7).

`sync_catalog` (full: re-derives the union schema from a mergeSchema
re-read of the sink) and `sync_catalog_incremental` (O(metadata):
ledger ∪ batch, sink never re-read) are pinned equivalent at pytest
scale. After the r12 ledger-I/O rework (Hadoop-stream bytes, atomic
tmp+rename) and the r13 aside-rename crash-safety change, this probe
proves STATE-FILE EQUALITY through a multi-batch drift sequence on
the 10× union fixture's orders table (1.5M rows):

  batch 1  create            (years 1995-96, narrow schema)
  batch 2  drift-recreated   (years 1997-98, + o_orderpriority col)
  batch 3  partitions-only   (years 1999-2001, same schema)
  batch 4  lost-ledger reseed (ledger deleted from BOTH sinks, then
           a replay batch — the incremental path must rebuild the
           same state from the surviving table + batch that the full
           path rebuilds from the sink re-read)

Each batch is appended to two identical sinks; the full path syncs
sink A from a mergeSchema re-read, the incremental path syncs sink B
from the batch frame alone. After every batch the probe asserts the
two actions match and the two `_catalog_state.json` ledgers are
equal.

Partition-column TYPE caveat (found by this probe's first run, now
pinned by its second phase): hive directory names erase types, so
the full path's re-read INFERS the partition column's type from the
directory strings while the incremental path keeps the write-time
batch type. For an int partition column the two agree (phase 1:
FULL ledger equality, types included). For a STRING column holding
numeric-looking values ('1995') the full path records `int` where
the incremental path records `string` — the same inference class as
the r12 merge_upsert survivor-drop find ('01' → 1). The H3
names-only contract (`schema_match`) makes this benign: actions and
partition lists never diverge, only the ledger's Type string for the
partition column. Phase 2 asserts the divergence is EXACTLY that
pair and nothing else.

Usage: python tools/drift_equivalence_probe.py [fixture_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.catalog import (
    load_catalog_state,
    sync_catalog,
    sync_catalog_incremental,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)


def _ledger_diffs(a: dict, b: dict, part_col: str, allow_part_type: bool):
    """Differences between two parsed ledgers (empty = equal).
    ``allow_part_type`` permits the documented string/int inference
    pair on the partition column ONLY — anything else still fails."""
    diffs = []
    sa = {(e["Name"], e["Type"]) for e in a["schema"]}
    sb = {(e["Name"], e["Type"]) for e in b["schema"]}
    if allow_part_type:
        allowed = {(part_col, "int"), (part_col, "string"), (part_col, "bigint")}
        if (sa - sb) <= allowed and (sb - sa) <= allowed:
            sa -= allowed
            sb -= allowed
    if sa != sb:
        diffs.append(f"schema: only-full={sa - sb} only-incr={sb - sa}")
    if sorted(a["partitions"]) != sorted(b["partitions"]):
        pa, pb = set(a["partitions"]), set(b["partitions"])
        diffs.append(f"partitions: only-full={pa - pb} only-incr={pb - pa}")
    return diffs


def run_sequence(spark, o, work: str, tag: str, allow_part_type: bool):
    """One full 4-batch drive of both modes over pre-built batch
    frames; returns accumulated mismatch strings."""
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    sink_full, sink_incr = f"{work}/sink_full", f"{work}/sink_incr"
    db_full, db_incr = f"deq_full_{tag}", f"deq_incr_{tag}"
    spark.sql(f"DROP DATABASE IF EXISTS {db_full} CASCADE")
    spark.sql(f"DROP DATABASE IF EXISTS {db_incr} CASCADE")

    narrow = ["o_orderkey", "o_custkey", "o_totalprice", "o_year"]
    wide = narrow[:3] + ["o_orderpriority", "o_year"]
    failures: list[str] = []

    def run_batch(name: str, batch, lose_ledger: bool = False):
        problems = []
        for sink in (sink_full, sink_incr):
            batch.write.mode("append").partitionBy("o_year").parquet(sink)
        if lose_ledger:
            for sink in (sink_full, sink_incr):
                os.remove(os.path.join(sink, "_catalog_state.json"))
        merged = spark.read.option("mergeSchema", "true").parquet(sink_full)
        act_full = sync_catalog(
            spark, merged, sink_full, db_full, "orders", ["o_year"]
        )
        act_incr = sync_catalog_incremental(
            spark, batch, sink_incr, db_incr, "orders", ["o_year"]
        )
        if act_full != act_incr:
            problems.append(f"action: full={act_full} incr={act_incr}")
        st_full = load_catalog_state(sink_full)
        st_incr = load_catalog_state(sink_incr)
        problems += _ledger_diffs(st_full, st_incr, "o_year", allow_part_type)
        print(
            f"[{tag}] {name:8s} action={act_incr:17s} "
            f"partitions={len(st_incr['partitions'])} "
            f"{'MISMATCH: ' + '; '.join(problems) if problems else 'STATE-EQUAL'}",
            flush=True,
        )
        failures.extend(problems)

    run_batch("b1", o.filter(F.col("o_year") <= "1996").select(*narrow))
    run_batch(
        "b2", o.filter(F.col("o_year").between("1997", "1998")).select(*wide)
    )
    run_batch("b3", o.filter(F.col("o_year") >= "1999").select(*wide))
    run_batch(
        "b4-lost",
        o.filter(F.col("o_year") == "1995").select(*wide),
        lose_ledger=True,
    )
    return failures


def main() -> None:
    fixture = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_union10"
    spark = get_spark(
        app_name="drift-equivalence-probe", master="local[8]",
        shuffle_partitions=8,
    )
    base = spark.read.parquet(f"{fixture}/orders.parquet")

    # phase 1: INT partition column — directory round-trip is
    # type-faithful, so the ledgers must be FULLY equal
    o_int = base.withColumn("o_year", F.year("o_orderdate"))
    failures = run_sequence(
        spark, o_int, "/tmp/drift_equiv_int", "i", allow_part_type=False
    )

    # phase 2: STRING partition column with numeric-looking values —
    # the re-read infers int; assert the divergence is EXACTLY the
    # documented pair on o_year and nothing else
    o_str = base.withColumn("o_year", F.year("o_orderdate").cast("string"))
    failures += run_sequence(
        spark, o_str, "/tmp/drift_equiv_str", "s", allow_part_type=True
    )
    spark.stop()
    print(f"{len(failures)} failures", flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
