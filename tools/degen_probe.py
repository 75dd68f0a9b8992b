"""Degenerate-corpus robustness probe: rewrite sf0.001 into four
adversarial variants (all-degenerate values; single-row tables;
alternating-NULL payload columns; verbatim-duplicated rows) and run every queries() entry
against each, reporting exceptions. Round-10 findings (all fixed,
pinned in tests/test_degenerate.py): zero-norm cosine DIVIDE_BY_ZERO
in five vector gates, zero-quantity DIVIDE_BY_ZERO in q2, zero-row
source batches crashing run_batch, and schema inference failing on a
footerless pairs sink.

Usage: python tools/degen_probe.py [src_sf_dir]"""
import os
import sys
import traceback

sys.path.insert(0, ".")

from pyspark.sql import functions as F

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

spark = get_spark(app_name="degen_probe")
spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def build(variant: str, out: str):
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        if variant == "single":
            df = df.limit(1)
        elif variant == "degen":
            if t == "documents":
                df = df.select(
                    "doc_id",
                    F.lit("").alias("text"),
                    F.lit("en").alias("lang"),
                    F.lit("web").alias("source"),
                    F.lit(0).cast("bigint").alias("n_chars"),
                )
            elif t == "embeddings":
                df = df.select(
                    "vec_id",
                    F.transform("embedding", lambda x: F.lit(0.0).cast("float")).alias("embedding"),
                    F.lit(0).cast("int").alias("label"),
                )
            elif t == "events":
                df = df.select(
                    "event_id",
                    F.lit(1700000000000000).cast("bigint").alias("ts"),
                    F.lit(1).cast("bigint").alias("user_id"),
                    F.lit("view").alias("event_type"),
                    F.lit(0.0).alias("value"),
                    F.lit("{}").alias("props"),
                )
            elif t == "lineitem":
                df = (df.withColumn("l_quantity", F.lit(0.0))
                        .withColumn("l_extendedprice", F.lit(0.0))
                        .withColumn("l_discount", F.lit(0.0))
                        .withColumn("l_tax", F.lit(0.0))
                        .withColumn("l_returnflag", F.lit("N"))
                        .withColumn("l_linestatus", F.lit("O")))
            elif t == "orders":
                df = (df.withColumn("o_totalprice", F.lit(0.0))
                        .withColumn("o_orderstatus", F.lit("O"))
                        .withColumn("o_orderpriority", F.lit("1-URGENT")))
        elif variant == "dupes":
            # duplicate every 10th row VERBATIM (same id, same
            # payload) — the at-least-once ingestion-retry shape;
            # joins fan out, maps must aggregate before building,
            # dedup sees genuine duplicates
            key = {"documents": "doc_id", "embeddings": "vec_id",
                   "events": "event_id", "orders": "o_orderkey",
                   "lineitem": "l_orderkey"}.get(t)
            if key is not None:
                df = df.union(df.filter(F.col(key) % 10 == 0))
        elif variant == "nulls":
            # NULL every nullable payload column on alternating rows
            # (ids and join keys stay non-null): the realistic shape
            # of a 100 TB corpus with missing text / embeddings /
            # attributes, and the input most likely to crash Arrow
            # kernels that np.stack arrays.
            key = {"documents": "doc_id", "embeddings": "vec_id",
                   "events": "event_id", "lineitem": "l_orderkey",
                   "orders": "o_orderkey"}.get(t)
            if key is not None:
                keep_keys = {key, "l_partkey", "l_suppkey", "o_custkey",
                             "user_id"}
                odd = F.col(key) % 2 == 1
                for c, dt in df.dtypes:
                    if c not in keep_keys:
                        df = df.withColumn(
                            c,
                            F.when(odd, F.lit(None).cast(dt)).otherwise(
                                F.col(c)
                            ),
                        )
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


qs = entry.queries()
fails = {}
for variant in ("degen", "single", "nulls", "dupes"):
    out = f"/tmp/degen_sf/{variant}"
    build(variant, out)
    # events ts written as bigint micros in degen variant; entry._events
    # handles bigint. In "single" the original ns-long column is copied
    # through (read with nanosAsLong => bigint) — also handled.
    for name, fn in sorted(qs.items()):
        try:
            fn(spark, out).count()
        except Exception as exc:
            key = f"{variant}:{name}"
            fails[key] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(f"FAIL {key}: {fails[key]}", flush=True)
    print(f"== variant {variant} done, fails so far: {len(fails)}", flush=True)

print("TOTAL FAILS", len(fails))
for k, v in fails.items():
    print(k, "=>", v.replace("\n", " ")[:200])
