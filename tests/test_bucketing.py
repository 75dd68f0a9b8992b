"""Bucketed-join plan test: the shuffle is paid at write time, not
join time — the core co-location technique for repeated 100 TB joins."""

import contextlib
import io

from pyspark.sql import functions as F

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources.bucketing import (
    bucketed_join,
    save_bucketed,
)


def _formatted(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        left = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("a")
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("b")
        )
        save_bucketed(left, "bkt_left", ["k"], n_buckets=4, sort_cols=["k"])
        save_bucketed(right, "bkt_right", ["k"], n_buckets=4, sort_cols=["k"])

        joined = bucketed_join(spark, "bkt_left", "bkt_right", ["k"])
        plan = _formatted(joined)
        assert "Exchange" not in plan, plan
        assert joined.count() == 1000

        # Control: the same join on unbucketed frames must shuffle.
        plain = left.join(right.withColumnRenamed("b", "b2"), "k")
        assert "Exchange" in _formatted(plain)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_groupby_has_no_exchange(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(1000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        save_bucketed(df, "bkt_agg", ["k"], n_buckets=4)
        agg = spark.table("bkt_agg").groupBy("k").agg(F.sum("v").alias("s"))
        assert "Exchange" not in _formatted(agg)
        assert agg.count() == 100
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS bkt_agg")
