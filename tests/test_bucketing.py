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


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Z-order layout must give footer-stats pruning on BOTH keys;
    single-key cluster_by is the control — it prunes its leading key
    but leaves the second key's per-file ranges near-global."""
    import pyarrow.parquet as pq

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources.writers import (
        cluster_by,
        zorder_by,
    )

    n, side = 4096, 64
    # (x, y) = (low bits, high bits) of id — a full 64×64 grid, the
    # two dimensions genuinely independent.
    df = spark.range(n).select(
        (F.col("id") % side).cast("double").alias("x"),
        ((F.col("id") / side).cast("long") % side).cast("double").alias("y"),
    )

    def file_ranges(path):
        import glob

        out = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = {"x": float("inf"), "y": float("inf")}
            hi = {"x": float("-inf"), "y": float("-inf")}
            for rg in range(md.num_row_groups):
                for ci in range(md.row_group(rg).num_columns):
                    col = md.row_group(rg).column(ci)
                    name = col.path_in_schema
                    if name in lo and col.statistics is not None:
                        lo[name] = min(lo[name], col.statistics.min)
                        hi[name] = max(hi[name], col.statistics.max)
            out.append((lo, hi))
        return out

    def files_overlapping(ranges, dim, q_lo, q_hi):
        return sum(
            1 for lo, hi in ranges if not (hi[dim] < q_lo or lo[dim] > q_hi)
        )

    z_path, c_path = str(tmp_path / "z"), str(tmp_path / "c")
    zorder_by(df, ["x", "y"], n_files=16, bits_per_col=6).write.parquet(z_path)
    cluster_by(df, ["x"], n_files=16).write.parquet(c_path)
    zr, cr = file_ranges(z_path), file_ranges(c_path)
    assert len(zr) >= 8 and len(cr) >= 8

    # selective 1/8-width predicate on each dimension
    q = side / 8
    # z-order: both dimensions prune — at most half the files overlap
    assert files_overlapping(zr, "x", 0, q) <= len(zr) // 2
    assert files_overlapping(zr, "y", 0, q) <= len(zr) // 2
    # control: cluster_by(x) prunes x hard but y not at all
    assert files_overlapping(cr, "x", 0, q) <= len(cr) // 4
    assert files_overlapping(cr, "y", 0, q) == len(cr)
