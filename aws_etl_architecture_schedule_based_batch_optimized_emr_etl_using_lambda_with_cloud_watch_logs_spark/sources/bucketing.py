"""Bucketed tables: pre-shuffled storage for co-located joins.

The 100 TB join strategy the partitioned sink can't provide: two
tables bucketed by the same key into the same bucket count join with
NO exchange on either side — the shuffle is paid once at write time
and amortized over every subsequent join/aggregation on that key.
(The reference has no bucketing — EMR 5.x Spark 2.4 supported it,
but the reference's sink is partition-only; this is part of the
"design for 100 TB" charter, SURVEY §7.4.)

Bucketing requires the session catalog (``saveAsTable``) — bucket
metadata lives in the metastore, not in parquet footers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) managed
    table. ``sort_cols`` additionally sorts within each bucket file,
    letting sort-merge joins skip the sort as well."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str]
) -> DataFrame:
    """Join two bucketed tables on their bucket key. When both sides
    are bucketed by ``on`` with equal bucket counts, the physical
    plan contains no Exchange (verify with ``explain``) — the join
    runs bucket-to-bucket."""
    return spark.table(left_table).join(spark.table(right_table), on)
