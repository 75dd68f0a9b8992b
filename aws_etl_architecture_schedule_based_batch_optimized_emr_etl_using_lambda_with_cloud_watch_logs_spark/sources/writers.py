"""Sinks (reference §2.I).

I1: partitioned append write (``emr_json_parquet_schema_drift_etl.py:340-343``)
— ``.save()`` with no format = parquet (the configured Delta extension
is unused in the reference; confirmed by the parquet read-back :348).

Scale notes baked in:

* The reference's 6-level partition layout explodes small files at
  100 TB (SURVEY §4). We keep the layout for parity but add
  ``files_per_partition`` — a repartition on the partition columns
  (plus an optional salt for skewed partitions) so each task writes
  one file per directory instead of |tasks| × |partitions| files.
* ``maxRecordsPerFile`` bounds file size without an extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "append",
    fmt: str = "parquet",
    files_per_partition: int | None = 1,
    max_records_per_file: int | None = None,
) -> None:
    """I1 with small-file hygiene. ``files_per_partition=None``
    preserves the reference's raw behavior (one file per task per
    partition value)."""
    if files_per_partition:
        keys = [F.col(c) for c in partition_cols]
        if files_per_partition > 1:
            # Salt so one hot partition value can still fan out to
            # several writers (skew control at scale).
            keys = keys + [(F.spark_partition_id() % files_per_partition)]
        df = df.repartition(*keys)
    writer = df.write.mode(mode).partitionBy(*partition_cols).format(fmt)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.save(path)
