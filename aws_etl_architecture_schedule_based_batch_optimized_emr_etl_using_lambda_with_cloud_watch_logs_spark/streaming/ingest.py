"""Structured-Streaming form of the incremental ingest (reference §2.K
consequence: the reference is batch-only; its archive protocol J1
(``emr_json_parquet_schema_drift_etl.py:24-51``) is hand-rolled
micro-batching. The idiomatic Spark equivalent is a file-source stream:

* ``readStream`` + explicit schema (streams cannot infer),
* ``Trigger.AvailableNow`` — process everything present, then stop
  (exactly the reference's scheduled-batch semantics),
* checkpoint — the ingest ledger the reference keeps via file moves,
* ``cleanSource=archive`` — the file-move contract itself, executed
  by Spark after each micro-batch commits.

This scales where J1 doesn't: no driver-side file loop, no re-scan of
the source to list files, exactly-once accounting in the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from ..operators.derive import PARTITION_COLS, with_ingest_columns
from ..operators.flatten import flatten


def stream_ingest(
    spark: SparkSession,
    source_path: str,
    sink_path: str,
    checkpoint_path: str,
    schema: StructType,
    archive_path: str | None = None,
    partition_cols: list[str] | None = None,
    legacy_day: bool = True,
    available_now: bool = True,
) -> StreamingQuery:
    """Streamed JSON→flatten→partitioned-parquet ingest with archival.

    Note: ``flatten`` walks the *static* stream schema, so the
    explode/expand plan is fixed per query — schema drift across
    batches is a batch-mode concern (the ``mergeSchema`` read-back);
    a drifted schema requires restarting the stream with the new
    schema, same as the reference redeploying its ETL.
    """
    partition_cols = partition_cols or PARTITION_COLS

    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1000")
    )
    if archive_path:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_path
        )
    raw = reader.json(source_path)

    denorm = with_ingest_columns(flatten(raw), legacy_day=legacy_day)

    writer = (
        denorm.writeStream.format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy(*partition_cols)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_available_now(query: StreamingQuery, timeout_s: int = 300) -> None:
    """Block until an ``AvailableNow`` ingest drains and stops."""
    query.awaitTermination(timeout_s)
    if query.isActive:
        query.stop()


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling-window count/sum with late-data watermarking — works
    on both a streaming and a batch DataFrame (same plan; in batch the
    watermark is a no-op)."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), F.col("event_type"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("event_type"),
            F.col("n_events"),
            F.col("sum_value"),
        )
    )
