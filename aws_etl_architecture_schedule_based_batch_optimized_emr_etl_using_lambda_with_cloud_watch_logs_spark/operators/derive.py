"""Derived ingest/partition columns (reference B5,
``emr_json_parquet_schema_drift_etl.py:326-331``).

The reference derives, from an epoch-seconds ``tts`` column:

* ``row_insert_tsp`` — ``from_unixtime(tts)`` (a *string* timestamp)
* ``row_insert_date`` — ``to_date(row_insert_tsp)``
* ``year``, ``month`` — ints
* ``day`` — ``date_format(date, "d")``: a **non-zero-padded string**
  (:331). That quirk affects partition directory names ("day=3" vs
  "day=03") and lexical sort order; we keep it by default for parity
  and offer ``legacy_day=False`` for a proper int ``dayofmonth``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_COLS = ["customerid", "vehicle", "category", "year", "month", "day"]


def with_ingest_columns(
    df: DataFrame, tts_col: str = "tts", legacy_day: bool = True
) -> DataFrame:
    """Append the reference's derived timestamp/partition columns."""
    df = (
        df.withColumn("row_insert_tsp", F.from_unixtime(tts_col))
        .withColumn("row_insert_date", F.to_date("row_insert_tsp"))
        .withColumn("year", F.year(F.col("row_insert_date")))
        .withColumn("month", F.month(F.col("row_insert_date")))
    )
    if legacy_day:
        df = df.withColumn("day", F.date_format(F.col("row_insert_date"), "d"))
    else:
        df = df.withColumn("day", F.dayofmonth(F.col("row_insert_date")))
    return df
