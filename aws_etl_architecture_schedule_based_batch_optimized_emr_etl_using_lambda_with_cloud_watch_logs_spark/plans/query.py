"""Ad-hoc SQL surface — the reference's Athena side (SURVEY §3.2,
``emr_json_parquet_schema_drift_etl.py:143-169``), rebuilt as
``spark.sql``: synchronous, no polling, returns a DataFrame.

``register_tables`` stands in for the Glue catalog the reference's
Athena queries resolve against: every fixture table becomes a temp
view, after which arbitrary SQL (joins, windows, aggregates) runs
against them exactly as Athena would over the cataloged sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Register the parquet fixture tables as temp views (the Glue
    catalog stand-in for ad-hoc SQL)."""
    # events.parquet stores ns timestamps, which the parquet reader
    # rejects unless read as longs (same policy as the entry module's
    # _events helper).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(
            name
        )


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """The whole of the reference's execute_athena_query +
    wait_for_query_execution + get_query_results chain (ETL:143-181),
    synchronously."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
