from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.catalog import (
    new_partition_specs,
    partition_schema_for_catalog,
    partitions_ddl,
    schema_for_catalog,
    schema_match,
)


def _schema():
    return StructType(
        [
            StructField("Id", LongType()),
            StructField("count", IntegerType()),
            StructField("name", StringType()),
            StructField("price", DoubleType()),
            StructField("ok", BooleanType()),
            StructField("ts", TimestampType()),
        ]
    )


def test_schema_for_catalog_type_map():
    # Reference swap map (ETL:102-104): Long→bigint, Integer→int,
    # others lowercased bare names; names lowercased.
    entries = schema_for_catalog(_schema())
    assert entries == [
        {"Name": "id", "Type": "bigint"},
        {"Name": "count", "Type": "int"},
        {"Name": "name", "Type": "string"},
        {"Name": "price", "Type": "double"},
        {"Name": "ok", "Type": "boolean"},
        {"Name": "ts", "Type": "timestamp"},
    ]


def test_partition_schema_subset():
    entries = partition_schema_for_catalog(_schema(), ["id", "name"])
    assert [e["Name"] for e in entries] == ["id", "name"]


def test_schema_match_is_type_blind():
    # ETL:121-124 compares names only — a type change is NOT drift.
    curr = [{"Name": "a", "Type": "bigint"}, {"Name": "b", "Type": "string"}]
    prev = [{"Name": "b", "Type": "double"}, {"Name": "a", "Type": "string"}]
    assert schema_match(curr, prev)
    # Added column → drift.
    assert not schema_match(curr + [{"Name": "c", "Type": "int"}], prev)
    # Removed column → drift (length differs).
    assert not schema_match(curr[:1], prev)


def test_new_partition_specs_diff():
    curr = ["year=2024/month=1", "year=2024/month=2"]
    prev = ["year=2024/month=1"]
    assert new_partition_specs(curr, prev) == ["year=2024/month=2"]
    assert new_partition_specs(prev, curr) == []


def test_partitions_ddl_shape():
    ddl = partitions_ddl("db", "t", ["year=2024/month=2", "year=2024/month=3"])
    assert ddl.startswith("ALTER TABLE `db`.`t` ADD IF NOT EXISTS")
    # keys are backticked (reserved-word/special-char safety)
    assert "PARTITION (`year` = '2024', `month` = '2')" in ddl
    assert "PARTITION (`year` = '2024', `month` = '3')" in ddl


def test_analyze_table_records_stats(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.catalog import (
        analyze_table,
    )

    spark.range(500).selectExpr("id", "id % 7 AS grp").write.mode(
        "overwrite"
    ).saveAsTable("stats_demo")
    try:
        out = analyze_table(spark, "stats_demo", columns=["grp"])
        assert out["statistics"] and "bytes" in out["statistics"]
        assert "500 rows" in out["statistics"]
        col = spark.sql("DESCRIBE EXTENDED stats_demo grp").collect()
        got = {r["info_name"]: r["info_value"] for r in col}
        assert got.get("distinct_count") == "7"
    finally:
        spark.sql("DROP TABLE IF EXISTS stats_demo")


def test_partition_specs_null_and_special_values(spark):
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.catalog import (
        partition_specs_from_data,
    )

    df = spark.createDataFrame(
        [("v1", None), ("v2", "c1")], "vehicle string, category string"
    )
    specs = set(partition_specs_from_data(df, ["vehicle", "category"]))
    # NULL maps to Spark's on-disk sentinel instead of silently
    # vanishing from the spec string (the old concat_ws dropped the
    # whole k=v pair, corrupting the ledger and later DDL)
    assert specs == {
        "vehicle=v1/category=__HIVE_DEFAULT_PARTITION__",
        "vehicle=v2/category=c1",
    }

    import pytest

    bad = spark.createDataFrame([("a/b", "c")], "vehicle string, category string")
    with pytest.raises(ValueError, match="partition value"):
        partition_specs_from_data(bad, ["vehicle", "category"])
