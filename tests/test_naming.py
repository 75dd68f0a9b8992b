from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.functions.naming import (
    standardize_col_name,
    standardize_unique,
)


def test_standardize_basic():
    # Parity table with the reference implementation (ETL:78-84).
    assert standardize_col_name("a.b.c") == "aBC"
    assert standardize_col_name("location.lat") == "locationLat"
    assert standardize_col_name("readings.meta.unit") == "readingsMetaUnit"
    assert standardize_col_name("plain") == "plain"
    assert standardize_col_name("already.Upper") == "alreadyUpper"
    assert standardize_col_name("snake_case.col_name") == "snake_caseCol_name"


def test_standardize_edge_cases():
    assert standardize_col_name("") == ""
    assert standardize_col_name("a.") == "a"  # trailing dot: no char to upcase
    assert standardize_col_name(".b") == "B"
    assert standardize_col_name("a..b") == "a.B".replace(".", "")  # "aB"


def test_standardize_unique_collisions():
    # "a.b" and "aB" both standardize to "aB" — must disambiguate.
    mapping = standardize_unique(["a.b", "aB", "aB_2", "x"])
    assert mapping["a.b"] == "aB"
    assert mapping["aB"] == "aB_2"
    assert len(set(mapping.values())) == 4
    assert mapping["x"] == "x"
