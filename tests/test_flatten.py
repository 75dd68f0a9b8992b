import json

from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, MapType, StructType

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.flatten import (
    explode_arrays,
    flatten,
    flattened_paths,
)


def _df_from_json(spark, records):
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in records])
    )


def _is_flat(df):
    return not any(
        isinstance(f.dataType, (StructType, ArrayType)) for f in df.schema.fields
    )


def test_flatten_depth2_struct(spark):
    df = _df_from_json(
        spark, [{"id": 1, "location": {"lat": 1.5, "lon": -2.5}}]
    )
    out = flatten(df)
    assert set(out.columns) == {"id", "locationLat", "locationLon"}
    row = out.collect()[0]
    assert row["locationLat"] == 1.5 and row["locationLon"] == -2.5


def test_flatten_depth3_full_prefix(spark):
    # Reference's B2 quirk loses the top-level prefix at depth>=3;
    # we keep the full dotted path (SURVEY §7.4 documented deviation).
    df = _df_from_json(spark, [{"a": {"b": {"c": 7}}}])
    out = flatten(df)
    assert out.columns == ["aBC"]
    assert out.collect()[0]["aBC"] == 7


def test_explode_cross_product(spark):
    df = _df_from_json(spark, [{"xs": [1, 2], "ys": ["a", "b", "c"]}])
    out = flatten(df)
    assert out.count() == 6  # sequential explodes → cross-product (ETL:57-61)


def test_explode_outer_null_and_empty(spark):
    df = _df_from_json(
        spark,
        [
            {"id": 1, "xs": [10, 20]},
            {"id": 2, "xs": []},
            {"id": 3, "xs": None},
        ],
    )
    out = flatten(df).orderBy("id", "xs")
    rows = out.collect()
    # explode_outer keeps the empty/null rows with null element
    assert [(r["id"], r["xs"]) for r in rows] == [
        (1, 10),
        (1, 20),
        (2, None),
        (3, None),
    ]


def test_array_of_struct_and_nested_array(spark):
    df = _df_from_json(
        spark,
        [
            {
                "id": 1,
                "readings": [
                    {"sensor": "t", "val": 1.0, "meta": {"unit": "C"}},
                    {"sensor": "p", "val": 2.0, "meta": {"unit": "Pa"}},
                ],
                "tags": ["x", "y"],
            }
        ],
    )
    out = flatten(df)
    assert _is_flat(out)
    assert set(out.columns) == {
        "id",
        "readingsSensor",
        "readingsVal",
        "readingsMetaUnit",
        "tags",
    }
    assert out.count() == 4  # 2 readings × 2 tags


def test_array_of_array(spark):
    df = _df_from_json(spark, [{"m": [[1, 2], [3]]}])
    out = flatten(df)
    assert _is_flat(out)
    assert sorted(r["m"] for r in out.collect()) == [1, 2, 3]


def test_map_passthrough(spark):
    # MapType is invisible to explode and struct expansion (reference
    # parity: ETL:59/:68 check only ArrayType/StructType).
    schema = "id long, props map<string,long>"
    df = spark.createDataFrame([(1, {"k": 2})], schema=schema)
    out = flatten(df)
    assert isinstance(dict(zip(out.columns, [f.dataType for f in out.schema.fields]))["props"], MapType)


def test_flattened_paths_order_and_depth():
    from pyspark.sql.types import LongType, StructField

    schema = StructType(
        [
            StructField("a", LongType()),
            StructField(
                "s",
                StructType(
                    [
                        StructField("x", LongType()),
                        StructField("deep", StructType([StructField("z", LongType())])),
                    ]
                ),
            ),
            StructField("b", LongType()),
        ]
    )
    assert flattened_paths(schema) == ["a", "s.x", "s.deep.z", "b"]


def test_flatten_single_project_plan(spark):
    # The final rename is one Project over the expanded frame — check
    # no UDFs / no extra shuffles appear in the plan.
    df = _df_from_json(spark, [{"id": 1, "s": {"x": 2}, "xs": [1, 2]}])
    plan = flatten(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # flatten must be shuffle-free
    assert "BatchEvalPython" not in plan  # and UDF-free


def test_explode_arrays_matches_reference_single_pass(spark):
    # Top-level arrays only, one pass — parity with ETL:57-61.
    df = _df_from_json(spark, [{"xs": [1, 2], "nested": {"ys": [3, 4]}}])
    out = explode_arrays(df)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert not isinstance(types["xs"], ArrayType)
    assert isinstance(types["nested"], StructType)  # untouched by single pass


def test_flatten_case_insensitive_collision(spark):
    """Columns that differ only in case after camelCasing must be
    disambiguated: Spark's writer rejects duplicates
    case-INsensitively (default caseSensitive=false), so 'ab' + 'aB'
    surviving together would crash the partitioned write."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.functions.naming import (
        standardize_unique,
    )

    out = standardize_unique(["ab", "a.b"])  # both normalize to aB-ish
    names = list(out.values())
    assert len({n.lower() for n in names}) == len(names), names


def test_expand_structs_disambiguates_literal_dotted_key(spark):
    """{"a": {"b": 1}, "a.b": 2}: struct expansion would emit TWO
    columns literally named 'a.b' — ambiguous to every name-based
    reference and silently collapsed by the rename map (r12 review
    find). Both values must survive under distinct names."""
    import json

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.flatten import (
        flatten,
    )

    df = spark.read.json(
        spark.sparkContext.parallelize([json.dumps({"a": {"b": 1}, "a.b": 2})])
    )
    out = flatten(df)
    row = out.collect()[0]
    assert len(out.columns) == 2
    assert len(set(out.columns)) == 2
    assert sorted([row[0], row[1]]) == [1, 2]


def test_qcol_escapes_literal_backtick(spark):
    """A column literally named 'a`b' next to 'ab': stripping the
    backtick resolved the WRONG column (r12 review find); doubling it
    is Spark's escape rule."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.functions.naming import (
        qcol,
    )

    df = spark.createDataFrame([(1, 2)], ["a`b", "ab"])
    assert df.select(qcol("a`b").alias("v")).collect()[0]["v"] == 1
    assert df.select(qcol("ab").alias("v")).collect()[0]["v"] == 2
