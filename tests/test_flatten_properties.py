"""Property-based flatten tests (SURVEY §5.2): random nested records,
invariants checked against the fixpoint flatten.

Strategy keeps Spark work tiny per example (one-record frames, ≤3
fields per level) and bounds examples so the suite stays fast.
"""

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql.types import ArrayType, StructType

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators.flatten import (
    flatten,
)

_SPARK = None


def _spark():
    # The session-scoped fixture can't be injected into @given bodies;
    # get_spark() returns the conftest session when one exists and
    # bootstraps an equivalent one when the module runs alone.
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


_field_names = st.sampled_from(["a", "b", "c", "d", "e"])
_scalars = st.integers(min_value=-1000, max_value=1000)


def _records(max_depth: int):
    """Nested dict records: scalar leaves, structs at any depth,
    arrays of scalars at the TOP level only (so expected row
    multiplicity has a closed form)."""
    struct_values = st.deferred(
        lambda: st.dictionaries(_field_names, _scalars, min_size=1, max_size=3)
        if max_depth <= 1
        else st.dictionaries(
            _field_names,
            st.one_of(_scalars, _records(max_depth - 1)),
            min_size=1,
            max_size=3,
        )
    )
    return struct_values


_top_level = st.fixed_dictionaries(
    {"id": _scalars},
    optional={
        "s": _records(3),
        "xs": st.lists(_scalars, max_size=3),
        "ys": st.lists(_scalars, max_size=2),
    },
)


def _scalar_leaves(value):
    if isinstance(value, dict):
        for v in value.values():
            yield from _scalar_leaves(v)
    elif isinstance(value, list):
        yield from value
    else:
        yield value


_texts = st.text(
    alphabet=st.characters(
        codec="utf-8",
        categories=("L", "N", "P", "Zs"),
        include_characters=" \t\n\xa0é",
    ),
    max_size=80,
)


@settings(max_examples=20, deadline=None)
@given(text=_texts)
def test_python_tokenizer_twins_match_jvm(text):
    """The Arrow-kernel tokenizer/shingler must agree byte-for-byte
    with the JVM column expressions on arbitrary text (incl. unicode
    whitespace, where python defaults silently diverge)."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        dedup as D,
    )

    spark = _spark()
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        D.tokens_col("text").alias("toks"),
        D.shingles_col(D.tokens_col("text"), 3).alias("sh"),
    ).collect()[0]
    assert row["toks"] == D._python_tokens(text)
    assert sorted(row["sh"]) == sorted(D._python_shingles(text, 3))


@settings(max_examples=15, deadline=None)
@given(record=_top_level)
def test_flatten_invariants(record):
    spark = _spark()
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(record)]))
    out = flatten(df)

    # 1. Output schema is strictly flat.
    assert not any(
        isinstance(f.dataType, (StructType, ArrayType)) for f in out.schema.fields
    )

    # 2. Row multiplicity = product of max(1, len(arr)) over top-level
    #    arrays (explode_outer keeps null/empty rows).
    expected_rows = 1
    for key in ("xs", "ys"):
        if key in record:
            expected_rows *= max(1, len(record[key]))
    rows = out.collect()
    assert len(rows) == expected_rows

    # 3. Every scalar leaf value survives somewhere in the output.
    out_values = {v for r in rows for v in r if v is not None}
    for leaf in _scalar_leaves(record):
        if leaf is not None:
            assert leaf in out_values

    # 4. Deterministic: same plan twice → same sorted rows.
    again = flatten(df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
