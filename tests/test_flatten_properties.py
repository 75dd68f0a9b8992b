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
    # grab the active session created by conftest lazily.
    from pyspark.sql import SparkSession

    return SparkSession.active()


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
