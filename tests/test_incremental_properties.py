"""Property-based invariant for the materialized-aggregate refresh
path (operators/incremental.py): for ANY corpus and ANY split into
batches A/B, merge(state(A), state(B)) must equal state(A ∪ B)
bit-for-bit — counts, decimal sums, min/max, per group, including
groups present in only one batch and groups whose measure is NULL in
every row of one side. The example-based tests pin specific merges;
this pins the algebra the module's exactness contract claims
(decimal(38,4) is a fixed point of the merge lattice, so the sum is
associative/commutative regardless of partitioning)."""

from decimal import Decimal

from hypothesis import given, settings, strategies as st


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


# Small key domain forces every interesting overlap shape (shared
# groups, A-only, B-only); values are 4-dp decimals spanning signs
# and magnitudes near the 18,4 per-row cast, plus NULLs.
_row = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.one_of(
        st.none(),
        st.integers(min_value=-10**13, max_value=10**13).map(
            lambda u: Decimal(u).scaleb(-4)
        ),
    ),
)
_rows = st.lists(_row, min_size=0, max_size=24)


def _state_map(rows):
    out = {}
    for r in rows:
        out[r.k] = (r.n_rows, r.m_sum, r.m_min, r.m_max)
    return out


@settings(max_examples=15, deadline=None)
@given(rows=_rows, split=st.integers(min_value=0, max_value=24))
def test_merge_of_any_split_equals_direct_state(rows, split):
    from pyspark.sql.types import (
        DecimalType,
        IntegerType,
        StructField,
        StructType,
    )

    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.operators import (
        incremental as INC,
    )

    spark = _spark()
    split = min(split, len(rows))
    a_rows, b_rows = rows[:split], rows[split:]
    schema = StructType(
        [
            StructField("k", IntegerType(), False),
            StructField("v", DecimalType(18, 4), True),
        ]
    )
    full = spark.createDataFrame(rows, schema)
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)

    direct = _state_map(INC.additive_agg_state(full, ["k"], "v").collect())
    merged_df = INC.merge_agg_states(
        INC.additive_agg_state(a, ["k"], "v"),
        INC.additive_agg_state(b, ["k"], "v"),
        ["k"],
    )
    # the merged state must still be mergeable (schema is a lattice
    # fixed point): dtype check is part of the invariant
    assert dict(merged_df.dtypes)["m_sum"] == "decimal(38,4)"
    merged = _state_map(merged_df.collect())

    # empty batches produce empty states; merge of the two must still
    # reproduce the direct state over the (possibly empty) union
    assert merged == direct
