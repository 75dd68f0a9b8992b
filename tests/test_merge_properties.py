"""Property test: merge_upsert vs a brute-force reference of the
partition-scoped MERGE semantics the parquet idiom actually has
(NOT ANSI MERGE INTO): the anti-join removes an existing key ONLY
inside partitions the update batch touches — a base row whose key is
updated into a DIFFERENT partition survives in its untouched
partition. Random small frames over a tiny partition domain force
key collisions, cross-partition "moves", empty batches, and
brand-new partition values; a second identical merge pins
idempotence."""

import shutil
import tempfile

from hypothesis import given, settings, strategies as st

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources.writers import (
    merge_upsert,
)


def _spark():
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
        get_spark,
    )

    return get_spark(
        app_name="engine-tests", master="local[4]", shuffle_partitions=4
    )


def _reference_merge(base, updates):
    """Brute-force semantics: rows in untouched partitions survive
    verbatim; rows in touched partitions survive iff their key is
    not an update key; every update row lands."""
    touched = {grp for _, grp, _ in updates}
    update_keys = {k for k, _, _ in updates}
    survivors = [
        row
        for row in base
        if row[1] not in touched or row[0] not in update_keys
    ]
    return sorted(survivors + updates)


# tiny domains so collisions and cross-partition moves are frequent
_row = st.tuples(
    st.integers(0, 7),                     # key
    st.sampled_from(["g1", "g2", "g3"]),   # partition value
    st.integers(0, 99),                    # payload
)


def _dedup_keys(rows):
    """One row per key (updates must be a keyed batch; base too so
    the reference stays a function)."""
    seen, out = set(), []
    for row in rows:
        if row[0] not in seen:
            seen.add(row[0])
            out.append(row)
    return out


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_row, min_size=1, max_size=8),
    st.lists(_row, min_size=0, max_size=6),
)
def test_merge_upsert_matches_partition_scoped_reference(base, updates):
    base, updates = _dedup_keys(base), _dedup_keys(updates)
    spark = _spark()
    cols = ["id", "grp", "val"]
    tmp = tempfile.mkdtemp(prefix="merge_prop_")
    sink = tmp + "/sink"
    try:
        spark.createDataFrame(base, cols).write.partitionBy("grp").parquet(
            sink
        )
        upd_df = spark.createDataFrame(updates, cols) if updates else (
            spark.createDataFrame([], "id bigint, grp string, val bigint")
        )
        stats = merge_upsert(spark, sink, upd_df, ["id"], ["grp"])

        expected = _reference_merge(base, updates)
        got = sorted(
            (r["id"], r["grp"], r["val"])
            for r in spark.read.parquet(sink).collect()
        )
        assert got == expected
        assert stats["rows_written"] == (
            len([r for r in expected if r[1] in {u[1] for u in updates}])
            if updates
            else 0
        )

        # idempotence: the same batch again reproduces the same sink
        merge_upsert(spark, sink, upd_df, ["id"], ["grp"])
        again = sorted(
            (r["id"], r["grp"], r["val"])
            for r in spark.read.parquet(sink).collect()
        )
        assert again == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _reference_merge_with_deletes(base, updates, deletes):
    """Delete-lattice reference: touched = partitions named by EITHER
    batch; inside touched partitions a key dies if it is an update
    key OR a delete key; delete wins over update for a key in both
    (each MERGE source row fires one clause, delete arm first); an
    update row whose key survives the delete filter lands."""
    touched = {grp for _, grp, _ in updates} | {g for _, g in deletes}
    update_keys = {k for k, _, _ in updates}
    delete_keys = {k for k, _ in deletes}
    survivors = [
        row
        for row in base
        if row[1] not in touched
        or (row[0] not in update_keys and row[0] not in delete_keys)
    ]
    landed = [u for u in updates if u[0] not in delete_keys]
    return sorted(survivors + landed)


_del_row = st.tuples(
    st.integers(0, 7),                     # key
    st.sampled_from(["g1", "g2", "g3"]),   # partition value
)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(_row, min_size=1, max_size=8),
    st.lists(_row, min_size=0, max_size=6),
    st.lists(_del_row, min_size=0, max_size=6),
)
def test_merge_delete_arm_matches_reference(base, updates, deletes):
    """The WHEN MATCHED THEN DELETE arm over random frames: key
    collisions across all three frames, delete-wins overlaps,
    deletes into untouched-by-updates partitions, and — via the tiny
    domain — partitions emptied entirely (whose directories must
    actually vanish, or ghost rows survive the dynamic overwrite's
    present-partitions-only replacement)."""
    base, updates = _dedup_keys(base), _dedup_keys(updates)
    deletes = _dedup_keys([(k, g, 0) for k, g in deletes])
    deletes = [(k, g) for k, g, _ in deletes]
    spark = _spark()
    cols = ["id", "grp", "val"]
    tmp = tempfile.mkdtemp(prefix="merge_del_prop_")
    sink = tmp + "/sink"
    try:
        spark.createDataFrame(base, cols).write.partitionBy("grp").parquet(
            sink
        )
        upd_df = spark.createDataFrame(updates, cols) if updates else (
            spark.createDataFrame([], "id bigint, grp string, val bigint")
        )
        del_df = spark.createDataFrame(deletes, ["id", "grp"]) if deletes else (
            spark.createDataFrame([], "id bigint, grp string")
        )
        stats = merge_upsert(
            spark, sink, upd_df, ["id"], ["grp"], deletes=del_df
        )

        expected = _reference_merge_with_deletes(base, updates, deletes)
        # explicit schema: a fully-emptied sink has no files to infer
        # from, and the read must come back EMPTY, not error
        got = sorted(
            (r["id"], r["grp"], r["val"])
            for r in spark.read.schema("id bigint, val bigint, grp string")
            .parquet(sink)
            .collect()
        )
        assert got == expected
        if not updates and not deletes:
            assert stats["rows_deleted"] == 0
            assert stats["emptied_partitions"] == 0

        # idempotence: deletes of now-absent keys are no-ops
        merge_upsert(spark, sink, upd_df, ["id"], ["grp"], deletes=del_df)
        again = sorted(
            (r["id"], r["grp"], r["val"])
            for r in spark.read.schema("id bigint, val bigint, grp string")
            .parquet(sink)
            .collect()
        )
        assert again == expected
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
