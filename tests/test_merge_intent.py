"""r13: crash-consistent batch MERGE (the intent ledger), the
write_salt skew escape hatch, and the relative-path compaction fix.

Plain parquet has no transaction log, so merge_upsert's commit window
(dynamic overwrite → emptied-dir sweep) is torn by a driver crash.
The intent record makes the tear DETECTABLE (next merge raises with
the partition list) and REPLAYABLE (the merge is idempotent over its
touched partitions, so replaying the same batch repairs the sink).
"""

import glob
import os

import pytest

from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources.writers import (
    _write_merge_intent,
    clear_merge_intent,
    merge_upsert,
    read_merge_intent,
    write_partitioned,
)


def _rows(spark, sink, schema="id bigint, val bigint, grp string"):
    return sorted(
        (r["id"], r["grp"], r["val"])
        for r in spark.read.schema(schema).parquet(sink).collect()
    )


def test_successful_merge_leaves_no_intent(spark, tmp_path):
    sink = str(tmp_path / "sink")
    spark.createDataFrame(
        [(1, "g1", 10), (2, "g2", 20)], ["id", "grp", "val"]
    ).write.partitionBy("grp").parquet(sink)
    upd = spark.createDataFrame([(1, "g1", 11)], ["id", "grp", "val"])
    merge_upsert(spark, sink, upd, ["id"], ["grp"])
    assert read_merge_intent(spark, sink) is None
    # the intent file must never surface as data in a sink read
    assert _rows(spark, sink) == [(1, "g1", 11), (2, "g2", 20)]


def test_torn_commit_detected_and_replay_recovers(spark, tmp_path):
    """Construct the EXACT mid-crash state — overwrite landed, but
    the crash hit before the emptied-dir removal: the updated
    partition holds post-merge rows, the fully-deleted partition
    still holds its old files (dynamic overwrite skips partitions
    absent from the output), and the intent record survives. The next
    merge must refuse to compute survivors from that mixed sink; the
    documented recovery (clear + replay the same batch) must converge
    to the correct final state."""
    sink = str(tmp_path / "sink")
    base = [(1, "g1", 10), (2, "g1", 20), (3, "g2", 30)]
    spark.createDataFrame(base, ["id", "grp", "val"]).write.partitionBy(
        "grp"
    ).parquet(sink)
    # the batch: update id=1 in g1, delete every g2 row (empties g2)
    upd = spark.createDataFrame([(1, "g1", 11)], ["id", "grp", "val"])
    dels = spark.createDataFrame([(3, "g2")], ["id", "grp"])

    # Mid-crash state: apply only the g1 overwrite (a merge without
    # the delete arm), leave g2's old files in place, then plant the
    # intent record the crashed merge would have written.
    merge_upsert(spark, sink, upd, ["id"], ["grp"])
    assert os.path.isdir(os.path.join(sink, "grp=g2"))
    _write_merge_intent(
        spark,
        sink,
        {"touched": [{"grp": "g1"}, {"grp": "g2"}], "emptied": [{"grp": "g2"}]},
    )

    # detection: the next merge raises, naming the torn partitions
    with pytest.raises(IOError, match="torn merge commit.*g2"):
        merge_upsert(spark, sink, upd, ["id"], ["grp"], deletes=dels)
    # the sink was not touched by the refused merge
    assert os.path.isdir(os.path.join(sink, "grp=g2"))

    # recovery: clear, replay the SAME batch → correct final state
    assert clear_merge_intent(spark, sink)
    stats = merge_upsert(spark, sink, upd, ["id"], ["grp"], deletes=dels)
    assert _rows(spark, sink) == [(1, "g1", 11), (2, "g1", 20)]
    assert not os.path.isdir(os.path.join(sink, "grp=g2"))
    assert stats["emptied_partitions"] == 1
    assert read_merge_intent(spark, sink) is None


def test_intent_readback_roundtrip(spark, tmp_path):
    sink = str(tmp_path / "sink")
    os.makedirs(sink)
    payload = {"touched": [{"day": "2024-01-01"}], "emptied": []}
    _write_merge_intent(spark, sink, payload)
    assert read_merge_intent(spark, sink) == payload
    assert clear_merge_intent(spark, sink)
    assert read_merge_intent(spark, sink) is None
    assert not clear_merge_intent(spark, sink)  # idempotent


def test_write_salt_fans_out_hot_partition(spark, tmp_path):
    """write_salt=4 must fan a hot partition's rewrite across several
    files/writers (the documented skew trade-off) without changing
    the merged contents."""
    sink = str(tmp_path / "sink")
    base = [(i, "hot", i * 10) for i in range(200)] + [(500, "cold", 1)]
    spark.createDataFrame(base, ["id", "grp", "val"]).write.partitionBy(
        "grp"
    ).parquet(sink)
    upd = spark.createDataFrame(
        [(i, "hot", i * 10 + 1) for i in range(50)], ["id", "grp", "val"]
    )
    merge_upsert(spark, sink, upd, ["id"], ["grp"], write_salt=4)
    hot_files = glob.glob(os.path.join(sink, "grp=hot", "*.parquet"))
    assert len(hot_files) >= 2
    expected = sorted(
        [(i, "hot", i * 10 + 1) for i in range(50)]
        + [(i, "hot", i * 10) for i in range(50, 200)]
        + [(500, "cold", 1)]
    )
    assert _rows(spark, sink) == expected


def test_salted_fanout_accepts_map_columns(spark, tmp_path):
    """r13 review find: Spark refuses xxhash64 on MAP inputs, so the
    deterministic-salt rework would have broken files_per_partition>1
    for any frame carrying a map column (the pipeline's flattened
    JSON and the events props are exactly that shape) — map-typed
    columns are routed through to_json before hashing."""
    sink = str(tmp_path / "sink")
    df = spark.createDataFrame(
        [(i, "g1", {"k": f"v{i}"}) for i in range(40)],
        "id bigint, grp string, props map<string,string>",
    )
    write_partitioned(df, sink, ["grp"], files_per_partition=4)
    files = glob.glob(os.path.join(sink, "grp=g1", "*.parquet"))
    assert len(files) >= 2  # the salt actually fanned out
    back = spark.read.parquet(sink)
    assert back.count() == 40
    assert back.filter("props['k'] = 'v7'").count() == 1


def test_compact_partitions_relative_path(spark, tmp_path):
    """r12 ADVICE: with a RELATIVE sink path the listed file paths
    are absolute while the unqualified root was relative — the strip
    prefix never matched and compaction silently reported
    compacted=0. makeQualified fixes it. Spark resolves relative
    paths against the JVM's user.dir (not the Python cwd), so the
    relative path is computed against that."""
    from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.sources.writers import (
        compact_partitions,
    )

    sink = str(tmp_path / "relsink")
    df = spark.createDataFrame(
        [(i, "g1" if i % 2 else "g2", float(i)) for i in range(40)],
        ["id", "grp", "val"],
    ).repartition(4)
    write_partitioned(df, sink, ["grp"], files_per_partition=None)
    write_partitioned(df, sink, ["grp"], files_per_partition=None)
    assert len(glob.glob(f"{sink}/*/*.parquet")) > 2
    jvm_cwd = spark._jvm.java.lang.System.getProperty("user.dir")
    rel = os.path.relpath(sink, start=jvm_cwd)
    assert not os.path.isabs(rel)
    stats = compact_partitions(spark, rel, ["grp"], target_files=1)
    assert stats["compacted"] == 2
    assert len(glob.glob(f"{sink}/*/*.parquet")) == 2
    assert spark.read.parquet(sink).count() == 80
