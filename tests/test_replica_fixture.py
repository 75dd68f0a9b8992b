"""Pins for the round-12 at-scale events machinery: the replica-offset
fixture generator (tools/gen_scaled_fixtures.write_events_replicas)
and the layout-dispatched streaming reader in __spark_entry__
(_events_stream: single-file driver layout via pathGlobFilter vs
replica DIRECTORY at maxFilesPerTrigger=1). The 10×/100× oracle runs
live in ORACLE_SF01.md; this test keeps the plumbing from silently
regressing at CI scale (2 replicas of sf0.001)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replica_dir(tmp_path_factory):
    from tools.gen_scaled_fixtures import write_events_replicas

    out = str(tmp_path_factory.mktemp("replicas"))
    write_events_replicas(SF_DIR, 2, out)
    return out


def test_replica_fixture_shape(spark, replica_dir):
    """Two replicas: ids strided past the source max, intra-replica
    time deltas preserved exactly, replicas 63 days apart, one
    part-file per replica, and the ts column still µs-typed (the
    whole reason generation goes through DuckDB)."""
    import duckdb

    src = duckdb.sql(
        f"SELECT COUNT(*) n, MAX(event_id) me, MAX(user_id) mu,"
        f" MIN(ts) mnt, MAX(ts) mxt FROM '{SF_DIR}/events.parquet'"
    ).fetchone()
    files = sorted(os.listdir(f"{replica_dir}/events.parquet"))
    parts = [f for f in files if f.endswith(".parquet")]
    assert len(parts) == 2
    # drain order = replica time order: the stream source orders
    # micro-batches by file MTIME, which the generator pins strictly
    # increasing (ties at fs timestamp granularity would let a later
    # replica drain first and watermark-drop every earlier one)
    mtimes = [
        os.stat(os.path.join(replica_dir, "events.parquet", f)).st_mtime
        for f in parts
    ]
    assert mtimes[0] < mtimes[1]

    rep = duckdb.sql(
        f"SELECT COUNT(*) n, COUNT(DISTINCT event_id) de,"
        f" COUNT(DISTINCT user_id) du, MIN(ts) mnt, MAX(ts) mxt"
        f" FROM '{replica_dir}/events.parquet/*.parquet'"
    ).fetchone()
    assert rep[0] == 2 * src[0]
    assert rep[1] == 2 * src[0]  # event ids unique across replicas
    assert rep[3] == src[3]  # replica 0 is byte-identical in time
    # replica 1 = replica 0 shifted by exactly 63 days
    from datetime import timedelta

    assert rep[4] - src[4] == timedelta(days=63)


def test_events_stream_dir_layout_matches_batch_twin(spark, replica_dir):
    """The directory layout drains as one micro-batch per replica file
    and the windowed stream twin still matches its batch twin — the
    sf0.001-scale pin of the 10× tranche-3 result (a reader that,
    like the pre-r12 glob, reads zero rows from a directory source
    fails the matches_batch_twin flag here)."""
    import __spark_entry__ as entry

    out = entry.queries()["stream_windowed_counts"](spark, replica_dir)
    row = out.collect()[0]
    assert row["matches_batch_twin"] is True
    assert row["n_windows"] > 0
