"""Slowly-changing-dimension maintenance (SCD Type 2) as a pure
DataFrame transform — the warehouse-side MERGE the reference's
catalog-registration flow would need the day a dimension attribute
starts changing (its ETL only appends facts; SURVEY §2 H/I context).
Delta's MERGE INTO is the transactional wrapper for this at 100 TB;
the TRANSFORM itself — which rows close, which insert, which pass
through — is engine-neutral and what this module implements, so the
same logic drives a parquet rewrite here and a Delta MERGE where
available (mirroring the parquet/Delta dual-sink stance in
sources/writers.py).

Plan shape: one key-partitioned join of the CURRENT slice against
the update batch (history rows never enter the join — they pass
through untouched), two semi/anti probes of the (small) changed-key
frame, and a unionByName. Linear in |current| + |updates|; at scale
the dimension is bucketed by key so the join is co-located, and the
changed-key frame broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(
    dim: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_ts: str,
) -> DataFrame:
    """Bootstrap a bare dimension into SCD2 shape: every row current
    from ``effective_ts``, open-ended."""
    return dim.select(
        key_col,
        *tracked_cols,
        F.lit(effective_ts).cast("timestamp").alias("effective_from"),
        F.lit(None).cast("timestamp").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_merge(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    effective_ts: str,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension at ``effective_ts``:

    * key in both, any tracked column differs (null-safe) → the
      current row CLOSES (effective_to = ts, is_current = false) and
      the update INSERTS as the new current version;
    * key in both, nothing differs → the current row passes through
      (idempotent no-op — re-running the same batch changes nothing);
    * key only in updates → plain insert;
    * key only in current → passes through (no implicit deletes —
      deletions are a governance decision, see operators/governance).

    History rows (is_current = false) never enter the join. Returns
    the full new dimension state."""
    from pyspark.sql import Window

    ts = F.lit(effective_ts).cast("timestamp")
    cur = current.filter(F.col("is_current"))
    hist = current.filter(~F.col("is_current"))
    u = updates.select(key_col, *tracked_cols)
    # A batch with duplicate keys would insert multiple
    # is_current=true rows for the same key — permanently corrupting
    # the dimension and fanning out every later merge's current-side
    # join. Assert uniqueness in-plan (one batch-sized window, no
    # driver action); a CDC feed with several changes per key must
    # collapse to last-change-wins BEFORE the merge.
    kw = Window.partitionBy(key_col)
    u = (
        u.withColumn("_kcnt", F.count(F.lit(1)).over(kw))
        .withColumn(
            "_key_ok",
            F.assert_true(
                F.col("_kcnt") == 1,
                F.lit(
                    "scd2_merge: update batch contains duplicate "
                    "keys - collapse to one change per key per batch"
                ),
            ),
        )
        .filter(F.col("_key_ok").isNull())  # keeps the assert live
        .drop("_kcnt", "_key_ok")
    )

    diff = F.lit(False)
    for c in tracked_cols:
        diff = diff | ~F.col(f"c.{c}").eqNullSafe(F.col(f"u.{c}"))
    chg_keys = (
        cur.alias("c")
        .join(u.alias("u"), key_col)
        .filter(diff)
        .select(key_col)
    )
    new_keys = u.select(key_col).join(
        cur.select(key_col), key_col, "left_anti"
    )

    kept = cur.join(chg_keys, key_col, "left_anti")
    closed = (
        cur.join(chg_keys, key_col, "left_semi")
        .withColumn("effective_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    inserted = (
        u.join(chg_keys.union(new_keys), key_col, "left_semi")
        .withColumn("effective_from", ts)
        .withColumn(
            "effective_to", F.lit(None).cast("timestamp")
        )
        .withColumn("is_current", F.lit(True))
    )
    return (
        hist.unionByName(kept)
        .unionByName(closed)
        .unionByName(inserted)
    )
