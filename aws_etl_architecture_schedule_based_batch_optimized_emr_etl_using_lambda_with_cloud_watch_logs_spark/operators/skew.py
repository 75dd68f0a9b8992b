"""Skew-mitigation utilities (charter §partitioning-and-shuffle).

AQE's skew-join split (enabled in ``session.py``) handles sort-merge
join skew at runtime. Explicit salting remains the tool for the cases
AQE does not rebalance: hash-aggregations on hot grouping keys, and
joins where the skewed side must stay hash-partitioned. Both helpers
preserve exact results — they only re-shape the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, col_name: str = "_salt") -> DataFrame:
    """Uniform salt in [0, n). ``rand`` is seeded per-task — the
    assignment is arbitrary but any assignment is correct; salting
    never changes results, only shuffle balance."""
    return df.withColumn(col_name, (F.rand(seed=42) * n).cast("int"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join where ``left`` has skewed keys: salt the left side,
    replicate the right side ``salt`` times (explode a salt array),
    join on (keys + salt). One hot key's straggler task becomes
    ``salt`` parallel tasks at the cost of ``salt``× the right-side
    shuffle volume — use when the right side is the smaller one but
    too big to broadcast."""
    salted_left = with_salt(left, salt)
    replicated_right = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = salted_left.join(replicated_right, [*on, "_salt"], how)
    return out.drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Aggregation on hot keys in two shuffles: partial aggregate on
    (keys + salt) — splitting each hot key across ``salt`` reducers —
    then final merge on the keys. ``aggs`` maps output name →
    (column, fn) for algebraic fns (sum/count/min/max) whose partials
    merge losslessly: count merges by sum, the rest by themselves.
    """
    mergers = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    partial = with_salt(df, salt).groupBy(*key_cols, "_salt").agg(
        *[
            mergers[fn](col).alias(f"_p_{name}")
            for name, (col, fn) in aggs.items()
        ]
    )
    final_fns = {
        name: (F.sum if fn == "count" else mergers[fn])
        for name, (_, fn) in aggs.items()
    }
    return partial.groupBy(*key_cols).agg(
        *[final_fns[name](f"_p_{name}").alias(name) for name in aggs]
    )
