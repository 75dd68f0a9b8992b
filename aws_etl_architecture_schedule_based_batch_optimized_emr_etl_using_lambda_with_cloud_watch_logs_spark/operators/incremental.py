"""Incremental materialized-aggregate maintenance: keep a grouped
aggregate fresh by MERGING the partial state of a new batch into the
stored state, never rescanning history — the materialized-view
refresh pattern that turns an O(100 TB) nightly rollup into an
O(batch) one. Only ALGEBRAIC aggregates participate (count/sum/
min/max — and avg as sum÷count at read time): their states merge by
the same operation that built them, so merge(state(A), state(B)) ==
state(A ∪ B) exactly (integer/decimal sums are order-independent).
Holistic aggregates (median, distinct) need sketches instead — see
operators/sketch.py (HLL/count-min), which follow the same
build-merge contract.

Plan shape: building a state is one map-side-combined hash
aggregate over the batch; merging is a full-outer join (or union +
re-aggregate, chosen here: simpler, same shuffle) on the group keys
over two STATE-sized frames — the fact table is never touched after
its batch lands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def additive_agg_state(
    df: DataFrame,
    keys: list[str],
    measure: str,
    decimal: bool = True,
) -> DataFrame:
    """Partial aggregate state for one measure: (keys, n_rows,
    m_sum, m_min, m_max). ``decimal=True`` sums through
    DECIMAL(18,4) (exact, order-independent — the money-sum
    convention) and KEEPS the state sum as DECIMAL(38,4): exposing
    it as double rounded per-state sums to ~15 significant digits,
    so at large totals merge(state(A), state(B)) could diverge from
    state(A ∪ B) by ulps despite the exactness contract. 38,4 is a
    fixed point in the merge lattice (Spark caps decimal-sum
    precision growth at 38), so states union schema-stably through
    arbitrary merge chains; cast to double at read/display time."""
    m = F.col(measure)
    s = (
        F.sum(m.cast("decimal(18,4)")).cast("decimal(38,4)")
        if decimal
        else F.sum(m)
    )
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        s.alias("m_sum"),
        F.min(m).alias("m_min"),
        F.max(m).alias("m_max"),
    )


def merge_agg_states(
    a: DataFrame, b: DataFrame, keys: list[str], decimal: bool = True
) -> DataFrame:
    """Merge two partial states: counts add, sums add (through the
    same decimal lattice they were built in), min/max fold. Groups
    present in only one state pass through — union + one re-aggregate
    over the two STATE-sized frames.

    Guard: with ``decimal=True`` BOTH inputs must already carry
    m_sum as decimal(38,4). unionByName of a stale pre-round-9
    persisted state (double) with a decimal state would coerce both
    sides to double — silently restoring exactly the lossy path the
    decimal lattice removed — so a mixed-lattice merge fails loudly
    instead."""
    if decimal:
        for name, df in (("a", a), ("b", b)):
            dt = dict(df.dtypes).get("m_sum")
            if dt != "decimal(38,4)":
                raise TypeError(
                    f"merge_agg_states(decimal=True): input {name!r} "
                    f"carries m_sum as {dt}, not decimal(38,4) — a "
                    f"stale pre-decimal persisted state would merge "
                    f"lossily through double; rebuild it with "
                    f"additive_agg_state(decimal=True) or pass "
                    f"decimal=False explicitly"
                )
    u = a.unionByName(b)
    # decimal states sum natively (DECIMAL(38,4) in, 38,4 out — no
    # round-trip through double, which was the one lossy step in the
    # pre-round-9 lattice)
    s = (
        F.sum("m_sum").cast("decimal(38,4)")
        if decimal
        else F.sum("m_sum")
    )
    return u.groupBy(*keys).agg(
        F.sum("n_rows").cast("bigint").alias("n_rows"),
        s.alias("m_sum"),
        F.min("m_min").alias("m_min"),
        F.max("m_max").alias("m_max"),
    )
