"""Declarative data-quality expectations over warehouse tables — the
dbt-tests / Deequ-style audit surface an ETL pipeline runs after
every load (the reference's catalog-registration step implicitly
trusts its sink; production pipelines verify it — SURVEY §2 H/I
context). Each expectation compiles to ONE aggregate (or one
anti-join + aggregate) over the audited table: linear scans,
map-side-combined counts, no row-level materialization of violations
— at 100 TB the audit costs a handful of column-pruned passes, and
the checks over the same table can share one scan via a single
multi-aggregate when wired through :func:`expectation_report`.

Every helper returns a 1-row DataFrame (check_name, n_violations);
:func:`expectation_report` unions them and derives the pass flag —
deterministic integers end-to-end, so the report is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one(df: DataFrame, check: str, violations: Column) -> DataFrame:
    # coalesce: SUM over an EMPTY table is NULL, which would ripple
    # to passed=NULL in the report — a check that silently vanishes
    # from both the pass and the fail filter. Zero rows violate
    # nothing, so the empty-table convention is 0.
    return df.agg(
        F.lit(check).alias("check_name"),
        F.coalesce(violations.cast("bigint"), F.lit(0)).alias(
            "n_violations"
        ),
    )


def pk_unique(df: DataFrame, key_col: str, check: str) -> DataFrame:
    """Duplicate-key row count: COUNT(*) − COUNT(DISTINCT key) — zero
    when the column is a primary key. One aggregate, no self-join."""
    return _one(
        df,
        check,
        F.count(F.col(key_col)) - F.count_distinct(F.col(key_col)),
    )


def not_null(df: DataFrame, col: str, check: str) -> DataFrame:
    """Null count of a required column."""
    return _one(
        df, check, F.sum(F.col(col).isNull().cast("bigint"))
    )


def in_range(
    df: DataFrame, col: str, lo, hi, check: str
) -> DataFrame:
    """Rows outside [lo, hi] (nulls count as violations — a required
    measure that is absent is as wrong as one out of range)."""
    ok = F.col(col).between(F.lit(lo), F.lit(hi))
    return _one(
        df, check, F.sum((~F.coalesce(ok, F.lit(False))).cast("bigint"))
    )


def fk_covered(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    check: str,
) -> DataFrame:
    """Orphaned-foreign-key row count via LEFT ANTI join (compiles to
    a broadcast/shuffled hash anti-join — never a NOT IN scan).

    NULL child keys are NOT orphans — an optional relationship's
    absent value is the `not_null` check's business, matching dbt's
    relationships test and Deequ (a NULL key never equi-joins, so it
    would otherwise count as an orphan on a perfectly valid table)."""
    orphans = (
        child.select(F.col(child_col).alias("_fk"))
        .filter(F.col("_fk").isNotNull())
        .join(
            parent.select(F.col(parent_col).alias("_fk")),
            "_fk",
            "left_anti",
        )
    )
    return orphans.agg(
        F.lit(check).alias("check_name"),
        F.count(F.lit(1)).cast("bigint").alias("n_violations"),
    )


def accepted_values(
    df: DataFrame, col: str, values: list, check: str
) -> DataFrame:
    """Rows whose value is outside the accepted set (nulls violate)."""
    ok = F.col(col).isin(values)
    return _one(
        df, check, F.sum((~F.coalesce(ok, F.lit(False))).cast("bigint"))
    )


def expectation_report(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row expectation frames into the audit report
    (check_name, n_violations, passed). The union of k 1-row aggregates is
    k independent jobs fused by Spark into one stage DAG; sorting is
    left to the caller (the report is row-order-insensitive)."""
    out = checks[0]
    for c in checks[1:]:
        out = out.union(c)
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )
