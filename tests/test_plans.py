"""Physical-plan invariants (the 100 TB posture, pinned).

These tests build plans only (no execution) — Catalyst analysis and
physical planning happen on the driver, so auditing all queries is
cheap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import __spark_entry__ as entry
from plan_audit import ARROW_STAGE_OK, audit_one, formatted_plan

SF_DIR = "/root/testdata/sf0.001"


def test_no_cartesian_no_row_python_anywhere(spark):
    bad = {}
    for name, fn in entry.queries().items():
        row = audit_one(name, fn(spark, SF_DIR))
        if row["cartesian"]:
            bad[name] = "CartesianProduct"
        if row["row_python"]:
            bad[name] = "BatchEvalPython (row-at-a-time Python UDF)"
        if row["arrow_python"] and name not in ARROW_STAGE_OK:
            bad[name] = "unexpected Python stage"
    assert not bad, bad


def test_filter_pushdown_reaches_scan(spark):
    # q1 filters l_shipdate on the base table: must appear as a
    # pushed parquet filter, and the scan must not read all columns.
    row = audit_one("q1", entry.queries()["q1_pricing_summary"](spark, SF_DIR))
    assert row["n_pushed"] >= 1
    assert max(row["scan_widths"]) <= 7  # 7 of 11 lineitem cols used


def test_topk_uses_take_ordered(spark):
    # orderBy().limit() must compile to TakeOrderedAndProject, not a
    # global sort.
    row = audit_one("topk", entry.queries()["topk_orders"](spark, SF_DIR))
    assert row["take_ordered"]


def test_semi_anti_compile_to_joins(spark):
    plan = formatted_plan(entry.queries()["join_semi_suppliers"](spark, SF_DIR))
    assert "LeftSemi" in plan
    plan = formatted_plan(entry.queries()["join_anti_customers"](spark, SF_DIR))
    assert "LeftAnti" in plan
