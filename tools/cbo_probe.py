"""CBO join-reorder experiment (round-3 follow-up to the round-2
verdict): does cost-based join reordering on ANALYZE TABLE statistics
(`P.catalog.analyze_table`) beat the default AQE-only posture on the
multi-join queries q7/q8/q9?

Method: register the sf tables as session-catalog tables (CBO reads
catalog stats; path-based parquet reads carry none), run each query's
oracle SQL twice per mode (second run = warm), then ANALYZE + enable
``spark.sql.cbo.enabled`` + ``joinReorder.enabled`` and repeat; diff
the optimized-plan join orders.

Recorded result on this box at sf0.01 (2026-08-13):

    AQE-only   q7 0.571  q8 0.632  q9 0.398   (warm)
    CBO+stats  q7 0.583  q8 0.752  q9 0.452   (warm)

    q7 join order AQE: lineitem orders customer supplier nation nation
    q7 join order CBO: supplier nation lineitem customer nation orders

CBO *does* reorder (it builds from the small dimension side), but
wall time is equal-or-worse: every dimension here fits under the
64 MB auto-broadcast threshold, so AQE's runtime re-planning already
broadcasts every small side and the probe-side order barely matters.
Conclusion kept in the engine defaults: CBO off, AQE on. At true
100 TB the calculus can flip where dimension tables exceed the
broadcast threshold — then `analyze_table` + these two flags is the
documented opt-in path (`session.get_spark(extra_conf={...})`).

Usage: python tools/cbo_probe.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entry
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.catalog import (
    analyze_table,
)
from aws_etl_architecture_schedule_based_batch_optimized_emr_etl_using_lambda_with_cloud_watch_logs_spark.session import (
    get_spark,
)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]
QUERIES = ["q7_volume_shipping", "q8_market_share", "q9_product_profit"]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(
        app_name="cbo_probe",
        extra_conf={"spark.sql.cbo.enabled": "false"},
    )
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).saveAsTable(t)
    sqls = {name: entry.oracle_sql()[name] for name in QUERIES}

    def run_all(tag: str) -> None:
        times = {}
        for name, sql in sqls.items():
            start = time.perf_counter()
            spark.sql(sql).count()
            times[name] = round(time.perf_counter() - start, 3)
        print(tag, times)

    run_all("aqe_only_cold")
    run_all("aqe_only_warm")
    for t in TABLES:
        analyze_table(spark, t)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    run_all("cbo_cold")
    run_all("cbo_warm")

    def join_order(plan: str) -> list[str]:
        return re.findall(r"Relation spark_catalog.default.(\w+)", plan)

    spark.conf.set("spark.sql.cbo.enabled", "false")
    p_aqe = (
        spark.sql(sqls["q7_volume_shipping"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    spark.conf.set("spark.sql.cbo.enabled", "true")
    p_cbo = (
        spark.sql(sqls["q7_volume_shipping"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    print("q7 join order aqe:", join_order(p_aqe))
    print("q7 join order cbo:", join_order(p_cbo))
    spark.stop()


if __name__ == "__main__":
    main()
