"""Same-box control pair for individual bench queries (round-10
verdict task #3): run the named queries once in a fresh process
against a given source tree, print per-query wall seconds as one JSON
line. The caller interleaves HEAD / control invocations and takes the
min per tree — the per-QUERY analogue of the whole-suite control
pairs recorded in BASELINE.md (cross-session totals are
non-comparable on this box; only same-box pairs are evidence).

Usage: python tools/pair_probe.py <tree_dir> <sf_dir> <query> [query...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    tree, sf_dir, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    tree = os.path.abspath(tree)
    sys.path.insert(0, tree)
    os.environ["PYTHONPATH"] = tree + os.pathsep + os.environ.get(
        "PYTHONPATH", ""
    )

    import __spark_entry__ as entry

    pkg = (
        "aws_etl_architecture_schedule_based_batch_optimized_emr_etl_"
        "using_lambda_with_cloud_watch_logs_spark"
    )
    assert entry.__file__.startswith(tree), entry.__file__
    session = __import__(f"{pkg}.session", fromlist=["get_spark"])

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = session.get_spark(
        app_name="pair-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    queries = entry.queries()
    # same steady-state warmup as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    queries["q1_pricing_summary"](spark, sf_dir).count()

    out: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        queries[name](spark, sf_dir).count()
        out[name] = round(time.perf_counter() - t0, 4)
    spark.stop()
    print(json.dumps({"tree": tree, "queries": out}), file=sys.stderr)
    with open(os.environ.get("PAIR_PROBE_OUT", "/dev/stdout"), "a") as f:
        f.write(json.dumps({"tree": os.path.basename(tree), **out}) + "\n")


if __name__ == "__main__":
    main()
