"""Dump ``explain(mode="formatted")`` for named queries of a given
source tree into an output directory — the plan-evidence helper for
the optimization rounds (plans/r13/<query>_{before,after}.txt).

Usage:
    python tools/dump_plans.py <tree_dir> <sf_dir> <out_dir> <suffix> \
        <query> [query ...]

``suffix`` is appended to the file name (``before`` / ``after``).
Runs each query function to build the DataFrame (iterative operators
may legitimately run eager jobs while constructing), then writes the
FORMATTED physical plan of the returned frame.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    tree, sf_dir, out_dir, suffix = (
        os.path.abspath(sys.argv[1]),
        sys.argv[2],
        sys.argv[3],
        sys.argv[4],
    )
    names = sys.argv[5:]
    sys.path.insert(0, tree)

    import __spark_entry__ as entry

    assert entry.__file__.startswith(tree), entry.__file__
    pkg = (
        "aws_etl_architecture_schedule_based_batch_optimized_emr_etl_"
        "using_lambda_with_cloud_watch_logs_spark"
    )
    session = __import__(f"{pkg}.session", fromlist=["get_spark"])
    spark = session.get_spark(app_name="dump_plans")
    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
