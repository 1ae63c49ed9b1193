"""Dump .explain("formatted") for a list of bench queries.

Usage:
    python scripts/dump_plans.py <suffix> <outdir> <query> [<query> ...]

Writes <outdir>/<query>_<suffix>.txt for each query.  Used by the
optimization rounds to pin before/after plans: run at the previous
round's artifact commit (in a worktree) with suffix "before", then at
HEAD with suffix "after".  Construction may execute jobs (eager stage
boundaries run at construction by design) — that is part of the plan
shape being pinned.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from eventhub_to_timescale_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix, outdir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"dump_plans_{suffix}")
    spark.sparkContext.setLogLevel("ERROR")
    bench_queries = dict(entrymod.queries())
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = bench_queries[name](spark, sf_dir)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
            )
        print(f"wrote {path}")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
