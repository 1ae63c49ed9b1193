"""Adjudicate the r15-flagged regressions (VERDICT r15 ask #2).

Times the flagged queries with bench.py's exact protocol (cold count +
3 warm counts, median) under a session-config override, so the r15
`maxShuffledHashJoinLocalMapThreshold` suspicion can be ruled in/out
on a quiet box.  Usage:

    python scripts/adjudicate_r16.py [conf_key=value ...] -- q1,q2,...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    argv = sys.argv[1:]
    if "--" in argv:
        i = argv.index("--")
        confs = dict(a.split("=", 1) for a in argv[:i])
        names = argv[i + 1].split(",")
    else:
        confs = {}
        names = argv[0].split(",") if argv else []

    import __spark_entry__ as entrymod
    from eventhub_to_timescale_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="adjudicate", extra_conf=confs)
    spark.sparkContext.setLogLevel("ERROR")
    # same JVM/Python warmup as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), schema="x int"
    ).count()

    qs = dict(entrymod.queries())
    for name in names:
        spark.sparkContext.setJobDescription(f"adjudicate:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.count()
        cold = time.perf_counter() - t0
        ws = []
        for _ in range(3):
            t1 = time.perf_counter()
            df.count()
            ws.append(time.perf_counter() - t1)
        print(
            f"{name}: cold {cold:.3f} warm-med {statistics.median(ws):.3f} "
            f"warm-min {min(ws):.3f}  conf={confs}"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
