"""Per-query profiler for the optimization rounds (guide §1).

Runs ONE bench query exactly the way bench.py does (construct → cold
count → 3 warm counts → clearCache), with the Spark event log enabled,
then breaks the wall clock down from the event log: per-job wall time
(with job descriptions), stage task counts, shuffle bytes, and the gap
between jobs (driver-side planning/scheduling time — invisible in any
stage metric but very real at bench scale).

Usage:
    python scripts/profile_query.py <query> [<query> ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_query.py pipeline_curation_full

Writes the formatted plan to plans/r15/<query>_profile.txt unless
--no-plan.  Pure diagnostics: never touched by bench.py or the driver.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from eventhub_to_timescale_spark.session import get_spark  # noqa: E402


def _read_events(log_dir: str) -> list[dict]:
    evs = []
    paths = []
    for root, _dirs, files in os.walk(log_dir):
        paths.extend(os.path.join(root, f) for f in files)
    for p in paths:
        if "appstatus" in os.path.basename(p):
            continue
        with open(p) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    try:
                        evs.append(json.loads(line))
                    except ValueError:
                        pass
    return evs


def _analyze(evs: list[dict], t_lo: float, t_hi: float, label: str) -> None:
    """Print job/stage breakdown for events in the [t_lo, t_hi] window
    (epoch millis)."""
    jobs = {}
    for e in evs:
        if e.get("Event") == "SparkListenerJobStart":
            ts = e["Submission Time"]
            if t_lo <= ts <= t_hi:
                jobs[e["Job ID"]] = {
                    "start": ts,
                    "desc": (e.get("Properties") or {}).get(
                        "spark.job.description", ""
                    ),
                    "stages": {
                        s["Stage ID"]: {
                            "name": s["Stage Name"].split("\n")[0][:60],
                            "tasks": s["Number of Tasks"],
                        }
                        for s in e.get("Stage Infos", [])
                    },
                }
        elif e.get("Event") == "SparkListenerJobEnd":
            j = jobs.get(e["Job ID"])
            if j:
                j["end"] = e["Completion Time"]
    # stage completions carry shuffle/task metrics
    stage_metrics = {}
    for e in evs:
        if e.get("Event") == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            ts = si.get("Completion Time", 0)
            if t_lo <= ts <= t_hi:
                stage_metrics[si["Stage ID"]] = {
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0)
                    - si.get("Submission Time", si.get("Completion Time", 0)),
                }
    print(f"\n--- {label}: {len(jobs)} jobs ---")
    prev_end = None
    tot_job_ms = 0
    tot_gap_ms = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = j["end"] - j["start"]
        tot_job_ms += dur
        gap = ""
        if prev_end is not None:
            g = j["start"] - prev_end
            tot_gap_ms += max(g, 0)
            gap = f" (+{g}ms gap)"
        prev_end = j["end"]
        ntasks = sum(
            stage_metrics.get(sid, s)["tasks"] for sid, s in j["stages"].items()
        )
        stage_strs = [
            f"{s['name']}[{stage_metrics.get(sid, {}).get('ms', '?')}ms/"
            f"{s['tasks']}t]"
            for sid, s in sorted(j["stages"].items())
        ]
        print(
            f"  job {jid}: {dur}ms {ntasks}tasks{gap}  "
            f"{j['desc'][:40]}  stages: {' '.join(stage_strs)[:160]}"
        )
    span = t_hi - t_lo
    print(
        f"  total: window={span:.0f}ms in-jobs={tot_job_ms}ms "
        f"gaps-between-jobs={tot_gap_ms}ms "
        f"outside-jobs={span - tot_job_ms - tot_gap_ms:.0f}ms"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_plan = "--no-plan" not in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_dir = tempfile.mkdtemp(prefix="sparkevlog_")
    spark = get_spark(
        app_name="profile",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = dict(entrymod.queries())

    # same warmup as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), schema="x int"
    ).count()

    windows = []  # (name, label, t_lo, t_hi)
    for name in args:
        fn = bench_queries[name]
        spark.sparkContext.setJobDescription(f"{name}: construct+cold")
        t0 = time.time()
        df = fn(spark, sf_dir)
        t_constructed = time.time()
        n = df.count()
        t_cold = time.time()
        warms = []
        for i in range(3):
            spark.sparkContext.setJobDescription(f"{name}: warm{i}")
            t1 = time.time()
            df.count()
            warms.append(time.time() - t1)
        t_end = time.time()
        spark.sparkContext.setJobDescription(None)
        print(
            f"\n=== {name}: construct={t_constructed-t0:.3f}s "
            f"cold={t_cold-t_constructed:.3f}s "
            f"warm={[round(w,3) for w in warms]} rows={n}"
        )
        if write_plan:
            os.makedirs("plans/r15", exist_ok=True)
            with open(f"plans/r15/{name}_profile.txt", "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")
                ))
        spark.catalog.clearCache()
        windows.append((name, "construction", t0, t_constructed))
        windows.append((name, "COLD count", t_constructed, t_cold))
        windows.append((name, "WARM counts x3", t_cold, t_end))

    # the event log only flushes reliably at application stop
    spark.stop()
    evs = _read_events(log_dir)
    for name, label, t_lo, t_hi in windows:
        _analyze(evs, t_lo * 1000, t_hi * 1000, f"{name} {label}")


if __name__ == "__main__":
    main()
