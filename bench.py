"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Includes both the driver-graded correctness queries and heavier
whole-table variants (all-subject aggregations, full ingest pipeline)
that actually stress shuffle/aggregate paths at sf0.1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from eventhub_to_timescale_spark.functions.scalars import epoch_bucket  # noqa: E402
from eventhub_to_timescale_spark.session import get_spark  # noqa: E402


def _current_round() -> int:
    """The build round an isolated-bench artifact belongs to: the
    latest committed CORRECTNESS_r{N}.json + 1 (the driver writes
    round N's artifact at round END, so during round N the newest on
    disk is N-1), overridable via SPARK_GRAFT_ROUND."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        try:
            return int(env)
        except ValueError:
            # a bad env value must not crash main after the whole
            # bench has run (r14 ADVICE #2: the ValueError used to
            # fire inside the f-string before detail_name was bound,
            # turning the except handler into a NameError) — fall
            # through to the artifact scan instead
            print(
                f"ignoring non-integer SPARK_GRAFT_ROUND={env!r}",
                file=sys.stderr,
            )
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))
        if (m := re.search(r"r(\d+)\.json$", p))
    ]
    return (max(rounds) + 1) if rounds else 0


def _bench_all_subject_avg(spark, sf_dir):
    """Whole-table tumbling aggregation: every subject, 6-h buckets."""
    from eventhub_to_timescale_spark.sources.testdata import events_as_conditions

    cond = events_as_conditions(spark, sf_dir).filter(
        F.col("measurement_of") == "value"
    )
    return (
        cond.groupBy(
            "measurement_subject",
            epoch_bucket(F.col("timestamp"), 21600).alias("time"),
        )
        .agg(F.avg("measurement_number").alias("avg_value"))
    )


def _bench_full_ingest(spark, sf_dir):
    """Full synthetic wire-format ingest: 3 publishers × envelope parse
    → route → convert → wide pivot."""
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope
    from eventhub_to_timescale_spark.ingest.router import route_to_records
    from eventhub_to_timescale_spark.sinks.conditions import records_to_conditions
    from eventhub_to_timescale_spark.sources.synth import (
        events_to_emon_envelopes,
        events_to_glow_envelopes,
        events_to_homie_envelopes,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    raw = (
        events_to_glow_envelopes(ev)
        .unionByName(events_to_homie_envelopes(ev))
        .unionByName(events_to_emon_envelopes(ev))
    )
    return records_to_conditions(route_to_records(parse_envelope(raw)))


def top_deltas(
    prev_queries: dict, warm: dict[str, float], n: int = 10
) -> dict[str, list[float]]:
    """Top-``n`` round-over-round warm-median ratios — {name:
    [prev_s, now_s, ratio]}, largest ratio first.  Pure function so
    tests can pin the semantics: 20 ms denominator floor (a 1 ms
    jitter on a microsecond query must not outrank a real
    regression), errored/missing previous entries skipped."""
    scored = []
    for k, now in warm.items():
        prev = prev_queries.get(k)
        if isinstance(prev, dict):
            prev = prev.get("warm_median")
        if not isinstance(prev, (int, float)) or prev < 0:
            continue
        scored.append((now / max(prev, 0.02), k, prev, now))
    scored.sort(reverse=True)
    return {
        k: [round(p, 2), round(v, 2), round(r, 2)]
        for r, k, p, v in scored[:n]
    }


def ambient_load(
    cores: int, load1: float, threshold_per_core: float = 0.0625
) -> bool:
    """True when the 1-minute load average indicates meaningful
    ambient (non-bench) work on the box.  0.0625/core = 2.0 on the
    32-core sandbox — the documented noisy runs showed load 3-5
    (SCALE.md, r12: a same-commit run drifted 92.3 s vs the quiet
    trio's 77.6-83.0 s, inflating the deltas block up to 3.6x)."""
    return load1 > threshold_per_core * max(cores, 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    # Load-evidence stamp (r12 verdict ask #3): record os.getloadavg()
    # BEFORE the session spins up (the only moment it reflects ambient
    # work, not our own executors).  If the box is already busy, wait
    # up to 2 minutes for it to quiet down — the one bounded "re-run"
    # this process can do for itself — then proceed and FLAG the
    # artifact either way so a noisy deltas block can never again read
    # as a real regression.
    cores = os.cpu_count() or 1
    pre_load = os.getloadavg()
    waited = 0
    while ambient_load(cores, pre_load[0]) and waited < 120:
        print(
            f"ambient load {pre_load[0]:.1f} on {cores} cores — waiting "
            f"for a quiet window ({waited}s)",
            file=sys.stderr,
        )
        time.sleep(20)
        waited += 20
        pre_load = os.getloadavg()
    noisy = ambient_load(cores, pre_load[0])

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = dict(entrymod.queries())
    bench_queries["b_all_subject_avg"] = _bench_all_subject_avg
    bench_queries["b_full_ingest"] = _bench_full_ingest

    # SPARK_GRAFT_BENCH_ONLY=q1,q2 runs just those queries — the
    # isolated-vs-in-suite bisect knob (r8 verdict #4: unattributable
    # warm regressions needed a way to time a query alone in a fresh
    # JVM without editing this file).
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        wanted = {q.strip() for q in only.split(",") if q.strip()}
        unknown = wanted - set(bench_queries)
        if unknown:
            print(f"unknown bench queries: {sorted(unknown)}", file=sys.stderr)
        bench_queries = {
            k: v for k, v in bench_queries.items() if k in wanted
        }
        if not bench_queries:
            # an all-typo filter must not bench an empty suite and
            # still write artifacts that look like a real run
            print("SPARK_GRAFT_BENCH_ONLY matched no queries", file=sys.stderr)
            sys.exit(2)

    # warm up the JVM + Python workers so the first timed query doesn't
    # absorb session startup (one tiny scan + one pandas-UDF roundtrip)
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: (pdf for pdf in it), schema="x int"
    ).count()

    # Each query is timed cold once (includes Catalyst analysis +
    # codegen compile — a fixed cost that vanishes at scale), then warm
    # THREE times, reporting the MEDIAN (r6 verdict #4: identical-code
    # warm times moved up to 2.3× between rounds in this sandbox, so a
    # single warm sample can't distinguish noise from regression;
    # medians make >1.3× round-over-round deltas meaningful).
    import statistics

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    warm_min: dict[str, float] = {}
    rows: dict[str, int] = {}
    leaked_rdd_max = 0  # post-cleanup persistent-RDD high-water mark
    for name, fn in bench_queries.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = df.count()
            timings[name] = round(time.perf_counter() - t0, 3)
            ws = []
            for _ in range(3):
                t1 = time.perf_counter()
                df.count()
                ws.append(time.perf_counter() - t1)
            warm[name] = round(statistics.median(ws), 3)
            warm_min[name] = round(min(ws), 3)
            rows[name] = n
        except Exception as e:  # a broken query must not hide the rest
            timings[name] = -1.0
            print(f"bench error in {name}: {e}", file=sys.stderr)
        else:
            print(
                f"{name}: {timings[name]}s cold / {warm[name]}s warm-med "
                f"/ {warm_min[name]}s warm-min ({n} rows)",
                file=sys.stderr,
            )
        # Several operators persist() internal frames (banded
        # signatures, prefix/gram frames, source docs) under a
        # caller-releases contract — and THIS loop is the caller.
        # Before r9 nothing released them, so 134 queries accumulated
        # cached partitions in the shared JVM and later queries paid
        # eviction/GC pressure (r8 verdict #3: 1.5-2.5× warm
        # regressions on untouched code). One query's caches never
        # outlive its timing block now.
        spark.catalog.clearCache()
        # clearCache() frees SQL-cached relations only; the eager
        # localCheckpoint stage boundaries (pipelines, dsir, tfidf,
        # kmv, heavyhitters, editsim, ...) register RDD-level blocks
        # that are NOT in the CacheManager and would otherwise linger
        # in the block manager until JVM GC (r15 verdict ask #3 /
        # ADVICE: the r8 eviction-pressure failure mode returning
        # through a different door). Unpersist them explicitly —
        # safe here because the query's DataFrame is never touched
        # again after its timing block (a localCheckpoint leaf is NOT
        # recomputable once its blocks are dropped).
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        for rid in list(jmap):
            jmap[rid].unpersist()
        leaked = spark.sparkContext._jsc.getPersistentRDDs().size()
        if leaked:
            leaked_rdd_max = max(leaked_rdd_max, leaked)
            print(
                f"warning: {leaked} RDD blocks survived cleanup after "
                f"{name}",
                file=sys.stderr,
            )

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    total_warm = round(sum(warm.values()), 3)

    # Round-over-round deltas (r11 verdict ask #6): the stdout line
    # displays only queries over a threshold, which let tail-query
    # regressions hide below the cutoff.  Compare this run's warm
    # medians against the COMMITTED BENCH_DETAIL.json (the previous
    # round's full record, read before we overwrite it) and surface
    # the top-10 ratios — any threshold — in the parsed payload as
    # {name: [prev_s, now_s, ratio]}.
    deltas: dict[str, list[float]] = {}
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    if not only:
        try:
            with open(detail_path) as fh:
                prev_detail = json.load(fh)
            deltas = top_deltas(prev_detail.get("queries", {}), warm)
        except (OSError, ValueError, KeyError, TypeError) as e:
            print(f"no previous BENCH_DETAIL for deltas: {e}", file=sys.stderr)
    # Full per-query record (cold + 3-sample warm median/min + rows)
    # goes to BENCH_DETAIL.json next to this script so the complete
    # surface survives even when the stdout line must be filtered to
    # fit the driver's ~2000-char tail buffer.
    post_load = os.getloadavg()
    load_stamp = {
        "cores": cores,
        "load1_pre": round(pre_load[0], 2),
        "load5_pre": round(pre_load[1], 2),
        "load1_post": round(post_load[0], 2),
        "noisy": noisy,
    }
    detail = {
        "sf": sf,
        "warm_samples": 3,
        "load": load_stamp,
        "queries": {
            k: {
                "cold": timings[k],
                "warm_median": warm.get(k),
                "warm_min": warm_min.get(k),
                # cold + 3×warm composite (r15 verdict ask #5): staged
                # queries pay their boundary materialization in the
                # cold pass and read leaves warm, so warm-only
                # round-over-round comparisons mix "full compute" and
                # "read a leaf" regimes — this column compares total
                # work under the bench's own 1-cold + 3-warm method.
                "cold_plus_3warm": (
                    round(timings[k] + 3 * warm[k], 3)
                    if timings[k] >= 0 and k in warm
                    else None
                ),
                "rows": rows.get(k),
            }
            for k in timings
        },
        "total_cold": total,
        "total_warm_median": total_warm,
        "total_cold_plus_3warm": round(
            sum(
                timings[k] + 3 * warm[k]
                for k in timings
                if timings[k] >= 0 and k in warm
            ),
            3,
        ),
        "leaked_rdd_blocks_max": leaked_rdd_max,
        "deltas_vs_previous": deltas,
    }
    detail_name = "BENCH_DETAIL.json"  # bound pre-try: the except
    # handler prints it, so nothing inside may raise before it's set
    try:
        # an SPARK_GRAFT_BENCH_ONLY bisect must not clobber the
        # committed full-suite artifact — and its evidence must be
        # discoverable per round (r13 verdict ask #7), so the
        # isolated artifact carries the round number (the latest
        # committed CORRECTNESS_r{N}.json + 1, or SPARK_GRAFT_ROUND)
        # and ACCUMULATES as a list of run payloads: successive
        # isolated runs in one round (adjudication, then a fix
        # re-measure) must not repurpose the file in place — the r13
        # blemish this artifact exists to end.
        if only:
            detail_name = f"BENCH_ISOLATED_r{_current_round()}.json"
            detail_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), detail_name
            )
            runs = []
            if os.path.exists(detail_path):
                with open(detail_path) as fh:
                    prev = json.load(fh)
                runs = prev if isinstance(prev, list) else [prev]
            runs.append(detail)
            with open(detail_path, "w") as fh:
                json.dump(runs, fh, indent=1, sort_keys=True)
        else:
            detail_name = "BENCH_DETAIL.json"
            detail_path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), detail_name
            )
            with open(detail_path, "w") as fh:
                json.dump(detail, fh, indent=1, sort_keys=True)
    except (OSError, ValueError) as e:
        print(f"could not write {detail_name}: {e}", file=sys.stderr)
    print(json.dumps(detail), file=sys.stderr)

    compact = {k: round(v, 2) for k, v in warm.items()}
    for k, v in timings.items():
        if v < 0:
            compact[k] = -1.0  # errored queries stay visible to the driver
    payload = {
        "metric": "headline-queries warm wall clock (median of 3)",
        "value": total_warm,
        "unit": "sec",
        "queries": compact,
        "n_queries": len(timings),
        "total_cold": total,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "deltas": deltas,
        "load": load_stamp,
    }
    # The ONE stdout JSON line must stay comfortably under the
    # driver's 2000-char tail buffer (rounds 1-3, 5 AND 6 overflowed
    # it -> parsed:null in BENCH_r{N}.json). Progressively drop the
    # fastest queries (full detail is in BENCH_DETAIL.json) until the
    # line fits with margin.
    line = json.dumps(payload, separators=(",", ":"))
    thr = 0.05
    while len(line) > 1500 and thr <= 2.0:
        payload["queries"] = {
            k: v for k, v in compact.items() if v >= thr or v < 0
        }
        payload["omitted_below_sec"] = thr
        line = json.dumps(payload, separators=(",", ":"))
        thr *= 2
    if len(line) > 1500 and len(deltas) > 5:
        payload["deltas"] = dict(list(deltas.items())[:5])
        line = json.dumps(payload, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
