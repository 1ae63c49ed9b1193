"""Round-6 operator contracts: sketch-vs-exact quality-cut
concordance, the sample-quantile cut, and the unconditional half-open
rollup-rewrite equivalence (data at and past the window edge)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

WORDS = (
    "the of and to in is was for on as with by at from it an be this "
    "that quantum flux lattice entropy widget gizmo sensor module "
    "pipeline cluster shard replica batch stream"
).split()


def _docs(spark, n=300):
    rng = random.Random(13)
    rows = []
    for i in range(n):
        lang = ("en", "de", "fr")[i % 3]
        text = " ".join(rng.choice(WORDS) for _ in range(rng.randrange(5, 80)))
        if rng.random() < 0.3:
            text += "!!! ??? ;;;"
        rows.append((i, lang, text))
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


def test_quality_sketch_concordance(spark):
    """The GK-sketch threshold cut must differ from the exact
    percent_rank cut only for documents whose quality lies BETWEEN the
    two thresholds — i.e. the disagreement is bounded by sketch error
    at the cut point, never a wrong document far from it."""
    from eventhub_to_timescale_spark.operators.text import (
        filter_quality_percentile,
        quality_col,
        quality_threshold_by_group,
    )

    docs = _docs(spark)
    exact = filter_quality_percentile(docs, keep_frac=0.6)
    sketch = quality_threshold_by_group(docs, keep_frac=0.6)

    e = {r["doc_id"]: r["quality"] for r in exact.collect()}
    s = {r["doc_id"]: r["quality"] for r in sketch.collect()}
    all_q = {
        r["doc_id"]: (r["lang"], r["quality"])
        for r in docs.select(
            "doc_id", "lang", quality_col(F.col("text")).alias("quality")
        ).collect()
    }

    # per-group thresholds actually applied by each path
    thr = {}
    for d, q in e.items():
        g = all_q[d][0]
        thr.setdefault(g, [float("inf"), float("inf")])
        thr[g][0] = min(thr[g][0], q)
    for d, q in s.items():
        g = all_q[d][0]
        thr.setdefault(g, [float("inf"), float("inf")])
        thr[g][1] = min(thr[g][1], q)

    diff = set(e) ^ set(s)
    # disagreements are confined to the inter-threshold band
    for d in diff:
        g, q = all_q[d][0], float(all_q[d][1])
        lo, hi = sorted(thr[g])
        assert lo - 1e-9 <= q <= hi + 1e-9, (d, q, thr[g])
    # and the band is small: bounded fraction of the corpus
    assert len(diff) <= 0.05 * len(all_q), (len(diff), len(all_q))


def test_quality_sample_cut_full_sample_superset(spark):
    """With sample_fraction=1.0 the sample quantile IS the exact
    quantile, so the threshold cut keeps every exact-cut document
    (plus possibly extra ties at exactly the threshold quality)."""
    from eventhub_to_timescale_spark.operators.text import (
        filter_quality_percentile,
        quality_threshold_by_sample,
    )

    docs = _docs(spark)
    exact = {
        r["doc_id"] for r in filter_quality_percentile(
            docs, keep_frac=0.6
        ).collect()
    }
    sampled = quality_threshold_by_sample(
        docs, keep_frac=0.6, sample_fraction=1.0
    ).collect()
    kept = {r["doc_id"] for r in sampled}
    assert exact <= kept
    # extras can only sit exactly at a group threshold
    thr = {}
    qual = {r["doc_id"]: (r["lang"], r["quality"]) for r in sampled}
    for r in sampled:
        if r["doc_id"] in exact:
            g = r["lang"]
            thr[g] = min(thr.get(g, float("inf")), r["quality"])
    for d in kept - exact:
        g, q = qual[d]
        assert q == thr[g], (d, q, thr[g])


def test_rollup_rewrite_half_open_unconditional(spark):
    """bucket_avg_from_rollup's [start, end) slice must equal the
    half-open raw aggregation even when data exists AT and PAST the
    window edge — the round-5 inclusive slice silently absorbed the
    whole end bucket in that case."""
    from eventhub_to_timescale_spark.functions.scalars import epoch_bucket
    from eventhub_to_timescale_spark.operators.rollup import (
        bucket_avg_from_rollup,
        rollup_conditions,
    )

    rng = random.Random(3)
    rows = []
    for i in range(500):
        # [Jan 1, Jan 3): inside, at, and past the [Jan 1, Jan 2) window
        ts = datetime(2024, 1, 1) + timedelta(
            seconds=rng.randrange(2 * 86400)
        )
        rows.append((ts, "s1", "temp", round(rng.uniform(0, 10), 3)))
    rows.append((datetime(2024, 1, 2), "s1", "temp", 99.0))  # exactly end
    cond = spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_of string, measurement_number double",
    )
    start, end = datetime(2024, 1, 1), datetime(2024, 1, 2)
    fine = rollup_conditions(cond, bucket_seconds=3600)
    got = {
        (r["time"], round(r["avg_value"], 6))
        for r in bucket_avg_from_rollup(
            fine, 3600, "s1", "temp", start, end, 21600
        ).collect()
    }
    want = {
        (r["time"], round(r["avg_value"], 6))
        for r in cond.filter(
            (F.col("timestamp") >= start) & (F.col("timestamp") < end)
        )
        .groupBy(epoch_bucket(F.col("timestamp"), 21600).alias("time"))
        .agg(F.round(F.avg("measurement_number"), 6).alias("avg_value"))
        .collect()
    }
    assert got == want
    assert len(got) == 4  # exactly the four 6h buckets of Jan 1


def test_rollup_rewrite_refuses_unaligned_edges(spark):
    from eventhub_to_timescale_spark.operators.rollup import (
        bucket_avg_from_rollup,
        rollup_conditions,
    )

    cond = spark.createDataFrame(
        [(datetime(2024, 1, 1), "s1", "temp", 1.0)],
        "timestamp timestamp, measurement_subject string, "
        "measurement_of string, measurement_number double",
    )
    fine = rollup_conditions(cond, bucket_seconds=3600)
    with pytest.raises(ValueError, match="not aligned"):
        bucket_avg_from_rollup(
            fine, 3600, "s1", "temp",
            datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 2), 7200,
        )
