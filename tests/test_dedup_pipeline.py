"""Composition contract of operators/dedup_pipeline.py: the one-plan
pipeline must agree stage-for-stage with the standalone operators it
composes (same column contracts, no semantic drift at the seams)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _load(spark):
    from eventhub_to_timescale_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    return load_table(spark, sf, "documents"), load_table(
        spark, sf, "embeddings"
    )


def test_pipeline_equals_manual_stage_composition(spark):
    """Running the three standalone operators by hand must produce the
    identical survivor set — the pipeline adds persist boundaries, not
    semantics."""
    from eventhub_to_timescale_spark.operators.clustering import (
        semantic_dedup_keep,
    )
    from eventhub_to_timescale_spark.operators.dedup import (
        minhash_lsh_pairs,
        near_dedup_filter,
    )
    from eventhub_to_timescale_spark.operators.dedup_pipeline import (
        dedup_full_pipeline,
    )
    from eventhub_to_timescale_spark.operators.substrdup import (
        remove_repeated_spans,
    )

    docs, emb = _load(spark)
    got = {
        (r["doc_id"], r["cluster"], r["removed_chars"])
        for r in dedup_full_pipeline(
            docs, emb, k=8, threshold=0.4, persist_stages=False
        ).collect()
    }

    clean = remove_repeated_spans(docs)
    cleaned = clean.select("doc_id", F.col("clean_text").alias("text"))
    pairs = minhash_lsh_pairs(cleaned)
    surv = near_dedup_filter(clean, pairs)
    sem = semantic_dedup_keep(
        emb.join(
            surv.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_semi",
        ),
        k=8,
        threshold=0.4,
    )
    removed = {
        x["doc_id"]: x["removed_chars"]
        for x in surv.select("doc_id", "removed_chars").collect()
    }
    want = {
        (r["vec_id"], r["cluster"], removed[r["vec_id"]])
        for r in sem.collect()
    }
    assert got == want and len(got) > 0


def test_pipeline_monotone_and_bounded(spark):
    """Survivors are a subset of the corpus; removed_chars is
    non-negative and bounded by the original length."""
    from eventhub_to_timescale_spark.operators.dedup_pipeline import (
        dedup_full_pipeline,
    )

    docs, emb = _load(spark)
    out = dedup_full_pipeline(docs, emb, k=8, threshold=0.4)
    joined = out.join(
        docs.select("doc_id", F.length("text").alias("orig_len")), "doc_id"
    ).collect()
    assert 0 < len(joined) <= docs.count()
    for r in joined:
        assert 0 <= r["removed_chars"] <= r["orig_len"]


def test_pipeline_persist_boundaries_release_nothing_extra(spark):
    """persist_stages=True leaves caches under the caller-releases
    contract (the bench/parity harnesses clear between queries) — but
    must not change a single output row."""
    from eventhub_to_timescale_spark.operators.dedup_pipeline import (
        dedup_full_pipeline,
    )

    docs, emb = _load(spark)
    a = sorted(
        map(tuple, dedup_full_pipeline(
            docs, emb, k=8, threshold=0.4, persist_stages=True
        ).collect())
    )
    spark.catalog.clearCache()
    b = sorted(
        map(tuple, dedup_full_pipeline(
            docs, emb, k=8, threshold=0.4, persist_stages=False
        ).collect())
    )
    assert a == b and len(a) > 0
