"""Composition contract of operators/curation_pipeline.py: the
one-plan curation chain must agree stage-for-stage with the
standalone operators it composes (same column contracts, no semantic
drift at the seams), plus the budget/order invariants a training
manifest needs."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def _docs(spark):
    from eventhub_to_timescale_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


def test_pipeline_equals_manual_stage_composition(spark):
    """Running the six standalone operators by hand must produce the
    identical manifest — the pipeline adds persist boundaries, not
    semantics."""
    from eventhub_to_timescale_spark.operators.curation import (
        decontaminate,
        gopher_quality_flags,
        normalize_text,
    )
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_full_pipeline,
    )
    from eventhub_to_timescale_spark.operators.dedup import (
        minhash_keep_first,
    )
    from eventhub_to_timescale_spark.operators.sampling import (
        shard_order,
        token_budget_select,
    )
    from eventhub_to_timescale_spark.operators.substrdup import (
        remove_repeated_spans,
    )
    from eventhub_to_timescale_spark.operators.text import STOPWORDS

    docs = _docs(spark)
    got = {
        tuple(r)
        for r in curation_full_pipeline(docs, persist_stages=False).collect()
    }

    norm = normalize_text(docs).select(
        "doc_id", F.col("norm_text").alias("text")
    )
    eval_docs = norm.filter(F.col("doc_id") % 97 == 0)
    flags = gopher_quality_flags(norm, stopwords=STOPWORDS)
    qdocs = norm.join(
        flags.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"
    )
    clean = remove_repeated_spans(qdocs)
    cleaned = clean.select("doc_id", F.col("clean_text").alias("text"))
    surv = minhash_keep_first(cleaned)
    decon = decontaminate(surv, eval_docs, shingle_n=5)
    sel = token_budget_select(decon, budget=8000)
    order = shard_order(sel, "doc_id", 8, salt="order-v1")
    want = {
        tuple(r)
        for r in sel.join(order, "doc_id")
        .select("doc_id", "n_tokens", "shard", "pos")
        .collect()
    }
    assert got == want and len(got) > 0


def test_pipeline_invariants(spark):
    """Manifest invariants: selected tokens fit the budget; every
    selected doc survived every cut (subset chain); (shard, pos) is a
    dense rank within each shard; no eval-slice doc leaks through."""
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_full_pipeline,
    )

    docs = _docs(spark)
    rows = curation_full_pipeline(docs, budget=4000).collect()
    assert sum(r["n_tokens"] for r in rows) <= 4000
    ids = [r["doc_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # the eval slice is contaminated with itself by construction —
    # decontamination must have removed it
    assert not [i for i in ids if i % 97 == 0]
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard


def test_budget_zero_selects_nothing(spark):
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_full_pipeline,
    )

    assert curation_full_pipeline(_docs(spark), budget=0).count() == 0


def test_stage_report_consistent_with_manifest(spark):
    """The attrition report must agree with the pipeline it audits:
    monotone non-increasing doc counts, the span stage preserving
    rows while cutting tokens, and the final stage equal to the
    manifest's own totals."""
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_full_pipeline,
        curation_stage_report,
    )

    docs = _docs(spark)
    rep = {r["stage"]: r for r in curation_stage_report(docs).collect()}
    assert list(rep) == [
        "0_input", "1_quality", "2_spans_clean", "3_neardup",
        "4_decontaminated", "5_budget_selected",
    ]
    counts = [rep[s]["n_docs"] for s in rep]
    assert counts == sorted(counts, reverse=True)
    assert rep["2_spans_clean"]["n_docs"] == rep["1_quality"]["n_docs"]
    assert rep["2_spans_clean"]["n_tokens"] < rep["1_quality"]["n_tokens"]
    manifest = curation_full_pipeline(docs).collect()
    assert rep["5_budget_selected"]["n_docs"] == len(manifest)
    assert rep["5_budget_selected"]["n_tokens"] == sum(
        r["n_tokens"] for r in manifest
    )


def test_stage_report_oracle_parity_sf0001(spark):
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_stage_report,
        curation_stage_report_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in curation_stage_report(_docs(spark)).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = [
        tuple(r)
        for r in con.execute(curation_stage_report_oracle_sql()).fetchall()
    ]
    assert got == want and len(got) == 6


def test_oracle_parity_sf0001(spark):
    """The composed DuckDB oracle (stage CTEs materialized to match
    the Spark persist boundaries) agrees bit-for-bit."""
    from eventhub_to_timescale_spark.operators.curation_pipeline import (
        curation_full_pipeline,
        curation_full_pipeline_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        tuple(r) for r in curation_full_pipeline(_docs(spark)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(curation_full_pipeline_oracle_sql()).fetchall()
    )
    assert got == want and len(got) > 0
