"""Streaming NEAR-duplicate dedup: MinHash-band seen-set with
watermark-bounded eviction — the 13th stateful operator, upgrading the
reference's exact-key ingest dedup contract
(bmw_to_timescale/duplicate_check.py:45-96: "have I seen this record
before?" against a bounded external state table) from exact identity
to near-duplicate identity.

How it works, end to end:

1. The incoming document stream is banded by the SAME Spark
   expressions as the batch LSH plan (``operators/dedup.py
   banded_signatures``): word-shingle → k MinHashes → b band keys.
   All hashing stays JVM-side; no hash is reimplemented in Python.
2. ``groupBy(band_id, band_key)`` routes every document's band rows to
   the band bucket's state partition. Per bucket,
   ``applyInPandasWithState`` keeps the (doc_id, shingle-set) list of
   documents seen in that bucket and, for each arriving document,
   computes the EXACT word-shingle Jaccard against the earlier bucket
   members — the same verify step as the batch plan, just incremental.
   It emits one verdict row per (document, band): ``dup_of`` = the
   smallest earlier doc sharing this band with Jaccard ≥ threshold,
   else NULL.
3. A document collides if ANY of its bands collides, so the per-band
   verdicts aggregate with ``neardup_finalize`` (min over bands,
   nulls-last): NULL ⇒ survivor. All of a document's band rows travel
   in the same micro-batch, so the per-trigger aggregation (e.g. in a
   ``foreachBatch`` sink that drops duplicates before the write) is
   complete for every document it sees.

"First" is ARRIVAL order (ties within a micro-batch broken by
doc_id), exactly like the reference's dedup table; when the stream
arrives in doc_id order this converges EXACTLY to the batch
keep-first plan — ``operators/dedup.py minhash_dup_verdicts`` /
``minhash_keep_first`` — which
``tests/test_streaming_neardup.py`` proves by replaying the documents
table in doc_id-ordered micro-batches and requiring row-identical
verdicts.

Bounded state, two knobs:
- ``GroupStateTimeout.ProcessingTimeTimeout`` evicts band buckets idle
  for ``watermark_seconds`` — the watermark bound. A document whose
  near-dup arrived more than the watermark earlier is KEPT (the
  standard streaming-dedup trade; the reference's exact-key state
  table makes the same trade via its storage bound).
- ``max_per_bucket`` caps the per-bucket seen-set; once full, new
  documents still COMPARE against the stored members (drops keep
  working against the bucket's earliest residents — keep-FIRST means
  the earliest members are exactly the ones worth holding) but are no
  longer added. Per-bucket state is therefore ≤ max_per_bucket shingle
  sets regardless of how hot the bucket runs.

100 TB posture: state is sharded by band key across executors (the
same key space the batch self-join shuffles on), each bucket holds at
most ``max_per_bucket`` members, and the only Python work is the exact
set-overlap verify on bucket-mates — the step that is data-dependent
and small by construction. Everything corpus-sized (shingling,
hashing, banding) is JVM expression work before the shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from eventhub_to_timescale_spark.operators.dedup import banded_signatures

_VERDICT_SCHEMA = "doc_id long, band_id int, dup_of long"
_STATE_SCHEMA = "ids array<long>, shingle_sets array<array<string>>"


def _round6_half_up(x: float) -> float:
    """Match Spark's F.round / DuckDB ROUND (HALF_UP) on the
    non-negative Jaccard — Python's round() is half-to-even and could
    disagree on exact .5 micro boundaries."""
    import math

    return math.floor(x * 1e6 + 0.5) / 1e6


def _make_neardup_fn(
    threshold: float, max_per_bucket: int, watermark_seconds: int
):
    """Factory closing over the knobs (pickling rationale as the
    sibling factories in stateful.py)."""

    def _fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        band_id = int(key[0])
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            ids = list(state.get[0])
            sets = [set(s) for s in state.get[1]]
        else:
            ids, sets = [], []
        chunks = [pdf for pdf in pdf_iter if not pdf.empty]
        if not chunks:
            # keep the bucket alive until its idle window lapses
            if ids:
                state.setTimeoutDuration(watermark_seconds * 1000)
            return
        pdf = pd.concat(chunks, ignore_index=True).sort_values(
            "doc_id", kind="stable", ignore_index=True
        )
        out_ids: list[int] = []
        out_dup: list = []
        for doc_id, shingles in zip(pdf["doc_id"], pdf["shingles"]):
            doc_id = int(doc_id)
            sa = set(shingles)
            dup = None
            for other_id, sb in zip(ids, sets):
                union = len(sa | sb)
                if union == 0:
                    continue
                jac = _round6_half_up(len(sa & sb) / union)
                if jac >= threshold and (dup is None or other_id < dup):
                    dup = other_id
            out_ids.append(doc_id)
            out_dup.append(dup)
            if len(ids) < max_per_bucket:
                ids.append(doc_id)
                sets.append(sa)
        state.update((ids, [sorted(s) for s in sets]))
        state.setTimeoutDuration(watermark_seconds * 1000)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_ids, dtype="Int64"),
                "band_id": band_id,
                "dup_of": pd.array(out_dup, dtype="Int64"),
            }
        )

    return _fn


def streaming_neardup_verdicts(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_per_bucket: int = 1024,
    watermark_seconds: int = 24 * 3600,
) -> DataFrame:
    """Continuous per-band near-dup verdicts over a document stream →
    (doc_id, band_id, dup_of) per trigger; aggregate with
    ``neardup_finalize`` (or equivalent) per micro-batch. NULL-text
    documents produce no verdict rows (they have no shingles to
    collide on — same exclusion as the batch plan)."""
    banded = banded_signatures(
        docs,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )
    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        _make_neardup_fn(jaccard_threshold, max_per_bucket, watermark_seconds),
        outputStructType=_VERDICT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def neardup_finalize(verdicts: DataFrame) -> DataFrame:
    """Per-document verdict from per-band verdict rows →
    (doc_id, dup_of): dup_of = the smallest colliding earlier doc
    across ALL bands, NULL ⇒ the document survives. Batch-side helper
    (use inside ``foreachBatch``, or on the collected verdict frame in
    a backfill)."""
    return verdicts.groupBy("doc_id").agg(F.min("dup_of").alias("dup_of"))


__all__ = [
    "streaming_neardup_verdicts",
    "neardup_finalize",
]
