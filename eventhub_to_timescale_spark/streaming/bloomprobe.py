"""Streaming Bloom membership pre-filter — the 18th stateful
operator, the second of the two cells closing the sketch family's
streaming matrix (r12 verdict ask #6; the first is
streaming/quantiles.py).

Batch twin: ``operators/bloom.py bloom_seen_verdicts``.  The question
per arriving document is the reference dedup-table probe
(bmw_to_timescale/duplicate_check.py:45-96) answered by a Bloom
filter instead of exact storage: "had ALL k bit positions of my key
been set by EARLIER documents?" — one-sided (an exact duplicate of an
earlier doc is always flagged; a flag can be a position-collision
false positive).

How it works — the same owner-pattern as streaming/cdcdedup.py, with
the bit POSITION as the state key:

1. A stateless JVM-side projection fans each document's key
   (md5(text) by default) to its k positions
   (``portable_hash32(key, 'bloom{i}:') % m`` — the portable rule the
   batch filter and the DuckDB oracle share).
2. ``groupBy(pos)`` routes every occurrence of a position to its
   state partition.  Per position, ``applyInPandasWithState`` keeps
   ONE int64 — the smallest (first-setter) doc_id that has presented
   this position — and emits, per arriving (doc, pos), whether the
   position was set BEFORE that document.
3. A document is maybe-seen iff ALL its k positions were set before,
   so per-position verdicts aggregate with ``bloom_finalize`` (min
   over booleans).  All of a document's position rows travel in the
   same micro-batch, so the per-trigger aggregation is complete for
   every document it sees.

"Before" is MIN-doc_id order, not arrival order (r13 ADVICE, low):
the state keeps the smallest doc_id seen so far and compares
``first < doc_id``, so the first-setter of a position is whichever
document has the smallest id among those that have arrived — on an
out-of-order stream a document arriving AFTER a larger-id document
still claims the position (set_before=False for it), and verdicts
already emitted in append mode are NOT retracted when a smaller id
arrives late (the late small-id document diverges from the batch
twin's answer for documents between the two).  On a doc_id-ordered
replay min-id and arrival order coincide and the stream converges
EXACTLY to the batch twin — that ordered-replay convergence is what
tests/test_streaming_bloomprobe.py proves, including a randomized
multi-seed replay across micro-batch boundaries.

Bounded state: one int64 per DISTINCT set position — at most m
entries EVER (the Bloom bound itself), stricter than any watermark;
``ProcessingTimeTimeout`` still evicts idle positions so a
short-horizon deployment can run with m sized for the horizon, at
the standard late-duplicate-kept trade.

100 TB posture: state is sharded on the bounded position space
(≤ m keys); per-key state is one long; the only Python work is the
per-group pandas min — the fan-out itself is JVM expression work.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from eventhub_to_timescale_spark.operators.bloom import _positions

_VERDICT_SCHEMA = "doc_id long, set_before boolean"
_STATE_SCHEMA = "first_doc long"


def _make_bloom_fn(watermark_seconds: int):
    def _fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        first = int(state.get[0]) if state.exists else None
        batches = [pdf for pdf in pdf_iter if not pdf.empty]
        if not batches:
            if first is not None:
                state.setTimeoutDuration(watermark_seconds * 1000)
            return
        pdf = pd.concat(batches, ignore_index=True).sort_values(
            "doc_id", kind="stable", ignore_index=True
        )
        out_ids: list[int] = []
        out_seen: list[bool] = []
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            out_ids.append(doc_id)
            out_seen.append(first is not None and first < doc_id)
            if first is None or doc_id < first:
                first = doc_id
        state.update((first,))
        state.setTimeoutDuration(watermark_seconds * 1000)
        yield pd.DataFrame(
            {
                "doc_id": pd.array(out_ids, dtype="Int64"),
                "set_before": pd.array(out_seen, dtype="boolean"),
            }
        )

    return _fn


def streaming_bloom_positions(
    docs: DataFrame,
    key_expr=None,
    id_col: str = "doc_id",
    m: int = 1 << 20,
    k: int = 4,
) -> DataFrame:
    """Stateless fan → (doc_id, pos), k rows per document — all
    JVM-side expression work (md5 positions), shared with the batch
    twin via ``operators/bloom.py _positions`` so stream and batch
    set identical bits."""
    if m < 2 or k < 1:
        raise ValueError(f"need m ≥ 2 and k ≥ 1, got {m}, {k}")
    key = key_expr if key_expr is not None else F.md5(F.col("text"))
    return docs.filter(
        F.col(id_col).isNotNull() & key.isNotNull()
    ).select(
        F.col(id_col).alias("doc_id"),
        F.explode(_positions(key, m, k)).alias("pos"),
    )


def streaming_bloom_verdicts(
    docs: DataFrame,
    key_expr=None,
    id_col: str = "doc_id",
    m: int = 1 << 20,
    k: int = 4,
    watermark_seconds: int = 24 * 3600,
) -> DataFrame:
    """Continuous per-position Bloom verdicts over a document stream
    → (doc_id, set_before) rows, k per document; aggregate with
    ``bloom_finalize`` per micro-batch."""
    if watermark_seconds < 1:
        raise ValueError(
            f"watermark_seconds must be ≥ 1, got {watermark_seconds}"
        )
    fan = streaming_bloom_positions(
        docs, key_expr=key_expr, id_col=id_col, m=m, k=k
    )
    return fan.groupBy("pos").applyInPandasWithState(
        _make_bloom_fn(watermark_seconds),
        outputStructType=_VERDICT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def bloom_finalize(verdicts: DataFrame) -> DataFrame:
    """Per-document verdict from per-position rows → (doc_id,
    maybe_seen): ALL k positions set before ⇒ True.  Batch-side
    helper (use inside ``foreachBatch`` or on the collected frame)."""
    return verdicts.groupBy("doc_id").agg(
        F.min(F.col("set_before").cast("int"))
        .cast("boolean")
        .alias("maybe_seen")
    )


__all__ = [
    "streaming_bloom_positions",
    "streaming_bloom_verdicts",
    "bloom_finalize",
]
