"""Streaming CDC-chunk dedup (streaming/cdcdedup.py): the EXACT
batch-convergence proof the other stateful operators pin — replay the
documents table through the stateful operator in doc_id-ordered
micro-batches; the finalized verdicts must be row-identical to the
batch twin (operators/cdcchunk.py cdc_dup_verdicts).  Plus the
bounded-state behavior the batch twin cannot express: watermark
eviction keeps late duplicates."""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")


def _run_stream(spark, tmp_path, schema, raw_path, **kwargs):
    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        streaming_cdc_verdicts,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_cdc_verdicts(stream, **kwargs)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)
    return spark.read.parquet(str(tmp_path / "out"))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_converges_to_batch_verdicts(spark, tmp_path):
    """doc_id-ordered replay in 4 micro-batches ⇒ verdicts identical
    to the batch twin cdc_dup_verdicts."""
    from eventhub_to_timescale_spark.operators.cdcchunk import (
        cdc_dup_verdicts,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        cdc_finalize,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    raw_path = str(tmp_path / "raw")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + 4) // 4
    for i in range(4):
        docs.filter(
            (F.col("doc_id") >= i * step) & (F.col("doc_id") < (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)

    verdicts = _run_stream(spark, tmp_path, docs.schema, raw_path)
    got = {
        r["doc_id"]: r["dup_of"] for r in cdc_finalize(verdicts).collect()
    }

    want_rows = cdc_dup_verdicts(docs).collect()
    # the batch twin covers all non-empty-text docs; the stream emits
    # rows only for docs with a >= min_len chunk — those must agree
    # exactly, and every doc the stream skipped must be a batch
    # survivor (no qualifying chunk can never collide)
    n_checked = 0
    for r in want_rows:
        if r["doc_id"] in got:
            assert got[r["doc_id"]] == r["dup_of"], (
                f"doc {r['doc_id']}: stream {got[r['doc_id']]} "
                f"!= batch {r['dup_of']}"
            )
            n_checked += 1
        else:
            assert r["dup_of"] is None
    assert n_checked >= 400  # sf0.001 has 500 docs, few null texts
    dropped = {d for d, dup in got.items() if dup is not None}
    assert len(dropped) > 0, "corpus has copied spans; stream found none"


def test_split_across_batches_still_converges(spark, tmp_path):
    """The duplicate arrives in a LATER micro-batch than its partner —
    only carried chunk-owner state can link them."""
    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        cdc_finalize,
    )

    text = "the quick brown fox jumps over the lazy dog " * 10
    rows = [(1, text), (2, text + " and then some trailing extra")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw_path = str(tmp_path / "raw")
    for i, _ in enumerate(rows):
        docs.filter(F.col("doc_id") == i + 1).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)
    verdicts = _run_stream(spark, tmp_path, docs.schema, raw_path)
    got = {
        r["doc_id"]: r["dup_of"] for r in cdc_finalize(verdicts).collect()
    }
    assert got[1] is None
    assert got[2] == 1


def test_watermark_eviction_keeps_late_duplicate(spark, tmp_path):
    """A duplicate arriving after its partner's chunk owners evicted
    is KEPT — the documented watermark trade.  Same two-run restart
    pattern as the neardup sibling: run 1 ingests doc 1, the 1 s
    timers lapse during the pause, run 2's first batch fires them and
    evicts doc 1's chunk owners before doc 2 arrives."""
    import os
    import shutil

    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        cdc_finalize,
        streaming_cdc_verdicts,
    )

    text = "the quick brown fox jumps over the lazy dog " * 10
    rows = [(1, text), (2, text)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    raw_path = str(tmp_path / "raw")
    for i, _ in enumerate(rows):
        docs.filter(F.col("doc_id") == i + 1).coalesce(1).write.mode(
            "append"
        ).parquet(raw_path)
        _time.sleep(0.05)

    staged = raw_path + "_staged"
    os.makedirs(staged, exist_ok=True)

    def start():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(staged)
        )
        return (
            streaming_cdc_verdicts(stream, watermark_seconds=1)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )

    parts = sorted(
        f for f in os.listdir(raw_path) if f.endswith(".parquet")
    )
    shutil.copy(os.path.join(raw_path, parts[0]), staged)
    drain_stateful_stream(start())
    _time.sleep(2.5)  # let doc 1's 1 s chunk-owner timers lapse
    shutil.copy(os.path.join(raw_path, parts[1]), staged)
    drain_stateful_stream(start())

    verdicts = spark.read.parquet(str(tmp_path / "out"))
    got = {
        r["doc_id"]: r["dup_of"] for r in cdc_finalize(verdicts).collect()
    }
    assert got[1] is None
    # doc 2 is chunk-identical to doc 1 but doc 1's owners evicted →
    # kept
    assert got[2] is None


def test_fn_level_owner_semantics():
    """Owner probe semantics at the fn level: earlier owner wins,
    first presenter becomes owner, intra-batch ties break by doc_id."""
    import pandas as pd

    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        _make_cdc_fn,
    )

    class _FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        get = property(get)

        def update(self, v):
            self._v = tuple(v)

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self._v = None

    fn = _make_cdc_fn(3600)
    st = _FakeState()
    out1 = list(
        fn(("h",), iter([pd.DataFrame({"doc_id": [5, 3, 9]})]), st)
    )[0]
    # sorted: 3 first (no owner -> NULL), then 5 (owner 3), then 9
    assert list(out1["doc_id"]) == [3, 5, 9]
    assert list(out1["dup_of"].fillna(-1)) == [-1, 3, 3]
    assert st.get == (3,)
    out2 = list(fn(("h",), iter([pd.DataFrame({"doc_id": [7]})]), st))[0]
    assert list(out2["dup_of"]) == [3]
    # a LATER-arriving smaller doc_id takes ownership but is not its
    # own dup (owner < doc_id guard)
    out3 = list(fn(("h",), iter([pd.DataFrame({"doc_id": [1]})]), st))[0]
    assert out3["dup_of"].isna().all()
    assert st.get == (1,)


def test_random_replay_converges_to_batch_model():
    """fn-level randomized replay: random texts with planted copied
    spans, chunk rows split across random micro-batch boundaries in
    doc_id order — the accumulated verdicts must equal a literal
    batch model (min earlier sharer per doc) for every seed."""
    import random
    from collections import defaultdict

    import pandas as pd

    from eventhub_to_timescale_spark.operators.cdcchunk import (
        gear_chunk_rows,
    )
    from eventhub_to_timescale_spark.streaming.cdcdedup import (
        _make_cdc_fn,
    )

    class _FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        get = property(get)

        def update(self, v):
            self._v = tuple(v)

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self._v = None

    for seed in range(4):
        rng = random.Random(seed)
        span = "".join(rng.choices("abcdefgh ", k=200))
        docs = {}
        for d in range(30):
            body = "".join(rng.choices("abcdefgh ", k=rng.randrange(50, 300)))
            if rng.random() < 0.4:  # plant the shared span
                cut = rng.randrange(len(body))
                body = body[:cut] + span + body[cut:]
            docs[d] = body

        # batch model: min earlier doc sharing a >=16-char chunk
        chunks = {
            d: {
                h
                for _, h, ln, _ in gear_chunk_rows(t, 8, 32)
                if ln >= 16
            }
            for d, t in docs.items()
        }
        want = {}
        for d in sorted(docs):
            earlier = [
                e for e in sorted(docs)
                if e < d and chunks[e] & chunks[d]
            ]
            want[d] = min(earlier) if earlier else None

        # streaming replay: per-chunk-hash keyed state, doc_id-ordered
        # random batch splits
        states = defaultdict(_FakeState)
        got_rows = []
        order = sorted(docs)
        i = 0
        fn = _make_cdc_fn(3600)
        while i < len(order):
            j = min(len(order), i + rng.randint(1, 7))
            batch = defaultdict(list)  # chunk_hash -> [doc_id]
            for d in order[i:j]:
                for h in chunks[d]:
                    batch[h].append(d)
            for h, ids in batch.items():
                for out in fn(
                    (h,), iter([pd.DataFrame({"doc_id": ids})]),
                    states[h],
                ):
                    got_rows.append(out)
            i = j
        verdicts = pd.concat(got_rows, ignore_index=True)
        got = (
            verdicts.groupby("doc_id")["dup_of"].min().to_dict()
        )
        for d, w in want.items():
            g = got.get(d)
            g = None if g is None or pd.isna(g) else int(g)
            if d in got:
                assert g == w, f"seed {seed} doc {d}: {g} != {w}"
            else:
                assert w is None  # no >=16-char chunk at all
