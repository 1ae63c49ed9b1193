"""Streaming Bloom membership pre-filter (streaming/bloomprobe.py,
the 18th stateful operator): exact batch-convergence on ordered
replay, the one-sided duplicate guarantee, randomized multi-seed
replays across micro-batch boundaries, and the batch twin's DuckDB
oracle."""

from __future__ import annotations

import os
import random
import time as _time

import duckdb
import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.bloom import (
    bloom_seen_oracle_sql,
    bloom_seen_verdicts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")


class TestBatchTwin:
    def test_exact_duplicate_is_always_flagged(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha"), (2, "beta"), (3, "alpha"), (4, "gamma"),
             (5, "beta")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.maybe_seen
            for r in bloom_seen_verdicts(docs).collect()
        }
        # the one-sided guarantee: later copies of an earlier text
        # are ALWAYS maybe_seen
        assert got[3] and got[5]
        # first occurrences at m=2^20 on 5 keys: collisions
        # astronomically unlikely
        assert not got[1] and not got[2] and not got[4]

    def test_null_text_and_id_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "x"), (2, None), (None, "y")],
            "doc_id long, text string",
        )
        rows = bloom_seen_verdicts(docs).collect()
        assert {r.doc_id for r in rows} == {1}

    def test_bad_params_raise(self, spark):
        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            bloom_seen_verdicts(docs, m=1)
        with pytest.raises(ValueError):
            bloom_seen_verdicts(docs, k=0)

    def test_small_m_forces_false_positives_one_sided(self, spark):
        """m=8, k=2 on 40 distinct texts: collisions guaranteed, but
        the python reference reproduces every verdict exactly — the
        FP channel is deterministic, never a missed duplicate."""
        import hashlib

        texts = [f"doc body {i}" for i in range(40)]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.maybe_seen
            for r in bloom_seen_verdicts(docs, m=8, k=2).collect()
        }
        seen_bits: set[int] = set()
        for i, t in enumerate(texts):
            key = hashlib.md5(t.encode()).hexdigest()
            ps = [
                int(hashlib.md5((f"bloom{j}:" + key).encode())
                    .hexdigest()[:8], 16) % 8
                for j in range(2)
            ]
            assert got[i] == all(p in seen_bits for p in ps), i
            seen_bits.update(ps)
        assert any(got.values())  # collisions actually occurred

    def test_matches_duckdb_oracle_sf0001(self, spark):
        from eventhub_to_timescale_spark.sources.testdata import load_table

        docs = load_table(spark, SF_DIR, "documents")
        got = [tuple(r) for r in bloom_seen_verdicts(docs).collect()]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{SF_DIR}/documents.parquet'"
        )
        want = [tuple(r) for r in con.execute(bloom_seen_oracle_sql()).fetchall()]
        assert got == want and len(got) > 0


def _run_stream(spark, tmp_path, schema, raw_path, **kwargs):
    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.bloomprobe import (
        streaming_bloom_verdicts,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_bloom_verdicts(stream, **kwargs)
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
def test_stream_converges_to_batch_twin(spark, tmp_path):
    """doc_id-ordered replay in 4 micro-batches ⇒ verdicts identical
    to bloom_seen_verdicts."""
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.bloomprobe import (
        bloom_finalize,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    raw_path = str(tmp_path / "raw")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    step = (hi + 4) // 4
    for i in range(4):
        docs.filter(
            (F.col("doc_id") >= i * step)
            & (F.col("doc_id") < (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)

    verdicts = _run_stream(spark, tmp_path, docs.schema, raw_path)
    got = {
        r.doc_id: r.maybe_seen
        for r in bloom_finalize(verdicts).collect()
    }
    want = {
        r.doc_id: r.maybe_seen
        for r in bloom_seen_verdicts(docs).collect()
    }
    assert got == want and len(got) > 0


def test_fn_level_randomized_replays_converge():
    """Function-level replay (no Spark streaming runtime): random
    micro-batch splits of a shuffled-but-id-ordered-within-batch
    arrival must produce the same verdicts as the sequential
    reference, across 4 seeds."""
    import hashlib

    from eventhub_to_timescale_spark.streaming.bloomprobe import (
        _make_bloom_fn,
    )
    import pandas as pd

    class _FakeState:
        def __init__(self):
            self._v = None
            self.hasTimedOut = False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self._v = None

    m, k = 64, 3
    texts = [f"text {i % 25}" for i in range(80)]  # forced repeats

    def positions(t):
        key = hashlib.md5(t.encode()).hexdigest()
        return [
            int(hashlib.md5((f"bloom{j}:" + key).encode())
                .hexdigest()[:8], 16) % m
            for j in range(k)
        ]

    # sequential reference
    seen: set[int] = set()
    want = {}
    for i, t in enumerate(texts):
        ps = positions(t)
        want[i] = all(p in seen for p in ps)
        seen.update(ps)

    for seed in range(4):
        rng = random.Random(seed)
        fn = _make_bloom_fn(3600)
        states: dict[int, _FakeState] = {}
        got: dict[int, list] = {}
        i = 0
        while i < len(texts):
            step = rng.randint(1, 17)
            batch = list(range(i, min(i + step, len(texts))))
            i += step
            per_pos: dict[int, list[int]] = {}
            for d in batch:
                for p in positions(texts[d]):
                    per_pos.setdefault(p, []).append(d)
            for p, ids in per_pos.items():
                st = states.setdefault(p, _FakeState())
                out = list(
                    fn((p,), iter([pd.DataFrame({"doc_id": ids})]), st)
                )
                for pdf in out:
                    for doc_id, sb in zip(pdf["doc_id"], pdf["set_before"]):
                        got.setdefault(int(doc_id), []).append(bool(sb))
        final = {d: all(v) for d, v in got.items()}
        assert final == want, seed
