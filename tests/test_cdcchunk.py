"""Content-defined chunking (operators/cdcchunk.py): reconstruction,
the insertion-robustness property that motivates CDC over fixed
windows, boundary determinism, and cross-engine oracle parity."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.cdcchunk import (
    cdc_chunks,
    cdc_chunks_oracle_sql,
    cdc_shared_chunks,
    cdc_shared_chunks_oracle_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _text(seed, n=400):
    rng = random.Random(seed)
    return "".join(rng.choices("abcdefgh ", k=n))


class TestCdcChunks:
    def test_chunks_reconstruct_text_and_indices_are_dense(self, spark):
        text = _text(1)
        rows = cdc_chunks(_docs(spark, [(1, text)])).collect()
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert sum(r["chunk_len"] for r in rows) == len(text)
        assert len(rows) > 3  # divisor 32 on 400 chars → several cuts

    def test_insertion_only_disturbs_local_chunks(self, spark):
        """THE content-defined property: inserting 3 chars in the
        middle leaves every chunk outside the edited one's
        neighborhood hash-identical — fixed-width windows would shift
        every downstream window."""
        text = _text(2, 600)
        mutated = text[:300] + "XYZ" + text[300:]
        rows = cdc_chunks(
            _docs(spark, [(1, text), (2, mutated)])
        ).collect()
        h1 = [r["chunk_hash"] for r in rows if r["doc_id"] == 1]
        h2 = [r["chunk_hash"] for r in rows if r["doc_id"] == 2]
        common = set(h1) & set(h2)
        # all chunks except the edited one (and at most its two
        # boundary neighbors) survive
        assert len(common) >= len(h1) - 3
        assert len(common) < len(h1)  # the edited chunk DID change

    def test_short_text_is_single_chunk(self, spark):
        rows = cdc_chunks(_docs(spark, [(1, "tiny")])).collect()
        assert len(rows) == 1
        assert rows[0]["chunk_len"] == 4 and rows[0]["chunk_idx"] == 0

    def test_null_and_empty_texts_skipped(self, spark):
        rows = cdc_chunks(_docs(spark, [(1, None), (2, ""), (3, "xyz")])).collect()
        assert {r["doc_id"] for r in rows} == {3}

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            cdc_chunks(_docs(spark, [(1, "x")]), window=0)

    def test_shared_chunks_find_copied_span(self, spark):
        span = _text(3, 120)
        rows = [
            (1, _text(4, 100) + span + _text(5, 100)),
            (2, _text(6, 150) + span),
            (3, _text(7, 300)),
        ]
        shared = cdc_shared_chunks(_docs(spark, rows), min_len=16).collect()
        assert len(shared) >= 1
        assert all(r["n_docs"] == 2 and r["first_doc"] == 1 for r in shared)

    def test_matches_duckdb_oracle(self, spark):
        rows = [(i, _text(10 + i, 300)) for i in range(8)]
        rows.append((99, rows[0][1]))  # exact dup of doc 0
        rows.append((100, None))
        df = _docs(spark, rows)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = sorted(tuple(r) for r in cdc_chunks(df).collect())
        want = sorted(
            map(tuple, con.execute(cdc_chunks_oracle_sql()).fetchall())
        )
        assert got == want and len(got) > 0
        got2 = sorted(tuple(r) for r in cdc_shared_chunks(df).collect())
        want2 = sorted(
            map(
                tuple,
                con.execute(cdc_shared_chunks_oracle_sql()).fetchall(),
            )
        )
        assert got2 == want2 and len(got2) > 0


class TestGearChunks:
    """Gear rolling-hash twin (r11 verdict ask #2): same structural
    properties as the md5 form, plus verdict semantics and the
    cross-engine oracle."""

    def _gear(self, spark, rows, **kw):
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunks,
        )

        return gear_chunks(_docs(spark, rows), **kw)

    def test_chunks_reconstruct_text(self, spark):
        text = _text(21)
        rows = self._gear(spark, [(1, text)]).collect()
        assert [r["chunk_idx"] for r in rows] == list(range(len(rows)))
        assert sum(r["chunk_len"] for r in rows) == len(text)
        assert len(rows) > 3

    def test_reconstruction_is_exact_concat(self, spark):
        """concat(chunks) == text, byte for byte — via the shared
        row helper that carries the chunk text."""
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunk_rows,
        )

        for seed in range(5):
            text = _text(30 + seed, 500)
            pieces = [p for _, _, _, p in gear_chunk_rows(text, 8, 32)]
            assert "".join(pieces) == text

    def test_single_char_edit_is_local(self, spark):
        """Content-locality: a one-char substitution reshapes only the
        touched chunk (± its window-adjacent neighbors); every other
        chunk hash survives."""
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunk_rows,
        )

        text = _text(22, 600)
        mutated = text[:300] + "Q" + text[301:]
        h1 = [h for _, h, _, _ in gear_chunk_rows(text, 8, 32)]
        h2 = [h for _, h, _, _ in gear_chunk_rows(mutated, 8, 32)]
        common = set(h1) & set(h2)
        assert len(common) >= len(h1) - 3
        assert len(common) < len(h1)

    def test_insertion_only_disturbs_local_chunks(self, spark):
        text = _text(23, 600)
        mutated = text[:300] + "XYZ" + text[300:]
        rows = self._gear(spark, [(1, text), (2, mutated)]).collect()
        h1 = [r["chunk_hash"] for r in rows if r["doc_id"] == 1]
        h2 = [r["chunk_hash"] for r in rows if r["doc_id"] == 2]
        common = set(h1) & set(h2)
        assert len(common) >= len(h1) - 3
        assert len(common) < len(h1)

    def test_short_null_empty(self, spark):
        rows = self._gear(
            spark, [(1, "tiny"), (2, None), (3, "")]
        ).collect()
        assert len(rows) == 1 and rows[0]["doc_id"] == 1
        assert rows[0]["chunk_len"] == 4

    def test_null_doc_id_skipped_not_stage_failure(self, spark):
        """r12 advice: int(doc_id) in the Arrow batch raises on
        NaN/None — a NULL id must be filtered out (like the md5 form
        tolerates), not fail the whole stage."""
        docs = spark.createDataFrame(
            [(None, "some text long enough to chunk"), (7, "hello!")],
            "doc_id long, text string",
        )
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunks,
        )

        rows = gear_chunks(docs).collect()
        assert {r["doc_id"] for r in rows} == {7}

    def test_streaming_chunker_skips_null_doc_id(self, spark):
        from eventhub_to_timescale_spark.streaming.cdcdedup import (
            streaming_cdc_chunks,
        )

        docs = spark.createDataFrame(
            [(None, "some text long enough to chunk"), (7, "hello!")],
            "doc_id long, text string",
        )
        rows = streaming_cdc_chunks(docs, min_len=1).collect()
        assert {r["doc_id"] for r in rows} == {7}

    def test_bad_params_raise(self, spark):
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunks,
        )

        with pytest.raises(ValueError):
            gear_chunks(_docs(spark, [(1, "x")]), window=0)

    def test_matches_duckdb_oracle(self, spark):
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            cdc_dup_verdicts,
            cdc_dup_verdicts_oracle_sql,
            gear_chunks,
            gear_chunks_oracle_sql,
            gear_shared_chunks,
            gear_shared_chunks_oracle_sql,
        )

        span = _text(40, 300)
        rows = [(i, _text(50 + i, 300)) for i in range(8)]
        rows.append((99, rows[0][1]))  # exact dup of doc 0
        rows.append((50, rows[2][1][:150] + span))  # shares a span
        rows.append((51, span + _text(60, 90)))
        rows.append((100, None))
        rows.append((101, "héllo wörld ünicode " * 40))  # non-ascii
        df = _docs(spark, rows)
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = sorted(tuple(r) for r in gear_chunks(df).collect())
        want = sorted(
            map(tuple, con.execute(gear_chunks_oracle_sql()).fetchall())
        )
        assert got == want and len(got) > 0
        got2 = sorted(tuple(r) for r in gear_shared_chunks(df).collect())
        want2 = sorted(
            map(
                tuple,
                con.execute(gear_shared_chunks_oracle_sql()).fetchall(),
            )
        )
        assert got2 == want2 and len(got2) > 0
        got3 = [tuple(r) for r in cdc_dup_verdicts(df).collect()]
        want3 = list(
            map(
                tuple,
                con.execute(cdc_dup_verdicts_oracle_sql()).fetchall(),
            )
        )
        assert got3 == want3 and len(got3) > 0
        verdicts = dict(got3)
        assert verdicts[99] == 0  # exact dup caught
        assert verdicts[51] is not None  # shared-span dup caught

    def test_gear_and_md5_forms_agree_on_exact_dups(self, spark):
        """Different boundary rules, same evidence class: an exact
        duplicate document shares ALL its chunks under either form."""
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_shared_chunks,
        )

        text = _text(70, 400)
        df = _docs(spark, [(1, text), (2, text)])
        for shared in (
            cdc_shared_chunks(df, min_len=16),
            gear_shared_chunks(df, min_len=16),
        ):
            rows = shared.collect()
            assert len(rows) >= 1
            assert all(r["n_docs"] == 2 and r["first_doc"] == 1 for r in rows)


class TestBoundaryExpressionBoundOnce:
    def test_rolling_hash_appears_once_in_plan(self, spark):
        """r16 pin: the md5 rolling-window boundary expression must be
        bound ONCE per row via the single-element transform idiom
        (ingest/dynamic.py _node).  Before the fix the per-chunk
        lambda referenced the boundary array 6 times and Catalyst
        inlined a fresh full rolling-hash pass (one md5 per text
        position) at every reference — grep the optimized plan for the
        window-hash signature and demand exactly one expansion."""
        df = cdc_chunks(_docs(spark, [(1, _text(9, 300))]))
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("conv(substring(md5(") == 1
