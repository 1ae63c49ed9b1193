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
