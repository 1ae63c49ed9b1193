"""Balanced range-partition profile (operators/layout.py) and
stratified k-fold CV assignment (operators/sampling.py): literal
balance guarantees, determinism, and cross-engine oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.layout import (
    range_partition_profile,
    range_partition_profile_oracle_sql,
)
from eventhub_to_timescale_spark.operators.sampling import (
    cv_fold_assign,
    cv_fold_oracle_sql,
)

T0 = datetime(2024, 1, 1)


def _events(spark, values, etype="a"):
    rows = [
        (i, T0 + timedelta(minutes=i), 0, etype, float(v), None)
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestRangePartitionProfile:
    def test_equal_count_tiles(self, spark):
        # 16 rows, 8 buckets -> every tile exactly 2 rows.
        df = _events(spark, range(16))
        rows = range_partition_profile(df, 8).collect()
        assert len(rows) == 8
        assert all(r.n_rows == 2 for r in rows)
        # tiles ordered by value: bucket b holds values [2b-2, 2b-1]
        for r in rows:
            assert r.lo == float(2 * (r.bucket - 1))
            assert r.hi == float(2 * (r.bucket - 1) + 1)

    def test_remainder_goes_to_leading_tiles(self, spark):
        # 10 rows, 8 buckets: SQL-standard NTILE gives the first two
        # tiles 2 rows, the rest 1.
        df = _events(spark, range(10))
        counts = {
            r.bucket: r.n_rows
            for r in range_partition_profile(df, 8).collect()
        }
        assert counts == {1: 2, 2: 2, 3: 1, 4: 1, 5: 1, 6: 1, 7: 1, 8: 1}

    def test_spans_are_contiguous_and_sorted(self, spark):
        df = _events(spark, [5, 3, 8, 1, 9, 2, 7, 4, 6, 0])
        rows = range_partition_profile(df, 5).collect()
        for prev, cur in zip(rows, rows[1:]):
            assert prev.hi <= cur.lo

    def test_null_values_excluded(self, spark):
        df = _events(spark, range(8)).withColumn(
            "value",
            F.when(F.col("event_id") % 2 == 0, F.col("value")),
        )
        rows = range_partition_profile(df, 4).collect()
        assert sum(r.n_rows for r in rows) == 4


class TestCvFoldAssign:
    def _docs(self, spark, n, langs=("en", "de")):
        return spark.createDataFrame(
            [
                (i, f"text {i}", langs[i % len(langs)], "src_0", 10 + i)
                for i in range(n)
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long",
        )

    def test_exact_balance_within_stratum(self, spark):
        df = self._docs(spark, 100)
        got = (
            cv_fold_assign(df, 5)
            .groupBy("stratum", "fold")
            .count()
            .collect()
        )
        # 50 docs per lang, 5 folds -> exactly 10 per cell.
        assert len(got) == 10
        assert all(r["count"] == 10 for r in got)

    def test_uneven_stratum_balance_within_one(self, spark):
        df = self._docs(spark, 23, langs=("en",))
        counts = [
            r["count"]
            for r in cv_fold_assign(df, 5).groupBy("fold").count().collect()
        ]
        assert sorted(counts) == [4, 4, 5, 5, 5]

    def test_deterministic_and_salt_keyed(self, spark):
        df = self._docs(spark, 30)
        a = {r.doc_id: r.fold for r in cv_fold_assign(df, 5).collect()}
        b = {r.doc_id: r.fold for r in cv_fold_assign(df, 5).collect()}
        assert a == b
        c = {
            r.doc_id: r.fold
            for r in cv_fold_assign(df, 5, salt="other").collect()
        }
        assert a != c  # a re-deal, not the same permutation

    def test_k_validation(self, spark):
        with pytest.raises(ValueError):
            cv_fold_assign(self._docs(spark, 4), 1)


def test_oracle_parity_sf0001(spark):
    con = duckdb.connect()
    for t, path in [
        ("events", "/root/testdata/sf0.001/events.parquet"),
        ("documents", "/root/testdata/sf0.001/documents.parquet"),
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = [tuple(r) for r in range_partition_profile(ev).collect()]
    want = con.execute(range_partition_profile_oracle_sql()).fetchall()
    assert got == want

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    folds = (
        cv_fold_assign(docs)
        .join(docs.select("doc_id", "n_chars"), "doc_id")
        .groupBy("stratum", "fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("stratum", "fold")
    )
    got = [tuple(r) for r in folds.collect()]
    want = con.execute(cv_fold_oracle_sql()).fetchall()
    assert got == want
