"""Semantic tests for the r7 sampling additions: per-source quota and
weighted deterministic sampling (operators/sampling.py). Cross-engine
parity runs in check_parity / test_gate_tail_parity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.sampling import (
    sample_weighted,
    source_quota,
)


def _docs(spark, n=60, sources=3):
    return spark.createDataFrame(
        [(i, f"s{i % sources}", (i * 37) % 100) for i in range(n)],
        "doc_id long, source string, n_chars long",
    )


class TestSourceQuota:
    def test_caps_each_group(self, spark):
        out = source_quota(_docs(spark), "doc_id", "source", 5).collect()
        per = {}
        for r in out:
            per[r["source"]] = per.get(r["source"], 0) + 1
        assert per == {"s0": 5, "s1": 5, "s2": 5}

    def test_quota_above_group_size_keeps_all(self, spark):
        df = _docs(spark, n=6, sources=3)
        out = source_quota(df, "doc_id", "source", 100).collect()
        assert len(out) == 6

    def test_membership_stable_under_growth(self, spark):
        # a surviving row keeps its slot unless a smaller-hash row
        # joins its group: survivors of the 60-doc corpus that are
        # also in the 30-doc prefix must be chosen there too when
        # they won on hash order
        big = {
            r["doc_id"]
            for r in source_quota(
                _docs(spark, 60), "doc_id", "source", 5
            ).collect()
        }
        small_df = _docs(spark, 60).filter(F.col("doc_id") < 30)
        small = {
            r["doc_id"]
            for r in source_quota(
                small_df, "doc_id", "source", 5
            ).collect()
        }
        # every winner from the big corpus that exists in the small
        # one still wins there (fewer competitors, never more)
        assert {d for d in big if d < 30} <= small

    def test_rejects_nonpositive_quota(self, spark):
        import pytest

        with pytest.raises(ValueError):
            source_quota(_docs(spark), "doc_id", "source", 0)


class TestSampleWeighted:
    def test_zero_and_one_weights(self, spark):
        df = _docs(spark)
        none = sample_weighted(df, "doc_id", F.lit(0.0)).count()
        allr = sample_weighted(df, "doc_id", F.lit(1.0)).count()
        assert none == 0
        assert allr == 60

    def test_weights_clip_outside_unit(self, spark):
        df = _docs(spark)
        over = sample_weighted(df, "doc_id", F.lit(5.0)).count()
        under = sample_weighted(df, "doc_id", F.lit(-1.0)).count()
        assert over == 60 and under == 0

    def test_monotone_in_weight(self, spark):
        # the same row can only gain membership as its weight rises
        df = _docs(spark, n=500)
        lo = {
            r["doc_id"]
            for r in sample_weighted(df, "doc_id", F.lit(0.2)).collect()
        }
        hi = {
            r["doc_id"]
            for r in sample_weighted(df, "doc_id", F.lit(0.8)).collect()
        }
        assert lo <= hi
        assert len(lo) < len(hi)

    def test_deterministic_rerun(self, spark):
        df = _docs(spark, n=200)
        w = F.col("n_chars") / F.lit(100.0)
        a = {r["doc_id"] for r in sample_weighted(df, "doc_id", w).collect()}
        b = {r["doc_id"] for r in sample_weighted(df, "doc_id", w).collect()}
        assert a == b and 0 < len(a) < 200


class TestTokenBudget:
    """token_budget_select: deterministic md5-order prefix under a
    token budget; the two-phase bucket plan must equal the naive
    global cumulative sum."""

    def _docs(self, spark, n=40):
        rows = [(i, " ".join(f"w{j}" for j in range(3 + i % 7)))
                for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _naive(self, docs, budget, salt="budget"):
        import hashlib

        rows = [(r["doc_id"], r["text"]) for r in docs.collect()]
        import re

        toks = {
            d: len(re.findall(r"[a-z]+|[0-9]+", t.lower())) for d, t in rows
        }
        order = sorted(
            toks,
            key=lambda d: (
                hashlib.md5(f"{d}{salt}".encode()).hexdigest(),
                d,
            ),
        )
        kept, run = set(), 0
        for d in order:
            run += toks[d]
            if run > budget:
                break
            kept.add(d)
        return kept

    def test_matches_naive_prefix(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            token_budget_select,
        )

        docs = self._docs(spark)
        for budget in (0, 7, 50, 120, 10_000):
            got = {
                r["doc_id"]
                for r in token_budget_select(docs, budget).collect()
            }
            assert got == self._naive(docs, budget), budget

    def test_budget_respected_and_maximal(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            token_budget_select,
        )

        docs = self._docs(spark)
        out = token_budget_select(docs, 60).collect()
        total = sum(r["n_tokens"] for r in out)
        assert total <= 60
        # maximal prefix: the next doc in order would overflow
        assert total > 60 - 10  # every doc has 3..9 tokens

    def test_rejects_negative_budget(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            token_budget_select,
        )

        import pytest

        with pytest.raises(ValueError):
            token_budget_select(self._docs(spark), -1)


class TestTemperatureMix:
    """temperature_mix: integer-exact sqrt quotas; two-phase plan
    equals the naive per-group md5-rank selection."""

    def _docs(self, spark):
        rows = []
        i = 0
        for grp, n in (("en", 100), ("de", 25), ("fr", 9)):
            for _ in range(n):
                rows.append((i, grp))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def _naive(self, rows, total, salt="mix"):
        import hashlib
        import math
        from collections import defaultdict

        by = defaultdict(list)
        for d, g in rows:
            by[g].append(d)
        s = {g: math.isqrt(len(v)) for g, v in by.items()}
        ssum = sum(s.values())
        kept = set()
        for g, ids in by.items():
            q = total * s[g] // ssum
            order = sorted(
                ids,
                key=lambda d: (
                    hashlib.md5(f"{d}{salt}".encode()).hexdigest(),
                    d,
                ),
            )
            kept.update(order[:q])
        return kept

    def test_matches_naive_selection(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            temperature_mix,
        )

        docs = self._docs(spark)
        rows = [(r["doc_id"], r["lang"]) for r in docs.collect()]
        for total in (0, 10, 50, 134, 1000):
            got = {
                r["doc_id"]
                for r in temperature_mix(docs, total).collect()
            }
            assert got == self._naive(rows, total), total

    def test_flattens_majority_share(self, spark):
        from collections import Counter

        from eventhub_to_timescale_spark.operators.sampling import (
            temperature_mix,
        )

        # raw shares 100/25/9 = 75%/19%/7%; sqrt weights 10/5/3 →
        # mixed shares 55%/27%/16% — majority down, minority up
        got = Counter(
            r["lang"]
            for r in temperature_mix(self._docs(spark), 90).collect()
        )
        assert got["en"] == 90 * 10 // 18
        assert got["de"] == 90 * 5 // 18
        assert got["fr"] == min(90 * 3 // 18, 9)  # quota capped by size
        raw_en = 100 / 134
        assert got["en"] / sum(got.values()) < raw_en

    def test_quota_beyond_group_keeps_group(self, spark):
        from collections import Counter

        from eventhub_to_timescale_spark.operators.sampling import (
            temperature_mix,
        )

        got = Counter(
            r["lang"]
            for r in temperature_mix(self._docs(spark), 10_000).collect()
        )
        # fr quota 10000*3//18 = 1666 > 9 docs → whole group survives
        assert got["fr"] == 9

    def test_rejects_negative_total(self, spark):
        import pytest

        from eventhub_to_timescale_spark.operators.sampling import (
            temperature_mix,
        )

        with pytest.raises(ValueError):
            temperature_mix(self._docs(spark), -5)
