"""Distributed BPE train + apply (operators/bpe.py, r14 verdict ask
#5): the Spark fold / the oracle's chain-parity SQL / a pure-Python
Sennrich-style reference must all learn the same merge table and
produce the same greedy segmentation — including the run-heavy words
("aaaa…") where naive padded-string replace diverges from greedy BPE.
"""

from __future__ import annotations

import collections
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.bpe import (
    WORD_RE,
    bpe_merge_table,
    bpe_merges_oracle_sql,
    bpe_token_count_oracle_sql,
    bpe_token_counts,
    bpe_train,
)


# --- pure-Python reference (greedy leftmost merge, Sennrich 2016) ---


def _ref_apply(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, num_merges):
    words = collections.Counter()
    for t in texts:
        for w in re.findall(WORD_RE, t.lower()):
            words[w] += 1
    vocab = {w: list(w) for w in words}
    merges = []
    for r in range(1, num_merges + 1):
        pc = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += words[w]
        if not pc:
            break
        (a, b), c = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, c))
        vocab = {w: _ref_apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab, words


# run-heavy corpus: "aaaaaa" is THE case where fixpoint padded-string
# replace diverges from greedy BPE (aa,a,aa,a vs aa,aa,aa)
TEXTS = [
    "aaaaaa aaa abab banana bandana",
    "aaaaaa abab river rider order near",
    "banana near order rider aaa 11211",
]


def _docs(spark, texts=TEXTS):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


class TestTrain:
    def test_merges_match_reference(self, spark):
        ref, _, _ = _ref_train(TEXTS, 8)
        got = [
            (r.rank, r.pair_a, r.pair_b, r.pair_count)
            for r in bpe_merge_table(spark, _docs(spark), 8).collect()
        ]
        assert got == ref

    def test_segmentation_matches_reference_on_runs(self, spark):
        """The fold must produce greedy-BPE segmentations word for
        word — the run words are the discriminating cases."""
        _, ref_vocab, _ = _ref_train(TEXTS, 6)
        _, vocab = bpe_train(_docs(spark), 6)
        got = {r.word: list(r.syms) for r in vocab.collect()}
        vocab.unpersist()
        assert got == ref_vocab

    def test_early_stop_when_fully_merged(self, spark):
        """Single-char words leave no pairs — train must stop early
        rather than loop on an empty argmax."""
        docs = spark.createDataFrame(
            [(0, "a b c a b"), (1, "c a b")], "doc_id long, text string"
        )
        merges, vocab = bpe_train(docs, 50)
        vocab.unpersist()
        assert len(merges) < 50

    def test_bad_num_merges_raises(self, spark):
        with pytest.raises(ValueError):
            bpe_train(_docs(spark), 0)


class TestTokenCounts:
    def test_counts_match_reference(self, spark):
        _, ref_vocab, words = _ref_train(TEXTS, 6)
        want = {}
        for i, t in enumerate(TEXTS):
            want[i] = sum(
                len(ref_vocab[w]) for w in re.findall(WORD_RE, t.lower())
            )
        got = {
            r.doc_id: r.n_tokens
            for r in bpe_token_counts(_docs(spark), 6).collect()
        }
        assert got == want

    def test_apply_is_jvm_side_broadcast_join(self, spark):
        """The apply path must stay whole-stage-codegen-able: a
        broadcast join on the vocab, no Python evaluation nodes."""
        plan = (
            bpe_token_counts(_docs(spark), 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan
        assert "Cartesian" not in plan


class TestOracleEquivalence:
    def test_duckdb_oracle_matches_spark_on_run_corpus(self, spark):
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ", ".join(
                f"({i}, '{t}')" for i, t in enumerate(TEXTS)
            )
            + ") AS v(doc_id, text)"
        )
        want_m = con.execute(bpe_merges_oracle_sql(8)).fetchall()
        got_m = [
            (r.rank, r.pair_a, r.pair_b, r.merged, r.pair_count)
            for r in bpe_merge_table(spark, _docs(spark), 8).collect()
        ]
        assert got_m == want_m
        want_c = con.execute(bpe_token_count_oracle_sql(8)).fetchall()
        got_c = [
            (r.doc_id, r.n_tokens)
            for r in bpe_token_counts(_docs(spark), 8).collect()
        ]
        assert got_c == want_c


class TestPipelineBpeMode:
    def test_manifest_budgets_bpe_counts(self, spark):
        """token_mode='bpe' must budget the BPE counts of the
        decontaminated survivors: every manifest n_tokens equals the
        survivor's BPE count and the selection honors the budget."""
        from eventhub_to_timescale_spark.operators.curation_pipeline import (
            curation_full_pipeline,
        )
        from eventhub_to_timescale_spark.sources.testdata import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        man = curation_full_pipeline(
            docs, token_mode="bpe", bpe_merges=4, budget=3000
        )
        rows = man.collect()
        assert rows, "bpe-mode manifest must not be empty"
        assert sum(r.n_tokens for r in rows) <= 3000
        # lexer mode counts 1 token per word; subword BPE counts are
        # strictly larger at 4 merges (avg word ≫ 5 chars) — guard
        # that the mode actually changed the numbers
        man_lex = curation_full_pipeline(docs, budget=3000).collect()
        lex = {r.doc_id: r.n_tokens for r in man_lex}
        bpe = {r.doc_id: r.n_tokens for r in rows}
        shared = set(lex) & set(bpe)
        # (equality is possible for single-char one-word docs)
        assert shared and all(bpe[d] >= lex[d] for d in shared)
        assert any(bpe[d] > lex[d] for d in shared)

    def test_bad_token_mode_raises(self, spark):
        from eventhub_to_timescale_spark.operators.curation_pipeline import (
            curation_full_pipeline,
        )

        with pytest.raises(ValueError):
            curation_full_pipeline(
                _docs(spark), token_mode="words"
            )


class TestTokenCountsOverride:
    def test_budget_select_accepts_external_counts(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            token_budget_select,
        )

        docs = _docs(spark)
        counts = spark.createDataFrame(
            [(0, 10), (1, 10)], "doc_id long, n_tokens long"
        )  # doc 2 absent -> counts 0
        sel = token_budget_select(docs, budget=20, token_counts=counts)
        got = {r.doc_id: r.n_tokens for r in sel.collect()}
        # all three fit: 10 + 10 + 0
        assert got == {0: 10, 1: 10, 2: 0}
