"""Distributed byte-pair-encoding train + apply (r14 verdict ask #5).

The corpus manifest's ``n_tokens`` (and every token-budget consumer:
``token_budget_select``, ``pack_documents``, ``sample_token_budget``)
counts ``[a-z]+|[0-9]+`` lexer tokens — but a trainer budgets BPE
tokens.  This module learns a merge table from the corpus itself
(Sennrich, Haddow & Birch 2016, arXiv:1508.07909 — the algorithm is
public; no external tokenizer is referenced) and counts
tokenizer-faithful tokens with it.

Spark-first design, and the 100 TB posture:

* ``bpe_train`` runs the classic loop — count word frequencies once,
  then N merge rounds — as N **bounded** Spark jobs over the VOCAB
  table, never the corpus.  The corpus is touched exactly once (a
  map-side-combinable word-count groupBy, the same shuffle shape as
  ``text_vocab_topk``); everything after operates on the (word, freq,
  syms) frame, which is bounded by the corpus VOCABULARY (Heaps' law:
  sublinear in corpus size — at 100 TB the vocab frame is a few
  hundred MB, not TB).  Each round costs one vocab-sized job plus ONE
  1-row collect (the argmax pair — the established two-phase driver
  pattern of Q2–Q4 and ``choose_gk_accuracy``).
* The merge **apply** is a JVM-side ``aggregate`` fold — no Python in
  the loop, no UDF: greedy leftmost non-overlapping pair merge is a
  left fold appending each symbol and coalescing the tail when
  (last, current) == (a, b).  The fold is exactly Sennrich's greedy
  scan: a just-merged token ``a||b`` can never re-match as ``a``
  (``b`` is non-empty), so "merge then skip" and "append then check
  tail" produce identical sequences.
* ``bpe_token_counts`` never re-encodes the corpus per document: the
  trained vocab already holds each word's final symbol count, so the
  apply is one **broadcast** join (vocabulary-bounded build side)
  plus a map-side-combinable SUM — the idiomatic Spark apply for
  counting.  Unseen words (impossible when counting the training
  corpus itself) fall back to character count, the zero-merge
  encoding.

Ties in the pair argmax break deterministically by (count DESC,
pair_a ASC, pair_b ASC) — the same ordering the DuckDB oracle uses,
so both engines learn byte-identical merge tables.

The oracle (``bpe_merges_oracle_sql`` / ``bpe_token_count_oracle_sql``)
unrolls the train loop as N materialized CTE blocks (the k-means /
``clustering.py`` precedent).  SQL has no ordered fold, so the oracle
applies each merge with the equivalent *chain-parity* formulation:
within every maximal run of overlapping eligible positions, greedy
leftmost merging takes the 1st, 3rd, 5th… position — a gaps-and-
islands row_number over eligible positions.  Both formulations are
exact greedy BPE; tests pin them against each other and against a
pure-Python reference.

Reference parity note: the reference repo has no tokenizer surface
(its converters count nothing) — this is part of the
training-data-pipeline extension family, built entirely from the
published BPE algorithm.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the corpus word lexer — identical to the manifest's n_tokens
# tokenization and the oracle's regexp_extract_all pattern
WORD_RE = r"[a-z]+|[0-9]+"

_SYM_OK = re.compile(r"^[a-z0-9]+$")


def _words(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{WORD_RE}', 0)")
        ).alias("word")
    )


def _init_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """→ (word, freq, syms): the word-frequency table with each word
    split to characters — the ONE corpus pass of the whole train."""
    return (
        _words(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "syms", F.expr("filter(split(word, ''), s -> s != '')")
        )
    )


def _merge_fold_expr(a: str, b: str) -> str:
    """The greedy-leftmost merge of pair (a, b) as a JVM-side fold.
    Symbols are lexer tokens — [a-z0-9]+ only — so literal injection
    into the expression is safe (asserted)."""
    if not (_SYM_OK.match(a) and _SYM_OK.match(b)):
        raise ValueError(f"non-lexer symbols in merge pair: {a!r}, {b!r}")
    merged = a + b
    fold = (
        "aggregate(syms, cast(array() as array<string>), (acc, s) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND s = '{b}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        "ELSE concat(acc, array(s)) END)"
    )
    # Cheap containment pre-check: a word without BOTH symbols cannot
    # hold an adjacent (a, b), and on such a word the fold is the
    # identity (it appends every symbol unchanged) — so skipping it is
    # bit-identical while sparing the interpreted array rebuild on the
    # typically large majority of vocabulary rows each round.
    return (
        f"CASE WHEN array_contains(syms, '{a}') "
        f"AND array_contains(syms, '{b}') THEN {fold} ELSE syms END"
    )


_PAIRS_EXPR = (
    "transform(sequence(1, size(syms) - 1), i -> "
    "struct(element_at(syms, i) as a, element_at(syms, i + 1) as b))"
)


def bpe_train(
    docs: DataFrame,
    num_merges: int = 12,
    text_col: str = "text",
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """→ ([(rank, pair_a, pair_b, pair_count)…], final vocab frame).

    N bounded rounds: pair-count aggregate over the vocab frame (one
    overlapping-position explode, map-side combinable), a 1-row
    argmax collect, then the fold application.  The vocab frame is
    persisted per round (previous round unpersisted) so round r+1
    starts from materialized state instead of an N-deep fold lineage.
    Stops early if no pair remains (fully merged corpus).

    Action layout (r16, guide §2.4): round r+1's argmax job is ALSO
    round r's materialization — the fold result is persisted lazily
    and first computed by the next argmax, and the parent's cache is
    only released once its child is materialized.  One bounded job
    per round instead of two (the old shape ran an extra ``count()``
    per round purely to materialize; measured ~half the train's cold
    wall at sf0.1).  Only a full-range loop pays one final
    materialization count for the last vocab (its argmax never runs).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    vocab = _init_vocab(docs, text_col).persist()
    prev: DataFrame | None = None
    merges: list[tuple[int, str, str, int]] = []
    try:
        for r in range(1, num_merges + 1):
            best = (
                vocab.filter(F.size("syms") >= 2)
                .select("freq", F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
                .groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("c"))
                .orderBy(F.desc("c"), "a", "b")
                .limit(1)
                .collect()
            )
            # the collect above materialized `vocab` from prev's cache;
            # prev's blocks are now dead weight
            if prev is not None:
                prev.unpersist()
                prev = None
            if not best:
                break
            a, b, c = best[0].a, best[0].b, int(best[0].c)
            merges.append((r, a, b, c))
            nxt = vocab.select(
                "word", "freq", F.expr(_merge_fold_expr(a, b)).alias("syms")
            ).persist()  # lazy: the NEXT round's argmax materializes it
            prev, vocab = vocab, nxt
        if prev is not None:
            # full-range exit: the final vocab never had an argmax run
            # over it — materialize off prev's cache, then release prev
            vocab.count()
            prev.unpersist()
    except Exception:
        vocab.unpersist()
        if prev is not None:
            prev.unpersist()
        raise
    return merges, vocab


def bpe_merge_table(
    spark: SparkSession,
    docs: DataFrame,
    num_merges: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """→ (rank, pair_a, pair_b, merged, pair_count): the learned merge
    table — the train artifact a tokenizer ships.  The frame itself is
    driver-assembled (it IS the loop's N bounded collects); the
    compute happened distributed in ``bpe_train``."""
    merges, vocab = bpe_train(docs, num_merges, text_col)
    vocab.unpersist()
    return spark.createDataFrame(
        [(r, a, b, a + b, c) for r, a, b, c in merges],
        "rank int, pair_a string, pair_b string, merged string, "
        "pair_count bigint",
    )


def bpe_token_counts(
    docs: DataFrame,
    num_merges: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_tokens): tokenizer-faithful BPE token counts per
    document, ordered by doc_id.  Train on the corpus, then ONE
    broadcast join of the per-word token counts (the vocab already
    holds each word's final segmentation) and a map-side SUM — the
    corpus is scanned twice total (train word-count + apply), never
    per merge round.  Documents with zero lexer words are absent
    (inner-join semantics, same as the oracle).

    The per-word token-count table is cut from the train lineage with
    a stage boundary (r16): the old shape unpersisted the trained
    vocab BEFORE returning, so every action on the returned frame
    re-ran the whole N-round merge-fold chain from the raw corpus —
    measured 0.95 s warm at sf0.1 for what is one broadcast-join +
    SUM over a leaf (~0.3 s).  The boundary is the trained-model
    artifact a production tokenizer would ship anyway."""
    _, vocab = bpe_train(docs, num_merges, text_col)
    from eventhub_to_timescale_spark.operators.boundary import (
        stage_boundary as _boundary,
    )

    word_tokens = _boundary(
        vocab.select("word", F.size("syms").cast("long").alias("_wtok"))
    )
    vocab.unpersist()  # safe: word_tokens is materialized
    return (
        docs.select(
            F.col(id_col),
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'{WORD_RE}', 0)"
                )
            ).alias("word"),
        )
        .join(F.broadcast(word_tokens), "word")
        .groupBy(id_col)
        .agg(F.sum("_wtok").alias("n_tokens"))
        .orderBy(id_col)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle — the train loop unrolled (k-means precedent)
# ---------------------------------------------------------------------------


def _oracle_round_block(r: int) -> str:
    """One unrolled merge round vt{r} → vt{r+1}.  Greedy application
    via chain parity: eligible position i has (syms[i], syms[i+1]) ==
    the round's argmax pair; within each maximal run of consecutive
    eligible positions (gaps-and-islands grp) the 1st, 3rd, … merge;
    position i+1 of a merged i is consumed.  Scalar subqueries on
    m{r} keep an empty pair table harmless (NULL never eligible).
    Every CTE is MATERIALIZED — DuckDB inlines by default and the
    chain references each frame multiple times (the measured 215 s vs
    13 s lesson from the dedup pipeline oracle)."""
    return f"""
p{r} AS MATERIALIZED (
  SELECT syms[i] AS a, syms[i+1] AS b, CAST(SUM(freq) AS BIGINT) AS c
  FROM vt{r}, UNNEST(generate_series(1, len(syms)-1)) AS t(i)
  WHERE len(syms) >= 2
  GROUP BY 1, 2
),
m{r} AS MATERIALIZED (SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1),
e{r} AS MATERIALIZED (
  SELECT word, freq, i, syms[i] AS sym,
         (i < len(syms)
          AND syms[i] = (SELECT a FROM m{r})
          AND syms[i+1] = (SELECT b FROM m{r})) AS elig
  FROM vt{r}, UNNEST(generate_series(1, len(syms))) AS t(i)
),
g{r} AS MATERIALIZED (
  SELECT word, i FROM (
    SELECT word, i,
           row_number() OVER (PARTITION BY word, grp ORDER BY i) AS rn
    FROM (
      SELECT word, i,
             i - row_number() OVER (PARTITION BY word ORDER BY i) AS grp
      FROM e{r} WHERE elig
    )
  ) WHERE rn % 2 = 1
),
vt{r + 1} AS MATERIALIZED (
  SELECT e.word, ANY_VALUE(e.freq) AS freq,
         list(CASE WHEN gm.i IS NOT NULL
                   THEN e.sym || (SELECT b FROM m{r})
                   ELSE e.sym END ORDER BY e.i) AS syms
  FROM e{r} e
  LEFT JOIN g{r} gm ON gm.word = e.word AND gm.i = e.i
  LEFT JOIN g{r} gc ON gc.word = e.word AND gc.i = e.i - 1
  WHERE gc.i IS NULL
  GROUP BY e.word
)"""


def _oracle_prefix(num_merges: int, table: str) -> str:
    blocks = ",".join(
        _oracle_round_block(r) for r in range(1, num_merges + 1)
    )
    return f"""
WITH w0 AS MATERIALIZED (
  SELECT UNNEST(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM {table}
),
vt1 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         list_transform(generate_series(1, length(word)),
                        i -> word[i:i]) AS syms
  FROM w0 GROUP BY word
),{blocks}"""


def bpe_merges_oracle_sql(
    num_merges: int = 12, table: str = "documents"
) -> str:
    """DuckDB rendering of ``bpe_merge_table``."""
    union = " UNION ALL ".join(
        f"SELECT {r} AS rank, a AS pair_a, b AS pair_b, a||b AS merged, "
        f"c AS pair_count FROM m{r}"
        for r in range(1, num_merges + 1)
    )
    return (
        _oracle_prefix(num_merges, table)
        + f"\nSELECT * FROM ({union}) ORDER BY rank"
    )


def bpe_token_count_oracle_sql(
    num_merges: int = 12, table: str = "documents"
) -> str:
    """DuckDB rendering of ``bpe_token_counts``."""
    return (
        _oracle_prefix(num_merges, table)
        + f""",
dw AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(lower(text), '{WORD_RE}')) AS word
  FROM {table}
)
SELECT doc_id, CAST(SUM(len(v.syms)) AS BIGINT) AS n_tokens
FROM dw JOIN vt{num_merges + 1} v USING (word)
GROUP BY doc_id ORDER BY doc_id"""
    )


__all__ = [
    "WORD_RE",
    "bpe_train",
    "bpe_merge_table",
    "bpe_token_counts",
    "bpe_merges_oracle_sql",
    "bpe_token_count_oracle_sql",
]
