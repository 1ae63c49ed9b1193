"""Corpus-curation operators a training-data pipeline runs between
ingest and tokenization: PII redaction, benchmark decontamination, and
intra-document repetition signals.

All three are standard pre-training stages (C4 removed boilerplate and
bad lines, GPT-3/PaLM decontaminate against eval n-grams, Gopher's
quality filters threshold repetition ratios) re-expressed as
declarative Spark plans:

- ``redact_pii`` — pure per-row ``regexp_replace``/``regexp_extract_all``
  expression work: JVM codegen, no shuffle, pushdown-friendly. The
  pattern set is deliberately conservative (no lookaround, no
  ambiguous alternation) so Java-regex (Spark) and RE2 (DuckDB oracle)
  agree byte-for-byte on every match.
- ``contamination_flags`` / ``decontaminate`` — drop corpus documents
  sharing any word n-gram with an evaluation set. The eval side of the
  join is exploded shingles of the (small) benchmark corpus and is
  broadcast; the corpus side explodes to (shingle, doc) pairs —
  linear, one pass, and the join never shuffles the corpus (broadcast
  hash join on the shingle key). This is the join direction that
  holds at 100 TB: benchmarks are MBs, corpora are not.
- ``repetition_stats`` — per-document duplicate n-gram fraction
  (Gopher-style quality signal): array expressions only, no UDF, no
  shuffle.

Shingle construction is shared with the MinHash dedup path
(operators/dedup.py word_shingles) so the two surfaces cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.dedup import word_shingles

# Conservative, engine-portable PII patterns. No lookaround (RE2 has
# none), no alternation whose branch order matters (Java backtracking
# is leftmost-first, RE2 is leftmost-longest — simple greedy runs over
# disjoint classes agree in both).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
EMAIL_TOKEN = "[EMAIL]"
IP_TOKEN = "[IP]"


def redact_pii(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """→ (doc_id, clean_text, n_emails, n_ipv4): PII occurrences
    replaced with stable tokens (so downstream tokenization sees a
    consistent vocabulary item, not a hole) plus per-class counts for
    corpus auditing. Email first: an address can embed digits-and-dots
    substrings an IPv4 pass would otherwise mangle mid-token."""
    t = F.col(text_col)
    emails_out = F.regexp_replace(t, EMAIL_RE, EMAIL_TOKEN)
    return docs.select(
        F.col(id_col),
        F.regexp_replace(emails_out, IPV4_RE, IP_TOKEN).alias("clean_text"),
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(t, F.lit(IPV4_RE), F.lit(0))).alias(
            "n_ipv4"
        ),
    )


def _contamination_flags(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    eval_shingles = (
        eval_docs.select(
            F.explode(
                word_shingles(F.col(text_col), shingle_n)
            ).alias("shingle")
        )
        .distinct()
    )
    corpus_shingles = corpus.select(
        F.col(id_col),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    )
    return (
        corpus_shingles.join(F.broadcast(eval_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlapping"))
    )


def contamination_flags(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_overlapping): corpus documents sharing ≥1 word
    ``shingle_n``-gram with any eval document, with the count of
    overlapping shingle OCCURRENCES in the corpus document (a shingle
    repeated k times in one doc contributes k — repeats are themselves
    a contamination-severity signal). The eval shingle set is
    broadcast; the corpus never shuffles. Output is sorted by doc_id
    for stable presentation; use ``decontaminate`` when only the
    membership matters — it skips the sort."""
    return _contamination_flags(
        corpus, eval_docs, shingle_n, text_col, id_col
    ).orderBy(id_col)


def decontaminate(
    corpus: DataFrame,
    eval_docs: DataFrame,
    shingle_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The survivor set: corpus minus every document flagged by
    ``contamination_flags`` (one broadcast semi-join shape, anti
    direction). Builds from the unsorted flag plan — the anti-join
    build side needs membership only, so the presentation sort would
    be dead compute."""
    flagged = _contamination_flags(
        corpus, eval_docs, shingle_n, text_col, id_col
    ).select(id_col)
    return corpus.join(flagged, id_col, "left_anti")


def repetition_stats(
    docs: DataFrame,
    ngram_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_ngrams, n_distinct, repetition_ratio): fraction of
    word n-gram occurrences that are repeats of an earlier n-gram in
    the SAME document — the Gopher-class quality signal for looping or
    boilerplate-stuffed text. ratio = 1 − distinct/total, 6 dp."""
    w = F.split(F.col(text_col), " ")
    total = F.greatest(F.size(w) - (ngram_n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), total),
        lambda i: F.concat_ws(" ", F.slice(w, i, ngram_n)),
    )
    return docs.select(
        F.col(id_col),
        total.cast("long").alias("n_ngrams"),
        F.size(F.array_distinct(grams)).cast("long").alias("n_distinct"),
        F.round(
            1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6
        ).alias("repetition_ratio"),
    )


__all__ = [
    "redact_pii",
    "contamination_flags",
    "decontaminate",
    "repetition_stats",
    "EMAIL_RE",
    "IPV4_RE",
    "gopher_quality_flags",
    "gopher_oracle_sql",
    "GOPHER_STOPWORDS",
]


# Gopher's doc-level quality gates (Rae et al. 2021, arXiv:2112.11446
# table A1) re-cut for this corpus's tokenizer. Every rule is an
# INTEGER cross-multiplication (3·n ≤ chars, 5·alpha ≥ 4·n, ...) so
# the Spark plan and the DuckDB oracle compare identical BIGINTs —
# no float ratio can straddle a threshold differently per engine.
# The paper's English stop list is a deploy-time knob: a corpus whose
# register lacks "that"/"have" (like the synthetic bench corpus) gates
# on its own function-word list instead.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    docs: DataFrame,
    min_words: int = 10,
    max_words: int = 500,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, n_words, ok_word_count, ok_mean_len, ok_alpha,
    ok_stopwords, ok_repetition, keep): Gopher-style document quality
    gates, one boolean per rule plus the conjunction.

    Rules (integer forms):
    - word count in [min_words, max_words]
    - mean word length in [3, 10]: 3·n ≤ Σ len(w) ≤ 10·n
    - ≥80% of words contain an alphabetic char: 5·alpha ≥ 4·n
    - ≥2 distinct Gopher stop words present
    - most frequent word ≤20% of tokens: 5·max_cnt ≤ n

    100 TB posture: pure per-row array expressions on the corpus scan
    (no shuffle, no UDF, pushdown-friendly). The max-frequency rule is
    O(distinct·n) per document — linear in corpus size with bounded
    document length, and entirely inside whole-stage codegen.
    """
    ws = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(r"[a-z]+|[0-9]+"), 0
    )
    n = F.size(ws).cast("long")
    chars = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha = F.size(F.filter(ws, lambda w: w.rlike("[a-z]"))).cast("long")
    stops = F.size(
        F.array_intersect(
            F.array_distinct(ws),
            F.array(*[F.lit(s) for s in stopwords]),
        )
    )
    max_cnt = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(ws),
                lambda w: F.size(F.filter(ws, lambda x: x == w)),
            )
        ),
        F.lit(0),
    ).cast("long")
    flags = {
        "ok_word_count": (n >= min_words) & (n <= max_words),
        "ok_mean_len": (3 * n <= chars) & (chars <= 10 * n),
        "ok_alpha": 5 * alpha >= 4 * n,
        "ok_stopwords": stops >= 2,
        "ok_repetition": 5 * max_cnt <= n,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return docs.select(
        F.col(id_col),
        n.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        keep.alias("keep"),
    )


def gopher_oracle_sql(
    min_words: int = 10,
    max_words: int = 500,
    stopwords: tuple[str, ...] = GOPHER_STOPWORDS,
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``gopher_quality_flags`` — same tokenizer,
    same integer cross-multiplied thresholds."""
    stop_list = ", ".join(f"'{s}'" for s in stopwords)
    return f"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0) AS ws
  FROM {table}
), m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n,
         CAST(COALESCE(list_sum(list_transform(ws, x -> strlen(x))), 0)
              AS BIGINT) AS chars,
         CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]')))
              AS BIGINT) AS alpha,
         CAST(len(list_intersect(list_distinct(ws), [{stop_list}]))
              AS BIGINT) AS stops,
         CAST(COALESCE(list_max(list_transform(list_distinct(ws),
              w -> len(list_filter(ws, x -> x = w)))), 0)
              AS BIGINT) AS max_cnt
  FROM w
)
SELECT doc_id,
       n AS n_words,
       (n >= {min_words} AND n <= {max_words}) AS ok_word_count,
       (3 * n <= chars AND chars <= 10 * n) AS ok_mean_len,
       (5 * alpha >= 4 * n) AS ok_alpha,
       (stops >= 2) AS ok_stopwords,
       (5 * max_cnt <= n) AS ok_repetition,
       ((n >= {min_words} AND n <= {max_words})
        AND (3 * n <= chars AND chars <= 10 * n)
        AND (5 * alpha >= 4 * n)
        AND (stops >= 2)
        AND (5 * max_cnt <= n)) AS keep
FROM m
"""


# ---------------------------------------------------------------------------
# Deterministic text normalization (exact-dedup pre-step)
# ---------------------------------------------------------------------------

# Typographic variants folded to ASCII before whitespace work.  A
# TRANSLATE character map (code point → code point, or → space), not a
# regex: both engines apply translate() per code point with identical
# semantics, so there is no regex-dialect surface at all.  Curly
# quotes/apostrophes → straight, en/em dash & minus → hyphen,
# ellipsis → '.', NBSP and ideographic space → space.
_XLATE_FROM = "‘’‚‛“”„′″–—−… 　"
_XLATE_TO = "''''\"\"\"'\"---.  "

# Control characters (C0 minus \t\n\r, plus DEL) dropped outright.
# Explicit class, not \s / \p{Cntrl}: Java and RE2 agree on explicit
# ranges; dialect shorthands differ (\s includes \x0B in Java only).
_CTRL_RE = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"
_WS_RE = "[ \\t\\n\\r]+"

# ASCII-only lowercase via translate: JVM lower() applies full Unicode
# case mapping (U+0130 → 'i' + U+0307) while DuckDB/utf8proc applies
# the simple mapping (U+0130 → 'i'), so engine lower() is NOT
# cross-engine deterministic on cased non-ASCII input.
_UPPER_ASCII = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER_ASCII = "abcdefghijklmnopqrstuvwxyz"


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: bool = True,
) -> DataFrame:
    """→ (doc_id, norm_text, changed): canonical text form for
    exact-match work — the pre-step that makes ``exact_dedup``/KMV
    catch trivially-different duplicates (curly-quote edits, NBSP,
    CRLF vs LF, trailing whitespace) that differ byte-wise but not
    content-wise.  C4/RefinedWeb-style cleanup, minus anything
    engine-ambiguous: fold typographic variants via a per-code-point
    TRANSLATE map, strip control characters, collapse all runs of
    whitespace to one space, trim, lowercase.

    Every step is chosen for CROSS-ENGINE determinism: translate() is
    per-code-point in both engines; the regexes use explicit character
    classes only (no ``\\s``, whose membership differs between Java
    regex and RE2; no ``\\p{...}``, no lookaround); and the lowercase
    step is an explicit A-Z→a-z TRANSLATE, not ``lower()`` — JVM full
    Unicode case mapping and DuckDB/utf8proc simple mapping disagree
    on cased non-ASCII code points (e.g. U+0130 'İ' → 'i'+combining
    dot vs plain 'i'), so engine ``lower()`` would break the
    byte-for-byte guarantee exactly where it matters.  So Spark and
    the DuckDB oracle agree byte-for-byte on ALL input; non-ASCII
    letters keep their case (full Unicode case folding, like NFC/NFKC,
    is deliberately OUT of scope — neither engine exposes a
    deterministic shared built-in, and a Python UDF would put per-row
    Python in a scan-speed path).

    100 TB posture: projection-only expression work — zero shuffle,
    runs at scan speed inside whole-stage codegen, and composes ahead
    of any dedup stage without changing that stage's plan.
    """
    t = F.col(text_col)
    norm = F.translate(
        F.trim(
            F.regexp_replace(
                F.regexp_replace(
                    F.translate(t, _XLATE_FROM, _XLATE_TO),
                    _CTRL_RE,
                    "",
                ),
                _WS_RE,
                " ",
            )
        ),
        _UPPER_ASCII,
        _LOWER_ASCII,
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(t.isNotNull(), norm).alias("norm_text"),
        F.when(t.isNotNull(), norm != t).alias("changed"),
    )
    # ``order=False`` for pipeline composition (r16): the presentation
    # sort is a full range Exchange that AQE collapses to ONE partition
    # at bench scale, so every downstream stage built on the sorted
    # frame (quality flags, span surgery, shingling) ran single-
    # threaded off a 1-partition boundary leaf.  Standalone/oracled
    # callers keep the sorted contract (default).
    return out.orderBy("doc_id") if order else out


def normalize_oracle_sql(
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``normalize_text`` — same translate map,
    same explicit-class regexes, same operation order."""
    xf = _XLATE_FROM.replace("'", "''")
    xt = _XLATE_TO.replace("'", "''")
    return f"""
WITH n AS (
  SELECT {id_expr} AS doc_id, {text_expr} AS t,
         translate(trim(regexp_replace(regexp_replace(
             translate({text_expr}, '{xf}', '{xt}'),
             '{_CTRL_RE}', '', 'g'),
           '{_WS_RE}', ' ', 'g')),
           '{_UPPER_ASCII}', '{_LOWER_ASCII}') AS norm
  FROM {table}
)
SELECT doc_id,
       CASE WHEN t IS NOT NULL THEN norm END AS norm_text,
       CASE WHEN t IS NOT NULL THEN norm != t END AS changed
FROM n ORDER BY doc_id
"""
