"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token statistics, document fingerprinting.

All pure JVM-side expressions (split / transform / aggregate / regexp)
— linear per-document work, no shuffle, no UDF — so they pipeline with
scans and survive any scale-up. Heuristics are deliberately simple and
*pinned*: each is mirrored 1:1 in a DuckDB oracle, which is the point —
deterministic, auditable filters, not model-quality language ID.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# marker stopwords per language for the n-gram/stopword-overlap
# heuristic; extend per deployment
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "la", "les", "et", "ne"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

_PUNCT_RE = r"[.,!?;:]"
_TOKEN_RE = r"[a-z]+|[0-9]+"


def _words(text: Column) -> Column:
    return F.split(text, " ")


def _marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    ws = _words(F.lower(text))
    return F.size(F.array_intersect(ws, F.array(*[F.lit(m) for m in markers])))


def language_id_col(text: Column) -> tuple[Column, Column]:
    """(lang_pred, lang_hits) column pair: language with the most
    distinct marker-stopword hits; ties (incl. zero hits) → 'und',
    resolved by language-code order for determinism."""
    hits = {lang: _marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    # reverse-sorted so earlier codes win ties after the final when-chain
    for lang in sorted(hits, reverse=True):
        pred = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            pred
        )
    return pred, best.cast("int")


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    pred, hits = language_id_col(F.col(text_col))
    return docs.select(
        "doc_id", pred.alias("lang_pred"), hits.alias("lang_hits")
    )


def quality_col(t: Column) -> Column:
    """The pinned [0,1] quality score as a single column expression."""
    ws = _words(t)
    n_chars = F.length(t)
    n_words = F.size(ws)
    n_punct = n_chars - F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    # greatest(n_chars, 1): empty text would 0/0 → NULL in Spark but
    # NaN in SQL engines (sorting first!) — both sides guard identically
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    sw = F.size(
        F.filter(
            _words(F.lower(t)),
            lambda w: w.isin(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    stop_ratio = sw / n_words
    return F.round(
        F.lit(0.4) * F.least(n_words / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_chars, n_words, avg_word_len, punct_ratio,
    stopword_ratio, quality): length/punctuation/stopword heuristics
    combined into a [0,1] score (weights pinned; see oracle)."""
    t = F.col(text_col)
    ws = _words(t)
    n_chars = F.length(t)
    n_words = F.size(ws)
    avg_wlen = (n_chars - (n_words - 1)) / n_words  # chars excl. separators
    n_punct = n_chars - F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))  # see quality_col
    sw = F.size(
        F.filter(
            _words(F.lower(t)),
            lambda w: w.isin(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    stop_ratio = sw / n_words
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("long").alias("n_words"),
        F.round(avg_wlen, 6).alias("avg_word_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        # the ONE pinned quality formula — oracle-critical weights live
        # only in quality_col
        quality_col(t).alias("quality"),
    )


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_ws_tokens, n_re_tokens, n_distinct_tokens):
    whitespace tokens plus a BPE-ish regex token count
    (``[a-z]+|[0-9]+`` over the lowercased text)."""
    t = F.col(text_col)
    ws_tokens = F.size(_words(t))
    re_tokens = F.size(F.regexp_extract_all(F.lower(t), F.lit(_TOKEN_RE), 0))
    distinct_tokens = F.size(F.array_distinct(_words(F.lower(t))))
    return docs.select(
        "doc_id",
        ws_tokens.cast("long").alias("n_ws_tokens"),
        re_tokens.cast("long").alias("n_re_tokens"),
        distinct_tokens.cast("long").alias("n_distinct_tokens"),
    )


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """End-to-end training-data cleaning pipeline — the composition the
    engine exists for: exact dedup (min-doc_id representative) →
    language ID → quality filter, in ONE declarative plan: one scan,
    one shuffle (the dedup window); lang/quality are column
    expressions over the deduped rows, no self-joins.

    → (doc_id, lang_pred, quality) of the surviving documents.
    """
    from eventhub_to_timescale_spark.operators.dedup import exact_dedup

    deduped = exact_dedup(docs, text_col)
    pred, _hits = language_id_col(F.col(text_col))
    out = deduped.select(
        "doc_id",
        pred.alias("lang_pred"),
        quality_col(F.col(text_col)).alias("quality"),
    ).filter(F.col("quality") >= min_quality)
    if keep_langs:
        out = out.filter(F.col("lang_pred").isin(*keep_langs))
    return out.orderBy("doc_id")


def fingerprint(docs: DataFrame, text_col: str = "text", ngram: int = 8) -> DataFrame:
    """→ (doc_id, fp_md5, fp_min_gram): two fingerprints —
    md5 of whitespace-normalized lowercase text (exact-dup key) and the
    minimum rolling char-n-gram hash (winnowing-style partial-overlap
    key: equal min-gram ⇒ likely shared substring)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(norm) - (ngram - 1), F.lit(1))),
        lambda i: F.substring(norm, i, ngram),
    )
    from eventhub_to_timescale_spark.functions.scalars import portable_hash32

    # explicit 1-arg lambda: transform would otherwise feed the array
    # INDEX into portable_hash32's optional seed parameter
    min_gram = F.array_min(F.transform(grams, lambda g: portable_hash32(g)))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp_md5"),
        min_gram.alias("fp_min_gram"),
    )


def vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
) -> DataFrame:
    """Corpus vocabulary statistics → (token, term_freq, doc_freq,
    idf): the global token table a training pipeline derives for
    tokenizer training, stop-list construction and tf-idf weighting.

    Shape, chosen for 100 TB: tokens explode from the same
    ``_TOKEN_RE`` lexer as ``token_stats``, then TWO hash
    aggregations — per (token, doc) partials first, token totals
    second. Both are map-side combinable; ``doc_freq`` falls out of
    the second groupBy as a plain ``count`` so no ``countDistinct``
    (which would force per-token distinct state) appears anywhere.
    ``idf = ln((N+1)/(df+1))``, rounded to 6 dp for cross-engine
    comparison; N is one driver-side scalar (bounded collect).
    ``top_k`` orders by (term_freq DESC, token) — a total order, so
    the cut is deterministic."""
    t = F.col(text_col)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(t), F.lit(_TOKEN_RE), 0)
        ).alias("token"),
    )
    per_doc = toks.groupBy("token", "doc_id").agg(
        F.count("*").alias("tf_doc")
    )
    n_docs = docs.count()
    out = per_doc.groupBy("token").agg(
        F.sum("tf_doc").alias("term_freq"),
        F.count("*").alias("doc_freq"),
    )
    out = out.withColumn(
        "idf",
        F.round(
            F.log((F.lit(float(n_docs)) + 1.0) / (F.col("doc_freq") + 1.0)),
            6,
        ),
    )
    out = out.orderBy(F.col("term_freq").desc(), "token")
    if top_k is not None:
        out = out.limit(top_k)
    return out


def filter_quality_percentile(
    docs: DataFrame,
    keep_frac: float = 0.5,
    by: str | None = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Keep the top ``keep_frac`` of documents by quality score within
    each ``by`` group (per-language curation cut) →
    (doc_id, lang, quality).

    Exact semantics: ``percent_rank`` over (group, quality DESC,
    doc_id) — the doc_id tie-break makes the cut deterministic, and
    ``percent_rank <= keep_frac`` keeps exactly the top fraction of
    the rank range. One shuffle on the group key. A group here is a
    LANGUAGE, so cardinality is tiny and rows-per-group huge — at
    100 TB use ``quality_threshold_by_group`` below: one aggregation
    pass computes per-group quantile thresholds that broadcast-join
    back, trading exact rank for a near-identical cut with no
    full-sort window."""
    w = Window.partitionBy(*( [by] if by else [] )).orderBy(
        F.col("quality").desc(), F.col("doc_id")
    )
    scored = docs.select(
        "doc_id",
        *( [F.col(by)] if by else [] ),
        quality_col(F.col(text_col)).alias("quality"),
    )
    return (
        scored.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .drop("_pr")
        .orderBy(*(([by] if by else []) + ["doc_id"]))
    )


def quality_threshold_by_group(
    docs: DataFrame,
    keep_frac: float = 0.5,
    by: str = "lang",
    text_col: str = "text",
    accuracy: int = 10000,
) -> DataFrame:
    """Scale path for the percentile cut: per-group approximate
    quantile thresholds (one map-side-combinable aggregation over a
    sketch) broadcast back onto the scan — no full-sort window, no
    single-task language partitions. → filtered (doc_id, lang,
    quality). Within-sketch-error identical to the exact cut; the
    exact variant stays the oracle surface."""
    from pyspark.sql.functions import broadcast

    scored = docs.select(
        "doc_id", F.col(by), quality_col(F.col(text_col)).alias("quality")
    )
    thresholds = scored.groupBy(by).agg(
        F.percentile_approx(
            "quality", F.lit(1.0 - keep_frac), F.lit(accuracy)
        ).alias("_thr")
    )
    return (
        scored.join(broadcast(thresholds), by)
        .filter(F.col("quality") >= F.col("_thr"))
        .select("doc_id", by, "quality")
    )

def quality_threshold_by_sample(
    docs: DataFrame,
    keep_frac: float = 0.5,
    by: str = "lang",
    text_col: str = "text",
    sample_fraction: float = 0.5,
    salt: str = "qthr-v1",
) -> DataFrame:
    """Deterministic scale path for the percentile cut: per-group
    thresholds from the exact quantile of a CONTENT-KEYED sample
    (operators/sampling.py md5 membership), broadcast back onto the
    full scan → filtered (doc_id, lang, quality).

    Unlike ``quality_threshold_by_group``'s Greenwald-Khanna sketch
    this is reproducible in any engine with an md5() — so it can sit
    under the DuckDB correctness gate — while keeping the same 100 TB
    shape: the rank window runs over the sample only (bounded by
    ``sample_fraction``, tune it so a group's sample fits one task),
    the corpus itself is touched by one scan + one broadcast join,
    never a full sort. Quality is rounded to 6dp BEFORE ranking so
    cross-engine ties resolve identically; groups with no sampled
    row are dropped (their threshold is unknown — at real scale that
    means the sample is too thin, not that the group is empty).
    """
    from eventhub_to_timescale_spark.operators.sampling import (
        _bucket_hex,
        _threshold_hex,
    )

    scored = docs.select(
        "doc_id",
        F.col(by),
        F.round(quality_col(F.col(text_col)), 6).alias("quality"),
    )
    sample = scored.filter(
        _bucket_hex(F.col("doc_id"), salt)
        < F.lit(_threshold_hex(sample_fraction))
    )
    w = Window.partitionBy(by).orderBy(F.col("quality").desc(), "doc_id")
    thresholds = (
        sample.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .groupBy(by)
        .agg(F.min("quality").alias("_thr"))
    )
    return (
        scored.join(F.broadcast(thresholds), by)
        .filter(F.col("quality") >= F.col("_thr"))
        .select("doc_id", by, "quality")
        .orderBy(by, "doc_id")
    )


def unigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    vocab_top_k: int = 1000,
) -> DataFrame:
    """CCNet-style language-model fluency scoring with a corpus-derived
    unigram model → (doc_id, n_tokens, avg_neg_logprob).  Low score =
    tokens the corpus considers common = fluent under the model; the
    curation cut drops the high-score tail (gibberish, boilerplate
    alphabets, wrong-language fragments).

    Model: p(tok) = corpus_count(tok) / total_tokens for the top-K
    vocabulary (deterministic (count DESC, token) cut, same rule as
    ``vocabulary``); out-of-vocabulary tokens get the floor
    1 / total_tokens.  Score = −mean ln p over the document's tokens;
    empty documents yield no row.

    100 TB shape: token counts are one map-side-combinable
    aggregation; the vocabulary is bounded by K so the model join is a
    **broadcast** (the corpus side never shuffles for it); the
    per-document mean is a second map-side-combinable aggregation.
    ``total_tokens`` is one driver-side scalar.  A production run over
    one corpus would ``persist()`` the token counts between the two
    passes here (total + vocab) — at bench scale the double scan is
    cheaper than the cache write.
    """
    t = F.col(text_col)
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(t), F.lit(_TOKEN_RE), 0)
        ).alias("token"),
    )
    counts = toks.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    if not total:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_tokens long, avg_neg_logprob double"
        )
    vocab = counts.orderBy(F.col("cnt").desc(), "token").limit(vocab_top_k)
    lp = F.log(
        F.coalesce(F.col("cnt"), F.lit(1)).cast("double")
        / F.lit(float(total))
    )
    return (
        toks.join(F.broadcast(vocab), "token", "left")
        .withColumn("_lp", lp)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(-F.avg("_lp"), 6).alias("avg_neg_logprob"),
        )
    )


def unigram_lm_oracle_sql(
    vocab_top_k: int = 1000, table: str = "documents"
) -> str:
    """DuckDB rendering of ``unigram_lm_score`` — same tokenizer, same
    top-K cut, same OOV floor."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}', 0)) AS token
  FROM {table}
), counts AS (
  SELECT token, COUNT(*) AS cnt FROM toks GROUP BY 1
), total AS (
  SELECT SUM(cnt) AS t FROM counts
), vocab AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {vocab_top_k}
)
SELECT toks.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       ROUND(-AVG(LN(CAST(COALESCE(vocab.cnt, 1) AS DOUBLE)
                     / (SELECT t FROM total))), 6) AS avg_neg_logprob
FROM toks LEFT JOIN vocab ON toks.token = vocab.token
GROUP BY toks.doc_id
"""


def _bigram_arrays(docs: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — adjacent token pairs per document under the
    shared tokenizer; documents with <2 tokens contribute nothing."""
    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    pairs = F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.struct(
                F.element_at(arr, i).alias("w1"),
                F.element_at(arr, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return docs.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))


def bigram_topk(
    docs: DataFrame, k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Corpus-wide adjacent-token-pair counts, top ``k`` — the raw
    statistic a BPE/WordPiece trainer consumes each merge round and
    the collocation surface of the corpus.

    → (bigram, cnt), top-k by (cnt DESC, bigram), ordered the same.

    100 TB posture: pair construction is a pure array expression on
    the document scan (no self-join on token position); the count is
    one map-side-combinable aggregation on the (w1, w2) key, and the
    global top-k plans as TakeOrderedAndProject — each partition
    surrenders only its local top-k, never a full sort.
    """
    return (
        _bigram_arrays(docs, text_col)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"), "cnt"
        )
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(k)
    )


def bigram_topk_oracle_sql(k: int = 50, table: str = "documents") -> str:
    """DuckDB rendering of ``bigram_topk`` — lead() over token
    position replaces the array pairing, same tokenizer."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(generate_series(1, len(ts))) AS pos,
         UNNEST(ts) AS token
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOKEN_RE}', 0) AS ts
        FROM {table})
), bi AS (
  SELECT token AS w1,
         lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
)
SELECT w1 || ' ' || w2 AS bigram, COUNT(*) AS cnt
FROM bi WHERE w2 IS NOT NULL
GROUP BY 1 ORDER BY cnt DESC, bigram LIMIT {k}
"""


def bigram_lm_score(
    docs: DataFrame,
    text_col: str = "text",
    bigram_top_k: int = 2000,
    stage: bool = True,
) -> DataFrame:
    """Bigram-LM fluency scoring — the second-order refinement of
    ``unigram_lm_score``: each adjacent pair (w1, w2) scores
    ln p(w2 | w1) = ln(bigram_cnt / unigram_cnt(w1)) when the pair is
    in the top-K bigram vocabulary (deterministic (cnt DESC, pair)
    cut), else the floor ln(1 / total_tokens).

    → (doc_id, n_bigrams, avg_neg_logprob); documents with <2 tokens
    yield no row.

    Cross-engine exactness: every probability is a ratio of two
    exact corpus integers — one IEEE division + ln both engines
    compute identically; the per-doc mean rounds to 6 dp.

    100 TB posture: the conditional model is materialized ONCE as a
    bounded K-row (bigram → logprob) table — the vocab (bounded)
    joins the unigram counts on the prefix with the vocab as the
    broadcast side, so the unbounded count table never shuffles —
    and the corpus then probes it broadcast.  Two map-side-combinable
    count passes + one bounded broadcast join; the only driver scalar
    is total_tokens (same as the unigram model).

    ``stage`` (default on, r16): the tokenized corpus
    ``(doc_id, tokens[])`` is materialized once as a stage boundary.
    Without it the regexp tokenizer ran over the corpus FOUR times per
    action — the unigram count, the ``total`` scalar at construction,
    the bigram count, and the probe side (guide §2.4: the same
    staged-frame fix as tfidf/edit-distance).  ``stage=False`` keeps
    the fully-lazy recomputable form for oracle comparison.
    """
    from eventhub_to_timescale_spark.operators.boundary import (
        stage_boundary as _boundary,
    )

    base = docs.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
        ).alias("_toks"),
    )
    if stage:
        base = _boundary(base)
    toks = base.select(F.explode("_toks").alias("token"))
    uni = toks.groupBy("token").agg(F.count(F.lit(1)).alias("ucnt"))
    total = uni.agg(F.sum("ucnt")).collect()[0][0]
    if not total:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, n_bigrams long, avg_neg_logprob double"
        )
    tv = F.col("_toks")
    pairs = F.when(
        F.size(tv) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tv) - 1),
            lambda i: F.struct(
                F.element_at(tv, i).alias("w1"),
                F.element_at(tv, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = base.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bcnt = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("bcnt"))
    vocab = bcnt.orderBy(
        F.col("bcnt").desc(), "w1", "w2"
    ).limit(bigram_top_k)
    model = F.broadcast(vocab).join(
        uni, vocab["w1"] == uni["token"]
    ).select(
        "w1",
        "w2",
        F.log(F.col("bcnt").cast("double") / F.col("ucnt").cast("double")).alias(
            "lp"
        ),
    )
    floor_lp = F.log(F.lit(1.0) / F.lit(float(total)))
    return (
        bi.join(F.broadcast(model), ["w1", "w2"], "left")
        .withColumn("_lp", F.coalesce(F.col("lp"), floor_lp))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(-F.avg("_lp"), 6).alias("avg_neg_logprob"),
        )
    )


def bigram_lm_oracle_sql(
    bigram_top_k: int = 2000, table: str = "documents"
) -> str:
    """DuckDB rendering of ``bigram_lm_score`` — same tokenizer, same
    deterministic vocab cut, same OOV floor."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         UNNEST(generate_series(1, len(ts))) AS pos,
         UNNEST(ts) AS token
  FROM (SELECT doc_id,
               regexp_extract_all(lower(text), '{_TOKEN_RE}', 0) AS ts
        FROM {table})
), uni AS (
  SELECT token, COUNT(*) AS ucnt FROM toks GROUP BY 1
), total AS (
  SELECT SUM(ucnt) AS t FROM uni
), bi AS (
  SELECT doc_id, w1, w2 FROM (
    SELECT doc_id, token AS w1,
           lead(token) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
    FROM toks
  ) WHERE w2 IS NOT NULL
), bcnt AS (
  SELECT w1, w2, COUNT(*) AS bcnt FROM bi GROUP BY 1, 2
), vocab AS (
  SELECT w1, w2, bcnt FROM bcnt ORDER BY bcnt DESC, w1, w2
  LIMIT {bigram_top_k}
), model AS (
  SELECT v.w1, v.w2,
         LN(CAST(v.bcnt AS DOUBLE) / CAST(u.ucnt AS DOUBLE)) AS lp
  FROM vocab v JOIN uni u ON v.w1 = u.token
)
SELECT bi.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(-AVG(COALESCE(model.lp,
                           LN(1.0 / (SELECT t FROM total)))), 6)
         AS avg_neg_logprob
FROM bi LEFT JOIN model ON bi.w1 = model.w1 AND bi.w2 = model.w2
GROUP BY bi.doc_id
"""


# pinned classifier parameters — trained offline, inlined as literals
# (the deployment shape for a fastText-style quality model: weights
# travel with the job, inference is pure expression math)
QUALITY_LOGIT_WEIGHTS = (2.1, 1.4, 1.8, 0.7)
QUALITY_LOGIT_BIAS = -2.5


def quality_logit_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-classifier INFERENCE fused into the scan: a logistic
    model over the pinned heuristic features → (doc_id, logit,
    quality_prob).  This is the deployment shape of a trained
    fastText/linear quality filter (weights are literals in the plan;
    swapping a retrained model is a constant change, not a new
    operator).

    Features: x₁ = min(n_words/50, 1), x₂ = min(5·stop_ratio, 1),
    x₃ = 1 − min(10·punct_ratio, 1), x₄ = min(avg_word_len/10, 1).

    Cross-engine exactness (learned the hard way: a float dot product
    of decimal weights × rational features lands on exact 6-dp
    rounding ties, where Spark's BigDecimal HALF_UP and DuckDB's
    libm round disagree — one doc in 500 at sf0.001): every feature
    is quantized to INTEGER micro-units with a half-up integer
    rounding — ``floor((2·a·10⁶ + den) / (2·den))`` — where the
    floor-of-double-division is exact for operands < 2⁵³; the logit
    accumulates as an exact BIGINT in deci-micro units (weights ×10
    are integers) and divides ONCE by 10⁷.  No rounding step exists
    on the logit at all, so there is no tie to disagree on.  The
    sigmoid is the only transcendental (same exposure as the LM
    scores' ln, rounded to 6 dp).

    100 TB posture: zero joins, zero shuffles, zero UDFs — the whole
    classifier is whole-stage-codegen'd scalar math on the document
    scan, exactly as fast as reading the column.  Downstream cuts
    (``filter_quality_percentile`` etc.) compose unchanged.
    """
    t = F.col(text_col)
    ws = _words(t)
    n_chars = F.length(t).cast("long")
    n_words = F.size(ws).cast("long")
    n_punct = (
        F.length(t) - F.length(F.regexp_replace(t, _PUNCT_RE, ""))
    ).cast("long")
    sw = F.size(
        F.filter(
            _words(F.lower(t)),
            lambda w: w.isin(*[F.lit(s) for s in STOPWORDS]),
        )
    ).cast("long")
    # integer feature numerators over their denominators
    a1, d1 = F.least(n_words, F.lit(50)), F.lit(50)
    a2, d2 = F.least(5 * sw, n_words), n_words
    a3, d3 = n_chars - F.least(10 * n_punct, n_chars), F.greatest(
        n_chars, F.lit(1)
    )
    a4, d4 = (
        F.least(n_chars - n_words + 1, 10 * n_words),
        10 * n_words,
    )

    def q(a, den):  # half-up micro-unit quantizer, exact under 2^53
        return F.floor((2 * a * F.lit(1_000_000) + den) / (2 * den)).cast(
            "long"
        )

    w1, w2, w3, w4 = (int(w * 10) for w in QUALITY_LOGIT_WEIGHTS)
    s = (
        F.lit(w1) * q(a1, d1)
        + F.lit(w2) * q(a2, d2)
        + F.lit(w3) * q(a3, d3)
        + F.lit(w4) * q(a4, d4)
        + F.lit(int(QUALITY_LOGIT_BIAS * 10) * 1_000_000)
    )
    logit = s / F.lit(10_000_000.0)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    return docs.select(
        "doc_id",
        logit.alias("logit"),
        F.round(prob, 6).alias("quality_prob"),
    )


def quality_logit_oracle_sql(table: str = "documents") -> str:
    """DuckDB rendering of ``quality_logit_score`` — same integer
    feature quantization, same exact BIGINT accumulation, same single
    division and sigmoid."""
    w1, w2, w3, w4 = (int(w * 10) for w in QUALITY_LOGIT_WEIGHTS)
    b = int(QUALITY_LOGIT_BIAS * 10) * 1_000_000
    stopword_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH f AS (
  SELECT doc_id,
         CAST(length(text) AS BIGINT) AS nc,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
         CAST(length(text) - length(regexp_replace(text, '{_PUNCT_RE}', '', 'g'))
              AS BIGINT) AS np,
         CAST(len(list_filter(string_split(lower(text), ' '),
                              w -> w IN ({stopword_list}))) AS BIGINT) AS sw
  FROM {table}
), qx AS (
  SELECT doc_id,
    CAST(floor((2 * least(nw, 50) * 1000000 + 50)
               / CAST(2 * 50 AS DOUBLE)) AS BIGINT) AS q1,
    CAST(floor((2 * least(5 * sw, nw) * 1000000 + nw)
               / CAST(2 * nw AS DOUBLE)) AS BIGINT) AS q2,
    CAST(floor((2 * (nc - least(10 * np, nc)) * 1000000 + greatest(nc, 1))
               / CAST(2 * greatest(nc, 1) AS DOUBLE)) AS BIGINT) AS q3,
    CAST(floor((2 * least(nc - nw + 1, 10 * nw) * 1000000 + 10 * nw)
               / CAST(2 * 10 * nw AS DOUBLE)) AS BIGINT) AS q4
  FROM f
)
SELECT doc_id,
       ({w1} * q1 + {w2} * q2 + {w3} * q3 + {w4} * q4 + ({b}))
         / 10000000.0 AS logit,
       ROUND(1.0 / (1.0 + exp(-(({w1} * q1 + {w2} * q2 + {w3} * q3
                                 + {w4} * q4 + ({b})) / 10000000.0))), 6)
         AS quality_prob
FROM qx
"""


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...],
    k: int = 20,
    text_col: str = "text",
    stage: bool = True,
) -> DataFrame:
    """BM25 document retrieval: the top-``k`` documents for a bag of
    query ``terms`` under Okapi BM25 (k1=1.2, b=0.75) with Lucene's
    non-negative idf ``ln(1 + (N − df + ½)/(df + ½))`` →
    (doc_id, bm25), best first.  The ranking a curation pipeline uses
    to pull topic-relevant training slices out of a raw corpus.

    Cross-engine exactness: floats never accumulate.  idf is rounded
    ONCE to integer micro-units (same 6-dp ln rule as the LM scores);
    with k1 = 6/5 and b = 3/4 the per-term saturation
    tf·(k1+1)/(tf + k1(1−b) + k1·b·dl·N/L) is the exact integer ratio
    44·tf·L / (20·tf·L + 6·L + 18·dl·N), so each term's contribution
    is the half-up integer division (2·idf·44·tf·L + den) div (2·den)
    and the document score is an exact BIGINT sum of them — no
    rounding tie can flip a rank between engines, and the final
    (score DESC, doc_id) order is total.  Headroom: 2·idf·44·tf·L ≤
    2·14e6·44·tf·L — inside int64 through sf10-scale corpora.

    100 TB posture: one corpus scan computes (dl, tf per term) into a
    staged narrow frame (``stage=True`` default; both the stats
    aggregate and the scoring probe read it, so the tokenize pass
    runs once, not twice); one map-side-combinable aggregation
    produces the global (N, L, df) row, which re-enters as a
    BROADCAST cross-join (one row — the corpus never shuffles);
    scoring is whole-stage-codegen'd integer math and the top-k is
    TakeOrderedAndProject (per-partition heap, driver merges k rows,
    no global sort).  ``stage=False`` is the fully-lazy
    oracle-comparison form.
    """
    t = F.col(text_col)
    ws = _words(t)

    # NB: the predicate is built by a factory, NOT a loop lambda with
    # a `_t=term` default — a two-parameter lambda is bound by pyspark
    # higher-order functions as (element, index), silently turning the
    # captured term into the array index (the exact bug class the r7
    # sf1 sweep caught in the MinHash seeds).
    def term_count(term: str) -> Column:
        return F.size(F.filter(ws, lambda w: w == F.lit(term))).cast("long")

    sel = [F.col("doc_id"), F.size(ws).cast("long").alias("dl")]
    for i, term in enumerate(terms):
        sel.append(term_count(term).alias(f"tf{i}"))
    per_doc = docs.select(*sel)
    if stage:
        # (doc_id, dl, tf0..tfN) feeds TWO consumers — the global
        # (N, L, df) stats aggregate and the scoring probe — so the
        # lazy form tokenizes the corpus twice per action (guide
        # §2.4).  The staged frame is the narrow per-doc term-stats
        # table an inverted-index build would persist anyway;
        # ``stage=False`` keeps the fully-lazy recomputable form.
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        per_doc = stage_boundary(per_doc)

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("dl").alias("l_total"),
    ]
    for i in range(len(terms)):
        aggs.append(
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
        )
    stats = per_doc.agg(*aggs)
    for i in range(len(terms)):
        idf = F.log(
            F.lit(1.0)
            + (F.col("n_docs").cast("double") - F.col(f"df{i}") + 0.5)
            / (F.col(f"df{i}") + 0.5)
        )
        stats = stats.withColumn(
            f"idf{i}",
            F.round(idf * 1_000_000).cast("long"),
        )

    contribs = []
    for i in range(len(terms)):
        den = f"(20 * tf{i} * l_total + 6 * l_total + 18 * dl * n_docs)"
        contribs.append(
            f"CASE WHEN tf{i} > 0 THEN "
            f"(2 * idf{i} * 44 * tf{i} * l_total + {den}) div (2 * {den}) "
            f"ELSE 0 END"
        )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .withColumn("score_micro", F.expr(" + ".join(contribs)))
        .filter(F.col("score_micro") > 0)
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            (F.col("score_micro") / F.lit(1_000_000.0)).alias("bm25"),
        )
    )


def bm25_oracle_sql(
    terms: tuple[str, ...], k: int = 20, table: str = "documents"
) -> str:
    """DuckDB rendering of ``bm25_topk`` — same single-rounded idf,
    same exact integer saturation ratio and half-up division."""
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '), "
        f"x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n         ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(terms))
    )
    idf_cols = ",\n         ".join(
        f"CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - df{i} + 0.5)"
        f" / (df{i} + 0.5)) * 1000000) AS BIGINT) AS idf{i}"
        for i in range(len(terms))
    )
    contribs = "\n          + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"(2 * idf{i} * 44 * tf{i} * l_total "
        f"+ (20 * tf{i} * l_total + 6 * l_total + 18 * dl * n_docs)) "
        f"// (2 * (20 * tf{i} * l_total + 6 * l_total + 18 * dl * n_docs)) "
        f"ELSE 0 END)"
        for i in range(len(terms))
    )
    return f"""
WITH w AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {tf_cols}
  FROM {table}
), s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS BIGINT) AS l_total,
         {df_cols}
  FROM w
), i AS (
  SELECT s.*,
         {idf_cols}
  FROM s
), scored AS (
  SELECT w.doc_id,
         ({contribs}) AS score_micro
  FROM w CROSS JOIN i
)
SELECT doc_id, CAST(score_micro AS DOUBLE) / 1000000.0 AS bm25
FROM scored
WHERE score_micro > 0
ORDER BY score_micro DESC, doc_id
LIMIT {k}
"""


def word_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_words, word_entropy): Shannon entropy (bits) of
    each document's word distribution — the gibberish/boilerplate
    detector that complements Gopher's max-frequency rule: low entropy
    = a few tokens dominate (looping text, keyword stuffing); entropy
    near log2(n) = every token unique.

    Computed as ``log2(n) − (Σ_w c_w·log2(c_w))/n`` — one pass over
    the distinct-token array, O(distinct·n) per document, entirely
    scan-side array expressions (no shuffle, no UDF). Rounded to 6 dp;
    both engines evaluate log2 on small-integer counts where libm
    implementations agree far beyond the rounding tolerance.

    The Σ folds over the SORTED distinct-token array (both engines):
    float addition is not associative, and Spark's ``array_distinct``
    keeps first-occurrence order while DuckDB's ``list_distinct``
    guarantees no order at all — sorting makes the accumulation order
    canonical so a knife-edge value cannot round differently at 6 dp
    across engines.
    """
    ws = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
    n = F.size(ws).cast("long")
    cnt = lambda w: F.size(F.filter(ws, lambda x: x == w)).cast(  # noqa: E731
        "double"
    )
    s = F.aggregate(
        F.transform(
            F.array_sort(F.array_distinct(ws)),
            lambda w: cnt(w) * F.log2(cnt(w)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    ent = F.when(n > 0, F.round(F.log2(n) - s / n, 6) + F.lit(0.0)).otherwise(
        F.lit(0.0)
    )
    return docs.select(
        "doc_id", n.alias("n_words"), ent.alias("word_entropy")
    )


def word_entropy_oracle_sql(table: str = "documents") -> str:
    """DuckDB rendering of ``word_entropy`` (same lexer, same
    log2(n) − Σc·log2(c)/n form, same 6-dp/−0.0 normalization, same
    SORTED-distinct accumulation order — see the operator docstring)."""
    return f"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z]+|[0-9]+', 0) AS ws
  FROM {table}
), m AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n,
         COALESCE(list_sum(list_transform(list_sort(list_distinct(ws)),
           w -> CAST(len(list_filter(ws, x -> x = w)) AS DOUBLE)
                * log2(CAST(len(list_filter(ws, x -> x = w)) AS DOUBLE)))),
           0.0) AS s
  FROM w
)
SELECT doc_id, n AS n_words,
       CASE WHEN n > 0 THEN round(log2(CAST(n AS DOUBLE)) - s / n, 6) + 0.0
            ELSE 0.0 END AS word_entropy
FROM m
"""


def tfidf_top_terms(
    docs: DataFrame, k: int = 3, text_col: str = "text", stage: bool = True
) -> DataFrame:
    """→ (doc_id, term, tf, rank, tfidf): each document's top-``k``
    terms by smoothed TF-IDF — the per-document keyword extractor a
    curation pipeline uses for topic labeling, cluster naming, and
    slice selection (complementing bm25_topk, which ranks DOCUMENTS
    for a fixed query; this ranks TERMS within every document).

    tfidf = tf · ln((N+1)/(df+1)) with add-one smoothing on both
    counts, so a corpus-universal term scores exactly 0 and nothing
    is undefined.  Rank ties break on term ASC, making the top-k
    total-ordered.

    Cross-engine exactness: idf is rounded ONCE to integer micro-units
    (the repo's 6-dp ln rule, same as BM25/LM scores); each term's
    score is then the exact BIGINT product tf·idf_micro, so ranking
    and the reported ``tfidf`` double (micro/1e6) cannot diverge
    between engines.

    100 TB posture: one corpus scan explodes tokens into a
    map-side-combinable (doc_id, term) count; document frequency
    aggregates from that vocabulary-sized frame on the SAME term key
    (co-partitioned, no extra corpus shuffle) and joins back on term;
    the per-document top-k is one window over doc_id.  All shuffles
    are on post-aggregation vocabulary/document-key frames — the raw
    corpus is read once.
    """
    from pyspark.sql import Window

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # r15 (guide §2.4): tf feeds TWO consumers — the df aggregate and
    # the score join — whose column prunings differ (term-only vs the
    # full row), so ReuseExchange cannot share the subplan and the
    # corpus tokenize+explode ran twice (profiled: 2 concurrent
    # ~900 ms 32-task jobs per count at sf0.1).  An eager
    # localCheckpoint stages the (doc_id, term, tf) frame once; both
    # consumers read the leaf.  At deployment scale this is the
    # staged term-frequency table every IR system materializes anyway
    # — the idf aggregate stays vocabulary-sized and re-enters as a
    # broadcast, the corpus is read once.
    # ``stage=False`` keeps the fully-lazy recomputable chain (no job
    # at construction; the oracle-comparison form — r15 ADVICE, same
    # escape hatch as the pipelines' ``persist_stages``).  Mechanism
    # session-selectable (operators/boundary.py).
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        tf = stage_boundary(tf)
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.round(
                F.log(
                    (F.col("n_docs") + 1).cast("double")
                    / (F.col("df") + 1).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("idf_micro"),
        )
    )
    ranked = (
        tf.join(idf, "term")
        .withColumn("score_micro", F.col("tf") * F.col("idf_micro"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("score_micro").desc(), F.col("term").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        "doc_id",
        "term",
        "tf",
        "rank",
        (F.col("score_micro") / F.lit(1_000_000.0)).alias("tfidf"),
    ).orderBy("doc_id", "rank")


def tfidf_oracle_sql(k: int = 3, table: str = "documents") -> str:
    """DuckDB rendering of ``tfidf_top_terms`` — same tokenizer, same
    single-rounded micro-unit idf, same exact integer score and
    (score DESC, term ASC) tie rule."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{_TOKEN_RE}', 0)) AS term
  FROM {table}
), tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY 1, 2
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM {table}
), idf AS (
  SELECT term,
         CAST(round(ln((n_docs + 1.0) / (COUNT(*) + 1.0)) * 1000000)
              AS BIGINT) AS idf_micro
  FROM tf CROSS JOIN n
  GROUP BY term, n_docs
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         tf.tf * idf.idf_micro AS score_micro,
         CAST(row_number() OVER (
             PARTITION BY tf.doc_id
             ORDER BY tf.tf * idf.idf_micro DESC, tf.term ASC
         ) AS INT) AS rank
  FROM tf JOIN idf USING (term)
)
SELECT doc_id, term, tf, rank,
       CAST(score_micro AS DOUBLE) / 1000000.0 AS tfidf
FROM ranked WHERE rank <= {k}
ORDER BY doc_id, rank
"""
