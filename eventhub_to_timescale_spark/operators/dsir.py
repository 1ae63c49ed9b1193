"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169) over hashed n-gram features.

Selects raw-corpus documents that look like a *target* distribution
(here: a column predicate, e.g. ``lang = 'en'``) by scoring each
document under two bag-of-hashed-bigrams unigram models and ranking by
the importance log-weight

    log w(x) = Σ_g [ ln p_target(bucket(g)) − ln p_raw(bucket(g)) ]

summed over the document's bigram occurrences, with Laplace-smoothed
bucket probabilities ``(cnt + 1) / (total + B)``.

Cross-engine exactness: each bucket's log-ratio is computed ONCE and
rounded to integer micro-units (the repo's 6-dp ln rule); a document's
score is then an exact BIGINT sum of per-occurrence bucket constants,
so no float accumulation can diverge between Spark and the DuckDB
oracle, and the (score DESC, doc_id) order is total.

100 TB posture — the corpus NEVER shuffles:

- pass 1: one scan explodes bigrams and aggregates per-bucket
  (raw_cnt, target_cnt) in a single conditional groupBy — map-side
  combinable down to ≤ B rows (B = ``buckets``, default 256; the
  bucket table stays tiny at any corpus size because it is keyed by
  the hash bucket, not the n-gram).
- the ≤ B-row weight table collapses to ONE row carrying a
  ``map<bucket → micro-log-ratio>`` via ``map_from_entries``; totals
  join onto it as a broadcast of a single row.
- pass 2: a second corpus scan rebuilds each document's bigram array
  (array expression, no explode), broadcast-crossJoins the one-row
  map, and folds ``aggregate(bigrams, 0L, acc + wmap[bucket(g)])`` —
  whole-stage-codegen'd, zero exchange.
- the top-``n`` plans as TakeOrderedAndProject (per-partition heap,
  driver merges n rows).

Bigrams share the corpus tokenizer (``text._TOKEN_RE``) and the
bucket hash is the oracle-portable ``portable_hash32`` (md5-derived)
used by every dedup operator, so DuckDB reproduces buckets exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import portable_hash32
from eventhub_to_timescale_spark.operators.text import _TOKEN_RE

_SEED = "dsir"


def _bigram_strings(text_col: str) -> Column:
    """array<string> of space-joined adjacent token pairs."""
    arr = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    return F.when(
        F.size(arr) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(arr, i), F.element_at(arr, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _bucket(g: Column, buckets: int) -> Column:
    return portable_hash32(g, _SEED) % F.lit(buckets)


def dsir_topn(
    docs: DataFrame,
    target: Column,
    n: int = 100,
    buckets: int = 256,
    text_col: str = "text",
    stage: bool = True,
) -> DataFrame:
    """→ (doc_id, dsir_logw): the ``n`` raw-corpus documents most
    target-like under the hashed-bigram importance weight, best first
    (ties by doc_id). ``target`` is a boolean Column marking the rows
    that define the target distribution (e.g. ``F.col("lang") ==
    "en"``); documents with fewer than two tokens score 0.

    ``stage`` (default on) materializes the trained one-row weight map
    as an eager ``localCheckpoint`` — the stored-model artifact of the
    two-phase train/apply design.  ``stage=False`` keeps the fully
    lazy, recomputable chain (no job at construction time; every
    action re-runs the train pass) — the oracle-comparison form, same
    escape hatch as the pipelines' ``persist_stages`` (r15 ADVICE).
    """
    bg = docs.select(
        F.col("doc_id"),
        target.alias("_is_target"),
        F.explode(_bigram_strings(text_col)).alias("g"),
    )
    per_bucket = (
        bg.groupBy(_bucket(F.col("g"), buckets).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("r_cnt"),
            F.sum(F.col("_is_target").cast("long")).alias("t_cnt"),
        )
    )
    # r15 (guide §2.4): ``per_bucket`` used to feed TWO consumers —
    # a totals aggregate and the map build — so the corpus bigram
    # explode + aggregate subplan ran twice.  Collect the ≤ buckets
    # rows into ONE array row first; totals and the per-bucket
    # log-ratios are then pure array arithmetic on that row (same
    # double divisions, same single micro-unit rounding — bit-exact),
    # and the corpus is exploded exactly once.
    entries = per_bucket.agg(
        F.collect_list(F.struct("bucket", "r_cnt", "t_cnt")).alias("es")
    ).select(
        "es",
        F.aggregate(
            "es", F.lit(0).cast("long"), lambda a, e: a + e["r_cnt"]
        ).alias("r_tot"),
        # coalesce inside the fold (r15 ADVICE): SUM() skips NULLs but
        # F.aggregate propagates them — a bucket whose every row has a
        # NULL target predicate must poison only ITS OWN weight (the
        # pre-r15 totals behaviour), not every bucket's t_tot.  r_cnt
        # is COUNT(*) and can never be NULL.
        F.aggregate(
            "es",
            F.lit(0).cast("long"),
            lambda a, e: a + F.coalesce(e["t_cnt"], F.lit(0).cast("long")),
        ).alias("t_tot"),
    )

    def _lw(e: Column) -> Column:
        return F.round(
            (
                F.log(
                    (e["t_cnt"] + 1).cast("double")
                    / (F.col("t_tot") + buckets).cast("double")
                )
                - F.log(
                    (e["r_cnt"] + 1).cast("double")
                    / (F.col("r_tot") + buckets).cast("double")
                )
            )
            * 1_000_000
        ).cast("long")

    wmap = (
        entries
        .select(
            F.map_from_entries(
                F.transform(
                    "es",
                    lambda e: F.struct(
                        e["bucket"].alias("bucket"),
                        _lw(e).alias("lw_micro"),
                    ),
                )
            ).alias("wmap")
        )
    )
    # Stage the trained weight map (ONE row) behind an eager
    # localCheckpoint: it is the model-parameters frame of the
    # two-phase DSIR design — without the boundary every action
    # re-ran the whole train pass (corpus explode + aggregate,
    # ~0.5 s/count at sf0.1) before scoring.  One tiny row, exactly
    # the stored-artifact a production importance-resampling run
    # would persist between train and apply.  Mechanism session-
    # selectable (operators/boundary.py).
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        wmap = stage_boundary(wmap)
    bgs = _bigram_strings(text_col)
    score = F.aggregate(
        F.col("_bgs"),
        F.lit(0).cast("long"),
        lambda acc, g: acc
        + F.element_at(F.col("wmap"), _bucket(g, buckets)),
    )
    return (
        docs.select("doc_id", bgs.alias("_bgs"))
        .crossJoin(F.broadcast(wmap))
        .select("doc_id", score.alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(n)
        .select(
            "doc_id",
            (F.col("score_micro") / F.lit(1_000_000.0)).alias("dsir_logw"),
        )
    )


def dsir_oracle_sql(
    target_sql: str,
    n: int = 100,
    buckets: int = 256,
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``dsir_topn``: same tokenizer, same
    md5-derived bucket hash, same once-rounded micro log-ratios, same
    exact integer document sum. ``target_sql`` is the predicate text
    (e.g. ``"lang = 'en'"``)."""
    return f"""
WITH toks AS (
  SELECT doc_id, ({target_sql}) AS is_target,
         regexp_extract_all(lower(text), '{_TOKEN_RE}', 0) AS ts
  FROM {table}
), bg AS (
  SELECT doc_id, is_target,
         ts[i] || ' ' || ts[i + 1] AS g
  FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
  WHERE len(ts) >= 2
), bucketed AS (
  SELECT doc_id, is_target,
         CAST(('0x' || substr(md5('{_SEED}' || g), 1, 8)) AS BIGINT)
           % {buckets} AS bucket
  FROM bg
), per_bucket AS (
  SELECT bucket,
         CAST(COUNT(*) AS BIGINT) AS r_cnt,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT)
           AS t_cnt
  FROM bucketed GROUP BY 1
), tot AS (
  SELECT SUM(r_cnt) AS r_tot, SUM(t_cnt) AS t_tot FROM per_bucket
), w AS (
  SELECT bucket,
         CAST(round((ln((t_cnt + 1) / CAST(t_tot + {buckets} AS DOUBLE))
                   - ln((r_cnt + 1) / CAST(r_tot + {buckets} AS DOUBLE)))
                   * 1000000) AS BIGINT) AS lw_micro
  FROM per_bucket CROSS JOIN tot
), per_doc AS (
  SELECT b.doc_id, SUM(w.lw_micro) AS score_micro
  FROM bucketed b JOIN w USING (bucket)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(p.score_micro, 0) AS DOUBLE) / 1000000.0
         AS dsir_logw
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
ORDER BY COALESCE(p.score_micro, 0) DESC, d.doc_id
LIMIT {n}
"""
