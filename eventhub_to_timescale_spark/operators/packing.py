"""Sequence packing: assign documents to fixed token-budget bins.

Training pipelines pack documents into fixed-length example windows
(budget ≈ context length) before tokenization. Optimal bin packing is
NP-hard and inherently sequential; the scalable, deterministic policy
here is first-fit in key order within hash groups:

- each document goes to group ``doc_id % n_groups`` — groups are the
  parallelism unit (one window partition each), so the cluster packs
  ``n_groups`` streams independently; no global sort, no single-task
  cumsum over the corpus.
- within a group, documents are laid out in ``doc_id`` order and a
  running token sum assigns ``bin = floor(cum_before / budget)``.
  A document that straddles a boundary belongs to the bin its FIRST
  token falls in (bins can overshoot by < one document — the policy
  every streaming packer with a carry-over buffer implements).

Token counts use the same ``_TOKEN_RE`` lexer as the text operators,
so "budget" means the same unit everywhere in the engine.

Determinism: (doc_id % n_groups, doc_id) is a total order → the
packing is byte-stable across reruns and cluster layouts, and the
DuckDB oracle replays it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.text import _TOKEN_RE


def pack_documents(
    docs: DataFrame,
    token_budget: int = 2048,
    n_groups: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pack_group, bin_id, n_tokens, bin_start_offset).

    One shuffle (hash on ``pack_group``), one window per group. At
    100 TB raise ``n_groups`` to ~10× cores so each group's window
    sorts a bounded slice; the packing inside a group is sequential
    by construction (that is what packing MEANS), the groups are the
    scale-out axis."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    n_tokens = F.size(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
    ).cast("long")
    df = docs.select(
        "doc_id",
        (F.col("doc_id") % n_groups).alias("pack_group"),
        n_tokens.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_incl = F.sum("n_tokens").over(w)
    cum_before = cum_incl - F.col("n_tokens")
    return df.select(
        "doc_id",
        "pack_group",
        F.floor(cum_before / token_budget).cast("long").alias("bin_id"),
        "n_tokens",
        (cum_before % token_budget).cast("long").alias("bin_start_offset"),
    )


def packing_stats(packed: DataFrame, token_budget: int = 2048) -> DataFrame:
    """Bin-level fill accounting → (pack_group, bin_id, n_docs,
    n_tokens, fill_ratio). Map-side combinable groupBy over the
    packed assignment — the dashboard number ("how much padding will
    this corpus cost?") without materializing any packed text."""
    return (
        packed.groupBy("pack_group", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("n_tokens") / F.lit(float(token_budget)), 6),
        )
    )


__all__ = ["pack_documents", "packing_stats"]
