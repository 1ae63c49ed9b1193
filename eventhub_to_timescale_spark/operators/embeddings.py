"""Embedding-column preparation for training pipelines: L2
normalization and symmetric int8 quantization — the storage/transfer
shrink step that sits between embedding generation and ANN indexing
(operators/similarity.py) in an LLM data pipeline.

Everything is codegen'd array expressions (``transform`` /
``aggregate``) — no UDF, no shuffle; the plan is a single projection
over the scan, so it runs at parquet-read speed and scales linearly.

Cross-engine determinism: the fold in ``aggregate`` sums the squares
in array order, exactly like DuckDB's ``list_sum`` over the same
float32 values widened to double, so norms are bit-identical and the
int8 codes (round-half-away in both engines) hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def l2_norm(vec: Column) -> Column:
    """Sequential-fold L2 norm of an array<double> column."""
    return F.sqrt(
        F.aggregate(
            vec,
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )


def normalize_quantize(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: int = 127,
) -> DataFrame:
    """→ (vec_id, dim, norm, q) — unit-normalize each embedding, then
    quantize to int8 codes ``q_i = round(scale * v_i / ||v||)``.

    Zero-norm / NULL vectors are routed out (they have no direction to
    quantize) — same contract as the cosine operators
    (similarity.py:39).  ``norm`` is rounded to 6 dp for the oracle
    surface; the codes themselves are exact integers so the value hash
    carries no float-rendering risk.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    norm = l2_norm(v)
    return (
        embeddings.filter(F.col(vec_col).isNotNull())
        .select(
            "vec_id",
            F.size(F.col(vec_col)).alias("dim"),
            norm.alias("raw_norm"),
            v.alias("v"),
        )
        .filter(F.col("raw_norm") > 0)
        .select(
            "vec_id",
            "dim",
            F.round(F.col("raw_norm"), 6).alias("norm"),
            F.transform(
                F.col("v"),
                lambda x: F.round(F.lit(scale) * x / F.col("raw_norm"))
                .cast("int"),
            ).alias("q"),
        )
    )


def quantization_error(
    embeddings: DataFrame,
    vec_col: str = "embedding",
    scale: int = 127,
) -> DataFrame:
    """→ (vec_id, max_abs_err) — reconstruction check: the max
    per-component |v_i/||v|| − q_i/scale| of the int8 codes.  Bounded
    by 0.5/scale by construction; surfacing it as a queryable column
    makes the quantizer auditable in-pipeline (rounded to 6 dp)."""
    q = normalize_quantize(embeddings, vec_col, scale)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    src = embeddings.filter(F.col(vec_col).isNotNull()).select(
        "vec_id", v.alias("v"), l2_norm(v).alias("raw_norm")
    )
    joined = q.join(src, "vec_id")
    err = F.aggregate(
        F.zip_with(
            F.col("v"),
            F.col("q"),
            lambda x, c: F.abs(x / F.col("raw_norm") - c / F.lit(float(scale))),
        ),
        F.lit(0.0),
        lambda acc, e: F.greatest(acc, e),
    )
    return joined.select("vec_id", F.round(err, 6).alias("max_abs_err"))


__all__ = ["l2_norm", "normalize_quantize", "quantization_error"]
