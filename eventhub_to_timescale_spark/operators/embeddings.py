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


def _sign_matrix(out_dim: int, in_dim: int, salt: str) -> list[list[float]]:
    """Deterministic ±1 Rademacher matrix from md5 parity — engine-
    independent (pure Python), reproducible from (salt, dims) alone."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()[0], 16)
            & 1
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    salt: str = "proj",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, proj: array<double>[out_dim]) — Johnson–Lindenstrauss
    sign projection ``proj_j = (Σ_i S_ji·v_i)/√out_dim`` with a
    deterministic Rademacher ±1 matrix (Achlioptas 2003: database-
    friendly random projections — sign matrices preserve pairwise
    distances with the same JL guarantee as Gaussians).

    The dimensionality-reduction step ahead of ANN indexing / dedup
    clustering when the embedding column is wider than the index needs.

    100 TB posture: the S matrix is a PLAN-TIME literal (out_dim
    arrays of in_dim signs baked into the projection expressions), so
    the operator is a single scan-side ``select`` — no shuffle, no UDF,
    no broadcast; each output component is one codegen'd zip/fold.

    Cross-engine determinism: the fold sums strictly left-to-right from
    a 0.0 seed, mirrored textually in the oracle SQL; components are
    rounded to 6 dp and ``+ 0.0``-normalized so a −0.0 cannot split the
    value hash. Vectors that are NULL or not exactly ``in_dim`` wide
    are routed out (no direction to project).
    """
    if out_dim <= 0 or in_dim <= 0:
        raise ValueError(f"dims must be positive, got {out_dim}x{in_dim}")
    import math

    scale = 1.0 / math.sqrt(out_dim)
    mat = _sign_matrix(out_dim, in_dim, salt)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    comps = []
    for j in range(out_dim):
        signs = F.array(*[F.lit(s) for s in mat[j]])
        dot = F.aggregate(
            F.zip_with(v, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        comps.append(F.round(dot * F.lit(scale), 6) + F.lit(0.0))
    return (
        embeddings.filter(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == in_dim)
        )
        .select("vec_id", F.array(*comps).alias("proj"))
    )


def random_projection_oracle_sql(
    out_dim: int = 16,
    in_dim: int = 64,
    salt: str = "proj",
    table: str = "embeddings",
) -> str:
    """DuckDB rendering of ``random_projection`` — the identical sign
    matrix expanded to left-associated arithmetic chains (same fold
    order, same 0.0 seed, same rounding/−0.0 normalization)."""
    import math

    scale = repr(1.0 / math.sqrt(out_dim))
    mat = _sign_matrix(out_dim, in_dim, salt)
    comps = []
    for j in range(out_dim):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({mat[j][i]:+.1f})"
            for i in range(in_dim)
        )
        comps.append(f"round((0.0 + {terms}) * {scale}, 6) + 0.0")
    proj = ",\n         ".join(comps)
    return f"""
SELECT vec_id,
       [{proj}] AS proj
FROM {table}
WHERE embedding IS NOT NULL AND len(embedding) = {in_dim}
"""


__all__ = [
    "l2_norm",
    "normalize_quantize",
    "quantization_error",
    "random_projection",
    "random_projection_oracle_sql",
]
