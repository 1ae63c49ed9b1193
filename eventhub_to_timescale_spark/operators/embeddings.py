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
    # r15 (guide §4.4-adjacent): the norm and the quantize transform
    # are CodegenFallback higher-order functions, and Catalyst inlines
    # projected definitions into pushed-down predicates — the
    # ``raw_norm > 0`` filter (plus downstream Generate-inferred
    # constraints on ``q``) used to re-evaluate the whole interpreted
    # aggregate/transform tree up to 3x per row below the exchange.
    # Routing ``raw_norm`` through the single-element-explode barrier
    # (ingest.envelope.materialize — a Generate node whose output is
    # an attribute CollapseProject/pushdown cannot cross) pins ONE
    # evaluation per row; the quantize transform then references the
    # attribute and is evaluated once per surviving row.
    from eventhub_to_timescale_spark.ingest.envelope import materialize

    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = embeddings.filter(F.col(vec_col).isNotNull()).select(
        "vec_id",
        F.size(F.col(vec_col)).alias("dim"),
        v.alias("v"),
    )
    return (
        materialize(base, l2_norm(F.col("v")), "raw_norm")
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


# ---------------------------------------------------------------------------
# PCA projection (sufficient-statistics pattern)
# ---------------------------------------------------------------------------


def _pca_fit_from_sums(
    n: int, s1: list[int], s2: list[list[int]], k: int, dim: int
) -> tuple[list[float], list[list[float]]]:
    """Deterministic PCA fit from EXACT integer micro-sums: mean and
    the top-``k`` eigenvectors of the covariance of the micro-quantized
    vectors, entries rounded to 9 dp with a canonical sign (largest-
    magnitude component positive, ties to the earlier index).

    The sums are exact BIGINTs (Σ round(v_i·1e6) and
    Σ round(v_i·1e6)·round(v_j·1e6)), so ANY engine that aggregates
    them — Spark, DuckDB, numpy — produces bit-identical integers, and
    this one shared function turns them into bit-identical literals
    for both the Spark plan and the SQL oracle.  numpy's ``eigh`` on a
    fixed symmetric matrix is deterministic within a container.
    """
    import numpy as np

    mean = np.array(s1, dtype=np.float64) / n  # micro units
    g = np.array(s2, dtype=np.float64)
    cov = g / n - np.outer(mean, mean)  # micro² units; scale cancels
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    w = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        w.append([round(float(x), 9) for x in v])
    mean_units = [round(float(m) / 1e6, 9) for m in mean]
    return mean_units, w


def pca_project(
    embeddings: DataFrame,
    mean: list[float],
    components: list[list[float]],
    in_dim: int = 64,
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, component_idx, value): project each embedding onto
    the given (pre-fitted) principal components — mean-centered dot
    products, values rounded to 6 dp, emitted as exploded scalar rows
    (the gate-safe shape; see random_projection's note).

    The component matrix is a PLAN-TIME LITERAL, so like
    ``random_projection`` the operator is one scan-side select — no
    shuffle, no UDF; fitting happens OUTSIDE on bounded sufficient
    statistics (``pca_fit``), the aggregate-small/solve-on-driver/
    broadcast-back pattern every distributed ML pipeline uses.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    comps = []
    for j, row in enumerate(components):
        terms = F.zip_with(
            v,
            F.array(*[F.lit(float(w)) for w in row]),
            lambda x, w: x * w,
        )
        dot = F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t)
        offset = sum(m * w for m, w in zip(mean, row))
        comps.append(
            F.round(dot - F.lit(float(round(offset, 9))), 6) + F.lit(0.0)
        )
    out = (
        embeddings.filter(
            F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) == in_dim)
        )
        .select("vec_id", F.array(*comps).alias("_p"))
        .select(
            "vec_id",
            F.posexplode("_p").alias("component_idx", "value"),
        )
    )
    return out


def pca_fit_spark(
    embeddings: DataFrame,
    k: int = 4,
    in_dim: int = 64,
    vec_col: str = "embedding",
) -> tuple[list[float], list[list[float]]]:
    """Fit PCA sufficient statistics IN SPARK: per-partition exact
    int64 Gram/sum partials via an Arrow-vectorized ``mapInPandas``
    (numpy integer matmul — each partial is one constant-size row:
    n, Σvm, Σvm·vmᵀ), summed exactly with one tiny aggregation, then
    solved on the driver by ``_pca_fit_from_sums``.

    100 TB posture: the ONLY data movement is one constant-size
    partial row per partition (1 + d + d² int64s); the corpus itself
    never shuffles, and the expensive step — eigendecomposition — runs
    on a d×d matrix on the driver.  Overflow headroom: |vm| ≤ ~1e7
    micro-units ⇒ per-row products ≤ 1e14; int64 holds ~9.2e18, so
    ≥90 000 rows per partition before a partial could wrap — repartition
    finer for longer partitions.
    """
    import pandas as pd  # noqa: F401

    dim = in_dim
    col = vec_col  # close over, so non-default vec_col reaches the worker

    def _partial(batches):
        import numpy as np
        import pandas as pd

        n = 0
        s1 = np.zeros(dim, dtype=np.int64)
        s2 = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            vecs = [
                v for v in pdf[col] if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.array(vecs, dtype=np.float64) * 1e6
            # half-AWAY-from-zero, matching DuckDB round() and Spark
            # F.round exactly (np.rint is half-to-even and would drift
            # on exact .5 micro boundaries)
            vm = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
            n += vm.shape[0]
            s1 += vm.sum(axis=0)
            s2 += vm.T @ vm
        yield pd.DataFrame(
            {
                "n": [n],
                "s1": [s1.tolist()],
                "s2": [s2.reshape(-1).tolist()],
            }
        )

    parts = embeddings.select(vec_col).mapInPandas(
        _partial, schema="n long, s1 array<long>, s2 array<long>"
    )
    rows = parts.collect()  # bounded: one row per partition
    n = sum(r["n"] for r in rows)
    s1 = [0] * dim
    s2 = [[0] * dim for _ in range(dim)]
    for r in rows:
        if not r["n"]:
            continue
        for i in range(dim):
            s1[i] += r["s1"][i]
            base = i * dim
            row2 = r["s2"]
            for j in range(dim):
                s2[i][j] += row2[base + j]
    return _pca_fit_from_sums(n, s1, s2, k, dim)


def pca_fit_duckdb(
    parquet_path: str, k: int = 4, in_dim: int = 64
) -> tuple[list[float], list[list[float]]]:
    """The oracle-side fit: the SAME exact integer sums computed by
    DuckDB from the same parquet, fed to the SAME
    ``_pca_fit_from_sums`` — bit-identical literals by construction
    (exact integer arithmetic has no accumulation-order freedom)."""
    import os

    import duckdb
    import numpy as np

    if os.path.isdir(parquet_path):
        # Spark-written scaled tables are part-file directories
        parquet_path = f"{parquet_path}/*.parquet"
    con = duckdb.connect()
    arr = con.execute(
        f"""
        SELECT list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
        FROM read_parquet(?)
        WHERE embedding IS NOT NULL AND len(embedding) = {in_dim}
        """,
        [parquet_path],
    ).fetchall()
    con.close()
    vm = np.array([r[0] for r in arr], dtype=np.int64)
    n = vm.shape[0]
    s1 = vm.sum(axis=0).tolist()
    s2 = (vm.T @ vm).tolist()
    return _pca_fit_from_sums(n, s1, s2, k, in_dim)


def pca_project_oracle_sql(
    mean: list[float],
    components: list[list[float]],
    in_dim: int = 64,
    table: str = "embeddings",
) -> str:
    """DuckDB rendering of ``pca_project`` with the identical literal
    matrix — same left-associated fold, same centering offset, same
    rounding/−0.0 normalization, exploded to the same scalar rows."""
    sel = []
    for j, row in enumerate(components):
        terms = " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * ({row[i]!r})"
            for i in range(in_dim)
        )
        offset = round(sum(m * w for m, w in zip(mean, row)), 9)
        sel.append(f"round((0.0 + {terms}) - ({offset!r}), 6) + 0.0")
    proj = ",\n         ".join(sel)
    return f"""
WITH base AS (
  SELECT vec_id, [{proj}] AS p
  FROM {table}
  WHERE embedding IS NOT NULL AND len(embedding) = {in_dim}
)
SELECT vec_id,
       CAST(unnest(range(len(p))) AS INT) AS component_idx,
       CAST(unnest(p) AS DOUBLE) AS value
FROM base
"""
