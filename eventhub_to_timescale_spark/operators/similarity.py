"""Similarity search over an embedding column (``array<float>``).

- ``cosine_topk_bruteforce``: exact top-k neighbors for a bounded
  query set. The query side is tiny → **broadcast** join against the
  full corpus; per-candidate score is one codegen'd fold (zip_with +
  aggregate), no UDF, no Python. At 100 TB the corpus side streams
  through executors once; only (query, k) survivors shuffle for the
  final window.
- ``cosine_topk_lsh``: random-hyperplane LSH (sign sketch). Planes are
  *deterministic* (md5-derived pseudo-randoms), so results are
  reproducible and oracle-checkable. Buckets prune the corpus to
  same-sketch candidates; the final ranking is exact cosine within the
  probed buckets. This is the scale path: candidate generation is an
  equi-join on the sketch key.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _finite_vec(col: Column) -> Column:
    """NULL or all-zero embeddings have no cosine (0/0): Spark folds
    the division to NULL while SQL engines yield NaN that sorts FIRST
    under DESC — so such vectors are excluded on BOTH sides (oracles
    carry the matching ``list_dot_product(v, v) > 0`` filter)."""
    return col.isNotNull() & (_dot(col, col) > 0)


def cosine_topk_bruteforce(
    embeddings: DataFrame,
    query_max_id: int = 8,
    k: int = 5,
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): exact top-k cosine
    neighbors for every vec_id < ``query_max_id`` (self excluded).

    Ordering ties are broken on (rounded cosine DESC, neighbor_id ASC)
    so ranks are deterministic across engines/float-fold orders.
    """
    q = (
        embeddings.filter(F.col("vec_id") < query_max_id)
        .select(
            F.col("vec_id").alias("query_id"),
            _as_double(F.col("embedding")).alias("qv"),
        )
        .filter(_finite_vec(F.col("qv")))
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        _as_double(F.col("embedding")).alias("cv"),
    ).filter(_finite_vec(F.col("cv")))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hyperplane_sketch(vec: Column, num_planes: int = 8, dim: int = 64) -> Column:
    """Deterministic random-hyperplane sign sketch → integer bucket id.

    Plane p's d-th component = (md5-hash32(f"p:{p}:{d}") mod 2001 −
    1000)/1000 ∈ [−1, 1] — reproducible anywhere md5 exists (e.g. the
    DuckDB oracle), unlike RNG-seeded planes.
    """

    def plane_component(p: int, d: int) -> float:
        # computed driver-side once; constant-folded into the plan
        import hashlib

        h = int(hashlib.md5(f"p:{p}:{d}".encode()).hexdigest()[:8], 16)
        return ((h % 2001) - 1000) / 1000.0

    sketch = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = F.array(*[F.lit(plane_component(p, d)) for d in range(dim)])
        dot_p = _dot(vec, plane)
        sketch = sketch + F.when(
            dot_p > 0, F.lit(2**p).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sketch


def hamming_ball_masks(num_planes: int, radius: int) -> list[int]:
    """All XOR masks of popcount ≤ radius over ``num_planes`` bits —
    the probe offsets of multi-probe LSH, in deterministic
    (popcount, value) order."""
    from itertools import combinations

    masks = []
    for r in range(radius + 1):
        for bits in combinations(range(num_planes), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_max_id: int = 8,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    probe_hamming: int = 0,
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): approximate top-k via
    hyperplane-LSH bucket pruning, exact cosine within the bucket.

    ``probe_hamming`` enables MULTI-PROBE LSH (Lv et al., VLDB'07
    shape): each query also probes every bucket whose sketch lies
    within the given Hamming radius of its own — a near neighbor that
    disagrees with the query on ≤ r of the ``num_planes`` hyperplane
    signs is still found. Probe count is Σ_{{j≤r}} C(num_planes, j)
    (8 planes, r=2 → 37 of 256 buckets; r=3 → 93), applied on the
    BROADCAST query side only — the corpus is still scanned once and
    shuffled never, so recall is bought with bounded candidate volume,
    not with extra passes. r=0 is the classic single-bucket probe.

    Recall is data-dependent (see tests/test_ann_recall.py, which pins
    measured floors): for a neighbor at angle θ the per-plane
    agreement is p = 1 − θ/π, and P(found) = Σ_{{j≤r}} C(m, j)
    p^(m−j) (1−p)^j."""
    if probe_hamming < 0 or probe_hamming > num_planes:
        raise ValueError(
            f"probe_hamming must be in [0, {num_planes}], got {probe_hamming}"
        )
    sk = (
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        # wrong-length vectors would NULL-pad the plane dot (zip_with)
        # and silently collapse every sketch to bucket 0 → an O(n²)
        # join; route them out with the zero-norm/null rejects instead
        .filter((F.size("v") == dim) & _finite_vec(F.col("v")))
        .select(
            "vec_id",
            "v",
            hyperplane_sketch(F.col("v"), num_planes, dim).alias("sketch"),
        )
    )
    q = sk.filter(F.col("vec_id") < query_max_id).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("sketch").alias("qsketch"),
    )
    if probe_hamming > 0:
        # explode the bounded query side by the Hamming-ball masks;
        # each corpus sketch equals at most ONE probed sketch per
        # query (masks are distinct), so pairs stay unique — no dedup
        masks = F.array(
            *[F.lit(m) for m in hamming_ball_masks(num_planes, probe_hamming)]
        )
        q = q.select(
            "query_id",
            "qv",
            F.explode(
                F.transform(
                    masks, lambda m: F.col("qsketch").bitwiseXOR(m)
                )
            ).alias("qsketch"),
        )
    c = sk.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("sketch").alias("csketch"),
    )
    scored = (
        F.broadcast(q)
        .join(
            c,
            (F.col("qsketch") == F.col("csketch"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _lloyd(x, n_centroids: int, iters: int):
    """Deterministic Lloyd iterations (shared by the Spark trainer and
    the DuckDB-oracle trainer, so both sides see bit-identical
    centroids). Init = the first ``n_centroids`` rows; no RNG."""
    if len(x) == 0:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    # fewer rows than requested centroids → train what exists (both
    # the Spark trainer and the oracle trainer share this rule, so
    # the embedded centroid literals always match)
    n_centroids = min(n_centroids, len(x))
    cents = x[:n_centroids].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def train_ivf_centroids(
    embeddings: DataFrame,
    n_centroids: int = 16,
    iters: int = 5,
    sample_size: int = 2048,
) -> list[list[float]]:
    """Deterministic mini k-means coarse quantizer (IVF training).

    Driver-side Lloyd iterations over a bounded sample — the standard
    IVF shape: training is small (a sample), ASSIGNMENT is the
    distributed part. Init = the ``n_centroids`` lowest-vec_id vectors,
    so retraining reproduces identical centroids (no RNG)."""
    import numpy as np

    sample = (
        embeddings.filter(F.col("embedding").isNotNull())
        .orderBy("vec_id")
        .limit(sample_size)
        .select(_as_double(F.col("embedding")).alias("v"))
        .collect()
    )
    vecs = [r.v for r in sample]
    # ragged rows (wrong dimensionality) would break the numpy array;
    # keep rows matching the first vector's length — the same rule the
    # oracle trainer applies, so centroids stay bit-identical
    if vecs:
        d = len(vecs[0])
        vecs = [v for v in vecs if len(v) == d]
    x = np.array(vecs, dtype=float)
    cents = _lloyd(x, n_centroids, iters)
    return [[float(v) for v in c] for c in cents]


def ivf_centroids_from_parquet(
    parquet_path: str,
    n_centroids: int = 16,
    iters: int = 5,
    sample_size: int = 2048,
):
    """Recompute the exact centroids ``train_ivf_centroids`` produces,
    reading the parquet directly (no Spark) — used by the DuckDB
    correctness oracle. float32→float64 widening is exact in both
    engines and the sample order (vec_id ASC) matches, so the shared
    ``_lloyd`` yields bit-identical centroids. Returns (centroids,
    c_sq) as numpy arrays, c_sq computed with the same expression the
    vectorized assignment UDF uses."""
    import duckdb
    import numpy as np

    con = duckdb.connect()
    rows = con.execute(
        "SELECT embedding::DOUBLE[] FROM read_parquet(?) "
        "WHERE embedding IS NOT NULL ORDER BY vec_id LIMIT ?",
        [parquet_path, sample_size],
    ).fetchall()
    con.close()
    vecs = [r[0] for r in rows]
    if vecs:
        d = len(vecs[0])
        vecs = [v for v in vecs if len(v) == d]  # match the Spark trainer
    x = np.array(vecs, dtype=float)
    cents = _lloyd(x, n_centroids, iters)
    return cents, (cents * cents).sum(axis=1)


def _cell_id_udf(centroids: list[list[float]]):
    """Vectorized cell assignment: one Arrow batch → one numpy
    argmin(|x−c|²) matmul. A pure-expression variant (16 centroids ×
    64 dims of literals) works but compiles a huge codegen tree and
    evaluates scalar-at-a-time; the BLAS path is the realistic choice
    for assignment over a 100 TB corpus. Centroids are closure-baked
    (small) — effectively a broadcast."""
    import numpy as np
    from pyspark.sql.pandas.functions import pandas_udf

    c = np.array(centroids, dtype=float)  # (k, dim)
    c_sq = (c * c).sum(axis=1)  # (k,)

    def assign(vecs: pd.Series) -> pd.Series:
        x = np.array(vecs.tolist(), dtype=float)  # (n, dim)
        # argmin ||x-c||^2 = argmin (c·c - 2 x·c); 6dp rounding before
        # the argmin mirrors the oracle's ROUND so BLAS-vs-SQL
        # summation-order noise can't flip a near-tie cell (ties then
        # break to the lower cell on both sides: np first-min ↔
        # ORDER BY dist, cell)
        d = np.round(c_sq[None, :] - 2.0 * (x @ c.T), 6)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return pandas_udf(assign, "int")


def ivf_topk(
    embeddings: DataFrame,
    query_max_id: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    stage: bool = True,
) -> DataFrame:
    """→ (query_id, neighbor_id, cosine, rank): approximate top-k via
    an IVF coarse quantizer — queries probe their ``nprobe`` nearest
    cells; exact cosine within the probed cells.

    Scale shape: centroid training is a bounded driver-side sample;
    cell assignment is a per-row expression over the full corpus;
    candidate generation is an equi-join on cell id (queries exploded
    ×nprobe, broadcast). The corpus never self-joins.

    ``stage`` (default on) materializes the cell-assigned corpus
    through the session's stage boundary: that frame IS the inverted
    file a production IVF index stores once at build time — the lazy
    form re-runs the Arrow assignment pass over the whole corpus on
    every action.  ``stage=False`` keeps the fully-lazy recomputable
    form for oracle comparison."""
    import numpy as np

    cents = train_ivf_centroids(embeddings, n_centroids)
    dim = len(cents[0])
    assign = _cell_id_udf(cents)
    corpus = (
        embeddings.select(
            F.col("vec_id").alias("neighbor_id"),
            _as_double(F.col("embedding")).alias("cv"),
        )
        # NULL / wrong-length vectors would crash the vectorized
        # assignment batch (ragged np.array); zero-norm ones have no
        # cosine — route all of them out up front
        .filter((F.size("cv") == dim) & _finite_vec(F.col("cv")))
        .withColumn("cell", assign(F.col("cv")))
    )
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        corpus = stage_boundary(corpus)

    # driver-side probe list per query (queries are a bounded set)
    qrows = (
        embeddings.filter(F.col("vec_id") < query_max_id)
        .select("vec_id", _as_double(F.col("embedding")).alias("qv"))
        .filter((F.size("qv") == dim) & _finite_vec(F.col("qv")))
        .collect()
    )
    c = np.array(cents)
    c_sq = (c * c).sum(axis=1)
    probe_rows = []
    for r in qrows:
        # same c·c − 2 x·c form and 6dp rounding as the assignment UDF
        # and the oracle's probe CTE — the dropped x·x constant can't
        # change the ordering, and rounding the SAME quantity on both
        # engines keeps near-tie probes from flipping
        d = np.round(c_sq - 2.0 * (np.array(r.qv) @ c.T), 6)
        # stable sort: distance ties break toward the lower cell id,
        # matching the oracle's row_number(ORDER BY dist, cell)
        for cell in np.argsort(d, kind="stable")[:nprobe]:
            probe_rows.append((r.vec_id, [float(x) for x in r.qv], int(cell)))
    spark = embeddings.sparkSession
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, qcell int"
    )
    scored = (
        F.broadcast(probes)
        .join(
            corpus,
            (F.col("qcell") == F.col("cell"))
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
        # no dedup needed: each neighbor lives in exactly one cell and
        # a query's probe cells are distinct, so (query, neighbor)
        # pairs are already unique — a dropDuplicates here was a full
        # extra shuffle buying nothing
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """→ (vec_a, vec_b, cosine): embedding-cosine near-duplicate pairs,
    LSH-bucketed candidates (same sign sketch), exact cosine filter."""
    sk = (
        embeddings.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        .filter((F.size("v") == dim) & _finite_vec(F.col("v")))  # see cosine_topk_lsh
        .select(
            "vec_id",
            "v",
            hyperplane_sketch(F.col("v"), num_planes, dim).alias("sketch"),
        )
    )
    a, b = sk.alias("a"), sk.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sketch") == F.col("b.sketch"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.orderBy("vec_a", "vec_b")
