"""Integer fixed-point PageRank over the near-duplicate pair graph.

After near-dup detection (dedup.py) and clustering (connected
components), a curation pipeline must pick each cluster's CANONICAL
document. min-doc_id is arbitrary; duplicate-graph centrality is the
principled choice — the doc most connected to its duplicates is the
best representative (and the highest-leverage removal). PageRank is
the standard centrality; this is the undirected, damped form
(Page et al. 1999) restricted to nodes that have at least one edge.

Cross-engine exactness (the same trick as clustering.py's fixed-point
k-means): float PageRank is unreproducible across engines because
double sums depend on aggregation order. Here rank mass is an INTEGER
in units of 1/SCALE:

    p_0(v)     = SCALE div N
    c_k(u)     = p_k(u) div deg(u)                (per-edge payout)
    p_{k+1}(v) = (15·(SCALE div N)) div 100
               + (85·Σ_{u~v} c_k(u)) div 100      (damping 0.85)

Every operation is integral, every sum order-free, so Spark and the
unrolled-CTE DuckDB oracle agree bit-for-bit. The deviation from real
PageRank is the dropped sub-1/SCALE remainders — with SCALE=10¹² the
per-iteration mass leak is < deg·1e-12, far below any ranking
boundary a curation pipeline would act on.

100 TB posture: all iteration state (p, deg) is NODE-sized and the
joins are edge-sized — both live on the pair graph, which near-dup
banding keeps orders of magnitude smaller than the corpus; the
corpus itself is never touched after pair generation. Each iteration
is one hash join + one map-side-combinable integer groupBy-sum on a
fixed partitioning of node id. N (node count) is one bounded driver
scalar, same contract as text.py:381. Fixed iteration count — no
driver-side convergence loop over collect().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank(
    pairs: DataFrame,
    iters: int = 3,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    persist_graph: bool = True,
) -> DataFrame:
    """(doc_a, doc_b) undirected pair edges → (doc_id, rank_fp) with
    rank_fp the integer fixed-point PageRank mass after ``iters``
    damped iterations (see module docstring).

    ``persist_graph`` (default on) caches the edge/degree/node frames:
    every iteration joins against all three, so without the cache the
    upstream pair generation (e.g. the whole MinHash banding plan)
    re-executes per iteration — the classic iterative-algorithm
    materialization, same contract as minhash_lsh_pairs'
    ``persist_banded``.  The caches are NOT left for the caller to
    release (the function only returns the rank frame, so the caller
    never had a handle): after the final iteration the node-sized
    result is eagerly ``localCheckpoint``-ed — truncating its lineage
    off the cached frames — and all three caches are unpersisted
    before returning.  Executor storage is clean on exit; the frames
    are pair-graph-sized, not corpus-sized, so the one extra
    materialization is iteration-cost, not corpus-cost.

    Trade-off callers should know: with ``persist_graph=True`` the
    call is EAGER (the checkpoint executes the plan at call time) and
    the returned frame is NOT recomputable — ``localCheckpoint`` has
    no lineage fallback, so on a multi-executor cluster losing an
    executor's checkpoint blocks fails downstream actions instead of
    recomputing.  Pass ``persist_graph=False`` for a lazy,
    fully-recomputable plan (each iteration then re-derives the pair
    graph — fine when ``pairs`` is itself cached or cheap)."""
    if iters < 0:
        raise ValueError(f"iters must be non-negative, got {iters}")
    edges = (
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .unionByName(
            pairs.select(F.col(b_col).alias("a"), F.col(a_col).alias("b"))
        )
        .distinct()
    )
    if persist_graph:
        edges = edges.persist()
    nodes = edges.select(F.col("a").alias("v")).distinct()
    deg = edges.groupBy(F.col("a").alias("v")).agg(
        F.count("*").alias("deg")
    )
    if persist_graph:
        nodes = nodes.persist()
        deg = deg.persist()
    # one bounded driver scalar: the pair-graph node count
    n = nodes.count()
    if n == 0:
        empty = nodes.select(
            F.col("v").alias("doc_id"), F.lit(0).cast("long").alias("rank_fp")
        )
        if persist_graph:
            empty = empty.localCheckpoint(eager=True)
            for frame in (edges, nodes, deg):
                frame.unpersist()
        return empty
    base = SCALE // n
    teleport = (100 - DAMP_NUM) * base // DAMP_DEN
    p = nodes.select("v", F.lit(base).cast("long").alias("p"))
    for _ in range(iters):
        contrib = p.join(deg, "v").select(
            F.col("v").alias("a"), F.expr("p div deg").alias("c")
        )
        incoming = (
            edges.join(contrib, "a")
            .groupBy(F.col("b").alias("v"))
            .agg(F.sum("c").alias("inc"))
        )
        p = nodes.join(incoming, "v", "left").select(
            "v",
            (
                F.lit(teleport)
                + F.expr(
                    f"({DAMP_NUM} * coalesce(inc, 0L)) div {DAMP_DEN}"
                )
            ).cast("long").alias("p"),
        )
    out = p.select(
        F.col("v").alias("doc_id"), F.col("p").alias("rank_fp")
    )
    if persist_graph:
        # node-sized frame: materialize once, cut the lineage, then
        # release the three graph caches (no handle escapes otherwise)
        out = out.localCheckpoint(eager=True)
        for frame in (edges, nodes, deg):
            frame.unpersist()
    return out.orderBy("doc_id")


__all__ = ["pagerank", "SCALE", "DAMP_NUM", "DAMP_DEN"]
