"""ANN recall vs brute-force ground truth (VERDICT r7 ask #8): the
quality metric a training-data pipeline actually tunes. ``sim_ann_lsh``
and ``sim_ivf_topk`` are oracle-exact by construction (both engines run
the same algorithm), so this test measures the thing parity cannot:
how much of the TRUE top-k each approximate method recovers, at sf0.1.

Measured on the synthetic corpus (2 000 vectors, dim 64, round 8):

    lsh probe_hamming=0   0.013      ivf 16 cells × 4 probes   0.944
    lsh probe_hamming=2   0.344      ivf 16 cells × 8 probes   0.994
    lsh probe_hamming=3   0.594
    lsh probe_hamming=4   0.825

Context the floors encode: these embeddings are near-ISOTROPIC (median
true-top-10 cosine ≈ 0.29, i.e. θ ≈ 73°, per-plane agreement p ≈ 0.59)
— the theoretical worst case for sign-LSH, where the Hamming-ball
recall Σ_{j≤r} C(8,j) p^(8−j)(1−p)^j predicts exactly the measured
curve. Clustered real-world embeddings sit far above these floors at
the same radius. IVF is the production scale path (recall 0.94 probing
4/16 cells); multi-probe LSH buys a monotone recall/candidate-volume
dial with zero corpus shuffles.
"""

from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_RECALL_SF", "/root/testdata/sf0.1")
Q, K = 16, 10


@pytest.fixture(scope="module")
def ground_truth(spark):
    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    exact: dict[int, set] = {}
    for r in cosine_topk_bruteforce(emb, query_max_id=Q, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(exact) == Q
    return emb, exact


def _recall(df, exact) -> float:
    approx: dict[int, set] = {}
    for r in df.collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    per_q = [
        len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
    ]
    return sum(per_q) / len(per_q)


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_ivf_recall_floor(spark, ground_truth):
    from eventhub_to_timescale_spark.operators.similarity import ivf_topk

    emb, exact = ground_truth
    r = _recall(
        ivf_topk(emb, query_max_id=Q, k=K, n_centroids=16, nprobe=4), exact
    )
    assert r >= 0.8, f"IVF(16,4) recall@{K} fell to {r:.3f} (floor 0.8)"


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_lsh_multiprobe_recall_floor_and_monotonicity(spark, ground_truth):
    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_lsh,
    )

    emb, exact = ground_truth
    recalls = {}
    for radius in (0, 2, 4):
        recalls[radius] = _recall(
            cosine_topk_lsh(
                emb, query_max_id=Q, k=K, num_planes=8, probe_hamming=radius
            ),
            exact,
        )
    # the probe radius is a monotone recall dial
    assert recalls[0] < recalls[2] < recalls[4], recalls
    # floors with margin under the measured 0.344 / 0.825
    assert recalls[2] >= 0.25, f"r=2 recall {recalls[2]:.3f} (floor 0.25)"
    assert recalls[4] >= 0.70, f"r=4 recall {recalls[4]:.3f} (floor 0.70)"


# ---------------------------------------------------------------------------
# Clustered (non-isotropic) fixture — VERDICT r8 ask #8.  The floors
# above measure the adversarial isotropic case; real embedding corpora
# are CLUSTERED, and both methods should sit far above those floors in
# the production regime.  Mixture of 16 Gaussians, 2 000 points,
# dim 64: centers ~N(0, I), points = center + N(0, 0.15²·I), so
# intra-cluster cosine ≈ 0.95 while inter-cluster cosine ≈ 0 — the
# regime IVF's coarse quantizer is built for.
# ---------------------------------------------------------------------------

N_CLUSTERED, DIM, N_BLOBS = 2000, 64, 16


@pytest.fixture(scope="module")
def clustered_ground_truth(spark):
    import numpy as np

    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_bruteforce,
    )

    rng = np.random.RandomState(20260815)
    centers = rng.randn(N_BLOBS, DIM)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.randint(0, N_BLOBS, size=N_CLUSTERED)
    pts = centers[labels] + 0.15 * rng.randn(N_CLUSTERED, DIM) / DIM**0.5
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(N_CLUSTERED)],
        "vec_id long, embedding array<float>",
    )
    exact: dict[int, set] = {}
    for r in cosine_topk_bruteforce(emb, query_max_id=Q, k=K).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert len(exact) == Q
    return emb, exact


def test_ivf_recall_on_clustered_fixture(spark, clustered_ground_truth):
    """Production-regime IVF: same probe budget as the isotropic floor
    test (16 cells, 4 probes) must recover ≥0.9 of the true top-10
    when the corpus actually clusters."""
    from eventhub_to_timescale_spark.operators.similarity import ivf_topk

    emb, exact = clustered_ground_truth
    r = _recall(
        ivf_topk(emb, query_max_id=Q, k=K, n_centroids=16, nprobe=4), exact
    )
    assert r >= 0.9, f"clustered IVF(16,4) recall@{K} = {r:.3f} (floor 0.9)"


def test_lsh_recall_on_clustered_fixture(spark, clustered_ground_truth):
    """Clustered corpora lift sign-LSH far above its isotropic floor:
    a true neighbor at cosine ≈0.95 disagrees with the query on a
    hyperplane with p ≈ 0.10, so a radius-2 probe of 8 planes already
    recovers most of the top-10 (binomial tail ≥ Σ_{j≤2} C(8,j)
    0.9^(8-j) 0.1^j ≈ 0.96 expected)."""
    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_lsh,
    )

    emb, exact = clustered_ground_truth
    r2 = _recall(
        cosine_topk_lsh(
            emb, query_max_id=Q, k=K, num_planes=8, probe_hamming=2
        ),
        exact,
    )
    assert r2 >= 0.7, f"clustered LSH(r=2) recall@{K} = {r2:.3f} (floor 0.7)"


def test_rrf_fusion_beats_each_single_ranker(spark, clustered_ground_truth):
    """The retrieval-quality claim behind sim_rrf_fusion (r13 verdict
    ask #6): fusing two APPROXIMATE rankers whose miss patterns differ
    structurally — single-bucket LSH (misses = sign-sketch disagreers)
    and aggressively-pruned IVF at 64 cells / 1 probe (misses = wrong
    coarse cell) — must recover MORE of the true top-10 than either
    ranker alone.  Measured on this fixture (r14): LSH 0.569, IVF
    0.600, fused 0.750 — a +0.15 lift over the better input.  All
    inputs are deterministic (fixed fixture seed, deterministic
    planes/centroids), so the floors are exact pins, not tolerances.

    Per-query fusion runs through ONE rrf_fuse call via composite keys
    (query_id·N + neighbor_id keeps contributions per-query while the
    operator's groupBy fuses all queries at once); per-query top-K is
    then read off by the operator's own (rrf_nanos DESC, doc_id)
    order."""
    import collections

    from eventhub_to_timescale_spark.operators.fusion import rrf_fuse
    from eventhub_to_timescale_spark.operators.similarity import (
        cosine_topk_lsh,
        ivf_topk,
    )

    emb, exact = clustered_ground_truth
    lsh = cosine_topk_lsh(
        emb, query_max_id=Q, k=K, num_planes=8, probe_hamming=0
    ).collect()
    ivf = ivf_topk(
        emb, query_max_id=Q, k=K, n_centroids=64, nprobe=1
    ).collect()

    def _avg(rows):
        a = collections.defaultdict(set)
        for r in rows:
            a[r.query_id].add(r.neighbor_id)
        return sum(
            len(a[q] & exact[q]) / len(exact[q]) for q in exact
        ) / len(exact)

    r_lsh, r_ivf = _avg(lsh), _avg(ivf)

    def _composite(rows):
        return spark.createDataFrame(
            [
                (r.query_id * N_CLUSTERED + r.neighbor_id, r.rank)
                for r in rows
            ],
            "doc_id long, rank long",
        )

    fused = rrf_fuse(
        [_composite(lsh), _composite(ivf)], top_n=Q * K * 2
    ).collect()
    by_q = collections.defaultdict(list)
    for r in fused:
        by_q[r["doc_id"] // N_CLUSTERED].append(
            (-r["rrf_nanos"], r["doc_id"] % N_CLUSTERED)
        )
    fused_rec = []
    for q in exact:
        top = {d for _, d in sorted(by_q.get(q, []))[:K]}
        fused_rec.append(len(top & exact[q]) / len(exact[q]))
    r_fused = sum(fused_rec) / len(fused_rec)

    assert r_fused >= r_lsh and r_fused >= r_ivf, (
        f"fusion lost to an input: fused={r_fused:.3f} "
        f"lsh={r_lsh:.3f} ivf={r_ivf:.3f}"
    )
    assert r_fused >= 0.70, f"fused recall@{K} = {r_fused:.3f} (floor 0.70)"


def test_ivf_staged_equals_lazy(spark):
    # r16: the cell-assigned corpus (the stored inverted file) is a
    # stage-boundary leaf by default; results must match the lazy form
    from eventhub_to_timescale_spark.operators.similarity import ivf_topk

    import numpy as np

    rng = np.random.RandomState(7)
    pts = rng.randn(200, 64)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in pts[i]]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    staged = ivf_topk(emb, query_max_id=4, k=3).collect()
    lazy = ivf_topk(emb, query_max_id=4, k=3, stage=False).collect()
    assert staged == lazy and len(staged) > 0
