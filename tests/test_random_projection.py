"""Random sign projection (operators/embeddings.py:random_projection):
JL distance preservation, determinism, plan shape, edge routing."""

from __future__ import annotations

import math

import pytest

from eventhub_to_timescale_spark.operators.embeddings import (
    _sign_matrix,
    random_projection,
)


def _vecs(spark, rows, dim=8):
    return spark.createDataFrame(
        rows, f"vec_id long, embedding array<float>"
    )


def test_matches_manual_matmul(spark):
    import numpy as np

    rng = [[(i * 7 + j * 3) % 5 - 2.0 for j in range(8)] for i in range(4)]
    df = _vecs(spark, [(i, [float(x) for x in r]) for i, r in enumerate(rng)])
    got = {r["vec_id"]: r["proj"]
           for r in random_projection(df, out_dim=4, in_dim=8).collect()}
    S = np.array(_sign_matrix(4, 8, "proj"))
    for i, r in enumerate(rng):
        want = (S @ np.array(r)) / math.sqrt(4)
        assert got[i] == pytest.approx(list(want), abs=1e-6)


def test_distances_roughly_preserved(spark):
    # JL with a 32->24 sign projection: relative pairwise-distance
    # error stays small for a handful of well-separated points
    import numpy as np

    rs = np.random.RandomState(7)
    pts = rs.randn(6, 32)
    df = _vecs(
        spark,
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
    )
    got = {r["vec_id"]: np.array(r["proj"])
           for r in random_projection(df, out_dim=24, in_dim=32).collect()}
    for i in range(6):
        for j in range(i + 1, 6):
            d0 = np.linalg.norm(pts[i] - pts[j])
            d1 = np.linalg.norm(got[i] - got[j])
            assert abs(d1 - d0) / d0 < 0.6  # loose JL sanity bound


def test_wrong_width_and_null_routed_out(spark):
    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 7), (3, None)],
        "vec_id long, embedding array<float>",
    )
    got = random_projection(df, out_dim=2, in_dim=8).collect()
    assert [r["vec_id"] for r in got] == [1]


def test_no_shuffle_no_udf_in_plan(spark):
    df = _vecs(spark, [(1, [1.0] * 8)])
    plan = (
        random_projection(df, out_dim=2, in_dim=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan  # no UDF stage


def test_rejects_bad_dims(spark):
    with pytest.raises(ValueError):
        random_projection(_vecs(spark, []), out_dim=0)
