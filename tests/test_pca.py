"""PCA projection via exact-integer sufficient statistics
(operators/embeddings.py: pca_fit_spark / pca_fit_duckdb /
pca_project)."""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
class TestPca:
    def test_spark_and_duckdb_fits_are_bit_identical(self, spark):
        """The two sufficient-statistics paths (Arrow mapInPandas
        int64 partials vs DuckDB exact integer sums) must produce the
        SAME literals — integer arithmetic leaves no accumulation-
        order freedom."""
        from eventhub_to_timescale_spark.operators.embeddings import (
            pca_fit_duckdb,
            pca_fit_spark,
        )

        path = f"{SF_DIR}/embeddings.parquet"
        emb = spark.read.parquet(path).repartition(8)
        assert pca_fit_spark(emb, k=4) == pca_fit_duckdb(path, k=4)
        # and partitioning-independent
        assert pca_fit_spark(emb.repartition(3), k=4) == pca_fit_duckdb(
            path, k=4
        )
        # non-default vec_col reaches the mapInPandas worker (the
        # partial closure must read the renamed column, not a
        # hardcoded "embedding")
        assert pca_fit_spark(
            emb.withColumnRenamed("embedding", "vec"), k=4, vec_col="vec"
        ) == pca_fit_duckdb(path, k=4)

    def test_component_variances_are_decreasing(self, spark):
        """Projections onto earlier components carry ≥ variance of
        later ones — the defining PCA property."""
        from eventhub_to_timescale_spark.operators.embeddings import (
            pca_fit_duckdb,
            pca_project,
        )
        from pyspark.sql import functions as F

        path = f"{SF_DIR}/embeddings.parquet"
        emb = spark.read.parquet(path)
        mean, comps = pca_fit_duckdb(path, k=4)
        var = {
            r["component_idx"]: r["v"]
            for r in pca_project(emb, mean, comps)
            .groupBy("component_idx")
            .agg(F.var_pop("value").alias("v"))
            .collect()
        }
        assert var[0] >= var[1] >= var[2] >= var[3] > 0

    def test_matches_duckdb_oracle(self, spark):
        from eventhub_to_timescale_spark.operators.embeddings import (
            pca_fit_duckdb,
            pca_project,
            pca_project_oracle_sql,
        )

        path = f"{SF_DIR}/embeddings.parquet"
        emb = spark.read.parquet(path)
        mean, comps = pca_fit_duckdb(path, k=4)
        got = sorted(
            tuple(r) for r in pca_project(emb, mean, comps).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * "
            f"FROM read_parquet('{path}')"
        )
        want = sorted(
            map(
                tuple,
                con.execute(pca_project_oracle_sql(mean, comps)).fetchall(),
            )
        )
        assert got == want and len(got) > 0
