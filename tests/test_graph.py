"""Property tests for the distributed PageRank operator — the
rows-only contract behind ``embedding_knn_pagerank``."""

from __future__ import annotations

import pytest

from bireme_spark.operators.graph import pagerank


def _ranks(spark, edges, iters=6):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.id: r.rank for r in pagerank(df, iters=iters).collect()}


class TestPageRank:
    def test_mass_conserved(self, spark):
        ranks = _ranks(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
        assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)

    def test_cycle_is_uniform(self, spark):
        ranks = _ranks(spark, [(1, 2), (2, 3), (3, 4), (4, 1)])
        assert all(r == pytest.approx(0.25, abs=1e-9) for r in ranks.values())

    def test_star_center_dominates(self, spark):
        # spokes all point at the hub; hub is dangling (mass recycles)
        ranks = _ranks(spark, [(2, 1), (3, 1), (4, 1), (5, 1)])
        assert ranks[1] == max(ranks.values())
        assert ranks[1] > 2 * ranks[2]

    def test_deterministic_across_partitionings(self, spark):
        edges = [(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]
        df1 = spark.createDataFrame(edges, "src long, dst long")
        df8 = spark.createDataFrame(edges, "src long, dst long").repartition(8)
        r1 = {r.id: r.rank for r in pagerank(df1, iters=5).collect()}
        r8 = {r.id: r.rank for r in pagerank(df8, iters=5).collect()}
        assert r1 == r8  # DECIMAL pipeline ⇒ bit-identical, not approx


class TestApproxTriangles:
    """DOULION sparsified estimator vs the exact count — unbiased
    with concentration at thousands of triangles; the md5 coin is
    deterministic, so these are exact regression values per dataset,
    tested with slack for testdata regeneration."""

    def test_estimate_within_10pct_of_exact(self, spark, sf_dir):
        from bireme_spark.queries.audit import (
            graph_triangle_count,
            graph_triangle_count_approx,
        )

        exact = graph_triangle_count(spark, sf_dir).collect()[0]
        approx = graph_triangle_count_approx(spark, sf_dir).collect()[0]
        assert approx.n_sampled_edges < exact.n_edges  # actually sparsified
        # node p_v = 12/16 (both endpoints) × edge p_e = 5/16:
        # expect ~(0.75² · 0.3125) ≈ 17.6% of edges kept (±8pp slack)
        frac = approx.n_sampled_edges / exact.n_edges
        assert 0.10 < frac < 0.26
        rel = abs(approx.est_triangles - exact.n_triangles) / max(exact.n_triangles, 1)
        assert rel < 0.10, (approx.est_triangles, exact.n_triangles)
