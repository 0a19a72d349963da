

def test_pca_spectrum_properties(spark, sf_dir):
    """Eigenvalues non-increasing and positive for a covariance;
    trace identity vs the distributed covariance diagonal; and the
    gate audit row (embedding_pca) reports every invariant TRUE."""
    from bireme_spark.queries.embeddings import (
        embedding_covariance,
        embedding_pca,
        embedding_pca_spectrum,
    )

    ev, C = embedding_pca_spectrum(spark, sf_dir)
    evs = list(ev)
    assert all(evs[i] >= evs[i + 1] - 1e-12 for i in range(len(evs) - 1))
    assert all(e > 0 for e in evs)
    cov = embedding_covariance(spark, sf_dir).collect()
    trace = sum(r.cov for r in cov if r.pos_i == r.pos_j)
    assert abs(sum(evs) - trace) <= 1e-9 * abs(trace)
    row = embedding_pca(spark, sf_dir).collect()[0]
    assert row.eigsum_matches_trace and row.psd
    assert row.spectrum_nonincreasing and row.cum_var_le_one
    assert row.dim == len(evs)


class TestPcaProjection:
    """embedding_pca_project invariants (rows-only op): projected
    dimension, variance spectrum equals the top eigenvalues, and the
    spectrum is non-increasing — LAPACK signs can flip, variances
    cannot."""

    def test_projection_spectrum_matches_eigenvalues(self, spark, sf_dir):
        import numpy as np

        from bireme_spark.queries.embeddings import (
            embedding_pca_project,
            embedding_pca_spectrum,
        )

        proj = embedding_pca_project(spark, sf_dir, top=8).collect()
        assert all(len(r.pca) == 8 for r in proj)
        P = np.array([r.pca for r in proj])
        var = P.var(axis=0, ddof=1)
        assert all(var[i] >= var[i + 1] - 1e-9 for i in range(7))
        ev, _ = embedding_pca_spectrum(spark, sf_dir)
        for i in range(8):
            assert abs(var[i] - ev[i]) <= 1e-4 * max(1.0, ev[i]), (i, var[i], ev[i])

    def test_projection_is_centered(self, spark, sf_dir):
        import numpy as np

        from bireme_spark.queries.embeddings import embedding_pca_project

        P = np.array([r.pca for r in embedding_pca_project(spark, sf_dir, top=4).collect()])
        assert np.abs(P.mean(axis=0)).max() < 1e-6


def test_whitened_covariance_is_identity(spark, sf_dir):
    """ZCA property: the FULL whitened sample covariance must be ≈ I
    (top=64 keeps every dim in the flat output)."""
    import numpy as np

    from bireme_spark.queries.embeddings import embedding_whitening_project

    rows = embedding_whitening_project(spark, sf_dir, top=64).collect()
    n_vec = len({r.vec_id for r in rows})
    d = max(r.dim for r in rows) + 1
    M = np.zeros((n_vec, d))
    idx = {v: i for i, v in enumerate(sorted({r.vec_id for r in rows}))}
    for r in rows:
        M[idx[r.vec_id], r.dim] = r.value
    C = np.cov(M, rowvar=False)
    off = C - np.eye(d)
    # 6dp-rounded values + float covariance: loose-but-real tolerance
    assert np.abs(off).max() < 1e-2, np.abs(off).max()
