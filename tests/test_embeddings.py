

def test_pca_spectrum_properties(spark, sf_dir):
    """Eigenvalues non-increasing and positive for a covariance;
    var_explained consistent; trace identity vs the distributed
    covariance diagonal."""
    from bireme_spark.queries.embeddings import embedding_covariance, embedding_pca

    rows = embedding_pca(spark, sf_dir).collect()
    evs = [r.eigenvalue for r in sorted(rows, key=lambda r: r.component)]
    assert all(evs[i] >= evs[i + 1] - 1e-12 for i in range(len(evs) - 1))
    assert all(e > 0 for e in evs)
    cov = embedding_covariance(spark, sf_dir).collect()
    trace = sum(r.cov for r in cov if r.pos_i == r.pos_j)
    # top-16 of 64 near-isotropic dims: each var_explained ≈ ev/trace
    for r in rows:
        assert abs(r.var_explained - r.eigenvalue / trace) < 1e-3
