"""ANN property tests: LSH recall vs brute force, cosine sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from bireme_spark.operators.ann import bruteforce_topk, lsh_topk
from bireme_spark.sources.tables import load_table


def test_bruteforce_self_similarity_excluded(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 3)
    out = bruteforce_topk(e, q, "vec_id", "embedding", k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in out)
    assert all(-1.0 <= r.cosine <= 1.0 for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cosine))
    for rows in by_q.values():
        rows.sort()
        cosines = [c for _, c in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in bruteforce_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_topk(e, q, "vec_id", "embedding", dim=64, k=5, tables=8, bits=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"LSH recall {recall}"


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=4/16 cells must recover most exact neighbors."""
    from pyspark.sql import functions as F

    from bireme_spark.operators.ann import bruteforce_topk, ivf_topk
    from bireme_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in bruteforce_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(e, q, "vec_id", "embedding", dim=64, k=5, ncells=16, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"IVF recall {recall:.2f} too low"


def test_ivf_cells_partition_corpus(spark, sf_dir):
    from bireme_spark.operators.ann import ivf_index
    from bireme_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cents, assigned = ivf_index(e, "vec_id", "embedding", dim=64, ncells=8)
    assert len(cents) == 8
    counts = assigned.groupBy("cell").count().collect()
    assert sum(r["count"] for r in counts) == e.count()
    assert all(0 <= r["cell"] < 8 for r in counts)
