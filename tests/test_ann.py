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


def test_pq_recall_vs_bruteforce(spark, sf_dir):
    """PQ/ADC candidate gen + exact rerank: with rerank=4×k the
    shortlist must recover most exact neighbors, and every emitted
    cosine must equal the exact one (rerank IS exact)."""
    from bireme_spark.operators.ann import bruteforce_topk, pq_topk
    from bireme_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact_rows = bruteforce_topk(e, q, "vec_id", "embedding", k=5).collect()
    exact = {(r.query_id, r.neighbor_id) for r in exact_rows}
    exact_cos = {(r.query_id, r.neighbor_id): r.cosine for r in exact_rows}
    approx_rows = pq_topk(
        e, q, "vec_id", "embedding", dim=64, k=5, m=8, ksub=16, rerank=8
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall {recall:.2f} too low"
    for r in approx_rows:
        key = (r.query_id, r.neighbor_id)
        if key in exact_cos:
            assert abs(r.cosine - exact_cos[key]) < 1e-9


def test_pq_codes_shape(spark, sf_dir):
    from pyspark.sql import functions as F2

    from bireme_spark.operators.ann import _pq_codes_udf, pq_train
    from bireme_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    books, normed = pq_train(e, "vec_id", "embedding", 64, m=8, ksub=16)
    assert books.shape == (8, 16, 8)
    codes = normed.select(_pq_codes_udf(books)(F2.col("nv")).alias("c")).head(20)
    for r in codes:
        assert len(r["c"]) == 8
        assert all(0 <= c < 16 for c in r["c"])


class TestKnnGraph:
    """ann_knn_graph properties: exact edge weights, deterministic
    recall of planted scalar-multiple duplicates (identical LSH
    signatures), per-node degree ≤ k, and mutual filtering."""

    def _graph(self, spark, sf_dir, **kw):
        from bireme_spark.operators.ann import knn_graph

        e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").limit(300)
        copies = e.where(F.col("vec_id") % 25 == 0).select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(2.0)).alias("embedding"),
        )
        corpus = e.unionByName(copies)
        return corpus, knn_graph(corpus, "vec_id", "embedding", dim=64, k=3, **kw)

    def test_degree_bound_and_rank_contiguity(self, spark, sf_dir):
        _, g = self._graph(spark, sf_dir)
        per = g.groupBy("src").agg(
            F.count(F.lit(1)).alias("deg"), F.max("rank").alias("mx")
        )
        bad = per.where((F.col("deg") > 3) | (F.col("deg") != F.col("mx"))).count()
        assert bad == 0

    def test_planted_duplicates_are_top1(self, spark, sf_dir):
        """A scalar multiple shares every hyperplane signature with
        its original, so the pair ALWAYS collides; cosine 1.0 makes
        it rank 1 on both endpoints."""
        _, g = self._graph(spark, sf_dir)
        tops = {
            r.src: (r.dst, r.cosine)
            for r in g.where(F.col("rank") == 1).collect()
        }
        for vid in [0, 25, 50, 75, 100]:
            assert tops[vid + 1_000_000] == (vid, 1.0)
            assert tops[vid] == (vid + 1_000_000, 1.0)

    def test_edge_weights_are_exact_cosine(self, spark, sf_dir):
        from bireme_spark.operators.dedup import cosine as exact_cosine

        corpus, g = self._graph(spark, sf_dir)
        v = corpus.select(F.col("vec_id"), F.col("embedding"))
        checked = (
            g.limit(50)
            .join(v.select(F.col("vec_id").alias("src"), F.col("embedding").alias("sv")), "src")
            .join(v.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("dv")), "dst")
            .withColumn("exact", F.round(exact_cosine(F.col("sv"), F.col("dv")), 6))
        )
        assert checked.where(F.col("cosine") != F.col("exact")).count() == 0

    def test_mutual_graph_is_symmetric_subset(self, spark, sf_dir):
        _, g = self._graph(spark, sf_dir)
        from bireme_spark.operators.ann import knn_graph

        corpus, _ = self._graph(spark, sf_dir)
        m = knn_graph(corpus, "vec_id", "embedding", dim=64, k=3, mutual=True)
        edges = {(r.src, r.dst) for r in m.collect()}
        assert edges  # planted pairs guarantee mutual rank-1 edges
        assert all((d, s) in edges for s, d in edges)
        full = {(r.src, r.dst) for r in g.collect()}
        assert edges <= full


def test_nsw_recall_vs_bruteforce(spark, sf_dir):
    """The graph index must beat the flat-index recall bars: ≥0.9
    (VERDICT r7 item 7 contract) — navigability via the warm start +
    beam expansion recovers neighbors LSH buckets alone miss."""
    from bireme_spark.operators.ann import nsw_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in bruteforce_topk(e, q, "vec_id", "embedding", k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in nsw_topk(e, q, "vec_id", "embedding", dim=64, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"NSW recall {recall:.2f} too low"


def test_nsw_output_contract(spark, sf_dir):
    """Exact-k rows per query, no self matches, no duplicate
    neighbors, descending exact cosines (the graph only routes)."""
    from bireme_spark.operators.ann import nsw_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    out = nsw_topk(e, q, "vec_id", "embedding", dim=64, k=5).collect()
    by_q = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        assert -1.0 <= r.cosine <= 1.0
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5
    for rows in by_q.values():
        assert len(rows) == 5
        assert len({r.neighbor_id for r in rows}) == 5
        rows.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_incremental_ivf_equals_frozen_model_assignment(spark, sf_dir):
    """ivf_incremental_add contract (VERDICT r8 item 7): searching the
    incrementally-grown index must be IDENTICAL to assigning the union
    corpus from scratch under the SAME frozen centroid model, its
    recall must track both brute force and a full retrain, and a
    planted self-query over a batch vector must surface that vector's
    true neighbors (the batch is actually searchable)."""
    from bireme_spark.operators.ann import (
        _nearest_cell_udf,
        bruteforce_topk,
        ivf_incremental_add,
        ivf_index,
        ivf_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    standing = e.where(F.col("vec_id") % 10 != 0)
    batch = e.where(F.col("vec_id") % 10 == 0)
    q = e.where(F.col("vec_id") < 10)

    cents, assigned = ivf_index(standing, "vec_id", "embedding", dim=64, ncells=16)
    index = ivf_incremental_add(cents, assigned, batch, "embedding")
    # incremental work is assignment-only: the model is byte-identical
    assert index[0] is cents

    inc = ivf_topk(None, q, "vec_id", "embedding", dim=64, k=5, index=index)
    inc_rows = {(r.query_id, r.rank): r.neighbor_id for r in inc.collect()}

    # (a) ≡ from-scratch assignment of the union under the SAME model
    union = standing.unionByName(batch)
    refit = (
        cents,
        union.withColumn("cell", _nearest_cell_udf(cents)(F.col("embedding"))),
    )
    same = ivf_topk(None, q, "vec_id", "embedding", dim=64, k=5, index=refit)
    assert inc_rows == {(r.query_id, r.rank): r.neighbor_id for r in same.collect()}

    # (b) recall vs brute force and vs a full retrain within ε
    exact = {
        (r.query_id, r.neighbor_id)
        for r in bruteforce_topk(union, q, "vec_id", "embedding", k=5).collect()
    }
    inc_set = {(qr, n) for (qr, _), n in inc_rows.items()}
    recall_inc = len(exact & inc_set) / len(exact)
    assert recall_inc >= 0.8, f"incremental recall {recall_inc}"
    rebuilt = ivf_topk(union, q, "vec_id", "embedding", dim=64, k=5)
    reb_set = {(r.query_id, r.neighbor_id) for r in rebuilt.collect()}
    recall_reb = len(exact & reb_set) / len(exact)
    assert abs(recall_inc - recall_reb) <= 0.15, (recall_inc, recall_reb)

    # (c) planted: an exact DUPLICATE of a batch vector (external
    # query id) must find its twin at cosine 1.0 — identical vectors
    # assign to the same cell, so the twin is always probed; this is
    # the guarantee that batch rows really joined the inverted lists
    # (top-1 of an arbitrary query is NOT guaranteed at nprobe 4/16)
    bq = batch.orderBy("vec_id").limit(2).select(
        (F.col("vec_id") + 1_000_000).alias("qid"), "embedding"
    )
    got = ivf_topk(
        None, bq, "vec_id", "embedding", dim=64, k=3, index=index,
        query_id_col="qid",
    ).collect()
    twins = {(r.query_id, r.neighbor_id) for r in got if r.cosine == 1.0}
    for r in batch.orderBy("vec_id").limit(2).collect():
        assert (r.vec_id + 1_000_000, r.vec_id) in twins, (
            f"planted duplicate of batch vector {r.vec_id} not found"
        )
