"""Property tests for hash-based dedup (the rows-only operators):
MinHash estimates track true Jaccard, LSH recall over exact pairs,
SimHash Hamming separates near-dups from random pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from bireme_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from bireme_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


class TestMinhash:
    def test_signature_length_and_determinism(self, spark, sf_dir):
        d = _docs(spark, sf_dir).limit(20)
        s1 = {r.doc_id: r.signature for r in minhash_signatures(d, "doc_id", "text").collect()}
        s2 = {r.doc_id: r.signature for r in minhash_signatures(d, "doc_id", "text").collect()}
        assert s1 == s2
        assert all(len(sig) == 64 for sig in s1.values())

    def test_estimate_tracks_true_jaccard(self, spark, sf_dir):
        d = _docs(spark, sf_dir)
        true_pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(d, "doc_id", "text", tau=0.8).collect()
        }
        assert true_pairs, "fixture should contain near-dup pairs"
        est_pairs = {
            (r.id_a, r.id_b): r.est_jaccard
            for r in minhash_lsh_pairs(d, "doc_id", "text", tau=0.0).collect()
        }
        errs = [
            abs(est_pairs[p] - true_pairs[p]) for p in true_pairs if p in est_pairs
        ]
        assert errs and sum(errs) / len(errs) < 0.15  # 64 hashes ⇒ σ ≈ 0.06

    def test_lsh_recall_over_exact_pairs(self, spark, sf_dir):
        d = _docs(spark, sf_dir)
        true_pairs = {
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(d, "doc_id", "text", tau=0.8).collect()
        }
        cand = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(d, "doc_id", "text", tau=0.5).collect()
        }
        recall = len(true_pairs & cand) / len(true_pairs)
        assert recall >= 0.9, f"LSH recall {recall} too low ({len(true_pairs)} true pairs)"


class TestSimhash:
    def test_near_dups_have_smaller_hamming(self, spark, sf_dir):
        d = _docs(spark, sf_dir)
        sh = {r.doc_id: r.simhash for r in simhash(d, "doc_id", "text").collect()}
        near = [
            (r.id_a, r.id_b)
            for r in ngram_jaccard_pairs(d, "doc_id", "text", tau=0.8).collect()
        ]
        ids = sorted(sh)

        def ham(a, b):
            return bin((sh[a] ^ sh[b]) & ((1 << 64) - 1)).count("1")

        near_avg = sum(ham(a, b) for a, b in near) / len(near)
        rand_pairs = [(ids[i], ids[-(i + 1)]) for i in range(50) if ids[i] != ids[-(i + 1)]]
        rand_avg = sum(ham(a, b) for a, b in rand_pairs) / len(rand_pairs)
        assert near_avg < rand_avg / 2, (near_avg, rand_avg)

    def test_simhash_pairs_subset_of_low_hamming(self, spark, sf_dir):
        d = _docs(spark, sf_dir)
        for r in simhash_pairs(d, "doc_id", "text", max_hamming=8).collect():
            assert r.hamming <= 8


class TestExactDedup:
    def test_synthetic_duplicates_found(self, spark, sf_dir):
        d = _docs(spark, sf_dir).select("doc_id", "text")
        dup = d.limit(5).select((F.col("doc_id") + 777_000).alias("doc_id"), "text")
        out = exact_dedup(d.unionByName(dup), "doc_id", "text")
        dups = out.where(F.col("is_duplicate")).collect()
        assert len(dups) == 5
        assert all(r.doc_id >= 777_000 for r in dups)


class TestMaxDfGuard:
    def test_hot_shingle_bounds_candidates_and_keeps_tau_pairs(self, spark):
        """Stop-shingle-heavy fixture: 60 docs share one boilerplate
        shingle (a 60²-pair hot bucket); two near-dup doc pairs share
        rare shingles. With max_df the hot bucket is dropped — the
        τ-qualifying pairs survive with identical jaccard, and the
        candidate-pair count collapses from Σbucket² to the rare ones."""
        boiler = "terms of service apply"
        docs = []
        for i in range(60):
            docs.append((i, f"{boiler} unique{i} filler{i} body{i} tail{i}"))
        # two τ≥0.8 pairs built from rare (df=2) shingles only
        docs.append((100, "alpha beta gamma delta epsilon zeta eta"))
        docs.append((101, "alpha beta gamma delta epsilon zeta eta"))
        docs.append((200, "one two three four five six seven eight"))
        docs.append((201, "one two three four five six seven eight"))
        d = spark.createDataFrame(docs, "doc_id long, text string")

        guarded = ngram_jaccard_pairs(d, "doc_id", "text", tau=0.8, max_df=10)
        got = {(r.id_a, r.id_b): r.jaccard for r in guarded.collect()}
        assert set(got) == {(100, 101), (200, 201)}
        assert all(j == 1.0 for j in got.values())

        # unguarded: the boilerplate shingle alone creates 60·59/2
        # candidate pairs (none qualify, but all are paired & counted)
        unguarded = ngram_jaccard_pairs(d, "doc_id", "text", tau=0.0, max_df=None)
        guarded_all = ngram_jaccard_pairs(d, "doc_id", "text", tau=0.0, max_df=10)
        assert unguarded.count() >= 60 * 59 / 2
        assert guarded_all.count() < 100

    def test_release_persisted_frees_cache(self, spark, sf_dir):
        from bireme_spark.operators.dedup import release_persisted

        d = _docs(spark, sf_dir).limit(50)
        out = ngram_jaccard_pairs(d, "doc_id", "text", tau=0.8)
        out.count()
        handles = out._bireme_persisted
        assert handles and all(h.storageLevel.useMemory for h in handles)
        release_persisted(out)
        assert all(not h.storageLevel.useMemory for h in handles)


class TestEmbeddingCosineLsh:
    def test_lsh_equals_crossjoin_on_registered_corpus(self, spark, sf_dir):
        """The driver query's corpus (planted scalar-multiple dups,
        τ=0.8): the bucketed plan must return the EXACT pair set of
        the O(n²) reference — scalar multiples share every hyperplane
        signature, so recall is deterministic, not probabilistic."""
        from bireme_spark.operators.dedup import (
            embedding_cosine_pairs,
            embedding_cosine_pairs_lsh,
        )
        from bireme_spark.queries.dedup import _embeddings_with_dupes

        corpus = _embeddings_with_dupes(spark, sf_dir)
        exact = {
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_cosine_pairs(corpus, "vec_id", "embedding", tau=0.8).collect()
        }
        lsh = {
            (r.id_a, r.id_b, r.cosine)
            for r in embedding_cosine_pairs_lsh(
                corpus, "vec_id", "embedding", tau=0.8, dim=64
            ).collect()
        }
        assert exact, "corpus must contain planted near-dup pairs"
        assert lsh == exact

    def test_lsh_recall_on_noisy_neighbors(self, spark, sf_dir):
        """Honest approximate case: noisy (not scalar-multiple)
        near-dups at cosine ≈0.97–0.99; LSH candidates must recover
        ≥90% of what the exact crossJoin finds at τ=0.9."""
        from bireme_spark.operators.dedup import (
            embedding_cosine_pairs,
            embedding_cosine_pairs_lsh,
        )

        e = load_table(spark, sf_dir, "embeddings").limit(200).select("vec_id", "embedding")
        # deterministic per-element perturbation, small vs vector norm
        noisy = e.select(
            (F.col("vec_id") + 500_000).alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(0.05) * F.sin(x * F.lit(37.0))
            ).alias("embedding"),
        )
        corpus = e.unionByName(noisy)
        exact = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs(corpus, "vec_id", "embedding", tau=0.9).collect()
        }
        lsh = {
            (r.id_a, r.id_b)
            for r in embedding_cosine_pairs_lsh(
                corpus, "vec_id", "embedding", tau=0.9, dim=64
            ).collect()
        }
        assert exact, "perturbed copies should form near-dup pairs"
        recall = len(exact & lsh) / len(exact)
        assert recall >= 0.9, f"LSH recall {recall} over {len(exact)} exact pairs"


class TestConnectedComponents:
    """Star-contraction correctness: the cases min-label propagation
    handled, plus the adversarial deep-diameter graph it could not
    (a chain's diameter ≫ round budget; star contraction is
    O(log n) rounds on any shape)."""

    def test_chain_converges_in_logarithmic_rounds(self, spark):
        import warnings

        from bireme_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "id_a long, id_b long"
        )
        with warnings.catch_warnings():
            warnings.simplefilter("error", RuntimeWarning)  # no stale-label warn
            rows = connected_components(pairs, max_iters=20).collect()
        assert len(rows) == 201
        assert all(r.component == 0 for r in rows)

    def test_non_convergence_warns_not_crashes(self, spark):
        """max_iters exhausted on a 4-node chain must raise the
        stale-label RuntimeWarning — round 3 had a latent NameError on
        this path (``converged`` only assigned on the break branch)."""
        import warnings

        from bireme_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3)], "id_a long, id_b long"
        )
        # pre_contract=False: the pre-pass would collapse this chain
        # in one partition and converge round 1 — the point here is
        # the LOOP's exhaustion path
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            rows = connected_components(pairs, max_iters=1, pre_contract=False).collect()
        assert any(
            issubclass(w.category, RuntimeWarning) and "not converged" in str(w.message)
            for w in caught
        )
        assert len(rows) == 4  # labels still returned (possibly stale)

    def test_pre_contraction_preserves_components(self, spark):
        """Local union-find + global stitch ≡ pure star loop on a
        graph FORCED to span partitions (repartition(8) scatters the
        edges), including chains that cross partition boundaries."""
        import random

        from bireme_spark.operators.dedup import connected_components

        rng = random.Random(7)
        edges = []
        # 10 chains of length 12 with shuffled ids + some extra intra-
        # component edges — components = {120k..120k+12} over permuted ids
        ids = list(range(200))
        rng.shuffle(ids)
        for comp in range(10):
            members = ids[comp * 13 : comp * 13 + 13]
            for x, y in zip(members, members[1:]):
                edges.append((x, y))
            edges.append((members[0], members[-1]))
        pairs = spark.createDataFrame(edges, "id_a long, id_b long").repartition(8)
        fast = {
            (r.id, r.component)
            for r in connected_components(pairs, pre_contract=True).collect()
        }
        slow = {
            (r.id, r.component)
            for r in connected_components(pairs, pre_contract=False).collect()
        }
        assert fast == slow
        assert len({c for _, c in fast}) == 10

    def test_pre_contraction_repartitions_when_bound_exceeded(self, spark):
        """The ~edges_per_partition memory bound must hold even when
        the inherited partitioning is coarser than the target width:
        coalesce cannot widen, so the sizing falls back to
        repartition. Forced here with a tiny bound (3 edges/partition
        on a 1-partition input) — the scale path at test size."""
        from bireme_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "id_a long, id_b long"
        ).coalesce(1)
        rows = connected_components(pairs, edges_per_partition=3).collect()
        assert len(rows) == 31
        assert all(r.component == 0 for r in rows)

    def test_multiple_components_min_rooted(self, spark):
        from bireme_spark.operators.dedup import connected_components

        pairs = spark.createDataFrame(
            [(10, 11), (11, 12), (12, 10), (50, 60), (60, 55), (7, 3)],
            "id_a long, id_b long",
        )
        got = {(r.id, r.component) for r in connected_components(pairs).collect()}
        assert got == {
            (10, 10), (11, 10), (12, 10),
            (50, 50), (55, 50), (60, 50),
            (3, 3), (7, 3),
        }


def test_semantic_dedup_sound_and_complete_within_cells(spark, sf_dir):
    """Every removed vector has a kept lower-id τ-neighbor in its
    cell; no two kept vectors in one cell are τ-close."""
    from pyspark.sql import functions as F

    from bireme_spark.operators.ann import ivf_index
    from bireme_spark.operators.dedup import cosine, semantic_dedup
    from bireme_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    tau = 0.5
    out = semantic_dedup(e, "vec_id", "embedding", dim=64, tau=tau, ncells=8)
    # recompute the same deterministic clustering (seeds + Lloyd are
    # deterministic) and all within-cell pairs
    _, assigned = ivf_index(e, "vec_id", "embedding", dim=64, ncells=8)
    a = assigned.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "cell")
    b = assigned.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "cell")
    pairs = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .select("id_a", "id_b", "cos")
        .collect()
    )
    kept = {r.vec_id for r in out.collect() if r.kept}
    removed = {r.vec_id for r in out.collect() if not r.kept}
    close = [(r.id_a, r.id_b) for r in pairs if r.cos >= tau]
    # soundness: each removed id has SOME lower-id τ-neighbor in-cell
    for rid in removed:
        assert any(b2 == rid for _, b2 in close), rid
    # completeness: no τ-close pair survives with both sides kept
    for a2, b2 in close:
        assert not (a2 in kept and b2 in kept), (a2, b2)


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment = 1.0
    but Jaccard ≈ |A|/|B| — the asymmetric miner exists precisely for
    pairs the symmetric one structurally cannot flag."""
    from bireme_spark.operators.dedup import ngram_containment_pairs, ngram_jaccard_pairs

    long_words = " ".join(f"w{i}" for i in range(120))
    short_words = " ".join(f"w{i}" for i in range(20))  # prefix quote
    df = spark.createDataFrame([(1, long_words), (2, short_words)], "doc_id long, text string")
    cont = ngram_containment_pairs(df, "doc_id", "text", n=3, tau=0.9).collect()
    assert [(r.inner_id, r.outer_id, r.containment) for r in cont] == [(2, 1, 1.0)]
    jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, tau=0.5).collect()
    assert jac == []  # 18/118 ≈ 0.15 — invisible to Jaccard


def test_containment_denominator_survives_max_df_guard(spark):
    """Hot-shingle guard must not inflate containment: doc A shares 8
    of its 10 shingles with B plus holds a boilerplate shingle that
    breaches max_df. True C(A→B) < τ; a guard that also shrank |A|
    would report 8/9 or 8/8 and emit a false positive."""
    from bireme_spark.operators.dedup import ngram_containment_pairs

    # 12-word docs → 10 trigram shingles each. A and B share their
    # first 10 words (8 shingles); A's tail contains the boilerplate
    # trigram that 30 filler docs also carry (df ≈ 31 > max_df).
    shared = " ".join(f"s{i}" for i in range(10))
    docs = [
        (1, f"{shared} hot stop word"),
        (2, f"{shared} aa bb cc"),
    ]
    docs += [(100 + i, f"x{i} y{i} hot stop word z{i}") for i in range(30)]
    d = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.inner_id, r.outer_id): r.containment
        for r in ngram_containment_pairs(d, "doc_id", "text", n=3, tau=0.85, max_df=10).collect()
    }
    # A(1) has 12 shingles total, 8 shared with B(2): C = 8/12 = 0.67
    # — nothing may reach τ=0.85 even though the guard dropped A's
    # hot shingles from the joinable set
    assert got == {}, got


class TestFuzzyDedupPipeline:
    """End-to-end minhash→components→canonical-keep pipeline."""

    def test_planted_near_dups_are_removed(self, spark, sf_dir):
        from bireme_spark.operators.dedup import connected_components, minhash_lsh_pairs

        d = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text", "source")
            .limit(50)
        )
        # plant: a verbatim copy and a one-token edit of doc 0
        base = d.where(F.col("doc_id") == 0).select("text").collect()[0][0]
        extra = spark.createDataFrame(
            [(100000, base, "planted"), (100001, base + " tail", "planted")],
            "doc_id long, text string, source string",
        )
        corpus = d.unionByName(extra)
        pairs = minhash_lsh_pairs(corpus, "doc_id", "text", tau=0.6)
        comp = connected_components(pairs)
        drops = {
            r.id for r in comp.where(F.col("id") != F.col("component")).collect()
        }
        # both planted dups fold into doc 0's cluster and are dropped
        assert 100000 in drops and 100001 in drops and 0 not in drops

    def test_gate_query_conserves_docs(self, spark, sf_dir):
        from bireme_spark.queries.dedup import corpus_fuzzy_dedup_pipeline

        rows = corpus_fuzzy_dedup_pipeline(spark, sf_dir).collect()
        total = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert sum(r.n_docs for r in rows) == total
        assert all(r.n_kept + r.n_removed == r.n_docs for r in rows)
        assert all(r.n_kept >= 1 for r in rows)


class TestIncrementalProbe:
    """incremental_jaccard_probe: batch-vs-index candidates only."""

    def test_planted_copy_found_at_one(self, spark):
        from bireme_spark.operators.dedup import incremental_jaccard_probe

        corpus = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "x y z w q r")], "doc_id long, text string"
        )
        batch = spark.createDataFrame(
            [(100, "a b c d e f"), (101, "totally different words here now")],
            "doc_id long, text string",
        )
        rows = incremental_jaccard_probe(
            corpus, batch, "doc_id", "text", n=3, tau=0.8
        ).collect()
        assert {(r.batch_id, r.match_id, r.jaccard) for r in rows} == {(100, 1, 1.0)}

    def test_no_batch_batch_pairs(self, spark):
        from bireme_spark.operators.dedup import incremental_jaccard_probe

        corpus = spark.createDataFrame([(1, "p q r s t u")], "doc_id long, text string")
        batch = spark.createDataFrame(
            [(100, "a b c d e f"), (101, "a b c d e f")], "doc_id long, text string"
        )
        # identical batch docs must NOT pair with each other — only
        # with the index (which holds nothing similar)
        assert (
            incremental_jaccard_probe(corpus, batch, "doc_id", "text", n=3, tau=0.5).count()
            == 0
        )

    def test_hot_shingle_guard_is_conservative(self, spark):
        from bireme_spark.operators.dedup import incremental_jaccard_probe

        # every corpus doc shares the same hot shingle; guard drops it
        corpus = spark.createDataFrame(
            [(i, f"hot hot hot u{i} v{i} w{i}") for i in range(5)],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [(100, "hot hot hot u0 v0 w0")], "doc_id long, text string"
        )
        full = incremental_jaccard_probe(corpus, batch, "doc_id", "text", n=3, tau=0.3)
        guarded = incremental_jaccard_probe(
            corpus, batch, "doc_id", "text", n=3, tau=0.3, max_df=2
        )
        f = {(r.batch_id, r.match_id): r.jaccard for r in full.collect()}
        g = {(r.batch_id, r.match_id): r.jaccard for r in guarded.collect()}
        assert set(g) <= set(f)  # guard can only drop/shrink, never add
        for k in g:
            assert g[k] <= f[k] + 1e-9


def test_shingles_short_documents_yield_zero_not_crash(spark):
    """A document with fewer than n tokens must produce ZERO shingles:
    the unguarded sequence(1, size-n+1) yields the descending [1, 0]
    for size<n and slice(__ws, 0, n) throws
    INVALID_PARAMETER_VALUE.START (r7 ADVICE, reproduced)."""
    from bireme_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y"), (3, "only"), (4, "")],
        "id long, text string",
    )
    rows = shingles(df, "id", "text", n=5).collect()
    assert sorted((r.id, r.shingle) for r in rows) == [
        (1, "a b c d e"),
        (1, "b c d e f"),
    ]
