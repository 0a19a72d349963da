"""Corpus deduplication operators for training-data pipelines.

Five dedup strategies, each picked for a different scale/accuracy
point (SURVEY.md §2.C):

- ``exact_dedup``          — content-hash groupBy (one shuffle on the
  hash; the canonical id is ``min`` — partial-aggregatable).
- ``ngram_jaccard_pairs``  — exact Jaccard over word n-gram shingles
  via an inverted-index self-join: explode shingles → join docs that
  *share* a shingle → count common. Never a cartesian product: cost
  is Σ bucket², and ``max_df`` drops stop-shingles that would create
  hot buckets at 100 TB.
- ``minhash_signatures`` / ``minhash_lsh_pairs`` — MinHash+LSH:
  k min-hashes per doc (k JVM xxhash64 aggregates, no Python), band
  bucketing, candidate join inside buckets only, signature-estimated
  Jaccard filter.
- ``simhash_pairs``        — 64-bit SimHash (token-hash bit votes),
  16-bit band blocking, Hamming ≤ r verification via bit_count(xor).
- ``embedding_cosine_pairs`` — exact cosine near-dup baseline (the
  O(n²) exact variant; the scale path is the LSH-pruned ANN in
  operators/ann.py).
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _attach_persisted(df: DataFrame, handles: list[DataFrame]) -> DataFrame:
    """Tag the result with the intermediates it pins in the block
    manager. A long-lived session should call :func:`release_persisted`
    once the result is materialized — cached blocks otherwise
    accumulate across queries (bench.py clearCache()s as a blunter
    fallback)."""
    df._bireme_persisted = handles
    return df


def release_persisted(df: DataFrame) -> None:
    """Unpersist the intermediates a pair-mining result pinned."""
    for h in getattr(df, "_bireme_persisted", []):
        h.unpersist()


def bucket_pairs(
    bk: DataFrame, id_col: str, keys: list[str], out_a: str = "id_a", out_b: str = "id_b"
) -> DataFrame:
    """All ``u < v`` id pairs within each bucket, enumerated map-side
    from ONE bucket-keyed exchange: ``groupBy(keys).collect_set(id)``
    then a nested ``transform`` over the sorted array (r10 opt — the
    same rewrite as the graph co-purchase builds: replaces the id-only
    bucket self-join's 2 per-side exchanges + join with 1 exchange +
    Generate; the emitted pair stream is row-identical, fan-out stays
    Σ C(bucket, 2)). NOT deduplicated across buckets — callers keep
    their own ``.distinct()``."""
    # out_a/out_b are interpolated into SQL text — restrict them to
    # plain identifiers so a funny name can't break/inject the expr
    # (ADVICE r10; all internal callers pass simple names).
    for ident in (out_a, out_b):
        if not ident.isidentifier():
            raise ValueError(f"bucket_pairs output column must be an identifier: {ident!r}")
    arrs = bk.groupBy(*keys).agg(F.sort_array(F.collect_set(id_col)).alias("__ids"))
    return arrs.select(
        F.explode(
            F.expr(
                "flatten(transform(__ids, (x, i) ->"
                " transform(slice(__ids, i + 2, size(__ids) - i - 1),"
                f" y -> struct(x AS `{out_a}`, y AS `{out_b}`))))"
            )
        ).alias("__p")
    ).select(f"__p.{out_a}", f"__p.{out_b}")


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Canonical-id assignment per exact content hash (sha256).

    One shuffle: the canonical id is a min window over the hash
    partition (vs groupBy+join back, which shuffles twice). The hash
    — not the content — is the shuffle key, so row width stays small
    even for multi-MB documents."""
    from pyspark.sql import Window

    h = F.sha2(F.col(content_col), 256)
    hashed = df.select(F.col(id_col), h.alias("content_hash"))
    canon = F.min(id_col).over(Window.partitionBy("content_hash"))
    return hashed.select(
        id_col,
        canon.alias("canonical_id"),
        (F.col(id_col) != canon).alias("is_duplicate"),
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (JVM higher-order
    fns; one row per (doc, shingle))."""
    # Split the text ONCE into a named column before the n-gram
    # lambda. Inlining split() inside the transform() lambda makes
    # codegen re-split the text for every sequence index — O(words²)
    # per document; the separate projection (kept by CollapseProject
    # because __ws is referenced more than once) makes it O(words).
    # Distinctness is PER DOCUMENT (Jaccard is over shingle sets), so
    # array_distinct before the explode does it map-side — no shuffle
    # at all, vs a full (doc, shingle) distinct of the exploded rows.
    # Documents shorter than n tokens must yield ZERO shingles: the
    # unguarded sequence(1, size-n+1) with size<n yields the
    # DESCENDING array [1, 0] and slice(__ws, 0, n) then throws
    # INVALID_PARAMETER_VALUE.START (Spark sequence() counts down
    # when start > stop; DuckDB's generate_series is simply empty).
    sh = F.expr(
        f"CASE WHEN size(__ws) < {n} THEN array()"
        f" ELSE array_distinct(transform(sequence(1, size(__ws) - {n - 1}),"
        f" i -> concat_ws(' ', slice(__ws, i, {n})))) END"
    )
    # The corpus often arrives as few large files (this scan is a
    # single partition at test scale); shingling is CPU-bound, so
    # round-robin the rows across all cores before fanning out.
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(par)
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__ws"))
        .select(F.col(id_col), F.explode(sh).alias("shingle"))
    )


def _shingle_common(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_df: int | None,
    full_sizes: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared inverted-index core of the exact set-overlap miners:
    (id_a, id_b, n_common, n_a, n_b) per candidate pair + the
    persisted joinable handle.

    Document frequency per shingle is a window count — one shuffle on
    ``shingle``, no separate groupBy+join. df=1 shingles can never
    produce a cross-doc pair, so pruning them is free exactness: in a
    real corpus MOST shingles are unique, which shrinks the self-join
    input (and its Σ bucket² cost) by ~an order of magnitude.
    ``max_df`` is the hot-bucket guard on the same column.

    ``full_sizes`` decides whether per-doc set sizes are counted
    BEFORE the max_df guard (containment: |A| must stay the full set —
    shrinking the denominator would INFLATE scores into false
    positives) or after (Jaccard: guarded sizes keep the estimate
    conservative — both |A∩B| and the sizes drop together)."""
    from pyspark.sql import Window

    sh = shingles(df, id_col, text_col, n)
    ann = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
    size_over_id = F.count(F.lit(1)).over(Window.partitionBy(id_col))
    if full_sizes:
        ann = ann.withColumn("n_doc", size_over_id)
        if max_df is not None:
            ann = ann.where(F.col("df") <= max_df)
    else:
        if max_df is not None:
            ann = ann.where(F.col("df") <= max_df)
        # sizes attached to the rows themselves (one shuffle on id) so
        # the pair aggregation carries both through — no post-hoc joins
        ann = ann.withColumn("n_doc", size_over_id)
    # Persisted: the a and b sides of the self-join both scan this.
    joinable = ann.where(F.col("df") >= 2).select(id_col, "shingle", "n_doc").persist()

    a = joinable.select(F.col(id_col).alias("id_a"), "shingle", F.col("n_doc").alias("n_a"))
    b = joinable.select(F.col(id_col).alias("id_b"), "shingle", F.col("n_doc").alias("n_b"))
    common = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    return common, joinable


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    tau: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (≥ tau) via inverted index.

    ``max_df``: drop shingles occurring in more than this many docs
    before the self-join — the standard hot-bucket guard at scale
    (slightly under-counts common-shingle overlap; exact when None).
    """
    common, joinable = _shingle_common(df, id_col, text_col, n, max_df, full_sizes=False)
    jac = common.withColumn(
        "jaccard",
        F.col("n_common").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
    )
    out = jac.where(F.col("jaccard") >= tau).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )
    return _attach_persisted(out, [joinable])


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    tau: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT pairs: C(A→B) = |A∩B| / |A| ≥ tau —
    the asymmetric sibling of :func:`ngram_jaccard_pairs` for
    doc-inside-doc detection (quotes, partial copies, boilerplate
    wrappers around a duplicated core). A short doc fully quoted
    inside a long one scores C≈1 while Jaccard ≈ |A|/|B| stays far
    under any dedup threshold, so Jaccard-only pipelines keep exactly
    the near-dups containment catches.

    Same inverted-index plan as the Jaccard miner (df=1 pruning,
    ``max_df`` hot-shingle guard, Σ bucket² never corpus²), with one
    deliberate difference: per-doc sizes are counted BEFORE the guard
    (``full_sizes=True``) so |A| is the true set size — dropping a hot
    shingle from the denominator but not the numerator would INFLATE
    containment and mint false positives; with full sizes the guard
    only ever under-counts (conservative, exact when no shingle
    exceeds max_df — the gate-scale case). Emits one row per DIRECTED
    pair, both directions evaluated from the same undirected overlap
    count.
    """
    common, joinable = _shingle_common(df, id_col, text_col, n, max_df, full_sizes=True)
    # both directions from the one undirected count — no second join
    directed = common.select(
        "id_a",
        "id_b",
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("inner_id"),
                    F.col("id_b").alias("outer_id"),
                    (F.col("n_common").cast("double") / F.col("n_a").cast("double")).alias(
                        "containment"
                    ),
                ),
                F.struct(
                    F.col("id_b").alias("inner_id"),
                    F.col("id_a").alias("outer_id"),
                    (F.col("n_common").cast("double") / F.col("n_b").cast("double")).alias(
                        "containment"
                    ),
                ),
            )
        ).alias("d"),
    ).select("d.inner_id", "d.outer_id", "d.containment")
    out = directed.where(F.col("containment") >= tau).select(
        "inner_id", "outer_id", F.round("containment", 6).alias("containment")
    )
    return _attach_persisted(out, [joinable])


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, num_hashes: int = 64
) -> DataFrame:
    """MinHash signature per document via the two-hash Carter–Wegman
    family h_i(s) = h1(s) + i·h2(s): two xxhash64 evaluations per
    shingle instead of k string hashes, then k cheap multiply-add
    mins — all JVM aggregates in one groupBy pass (no Python,
    map-side partial agg). ~4× faster than k independent hashes at
    identical estimator quality."""
    mask = F.lit((1 << 32) - 1)
    sh = shingles(df, id_col, text_col, n).select(
        F.col(id_col),
        # 32-bit hash space: i·h2 stays < 2^39, no ANSI bigint overflow
        F.xxhash64(F.col("shingle")).bitwiseAND(mask).alias("h1"),
        F.xxhash64(F.col("shingle"), F.lit(1)).bitwiseAND(mask).bitwiseOR(F.lit(1)).alias("h2"),
    )
    mins = [
        F.min(F.col("h1") + F.lit(i) * F.col("h2")).alias(f"h{i}") for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*mins)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    tau: float = 0.6,
) -> DataFrame:
    """LSH candidate generation + signature-estimated Jaccard filter.

    Bands of r = num_hashes/bands rows: docs agreeing on any full band
    collide. The candidate join happens only inside (band, band_hash)
    buckets — at corpus scale this is the only join that matters, and
    it shuffles on the bucket key, never pairing across buckets.
    """
    r = num_hashes // bands
    # Persist signatures: both band-join branches and the final
    # estimate read them; without this the whole shingle→hash
    # pipeline runs three times.
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes).persist()
    banded = sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    # multi-arg xxhash64 over the band's bigint slots:
                    # no string materialization per band
                    F.xxhash64(*[F.col("signature")[i] for i in range(b * r, (b + 1) * r)])
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    # Bucket join carries only ids — the 64-element arrays join back
    # after the pair-distinct, keeping the wide rows out of the
    # candidate shuffle. (r10 opt: the bucket_pairs map-side
    # enumeration A/B-LOST here — 6-rep quiet-box old 4.31/3.45 vs
    # new 4.27/5.65 for dedup_minhash_lsh/corpus_fuzzy_dedup_pipeline
    # — LSH bands have few ids per bucket, so the array build pays
    # more than the join saves; contrast embedding_cosine_pairs_lsh.)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    cand = (
        a.join(b, ["band", "band_hash"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
        .join(sig.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")), "id_a")
        .join(sig.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b")), "id_b")
    )
    est = cand.withColumn(
        "est_jaccard",
        F.aggregate(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(num_hashes)),
    )
    out = est.where(F.col("est_jaccard") >= tau).select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )
    return _attach_persisted(out, [sig])


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: every token votes ±1 on each bit
    of its xxhash64; the sign of the per-bit sum is the fingerprint
    bit. 64 conditional sums in one groupBy — all JVM."""
    par = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .withColumn("th", F.xxhash64("token"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    bits = None
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        bits = term if bits is None else bits.bitwiseOR(term)
    return agg.select(F.col(id_col), bits.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, blocked on
    16-bit bands (a pair within Hamming ≤ 3 shares at least one of 4
    bands; wider radii trade recall, standard SimHash blocking)."""
    sh = simhash(df, id_col, text_col).persist()
    banded = sh.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF))
                    for b in range(4)
                ]
            )
        ).alias("band", "band_val"),
    )
    # banded self-join kept: the bucket_pairs struct-carrying
    # enumeration A/B-LOST here (r10 opt, 6-rep quiet box: old 3.33
    # vs new 3.84 — 16-bit bands are near-unique, so buckets hold
    # 1-2 docs and the array build is pure overhead)
    a = banded.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"), "band", "band_val")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"), "band", "band_val")
    cand = (
        a.join(b, ["band", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    out = (
        cand.withColumn("hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    return _attach_persisted(out, [sh])


def cosine(vec_a, vec_b):
    """Exact cosine of two array<numeric> columns — deterministic
    left-to-right double math (zip_with + aggregate fold; an r11
    attempt to unroll it into a literal 64-term chain LOST badly —
    the giant expression fails whole-stage codegen compilation and
    the entire stage falls back to interpreted eval: kcenter 4.8→48s,
    ann_pq 8.5→84s at sf0.01 — keep the fold)."""
    from bireme_spark.operators.ann import _dot

    norm = lambda v: F.sqrt(_dot(v, v))  # noqa: E731
    return _dot(vec_a, vec_b) / (norm(vec_a) * norm(vec_b))


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, tau: float
) -> DataFrame:
    """Exact near-dup pairs by embedding cosine ≥ tau. O(n²) — the
    TEST-ONLY reference implementation (recall oracle for the
    bucketed variant below); never registered as a driver query."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    tau: float,
    dim: int,
    tables: int = 8,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ tau, the 100 TB plan:
    hyperplane-LSH candidate generation + exact cosine rerank — no
    cartesian product anywhere.

    Candidates are id pairs sharing any (table, bucket); the bucket
    self-join carries ids only (vectors join back after the pair
    distinct, as in minhash_lsh_pairs). Rerank is the exact fold from
    :func:`cosine`, so every emitted pair is exact; recall is the LSH
    collision probability (1 - (1 - p^bits)^tables with
    p = 1 - θ/π) — property-tested against the crossJoin reference.
    Two vectors that are positive scalar multiples hash to identical
    signatures, so exact-duplicate (cosine = 1) pairs are recalled
    deterministically."""
    from bireme_spark.operators.ann import lsh_bucketed

    bk = lsh_bucketed(df, id_col, vec_col, dim, tables, bits, seed).select(
        F.col(id_col), "table_id", "bucket"
    )
    cand = (
        bucket_pairs(bk, id_col, ["table_id", "bucket"])
        .distinct()
        .join(df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")), "id_a")
        .join(df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")), "id_b")
    )
    return (
        cand.withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cosine") >= tau)
        .select("id_a", "id_b", "cosine")
    )


def _local_contract(edges: DataFrame) -> DataFrame:
    """Per-partition union-find pre-contraction: each partition folds
    ITS slice of the edge list into a min-rooted star forest in one
    Arrow-batched pass — no shuffle, no driver data. The output has
    the same global connectivity (a local union is a valid union),
    but every intra-partition chain collapses to height 1, so the
    global star loop only has to stitch across partitions:
    O(log #partition-spanning merges) rounds instead of
    O(log component diameter). This is the classic big-graph CC
    accelerator (e.g. Kiveris et al. §6 "optimizations": contract
    locally, iterate globally).

    Memory: a partition's edges fit by construction — the caller
    sizes partitions at ~2M edges (~32 MB of id pairs); the
    union-find dict is O(nodes-in-partition). Python is acceptable
    here because the edge list is the *pair* set, orders of magnitude
    smaller than the corpus that produced it (the corpus-sized work
    stayed JVM-side upstream)."""

    def contract(batches):
        import pandas as pd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        for pdf in batches:
            for s, d in zip(pdf["src"].to_numpy(), pdf["dst"].to_numpy()):
                rs, rd = find(int(s)), find(int(d))
                if rs != rd:
                    # union by min id — roots stay component minima
                    lo, hi = (rs, rd) if rs < rd else (rd, rs)
                    parent[hi] = lo
        out_src, out_dst = [], []
        for node in list(parent):
            root = find(node)
            if node != root:
                out_src.append(node)
                out_dst.append(root)
        yield pd.DataFrame({"src": out_src, "dst": out_dst})

    return edges.mapInPandas(contract, "src long, dst long")


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iters: int = 20,
    pre_contract: bool = True,
    edges_per_partition: int = 2_000_000,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the
    near-dup pair graph via alternating large-star / small-star
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the step that turns pairwise similarity
    into dedup groups (keep one doc per component).

    Unlike min-label propagation (O(component diameter) rounds — a
    10⁶-node chain needs 10⁶ shuffles), star contraction halves tree
    heights every round and converges in O(log n) rounds on ANY
    graph shape, so a pathological near-dup chain can't stall the
    pipeline. Each round is two grouped aggregations + joins on the
    edge list (fully distributed; the driver only checks the
    convergence probe), lineage is truncated with a per-round
    localCheckpoint.

    Convergence is detected by a per-node degree probe over the new
    edge set: the iteration's fixed point is exactly a min-rooted
    star forest, i.e. no node both has a parent and has children
    (in-degree and out-degree both > 0) and no node has two parents
    (out-degree > 1). The probe sees the fixed point the round it is
    PRODUCED — one round earlier than comparing successive edge-set
    fingerprints, which must run an extra identical round to observe
    "nothing changed".

    The loop's shuffle partitioning is sized from the measured edge
    count (~2M edges per partition, floor 8): the near-dup edge list
    is orders of magnitude smaller than the corpus that produced it,
    so inheriting the corpus-sized shuffle width just schedules empty
    tasks every round; at 100 TB the same formula widens back out.

    ``pre_contract`` (default on) runs the per-partition union-find
    pass (``_local_contract``) before the loop: intra-partition
    chains collapse in one narrow stage, so the loop only stitches
    components that span partitions — at test scale this cuts the
    round count (and most of the fixed per-round job overhead); at
    100 TB it cuts the shuffled edge volume of every round.

    Returns (id, component) with component = min doc id in the
    cluster — star roots are neighborhood minima, so the fixed point
    is exactly the min-id rooted star forest.
    """
    def _violations(df: DataFrame) -> int:
        """Star-forest probe: 0 iff no node has two parents or both a
        parent and children (see docstring)."""
        deg = (
            df.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("src").alias("node"),
                            F.lit(1).alias("outd"),
                            F.lit(0).alias("ind"),
                        ),
                        F.struct(
                            F.col("dst").alias("node"),
                            F.lit(0).alias("outd"),
                            F.lit(1).alias("ind"),
                        ),
                    )
                ).alias("x")
            )
            .groupBy("x.node")
            .agg(F.sum("x.outd").alias("outd"), F.sum("x.ind").alias("ind"))
        )
        return deg.where(
            (F.col("outd") > 1) | ((F.col("outd") > 0) & (F.col("ind") > 0))
        ).count()

    # ordered edge list (big, small); self-edges dropped. With the
    # contraction pre-pass the explicit .distinct() shuffle is skipped
    # — union-find absorbs duplicate edges for free.
    a, b = F.col(a_col), F.col(b_col)
    edges = pairs.where(a != b).select(
        F.greatest(a, b).alias("src"), F.least(a, b).alias("dst")
    )
    if not pre_contract:
        edges = edges.distinct()
    edges = edges.persist()
    node_ids = None
    if not pre_contract:
        node_ids = edges.select(F.col("src").alias("id")).unionByName(
            edges.select(F.col("dst").alias("id"))
        ).distinct().persist()
    n_edges = edges.count()
    if node_ids is not None:
        node_ids.count()

    spark = pairs.sparkSession
    orig_parts = spark.conf.get("spark.sql.shuffle.partitions")
    loop_parts = max(8, min(int(orig_parts), n_edges // edges_per_partition + 1))

    converged = False
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
        if pre_contract and n_edges:
            # Collapse intra-partition structure first (see
            # _local_contract); the loop then only stitches across
            # partitions. Partition count scales with the edge count
            # (~2M edges ≈ 32 MB of id pairs per partition, floor 1):
            # below the threshold ONE partition contracts the whole
            # graph and the probe below skips the loop outright;
            # above it, contraction is genuinely distributed and the
            # star loop does the cross-partition stitching. coalesce,
            # not repartition: narrow, no shuffle, and fewer/fuller
            # partitions contract more.
            cparts = max(1, n_edges // edges_per_partition + 1)
            # coalesce when narrowing (no shuffle); repartition when
            # the inherited partitioning is COARSER than the ~2M-edge
            # memory bound — coalesce cannot widen, and an unbounded
            # partition would blow the per-task union-find dict
            cur_parts = edges.rdd.getNumPartitions()
            sized = edges.coalesce(cparts) if cparts <= cur_parts else edges.repartition(cparts)
            contracted = _local_contract(sized).localCheckpoint(eager=True)
            edges.unpersist()
            edges = contracted
            # the contracted node set provably equals the original
            # (every edge endpoint survives as a child src or a root
            # dst), so the label universe reads the checkpoint —
            # no second pass over the mined pairs
            node_ids = edges.select(F.col("src").alias("id")).unionByName(
                edges.select(F.col("dst").alias("id"))
            ).distinct()
            # per-partition star forests may already be the global
            # fixed point (always true when cparts == 1)
            if _violations(edges) == 0:
                converged = True
        elif pre_contract:  # no edges at all: empty universe
            node_ids = edges.select(F.col("src").alias("id"))
            converged = True
        for it in range(max_iters if not converged else 0):
            # ---- large-star: for every node u, attach all strictly
            # larger neighbors to m = min(N(u) ∪ {u}).
            und = edges.select("src", "dst").unionByName(
                edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
            mins = und.groupBy("src").agg(F.min("dst").alias("mn"))
            large = (
                und.join(mins, "src")
                .where(F.col("dst") > F.col("src"))
                .select(
                    F.col("dst").alias("src"),
                    F.least(F.col("mn"), F.col("src")).alias("dst"),
                )
                .distinct()
            )
            # ---- small-star: key every (big, small) edge by its big
            # endpoint; attach the big node and all its smaller
            # neighbors to the neighborhood min.
            smins = large.groupBy("src").agg(F.min("dst").alias("mn"))
            joined = large.join(smins, "src")
            small = (
                joined.select(F.col("src"), F.col("mn").alias("dst"))
                .unionByName(
                    joined.where(F.col("dst") != F.col("mn")).select(
                        F.col("dst").alias("src"), F.col("mn").alias("dst")
                    )
                )
                .where(F.col("src") != F.col("dst"))
                .distinct()
            )
            # Checkpoint EVERY round: each round's plan references the
            # previous edge set four times (two unions × join back), so
            # un-truncated lineage grows ~4× per round and the planner —
            # not the data — becomes the bottleneck within a few rounds.
            new_edges = small.localCheckpoint(eager=True)
            # one probe action on the materialized rdd: per-node
            # degrees → star-forest test (see docstring)
            violations = _violations(new_edges)
            edges.unpersist()
            edges = new_edges
            if violations == 0:
                converged = True
                break
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig_parts)
    if not converged:
        # exhausting the loop silently would return stale labels
        warnings.warn(
            f"connected_components: not converged after {max_iters} rounds; "
            "labels may be stale — raise max_iters (rounds needed ≈ log₂ of "
            "the largest component)",
            RuntimeWarning,
            stacklevel=2,
        )
    # converged star forest: every non-root points at its root.
    # (pre_contract path: node_ids is a lazy view over the contracted
    # checkpoint — one evaluation inside this single labels job;
    # legacy path: it is the persisted pre-loop universe.)
    labels = (
        node_ids.join(edges.withColumnRenamed("src", "id"), "id", "left")
        .select("id", F.coalesce(F.col("dst"), F.col("id")).alias("component"))
        .persist()
    )
    if not pre_contract:
        node_ids.unpersist()
    return _attach_persisted(labels, [labels, edges])


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    tau: float,
    ncells: int = 16,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with k-means, then prune within each cluster any
    item whose cosine to a LOWER-id cluster-mate is ≥ tau. Returns
    (id, kept) for every input row.

    This is the embedding twin of exact_dedup: clustering bounds the
    pair search to cluster cohabitants, so the self-join is per-cell
    (Σ s² over cluster sizes), never corpus². At 100 TB, ncells grows
    with the corpus (target cluster size stays constant), the cell
    join shuffles on `cell`, and the centroid model — the only
    driver-side data — stays ncells×dim.

    Pruning rule: min-id-wins per qualifying pair (the parallel,
    order-free variant; true greedy kept-set pruning is sequential
    within a cluster and changes results only for chains a~b~c where
    a≁c — rare at high tau).
    """
    from bireme_spark.operators.ann import ivf_index

    _, assigned = ivf_index(df, id_col, vec_col, dim, ncells=ncells)
    # r11 opt (VERDICT #6): both sides of the cell self-join read
    # `assigned`, so the Arrow cell-assignment UDF otherwise executes
    # once PER SIDE (py_boundary sweep flagged ×6 ArrowEvalPython for
    # dedup_semantic); the lazy checkpoint runs it once.
    assigned = assigned.localCheckpoint(eager=False)
    a = assigned.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "cell"
    )
    b = assigned.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "cell"
    )
    removed = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .where(F.col("cos") >= tau)
        .select(F.col("id_b").alias("rid"))
        .distinct()
    )
    return df.select(F.col(id_col)).join(
        removed, df[id_col] == F.col("rid"), "left"
    ).select(F.col(id_col), F.col("rid").isNull().alias("kept"))


def incremental_jaccard_probe(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    tau: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Incremental near-dup detection: probe a NEW batch of documents
    against a standing corpus index — the daily-increment pattern
    that makes dedup tractable at 100 TB (cost ∝ |batch|·overlap, and
    the corpus shingle index is built once and reused; a full
    re-dedup of corpus ∪ batch re-pays the corpus² candidate join on
    every increment).

    Candidates come from the shingle inverted index (batch shingles
    join corpus shingles — no batch×batch and no corpus×corpus pairs
    are ever formed); exact Jaccard is computed from the candidate
    overlap counts. ``max_df`` drops hot INDEX shingles before the
    probe join (a tiny hot-shingle list, broadcast anti-join); doc
    set sizes stay FULL on both sides, so a triggered guard only
    under-counts the overlap — conservative, exact when no shingle
    exceeds it.

    Plan shape (no window functions — each stat is a groupBy with
    map-side combine): sizes join AFTER the pair aggregation, so the
    per-shingle rows never carry per-doc state and the size joins run
    on the candidate-pair table, which is orders of magnitude smaller
    than the shingle stream.

    Returns ``(batch_id, match_id, jaccard)`` for every batch doc ×
    corpus doc pair with Jaccard ≥ tau.
    """
    csh = shingles(corpus, id_col, text_col, n).persist()
    try:
        sizes_c = csh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_c"))
        idx = csh
        if max_df is not None:
            hot = (
                csh.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") > max_df)
                .select("shingle")
            )
            idx = csh.join(F.broadcast(hot), "shingle", "left_anti")
        bsh = shingles(batch, id_col, text_col, n).persist()
        try:
            sizes_b = bsh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_b"))
            common = (
                bsh.select(F.col(id_col).alias("batch_id"), "shingle")
                .join(idx.select(F.col(id_col).alias("match_id"), "shingle"), "shingle")
                .groupBy("batch_id", "match_id")
                .agg(F.count(F.lit(1)).alias("n_common"))
            )
            paired = common.join(
                sizes_b.select(F.col(id_col).alias("batch_id"), "n_b"), "batch_id"
            ).join(sizes_c.select(F.col(id_col).alias("match_id"), "n_c"), "match_id")
            jac = paired.withColumn(
                "jaccard",
                F.col("n_common").cast("double")
                / (F.col("n_b") + F.col("n_c") - F.col("n_common")).cast("double"),
            )
            out = jac.where(F.col("jaccard") >= tau).select(
                "batch_id", "match_id", F.round("jaccard", 6).alias("jaccard")
            )
            # gate-time execution must not recompute the shingle
            # lineage after unpersist (CLAUDE.md r4 rule)
            return out.localCheckpoint(eager=True)
        finally:
            bsh.unpersist()
    finally:
        csh.unpersist()
