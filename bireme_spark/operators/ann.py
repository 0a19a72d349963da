"""Approximate-nearest-neighbor search over embedding columns.

- ``bruteforce_topk`` — exact top-k cosine: broadcast the (small)
  query set against the corpus scan; one linear pass, per-query heap
  via window rank. At 100 TB the corpus side stays partitioned and
  is read once; no shuffle of the corpus.
- ``lsh_topk`` — scale path: L random-hyperplane hash tables of m
  bits each; corpus and queries bucket by (table, signature); the
  candidate join happens only inside buckets; candidates are
  reranked with the exact cosine. Recall is property-tested against
  brute force (tests/test_ann.py) instead of a SQL oracle — bucket
  membership is hash-seed-dependent.

Hyperplanes are deterministic (seeded RNG) literal arrays — tiny
(L·m·dim doubles), shipped in the plan itself, no side files.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def _dot(x, y):
    """Deterministic left-to-right dot fold (same arithmetic as
    operators.dedup.cosine's inner fold)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def bruteforce_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors (excluding self) per query row."""
    qid = query_id_col or id_col
    # Precompute each side's norm ONCE per row (2 folds per corpus row
    # + 2 per query row) instead of per pair (3 folds/pair) — the dot
    # fold and the division keep the exact same double arithmetic, so
    # results are bit-identical to the naive form.
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def _hyperplanes(dim: int, tables: int, bits: int, seed: int = 42) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _signatures_udf(planes: list[list[list[float]]]):
    """All per-table m-bit signatures (bit_j = sign(v · h_j)) in ONE
    Arrow-batched numpy matmul: (batch × dim) @ (dim × tables·bits).

    The earlier JVM formulation built tables·bits literal-array fold
    expressions (thousands of plan literals) — codegen compile time
    alone dominated small runs, and scalar fold math loses to BLAS at
    any batch size. The hyperplane model is tiny (tables·bits·dim
    doubles) and rides in the UDF closure."""
    from pyspark.sql.functions import pandas_udf

    H = np.asarray(planes, dtype=np.float64)  # (tables, bits, dim)
    tables, bits, dim = H.shape
    Hf = H.reshape(tables * bits, dim)
    weights = 1 << np.arange(bits, dtype=np.int64)

    @pandas_udf("array<bigint>")
    def sigs(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        B = (M @ Hf.T) >= 0  # (n, tables*bits)
        S = (B.reshape(len(M), tables, bits) * weights).sum(axis=2)  # (n, tables)
        return pd.Series(list(S))

    return sigs


def lsh_bucketed(
    df: DataFrame, id_col: str, vec_col: str, dim: int, tables: int, bits: int, seed: int = 42
) -> DataFrame:
    """One row per (id, table, signature) — the bucket assignment."""
    planes = _hyperplanes(dim, tables, bits, seed)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        F.posexplode(_signatures_udf(planes)(F.col(vec_col))).alias("table_id", "bucket"),
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    tables: int = 8,
    bits: int = 6,
    seed: int = 42,
    query_id_col: str | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates from shared (table, bucket),
    exact cosine rerank, per-query rank window.

    ``multiprobe``: the query side also probes every bucket at
    Hamming distance 1 from its signature (bits+1 probes per table).
    The corpus keeps exactly one bucket per table, so the index size
    is unchanged — multi-probe boosts recall by ~2-4× at the cost of
    a slightly wider candidate join, the standard trade at scale."""
    qid = query_id_col or id_col
    # Norms ride along as one double per row — 3× less fold math per
    # candidate pair than recomputing both norms inside the rerank,
    # and 64× smaller than the vector they summarize.
    cb = lsh_bucketed(corpus, id_col, vec_col, dim, tables, bits, seed).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
        "table_id",
        "bucket",
    )
    qb = lsh_bucketed(queries, qid, vec_col, dim, tables, bits, seed).select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
        "table_id",
        "bucket",
    )
    if multiprobe:
        probes = F.array(
            F.col("bucket"), *[F.col("bucket").bitwiseXOR(F.lit(1 << j)) for j in range(bits)]
        )
        qb = qb.select(
            "query_id", "qv", "qn", "table_id", F.explode(probes).alias("bucket")
        )
    cand = (
        cb.join(qb, ["table_id", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def knn_graph(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    tables: int = 8,
    bits: int = 6,
    seed: int = 42,
    mutual: bool = False,
) -> DataFrame:
    """Approximate k-NN graph over the WHOLE corpus — every vector is
    simultaneously query and neighbor (the structure clustering,
    SemDeDup-style cell refinement, and diversity sampling consume).
    The self-join sibling of :func:`lsh_topk`:

    - candidates are id pairs sharing any (table, bucket) — an
      ID-ONLY bucket self-join; vectors and norms join back after the
      pair distinct, so the wide rows never enter the candidate
      shuffle (same discipline as the dedup LSH operators);
    - exact cosine rerank, so every emitted edge weight is exact;
      recall is the LSH collision probability and positive scalar
      multiples collide deterministically (property-tested);
    - per-node top-k by rank window (never a global sort).

    ``mutual=True`` keeps only edges present in BOTH directions (the
    mutual-kNN graph) via a self semi-join on the reversed edge.

    Scale: Σ bucket² candidate cost like every LSH op here — no
    cartesian; the rank window shuffles on ``src`` only.
    """
    # Persisted: both sides of the bucket self-join scan the bucket
    # assignment (different aliases defeat ReuseExchange), and without
    # the cache the Pandas-UDF signature matmul — a full corpus pass —
    # runs once PER SIDE. Same discipline as ngram_jaccard_pairs'
    # joinable handle.
    bk = (
        lsh_bucketed(corpus, id_col, vec_col, dim, tables, bits, seed)
        .select(F.col(id_col), "table_id", "bucket")
        .persist()
    )
    a = bk.select(F.col(id_col).alias("src"), "table_id", "bucket")
    b = bk.select(F.col(id_col).alias("dst"), "table_id", "bucket")
    cand = (
        a.join(b, ["table_id", "bucket"])
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    vec = corpus.select(
        F.col(id_col).alias("_vid"),
        F.col(vec_col).alias("_v"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_n"),
    ).persist()  # scanned by both the src and dst join-backs
    scored = (
        cand.join(vec.select(F.col("_vid").alias("src"), F.col("_v").alias("sv"), F.col("_n").alias("sn")), "src")
        .join(vec.select(F.col("_vid").alias("dst"), F.col("_v").alias("dv"), F.col("_n").alias("dn")), "dst")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("sv"), F.col("dv")) / (F.col("sn") * F.col("dn")), 6),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("cosine"), F.asc("dst"))
    edges = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("src", "dst", "rank", "cosine")
    )
    handles = [bk, vec]
    if mutual:
        # persist before the semi-join: rev re-reads the full edge
        # pipeline otherwise (candidate join + rerank + window, twice)
        edges = edges.persist()
        handles.append(edges)
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        edges = edges.join(rev, ["src", "dst"], "left_semi")
    from bireme_spark.operators.dedup import _attach_persisted

    return _attach_persisted(edges, handles)


def _collect_centroids(df: DataFrame, vec_col: str, cell_col: str, ncells: int, dim: int):
    """cell → mean vector, computed distributed (posexplode + groupBy
    — no driver math); only the ncells×dim model comes back."""
    means = (
        df.select(F.col(cell_col), F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy(cell_col, "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy(cell_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(cell_col, F.col("pm.m").alias("centroid"))
        .collect()
    )
    cents = [[0.0] * dim for _ in range(ncells)]
    for row in means:
        cents[row[cell_col]] = list(row["centroid"])
    return cents


def ivf_index(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    ncells: int = 16,
    refine_iters: int = 1,
):
    """IVF index build: deterministic seeds (the ncells lowest-id
    vectors) + ``refine_iters`` distributed Lloyd passes. Returns
    (centroids, assigned) where ``assigned`` adds a ``cell`` column.

    Scale: assignment is one Arrow-batched numpy matmul per batch
    (vectorized Pandas UDF); each Lloyd pass is one shuffle of
    (cell, pos) partial sums. The centroid model (ncells×dim floats)
    is the ONLY thing collected — it rides back out in the UDF
    closure, an explicit tiny broadcast.
    """
    seeds = corpus.orderBy(id_col).limit(ncells).select(vec_col).collect()
    cents = [list(r[vec_col]) for r in seeds]

    for it in range(refine_iters + 1):
        assigned = corpus.withColumn("cell", _nearest_cell_udf(cents)(F.col(vec_col)))
        if it == refine_iters:
            return cents, assigned
        cents = _collect_centroids(assigned, vec_col, "cell", ncells, dim)


def _nearest_cell_udf(centroids):
    """Vectorized nearest-centroid (cosine) assignment."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype("int32"))

    return assign


def _probe_cells_udf(centroids, nprobe: int):
    """Vectorized top-nprobe nearest cells per query vector."""
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy())
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ C.T
        top = np.argsort(-sims, axis=1)[:, :nprobe].astype("int32")
        return pd.Series(list(top))

    return probe


def ivf_incremental_add(
    centroids,
    assigned: DataFrame,
    batch: DataFrame,
    vec_col: str,
):
    """Fold an ingest batch into a STANDING IVF index without a
    rebuild — the FAISS ``IndexIVF.add`` contract, the operation a
    production vector store performs on every ingest: the batch
    vectors assign to the EXISTING centroid model (one Arrow-batched
    numpy matmul over |batch| rows — work is |batch|-proportional,
    corpus-independent) and union into the inverted lists. The
    centroid model is frozen: searching the incremental index is
    IDENTICAL to assigning the union corpus from scratch under the
    same model (tested exactly), and its recall tracks a full
    retrain to within the Lloyd-refinement margin (property-tested).

    Returns ``(centroids, assigned ∪ batch-assignments)``. Drift
    policy is the caller's: re-run ``ivf_index`` when the batch
    fraction grows past a rebuild threshold (the same cadence FAISS
    deployments retrain their coarse quantizer)."""
    new = batch.withColumn("cell", _nearest_cell_udf(centroids)(F.col(vec_col)))
    return centroids, assigned.unionByName(new)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    ncells: int = 16,
    nprobe: int = 4,
    query_id_col: str | None = None,
    index=None,
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into ncells Voronoi
    cells; each query probes its nprobe nearest cells; exact cosine
    rerank inside the probed cells only. The inverted-file analogue
    of FAISS IndexIVFFlat, as one bucket join — candidates shuffle on
    ``cell``, never across cells.

    ``index``: a prebuilt ``(centroids, assigned)`` pair (from
    ``ivf_index`` / ``ivf_incremental_add``) to search instead of
    building from ``corpus`` — the standing-index reuse path."""
    qid = query_id_col or id_col
    if index is not None:
        cents, assigned = index
    else:
        cents, assigned = ivf_index(corpus, id_col, vec_col, dim, ncells)
    cb = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
        "cell",
    )
    qb = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
        F.explode(_probe_cells_udf(cents, nprobe)(F.col(vec_col))).alias("cell"),
    )
    cand = (
        cb.join(qb, "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine",
        F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


# ---------------------------------------------------------------- PQ


def pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    m: int = 8,
    ksub: int = 16,
    refine_iters: int = 1,
):
    """Product-quantization codebooks (FAISS IndexPQ twin): the vector
    is split into ``m`` subspaces of dim/m; each subspace gets its own
    ksub-centroid k-means codebook.

    Training mirrors :func:`ivf_index`: deterministic seeds (the ksub
    lowest-id rows' subvectors), then ``refine_iters`` distributed
    Lloyd passes — assignment is one Arrow-batched numpy pass per
    batch computing ALL m codes at once, the centroid update is one
    (sub, code, pos) partial-mean shuffle. Only the m×ksub×(dim/m)
    codebook (== dim×ksub floats, ~4 KB here) crosses the driver.

    Vectors are L2-normalized before encoding, so ADC inner products
    approximate cosine directly.
    """
    dsub = dim // m
    seeds = corpus.orderBy(id_col).limit(ksub).select(vec_col).collect()

    def _norm(v):
        a = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(a)
        return a / n if n > 0 else a

    sv = np.stack([_norm(r[vec_col]) for r in seeds])  # (ksub, dim)
    books = np.stack([sv[:, s * dsub : (s + 1) * dsub] for s in range(m)])  # (m, ksub, dsub)

    # norm projected to a named column FIRST — inlining the fold in the
    # transform lambda would re-evaluate it once per element
    normed = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_n"),
    ).select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("_n")).alias("nv"),
    )

    for _ in range(refine_iters):
        coded = normed.withColumn("codes", _pq_codes_udf(books)(F.col("nv")))
        means = (
            coded.select("codes", F.posexplode("nv").alias("pos", "x"))
            .withColumn("sub", (F.col("pos") / dsub).cast("int"))
            .withColumn("code", F.element_at("codes", F.col("sub") + 1))
            .groupBy("sub", "code", F.col("pos").alias("p"))
            .agg(F.avg("x").alias("mval"))
            .collect()
        )
        for row in means:
            books[row["sub"], row["code"], row["p"] - row["sub"] * dsub] = row["mval"]
    return books, normed


def _pq_codes_udf(books):
    """All m subspace codes per vector in one Arrow batch: for each
    subspace s, argmin_j ||x_s − c_{s,j}||²."""
    from pyspark.sql.functions import pandas_udf

    B = np.asarray(books, dtype=np.float64)  # (m, ksub, dsub)
    m, ksub, dsub = B.shape
    Bsq = (B * B).sum(axis=2)  # (m, ksub)

    @pandas_udf("array<int>")
    def codes(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64).reshape(len(v), m, dsub)
        # ||x−c||² = ||x||² − 2x·c + ||c||²; ||x||² is constant per argmin
        out = np.empty((len(v), m), dtype=np.int32)
        for s in range(m):
            d = Bsq[s][None, :] - 2.0 * (X[:, s, :] @ B[s].T)
            out[:, s] = np.argmin(d, axis=1)
        return pd.Series(list(out))

    return codes


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 4,
    query_id_col: str | None = None,
) -> DataFrame:
    """PQ approximate top-k with exact rerank.

    Scale shape: the corpus is scanned ONCE as m-byte codes (32×
    smaller than the float vectors — at 100 TB the code table is the
    only thing re-read per query wave). ADC scoring runs inside
    mapInPandas: per Arrow batch, scores for all queries are ONE
    numpy gather over the per-query lookup tables (built driver-side
    from the tiny query set — same contract as bruteforce's broadcast
    query side), and only each batch's per-query top-(rerank·k)
    survive, so the shuffle after the scan carries candidate IDs, not
    vectors, and is bounded by batches × queries × rerank·k rows.
    Candidates then join back to the corpus for the exact cosine and
    a final per-query rank window — emitted scores are exact; PQ only
    decides WHICH pairs get the exact math (same structure as
    lsh_topk / embedding_cosine_pairs_lsh).
    """
    qid = query_id_col or id_col
    books, normed = pq_train(corpus, id_col, vec_col, dim, m=m, ksub=ksub)
    coded = normed.withColumn("codes", _pq_codes_udf(books)(F.col("nv"))).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )

    qrows = queries.select(F.col(qid).alias("qid"), F.col(vec_col).alias("qv")).collect()
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    Q = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    dsub = dim // m
    B = np.asarray(books, dtype=np.float64)
    # LUT[q, s, j] = q_s · c_{s,j}  → ADC score = Σ_s LUT[q, s, code_s]
    LUT = np.einsum("qsd,sjd->qsj", Q.reshape(len(Q), m, dsub), B)
    keep = rerank * k

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (n, m)
            ids = pdf["neighbor_id"].to_numpy()
            # (nq, n): one LUT gather per subspace
            scores = np.zeros((len(qids), len(ids)), dtype=np.float64)
            for s in range(m):
                scores += LUT[:, s, codes[:, s]]
            nkeep = min(keep, scores.shape[1])
            top = np.argpartition(-scores, nkeep - 1, axis=1)[:, :nkeep]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, nkeep),
                    "neighbor_id": ids[top].ravel(),
                }
            )

    cand = (
        coded.mapInPandas(gen, schema="query_id long, neighbor_id long")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .distinct()
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    )
    qv = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    )
    scored = (
        cand.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine")
    )


def nsw_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int = 5,
    k_graph: int = 16,
    beam: int = 16,
    hops: int = 2,
    entry_points: int = 8,
    tables: int = 12,
    bits: int = 5,
    seed: int = 42,
    query_id_col: str | None = None,
) -> DataFrame:
    """HNSW-family graph-index search, distributed: a single-layer
    navigable-small-world index (the undirected k-NN graph — HNSW's
    layer 0, Malkov & Yashunin 2016) searched by BULK beam expansion
    instead of the paper's sequential greedy walk.

    The sequential HNSW descent is driver-side by construction; the
    Spark-first equivalent runs ALL queries' walks at once as ``hops``
    rounds of set-at-a-time BSP:

    1. index = bidirectional kNN edges (``knn_graph``: LSH-seeded
       candidates, exact cosine rerank) — built once, reused across
       every hop (persisted);
    2. every query starts from the same ``entry_points`` fixed entry
       nodes (deterministic md5-order sample — the HNSW entry point,
       widened to E seeds) scored exactly;
    3. each hop joins the current per-query beam to the adjacency
       list, anti-joins nodes already scored, scores ONLY the new
       frontier (vector join + broadcast query vectors), and keeps
       the per-query top-``beam`` — the paper's ef-search candidate
       heap as a rank window;
    4. final answer = top-``k`` of everything scored, self excluded.

    Every emitted cosine is exact (the graph only routes). Rows-only
    for the driver (edges depend on LSH seeds); recall ≥ the IVF/LSH
    bars by construction is property-tested against brute force.

    Scale: per hop the frontier is Q·beam·k_graph id pairs — the only
    wide state is the (id, vec) join against the corpus, hash-join on
    id, no cartesian anywhere; the adjacency persist is O(N·k_graph)
    ids. Hop count bounds plan depth (no unbounded iteration), and
    each hop's shuffle keys are query_id/node ids, never vectors.
    """
    qid = query_id_col or id_col
    # --- index build: undirected layer-0 graph ---
    knn = knn_graph(corpus, id_col, vec_col, dim, k=k_graph, tables=tables, bits=bits, seed=seed)
    fwd = knn.select("src", "dst")
    adj = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct().persist()
    adj.count()  # materialize the adjacency WHILE the knn-graph
    # handles are still cached — releasing them first would recompute
    # the whole LSH+rerank lineage into the adj cache at first action
    from bireme_spark.operators.dedup import release_persisted

    release_persisted(knn)

    qv = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("node"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    ).persist()  # scored against every hop's frontier

    def _score(cand: DataFrame) -> DataFrame:
        return (
            cand.join(cv, "node")
            .join(F.broadcast(qv), "query_id")
            .withColumn(
                "cosine",
                F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
            )
            .select("query_id", "node", "cosine")
        )

    # --- fixed entry nodes: E smallest md5(id) (seeded by suffixing
    # the seed so a different seed reseats the entries) ---
    entries = (
        corpus.select(F.col(id_col).alias("node"))
        .withColumn("__h", F.md5(F.concat_ws("|", F.col("node"), F.lit(seed))))
        .orderBy("__h")
        .limit(entry_points)
        .drop("__h")
    )
    seeds = qv.select("query_id").crossJoin(F.broadcast(entries))
    if query_id_col is None:
        # in-corpus queries (the ann_* registry shape): the walk ALSO
        # starts at the query's own graph node — the standard warm
        # start when the query is an index member; its self score is
        # excluded from the final answer but routes hop 1 straight
        # into the node's true kNN edges.
        seeds = seeds.unionByName(
            qv.select("query_id", F.col("query_id").alias("node"))
        )
    scored = _score(seeds.distinct()).persist()
    handles = [adj, cv, scored]

    wbeam = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("node"))
    for _ in range(hops):
        beam_df = (
            scored.withColumn("__r", F.row_number().over(wbeam))
            .where(F.col("__r") <= beam)
            .select("query_id", "node")
        )
        frontier = (
            beam_df.join(adj, beam_df.node == adj.src)
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(scored.select("query_id", "node"), ["query_id", "node"], "left_anti")
        )
        scored = scored.unionByName(_score(frontier)).persist()
        handles.append(scored)

    # self-exclusion only applies to in-corpus queries: with an
    # external query_id_col the query-id and corpus-id namespaces are
    # unrelated, and an id-equal legitimate neighbor must NOT drop
    if query_id_col is None:
        scored = scored.where(F.col("node") != F.col("query_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(wbeam))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", F.col("node").alias("neighbor_id"), "cosine")
    )
    from bireme_spark.operators.dedup import _attach_persisted

    return _attach_persisted(out, handles)


def filtered_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    filter_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors per query among corpus rows whose
    ``filter_col`` EQUALS the query's — metadata-filtered vector
    search (the vector-store staple: "nearest docs with lang = query
    lang / tenant = query tenant").

    Strategy is PRE-filter: the predicate joins INTO the candidate
    formation (a hash join on ``filter_col``), so only same-bucket
    pairs are ever scored — post-filtering a global top-k instead
    would silently return < k rows whenever the filter is selective
    (the classic recall bug). With q broadcast this is a
    BroadcastHashJoin keyed on the filter column: the corpus never
    shuffles, and per-query work is |bucket|, not |corpus|.

    Same scoring discipline as :func:`bruteforce_topk` (per-row norm
    precompute, float→double casts inside the dot fold, ROUND 6)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(filter_col).alias("qf"),
        F.col(vec_col).alias("qv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(filter_col).alias("cf"),
        F.col(vec_col).alias("cv"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("cf") == F.col("qf"))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("qf").alias("filter_value"), "rank", "neighbor_id", "cosine")
    )
