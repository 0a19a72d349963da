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
) -> DataFrame:
    """IVF approximate top-k: corpus partitioned into ncells Voronoi
    cells; each query probes its nprobe nearest cells; exact cosine
    rerank inside the probed cells only. The inverted-file analogue
    of FAISS IndexIVFFlat, as one bucket join — candidates shuffle on
    ``cell``, never across cells."""
    qid = query_id_col or id_col
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
