"""Embedding-column utility ops (SURVEY.md §2.C): L2 stats + int8
quantization — the compression pass an embedding store runs before
ANN serving (scalar quantization a la FAISS SQ8: per-vector scale =
max|x|/127, codes = round(x/scale)).

All math is JVM higher-order expressions over the array column
(transform / zip_with / aggregate) — no UDF, no shuffle; the plan is
a pure scan→project that scales linearly. Sums fold sequentially in
array order on both engines (F.aggregate ↔ list_reduce), so doubles
are bit-identical and the oracle hash-matches.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints under PEP 563

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.sources.tables import load_table


def _fold_sum(arr):
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # each stage's scalar is projected to a named column before the
    # next lambda uses it (never recomputed per array element)
    t = e.select(
        "vec_id",
        "embedding",
        _fold_sum(
            F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double"))
        ).alias("sq"),
        F.aggregate(
            F.col("embedding"),
            F.lit(0.0),
            lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
        ).alias("mx"),
    )
    s = t.select(
        "vec_id",
        "embedding",
        "sq",
        (F.greatest(F.col("mx"), F.lit(1e-12)) / F.lit(127.0)).alias("scale"),
    )
    q = s.withColumn(
        "q",
        F.transform(
            F.col("embedding"),
            lambda x: F.round(x.cast("double") / F.col("scale")).cast("int"),
        ),
    )
    err = q.withColumn(
        "err",
        _fold_sum(
            F.zip_with(
                F.col("embedding"),
                F.col("q"),
                lambda x, qi: (x.cast("double") - qi.cast("double") * F.col("scale"))
                * (x.cast("double") - qi.cast("double") * F.col("scale")),
            )
        ),
    )
    return err.select(
        "vec_id",
        F.round(F.sqrt("sq"), 6).alias("l2_norm"),
        F.round("scale", 9).alias("q_scale"),
        F.aggregate(
            F.col("q"), F.lit(0).cast("bigint"), lambda a, x: a + x.cast("bigint")
        ).alias("q_checksum"),
        F.round(F.sqrt("err") / F.sqrt("sq"), 6).alias("recon_rel_err"),
    )


EMBEDDING_QUANTIZE_SQL = """
WITH t AS (
  SELECT vec_id, embedding,
         list_reduce(list_prepend(0.0,
           list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
           (a, x) -> a + x) AS sq,
         list_reduce(list_prepend(0.0,
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))),
           (a, x) -> greatest(a, x)) AS mx
  FROM embeddings
), s AS (
  SELECT vec_id, embedding, sq, greatest(mx, 1e-12) / 127.0 AS scale FROM t
), qz AS (
  SELECT vec_id, embedding, sq, scale,
         list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) / scale) AS INTEGER)) AS q
  FROM s
), e AS (
  SELECT vec_id, sq, scale, q,
         list_reduce(list_prepend(0.0,
           list_transform(list_zip(embedding, q),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale)
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE) * scale))),
           (a, x) -> a + x) AS err
  FROM qz
)
SELECT vec_id,
       ROUND(sqrt(sq), 6) AS l2_norm,
       ROUND(scale, 9) AS q_scale,
       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
              list_transform(q, x -> CAST(x AS BIGINT))), (a, x) -> a + x)
            AS BIGINT) AS q_checksum,
       ROUND(sqrt(err) / sqrt(sq), 6) AS recon_rel_err
FROM e
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid in long (label, pos, value) form — the
    class-prototype computation behind IVF seeding, label-balanced
    sampling and embedding-drift monitoring.

    posexplode fans each vector into dim rows MAP-SIDE (no shuffle),
    then one hash aggregation on (label, pos) with partial map-side
    combine does the whole reduction — the classic long-format vector
    mean, linear in corpus size and embarrassingly parallel over
    input partitions. Long output (not re-assembled arrays) keeps the
    result directly comparable and joinable."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(F.col("x").cast("double")), 6).alias("centroid"),
        )
        .orderBy("label", "pos")
    )


EMBEDDING_CENTROIDS_SQL = """
WITH flat AS (
  SELECT label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
)
SELECT label, pos, COUNT(*) AS n, ROUND(AVG(x), 6) AS centroid
FROM flat GROUP BY 1, 2 ORDER BY 1, 2
"""


QUERIES = {
    "embedding_quantize": embedding_quantize,
    "embedding_centroids": embedding_centroids,
}
ORACLE = {
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
    "embedding_centroids": EMBEDDING_CENTROIDS_SQL,
}


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance of the embedding dimensions — the input
    every linear compressor (PCA/OPQ rotation) starts from. Upper
    triangle only: (i, j, cov) for i ≤ j.

    Plan: posexplode each vector once, self-pair the (row, pos, x)
    stream per row via a join on vec_id restricted to pos_i ≤ pos_j,
    then ONE hash aggregation keyed by (pos_i, pos_j) — d²/2 cells
    regardless of corpus size, with map-side partial combine. Sums
    are DECIMAL-exact so the result is shuffle-order-independent and
    the DuckDB oracle hash-matches bit-for-bit. At 100 TB this is the
    textbook gram-matrix pattern: the only thing that crosses the
    network is d²/2 partial sums per task."""
    from bireme_spark.functions.money import dsum

    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id", "pos", F.col("x").cast("decimal(18,9)").alias("x")
    )
    a = ex.select("vec_id", F.col("pos").alias("pos_i"), F.col("x").alias("xi"))
    b = ex.select("vec_id", F.col("pos").alias("pos_j"), F.col("x").alias("xj"))
    pairs = a.join(b, "vec_id").where(F.col("pos_i") <= F.col("pos_j"))
    n = e.count()
    stats = pairs.groupBy("pos_i", "pos_j").agg(
        F.sum(F.col("xi") * F.col("xj")).alias("sxy"),
        F.sum("xi").alias("sx"),
        F.sum("xj").alias("sy"),
    )
    cov = (
        (F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double") / n)
        / (n - 1)
    )
    return stats.select(
        "pos_i", "pos_j", F.round(cov, 9).alias("cov")
    ).orderBy("pos_i", "pos_j")


EMBEDDING_COVARIANCE_SQL = """
WITH ex AS (
  SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DECIMAL(18,9)) AS x
  FROM embeddings, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
), n AS (SELECT COUNT(*) AS n FROM embeddings),
stats AS (
  SELECT a.pos AS pos_i, b.pos AS pos_j,
         SUM(a.x * b.x) AS sxy, SUM(a.x) AS sx, SUM(b.x) AS sy
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.pos <= b.pos
  GROUP BY 1, 2
)
SELECT pos_i, pos_j,
       ROUND((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n.n)
             / (n.n - 1), 9) AS cov
FROM stats, n
ORDER BY 1, 2
"""

QUERIES["embedding_covariance"] = embedding_covariance
ORACLE["embedding_covariance"] = EMBEDDING_COVARIANCE_SQL


def embedding_pca_spectrum(spark: SparkSession, sf_dir: str, top: int = 16):
    """The (eigenvalues, C) pair: distributed DECIMAL-exact covariance
    → driver-side eigensolve on the d×d model. The user surface for
    the spectrum; the gate entry below audits its invariants."""
    import numpy as np

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    d = max(r["pos_j"] for r in cov_rows) + 1
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["pos_i"], r["pos_j"]] = r["cov"]
        C[r["pos_j"], r["pos_i"]] = r["cov"]
    ev = np.linalg.eigvalsh(C)[::-1]
    return ev, C


def embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA spectrum audit (VERDICT r9 item 8 — converted from
    rows-only): the eigensolve is driver-side LAPACK whose rounding
    no SQL oracle reproduces, but its INVARIANTS are checkable — the
    gate row carries the data-derived dim (oracle recomputes from the
    table) plus planted-TRUE spectrum invariants: Σλ == trace(C)
    (LAPACK consistency vs the distributed DECIMAL-exact covariance,
    rel. tol 1e-9), PSD (min λ ≥ −1e-9·trace), non-increasing order,
    and top-16 cumulative variance ≤ 1. A covariance-assembly or
    eigensolve regression flips a boolean on the Spark side only →
    hash MISMATCH. The spectrum itself: ``embedding_pca_spectrum``.

    Scale: unchanged — d²/2 covariance cells cross the driver, the
    corpus never does."""
    import numpy as np

    ev, C = embedding_pca_spectrum(spark, sf_dir)
    d = C.shape[0]
    total = float(ev.sum())
    trace = float(np.trace(C))
    tol = 1e-9 * abs(trace)
    rows = [
        (
            d,
            16,
            bool(abs(total - trace) <= tol),
            bool(float(ev.min()) >= -tol),
            bool(all(ev[i] >= ev[i + 1] - tol for i in range(len(ev) - 1))),
            bool(float(ev[:16].sum()) <= total + tol),
        )
    ]
    return spark.createDataFrame(
        rows,
        "dim int, n_components int, eigsum_matches_trace boolean, "
        "psd boolean, spectrum_nonincreasing boolean, cum_var_le_one boolean",
    )


EMBEDDING_PCA_SQL = """
SELECT CAST(len(embedding) AS INTEGER) AS dim,
       CAST(16 AS INTEGER) AS n_components,
       TRUE AS eigsum_matches_trace,
       TRUE AS psd,
       TRUE AS spectrum_nonincreasing,
       TRUE AS cum_var_le_one
FROM embeddings LIMIT 1
"""

QUERIES["embedding_pca"] = embedding_pca
ORACLE["embedding_pca"] = EMBEDDING_PCA_SQL


def embedding_pca_project(spark: SparkSession, sf_dir: str, top: int = 16) -> DataFrame:
    """Distributed PCA projection — the dimension-reduction stage a
    corpus-scale pipeline runs before ANN/clustering (64-d → 16-d at
    4× less candidate-join math, keeping ~all variance).

    Plan: the covariance is the distributed DECIMAL-exact aggregate
    (``embedding_covariance`` — only d²/2 cells shuffle); the
    eigensolve is driver-side numpy on that d×d model; the per-dim
    mean is one more tiny distributed aggregate (d cells); then the
    (d×top) basis + mean ride in a Pandas-UDF closure and EVERY
    vector maps to its PCA coordinates in one Arrow-batched BLAS
    matmul pass — no shuffle at all on the projection itself, at any
    corpus size. Rows-only for the driver (eigenvector sign and
    LAPACK rounding are not SQL-reproducible); the projection's
    variance spectrum is property-tested against the eigenvalues
    (tests/test_embeddings.py).

    Output is ``(vec_id, pc, value)`` scalar rows — every rows-only
    query must stay sortable under the driver's pandas canonicalizer
    (r4 gate crash on ``array<double>``: unhashable list). Use
    ``pca_project_vectors`` for the array-column form."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    d = max(r["pos_j"] for r in cov_rows) + 1
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["pos_i"], r["pos_j"]] = r["cov"]
        C[r["pos_j"], r["pos_i"]] = r["cov"]
    _, V = np.linalg.eigh(C)  # ascending eigenvalues
    W = V[:, ::-1][:, :top]  # (d, top) principal basis

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    mu = np.zeros(d)
    for r in (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    ):
        mu[r["pos"]] = r["m"]

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(list((M - mu) @ W))

    corpus = e.repartition(spark.sparkContext.defaultParallelism)
    return corpus.select("vec_id", proj("embedding").alias("pca")).orderBy("vec_id")


# Array-column form for in-pipeline composition (ANN over reduced
# vectors) and the spectrum property tests.
pca_project_vectors = embedding_pca_project


def embedding_pca_project_flat(spark: SparkSession, sf_dir: str, top: int = 16) -> DataFrame:
    """Driver-gate wrapper: explode the projection to scalar
    ``(vec_id, pc, value)`` rows, 6dp-rounded, so pandas
    ``sort_values`` over every column works (no array columns)."""
    return (
        pca_project_vectors(spark, sf_dir, top)
        .select("vec_id", F.posexplode("pca").alias("pc", "v"))
        .select("vec_id", "pc", F.round(F.col("v"), 6).alias("value"))
        .orderBy("vec_id", "pc")
    )


QUERIES["embedding_pca_project"] = embedding_pca_project_flat


_TRUNC_DIM = 16
_TRUNC_K = 10
_TRUNC_QUERIES = 10


def embedding_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation evaluation (Kusupati et al.
    2205.13147): how much of the EXACT cosine top-10 neighborhood
    survives when vectors are truncated to their first 16 dims —
    the measurement behind shipping shorter embeddings for cheaper
    ANN. Per probe query: overlap@10 between the full-dim and the
    truncated-dim exact top-k sets.

    Exactness: both sides are brute-force with 6dp-rounded cosines
    and id tie-breaks, so both neighbor SETS are engine-identical
    and the overlap is an integer — no recall ambiguity.

    Scale: two broadcast-query brute-force passes (only the probe
    set broadcasts; the corpus never shuffles) + a |queries|·k join
    on the id pairs."""
    from bireme_spark.operators.ann import bruteforce_topk

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.repartition(spark.sparkContext.defaultParallelism)
    q = e.where(F.col("vec_id") < _TRUNC_QUERIES)
    full = bruteforce_topk(corpus, q, "vec_id", "embedding", k=_TRUNC_K)
    tr = F.slice(F.col("embedding"), 1, _TRUNC_DIM).alias("embedding")
    trunc = bruteforce_topk(
        corpus.select("vec_id", tr), q.select("vec_id", tr), "vec_id", "embedding", k=_TRUNC_K
    )
    common = (
        full.select("query_id", "neighbor_id")
        .join(trunc.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    # probe ids come from q, NOT full.distinct(): referencing the
    # full brute-force subtree twice would run the corpus-sized
    # crossJoin+rank pass twice (every probe has ≥1 full-dim
    # neighbor whenever the corpus has >1 row, so the sets coincide)
    return (
        q.select(F.col("vec_id").alias("query_id"))
        .join(common, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_common", F.lit(0)).cast("bigint").alias("n_common"),
            F.round(F.coalesce("n_common", F.lit(0)) / F.lit(float(_TRUNC_K)), 6).alias(
                "overlap_at_k"
            ),
        )
        .orderBy("query_id")
    )


def _bruteforce_cte(tag: str, vec_expr: str) -> str:
    return f"""
pairs_{tag} AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {vec_expr.replace('VV', 'q.qv')} AS qv,
         {vec_expr.replace('VV', 'e.embedding')} AS cv
  FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        WHERE vec_id < {_TRUNC_QUERIES}) q,
       embeddings e
  WHERE e.vec_id <> q.query_id
),
dots_{tag} AS (
  SELECT query_id, neighbor_id,
         SUM(x * y) AS dot, SUM(x * x) AS nq, SUM(y * y) AS nc
  FROM (SELECT query_id, neighbor_id,
               CAST(unnest(qv) AS DOUBLE) AS x,
               CAST(unnest(cv) AS DOUBLE) AS y
        FROM pairs_{tag}) z
  GROUP BY query_id, neighbor_id
),
topk_{tag} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) DESC, neighbor_id ASC
           ) AS rank
    FROM dots_{tag}
  ) WHERE rank <= {_TRUNC_K}
)"""


EMBEDDING_TRUNCATION_SQL = f"""
WITH {_bruteforce_cte("full", "VV")},
{_bruteforce_cte("tr", f"VV[1:{_TRUNC_DIM}]").lstrip()},
common AS (
  SELECT f.query_id, COUNT(*) AS n_common
  FROM topk_full f JOIN topk_tr t
    ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
  GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(c.n_common, 0) AS BIGINT) AS n_common,
       ROUND(COALESCE(c.n_common, 0) / {float(_TRUNC_K)}, 6) AS overlap_at_k
FROM (SELECT DISTINCT query_id FROM topk_full) q
LEFT JOIN common c USING (query_id)
ORDER BY q.query_id
"""

QUERIES["embedding_truncation_recall"] = embedding_truncation_recall
ORACLE["embedding_truncation_recall"] = EMBEDDING_TRUNCATION_SQL


def embedding_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit: the 3 vectors FARTHEST from their own
    label's centroid (squared L2) — the mislabeled/corrupt-embedding
    shortlist a data curator reviews.

    Scale design: the corpus fans out map-side to (vec, pos, x)
    long form ONCE; centroids reduce on (label, pos) and broadcast
    back (|labels|·dim rows); distance terms are 6dp-rounded then
    DECIMAL-summed per vector (shuffle-order-proof), and the top-3 is
    a per-label window on the |vectors|-sized distance frame. No
    vector math ever leaves the JVM.
    """
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.col("x").cast("double"))
    cent = flat.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 6).alias("c")
    )
    term = F.round(F.pow(F.col("x") - F.col("c"), F.lit(2.0)), 6).cast("decimal(18,6)")
    dist = (
        flat.join(F.broadcast(cent), ["label", "pos"])
        .select("vec_id", "label", term.alias("t"))
        .groupBy("vec_id", "label")
        .agg(F.sum("t").alias("d2"))
    )
    w = Window.partitionBy("label").orderBy(F.col("d2").desc(), "vec_id")
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "label",
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.col("d2").cast("double").alias("sq_distance"),
        )
        .orderBy("label", "rank")
    )


EMBEDDING_OUTLIERS_SQL = """
WITH flat AS (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
cent AS (
  SELECT label, pos, ROUND(AVG(x), 6) AS c FROM flat GROUP BY 1, 2
),
dist AS (
  SELECT f.vec_id, f.label,
         SUM(CAST(ROUND(POW(f.x - ct.c, 2), 6) AS DECIMAL(18,6))) AS d2
  FROM flat f JOIN cent ct ON f.label = ct.label AND f.pos = ct.pos
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY label
                                    ORDER BY d2 DESC, vec_id) AS INTEGER) AS rank
  FROM dist
)
SELECT label, rank, vec_id, CAST(d2 AS DOUBLE) AS sq_distance
FROM ranked WHERE rank <= 3
ORDER BY label, rank
"""

QUERIES["embedding_centroid_outliers"] = embedding_centroid_outliers
ORACLE["embedding_centroid_outliers"] = EMBEDDING_OUTLIERS_SQL


def _whitening_model(spark: SparkSession, sf_dir: str):
    """(eigenvalues, eigenvectors, per-dim mean, dim) shared by the
    whitening projector and its identity audit — the only pieces that
    cross the driver (d² covariance cells + d means)."""
    import numpy as np

    cov_rows = embedding_covariance(spark, sf_dir).collect()
    d = max(r["pos_j"] for r in cov_rows) + 1
    C = np.zeros((d, d))
    for r in cov_rows:
        C[r["pos_i"], r["pos_j"]] = r["cov"]
        C[r["pos_j"], r["pos_i"]] = r["cov"]
    lam, V = np.linalg.eigh(C)
    e = load_table(spark, sf_dir, "embeddings")
    mu = np.zeros(d)
    for r in (
        e.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    ):
        mu[r["pos"]] = r["m"]
    return lam, V, mu, d


def embedding_whitening_project(spark: SparkSession, sf_dir: str, top: int = 8) -> DataFrame:
    """ZCA whitening (W = V Λ^{-1/2} Vᵀ from the distributed
    covariance) — the decorrelation step before similarity training /
    linear probes: whitened features have identity covariance, so no
    direction dominates the dot products.

    Plan shape = embedding_pca_project: d² covariance cells from the
    DECIMAL-exact distributed agg, driver-side eigensolve on the d×d
    model, whitening matrix + mean ride a Pandas-UDF closure, every
    vector transforms in one Arrow-batched BLAS pass — zero shuffle
    on the transform. Output is flat (vec_id, dim, value) scalar rows
    (first ``top`` dims, 6dp) for the driver canonicalizer; identity
    covariance of the FULL whitened set is property-tested
    (tests/test_embeddings.py) AND gate-audited by the
    ``embedding_whitening`` registry entry below."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    lam, V, mu, d = _whitening_model(spark, sf_dir)
    W = (V * (1.0 / np.sqrt(np.maximum(lam, 1e-12)))) @ V.T  # ZCA

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    @pandas_udf("array<double>")
    def whiten(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        return pd.Series(list((M - mu) @ W.T))

    corpus = e.repartition(spark.sparkContext.defaultParallelism)
    return (
        corpus.select("vec_id", whiten("embedding").alias("wv"))
        .select("vec_id", F.posexplode("wv").alias("dim", "v"))
        .where(F.col("dim") < top)
        .select("vec_id", "dim", F.round(F.col("v"), 6).alias("value"))
        .orderBy("vec_id", "dim")
    )


def embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZCA whitening identity audit (VERDICT r9 item 8 — converted
    from rows-only): the whitening matrix comes from a driver-side
    eigensolve (not SQL-reproducible), but its defining property IS —
    the whitened sample covariance must be the identity. The gate row
    carries oracle-recomputable counts (dim, n_vectors) plus
    planted-TRUE invariants: max |cov_white − I| ≤ tol and whitened
    mean ≈ 0. A covariance/eigensolve/closure regression flips a
    boolean on the Spark side only → hash MISMATCH. The projected
    vectors: ``embedding_whitening_project``.

    Scale: whiten + Gram fold FUSED in one Arrow mapInPandas pass
    (r5 fusion rule) emitting one (n, Σw, ΣwwT) partial per
    partition — only partitions·(d²+d+1) doubles cross the driver,
    the corpus never shuffles."""
    import numpy as np

    lam, V, mu, d = _whitening_model(spark, sf_dir)
    W = (V * (1.0 / np.sqrt(np.maximum(lam, 1e-12)))) @ V.T  # ZCA

    e = load_table(spark, sf_dir, "embeddings").select("embedding")
    corpus = e.repartition(spark.sparkContext.defaultParallelism)

    def gram(batches):
        N = 0
        S = np.zeros(d)
        G = np.zeros((d, d))
        for pdf in batches:
            if not len(pdf):
                continue
            M = (np.stack(pdf["embedding"].to_numpy()).astype(np.float64) - mu) @ W.T
            N += M.shape[0]
            S += M.sum(axis=0)
            G += M.T @ M
        if N:
            yield pd.DataFrame(
                {"n": [N], "s": [list(S)], "g": [list(G.reshape(-1))]}
            )

    parts = corpus.mapInPandas(gram, "n long, s array<double>, g array<double>").collect()
    n = sum(r["n"] for r in parts)
    S = np.sum([np.asarray(r["s"]) for r in parts], axis=0)
    G = np.sum([np.asarray(r["g"]).reshape(d, d) for r in parts], axis=0)
    mu_w = S / n
    C_white = (G - n * np.outer(mu_w, mu_w)) / (n - 1)
    dev = float(np.abs(C_white - np.eye(d)).max())
    # tol: measured dev 3.8e-8..5.3e-8 across sf0.001/0.01/0.1/sf1
    # (lambda_min ~7e-3..1.1e-2 keeps the 9dp-covariance rounding
    # amplification tame); 1e-4 is 2000x that margin while a wrong W
    # (whitening skipped, stale mean, transposed basis) lands at
    # O(lambda_max) >> 1e-4
    TOL = 1e-4
    rows = [(d, int(n), bool(dev <= TOL), bool(float(np.abs(mu_w).max()) <= 1e-6))]
    return spark.createDataFrame(
        rows,
        "dim int, n_vectors bigint, cov_is_identity boolean, mean_centered boolean",
    )


EMBEDDING_WHITENING_SQL = """
SELECT CAST((SELECT len(embedding) FROM embeddings LIMIT 1) AS INTEGER) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vectors,
       TRUE AS cov_is_identity,
       TRUE AS mean_centered
FROM embeddings
"""

QUERIES["embedding_whitening"] = embedding_whitening
ORACLE["embedding_whitening"] = EMBEDDING_WHITENING_SQL


def embedding_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TwoNN intrinsic-dimension estimate (Facco et al. 2017,
    Sci.Rep. 7:12140): d̂ = n / Σᵢ ln(r2ᵢ/r1ᵢ) over each point's two
    nearest neighbors — the geometry probe a training-data pipeline
    runs to see whether an embedding space actually uses its ambient
    dimensions (collapsed representations ⇒ d̂ ≪ 64).

    Engine-exact: squared distances close as na+nb−2·dot from
    deterministic left-to-right folds (Spark zip_with/aggregate ≡
    DuckDB positional unnest SUM — the proven cosine-oracle idiom),
    ROUNDED AT 6dp BEFORE ranking so neighbor selection never hinges
    on a final-ulp difference; neighbor ties break by id; the ln
    ratio terms follow the 6dp entropy discipline; one IEEE division
    closes the estimate.

    Scale: the estimator is SAMPLE-BOUNDED (200 md5-ordered points —
    TwoNN converges with a few hundred samples); production corpora
    re-sample per shard and average. All-pairs work is constant at
    any corpus size."""
    from bireme_spark.operators.dedup import cosine as _  # noqa: F401 (fold idiom home)

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    s = (
        e.orderBy(F.md5(F.concat(F.lit("t:"), F.col("vec_id").cast("string"))))
        .limit(200)
        .select("vec_id", "embedding", dot("embedding", "embedding").alias("nrm"))
    )
    b = s.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = s.join(b, F.col("vec_id") != F.col("vb")).select(
        "vec_id",
        "vb",
        F.round(
            F.col("nrm") + F.col("nb") - 2 * dot(F.col("embedding"), F.col("eb")), 6
        )
        .cast("decimal(18,6)")
        .alias("d2"),
    ).where(F.col("d2") > 0)
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("vb").asc())
    )
    two = pairs.withColumn("rn", rn).where(F.col("rn") <= 2)
    nn = two.groupBy("vec_id").agg(
        F.max(F.when(F.col("rn") == 1, F.col("d2"))).alias("d1"),
        F.max(F.when(F.col("rn") == 2, F.col("d2"))).alias("d2n"),
    ).where(F.col("d1").isNotNull() & F.col("d2n").isNotNull())
    terms = nn.select(
        F.round(
            0.5 * F.log(F.col("d2n").cast("double") / F.col("d1").cast("double")), 6
        )
        .cast("decimal(18,6)")
        .alias("t")
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("t").cast("double").alias("sum_log_ratio"),
    )
    return agg.select(
        "n_points",
        "sum_log_ratio",
        F.round(F.col("n_points") / F.col("sum_log_ratio"), 6).alias("intrinsic_dim"),
    )


EMBEDDING_INTRINSIC_DIM_SQL = """
WITH s0 AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY md5('t:' || CAST(vec_id AS VARCHAR)) LIMIT 200
),
s AS (
  SELECT vec_id, embedding,
         (SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
          FROM unnest(embedding) AS u(x)) AS nrm
  FROM s0
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS vb,
         CAST(ROUND(a.nrm + b.nrm - 2 * (
           SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
           FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y) z
         ), 6) AS DECIMAL(18,6)) AS d2
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
two AS (
  SELECT vec_id, vb, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, vb ASC) AS rn
  FROM pairs WHERE d2 > 0
),
nn AS (
  SELECT vec_id,
         MAX(CASE WHEN rn = 1 THEN d2 END) AS d1,
         MAX(CASE WHEN rn = 2 THEN d2 END) AS d2n
  FROM two WHERE rn <= 2 GROUP BY 1
),
terms AS (
  SELECT CAST(ROUND(0.5 * LN(CAST(d2n AS DOUBLE) / CAST(d1 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS t
  FROM nn WHERE d1 IS NOT NULL AND d2n IS NOT NULL
),
agg AS (
  SELECT COUNT(*) AS n_points, CAST(SUM(t) AS DOUBLE) AS sum_log_ratio FROM terms
)
SELECT n_points, sum_log_ratio,
       ROUND(n_points / sum_log_ratio, 6) AS intrinsic_dim
FROM agg
"""

QUERIES["embedding_intrinsic_dim"] = embedding_intrinsic_dim
ORACLE["embedding_intrinsic_dim"] = EMBEDDING_INTRINSIC_DIM_SQL


def _rp_signs(k: int = 16, d: int = 64) -> list[list[float]]:
    """Deterministic ±1 Rademacher matrix from md5 nibbles (the
    md5-bucket house pattern): sign(j,i) = +1 iff the first nibble
    of md5('rp:j:i') is < 8. Computed ONCE at plan build and inlined
    as literals into BOTH engines' plans — no per-row hashing."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"rp:{j}:{i}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for i in range(d)
        ]
        for j in range(k)
    ]


def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss random projection audit (Achlioptas 2003
    database-friendly ±1 projections): project 64-dim embeddings to
    k=16 with a deterministic Rademacher matrix and measure, over a
    deterministic probe-pair sample, the squared-distance distortion
    ratio (‖P(a−b)‖²/k) / ‖a−b‖² — the check run before committing a
    cheap projected index, exploiting JL linearity by projecting the
    DIFFERENCE vector once per pair.

    Engine-exact: the sign matrix is Python-md5-derived literals
    (identical text in both plans); difference components are exact
    float→double; every Σ is a SEQUENTIAL array fold (F.aggregate ↔
    list_reduce) in array order, and the 16 component squares add in
    one fixed left-to-right chain — bit-identical, so only the final
    per-pair ratio is 6dp-rounded for the DECIMAL summary.

    Scale: the probe sample (vec_id % 37) bounds the pair join to
    sample²/2 rows regardless of corpus size; projecting the full
    corpus stays an O(n·d·k) map with the matrix in the closure —
    no shuffle either way."""
    signs = _rp_signs()
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 37 == 0)
    a = e.select(F.col("vec_id").alias("ida"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("idb"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("ida") < F.col("idb")).select(
        "ida",
        "idb",
        F.zip_with(
            "ea", "eb", lambda x, y: x.cast("double") - y.cast("double")
        ).alias("d"),
    )
    dyj = [
        _fold_sum(
            F.zip_with(
                F.col("d"),
                F.array(*[F.lit(s) for s in signs[j]]),
                lambda x, s: x * s,
            )
        ).alias(f"dy{j}")
        for j in range(16)
    ]
    proj = pairs.select(
        "ida",
        "idb",
        _fold_sum(F.transform(F.col("d"), lambda x: x * x)).alias("dx2"),
        *dyj,
    )
    dy2 = None
    for j in range(16):
        t = F.col(f"dy{j}") * F.col(f"dy{j}")
        dy2 = t if dy2 is None else dy2 + t
    ratios = proj.where(F.col("dx2") > 0).select(
        F.round((dy2 / F.lit(16.0)) / F.col("dx2"), 6)
        .cast("decimal(18,6)")
        .alias("ratio")
    )
    return ratios.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (F.sum("ratio").cast("double") / F.count(F.lit(1))).alias("avg_ratio"),
        F.min("ratio").cast("double").alias("min_ratio"),
        F.max("ratio").cast("double").alias("max_ratio"),
    )


def _random_projection_sql() -> str:
    signs = _rp_signs()
    dy_exprs = []
    for j in range(16):
        pos = [str(i + 1) for i in range(64) if signs[j][i] > 0]
        dy_exprs.append(
            f"list_reduce(list_prepend(0.0, list_transform(range(1, 65), "
            f"i -> d[i] * CASE WHEN i IN ({', '.join(pos)}) THEN 1.0 ELSE -1.0 END)), "
            f"(a, x) -> a + x) AS dy{j}"
        )
    dy2 = " + ".join(f"dy{j} * dy{j}" for j in range(16))
    return f"""
WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 37 = 0),
pairs AS (
  SELECT a.vec_id AS ida, b.vec_id AS idb,
         list_transform(range(1, 65),
           i -> CAST(a.embedding[i] AS DOUBLE) - CAST(b.embedding[i] AS DOUBLE)) AS d
  FROM s a JOIN s b ON a.vec_id < b.vec_id
),
proj AS (
  SELECT ida, idb,
         list_reduce(list_prepend(0.0, list_transform(d, x -> x * x)),
                     (a, x) -> a + x) AS dx2,
         {', '.join(dy_exprs)}
  FROM pairs
),
ratios AS (
  SELECT CAST(ROUND((({dy2}) / 16.0) / dx2, 6) AS DECIMAL(18,6)) AS ratio
  FROM proj WHERE dx2 > 0
)
SELECT COUNT(*) AS n_pairs,
       CAST(SUM(ratio) AS DOUBLE) / COUNT(*) AS avg_ratio,
       CAST(MIN(ratio) AS DOUBLE) AS min_ratio,
       CAST(MAX(ratio) AS DOUBLE) AS max_ratio
FROM ratios
"""


QUERIES["embedding_random_projection"] = embedding_random_projection
ORACLE["embedding_random_projection"] = _random_projection_sql()


def embedding_kmeans_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three unrolled Lloyd iterations of k-means (k=4) on the
    embedding corpus, reporting per-iteration inertia and how many
    vectors changed cluster — the convergence audit that catches a
    broken distance kernel or a non-contracting update immediately
    (inertia must be non-increasing; the oracle hash-checks the
    exact trajectory, not just the final state). Deterministic
    residue init (vec_id % 4), the distributed-kmeans seeding
    equivalent of random-partition init.

    Engine-exact: centroid means are per-term 6dp DECIMAL sums ÷ n,
    re-rounded to 6dp DECIMALs; per-(vector,cluster) squared
    distances are 6dp-rounded-per-term DECIMAL sums (the TwoNN
    round-before-rank discipline), argmin breaks ties on cluster id,
    and inertia is an exact DECIMAL sum.

    Scale: each iteration is the classic two-shuffle Pregel-ish
    plan — posexplode → (cluster,dim) mean agg (centroid table is
    model-sized), then a dim-hash join + (vector,cluster) agg for
    reassignment; per-iteration localCheckpoint cuts the 2^t lineage
    (the kcore rule). No driver-side math."""
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", (F.col("vec_id") % 4).alias("c")
    )
    flat = None
    out_rows = []
    assign = e.localCheckpoint(eager=False)
    for it in (1, 2, 3):
        flat = assign.select(
            "vec_id", "c", F.posexplode("embedding").alias("pos", "x")
        ).select(
            "vec_id",
            "c",
            "pos",
            F.col("x").cast("double").alias("x"),
            F.round(F.col("x").cast("double"), 6).cast("decimal(18,6)").alias("xr"),
        )
        cen = flat.groupBy("c", "pos").agg(
            F.round(F.sum("xr").cast("double") / F.count(F.lit(1)), 6)
            .cast("decimal(18,6)")
            .alias("cen")
        )
        dists = (
            assign.select("vec_id", F.col("c").alias("prev_c"), "embedding")
            .select(
                "vec_id", "prev_c", F.posexplode("embedding").alias("pos", "x")
            )
            .join(
                cen.select(F.col("c").alias("cand"), "pos", "cen"), "pos"
            )
            .select(
                "vec_id",
                "prev_c",
                "cand",
                F.round(
                    (F.col("x").cast("double") - F.col("cen").cast("double"))
                    * (F.col("x").cast("double") - F.col("cen").cast("double")),
                    6,
                )
                .cast("decimal(18,6)")
                .alias("t"),
            )
            .groupBy("vec_id", "prev_c", "cand")
            .agg(F.sum("t").alias("dist"))
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("dist").asc(), F.col("cand").asc()
        )
        best = (
            dists.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", F.col("cand").alias("c"), "prev_c", "dist")
        )
        best = best.localCheckpoint(eager=False)
        out_rows.append(
            best.agg(
                F.lit(it).alias("iteration"),
                F.sum("dist").cast("double").alias("inertia"),
                F.sum(F.when(F.col("c") != F.col("prev_c"), 1).otherwise(0)).alias(
                    "n_moved"
                ),
            )
        )
        assign = best.join(
            e.select("vec_id", "embedding"), "vec_id"
        ).select("vec_id", "embedding", "c")
    res = out_rows[0]
    for df in out_rows[1:]:
        res = res.unionByName(df)
    return res.orderBy("iteration")


def _kmeans_sql() -> str:
    iters = []
    prev = "a0"
    for t in (1, 2, 3):
        iters.append(
            f"""cen{t} AS (
  SELECT c, pos,
         CAST(ROUND(CAST(SUM(xr) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) AS cen
  FROM (
    SELECT p.c, f.pos, CAST(ROUND(f.x, 6) AS DECIMAL(18,6)) AS xr
    FROM {prev} p JOIN flat f ON f.vec_id = p.vec_id
  ) s GROUP BY 1, 2
),
d{t} AS (
  SELECT f.vec_id, p.c AS prev_c, cc.c AS cand,
         SUM(CAST(ROUND((f.x - CAST(cc.cen AS DOUBLE))
                        * (f.x - CAST(cc.cen AS DOUBLE)), 6)
                  AS DECIMAL(18,6))) AS dist
  FROM flat f
  JOIN {prev} p ON p.vec_id = f.vec_id
  JOIN cen{t} cc ON cc.pos = f.pos
  GROUP BY 1, 2, 3
),
a{t} AS (
  SELECT vec_id, cand AS c, prev_c, dist FROM (
    SELECT vec_id, prev_c, cand, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist ASC, cand ASC) AS rn
    FROM d{t}
  ) q WHERE rn = 1
)"""
        )
        prev = f"a{t}"
    body = ",\n".join(iters)
    rows = "\nUNION ALL\n".join(
        f"SELECT {t} AS iteration, CAST(SUM(dist) AS DOUBLE) AS inertia,"
        f" CAST(SUM(CASE WHEN c <> prev_c THEN 1 ELSE 0 END) AS BIGINT) AS n_moved"
        f" FROM a{t}"
        for t in (1, 2, 3)
    )
    return f"""
WITH flat AS (
  SELECT vec_id,
         CAST(generate_subscripts(embedding, 1) - 1 AS INTEGER) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
),
a0 AS (SELECT vec_id, vec_id % 4 AS c FROM embeddings),
{body}
SELECT * FROM ({rows}) r ORDER BY iteration
"""


QUERIES["embedding_kmeans_convergence"] = embedding_kmeans_convergence
ORACLE["embedding_kmeans_convergence"] = _kmeans_sql()


def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top eigenpair of the embedding covariance by FIVE unrolled
    power iterations (von Mises iteration) — the ORACLE-CHECKED
    counterpart of embedding_pca (whose LAPACK eigensolve is
    rows-only by necessity): v ← normalize(C·v) from a uniform
    start; after 5 rounds ‖C·v‖ estimates λ₁ and v the principal
    direction. Emits the 64 loadings plus the eigenvalue estimate.

    Engine-exact — INTEGER PARTS-PER-BILLION state: ROUND(double, k)
    has engine-divergent tie semantics (Spark decimal-string half-up
    vs DuckDB binary ×10^k — a 1e-9 tie DID split here and amplified
    through the normalization), so every quantization is
    FLOOR(x·1e9) instead: floor of an identical IEEE double is
    bit-deterministic on both engines. The matrix is c_ppb BIGINT,
    the mat-vec is exact integer products (≤6e15), the norm is a
    sqrt of an exact integer, and v re-quantizes by FLOOR — zero
    tie exposure anywhere in the loop.

    Scale: the d² gram build is the only corpus-sized work and runs
    on a DETERMINISTIC HALF-SAMPLE (vec_id % 2 — the d²-cell pair
    fan-out is the quadratic cost; a uniform sample estimates the
    same covariance, and the oracle mirrors the coin); all five
    iterations run on 4096-row model-sized frames (broadcast norm
    scalars). The classic distributed eigensolve-without-a-solver."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 2 == 0)
    # float→DOUBLE→decimal: Spark's float→decimal cast goes through
    # the float's 7-digit shortest string while DuckDB converts the
    # exact binary — 1e-8-level per-element skew that 73/4096 matrix
    # cells turned into ±1 ppb floor flips. Through double, both
    # engines quantize the same exact binary value.
    ex = e.select("vec_id", F.posexplode("embedding").alias("pos", "x")).select(
        "vec_id", "pos", F.col("x").cast("double").cast("decimal(18,9)").alias("x")
    )
    a = ex.select("vec_id", F.col("pos").alias("i"), F.col("x").alias("xi"))
    b = ex.select("vec_id", F.col("pos").alias("j"), F.col("x").alias("xj"))
    # n is folded INTO the gram agg (each (i,j) cell sees every vec
    # exactly once, so COUNT(*) per cell == n) — the former eager
    # e.count() was a second full scan of the parquet (VERDICT r5 #4).
    mat = (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(
            # round the exact decimal sums to 9dp BEFORE the double
            # cast: at scale 18 the scaled integer passes 2^53 and
            # DECIMAL→DOUBLE conversion itself diverges across
            # engines (the CLAUDE.md int128-vs-BigDecimal boundary)
            F.round(F.sum(F.col("xi") * F.col("xj")), 9)
            .cast("decimal(28,9)")
            .alias("sxy"),
            F.round(F.sum("xi"), 9).cast("decimal(28,9)").alias("sx"),
            F.round(F.sum("xj"), 9).cast("decimal(28,9)").alias("sy"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "i",
            "j",
            F.expr(
                "CAST(FLOOR((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
                " * CAST(sy AS DOUBLE) / n) / (n - 1) * 1e9) AS BIGINT)"
            ).alias("c_ppb"),
        )
    )
    mat = mat.localCheckpoint(eager=False)
    v = mat.select("j").distinct().select(
        "j", F.lit(125000000).alias("v_ppb")
    )
    # r11 opt (VERDICT #5; the spectral_bisection scalar-collect
    # precedent, guide §5): the per-step norm is ONE double — collect
    # it and inline as a LITERAL Column (F.lit keeps the exact IEEE
    # binary; never a string literal, the SSIM bare-decimal rule)
    # instead of a broadcast-agg crossJoin. Without the cut, v_t's
    # plan reads w_t twice (once via nrm, once directly), so the
    # five-step lineage re-derived the mat join O(2^t) times; with a
    # lazy per-step checkpoint on w the collect materializes it and
    # the next step reuses it. Integer algebra unchanged — FLOOR of
    # the identical double division.
    nrm_lit = None
    for _ in range(5):
        w = (
            mat.join(v, "j")
            .select("i", (F.col("c_ppb") * F.col("v_ppb")).alias("t"))
            .groupBy("i")
            .agg(F.expr("SUM(t) DIV 1000000000").alias("w_ppb"))
        ).localCheckpoint(eager=False)
        row = w.agg(
            F.sqrt(F.sum(F.col("w_ppb") * F.col("w_ppb")).cast("double")).alias("nrm")
        ).collect()[0]
        nrm_lit = float(row["nrm"]) if row["nrm"] is not None else 1.0
        v = w.select(
            F.col("i").alias("j"),
            F.floor(F.col("w_ppb").cast("double") / F.lit(nrm_lit) * F.lit(1e9))
            .cast("bigint")
            .alias("v_ppb"),
        )
    return (
        v.select(
            F.col("j").alias("pos"),
            (F.col("v_ppb").cast("double") / F.lit(1e9)).alias("loading"),
            (F.lit(nrm_lit) / F.lit(1e9)).alias("eigenvalue_est"),
        )
        .orderBy("pos")
    )


def _power_iter_sql() -> str:
    iters = []
    prev = "v0"
    for t in (1, 2, 3, 4, 5):
        iters.append(
            f"""w{t} AS MATERIALIZED (
  SELECT m.i, SUM(m.c_ppb * p.v_ppb) // 1000000000 AS w_ppb
  FROM mat m JOIN {prev} p ON p.j = m.j
  GROUP BY 1
),
n{t} AS (
  SELECT SQRT(CAST(SUM(w_ppb * w_ppb) AS DOUBLE)) AS nrm FROM w{t}
),
v{t} AS (
  SELECT w.i AS j,
         CAST(FLOOR(CAST(w.w_ppb AS DOUBLE) / n{t}.nrm * 1e9) AS BIGINT) AS v_ppb
  FROM w{t} w, n{t}
)"""
        )
        prev = f"v{t}"
    body = ",\n".join(iters)
    return f"""
WITH emb AS (SELECT * FROM embeddings WHERE vec_id % 2 = 0),
ex AS MATERIALIZED (
  SELECT vec_id, i - 1 AS pos,
         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS x
  FROM emb, LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) t
),
mat AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j,
         CAST(FLOOR((CAST(CAST(ROUND(SUM(a.x * b.x), 9) AS DECIMAL(28,9)) AS DOUBLE)
                     - CAST(CAST(ROUND(SUM(a.x), 9) AS DECIMAL(28,9)) AS DOUBLE)
                       * CAST(CAST(ROUND(SUM(b.x), 9) AS DECIMAL(28,9)) AS DOUBLE)
                       / COUNT(*))
                    / (COUNT(*) - 1) * 1e9) AS BIGINT) AS c_ppb
  FROM ex a JOIN ex b ON a.vec_id = b.vec_id
  GROUP BY 1, 2
),
v0 AS (SELECT DISTINCT j, CAST(125000000 AS BIGINT) AS v_ppb FROM mat),
{body}
SELECT v5.j AS pos, CAST(v5.v_ppb AS DOUBLE) / 1e9 AS loading,
       n5.nrm / 1e9 AS eigenvalue_est
FROM v5, n5
ORDER BY pos
"""


QUERIES["embedding_power_iteration"] = embedding_power_iteration
ORACLE["embedding_power_iteration"] = _power_iter_sql()


def embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled silhouette score (Rousseeuw 1987) per cluster — the
    cluster-quality audit a pipeline runs after k-means partitioning
    (dedup_semantic cells, IVF lists): s(i) = (b−a)/max(a,b) where a
    = mean distance to own-cluster members and b = the best
    other-cluster mean. Near-zero or negative means the clustering
    doesn't separate the space. Deterministic end to end: 200
    md5-ordered sample points (the TwoNN sampling discipline —
    silhouette stabilizes at a few hundred points, so all-pairs work
    is CONSTANT at any corpus size), centroids = the 4 smallest
    vec_ids, assignment by 6dp-rounded squared distance with id
    tie-break.

    Engine-exact: distances close as na+nb−2·dot from left-to-right
    folds (the proven cosine-oracle idiom), rounded 6dp BEFORE use;
    per-(i,cluster) means are exact DECIMAL sums divided once in
    IEEE; s(i) is FLOOR-quantized to e6 BEFORE the per-cluster mean
    (never a shuffle-order double sum); singletons pin s=0.

    Scale: sample is checkpointed once (it feeds centroids,
    assignment, and both pair sides); everything after the one
    39.8k-row pair fan-out is cluster-sized."""

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    s = (
        e.orderBy(F.md5(F.concat(F.lit("s:"), F.col("vec_id").cast("string"))))
        .limit(200)
        .select("vec_id", "embedding", dot("embedding", "embedding").alias("nrm"))
        .localCheckpoint(eager=True)
    )
    cent = s.orderBy("vec_id").limit(4).select(
        F.col("vec_id").alias("cid"),
        F.col("embedding").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    cand = s.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.round(F.col("nrm") + F.col("cn") - 2 * dot(F.col("embedding"), F.col("ce")), 6)
        .cast("decimal(18,6)")
        .alias("cd2"),
    )
    rn = F.row_number().over(
        Window.partitionBy("vec_id").orderBy(F.col("cd2").asc(), F.col("cid").asc())
    )
    asg = cand.withColumn("rn", rn).where(F.col("rn") == 1).select(
        "vec_id", F.col("cid").alias("cluster")
    )
    b = s.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = s.join(b, F.col("vec_id") != F.col("vb")).select(
        "vec_id",
        "vb",
        F.round(
            F.col("nrm") + F.col("nb") - 2 * dot(F.col("embedding"), F.col("eb")), 6
        )
        .cast("decimal(18,6)")
        .alias("d2"),
    ).select(
        "vec_id",
        "vb",
        F.expr(
            "CAST(ROUND(SQRT(GREATEST(CAST(d2 AS DOUBLE), 0.0)), 6) AS DECIMAL(18,6))"
        ).alias("d"),
    )
    labeled = (
        pairs.join(asg, "vec_id")
        .join(
            asg.select(F.col("vec_id").alias("vb"), F.col("cluster").alias("cluster_b")),
            "vb",
        )
    )
    stats = labeled.groupBy("vec_id", "cluster", "cluster_b").agg(
        F.sum("d").cast("decimal(28,6)").alias("sum_d"),
        F.count(F.lit(1)).alias("cnt"),
    )
    own = stats.where(F.col("cluster_b") == F.col("cluster")).select(
        "vec_id", F.expr("CAST(sum_d AS DOUBLE) / cnt").alias("a_mean")
    )
    oth = (
        stats.where(F.col("cluster_b") != F.col("cluster"))
        .groupBy("vec_id")
        .agg(F.min(F.expr("CAST(sum_d AS DOUBLE) / cnt")).alias("b_mean"))
    )
    sil = (
        asg.join(own, "vec_id", "left")
        .join(oth, "vec_id", "left")
        .select(
            "cluster",
            F.expr(
                "CASE WHEN a_mean IS NULL OR b_mean IS NULL"
                " OR GREATEST(a_mean, b_mean) = 0 THEN CAST(0 AS BIGINT)"
                " ELSE CAST(FLOOR((b_mean - a_mean) / GREATEST(a_mean, b_mean)"
                " * 1000000) AS BIGINT) END"
            ).alias("s_e6"),
        )
    )
    return (
        sil.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n_points"), F.sum("s_e6").alias("sum_s_e6"))
        .select(
            F.col("cluster").cast("bigint").alias("cluster"),
            "n_points",
            F.expr("CAST(FLOOR(CAST(sum_s_e6 AS DOUBLE) / n_points) AS BIGINT)").alias(
                "mean_sil_e6"
            ),
        )
        .orderBy("cluster")
    )


EMBEDDING_SILHOUETTE_SQL = """
WITH s0 AS (
  SELECT vec_id, embedding FROM embeddings
  ORDER BY md5('s:' || CAST(vec_id AS VARCHAR)) LIMIT 200
),
s AS MATERIALIZED (
  SELECT vec_id, embedding,
         (SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
          FROM unnest(embedding) AS u(x)) AS nrm
  FROM s0
),
cent AS (
  SELECT vec_id AS cid, embedding AS ce, nrm AS cn
  FROM s ORDER BY vec_id LIMIT 4
),
cand AS (
  SELECT s.vec_id, cent.cid,
         CAST(ROUND(s.nrm + cent.cn - 2 * (
           SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
           FROM (SELECT unnest(s.embedding) AS x, unnest(cent.ce) AS y) z
         ), 6) AS DECIMAL(18,6)) AS cd2
  FROM s, cent
),
asg AS MATERIALIZED (
  SELECT vec_id, cid AS cluster FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cd2 ASC, cid ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS vb,
         CAST(ROUND(SQRT(GREATEST(CAST(
           CAST(ROUND(a.nrm + b.nrm - 2 * (
             SELECT SUM(CAST(x AS DOUBLE) * CAST(y AS DOUBLE))
             FROM (SELECT unnest(a.embedding) AS x, unnest(b.embedding) AS y) z
           ), 6) AS DECIMAL(18,6))
         AS DOUBLE), 0.0)), 6) AS DECIMAL(18,6)) AS d
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
stats AS MATERIALIZED (
  SELECT p.vec_id, ia.cluster, ib.cluster AS cluster_b,
         CAST(SUM(p.d) AS DECIMAL(28,6)) AS sum_d, COUNT(*) AS cnt
  FROM pairs p
  JOIN asg ia ON ia.vec_id = p.vec_id
  JOIN asg ib ON ib.vec_id = p.vb
  GROUP BY 1, 2, 3
),
own AS (
  SELECT vec_id, CAST(sum_d AS DOUBLE) / cnt AS a_mean
  FROM stats WHERE cluster_b = cluster
),
oth AS (
  SELECT vec_id, MIN(CAST(sum_d AS DOUBLE) / cnt) AS b_mean
  FROM stats WHERE cluster_b <> cluster GROUP BY 1
),
sil AS (
  SELECT asg.cluster,
         CASE WHEN own.a_mean IS NULL OR oth.b_mean IS NULL
              OR GREATEST(own.a_mean, oth.b_mean) = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(FLOOR((oth.b_mean - own.a_mean)
                   / GREATEST(own.a_mean, oth.b_mean) * 1000000) AS BIGINT) END AS s_e6
  FROM asg
  LEFT JOIN own ON own.vec_id = asg.vec_id
  LEFT JOIN oth ON oth.vec_id = asg.vec_id
)
SELECT CAST(cluster AS BIGINT) AS cluster, COUNT(*) AS n_points,
       CAST(FLOOR(CAST(SUM(s_e6) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mean_sil_e6
FROM sil
GROUP BY cluster
ORDER BY cluster
"""

QUERIES["embedding_silhouette"] = embedding_silhouette
ORACLE["embedding_silhouette"] = EMBEDDING_SILHOUETTE_SQL


# ---------------------------------------------------------------------------
# embedding_drift_psi — PSI drift of an embedding-component marginal
# ---------------------------------------------------------------------------


def embedding_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the dimension-0 marginal between
    a reference half and a candidate half of the corpus (vec_id
    parity split) — the cheap pre-ANN drift gate: an embedding-model
    regression moves per-dimension marginals long before
    nearest-neighbor recall visibly degrades. (The L2 NORM is the
    wrong feature here by construction: normalized embeddings pin it
    to 1, so a component marginal — in production, every component —
    is what a drift monitor tracks.) Bins are REFERENCE deciles (the
    PSI convention), Laplace-smoothed so empty candidate bins stay
    finite.

    Determinism: the feature is ROUND(x0 * 1e6) coarsened to
    3dp cells (DIV 1000) — exact integers on both engines
    (float -> double is an exact binary widening), and the histogram
    is bounded by the VALUE RANGE (x0 in [-1,1] -> <=2001 cells),
    not the row count; decile edges come from the house
    histogram-CDF (cell -> count agg, cum window on the bounded
    histogram, 9 broadcast edges); PSI terms are 6dp-rounded.

    Scale: ONE scan collapses to the bounded-cell histogram and
    every later branch reads cells, never vectors; the CDF window
    sorts cells, not rows."""
    e = load_table(spark, sf_dir, "embeddings").select(
        # +1e6 offset keeps the value non-negative so truncating
        # integer division yields uniform-width cells everywhere
        F.expr(
            "(CAST(ROUND(CAST(element_at(embedding, 1) AS DOUBLE) * 1000000, 0)"
            " AS BIGINT) + 1000000) DIV 1000"
        ).alias("v"),
        (F.col("vec_id") % 2 == 0).alias("is_ref"),
    )
    # branches re-derive the bounded histogram — a checkpoint A/B-LOST
    # at sf0.1 (eager 0.65 / lazy 0.49 / plain 0.49 min-of-3; the
    # collapse is one cheap agg). At real corpus volume, persist it.
    hist = e.groupBy("is_ref", "v").agg(F.count(F.lit(1)).alias("cnt"))
    ref = hist.where("is_ref").select("v", "cnt")
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    refb = ref.select(
        "v",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_ref"),
    ).select("v", F.expr("(cum - 1) * 10 DIV n_ref").alias("bin"))
    edges = refb.groupBy("bin").agg(F.max("v").alias("edge")).where("bin < 9")
    assigned = (
        hist.join(F.broadcast(edges), F.col("v") > F.col("edge"), "left")
        .groupBy("is_ref", "v", "cnt")
        .agg(F.count("edge").cast("int").alias("bin"))
    )
    cells = assigned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_ref"), F.col("cnt")).otherwise(0)).alias("n_ref"),
        F.sum(F.when(~F.col("is_ref"), F.col("cnt")).otherwise(0)).alias("n_cand"),
    )
    tot = cells.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cand").alias("t_cand"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cand").cast("bigint").alias("n_cand"),
            F.expr(
                "ROUND((CAST(n_cand + 1 AS DOUBLE) / (t_cand + n_bins)"
                " - CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))"
                " * LN((CAST(n_cand + 1 AS DOUBLE) / (t_cand + n_bins))"
                " / (CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))), 6)"
            ).alias("psi_term"),
        )
        .orderBy("bin")
    )


EMBEDDING_DRIFT_PSI_SQL = """
WITH feat AS (
  SELECT (CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000, 0) AS BIGINT)
          + 1000000) // 1000 AS v,
         vec_id % 2 = 0 AS is_ref
  FROM embeddings
),
hist AS (SELECT is_ref, v, COUNT(*) AS cnt FROM feat GROUP BY 1, 2),
refh AS (SELECT v, cnt FROM hist WHERE is_ref),
refb AS (
  SELECT v, (SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - 1) * 10
              // (SUM(cnt) OVER ()) AS bin
  FROM refh
),
edges AS (SELECT bin, MAX(v) AS edge FROM refb WHERE bin < 9 GROUP BY 1),
assigned AS (
  SELECT h.is_ref, h.v, h.cnt,
         CAST(COUNT(e.edge) AS INTEGER) AS bin
  FROM hist h LEFT JOIN edges e ON h.v > e.edge
  GROUP BY 1, 2, 3
),
cells AS (
  SELECT bin,
         SUM(CASE WHEN is_ref THEN cnt ELSE 0 END) AS n_ref,
         SUM(CASE WHEN NOT is_ref THEN cnt ELSE 0 END) AS n_cand
  FROM assigned GROUP BY 1
),
tot AS (
  SELECT SUM(n_ref) AS t_ref, SUM(n_cand) AS t_cand, COUNT(*) AS n_bins FROM cells
)
SELECT bin, CAST(n_ref AS BIGINT) AS n_ref, CAST(n_cand AS BIGINT) AS n_cand,
       ROUND((CAST(n_cand + 1 AS DOUBLE) / (t_cand + n_bins)
              - CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))
             * LN((CAST(n_cand + 1 AS DOUBLE) / (t_cand + n_bins))
                  / (CAST(n_ref + 1 AS DOUBLE) / (t_ref + n_bins))), 6) AS psi_term
FROM cells, tot
ORDER BY bin
"""

QUERIES["embedding_drift_psi"] = embedding_drift_psi
ORACLE["embedding_drift_psi"] = EMBEDDING_DRIFT_PSI_SQL


# ---------------------------------------------------------------------------
# embedding_anisotropy — expected pairwise cosine of a vector sample
# ---------------------------------------------------------------------------

_ANISO_N = 64  # deterministic md5-ordered sample; C(64,2) = 2016 pairs


def embedding_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anisotropy audit (Ethayarajh 2019): the expected pairwise
    cosine of RANDOM vectors should be ~0 in an isotropic space —
    contextual-embedding spaces are notoriously cone-shaped (mean
    cosine >> 0), which silently breaks cosine-threshold dedup and
    ANN recall assumptions. Measures mean and variance of cosine
    over all C(64,2) pairs of a deterministic md5-ordered sample.

    Exactness: each vector is quantized ONCE to exact e6 integers
    (ROUND per element — order-free), so dots and norms are exact
    BIGINT sums; per-pair cosine is one IEEE chain over those exact
    integers, 6dp-rounded and e6-summed; mean and variance close in
    integer arithmetic.

    Scale: sample-bounded (constant 64 rows, 2016 pairs at ANY
    corpus size — the ann_recall_eval discipline); the only full
    scan is the TakeOrdered sample pick."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.orderBy(F.md5(F.concat(F.lit("a:"), F.col("vec_id").cast("string"))))
        .limit(_ANISO_N)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000000, 0).cast("bigint"),
            ).alias("q"),
        )
        .select(
            "vec_id",
            "q",
            F.aggregate(
                F.transform(F.col("q"), lambda x: x * x),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("nrm"),
        )
    )
    a = q.select(
        F.col("vec_id").alias("ia"), F.col("q").alias("qa"), F.col("nrm").alias("na")
    )
    b = q.select(
        F.col("vec_id").alias("ib"), F.col("q").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("ia") < F.col("ib")).select(
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("dot"),
        "na",
        "nb",
    )
    t = pairs.select(
        F.expr(
            "CAST(ROUND(dot / SQRT(CAST(na AS DOUBLE) * nb) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("c_e6")
    )
    return t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.expr("CAST(SUM(c_e6) DIV COUNT(*) AS BIGINT)").alias("mean_cos_e6"),
        F.expr(
            "CAST((COUNT(*) * SUM(c_e6 * c_e6) - SUM(c_e6) * SUM(c_e6))"
            " DIV (COUNT(*) * COUNT(*)) AS BIGINT)"
        ).alias("var_cos_e12"),
        F.max(F.abs(F.col("c_e6"))).cast("bigint").alias("max_abs_cos_e6"),
    )


EMBEDDING_ANISOTROPY_SQL = f"""
WITH s AS (
  SELECT vec_id, embedding
  FROM embeddings
  ORDER BY md5(concat('a:', CAST(vec_id AS VARCHAR))) LIMIT {_ANISO_N}
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM s
),
n AS (
  SELECT vec_id, q,
         list_sum(list_transform(q, x -> x * x)) AS nrm
  FROM q
),
pairs AS (
  SELECT list_sum(list_transform(generate_series(1, len(a.q)),
                                 i -> a.q[i] * b.q[i])) AS dot,
         a.nrm AS na, b.nrm AS nb
  FROM n a JOIN n b ON a.vec_id < b.vec_id
),
t AS (
  SELECT CAST(ROUND(dot / SQRT(CAST(na AS DOUBLE) * nb) * 1000000, 0)
              AS BIGINT) AS c_e6
  FROM pairs
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(c_e6) // COUNT(*) AS BIGINT) AS mean_cos_e6,
       CAST((COUNT(*) * SUM(c_e6 * c_e6) - SUM(c_e6) * SUM(c_e6))
            // (COUNT(*) * COUNT(*)) AS BIGINT) AS var_cos_e12,
       CAST(MAX(ABS(c_e6)) AS BIGINT) AS max_abs_cos_e6
FROM t
"""

QUERIES["embedding_anisotropy"] = embedding_anisotropy
ORACLE["embedding_anisotropy"] = EMBEDDING_ANISOTROPY_SQL


# ---------------------------------------------------------------------------
# embedding_hubness_audit — k-occurrence skew of nearest-neighbor lists
# ---------------------------------------------------------------------------

_HUB_N = 64
_HUB_K = 5


def embedding_hubness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit (Radovanović et al., JMLR 2010): in high
    dimensions some points ('hubs') appear in a disproportionate
    share of other points' k-NN lists while 'antihubs' appear in
    none — a pathology that silently skews ANN recall and
    semantic-dedup decisions. Over the same deterministic
    md5-ordered 64-vector sample as ``embedding_anisotropy``, build
    every point's exact 5-NN by cosine and emit the k-occurrence
    histogram (how many points occur in 0, 1, 2, ... NN lists) plus
    the max hub occupancy.

    Exactness: the cosine ranking key is the anisotropy audit's
    exact e6-integer quantization (BIGINT dots/norms), tie-broken by
    vec_id — ranks are engine-identical integers.

    Scale: sample-bounded (64 x 63 scored pairs at ANY corpus
    size); the rank window partitions per query point."""
    e = load_table(spark, sf_dir, "embeddings")
    q = (
        e.orderBy(F.md5(F.concat(F.lit("a:"), F.col("vec_id").cast("string"))))
        .limit(_HUB_N)
        .select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000000, 0).cast("bigint"),
            ).alias("q"),
        )
        .select(
            "vec_id",
            "q",
            F.aggregate(
                F.transform(F.col("q"), lambda x: x * x),
                F.lit(0).cast("bigint"),
                lambda a, x: a + x,
            ).alias("nrm"),
        )
    )
    a = q.select(
        F.col("vec_id").alias("ia"), F.col("q").alias("qa"), F.col("nrm").alias("na")
    )
    b = q.select(
        F.col("vec_id").alias("ib"), F.col("q").alias("qb"), F.col("nrm").alias("nb")
    )
    pairs = a.join(b, F.col("ia") != F.col("ib")).select(
        "ia",
        "ib",
        F.expr(
            "CAST(ROUND(aggregate(zip_with(qa, qb, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (acc, x) -> acc + x)"
            " / SQRT(CAST(na AS DOUBLE) * nb) * 1000000, 0) AS BIGINT)"
        ).alias("c_e6"),
    )
    w = Window.partitionBy("ia").orderBy(F.col("c_e6").desc(), F.col("ib"))
    nn = pairs.select("ia", "ib", F.row_number().over(w).alias("rnk")).where(
        F.col("rnk") <= _HUB_K
    )
    occ = q.select(F.col("vec_id").alias("ib")).join(
        nn.groupBy("ib").agg(F.count(F.lit(1)).alias("k_occ")), "ib", "left"
    ).select(F.coalesce("k_occ", F.lit(0)).alias("k_occ"))
    return (
        occ.groupBy("k_occ")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .select(F.col("k_occ").cast("bigint").alias("k_occ"), "n_points")
        .orderBy("k_occ")
    )


EMBEDDING_HUBNESS_SQL = f"""
WITH s AS (
  SELECT vec_id, embedding
  FROM embeddings
  ORDER BY md5(concat('a:', CAST(vec_id AS VARCHAR))) LIMIT {_HUB_N}
),
q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS q
  FROM s
),
n AS (
  SELECT vec_id, q, list_sum(list_transform(q, x -> x * x)) AS nrm FROM q
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(ROUND(list_sum(list_transform(generate_series(1, len(a.q)),
                                            i -> a.q[i] * b.q[i]))
                    / SQRT(CAST(a.nrm AS DOUBLE) * b.nrm) * 1000000, 0)
              AS BIGINT) AS c_e6
  FROM n a JOIN n b ON a.vec_id <> b.vec_id
),
nn AS (
  SELECT ia, ib
  FROM (
    SELECT ia, ib,
           ROW_NUMBER() OVER (PARTITION BY ia ORDER BY c_e6 DESC, ib) AS rnk
    FROM pairs
  ) t WHERE rnk <= {_HUB_K}
),
occ AS (
  SELECT COALESCE(o.k_occ, 0) AS k_occ
  FROM q LEFT JOIN (SELECT ib, COUNT(*) AS k_occ FROM nn GROUP BY 1) o
    ON q.vec_id = o.ib
)
SELECT CAST(k_occ AS BIGINT) AS k_occ,
       CAST(COUNT(*) AS BIGINT) AS n_points
FROM occ GROUP BY 1 ORDER BY 1
"""

QUERIES["embedding_hubness_audit"] = embedding_hubness_audit
ORACLE["embedding_hubness_audit"] = EMBEDDING_HUBNESS_SQL


_KCENTER_K = 8


def _kcenter_steps_sql(k: int) -> str:
    """Unrolled Gonzalez farthest-first selection over a `pd`
    (ia, ib, d) pair-distance view — the ORACLE form of the k-step
    sequential recursion (DuckDB restricts the recursive term, so
    fixed small k unrolls into chained CTEs). Every level is AS
    MATERIALIZED: st{r} is referenced twice (by pick{r+1} and
    st{r+1}) and DuckDB re-executes plain CTEs per reference — the
    unmaterialized chain is 2^k st1 evaluations. The Spark side runs
    the same recursion as a persisted iterative loop instead
    (embedding_kcenter_coreset body)."""
    parts = [
        "sel1 AS MATERIALIZED (SELECT MIN(ia) AS c FROM pd)",
        "st1 AS MATERIALIZED (SELECT pd.ib AS vec_id, pd.d AS mind"
        " FROM pd JOIN sel1 ON pd.ia = sel1.c)",
    ]
    for r in range(2, k + 1):
        parts.append(
            f"pick{r} AS MATERIALIZED (SELECT vec_id AS c, mind AS radius"
            f" FROM st{r - 1} ORDER BY mind DESC, vec_id LIMIT 1)"
        )
        if r < k:
            parts.append(
                f"st{r} AS MATERIALIZED (SELECT s.vec_id, LEAST(s.mind, pd.d) AS mind"
                f" FROM st{r - 1} s CROSS JOIN pick{r} p"
                f" JOIN pd ON pd.ia = p.c AND pd.ib = s.vec_id)"
            )
    rows = [
        "SELECT 1 AS step, (SELECT c FROM sel1) AS center_id,"
        " CAST(NULL AS BIGINT) AS radius_e6"
    ] + [
        f"SELECT {r} AS step, c AS center_id, CAST(radius AS BIGINT) AS radius_e6"
        f" FROM pick{r}"
        for r in range(2, k + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(rows) + "\nORDER BY step"


def embedding_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-center coreset by farthest-first traversal (Gonzalez 1985) —
    the geometric cover every diversity-aware data-selection pipeline
    leans on: each step adds the point FARTHEST from the selected
    set, so k=8 centers cover the corpus with the minimal-radius
    guarantee (2-approximation). Emits the selection order and the
    covering radius at each pick — the radius sequence IS the
    diversity profile of the corpus.

    Determinism: cosine distances quantize to integer e6 BEFORE any
    comparison (ROUND(cos·1e6) — ties broken by min vec_id), so the
    sequential selection is pure integer state and the two engines
    agree step for step: Spark runs it as a persisted iterative loop
    (k−1 one-row argmax collects — model-sized driver traffic), the
    oracle as generated MATERIALIZED unrolled CTEs
    (_kcenter_steps_sql). Self-pairs (d = 0) keep chosen centers out
    of later argmaxes for free.

    Scale: the pair table is deterministically sample-bounded
    (vec_id % 4 = 0 — the house quadratic-oracle rule); the
    PRODUCTION path for the full corpus is the identical selection
    with per-round broadcast of the (≤ k)-row center set against a
    linear scan — the same integer-e6 states make the two paths
    agree step for step."""
    e = load_table(spark, sf_dir, "embeddings").where(F.expr("vec_id % 4 = 0"))
    v = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).repartition(
        # r11 opt: the embeddings parquet arrives as ONE partition and
        # the 4M-pair crossJoin below STREAMS this side — without the
        # split every per-pair fold runs on one core (the CLAUDE.md
        # embeddings-repartition rule, guide §2.2)
        spark.sparkContext.defaultParallelism
    ).select(
        # r11: an unrolled 64-term dot chain LOST here (12.2→47.6s at
        # sf0.1 — the giant expression fails whole-stage codegen
        # compilation and the crossJoin stage interprets); keep the fold
        "vec_id", "v", F.sqrt(_fold_sum(F.expr("zip_with(v, v, (a, b) -> a * b)"))).alias("n")
    )
    a = v.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    pairs = a.crossJoin(b).select(
        "ia",
        "ib",
        F.expr(
            "1000000 - CAST(ROUND(aggregate(zip_with(va, vb, (x, y) -> x * y),"
            " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) / (na * nb) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("d"),
    ).persist()
    try:
        c0 = pairs.agg(F.min("ia")).collect()[0][0]
        st = pairs.where(F.col("ia") == c0).select(
            F.col("ib").alias("vec_id"), F.col("d").alias("mind")
        ).persist()
        rows = [(1, int(c0), None)]
        handles = [st]
        for r in range(2, _KCENTER_K + 1):
            top = st.orderBy(F.desc("mind"), F.asc("vec_id")).limit(1).collect()[0]
            rows.append((r, int(top.vec_id), int(top.mind)))
            st = (
                st.join(
                    pairs.where(F.col("ia") == top.vec_id).select(
                        F.col("ib").alias("vec_id"), F.col("d").alias("d2")
                    ),
                    "vec_id",
                )
                .select("vec_id", F.least("mind", "d2").alias("mind"))
                .persist()
            )
            handles.append(st)
        out = spark.createDataFrame(
            rows, "step int, center_id bigint, radius_e6 bigint"
        ).orderBy("step")
        out = out.localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
        for h in handles:
            h.unpersist()
    return out


EMBEDDING_KCENTER_SQL = f"""
WITH pts AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
),
nrm AS MATERIALIZED (
  SELECT vec_id, sqrt(SUM(x * x)) AS n
  FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM pts) z
  GROUP BY vec_id
),
pd AS MATERIALIZED (
  -- parallel unnest of both lists in ONE select zips positionally
  -- (the ann_bruteforce oracle pattern)
  SELECT ia, ib,
         1000000 - CAST(ROUND(dot / (x1.n * x2.n) * 1000000, 0) AS BIGINT) AS d
  FROM (
    SELECT ia, ib, SUM(x * y) AS dot
    FROM (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(unnest(a.embedding) AS DOUBLE) AS x,
                 CAST(unnest(b.embedding) AS DOUBLE) AS y
          FROM pts a, pts b) z
    GROUP BY ia, ib
  ) dots
  JOIN nrm x1 ON x1.vec_id = dots.ia
  JOIN nrm x2 ON x2.vec_id = dots.ib
),
{_kcenter_steps_sql(_KCENTER_K)}
"""

QUERIES["embedding_kcenter_coreset"] = embedding_kcenter_coreset
ORACLE["embedding_kcenter_coreset"] = EMBEDDING_KCENTER_SQL


_DBSCAN_EPS_E6 = 750_000  # cosine distance 0.75 (cos >= 0.25)
_DBSCAN_MINPTS = 4  # neighborhood count INCLUDING the point itself


def embedding_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN density clustering (Ester et al. 1996) over the
    embedding corpus: core points have ≥ minPts neighbors within eps
    (cosine distance, self included — the paper's N_eps definition),
    clusters are connected components of the core-core eps-graph,
    border points attach to their minimum-labeled core neighbor,
    everything else is noise. The density complement of k-means
    (embedding_kmeans_convergence): no k, finds arbitrary-shape
    clusters, and EMITS noise instead of forcing assignment.

    Determinism: distances quantize to integer e6 before ANY
    comparison; components come from the min-id star-contraction
    operator (operators/dedup.connected_components — O(log n) rounds
    on any graph shape), isolated cores are their own singleton
    label, border ties break to the smallest cluster label. The
    oracle replays the same integer graph through a recursive
    transitive-closure CTE.

    Scale: the pair table is deterministically sample-bounded
    (vec_id % 4 = 0, the house quadratic-oracle rule); the
    PRODUCTION path swaps the exact pair table for the LSH candidate
    pairs (operators/ann.lsh_bucketed) with identical downstream
    integer logic — eps-neighborhoods, core test, and components all
    run on (id, id, d) rows either way."""
    from bireme_spark.operators.dedup import connected_components

    e = load_table(spark, sf_dir, "embeddings").where(F.expr("vec_id % 4 = 0"))
    v = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).repartition(
        # r11 opt: single-partition embeddings scan streams the pair
        # crossJoin below — split first so the per-pair folds
        # parallelize (CLAUDE.md embeddings-repartition rule)
        spark.sparkContext.defaultParallelism
    ).select(
        "vec_id", "v",
        F.sqrt(_fold_sum(F.expr("zip_with(v, v, (a, b) -> a * b)"))).alias("n"),
    )
    a = v.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = v.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    neigh = (
        a.crossJoin(b)
        .select(
            "ia",
            "ib",
            F.expr(
                "1000000 - CAST(ROUND(aggregate(zip_with(va, vb, (x, y) -> x * y),"
                " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) / (na * nb) * 1000000, 0)"
                " AS BIGINT)"
            ).alias("d"),
        )
        .where(F.col("d") <= _DBSCAN_EPS_E6)
        .persist()
    )
    deg = neigh.groupBy("ia").agg(F.count(F.lit(1)).alias("cnt"))
    core = deg.where(F.col("cnt") >= _DBSCAN_MINPTS).select(F.col("ia").alias("cid"))
    core_edges = (
        neigh.join(core.withColumnRenamed("cid", "ia"), "ia")
        .join(core.withColumnRenamed("cid", "ib"), "ib")
        .where(F.col("ia") < F.col("ib"))
        .select(F.col("ia").alias("id_a"), F.col("ib").alias("id_b"))
    )
    comp = connected_components(core_edges)
    core_lab = core.join(comp, core.cid == comp.id, "left").select(
        F.col("cid"), F.coalesce("component", F.col("cid")).alias("cluster")
    ).persist()
    border = (
        neigh.join(core_lab.withColumnRenamed("cid", "ib"), "ib")
        .join(core_lab.select(F.col("cid").alias("ia")), "ia", "left_anti")
        .groupBy("ia")
        .agg(F.min("cluster").alias("cluster"))
    )
    pts = v.select("vec_id")
    out = (
        pts.join(core_lab.withColumnRenamed("cid", "vec_id"), "vec_id", "left")
        .join(
            border.select(F.col("ia").alias("vec_id"), F.col("cluster").alias("bcl")),
            "vec_id",
            "left",
        )
        .select(
            "vec_id",
            F.when(F.col("cluster").isNotNull(), F.lit("core"))
            .when(F.col("bcl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce("cluster", "bcl").cast("bigint").alias("cluster"),
        )
        .orderBy("vec_id")
    )
    out = out.localCheckpoint(eager=True)
    neigh.unpersist()
    core_lab.unpersist()
    return out


EMBEDDING_DBSCAN_SQL = f"""
WITH RECURSIVE pts AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0
),
nrm AS MATERIALIZED (
  SELECT vec_id, sqrt(SUM(x * x)) AS n
  FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM pts) z
  GROUP BY vec_id
),
neigh AS MATERIALIZED (
  SELECT ia, ib,
         1000000 - CAST(ROUND(dot / (x1.n * x2.n) * 1000000, 0) AS BIGINT) AS d
  FROM (
    SELECT ia, ib, SUM(x * y) AS dot
    FROM (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(unnest(a.embedding) AS DOUBLE) AS x,
                 CAST(unnest(b.embedding) AS DOUBLE) AS y
          FROM pts a, pts b) z
    GROUP BY ia, ib
  ) dots
  JOIN nrm x1 ON x1.vec_id = dots.ia
  JOIN nrm x2 ON x2.vec_id = dots.ib
  WHERE 1000000 - CAST(ROUND(dot / (x1.n * x2.n) * 1000000, 0) AS BIGINT)
        <= {_DBSCAN_EPS_E6}
),
core AS MATERIALIZED (
  SELECT ia AS cid FROM neigh GROUP BY ia HAVING COUNT(*) >= {_DBSCAN_MINPTS}
),
core_edges AS MATERIALIZED (
  SELECT n.ia AS src, n.ib AS dst FROM neigh n
  WHERE n.ia IN (SELECT cid FROM core) AND n.ib IN (SELECT cid FROM core)
        AND n.ia <> n.ib
),
reach(src, dst) AS (
  SELECT src, dst FROM core_edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN core_edges e ON r.dst = e.src
),
core_lab AS MATERIALIZED (
  SELECT c.cid, COALESCE(m.component, c.cid) AS cluster
  FROM core c LEFT JOIN (
    SELECT id, LEAST(id, MIN(dst)) AS component
    FROM (SELECT src AS id, dst FROM reach
          UNION ALL SELECT DISTINCT src, src FROM core_edges) t
    GROUP BY id
  ) m ON m.id = c.cid
),
border AS MATERIALIZED (
  SELECT n.ia, MIN(cl.cluster) AS bcl
  FROM neigh n JOIN core_lab cl ON cl.cid = n.ib
  WHERE n.ia NOT IN (SELECT cid FROM core_lab)
  GROUP BY n.ia
)
SELECT p.vec_id,
       CASE WHEN cl.cluster IS NOT NULL THEN 'core'
            WHEN b.bcl IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(COALESCE(cl.cluster, b.bcl) AS BIGINT) AS cluster
FROM pts p
LEFT JOIN core_lab cl ON cl.cid = p.vec_id
LEFT JOIN border b ON b.ia = p.vec_id
ORDER BY p.vec_id
"""

QUERIES["embedding_dbscan"] = embedding_dbscan
ORACLE["embedding_dbscan"] = EMBEDDING_DBSCAN_SQL


_MMR_LAMBDA10 = 7  # lambda = 0.7 in tenths
_MMR_POOL = 30
_MMR_K = 10


def _mmr_fold(pdf):
    """Driver-free greedy MMR over the pool-sized pair table: all
    _MMR_K picks in one pass of exact Python-int arithmetic."""
    import pandas as pd

    lam, inv = _MMR_LAMBDA10, 10 - _MMR_LAMBDA10
    sims = {(int(a), int(b)): int(s) for a, b, s in zip(pdf["ia"], pdf["ib"], pdf["s"])}
    rel = {int(a): int(r) for a, r in zip(pdf["ia"], pdf["rel_a"])}
    remaining = set(rel)
    first = max(remaining, key=lambda v: (rel[v], -v))
    picks = [(1, first, rel[first], rel[first])]
    remaining.discard(first)
    maxsim = {v: sims[(first, v)] for v in remaining}
    for r in range(2, _MMR_K + 1):
        # floor-division matches DIV/// toward -inf? No: SQL DIV
        # truncates toward zero — mirror it explicitly for negatives.
        def score(v):
            num = lam * rel[v] - inv * maxsim[v]
            q = abs(num) // 10
            return q if num >= 0 else -q

        best = max(remaining, key=lambda v: (score(v), -v))
        picks.append((r, best, rel[best], score(best)))
        remaining.discard(best)
        for v in remaining:
            s2 = sims[(best, v)]
            if s2 > maxsim[v]:
                maxsim[v] = s2
    return pd.DataFrame(picks, columns=["rank", "vec_id", "rel_e6", "score_e6"])


def embedding_mmr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998): from the top-30 most query-relevant vectors (query =
    vec_id 0), greedily select 10 maximizing
    λ·rel − (1−λ)·max-sim-to-selected (λ = 0.7) — the diversity
    re-rank every retrieval pipeline bolts onto its ANN top-k so the
    result list isn't ten near-copies of the best hit. Emits the
    selection order with each pick's relevance and marginal score.

    Determinism: relevance and pairwise similarity quantize to
    integer e6 (ROUND(cos·1e6)); the marginal score is
    (7·rel − 3·maxsim) DIV 10 — pure integer (truncation toward zero
    mirrored exactly in the Python fold), ties to min id; the greedy
    is STATE-SIZED (pool² rows), so it runs in ONE Arrow batch (the
    Holt sequential-fold house rule — the k-collect loop variant
    measured ~5s vs ~3s) against an unrolled MATERIALIZED CTE
    oracle.

    Scale: relevance is ONE corpus scan against the broadcast query
    vector (the ann_bruteforce shape) — no sampling needed; the
    pairwise table is pool² = 900 rows regardless of corpus size, so
    the greedy stage is constant work at any SF."""
    e = load_table(spark, sf_dir, "embeddings")
    v = e.select(
        "vec_id",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
    ).select(
        "vec_id", "v",
        F.sqrt(_fold_sum(F.expr("zip_with(v, v, (a, b) -> a * b)"))).alias("n"),
    )
    q = v.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("n").alias("qn")
    )
    cos_e6 = (
        "CAST(ROUND(aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) / ({na} * {nb}) * 1000000, 0)"
        " AS BIGINT)"
    )
    cand = (
        v.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", "v", "n",
            F.expr(cos_e6.format(a="v", b="qv", na="n", nb="qn")).alias("rel"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(_MMR_POOL)
        .localCheckpoint(eager=True)
    )
    ca = cand.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("n").alias("na"))
    cb = cand.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    sims = (
        ca.crossJoin(cb)
        .select("ia", "ib", F.expr(cos_e6.format(a="va", b="vb", na="na", nb="nb")).alias("s"))
        .persist()
    )
    # The greedy is a STATE-SIZED sequential fold (pool² = 900 sim
    # rows + 30 rel rows) — the Holt house rule: run it in ONE Arrow
    # batch instead of k driver round-trips (the collect-loop variant
    # cost ~5s; this is one tiny job). Python ints keep the integer
    # e6 math exact.
    rel_rows = cand.select("vec_id", "rel")
    folded = (
        sims.join(
            rel_rows.withColumnRenamed("vec_id", "ib").withColumnRenamed("rel", "rel_b"),
            "ib",
        )
        .join(
            rel_rows.withColumnRenamed("vec_id", "ia").withColumnRenamed("rel", "rel_a"),
            "ia",
        )
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_mmr_fold, "rank int, vec_id bigint, rel_e6 bigint, score_e6 bigint")
        .drop("g")
        .orderBy("rank")
    )
    out = folded.localCheckpoint(eager=True)
    sims.unpersist()
    return out


def _mmr_steps_sql() -> str:
    lam, inv = _MMR_LAMBDA10, 10 - _MMR_LAMBDA10
    parts = [
        "p1 AS MATERIALIZED (SELECT vec_id, rel, rel AS score"
        " FROM cand ORDER BY rel DESC, vec_id LIMIT 1)",
        "st1 AS MATERIALIZED (SELECT c.vec_id, c.rel, s.s AS maxsim"
        " FROM cand c CROSS JOIN p1"
        " JOIN sims s ON s.ia = p1.vec_id AND s.ib = c.vec_id"
        " WHERE c.vec_id <> p1.vec_id)",
    ]
    for r in range(2, _MMR_K + 1):
        parts.append(
            f"p{r} AS MATERIALIZED (SELECT vec_id, rel,"
            f" ({lam} * rel - {inv} * maxsim) // 10 AS score"
            f" FROM st{r - 1} ORDER BY score DESC, vec_id LIMIT 1)"
        )
        if r < _MMR_K:
            parts.append(
                f"st{r} AS MATERIALIZED (SELECT t.vec_id, t.rel,"
                f" GREATEST(t.maxsim, s.s) AS maxsim"
                f" FROM st{r - 1} t CROSS JOIN p{r}"
                f" JOIN sims s ON s.ia = p{r}.vec_id AND s.ib = t.vec_id"
                f" WHERE t.vec_id <> p{r}.vec_id)"
            )
    rows = [
        f"SELECT {r} AS rank, vec_id, CAST(rel AS BIGINT) AS rel_e6,"
        f" CAST(score AS BIGINT) AS score_e6 FROM p{r}"
        for r in range(1, _MMR_K + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL ".join(rows) + "\nORDER BY rank"


EMBEDDING_MMR_SQL = f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, embedding FROM embeddings
),
nrm AS MATERIALIZED (
  SELECT vec_id, sqrt(SUM(x * x)) AS n
  FROM (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM v) z
  GROUP BY vec_id
),
cand AS MATERIALIZED (
  SELECT dots.vec_id,
         CAST(ROUND(dot / (nq.n * nc.n) * 1000000, 0) AS BIGINT) AS rel
  FROM (
    SELECT c.vec_id, SUM(x * y) AS dot
    FROM (SELECT c.vec_id,
                 CAST(unnest(c.embedding) AS DOUBLE) AS x,
                 CAST(unnest(q.embedding) AS DOUBLE) AS y
          FROM v c, v q WHERE q.vec_id = 0 AND c.vec_id <> 0) z
    JOIN v c ON c.vec_id = z.vec_id
    GROUP BY c.vec_id
  ) dots
  JOIN nrm nc ON nc.vec_id = dots.vec_id
  CROSS JOIN (SELECT n FROM nrm WHERE vec_id = 0) nq
  ORDER BY rel DESC, dots.vec_id
  LIMIT {_MMR_POOL}
),
sims AS MATERIALIZED (
  SELECT ia, ib, CAST(ROUND(dot / (n1.n * n2.n) * 1000000, 0) AS BIGINT) AS s
  FROM (
    SELECT ia, ib, SUM(x * y) AS dot
    FROM (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 CAST(unnest(va.embedding) AS DOUBLE) AS x,
                 CAST(unnest(vb.embedding) AS DOUBLE) AS y
          FROM cand a, cand b, v va, v vb
          WHERE va.vec_id = a.vec_id AND vb.vec_id = b.vec_id) z
    GROUP BY ia, ib
  ) dots
  JOIN nrm n1 ON n1.vec_id = ia
  JOIN nrm n2 ON n2.vec_id = ib
),
{_mmr_steps_sql()}
"""

QUERIES["embedding_mmr_diversity"] = embedding_mmr_diversity
ORACLE["embedding_mmr_diversity"] = EMBEDDING_MMR_SQL


def embedding_lof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000) over a
    deterministic embedding sample — the DENSITY-relative outlier
    score the centroid/Mahalanobis screens miss (a point can sit
    near the global mean yet be locally isolated between clusters).
    k=8 neighbors; LOF(p) = mean_{o∈N(p)} lrd(o)/lrd(p) with
    reach-dist_k(p,o) = max(kdist(o), d(p,o)). Emits the top-50
    scores (vec_id ties ascending).

    Sample-bounded quadratic (the wedge-join discipline): stride =
    GREATEST(1, n DIV 500) computed IN-PLAN, so the pair matrix stays
    ≤ ~500² at every SF while the sample tracks the corpus. Distances
    are e6-integer cosine distances (one ROUND per pair — the ANN
    rerank discipline); the lrd ratio per neighbor rounds 6dp before
    a DECIMAL sum (Σ-of-doubles rule).

    Scale: the sampled side broadcasts (BroadcastNestedLoopJoin, no
    shuffle-cartesian); kdist/sum-reach joins run on sample-sized
    frames. For full-corpus LOF swap the exact pair stage for the
    kNN-graph edges (operators/ann.knn_graph) — same downstream
    algebra."""
    e = load_table(spark, sf_dir, "embeddings")
    stride = e.agg(
        F.greatest(F.lit(1), F.expr("count(1) DIV 500")).alias("stride")
    )
    # spread the one-partition parquet scan so the pair scoring (which
    # inherits this side's partitioning through the broadcast NL join)
    # runs wide (A/B at sf0.1: 2.56 vs 1.63s)
    s = (
        e.repartition(spark.sparkContext.defaultParallelism)
        .join(F.broadcast(stride))
        .where(F.col("vec_id") % F.col("stride") == 0)
        .select(
            "vec_id",
            F.col("embedding").alias("v"),
            # per-element double cast BEFORE the product (operators/
            # ann._dot discipline): float*float products diverge from
            # the oracle's double math in the low bits, and at 250k
            # pairs some cosines sit within 1e-8 of an e6 boundary
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            ).alias("nrm"),
        )
    )
    a = s.select(
        F.col("vec_id").alias("pid"), F.col("v").alias("pv"), F.col("nrm").alias("pn")
    )
    b = s.select(
        F.col("vec_id").alias("oid"), F.col("v").alias("ov"), F.col("nrm").alias("on_")
    )
    pairs = a.join(F.broadcast(b), F.col("pid") != F.col("oid")).select(
        "pid",
        "oid",
        (
            F.lit(1000000)
            - F.expr(
                "CAST(ROUND(aggregate(zip_with(pv, ov,"
                " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D,"
                " (acc, z) -> acc + z) / (pn * on_) * 1000000, 0) AS BIGINT)"
            )
        ).alias("d_e6"),
    )
    k = 8
    wn = Window.partitionBy("pid").orderBy(F.asc("d_e6"), F.asc("oid"))
    knn = pairs.withColumn("rn", F.row_number().over(wn)).where(F.col("rn") <= k)
    kdist = knn.groupBy("pid").agg(F.max("d_e6").alias("kdist"))
    reach = knn.join(
        F.broadcast(kdist.select(F.col("pid").alias("oid"), F.col("kdist").alias("okd"))),
        "oid",
    ).select("pid", "oid", F.greatest(F.col("d_e6"), F.col("okd")).alias("reach"))
    sr = reach.groupBy("pid").agg(
        F.greatest(F.sum("reach"), F.lit(1)).alias("sum_reach")
    )
    lof = (
        reach.join(F.broadcast(sr), "pid")
        .join(
            F.broadcast(
                sr.select(F.col("pid").alias("oid"), F.col("sum_reach").alias("o_sr"))
            ),
            "oid",
        )
        .select(
            "pid",
            # per-neighbor lrd ratio as an exact e6 BIGINT via pure
            # integer truncating DIV — an integer/integer ratio CAN
            # land exactly on .5e-6 (both ROUND(double) tie semantics
            # and the Σ/k mean split engines there; sf0.1 hit both),
            # so no doubles anywhere in the LOF fold
            F.expr(
                "sum_reach * 1000000 DIV GREATEST(o_sr, 1)"
            ).cast("bigint").alias("ratio_e6"),
        )
        .groupBy("pid")
        .agg(F.expr(f"SUM(ratio_e6) DIV {k}").cast("bigint").alias("lof_ppm"))
    )
    out = lof.join(kdist, "pid").select(
        F.col("pid").alias("vec_id"), F.col("kdist").alias("k_dist_e6"), "lof_ppm"
    )
    wtop = Window.orderBy(F.desc("lof_ppm"), F.asc("vec_id"))
    return (
        out.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") <= 50)
        .select("rank", "vec_id", "k_dist_e6", "lof_ppm")
        .orderBy("rank")
    )


EMBEDDING_LOF_SQL = """
WITH n AS (SELECT GREATEST(1, COUNT(*) // 500) AS stride FROM embeddings),
s AS (
  SELECT vec_id, embedding AS v
  FROM embeddings, n WHERE vec_id % n.stride = 0
),
comp AS (
  SELECT a.vec_id AS pid, b.vec_id AS oid,
         CAST(unnest(a.v) AS DOUBLE) AS x, CAST(unnest(b.v) AS DOUBLE) AS y
  FROM s a JOIN s b ON a.vec_id <> b.vec_id
),
dots AS (
  SELECT pid, oid, SUM(x * y) AS dot, SUM(x * x) AS nx, SUM(y * y) AS ny
  FROM comp GROUP BY pid, oid
),
pairs AS (
  SELECT pid, oid,
         1000000 - CAST(ROUND(dot / (sqrt(nx) * sqrt(ny)) * 1000000, 0) AS BIGINT)
           AS d_e6
  FROM dots
),
knn AS (
  SELECT pid, oid, d_e6,
         ROW_NUMBER() OVER (PARTITION BY pid ORDER BY d_e6 ASC, oid ASC) AS rn
  FROM pairs QUALIFY rn <= 8
),
kdist AS (SELECT pid, MAX(d_e6) AS kdist FROM knn GROUP BY pid),
reach AS (
  SELECT k.pid, k.oid, GREATEST(k.d_e6, kd.kdist) AS reach
  FROM knn k JOIN kdist kd ON kd.pid = k.oid
),
sr AS (SELECT pid, GREATEST(SUM(reach), 1) AS sum_reach FROM reach GROUP BY pid),
ratios AS (
  SELECT r.pid,
         CAST(p.sum_reach * 1000000 // GREATEST(o.sum_reach, 1) AS BIGINT)
           AS ratio_e6
  FROM reach r
  JOIN sr p ON p.pid = r.pid
  JOIN sr o ON o.pid = r.oid
),
lof AS (
  SELECT pid, CAST(SUM(ratio_e6) // 8 AS BIGINT) AS lof_ppm
  FROM ratios GROUP BY pid
)
SELECT rank, vec_id, k_dist_e6, lof_ppm FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY l.lof_ppm DESC, l.pid ASC) AS INTEGER) AS rank,
         l.pid AS vec_id, kd.kdist AS k_dist_e6, l.lof_ppm
  FROM lof l JOIN kdist kd ON kd.pid = l.pid
) WHERE rank <= 50 ORDER BY rank
"""

QUERIES["embedding_lof"] = embedding_lof
ORACLE["embedding_lof"] = EMBEDDING_LOF_SQL


def embedding_triplet_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triplet margin evaluation of embedding quality against the
    label column — the metric-learning health check a training-data
    pipeline runs on every new embedding drop: for deterministic
    triplets (anchor, positive = next same-label id, negative = next
    different-label id), count margin violations
    cos(a,p) − cos(a,n) < 0.05. A healthy label-aligned space keeps
    the violation rate low; a collapsed or drifted one spikes it.

    Triplet formation is BUCKETED, never global: vec_ids bucket by
    DIV 100, the anchor is each bucket's first row, pos/neg are the
    anchor's nearest following same-/different-label rows WITHIN the
    bucket (two bucket-partitioned windows — no global-order window,
    no corpus×corpus join; anchors whose bucket lacks a pos or neg
    are dropped, deterministically on both engines).

    Engine determinism: cosines are the house exact-cosine discipline
    (float→double casts inside the fold, ROUND 6), so the margin is
    an exact multiple of 1e-6 and margin_e6 is integer; per-label
    means are SUM DIV n integer ppm (never a rounded mean — the r9
    tie lesson).

    Scale: one corpus scan, windows partitioned by bucket (~100 rows
    each), |anchors| = |corpus|/100 pairs of 2 dot products."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    b = e.withColumn("bucket", F.expr("CAST(vec_id DIV 100 AS BIGINT)"))
    wb = Window.partitionBy("bucket").orderBy("vec_id")
    wb_lbl = Window.partitionBy("bucket", "label").orderBy("vec_id")
    first = F.row_number().over(wb) == 1
    cand = b.select(
        "bucket",
        "vec_id",
        "label",
        "embedding",
        first.alias("is_anchor"),
        F.lead("vec_id").over(wb_lbl).alias("pos_id"),
    )
    anchors = cand.where(F.col("is_anchor") & F.col("pos_id").isNotNull()).select(
        "bucket",
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("embedding").alias("av"),
        "pos_id",
    )
    # nearest FOLLOWING different-label row in the bucket: min vec_id
    # over the bucket's other-label rows — a bucket-local join+agg
    others = b.select(
        F.col("bucket").alias("ob"), F.col("vec_id").alias("o_id"), F.col("label").alias("o_label")
    )
    neg = (
        anchors.join(
            others,
            (F.col("bucket") == F.col("ob"))
            & (F.col("o_id") > F.col("a_id"))
            & (F.col("o_label") != F.col("a_label")),
        )
        .groupBy("bucket", "a_id", "a_label", "pos_id")
        .agg(F.min("o_id").alias("neg_id"))
    )
    vecs = b.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("vv"))
    dot = lambda x, y: F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    withvecs = (
        neg.join(anchors.select("a_id", "av"), "a_id")
        .join(vecs.withColumnRenamed("vid", "pos_id").withColumnRenamed("vv", "pv"), "pos_id")
        .join(vecs.withColumnRenamed("vid", "neg_id").withColumnRenamed("vv", "nv"), "neg_id")
    )
    cos = lambda u, v: F.round(
        dot(F.col(u), F.col(v))
        / (F.sqrt(dot(F.col(u), F.col(u))) * F.sqrt(dot(F.col(v), F.col(v)))),
        6,
    )
    scored = withvecs.select(
        "a_label",
        F.round((cos("av", "pv") - cos("av", "nv")) * 1e6).cast("bigint").alias("margin_e6"),
    )
    return (
        scored.groupBy(F.col("a_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_triplets"),
            F.sum(F.when(F.col("margin_e6") < 50000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
            F.sum("margin_e6").cast("bigint").alias("sum_margin_e6"),
        )
        .select(
            "label",
            "n_triplets",
            "n_violations",
            F.expr("CAST(n_violations * 1000000 DIV n_triplets AS BIGINT)").alias(
                "violation_ppm"
            ),
            F.expr("CAST(sum_margin_e6 DIV n_triplets AS BIGINT)").alias("mean_margin_e6"),
        )
        .orderBy("label")
    )


EMBEDDING_TRIPLET_SQL = """
WITH b AS (
  SELECT vec_id, label, embedding, CAST(vec_id // 100 AS BIGINT) AS bucket
  FROM embeddings
),
cand AS (
  SELECT bucket, vec_id, label, embedding,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY vec_id) = 1 AS is_anchor,
         LEAD(vec_id) OVER (PARTITION BY bucket, label ORDER BY vec_id) AS pos_id
  FROM b
),
anchors AS (
  SELECT bucket, vec_id AS a_id, label AS a_label, pos_id
  FROM cand WHERE is_anchor AND pos_id IS NOT NULL
),
neg AS (
  SELECT a.bucket, a.a_id, a.a_label, a.pos_id, MIN(o.vec_id) AS neg_id
  FROM anchors a JOIN b o
    ON o.bucket = a.bucket AND o.vec_id > a.a_id AND o.label <> a.a_label
  GROUP BY 1, 2, 3, 4
),
tri AS (
  SELECT n.a_label, av.embedding AS av, pv.embedding AS pv, nv.embedding AS nv,
         n.a_id, n.pos_id, n.neg_id
  FROM neg n
  JOIN b av ON av.vec_id = n.a_id
  JOIN b pv ON pv.vec_id = n.pos_id
  JOIN b nv ON nv.vec_id = n.neg_id
),
dots AS (
  SELECT a_id, a_label,
         SUM(a * a) AS naa, SUM(p * p) AS npp, SUM(nn * nn) AS nnn,
         SUM(a * p) AS dap, SUM(a * nn) AS dan
  FROM (
    SELECT a_id, a_label,
           CAST(unnest(av) AS DOUBLE) AS a,
           CAST(unnest(pv) AS DOUBLE) AS p,
           CAST(unnest(nv) AS DOUBLE) AS nn
    FROM tri
  ) z
  GROUP BY 1, 2
),
scored AS (
  SELECT a_label,
         CAST(ROUND((ROUND(dap / (sqrt(naa) * sqrt(npp)), 6)
                     - ROUND(dan / (sqrt(naa) * sqrt(nnn)), 6)) * 1000000.0)
              AS BIGINT) AS margin_e6
  FROM dots
)
SELECT a_label AS label,
       CAST(COUNT(*) AS BIGINT) AS n_triplets,
       CAST(SUM(CASE WHEN margin_e6 < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       CAST(SUM(CASE WHEN margin_e6 < 50000 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS violation_ppm,
       CAST(SUM(margin_e6) // COUNT(*) AS BIGINT) AS mean_margin_e6
FROM scored
GROUP BY 1
ORDER BY label
"""

QUERIES["embedding_triplet_eval"] = embedding_triplet_eval
ORACLE["embedding_triplet_eval"] = EMBEDDING_TRIPLET_SQL


def embedding_ari_partition_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjusted Rand Index between the label column and the
    sign-octant partition (signs of components 0–2 → 8 cells) — the
    chance-corrected partition-agreement metric (Hubert & Arabie
    1985) every clustering evaluation reports; here it answers "do
    the leading embedding dimensions already encode the labels?",
    the cheap geometry-vs-metadata probe run before spending a
    clustering pass. ARI ≈ 0 = octants are label-blind; ARI → 1 =
    labels are linearly separable in 3 dimensions.

    Determinism: the contingency table is exact integer counts
    (sign cells are exact float compares — no arithmetic); the pair
    sums ΣC(n,2) are DECIMAL(38,0); ARI closes as ONE identical IEEE
    double expression over them (p-chart contract), one-shot 6dp
    ROUND. The DECIMAL→DOUBLE casts stay inside 2^53 up to ~10⁸
    vectors (pair sums ~5e15) — beyond that, apply the house
    n-independent downscale to the counts first (documented
    precondition, same class as the r5 rule).

    Scale: one scan to the (label × octant) contingency (≤ 8·|labels|
    cells), then scalars."""
    e = load_table(spark, sf_dir, "embeddings")
    oct_ = (
        F.when(F.element_at("embedding", 1) >= 0, 4).otherwise(0)
        + F.when(F.element_at("embedding", 2) >= 0, 2).otherwise(0)
        + F.when(F.element_at("embedding", 3) >= 0, 1).otherwise(0)
    )
    cells = e.groupBy(F.col("label"), oct_.alias("cell")).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("nij")
    )
    c2 = "({x} * ({x} - 1) DIV 2)"
    sums = cells.agg(
        F.sum("nij").cast("decimal(38,0)").alias("n"),
        F.sum(F.expr(c2.format(x="nij"))).cast("decimal(38,0)").alias("sij"),
        F.countDistinct("label").cast("bigint").alias("n_labels"),
        F.countDistinct("cell").cast("bigint").alias("n_cells"),
    )
    a = cells.groupBy("label").agg(F.sum("nij").cast("decimal(38,0)").alias("ai"))
    sa = a.agg(F.sum(F.expr(c2.format(x="ai"))).cast("decimal(38,0)").alias("sa"))
    b = cells.groupBy("cell").agg(F.sum("nij").cast("decimal(38,0)").alias("bj"))
    sb = b.agg(F.sum(F.expr(c2.format(x="bj"))).cast("decimal(38,0)").alias("sb"))
    j = sums.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    n2 = "(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)"
    expect = f"(CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE) / {n2})"
    ari = (
        f"ROUND((CAST(sij AS DOUBLE) - {expect})"
        f" / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0 - {expect}), 6)"
    )
    return j.select(
        F.col("n").cast("bigint").alias("n_vectors"),
        "n_labels",
        "n_cells",
        F.expr(ari).alias("ari"),
    )


EMBEDDING_ARI_SQL = """
WITH cells AS (
  SELECT label,
         (CASE WHEN embedding[1] >= 0 THEN 4 ELSE 0 END
          + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
          + CASE WHEN embedding[3] >= 0 THEN 1 ELSE 0 END) AS cell,
         CAST(COUNT(*) AS HUGEINT) AS nij
  FROM embeddings GROUP BY 1, 2
),
sums AS (
  SELECT CAST(SUM(nij) AS HUGEINT) AS n,
         CAST(SUM(nij * (nij - 1) // 2) AS HUGEINT) AS sij,
         CAST(COUNT(DISTINCT label) AS BIGINT) AS n_labels,
         CAST(COUNT(DISTINCT cell) AS BIGINT) AS n_cells
  FROM cells
),
sa AS (
  SELECT CAST(SUM(ai * (ai - 1) // 2) AS HUGEINT) AS sa
  FROM (SELECT CAST(SUM(nij) AS HUGEINT) AS ai FROM cells GROUP BY label)
),
sb AS (
  SELECT CAST(SUM(bj * (bj - 1) // 2) AS HUGEINT) AS sb
  FROM (SELECT CAST(SUM(nij) AS HUGEINT) AS bj FROM cells GROUP BY cell)
)
SELECT CAST(n AS BIGINT) AS n_vectors, n_labels, n_cells,
       ROUND((CAST(sij AS DOUBLE)
              - (CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0)))
             / ((CAST(sa AS DOUBLE) + CAST(sb AS DOUBLE)) / 2.0
                - (CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE)
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0))), 6) AS ari
FROM sums, sa, sb
"""

QUERIES["embedding_ari_partition_agreement"] = embedding_ari_partition_agreement
ORACLE["embedding_ari_partition_agreement"] = EMBEDDING_ARI_SQL


def embedding_mmd_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kernel two-sample test: squared Maximum Mean Discrepancy
    (Gretton et al. 2012) between label-0 and label-1 embeddings
    with an RBF kernel — the distribution-level drift/contamination
    test that catches what per-coordinate PSI marginals miss
    (embedding_drift_psi is the marginal sibling; MMD sees joint
    structure). MMD² = E k(x,x′) + E k(y,y′) − 2 E k(x,y), γ fixed
    at 1/2 (unit-norm-ish vectors put ‖x−y‖² in [0,4]).

    Determinism: the pair work is SAMPLE-BOUNDED by an in-plan
    stride (vec_id % (GREATEST(n DIV 400, 1)) = 0 — both engines see
    the same threshold, the LOF pattern), so each kernel block is ≤
    ~400² pairs at ANY corpus size; every exp(−γd²) rounds e6 PER
    TERM into integer sums (the transcendental rule — 1-ulp exp
    differences cannot accumulate); block means are SUM DIV count
    and MMD² closes in exact integer e6 arithmetic. Distances use
    the float→double cast fold (the r9 array-fold rule).

    Scale: stride-filter → broadcast-size sample, three bounded
    kernel blocks; the corpus is scanned once."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    nrow = e.groupBy((F.col("label") % 2).alias("g")).agg(
        F.count(F.lit(1)).alias("c")
    )
    stride = nrow.agg(
        F.expr("CAST(GREATEST(MAX(c) DIV 400, 1) AS BIGINT)").alias("k")
    )
    s = (
        e.crossJoin(F.broadcast(stride))
        .where(F.expr("vec_id % k = 0"))
        .select(
            "vec_id", (F.col("label") % 2).alias("g"), F.col("embedding").alias("v")
        )
        .localCheckpoint(eager=True)
    )
    d2 = (
        "aggregate(zip_with(a.v, b.v, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    kexp = f"CAST(ROUND(exp(-0.5 * {d2}) * 1000000) AS BIGINT)"
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(
        b, F.expr("a.vec_id < b.vec_id") | (F.expr("a.g < b.g"))
    ).where(
        F.expr("a.vec_id <> b.vec_id")
    )
    # three blocks from ONE pair stream: xx (g=0,0), yy (1,1), xy (0,1)
    blocks = pairs.select(
        F.expr("a.g").alias("ga"),
        F.expr("b.g").alias("gb"),
        F.expr(kexp).alias("k_e6"),
    ).where(F.expr("ga <= gb"))
    agg = blocks.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("k_e6").cast("bigint").alias("s"),
    )
    piv = agg.select(
        F.expr("CASE WHEN ga = 0 AND gb = 0 THEN 'xx' WHEN ga = 1 AND gb = 1 THEN 'yy'"
               " ELSE 'xy' END").alias("blk"),
        "n",
        "s",
    )
    wide = piv.groupBy().pivot("blk", ["xx", "yy", "xy"]).agg(
        F.first("n").alias("n"), F.first("s").alias("s")
    )
    return wide.select(
        F.col("xx_n").cast("bigint").alias("n_xx_pairs"),
        F.col("yy_n").cast("bigint").alias("n_yy_pairs"),
        F.col("xy_n").cast("bigint").alias("n_xy_pairs"),
        F.expr(
            "CAST(xx_s DIV xx_n + yy_s DIV yy_n - 2 * (xy_s DIV xy_n) AS BIGINT)"
        ).alias("mmd2_e6"),
    )


EMBEDDING_MMD_SQL = """
WITH nrow AS (
  SELECT CAST(GREATEST(MAX(c) // 400, 1) AS BIGINT) AS k
  FROM (SELECT label % 2 AS g, COUNT(*) AS c FROM embeddings GROUP BY 1)
),
s AS (
  SELECT vec_id, label % 2 AS g, embedding AS v
  FROM embeddings, nrow WHERE vec_id % nrow.k = 0
),
pairs AS (
  SELECT a.g AS ga, b.g AS gb,
         CAST(ROUND(exp(-0.5 * (
           SELECT SUM((CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE))
                      * (CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE)))
           FROM (SELECT UNNEST(a.v) AS xa, UNNEST(b.v) AS xb)
         )) * 1000000) AS BIGINT) AS k_e6
  FROM s a JOIN s b
    ON (a.vec_id < b.vec_id OR a.g < b.g) AND a.vec_id <> b.vec_id
  WHERE a.g <= b.g
),
agg AS (
  SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(k_e6) AS BIGINT) AS s
  FROM pairs GROUP BY 1, 2
)
SELECT
  (SELECT n FROM agg WHERE ga = 0 AND gb = 0) AS n_xx_pairs,
  (SELECT n FROM agg WHERE ga = 1 AND gb = 1) AS n_yy_pairs,
  (SELECT n FROM agg WHERE ga = 0 AND gb = 1) AS n_xy_pairs,
  CAST((SELECT s FROM agg WHERE ga = 0 AND gb = 0) // (SELECT n FROM agg WHERE ga = 0 AND gb = 0)
       + (SELECT s FROM agg WHERE ga = 1 AND gb = 1) // (SELECT n FROM agg WHERE ga = 1 AND gb = 1)
       - 2 * ((SELECT s FROM agg WHERE ga = 0 AND gb = 1) // (SELECT n FROM agg WHERE ga = 0 AND gb = 1))
       AS BIGINT) AS mmd2_e6
"""

QUERIES["embedding_mmd_test"] = embedding_mmd_test
ORACLE["embedding_mmd_test"] = EMBEDDING_MMD_SQL


# ---------------------------------------------------------------------------
# embedding_energy_distance — metric two-sample test (round 10)
# ---------------------------------------------------------------------------


def embedding_energy_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-distance two-sample test (Székely & Rizzo 2004) between
    label-0 and label-1 embeddings: E = 2·E‖x−y‖ − E‖x−x′‖ − E‖y−y′‖,
    zero iff the distributions coincide — the kernel-free sibling of
    embedding_mmd_test (no bandwidth to pick: where MMD's fixed-γ RBF
    can saturate on far-apart clusters, the raw metric keeps
    resolving), the second opinion a drift monitor wants before
    paging on a distribution alarm.

    Determinism: same discipline as MMD — in-plan stride sample
    (vec_id % GREATEST(n DIV 400, 1) = 0) bounds every pair block at
    ~400² at ANY corpus size; per-pair ‖x−y‖ is the float→double fold
    + ONE sqrt, ROUND·1e6 to an integer PER TERM (transcendental
    rule); block means are integer DIVs and the close is exact e6
    arithmetic.

    Scale: stride-filter → broadcast-size sample, three bounded
    blocks, corpus scanned once."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    nrow = e.groupBy((F.col("label") % 2).alias("g")).agg(F.count(F.lit(1)).alias("c"))
    stride = nrow.agg(F.expr("CAST(GREATEST(MAX(c) DIV 400, 1) AS BIGINT)").alias("k"))
    s = (
        e.crossJoin(F.broadcast(stride))
        .where(F.expr("vec_id % k = 0"))
        .select("vec_id", (F.col("label") % 2).alias("g"), F.col("embedding").alias("v"))
        .localCheckpoint(eager=True)
    )
    d2 = (
        "aggregate(zip_with(a.v, b.v, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    dist = f"CAST(ROUND(SQRT({d2}) * 1000000) AS BIGINT)"
    a = s.alias("a")
    b = s.alias("b")
    pairs = a.join(b, F.expr("a.vec_id < b.vec_id") | (F.expr("a.g < b.g"))).where(
        F.expr("a.vec_id <> b.vec_id")
    )
    blocks = pairs.select(
        F.expr("a.g").alias("ga"),
        F.expr("b.g").alias("gb"),
        F.expr(dist).alias("d_e6"),
    ).where(F.expr("ga <= gb"))
    agg = blocks.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("d_e6").cast("bigint").alias("s"),
    )
    piv = agg.select(
        F.expr(
            "CASE WHEN ga = 0 AND gb = 0 THEN 'xx' WHEN ga = 1 AND gb = 1 THEN 'yy'"
            " ELSE 'xy' END"
        ).alias("blk"),
        "n",
        "s",
    )
    wide = piv.groupBy().pivot("blk", ["xx", "yy", "xy"]).agg(
        F.first("n").alias("n"), F.first("s").alias("s")
    )
    return wide.select(
        F.col("xx_n").cast("bigint").alias("n_xx_pairs"),
        F.col("yy_n").cast("bigint").alias("n_yy_pairs"),
        F.col("xy_n").cast("bigint").alias("n_xy_pairs"),
        F.expr(
            "CAST(2 * (xy_s DIV xy_n) - xx_s DIV xx_n - yy_s DIV yy_n AS BIGINT)"
        ).alias("energy_e6"),
    )


EMBEDDING_ENERGY_SQL = """
WITH nrow AS (
  SELECT CAST(GREATEST(MAX(c) // 400, 1) AS BIGINT) AS k
  FROM (SELECT label % 2 AS g, COUNT(*) AS c FROM embeddings GROUP BY 1)
),
s AS (
  SELECT vec_id, label % 2 AS g, embedding AS v
  FROM embeddings, nrow WHERE vec_id % nrow.k = 0
),
pairs AS (
  SELECT a.g AS ga, b.g AS gb,
         CAST(ROUND(SQRT((
           SELECT SUM((CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE))
                      * (CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE)))
           FROM (SELECT UNNEST(a.v) AS xa, UNNEST(b.v) AS xb)
         )) * 1000000) AS BIGINT) AS d_e6
  FROM s a JOIN s b
    ON (a.vec_id < b.vec_id OR a.g < b.g) AND a.vec_id <> b.vec_id
  WHERE a.g <= b.g
),
agg AS (
  SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d_e6) AS BIGINT) AS s
  FROM pairs GROUP BY 1, 2
)
SELECT
  (SELECT n FROM agg WHERE ga = 0 AND gb = 0) AS n_xx_pairs,
  (SELECT n FROM agg WHERE ga = 1 AND gb = 1) AS n_yy_pairs,
  (SELECT n FROM agg WHERE ga = 0 AND gb = 1) AS n_xy_pairs,
  CAST(2 * ((SELECT s FROM agg WHERE ga = 0 AND gb = 1) // (SELECT n FROM agg WHERE ga = 0 AND gb = 1))
       - (SELECT s FROM agg WHERE ga = 0 AND gb = 0) // (SELECT n FROM agg WHERE ga = 0 AND gb = 0)
       - (SELECT s FROM agg WHERE ga = 1 AND gb = 1) // (SELECT n FROM agg WHERE ga = 1 AND gb = 1)
       AS BIGINT) AS energy_e6
"""

QUERIES["embedding_energy_distance"] = embedding_energy_distance
ORACLE["embedding_energy_distance"] = EMBEDDING_ENERGY_SQL


# ---------------------------------------------------------------------------
# embedding_cka — linear CKA between embedding halves (round 10)
# ---------------------------------------------------------------------------

# engine-portable first-byte hash of vec_id (two md5 nibbles via ANSI
# position(); valid verbatim in Spark SQL and DuckDB) — the in-plan
# stride-proof sampling coin (sf1 ids stride by 1e8, so `% k`
# residues are NOT uniform there; a hash coin is).
_CKA_BYTE = (
    "(CAST(position(substr(md5(CAST(vec_id AS STRING)), 1, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT) * 16"
    " + CAST(position(substr(md5(CAST(vec_id AS STRING)), 2, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT))"
)
_CKA_CAP = 2000  # expected sample rows at any corpus size


def embedding_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear CKA (centered-kernel-alignment, Kornblith et al. 2019)
    between the FIRST 32 and LAST 32 embedding dimensions:
    CKA = ‖Cov(X,Y)‖²_F / (‖Cov(X,X)‖_F·‖Cov(Y,Y)‖_F). High CKA says
    the two halves encode the same geometry — i.e. the vector is
    redundant and the store can truncate to half width (the decision
    metric behind embedding_truncation_recall; this measures WHY the
    recall survives, not just whether).

    Determinism: rows sample by an md5-byte coin with an in-plan
    cross-multiplied threshold (byte·n < 256·2000 ⇒ ~2000 rows at ANY
    corpus size, stride-proof vs the sf1 1e8 id strides); elements
    quantize float→double→ROUND·1e6 to integers; each of the 64×64
    cross-moment cells S_ij = mΣxy − ΣxΣy is an exact integer,
    ratio-preservingly downscaled (DIV m·1000, re-CAST DECIMAL(38,0)
    per the r8 DIV-returns-LONG rule) before squaring so the
    Frobenius sums stay inside 38 digits; ONE double division + sqrt
    at emission.

    Scale: the corpus is scanned once for the count and once for the
    coin filter; everything after runs on the ~2000-row checkpointed
    sample (3 readers) fanned against a broadcast 4096-cell grid —
    work is O(cap·d²) regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ntot = e.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tot"))
    samp = (
        e.crossJoin(F.broadcast(ntot))
        .where(F.expr(f"{_CKA_BYTE} * n_tot < 256 * {_CKA_CAP}"))
        .select("vec_id", "embedding")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    m = samp.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"))
    grid = spark.range(0, 64 * 64).select(
        F.expr("CAST(id DIV 64 AS INT) + 1").alias("i"),
        F.expr("CAST(id % 64 AS INT) + 1").alias("j"),
    )
    qexpr = "CAST(ROUND(CAST(element_at(embedding, {p}) AS DOUBLE) * 1000000) AS BIGINT)"
    prods = (
        samp.crossJoin(F.broadcast(grid))
        .select(
            "i",
            "j",
            F.expr(
                f"CAST({qexpr.format(p='i')} AS DECIMAL(38,0)) * {qexpr.format(p='j')}"
            ).alias("pxy"),
        )
        .groupBy("i", "j")
        .agg(F.expr("CAST(SUM(pxy) AS DECIMAL(38,0))").alias("sxy"))
    )
    dims = spark.range(1, 65).select(F.expr("CAST(id AS INT)").alias("p"))
    sums = (
        samp.crossJoin(F.broadcast(dims))
        .select("p", F.expr(qexpr.format(p="p")).alias("x"))
        .groupBy("p")
        .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("s"))
    )
    si = sums.select(F.col("p").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("p").alias("j"), F.col("s").alias("sj"))
    cells = (
        prods.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(m))
        .select(
            "i",
            "j",
            F.expr(
                "CAST((m * sxy - si * sj) DIV (m * 1000) AS DECIMAL(38,0))"
            ).alias("q"),
        )
    )
    h = cells.agg(
        F.expr("SUM(CASE WHEN i <= 32 AND j <= 32 THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END)").alias("hxx"),
        F.expr("SUM(CASE WHEN i <= 32 AND j > 32 THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END)").alias("hxy"),
        F.expr("SUM(CASE WHEN i > 32 AND j > 32 THEN q * q ELSE CAST(0 AS DECIMAL(38,0)) END)").alias("hyy"),
    )
    return h.crossJoin(F.broadcast(m)).select(
        F.col("m").alias("n_sample"),
        F.lit(64).alias("dim"),
        F.expr(
            "ROUND(CAST(hxy AS DOUBLE) / SQRT(CAST(hxx AS DOUBLE) * CAST(hyy AS DOUBLE)), 6)"
        ).alias("cka"),
    )


EMBEDDING_CKA_SQL = f"""
WITH ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM embeddings),
samp AS (
  SELECT vec_id, embedding FROM embeddings, ntot
  WHERE {_CKA_BYTE} * n_tot < 256 * {_CKA_CAP}
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM samp),
grid AS (
  SELECT CAST(gi.i AS INTEGER) AS i, CAST(gj.j AS INTEGER) AS j
  FROM generate_series(1, 64) gi(i), generate_series(1, 64) gj(j)
),
prods AS (
  SELECT i, j,
         CAST(SUM(CAST(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS HUGEINT)
                  * CAST(ROUND(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT)) AS HUGEINT) AS sxy
  FROM samp, grid GROUP BY 1, 2
),
sums AS (
  SELECT CAST(g.p AS INTEGER) AS p,
         CAST(SUM(CAST(CAST(ROUND(CAST(embedding[g.p] AS DOUBLE) * 1000000) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS s
  FROM samp, generate_series(1, 64) g(p) GROUP BY 1
),
cells AS (
  SELECT p.i, p.j,
         CAST((m.m * p.sxy - a.s * b.s) // (m.m * 1000) AS HUGEINT) AS q
  FROM prods p, m, sums a, sums b
  WHERE a.p = p.i AND b.p = p.j
),
h AS (
  SELECT SUM(CASE WHEN i <= 32 AND j <= 32 THEN q * q ELSE CAST(0 AS HUGEINT) END) AS hxx,
         SUM(CASE WHEN i <= 32 AND j > 32 THEN q * q ELSE CAST(0 AS HUGEINT) END) AS hxy,
         SUM(CASE WHEN i > 32 AND j > 32 THEN q * q ELSE CAST(0 AS HUGEINT) END) AS hyy
  FROM cells
)
SELECT m.m AS n_sample,
       CAST(64 AS INTEGER) AS dim,
       ROUND(CAST(h.hxy AS DOUBLE) / SQRT(CAST(h.hxx AS DOUBLE) * CAST(h.hyy AS DOUBLE)), 6) AS cka
FROM h, m
"""

QUERIES["embedding_cka"] = embedding_cka
ORACLE["embedding_cka"] = EMBEDDING_CKA_SQL


# ---------------------------------------------------------------------------
# embedding_label_knn_purity — kNN label-agreement audit (round 10)
# ---------------------------------------------------------------------------

_KNN_Q_BYTE = _CKA_BYTE  # first md5 byte — query coin
_KNN_C_BYTE = (
    "(CAST(position(substr(md5(CAST(vec_id AS STRING)), 3, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT) * 16"
    " + CAST(position(substr(md5(CAST(vec_id AS STRING)), 4, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT))"
)
_KNN_Q_CAP = 300
_KNN_C_CAP = 1200


def embedding_label_knn_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-NN label-agreement purity per label: for ~300 sampled query
    vectors, find their 5 nearest neighbors in an independently
    sampled ~1200-vector candidate pool and ask whether the majority
    neighbor label matches the query's own — the CLASSIFICATION view
    of embedding quality (silhouette/triplet measure geometry;
    this measures whether the geometry actually predicts the label,
    which is what a retrieval-augmented labeler will experience).

    Determinism: two INDEPENDENT md5-byte coins (hex digits 1-2 vs
    3-4 of the same hash) with in-plan cross-multiplied thresholds
    bound the pair block at 300·1200 at ANY corpus size; per-pair
    squared distance is the float→double fold rounded e6 per pair;
    neighbor rank ties break on (d², vec_id); majority ties break to
    the smallest label via a MIN((5−cnt)·16 + label) encoding (the
    r10 MAX_BY-tie lesson).

    Scale: corpus scanned twice for the two coin filters; everything
    else runs on the checkpointed sample blocks."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    ntot = e.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tot"))
    en = e.crossJoin(F.broadcast(ntot))
    qs = (
        en.where(F.expr(f"{_KNN_Q_BYTE} * n_tot < 256 * {_KNN_Q_CAP}"))
        .select(
            F.col("vec_id").alias("qid"),
            F.col("label").alias("qlab"),
            F.col("embedding").alias("qv"),
        )
        .localCheckpoint(eager=True)
    )
    cs = (
        en.where(F.expr(f"{_KNN_C_BYTE} * n_tot < 256 * {_KNN_C_CAP}"))
        .select(
            F.col("vec_id").alias("cid"),
            F.col("label").alias("clab"),
            F.col("embedding").alias("cv"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    d2 = (
        "CAST(ROUND(aggregate(zip_with(qv, cv, (x, y) ->"
        " (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t) * 1000000) AS BIGINT)"
    )
    pairs = (
        cs.crossJoin(F.broadcast(qs))
        .where(F.expr("qid <> cid"))
        .select("qid", "qlab", "clab", "cid", F.expr(d2).alias("d2_e6"))
    )
    wk = Window.partitionBy("qid").orderBy("d2_e6", "cid")
    top = pairs.withColumn("rn", F.row_number().over(wk)).where(F.col("rn") <= 5)
    votes = top.groupBy("qid", "qlab", "clab").agg(F.count(F.lit(1)).alias("cnt"))
    pred = votes.groupBy("qid", "qlab").agg(
        F.expr("MIN((5 - cnt) * 16 + clab) % 16").alias("pred_lab")
    )
    per = pred.groupBy(F.col("qlab").alias("label")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_queries"),
        F.expr("CAST(SUM(CASE WHEN pred_lab = qlab THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_correct"
        ),
    )
    return per.select(
        "label",
        "n_queries",
        "n_correct",
        F.expr("n_correct * 1000000 DIV GREATEST(n_queries, 1)").alias("purity_ppm"),
    ).orderBy("label")


EMBEDDING_KNN_PURITY_SQL = f"""
WITH ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM embeddings),
qs AS MATERIALIZED (
  SELECT vec_id AS qid, label AS qlab, embedding AS qv FROM embeddings, ntot
  WHERE {_KNN_Q_BYTE} * n_tot < 256 * {_KNN_Q_CAP}
),
cs AS MATERIALIZED (
  SELECT vec_id AS cid, label AS clab, embedding AS cv FROM embeddings, ntot
  WHERE {_KNN_C_BYTE} * n_tot < 256 * {_KNN_C_CAP}
),
pairs AS (
  SELECT qid, qlab, clab, cid,
         CAST(ROUND((
           SELECT SUM((CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE))
                      * (CAST(xa AS DOUBLE) - CAST(xb AS DOUBLE)))
           FROM (SELECT UNNEST(qv) AS xa, UNNEST(cv) AS xb)
         ) * 1000000) AS BIGINT) AS d2_e6
  FROM qs, cs WHERE qid <> cid
),
top AS (
  SELECT * FROM (
    SELECT qid, qlab, clab,
           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d2_e6, cid) AS rn
    FROM pairs
  ) WHERE rn <= 5
),
votes AS (
  SELECT qid, qlab, clab, COUNT(*) AS cnt FROM top GROUP BY 1, 2, 3
),
pred AS (
  SELECT qid, qlab, MIN((5 - cnt) * 16 + clab) % 16 AS pred_lab
  FROM votes GROUP BY 1, 2
),
per AS (
  SELECT qlab AS label,
         CAST(COUNT(*) AS BIGINT) AS n_queries,
         CAST(SUM(CASE WHEN pred_lab = qlab THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
  FROM pred GROUP BY 1
)
SELECT label, n_queries, n_correct,
       CAST(n_correct * 1000000 // GREATEST(n_queries, 1) AS BIGINT) AS purity_ppm
FROM per
ORDER BY label
"""

QUERIES["embedding_label_knn_purity"] = embedding_label_knn_purity
ORACLE["embedding_label_knn_purity"] = EMBEDDING_KNN_PURITY_SQL


# ---------------------------------------------------------------------------
# embedding_label_centroid_confusion — nearest-centroid classifier
# audit (round 10)
# ---------------------------------------------------------------------------


def embedding_label_centroid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid (Rocchio) classification confusion matrix
    over the labeled embeddings: every vector is classified to its
    nearest label centroid and the (true, predicted) counts are
    emitted — the PARAMETRIC sibling of embedding_label_knn_purity
    (kNN sees local structure; the centroid sees whether classes are
    linearly separated around their means — when kNN purity is high
    but centroid accuracy is low, classes are multi-modal and a
    per-class prototype index will misroute).

    FULLY INTEGER, no sampling needed: the op is LINEAR in the
    corpus (n·|labels| distances, never a pair join) — elements
    quantize float→double→e6 integers, centroids are exact Σx_e6 DIV
    n per dimension, distances are exact BIGINT Σ(x−c)² (≤ 64·4e12),
    prediction ties break to the smallest label via MIN(d²·16+label).

    Scale: one posexplode shuffle to (dim,label) cells for the
    centroids (640 groups), one broadcast join back, one (vec,label)
    agg of 10·64·n map-side rows — all whole-stage JVM."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    e = e.repartition(32)
    pts = e.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "xf"),
    ).select(
        "vec_id",
        "label",
        "pos",
        F.expr("CAST(ROUND(CAST(xf AS DOUBLE) * 1000000) AS BIGINT)").alias("x"),
    )
    cent = pts.groupBy(F.col("label").alias("clab"), "pos").agg(
        F.expr("CAST(SUM(x) DIV COUNT(*) AS BIGINT)").alias("c")
    )
    dists = (
        pts.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clab")
        .agg(F.expr("CAST(SUM((x - c) * (x - c)) AS BIGINT)").alias("d2"))
    )
    pred = dists.groupBy("vec_id", "label").agg(
        F.expr("CAST(MIN(d2 * 16 + clab) % 16 AS INT)").alias("pred_label")
    )
    conf = pred.groupBy(F.col("label").alias("true_label"), "pred_label").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")
    )
    wrow = Window.partitionBy("true_label")
    return (
        conf.withColumn("row_n", F.sum("n").over(wrow))
        .select(
            "true_label",
            "pred_label",
            "n",
            F.expr("n * 1000000 DIV row_n").alias("row_share_ppm"),
        )
        .orderBy("true_label", "pred_label")
    )


EMBEDDING_CENTROID_CONF_SQL = """
WITH pts AS MATERIALIZED (
  SELECT vec_id, label,
         CAST(generate_subscripts(embedding, 1) AS INTEGER) AS pos,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings
),
cent AS (
  SELECT label AS clab, pos, CAST(SUM(x) // COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2
),
dists AS (
  SELECT p.vec_id, p.label, ct.clab,
         CAST(SUM((p.x - ct.c) * (p.x - ct.c)) AS BIGINT) AS d2
  FROM pts p JOIN cent ct ON p.pos = ct.pos
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT vec_id, label, CAST(MIN(d2 * 16 + clab) % 16 AS INTEGER) AS pred_label
  FROM dists GROUP BY 1, 2
),
conf AS (
  SELECT label AS true_label, pred_label, CAST(COUNT(*) AS BIGINT) AS n
  FROM pred GROUP BY 1, 2
)
SELECT true_label, pred_label, n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY true_label) AS BIGINT) AS row_share_ppm
FROM conf
ORDER BY true_label, pred_label
"""

QUERIES["embedding_label_centroid_confusion"] = embedding_label_centroid_confusion
ORACLE["embedding_label_centroid_confusion"] = EMBEDDING_CENTROID_CONF_SQL


# ---------------------------------------------------------------------------
# embedding_sq8_distortion — scalar-quantization round-trip audit
# (round 10)
# ---------------------------------------------------------------------------


def embedding_sq8_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 round-trip distortion audit: quantize each vector with
    the store's own scheme (embedding_quantize: per-vector scale =
    max|x|/127, codes = round(x/scale)), reconstruct, and report the
    corpus MSE / cosine-retention profile — the acceptance gate an
    embedding store runs BEFORE flipping ANN serving to int8 codes
    (embedding_quantize emits the codes; this measures what they
    cost).

    Determinism: per-vector folds are sequential array-order
    aggregates (bit-identical both engines, the module's house
    contract); MSE and cosine retention round ONCE per vector to
    e9/e6 integers, corpus stats are integer sums/DIVs; the p95 is a
    ceil-rank order statistic over the e3-bucketed MSE histogram
    (bounded distinct values at any corpus size).

    Scale: one scan, map-side per-vector math, one bounded-histogram
    CDF — linear, shuffle-free except two tiny aggs."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    e = e.repartition(32)
    per = e.select(
        F.expr(
            "GREATEST(aggregate(embedding, CAST(0.0 AS DOUBLE),"
            " (a, x) -> GREATEST(a, ABS(CAST(x AS DOUBLE)))), CAST(1e-12 AS DOUBLE))"
            " / CAST(127 AS DOUBLE)"
        ).alias("scale"),
        F.col("embedding").alias("v"),
    ).select(
        F.expr(
            "CAST(ROUND(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) ->"
            " a + (CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / scale) * scale)"
            " * (CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / scale) * scale))"
            " / CAST(64 AS DOUBLE) * CAST(1000000000 AS DOUBLE)) AS BIGINT)"
        ).alias("mse_e9"),
        F.expr(
            "CAST(ROUND("
            " aggregate(v, CAST(0.0 AS DOUBLE), (a, x) ->"
            "  a + CAST(x AS DOUBLE) * (ROUND(CAST(x AS DOUBLE) / scale) * scale))"
            " / (SQRT(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) ->"
            "  a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
            " * SQRT(aggregate(v, CAST(0.0 AS DOUBLE), (a, x) ->"
            "  a + (ROUND(CAST(x AS DOUBLE) / scale) * scale)"
            "  * (ROUND(CAST(x AS DOUBLE) / scale) * scale))))"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("cos_e6"),
    ).localCheckpoint(eager=True)
    hist = per.groupBy(F.expr("mse_e9 DIV 1000000").alias("bk")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wc = Window.orderBy("bk").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    p95 = (
        hist.withColumn("cum", F.sum("c").over(wc).cast("bigint"))
        .withColumn("n", F.sum("c").over(wall).cast("bigint"))
        .agg(
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * 95, F.col("bk"))
            ).alias("p95_bucket")
        )
    )
    agg = per.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_vecs"),
        F.expr("CAST(SUM(mse_e9) DIV COUNT(*) AS BIGINT)").alias("mean_mse_e9"),
        F.expr("CAST(MAX(mse_e9) AS BIGINT)").alias("max_mse_e9"),
        F.expr("CAST(SUM(cos_e6) DIV COUNT(*) AS BIGINT)").alias("mean_cos_retention_e6"),
        F.expr("CAST(MIN(cos_e6) AS BIGINT)").alias("min_cos_retention_e6"),
    )
    return agg.crossJoin(F.broadcast(p95)).select(
        "n_vecs",
        "mean_mse_e9",
        "max_mse_e9",
        F.expr("CAST(p95_bucket AS BIGINT)").alias("p95_mse_bucket_e3"),
        "mean_cos_retention_e6",
        "min_cos_retention_e6",
    )


EMBEDDING_SQ8_SQL = """
WITH per AS MATERIALIZED (
  SELECT
    CAST(ROUND((
      SELECT SUM((CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / s.scale) * s.scale)
                 * (CAST(x AS DOUBLE) - ROUND(CAST(x AS DOUBLE) / s.scale) * s.scale))
      FROM (SELECT UNNEST(e.embedding) AS x)
    ) / CAST(64 AS DOUBLE) * CAST(1000000000 AS DOUBLE)) AS BIGINT) AS mse_e9,
    CAST(ROUND((
      SELECT SUM(CAST(x AS DOUBLE) * (ROUND(CAST(x AS DOUBLE) / s.scale) * s.scale))
      FROM (SELECT UNNEST(e.embedding) AS x)
    ) / (SQRT((
      SELECT SUM(CAST(x AS DOUBLE) * CAST(x AS DOUBLE))
      FROM (SELECT UNNEST(e.embedding) AS x)
    )) * SQRT((
      SELECT SUM((ROUND(CAST(x AS DOUBLE) / s.scale) * s.scale)
                 * (ROUND(CAST(x AS DOUBLE) / s.scale) * s.scale))
      FROM (SELECT UNNEST(e.embedding) AS x)
    ))) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS cos_e6
  FROM embeddings e,
       LATERAL (SELECT GREATEST((
         SELECT MAX(ABS(CAST(x AS DOUBLE))) FROM (SELECT UNNEST(e.embedding) AS x)
       ), CAST(1e-12 AS DOUBLE)) / CAST(127 AS DOUBLE) AS scale) s
),
hist AS (
  SELECT mse_e9 // 1000000 AS bk, CAST(COUNT(*) AS BIGINT) AS c FROM per GROUP BY 1
),
cdf AS (
  SELECT bk, CAST(SUM(c) OVER (ORDER BY bk ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM hist
),
p95 AS (
  SELECT MIN(CASE WHEN cum * 100 >= n * 95 THEN bk END) AS p95_bucket FROM cdf
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
         CAST(SUM(mse_e9) // COUNT(*) AS BIGINT) AS mean_mse_e9,
         CAST(MAX(mse_e9) AS BIGINT) AS max_mse_e9,
         CAST(SUM(cos_e6) // COUNT(*) AS BIGINT) AS mean_cos_retention_e6,
         CAST(MIN(cos_e6) AS BIGINT) AS min_cos_retention_e6
  FROM per
)
SELECT a.n_vecs, a.mean_mse_e9, a.max_mse_e9,
       CAST(p.p95_bucket AS BIGINT) AS p95_mse_bucket_e3,
       a.mean_cos_retention_e6, a.min_cos_retention_e6
FROM agg a, p95 p
"""

QUERIES["embedding_sq8_distortion"] = embedding_sq8_distortion
ORACLE["embedding_sq8_distortion"] = EMBEDDING_SQ8_SQL


# ---------------------------------------------------------------------------
# embedding_binary_sign_recall — 1-bit quantization retrieval eval
# (round 10)
# ---------------------------------------------------------------------------

_BSR_Q_CAP = 100
_BSR_C_CAP = 1200


def embedding_binary_sign_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary (sign-bit) quantization retrieval eval: rank candidates
    by Hamming distance between sign patterns and measure recall@10
    against the exact float-cosine top-10 — the acceptance test for
    the 32×-compression binary index tier (embedding_sq8_distortion
    answers the same question for int8; this is the 1-bit extreme,
    and the recall histogram says whether it can serve as a coarse
    pre-filter). Emits the full 11-bucket recall histogram, not just
    the mean — binary quantization fails UNEVENLY.

    Determinism: the same two independent md5-byte coins as
    embedding_label_knn_purity bound the block at 100·1200; Hamming
    distance is a pure integer sign-mismatch count (no packing
    needed at d=64); cosine truth is the e6-rounded float→double
    fold with (score, vec_id) rank ties; recall is integer counts.

    Scale: bounded sample blocks, one rank window each — candidate
    work is O(cap²), corpus-size-independent."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ntot = e.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tot"))
    en = e.crossJoin(F.broadcast(ntot))
    qs = (
        en.where(F.expr(f"{_KNN_Q_BYTE} * n_tot < 256 * {_BSR_Q_CAP}"))
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .localCheckpoint(eager=True)
    )
    cs = (
        en.where(F.expr(f"{_KNN_C_BYTE} * n_tot < 256 * {_BSR_C_CAP}"))
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    dot = (
        "aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    ham = (
        "aggregate(zip_with(qv, cv, (x, y) ->"
        " CASE WHEN (x >= CAST(0 AS FLOAT)) = (y >= CAST(0 AS FLOAT))"
        " THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END),"
        " CAST(0 AS BIGINT), (acc, t) -> acc + t)"
    )
    pairs = (
        cs.crossJoin(F.broadcast(qs))
        .where(F.expr("qid <> cid"))
        .select(
            "qid",
            "cid",
            F.expr(f"CAST(ROUND({dot} * 1000000) AS BIGINT)").alias("cos_e6"),
            F.expr(ham).alias("hdist"),
        )
        .localCheckpoint(eager=True)
    )
    wt = Window.partitionBy("qid").orderBy(F.col("cos_e6").desc(), "cid")
    wh = Window.partitionBy("qid").orderBy("hdist", "cid")
    ranked = pairs.select(
        "qid",
        "cid",
        F.row_number().over(wt).alias("rt"),
        F.row_number().over(wh).alias("rh"),
    )
    rec = (
        ranked.where(F.expr("rt <= 10"))
        .groupBy("qid")
        .agg(F.expr("CAST(SUM(CASE WHEN rh <= 10 THEN 1 ELSE 0 END) AS BIGINT)").alias("hits"))
    )
    grid = spark.range(0, 11).select(F.expr("CAST(id AS INT)").alias("hits_at_10"))
    per = rec.groupBy(F.expr("CAST(hits AS INT)").alias("hits_at_10")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_queries")
    )
    tot = rec.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_total"),
        F.expr("CAST(SUM(hits) AS BIGINT)").alias("total_hits"),
    )
    return (
        grid.join(per, "hits_at_10", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "hits_at_10",
            F.expr("COALESCE(n_queries, CAST(0 AS BIGINT))").alias("n_queries"),
            "n_total",
            F.expr("total_hits * 1000000 DIV (n_total * 10)").alias("mean_recall_ppm"),
        )
        .orderBy("hits_at_10")
    )


EMBEDDING_BSR_SQL = f"""
WITH ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM embeddings),
qs AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings, ntot
  WHERE {_KNN_Q_BYTE} * n_tot < 256 * {_BSR_Q_CAP}
),
cs AS MATERIALIZED (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings, ntot
  WHERE {_KNN_C_BYTE} * n_tot < 256 * {_BSR_C_CAP}
),
pairs AS MATERIALIZED (
  SELECT qid, cid,
         CAST(ROUND((
           SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT UNNEST(qv) AS xa, UNNEST(cv) AS xb)
         ) * 1000000) AS BIGINT) AS cos_e6,
         (
           SELECT CAST(SUM(CASE WHEN (xa >= 0) = (xb >= 0) THEN 0 ELSE 1 END) AS BIGINT)
           FROM (SELECT UNNEST(qv) AS xa, UNNEST(cv) AS xb)
         ) AS hdist
  FROM qs, cs WHERE qid <> cid
),
ranked AS (
  SELECT qid, cid,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, cid) AS rt,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hdist, cid) AS rh
  FROM pairs
),
rec AS (
  SELECT qid, CAST(SUM(CASE WHEN rh <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM ranked WHERE rt <= 10 GROUP BY 1
),
per AS (
  SELECT CAST(hits AS INTEGER) AS hits_at_10, CAST(COUNT(*) AS BIGINT) AS n_queries
  FROM rec GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total, CAST(SUM(hits) AS BIGINT) AS total_hits
  FROM rec
)
SELECT g.hits_at_10,
       COALESCE(p.n_queries, CAST(0 AS BIGINT)) AS n_queries,
       t.n_total,
       CAST(t.total_hits * 1000000 // (t.n_total * 10) AS BIGINT) AS mean_recall_ppm
FROM (SELECT CAST(UNNEST(generate_series(0, 10)) AS INTEGER) AS hits_at_10) g
LEFT JOIN per p ON g.hits_at_10 = p.hits_at_10, tot t
ORDER BY g.hits_at_10
"""

QUERIES["embedding_binary_sign_recall"] = embedding_binary_sign_recall
ORACLE["embedding_binary_sign_recall"] = EMBEDDING_BSR_SQL


# ---------------------------------------------------------------------------
# embedding_participation_ratio — effective dimensionality of the
# embedding cloud via the covariance participation ratio.


def embedding_participation_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Participation ratio PR = (tr C)² / ‖C‖²_F = (Σλ)²/Σλ² of the
    embedding covariance — the standard effective-dimensionality
    estimate (how many principal directions carry the variance)
    WITHOUT an eigensolve: trace and Frobenius norm are closed-form
    covariance contractions. PR ≈ d says isotropic use of the space;
    PR ≪ d says the store pays for dimensions it doesn't use (the
    one-number companion to embedding_anisotropy/embedding_cka).

    Determinism: the md5-first-byte coin caps the sample ~2000 rows
    at ANY corpus size (cross-multiplied in-plan threshold,
    stride-proof vs the sf1 1e8 id strides); elements quantize
    float→double→ROUND·1e6; each covariance cell m·S_ij − s_i·s_j is
    an exact integer, ratio-preservingly downscaled (DIV m·1000,
    re-CAST DECIMAL(38,0) per the r8 rule) before the trace /
    squared-Frobenius folds, which stay scale-0 integers (so the
    closing DECIMAL→DOUBLE casts are single correctly-rounded
    conversions at any magnitude); ONE IEEE division + 6dp round.

    Scale: corpus scanned twice (count + coin filter); the 64×64
    grid fan-out runs on the ~2000-row checkpointed sample — work is
    O(cap·d²) regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ntot = e.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tot"))
    samp = (
        e.crossJoin(F.broadcast(ntot))
        .where(F.expr(f"{_CKA_BYTE} * n_tot < 256 * {_CKA_CAP}"))
        .select("vec_id", "embedding")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    m = samp.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"))
    grid = spark.range(0, 64 * 64).select(
        F.expr("CAST(id DIV 64 AS INT) + 1").alias("i"),
        F.expr("CAST(id % 64 AS INT) + 1").alias("j"),
    )
    qexpr = "CAST(ROUND(CAST(element_at(embedding, {p}) AS DOUBLE) * 1000000) AS BIGINT)"
    prods = (
        samp.crossJoin(F.broadcast(grid))
        .select(
            "i",
            "j",
            F.expr(
                f"CAST({qexpr.format(p='i')} AS DECIMAL(38,0)) * {qexpr.format(p='j')}"
            ).alias("pxy"),
        )
        .groupBy("i", "j")
        .agg(F.expr("CAST(SUM(pxy) AS DECIMAL(38,0))").alias("sxy"))
    )
    dims = spark.range(1, 65).select(F.expr("CAST(id AS INT)").alias("p"))
    sums = (
        samp.crossJoin(F.broadcast(dims))
        .select("p", F.expr(qexpr.format(p="p")).alias("x"))
        .groupBy("p")
        .agg(F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("s"))
    )
    si = sums.select(F.col("p").alias("i"), F.col("s").alias("si"))
    sj = sums.select(F.col("p").alias("j"), F.col("s").alias("sj"))
    cells = (
        prods.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .crossJoin(F.broadcast(m))
        .select(
            "i",
            "j",
            F.expr(
                "CAST((m * sxy - si * sj) DIV (m * 1000) AS DECIMAL(38,0))"
            ).alias("q"),
        )
    )
    h = cells.agg(
        F.expr(
            "CAST(SUM(CASE WHEN i = j THEN q ELSE CAST(0 AS DECIMAL(38,0)) END)"
            " AS DECIMAL(38,0))"
        ).alias("tr"),
        F.expr("SUM(q * q)").alias("frob"),
    )
    return h.crossJoin(F.broadcast(m)).select(
        F.col("m").alias("n_sample"),
        F.lit(64).alias("dim"),
        F.expr("CAST(tr AS BIGINT)").alias("trace_q"),
        F.expr(
            "ROUND(CAST(tr * tr AS DOUBLE) / CAST(frob AS DOUBLE), 6)"
        ).alias("participation_ratio"),
        F.expr(
            "ROUND(CAST(tr * tr AS DOUBLE) / CAST(frob AS DOUBLE) / CAST(64 AS DOUBLE), 6)"
        ).alias("effective_dim_frac"),
    )


EMBEDDING_PR_SQL = f"""
WITH ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM embeddings),
samp AS (
  SELECT vec_id, embedding FROM embeddings, ntot
  WHERE {_CKA_BYTE} * n_tot < 256 * {_CKA_CAP}
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM samp),
grid AS (
  SELECT CAST(gi.i AS INTEGER) AS i, CAST(gj.j AS INTEGER) AS j
  FROM generate_series(1, 64) gi(i), generate_series(1, 64) gj(j)
),
prods AS (
  SELECT i, j,
         CAST(SUM(CAST(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS HUGEINT)
                  * CAST(ROUND(CAST(embedding[j] AS DOUBLE) * 1000000) AS BIGINT)) AS HUGEINT) AS sxy
  FROM samp, grid GROUP BY 1, 2
),
sums AS (
  SELECT CAST(g.p AS INTEGER) AS p,
         CAST(SUM(CAST(CAST(ROUND(CAST(embedding[g.p] AS DOUBLE) * 1000000) AS BIGINT) AS HUGEINT)) AS HUGEINT) AS s
  FROM samp, generate_series(1, 64) g(p) GROUP BY 1
),
cells AS (
  SELECT p.i, p.j,
         CAST((m.m * p.sxy - a.s * b.s) // (m.m * 1000) AS HUGEINT) AS q
  FROM prods p, m, sums a, sums b
  WHERE a.p = p.i AND b.p = p.j
),
h AS (
  SELECT CAST(SUM(CASE WHEN i = j THEN q ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS tr,
         SUM(q * q) AS frob
  FROM cells
)
SELECT m.m AS n_sample,
       CAST(64 AS INTEGER) AS dim,
       CAST(h.tr AS BIGINT) AS trace_q,
       ROUND(CAST(h.tr * h.tr AS DOUBLE) / CAST(h.frob AS DOUBLE), 6) AS participation_ratio,
       ROUND(CAST(h.tr * h.tr AS DOUBLE) / CAST(h.frob AS DOUBLE) / CAST(64 AS DOUBLE), 6) AS effective_dim_frac
FROM h, m
"""

QUERIES["embedding_participation_ratio"] = embedding_participation_ratio
ORACLE["embedding_participation_ratio"] = EMBEDDING_PR_SQL


# ---------------------------------------------------------------------------
# embedding_hbos_outliers — histogram-based outlier score over the
# leading embedding dimensions.

_HBOS_DIMS = 8
_HBOS_BINS = 16


def embedding_hbos_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HBOS (Goldstein & Dencker 2012) over the first 8 embedding
    dimensions, 16 equal-width bins each: score(x) = Σ_d −ln(density
    of x's bin in dim d) — the linear-time density-based outlier
    screen (LOF ranks by NEIGHBORHOOD density at pairwise cost; HBOS
    assumes feature independence and runs as pure histogram
    arithmetic, the right first pass at corpus scale). Emits the
    top-20 scores.

    Determinism: elements quantize float→double→e6 integers; bin
    index (x−min)·16 DIV (max−min+1) is pure integer (provably ≤15);
    the −ln density term is computed ONCE PER HISTOGRAM CELL (≤128
    cells — the collapse-to-histogram house rule, transcendentals
    never touch row-sized frames), e6-rounded per term (the C-vs-Java
    ulp discipline), and summed as exact BIGINTs per vector. Ranking
    key (score DESC, vec_id) — no ties left to shuffle order.

    Scale: ONE corpus scan fans ×8 against a broadcast dim list;
    per-dim min/max is an 8-row agg broadcast back; the cell
    histogram is ≤128 rows; the per-vector close is one groupBy.
    No pairwise anything — O(n·d) flat."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dims = spark.range(1, _HBOS_DIMS + 1).select(F.expr("CAST(id AS INT)").alias("d"))
    fan = e.crossJoin(F.broadcast(dims)).select(
        "vec_id",
        "d",
        F.expr(
            "CAST(ROUND(CAST(element_at(embedding, d) AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("x"),
    )
    stats = fan.groupBy("d").agg(
        F.expr("CAST(MIN(x) AS BIGINT)").alias("mn"),
        F.expr("CAST(MAX(x) AS BIGINT)").alias("mx"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
    )
    binned = fan.join(F.broadcast(stats), "d").select(
        "vec_id",
        "d",
        F.expr(f"CAST((x - mn) * {_HBOS_BINS} DIV (mx - mn + 1) AS INT)").alias("b"),
        "n",
    )
    hist = binned.groupBy("d", "b").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt"),
        F.expr("MAX(n)").alias("n"),
    )
    terms = hist.select(
        "d",
        "b",
        F.expr(
            "CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT)"
        ).alias("term_e6"),
    )
    scored = (
        binned.join(F.broadcast(terms), ["d", "b"])
        .groupBy("vec_id")
        .agg(F.expr("CAST(SUM(term_e6) AS BIGINT)").alias("hbos_e6"),
             F.expr("MAX(n)").alias("n_vecs"))
    )
    return (
        scored.orderBy(F.col("hbos_e6").desc(), F.col("vec_id"))
        .limit(20)
        .select("vec_id", "hbos_e6", F.expr("CAST(n_vecs AS BIGINT)").alias("n_vecs"))
    )


EMBEDDING_HBOS_SQL = f"""
WITH fan AS (
  SELECT vec_id, CAST(g.d AS INTEGER) AS d,
         CAST(ROUND(CAST(embedding[g.d] AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings, generate_series(1, {_HBOS_DIMS}) g(d)
),
stats AS (
  SELECT d, CAST(MIN(x) AS BIGINT) AS mn, CAST(MAX(x) AS BIGINT) AS mx,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM fan GROUP BY 1
),
binned AS (
  SELECT f.vec_id, f.d,
         CAST((f.x - s.mn) * {_HBOS_BINS} // (s.mx - s.mn + 1) AS INTEGER) AS b,
         s.n
  FROM fan f JOIN stats s ON f.d = s.d
),
hist AS (
  SELECT d, b, CAST(COUNT(*) AS BIGINT) AS cnt, MAX(n) AS n
  FROM binned GROUP BY 1, 2
),
terms AS (
  SELECT d, b,
         CAST(ROUND(-LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000) AS BIGINT) AS term_e6
  FROM hist
),
scored AS (
  SELECT bn.vec_id, CAST(SUM(t.term_e6) AS BIGINT) AS hbos_e6, CAST(MAX(bn.n) AS BIGINT) AS n_vecs
  FROM binned bn JOIN terms t ON bn.d = t.d AND bn.b = t.b
  GROUP BY 1
)
SELECT vec_id, hbos_e6, n_vecs
FROM scored
ORDER BY hbos_e6 DESC, vec_id
LIMIT 20
"""

QUERIES["embedding_hbos_outliers"] = embedding_hbos_outliers
ORACLE["embedding_hbos_outliers"] = EMBEDDING_HBOS_SQL


# ---------------------------------------------------------------------------
# embedding_csls_rerank_eval — does CSLS hubness correction change
# exact-cosine retrieval on this corpus?

_CSLS_K = 10


def embedding_csls_rerank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSLS re-ranking evaluation (Conneau et al. 2018): CSLS(x,y) =
    2·cos(x,y) − r_C(x) − r_Q(y), the hubness correction that
    penalizes points whose neighborhoods are promiscuous —
    embedding_hubness_audit DIAGNOSES hubs; this measures whether the
    standard FIX actually changes retrieval here: per query, the
    overlap between the exact-cosine top-10 and the CSLS top-10 over
    the same candidate block (10 = unchanged ranking, low = hubness
    was distorting raw cosine).

    Determinism: the bounded md5-coin sample blocks of
    embedding_binary_sign_recall (≈100 queries × ≈1200 candidates at
    ANY corpus size); cosines are e6 integers via the float→double
    zip_with discipline; the CSLS ranking key is scaled to 10·e6 —
    m = 20·cos − Σtop10cos(x over C) − Σtop10cos(y over Q) — so it is
    EXACT integer algebra with NO truncating division anywhere; all
    ranks tie-break on the candidate id.

    Scale: the pair block is coin-bounded (never corpus-quadratic);
    two rank windows + one neighbor-sum window on that block; output
    is the fixed 11-bucket overlap histogram."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ntot = e.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_tot"))
    qs = (
        e.crossJoin(F.broadcast(ntot))
        .where(F.expr(f"{_KNN_Q_BYTE} * n_tot < 256 * {_BSR_Q_CAP}"))
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .localCheckpoint(eager=True)
    )
    cs = (
        e.crossJoin(F.broadcast(ntot))
        .where(F.expr(f"{_KNN_C_BYTE} * n_tot < 256 * {_BSR_C_CAP}"))
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    dot = (
        "aggregate(zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, t) -> acc + t)"
    )
    pairs = (
        cs.crossJoin(F.broadcast(qs))
        .where(F.expr("qid <> cid"))
        .select(
            "qid",
            "cid",
            F.expr(f"CAST(ROUND({dot} * 1000000) AS BIGINT)").alias("cos_e6"),
        )
        .localCheckpoint(eager=True)
    )
    wq = Window.partitionBy("qid").orderBy(F.col("cos_e6").desc(), "cid")
    wc = Window.partitionBy("cid").orderBy(F.col("cos_e6").desc(), "qid")
    nb = pairs.select(
        "qid",
        "cid",
        "cos_e6",
        F.row_number().over(wq).alias("rq"),
        F.row_number().over(wc).alias("rc"),
    )
    sq = nb.where(F.col("rq") <= _CSLS_K).groupBy("qid").agg(
        F.expr("CAST(SUM(cos_e6) AS BIGINT)").alias("sqx")
    )
    sc = nb.where(F.col("rc") <= _CSLS_K).groupBy("cid").agg(
        F.expr("CAST(SUM(cos_e6) AS BIGINT)").alias("scy")
    )
    scored = (
        nb.join(F.broadcast(sq), "qid")
        .join(F.broadcast(sc), "cid")
        .select(
            "qid",
            "cid",
            "rq",
            F.expr("20 * cos_e6 - sqx - scy").alias("m"),
        )
    )
    wm = Window.partitionBy("qid").orderBy(F.col("m").desc(), "cid")
    ranked = scored.select("qid", "rq", F.row_number().over(wm).alias("rm"))
    rec = (
        ranked.where(F.expr("rq <= 10"))
        .groupBy("qid")
        .agg(F.expr("CAST(SUM(CASE WHEN rm <= 10 THEN 1 ELSE 0 END) AS BIGINT)").alias("hits"))
    )
    grid = spark.range(0, 11).select(F.expr("CAST(id AS INT)").alias("overlap_at_10"))
    per = rec.groupBy(F.expr("CAST(hits AS INT)").alias("overlap_at_10")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_queries")
    )
    tot = rec.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("nt"),
        F.expr("CAST(SUM(hits) AS BIGINT)").alias("th"),
    )
    return (
        grid.join(per, "overlap_at_10", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "overlap_at_10",
            F.expr("COALESCE(n_queries, CAST(0 AS BIGINT))").alias("n_queries"),
            F.expr("CAST(th * 100000 DIV (nt * 10) AS BIGINT)").alias("mean_overlap_ppm_x10"),
        )
        .orderBy("overlap_at_10")
    )


EMBEDDING_CSLS_SQL = f"""
WITH ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_tot FROM embeddings),
qs AS MATERIALIZED (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings, ntot
  WHERE {_KNN_Q_BYTE} * n_tot < 256 * {_BSR_Q_CAP}
),
cs AS MATERIALIZED (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings, ntot
  WHERE {_KNN_C_BYTE} * n_tot < 256 * {_BSR_C_CAP}
),
pairs AS MATERIALIZED (
  SELECT qid, cid,
         CAST(ROUND((
           SELECT SUM(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE))
           FROM (SELECT UNNEST(qv) AS xa, UNNEST(cv) AS xb)
         ) * 1000000) AS BIGINT) AS cos_e6
  FROM qs, cs WHERE qid <> cid
),
nb AS MATERIALIZED (
  SELECT qid, cid, cos_e6,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, cid) AS rq,
         ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cos_e6 DESC, qid) AS rc
  FROM pairs
),
sq AS MATERIALIZED (
  SELECT qid, CAST(SUM(cos_e6) AS BIGINT) AS sqx FROM nb WHERE rq <= {_CSLS_K} GROUP BY 1
),
sc AS MATERIALIZED (
  SELECT cid, CAST(SUM(cos_e6) AS BIGINT) AS scy FROM nb WHERE rc <= {_CSLS_K} GROUP BY 1
),
ranked AS MATERIALIZED (
  SELECT n.qid, n.rq,
         ROW_NUMBER() OVER (PARTITION BY n.qid
                            ORDER BY 20 * n.cos_e6 - q.sqx - c.scy DESC, n.cid) AS rm
  FROM nb n JOIN sq q ON q.qid = n.qid JOIN sc c ON c.cid = n.cid
),
rec AS MATERIALIZED (
  SELECT qid, CAST(SUM(CASE WHEN rm <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM ranked WHERE rq <= 10 GROUP BY 1
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(hits) AS BIGINT) AS th FROM rec),
grid AS (SELECT CAST(g.i AS INTEGER) AS overlap_at_10 FROM generate_series(0, 10) g(i)),
per AS (
  SELECT CAST(hits AS INTEGER) AS overlap_at_10, CAST(COUNT(*) AS BIGINT) AS n_queries
  FROM rec GROUP BY 1
)
SELECT g.overlap_at_10,
       COALESCE(p.n_queries, CAST(0 AS BIGINT)) AS n_queries,
       CAST(t.th * 100000 // (t.nt * 10) AS BIGINT) AS mean_overlap_ppm_x10
FROM grid g LEFT JOIN per p ON p.overlap_at_10 = g.overlap_at_10, tot t
ORDER BY g.overlap_at_10
"""

QUERIES["embedding_csls_rerank_eval"] = embedding_csls_rerank_eval
ORACLE["embedding_csls_rerank_eval"] = EMBEDDING_CSLS_SQL


# ---------------------------------------------------------------------------
# embedding_ood_mahalanobis — per-class diagonal-Mahalanobis OOD score.


def embedding_ood_mahalanobis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-distribution score via the minimum per-class
    diagonal Mahalanobis distance (Lee et al. 2018's Mahalanobis OOD
    detector, diagonal-covariance form): score(x) = min_c Σ_d
    (x_d − μ_cd)²/σ_d² with class means and the POOLED per-dimension
    variance — low min-distance means x sits inside some class's
    ellipsoid; the top-20 scores are the candidate outliers/ mislabeled
    rows. embedding_centroid_outliers ranks by raw distance to the
    global centroid; this is the class-conditional, scale-normalized
    upgrade (a dimension with natural spread no longer dominates).

    Determinism: elements quantize to e6 integers; class-mean
    numerators S_cd and counts n_c stay EXACT (the per-dim deviation
    is cross-multiplied: dx = x·n_c − S_cd, its square divided by
    n_c² inline), the pooled variance is the exact integer
    (n·ΣX² − (ΣX)²) DIV n² per dim (GREATEST 1); each of the 64
    per-dim terms closes with ONE truncating DIV to e3 units and the
    rest is integer sums/MIN. Ties break on class id, then vec_id.

    Scale: one scan fans ×64 against the broadcast dim list; class
    stats are a 10×64 agg broadcast back; per-row scoring joins the
    640-cell model table map-side — O(n·d·c) flat, no pairwise."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label", "embedding")
    dims = spark.range(1, 65).select(F.expr("CAST(id AS INT)").alias("d"))
    fan = e.crossJoin(F.broadcast(dims)).select(
        "vec_id",
        "label",
        "d",
        F.expr(
            "CAST(ROUND(CAST(element_at(embedding, d) AS DOUBLE) * 1000000) AS BIGINT)"
        ).alias("x"),
    )
    cls = fan.groupBy("label", "d").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("nc"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("s"),
    )
    pooled = fan.groupBy("d").agg(
        F.expr(
            "CAST(GREATEST((COUNT(*) * SUM(CAST(x AS DECIMAL(38,0)) * x)"
            " - SUM(CAST(x AS DECIMAL(38,0))) * SUM(CAST(x AS DECIMAL(38,0))))"
            " DIV (CAST(COUNT(*) AS DECIMAL(38,0)) * COUNT(*)),"
            " CAST(1 AS DECIMAL(38,0))) AS DECIMAL(38,0))"
        ).alias("var_e12")
    )
    terms = (
        fan.join(F.broadcast(cls.select(F.col("label").alias("c"), "d", "nc", "s")), "d")
        .select(
            "vec_id",
            "label",
            "c",
            "d",
            F.expr(
                "CAST((CAST(x AS DECIMAL(38,0)) * nc - s)"
                " * (CAST(x AS DECIMAL(38,0)) * nc - s)"
                " DIV (CAST(nc AS DECIMAL(38,0)) * nc) AS DECIMAL(38,0))"
            ).alias("dx2_e12"),
        )
        .join(F.broadcast(pooled), "d")
        .groupBy("vec_id", "label", "c")
        .agg(F.expr("CAST(SUM(dx2_e12 * 1000 DIV var_e12) AS BIGINT)").alias("dist_x1000"))
    )
    # r11 opt: window-MIN argmin instead of agg + join-back — the old
    # plan re-derived the |n|·|classes| DECIMAL term aggregation once
    # per side of the self-join (the r6 lag-MI / r10 cusum window-
    # argmax rule); one window pass reads it once. Tied rows all carry
    # dist == min, so MIN(c)/MAX(label)/MAX(dist) are unchanged.
    wv = Window.partitionBy("vec_id")
    argmin = (
        terms.withColumn("__mn", F.expr("MIN(dist_x1000)").over(wv))
        .where(F.col("dist_x1000") == F.col("__mn"))
        .groupBy("vec_id")
        .agg(
            F.expr("MIN(c)").alias("nearest_class"),
            F.expr("MAX(label)").alias("label"),
            F.expr("MAX(dist_x1000)").alias("score_x1000"),
        )
    )
    return (
        argmin.orderBy(F.col("score_x1000").desc(), "vec_id")
        .limit(20)
        .select(
            "vec_id",
            F.expr("CAST(label AS INT)").alias("label"),
            F.expr("CAST(nearest_class AS INT)").alias("nearest_class"),
            "score_x1000",
        )
    )


EMBEDDING_OOD_SQL = """
WITH fan AS (
  SELECT vec_id, label, CAST(g.d AS INTEGER) AS d,
         CAST(ROUND(CAST(embedding[g.d] AS DOUBLE) * 1000000) AS BIGINT) AS x
  FROM embeddings, generate_series(1, 64) g(d)
),
cls AS (
  SELECT label AS c, d, CAST(COUNT(*) AS BIGINT) AS nc,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s
  FROM fan GROUP BY 1, 2
),
pooled AS (
  SELECT d,
         GREATEST((COUNT(*) * SUM(CAST(x AS HUGEINT) * x)
                   - SUM(CAST(x AS HUGEINT)) * SUM(CAST(x AS HUGEINT)))
                  // (CAST(COUNT(*) AS HUGEINT) * COUNT(*)),
                  CAST(1 AS HUGEINT)) AS var_e12
  FROM fan GROUP BY 1
),
terms AS (
  SELECT f.vec_id, f.label, c.c,
         CAST(SUM((CAST(f.x AS HUGEINT) * c.nc - c.s)
                  * (CAST(f.x AS HUGEINT) * c.nc - c.s)
                  // (CAST(c.nc AS HUGEINT) * c.nc)
                  * 1000 // p.var_e12) AS BIGINT) AS dist_x1000
  FROM fan f
  JOIN cls c ON c.d = f.d
  JOIN pooled p ON p.d = f.d
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, MIN(dist_x1000) AS score_x1000 FROM terms GROUP BY 1
),
argmin AS (
  SELECT t.vec_id, MIN(t.c) AS nearest_class, MAX(t.label) AS label,
         MAX(t.dist_x1000) AS score_x1000
  FROM terms t JOIN best b ON b.vec_id = t.vec_id AND t.dist_x1000 = b.score_x1000
  GROUP BY 1
)
SELECT vec_id, CAST(label AS INTEGER) AS label,
       CAST(nearest_class AS INTEGER) AS nearest_class, score_x1000
FROM argmin
ORDER BY score_x1000 DESC, vec_id
LIMIT 20
"""

QUERIES["embedding_ood_mahalanobis"] = embedding_ood_mahalanobis
ORACLE["embedding_ood_mahalanobis"] = EMBEDDING_OOD_SQL
