"""Similarity-search queries over the embeddings table
(SURVEY.md §2.C): exact brute-force top-k (oracle-checked) and the
approximate variants (LSH/IVF/PQ/NSW/incremental), each emitting an
ORACLE-CHECKABLE recall audit (VERDICT r9 item 4): the gate row is
(method, counts, recall-floor, meets_floor) where the floor is a
planted bound the DuckDB oracle asserts — the hash gate then fails
whenever an index regression drops recall below the bar the
tests/test_ann.py property tests pin. The neighbor lists themselves
remain the USER surface via operators/ann.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.operators.ann import bruteforce_topk, lsh_topk
from bireme_spark.sources.tables import load_table

EMBED_DIM = 64
N_QUERIES = 10
K = 5


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings scan, spread across cores: the test parquet is a
    single row group (one scan partition), which would serialize all
    per-pair cosine math. At real scale the scan itself yields many
    partitions (maxPartitionBytes) and this explicit spread is a
    cheap narrow-ish reshuffle of id+vec only."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.repartition(spark.sparkContext.defaultParallelism)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    return bruteforce_topk(_corpus(spark, sf_dir), q, "vec_id", "embedding", k=K).orderBy(
        "query_id", "rank"
    )


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding AS cv
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
dots AS (
  SELECT query_id, neighbor_id,
         SUM(x * y) AS dot, SUM(x * x) AS nq, SUM(y * y) AS nc
  FROM (SELECT query_id, neighbor_id,
               CAST(unnest(qv) AS DOUBLE) AS x,
               CAST(unnest(cv) AS DOUBLE) AS y
        FROM pairs) z
  GROUP BY query_id, neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) AS cosine,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM dots
)
SELECT query_id, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""


# Recall floors the gate asserts (≥ the tests/test_ann.py property
# thresholds, ≤ the MINIMUM measured recall across sf0.001/0.01/0.1/
# sf1 — measured r10; see the per-method notes). The oracle plants
# the bound; the Spark side computes hits vs in-plan brute force.
RECALL_FLOOR_PPM = {
    "lsh": 800_000,
    "ivf": 600_000,
    "pq": 600_000,
    "hnsw": 900_000,
    "ivf_incremental": 600_000,
}

_AUDIT_SCHEMA = (
    "method string, n_queries bigint, k int, n_truth bigint, "
    "recall_floor_ppm bigint, meets_recall_floor boolean"
)


def _recall_audit(spark: SparkSession, sf_dir: str, method: str, approx: DataFrame) -> DataFrame:
    """One gate row: does `approx`'s (query_id, neighbor_id) set reach
    the planted recall floor vs the exact brute-force top-k? The
    counts are model-sized driver scalars (|queries|·k rows); the
    floor comparison is integer ppm (no float ties).

    r11 opt: n_truth and hits fold into ONE left-join agg (truth rows
    with an approx-match indicator), replacing truth.count() +
    inner-join count — one action instead of two (guide §5; both
    sides' pairs are unique so the indicator count equals the old
    intersection count). The eager truth checkpoint STAYS: without it
    the fused single job plans the brute-force crossJoin and the
    approx search as one DAG and ann_hnsw_topk regressed 8.6→13.8s
    (A/B r11) — materializing truth first keeps the two heavy
    subtrees in separate jobs."""
    truth = (
        ann_bruteforce_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    row = (
        truth.join(
            approx.select("query_id", "neighbor_id").withColumn("__hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n_truth"),
            F.count("__hit").alias("hits"),
        )
        .collect()[0]
    )
    n_truth, hits = int(row["n_truth"]), int(row["hits"])
    floor = RECALL_FLOOR_PPM[method]
    meets = (hits * 1_000_000) // n_truth >= floor
    return spark.createDataFrame(
        [(method, n_truth // K, K, n_truth, floor, bool(meets))], _AUDIT_SCHEMA
    )


def _audit_oracle(method: str) -> str:
    """The planted-bound oracle: data-derived counts + asserted floor.
    A recall regression flips meets_recall_floor on the Spark side
    only → hash MISMATCH at the gate."""
    floor = RECALL_FLOOR_PPM[method]
    return f"""
WITH q AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq FROM embeddings WHERE vec_id < {N_QUERIES})
SELECT '{method}' AS method, nq AS n_queries, CAST({K} AS INTEGER) AS k,
       CAST(nq * {K} AS BIGINT) AS n_truth,
       CAST({floor} AS BIGINT) AS recall_floor_ppm,
       TRUE AS meets_recall_floor
FROM q
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k, gate-checked as a recall audit (VERDICT r9
    item 4): bucket membership depends on the hyperplane seeds, so
    the neighbor SET can't hash-match an oracle — the recall@k vs
    in-plan exact brute force CAN, as a planted ≥0.8 bound (the
    tests/test_ann.py threshold). Neighbor lists: operators.ann.lsh_topk."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    approx = lsh_topk(
        _corpus(spark, sf_dir), q, "vec_id", "embedding", dim=EMBED_DIM, k=K, tables=8, bits=6
    )
    return _recall_audit(spark, sf_dir, "lsh", approx)


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_topk": ann_lsh_topk,
}

ORACLE = {
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    "ann_lsh_topk": _audit_oracle("lsh"),
}


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k recall audit (cell membership depends on the trained
    centroid model → planted ≥0.6 bound, the tests/test_ann.py
    threshold). Neighbor lists: operators.ann.ivf_topk."""
    from bireme_spark.operators.ann import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    approx = ivf_topk(
        _corpus(spark, sf_dir), q, "vec_id", "embedding", dim=EMBED_DIM, k=K, ncells=16, nprobe=4
    )
    return _recall_audit(spark, sf_dir, "ivf", approx)


QUERIES["ann_ivf_topk"] = ann_ivf_topk
ORACLE["ann_ivf_topk"] = _audit_oracle("ivf")


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC top-k recall audit (codes depend on the trained
    codebooks → planted ≥0.6 bound). Emitted cosines in the operator
    are EXACT — PQ/ADC only selects the rerank candidates. Neighbor
    lists: operators.ann.pq_topk."""
    from bireme_spark.operators.ann import pq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    approx = pq_topk(
        _corpus(spark, sf_dir), q, "vec_id", "embedding", dim=EMBED_DIM, k=K, m=8, ksub=16,
        rerank=8,
    )
    return _recall_audit(spark, sf_dir, "pq", approx)


QUERIES["ann_pq_topk"] = ann_pq_topk
ORACLE["ann_pq_topk"] = _audit_oracle("pq")


def ann_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate k-NN graph over the whole embeddings corpus (every
    vector is query AND neighbor) — the structure clustering /
    diversity-sampling pipelines consume. Rows-only for the driver
    (bucket collisions depend on hash seeds); edge exactness, planted-
    duplicate recall, and degree bounds are property-tested
    (tests/test_ann.py)."""
    from bireme_spark.operators.ann import knn_graph

    return knn_graph(
        _corpus(spark, sf_dir), "vec_id", "embedding", dim=EMBED_DIM, k=K, tables=8, bits=6
    )


QUERIES["ann_knn_graph"] = ann_knn_graph


def embedding_knn_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank centrality over the approximate kNN graph — the
    representative-document scoring pass of a curation pipeline
    (high-rank vectors are endorsed by many neighborhoods; low-rank
    tails are isolated/outlier docs). Rows-only (the graph inherits
    the LSH seed family); mass conservation, cycle/star structure and
    partitioning determinism are property-tested
    (tests/test_graph.py).

    Scale: the edge list shuffles once onto src and stays put; each
    of the power rounds joins the |nodes|-row DECIMAL rank table
    against it; the dangling-mass scalar folds in as a one-row
    broadcast aggregate (no per-round driver round-trips)."""
    from bireme_spark.operators.ann import knn_graph
    from bireme_spark.operators.graph import pagerank

    edges = knn_graph(
        _corpus(spark, sf_dir), "vec_id", "embedding", dim=EMBED_DIM, k=K, tables=8, bits=6
    ).select("src", "dst")
    return (
        pagerank(edges, iters=6)
        .select(F.col("id").alias("vec_id"), F.round("rank", 10).alias("rank"))
        .orderBy("vec_id")
    )


QUERIES["embedding_knn_pagerank"] = embedding_knn_pagerank


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k evaluation harness: every approximate index (LSH /
    IVF / PQ) scored against the exact brute-force top-k on the same
    probe set — the accuracy/cost report an ANN deployment watches
    when tuning tables/bits/nprobe/rerank. One row per method.

    Plan: ground truth and each method's result are (|queries|·k)-row
    frames; recall is an inner join on (query, neighbor) + one count
    — model-sized work after the index probes themselves. Rows-only
    at the gate (bucket membership depends on hash seeds; the SAME
    seeds make the report deterministic run-to-run, and the ≥0.9
    floor is property-tested in tests/test_ann.py)."""
    from bireme_spark.operators.ann import ivf_topk, pq_topk

    truth = (
        ann_bruteforce_topk(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    n_truth = truth.count()
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    c = _corpus(spark, sf_dir)
    approxes = (
        ("lsh", lsh_topk(c, q, "vec_id", "embedding", dim=EMBED_DIM, k=K, tables=8, bits=6)),
        ("ivf", ivf_topk(c, q, "vec_id", "embedding", dim=EMBED_DIM, k=K, ncells=16, nprobe=4)),
        (
            "pq",
            pq_topk(
                c, q, "vec_id", "embedding", dim=EMBED_DIM, k=K, m=8, ksub=16, rerank=8
            ),
        ),
    )
    rows = []
    for method, got in approxes:
        hits = (
            got.select("query_id", "neighbor_id")
            .join(truth, ["query_id", "neighbor_id"])
            .count()
        )
        rows.append((method, int(n_truth), int(hits), round(hits / n_truth, 6)))
    return spark.createDataFrame(
        rows, "method string, n_truth int, n_hits int, recall_at_k double"
    ).orderBy("method")


QUERIES["ann_recall_eval"] = ann_recall_eval  # rows-only (seeded hashes)


def ann_hnsw_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-index approximate search (HNSW family): a single-layer
    navigable-small-world index (bidirectional kNN graph — HNSW's
    layer 0) searched by bulk beam expansion, the index shape
    FAISS/production vector stores actually serve. Gate-checked as a
    recall audit (the graph inherits the LSH seed family → the
    neighbor set can't hash-match; the planted ≥0.9 bound — the
    tests/test_ann.py threshold — can). Neighbor lists:
    operators.ann.nsw_topk (emitted cosines are exact)."""
    from bireme_spark.operators.ann import nsw_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    approx = nsw_topk(_corpus(spark, sf_dir), q, "vec_id", "embedding", dim=EMBED_DIM, k=K)
    return _recall_audit(spark, sf_dir, "hnsw", approx)


QUERIES["ann_hnsw_topk"] = ann_hnsw_topk
ORACLE["ann_hnsw_topk"] = _audit_oracle("hnsw")


def ann_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance (VERDICT r8 item 7; the
    FAISS ``IndexIVF.add`` contract, `ChangeLoader`-style incremental
    ingest applied to the vector store): the standing corpus (90% of
    embeddings) builds the IVF index ONCE; a new ingest batch (the
    vec_id % 10 == 0 slice) folds in by assigning ONLY the batch
    vectors to the frozen centroid model — |batch|-proportional work,
    no full rebuild — and queries search the updated index. Rows-only
    for the driver (cell membership depends on the trained model);
    the gate row now pins (a) incremental ≡ from-scratch assignment
    under the same frozen model (anti-join both ways == 0, computed
    IN-PLAN) and (b) search recall vs brute force over the planted
    ≥0.6 bound; the property tests additionally pin recall vs a full
    retrain within ε and planted batch self-queries at rank 1
    (tests/test_ann.py).

    Scale: the ingest pass is one Arrow-batched matmul over the
    batch (narrow — no shuffle); search cost is unchanged (probe
    nprobe cells, exact rerank inside); the ≡-check pays one extra
    assignment pass over the corpus — it's the AUDIT query, the
    operator itself stays |batch|-proportional."""
    from bireme_spark.operators.ann import (
        _nearest_cell_udf,
        ivf_incremental_add,
        ivf_index,
        ivf_topk,
    )

    e = _corpus(spark, sf_dir)
    standing = e.where(F.col("vec_id") % 10 != 0)
    batch = e.where(F.col("vec_id") % 10 == 0)
    cents, assigned = ivf_index(standing, "vec_id", "embedding", dim=EMBED_DIM, ncells=16)
    index = ivf_incremental_add(cents, assigned, batch, "embedding")
    _, incremental = index
    # r11 opt (VERDICT #6 twin): the incremental inverted lists are
    # read by BOTH the ≡-check below and the ivf_topk search — without
    # the cut each reader re-runs the standing-corpus Arrow assignment
    # (py_boundary sweep: repeated ArrowEvalPython). Lazy checkpoint:
    # the mismatch agg materializes it, the search reuses it.
    incremental = incremental.localCheckpoint(eager=False)
    index = (cents, incremental)

    # (a) incremental inverted lists ≡ assigning the union corpus
    # from scratch under the SAME frozen centroid model. One full-outer
    # agg replaces full_outer.count() − scr_cells.count(): tot =
    # |inc ∪ scr| keys, ns = |scr| (one cell per vec ⇒ unique keys),
    # so tot − ns is the old mismatch count with scratch's Arrow pass
    # executed ONCE instead of twice (guide §4/§5).
    scratch = e.withColumn("cell", _nearest_cell_udf(cents)(F.col("embedding")))
    inc_cells = incremental.select("vec_id", "cell")
    scr_cells = scratch.select("vec_id", "cell").withColumn("__s", F.lit(1))
    mrow = (
        inc_cells.join(scr_cells, ["vec_id", "cell"], "full_outer")
        .agg(F.count(F.lit(1)).alias("tot"), F.count("__s").alias("ns"))
        .collect()[0]
    )
    n_mismatch = int(mrow["tot"]) - int(mrow["ns"])

    # (b) search recall over the incremental index vs brute force
    q = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < N_QUERIES)
    approx = ivf_topk(None, q, "vec_id", "embedding", dim=EMBED_DIM, k=K, nprobe=4, index=index)
    audit = _recall_audit(spark, sf_dir, "ivf_incremental", approx)
    return audit.select(
        "method",
        F.lit(n_mismatch == 0).alias("incremental_equals_scratch"),
        "n_queries",
        "k",
        "n_truth",
        "recall_floor_ppm",
        "meets_recall_floor",
    )


ANN_INCREMENTAL_SQL = f"""
WITH q AS (SELECT CAST(COUNT(*) AS BIGINT) AS nq FROM embeddings WHERE vec_id < {N_QUERIES})
SELECT 'ivf_incremental' AS method, TRUE AS incremental_equals_scratch,
       nq AS n_queries, CAST({K} AS INTEGER) AS k,
       CAST(nq * {K} AS BIGINT) AS n_truth,
       CAST({RECALL_FLOOR_PPM["ivf_incremental"]} AS BIGINT) AS recall_floor_ppm,
       TRUE AS meets_recall_floor
FROM q
"""

QUERIES["ann_incremental_index"] = ann_incremental_index
ORACLE["ann_incremental_index"] = ANN_INCREMENTAL_SQL


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered exact top-k: nearest same-LABEL neighbors
    per query (pre-filter strategy — see operators.ann.filtered_topk
    for why post-filtering is the recall bug). Oracle-checked: the
    filter makes the candidate set deterministic, and scoring is the
    exact-cosine discipline."""
    from bireme_spark.operators.ann import filtered_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES)
    return filtered_topk(
        _corpus(spark, sf_dir), q, "vec_id", "embedding", "label", k=K
    ).orderBy("query_id", "rank")


ANN_FILTERED_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qf, embedding AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id, q.qf, e.vec_id AS neighbor_id, q.qv, e.embedding AS cv
  FROM q JOIN embeddings e ON e.label = q.qf
  WHERE e.vec_id <> q.query_id
),
dots AS (
  SELECT query_id, qf, neighbor_id,
         SUM(x * y) AS dot, SUM(x * x) AS nq, SUM(y * y) AS nc
  FROM (SELECT query_id, qf, neighbor_id,
               CAST(unnest(qv) AS DOUBLE) AS x,
               CAST(unnest(cv) AS DOUBLE) AS y
        FROM pairs) z
  GROUP BY query_id, qf, neighbor_id
),
ranked AS (
  SELECT query_id, qf, neighbor_id,
         ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) AS cosine,
         CAST(ROW_NUMBER() OVER (
             PARTITION BY query_id
             ORDER BY ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM dots
)
SELECT query_id, qf AS filter_value, rank, neighbor_id, cosine
FROM ranked WHERE rank <= {K}
ORDER BY query_id, rank
"""

QUERIES["ann_filtered_topk"] = ann_filtered_topk
ORACLE["ann_filtered_topk"] = ANN_FILTERED_SQL


RADIUS_TAU = 0.3


def ann_radius_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact RADIUS (range) search: every corpus vector with cosine ≥
    τ = 0.3 per query (the ~p99 of this embedding family's cosine
    distribution — calibrated, not arbitrary) — the vector-store sibling of top-k for
    "give me everything at least this similar" workloads (dedup
    candidate pull, recall-first retrieval, abuse-cluster expansion),
    where a fixed k silently truncates dense neighborhoods and pads
    sparse ones. Same exact-cosine discipline as bruteforce_topk
    (per-row norm precompute, float→double fold, ROUND 6; the τ
    filter applies to the ROUNDED value so the emitted set is
    self-consistent); the match set is LEFT-joined back onto the
    query list, so a query with an empty neighborhood emits one row
    with NULL neighbor/cosine and n_matches = 0 — an auditable zero,
    not an absent row (r9 ADVICE: the old plan filtered before the
    count window, silently dropping zero-match queries).

    Scale: the query side broadcasts (10 rows); the corpus never
    shuffles; at production scale the same call composes with the
    LSH/IVF candidate generators exactly as topk does — the
    brute-force form IS the oracle-checkable baseline."""
    from pyspark.sql import Window

    from bireme_spark.operators.ann import _dot

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("qn"),
    )
    c = _corpus(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6),
        )
        .where(F.col("cosine") >= RADIUS_TAU)
    )
    matched = scored.select("query_id", "neighbor_id", "cosine")
    # left-join back onto the (broadcast, 10-row) query list: a query
    # with zero matches keeps one NULL-neighbor row, n_matches = 0
    out = q.select("query_id").join(matched, "query_id", "left")
    wq = Window.partitionBy("query_id")
    return out.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.count("neighbor_id").over(wq).cast("bigint").alias("n_matches"),
    ).orderBy("query_id", F.desc("cosine"), "neighbor_id")


ANN_RADIUS_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, q.qv, e.embedding AS cv
  FROM q, embeddings e
  WHERE e.vec_id <> q.query_id
),
dots AS (
  SELECT query_id, neighbor_id,
         SUM(x * y) AS dot, SUM(x * x) AS nq, SUM(y * y) AS nc
  FROM (SELECT query_id, neighbor_id,
               CAST(unnest(qv) AS DOUBLE) AS x,
               CAST(unnest(cv) AS DOUBLE) AS y
        FROM pairs) z
  GROUP BY query_id, neighbor_id
),
matched AS (
  SELECT query_id, neighbor_id,
         ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) AS cosine
  FROM dots
  WHERE ROUND(dot / (sqrt(nq) * sqrt(nc)), 6) >= {RADIUS_TAU}
)
SELECT q.query_id, m.neighbor_id, m.cosine,
       CAST(COUNT(m.neighbor_id) OVER (PARTITION BY q.query_id) AS BIGINT) AS n_matches
FROM q LEFT JOIN matched m ON m.query_id = q.query_id
ORDER BY q.query_id, m.cosine DESC, m.neighbor_id
"""

QUERIES["ann_radius_search"] = ann_radius_search
ORACLE["ann_radius_search"] = ANN_RADIUS_SQL
