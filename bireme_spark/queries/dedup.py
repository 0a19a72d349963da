"""Deduplication queries over the documents/embeddings corpus
(SURVEY.md §2.C). Exact variants are oracle-checked; the
hash-seed-dependent LSH variants are rows-only here and
property-tested in tests/test_dedup.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.operators.dedup import (
    embedding_cosine_pairs_lsh,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from bireme_spark.sources.tables import load_table


def _docs_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ deterministic copies (every 50th doc re-inserted
    with a shifted id) so exact dedup has real duplicates to find."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = d.where(F.col("doc_id") % 50 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return d.unionByName(copies)


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(_docs_with_dupes(spark, sf_dir), "doc_id", "text").orderBy("doc_id")


DEDUP_EXACT_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
)
SELECT doc_id,
       MIN(doc_id) OVER (PARTITION BY text) AS canonical_id,
       doc_id <> MIN(doc_id) OVER (PARTITION BY text) AS is_duplicate
FROM corpus
ORDER BY doc_id
"""


def _df_guard(d, extra_frac: float = 0.0) -> int:
    """Corpus-size-scaled hot-shingle cap for the exact pair miners:
    100 at every driver tier (≤5k docs — all recorded rounds stay
    bit-identical), growing ∝ corpus beyond that so scale or
    replication can't push REAL shingle document-frequencies past the
    guard. The r8 sf1.0 sweep caught the fixed cap silently dropping
    hot-but-real shingles on the 10×-replicated corpus (every doc has
    9 exact clones): Spark emitted 1458 containment pairs vs the
    guard-free oracle's 502110. A guard that prunes what the oracle
    counts is a correctness bug, not an optimization.

    ``d`` must be the BASE parquet frame — its .count() is one
    column-pruned parquet scan (zero data columns read), NOT a
    re-execution of a synthesized-union lineage. Builders that mine a
    derived corpus (planted shorts/copies unions) pass the extra rows
    as ``extra_frac`` (fraction of the base) instead of counting the
    computed frame: the guard needs scale-proportionality, not an
    exact n — any value ≥ the true max shingle df is exact."""
    n = d.count()
    return max(100, int(n * (1.0 + extra_frac)) // 50)


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # max_df: the hot-bucket guard a 100 TB run MUST set. 100 is ~4×
    # the max observed shingle df at sf0.1 (25; sf0.01: 7), so the
    # result stays exact vs the guard-free oracle at test scale while
    # the guard itself is exercised in the registered plan.
    return ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, tau=0.8, max_df=_df_guard(d)
    ).orderBy(
        "id_a", "id_b"
    )


DEDUP_NGRAM_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       ROUND(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
ORDER BY id_a, id_b
"""


def dedup_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric doc-inside-doc detection: every 40th doc's 20-word
    prefix is planted as a short standalone doc — its shingle set is a
    subset of the original's, so containment(short→long) is exactly
    1.0 while Jaccard stays ≈ |short|/|long| (far under any dedup τ).
    The miner must surface exactly the τ≥0.9 directed pairs the
    guard-free SQL oracle computes."""
    from bireme_spark.operators.dedup import ngram_containment_pairs

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    shorts = d.where(F.col("doc_id") % 40 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 20)).alias("text"),
    )
    corpus = d.unionByName(shorts)
    # guard scaled off the BASE table: shorts add 1/40 of the docs
    return ngram_containment_pairs(
        corpus, "doc_id", "text", n=3, tau=0.9, max_df=_df_guard(d, extra_frac=1 / 40)
    ).orderBy("inner_id", "outer_id")


DEDUP_CONTAINMENT_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, array_to_string(string_split(text, ' ')[1:20], ' ')
  FROM documents WHERE doc_id % 40 = 0
),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
directed AS (
  SELECT id_a AS inner_id, id_b AS outer_id, c * 1.0 / sa.n AS containment
  FROM common JOIN sizes sa ON sa.doc_id = id_a
  UNION ALL
  SELECT id_b, id_a, c * 1.0 / sb.n
  FROM common JOIN sizes sb ON sb.doc_id = id_b
)
SELECT inner_id, outer_id, ROUND(containment, 6) AS containment
FROM directed
WHERE containment >= 0.9
ORDER BY inner_id, outer_id
"""


def _embeddings_with_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ deterministic near-dup copies: every 20th vector
    re-inserted (shifted id) as a positive scalar multiple — cosine
    with its original is exactly 1.0, while the max cosine between
    any two DISTINCT base vectors is ≈0.6 at sf0.1 (measured), so at
    τ=0.8 the qualifying pairs are exactly the planted ones and the
    LSH recall is deterministic (scalar multiples share every
    hyperplane signature)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    copies = e.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(1.25)).alias("embedding"),
    )
    # union widens array<float> ∪ array<double> → array<double>
    return e.unionByName(copies)


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _embeddings_with_dupes(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return embedding_cosine_pairs_lsh(
        corpus, "vec_id", "embedding", tau=0.8, dim=64
    ).orderBy("id_a", "id_b")


DEDUP_EMBEDDING_SQL = """
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 1.25)
  FROM embeddings WHERE vec_id % 20 = 0
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS va, b.embedding AS vb
  FROM corpus a, corpus b
  WHERE a.vec_id < b.vec_id
),
dots AS (
  SELECT id_a, id_b,
         SUM(x * y) AS dot, SUM(x * x) AS na, SUM(y * y) AS nb
  FROM (SELECT id_a, id_b,
               CAST(unnest(va) AS DOUBLE) AS x,
               CAST(unnest(vb) AS DOUBLE) AS y
        FROM pairs) z
  GROUP BY id_a, id_b
)
SELECT id_a, id_b, ROUND(dot / (sqrt(na) * sqrt(nb)), 6) AS cosine
FROM dots
WHERE ROUND(dot / (sqrt(na) * sqrt(nb)), 6) >= 0.8
ORDER BY id_a, id_b
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only for the driver (bucket membership is hash-seed
    dependent); recall vs exact Jaccard is property-tested."""
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=64, bands=16, tau=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only for the driver (fingerprint is hash-dependent)."""
    d = load_table(spark, sf_dir, "documents")
    return simhash_pairs(d, "doc_id", "text", max_hamming=8)


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_ngram_containment": dedup_ngram_containment,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}

ORACLE = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_ngram_containment": DEDUP_CONTAINMENT_SQL,
    "dedup_embedding_cosine": DEDUP_EMBEDDING_SQL,
}


def corpus_fuzzy_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end FUZZY dedup — the composition a production corpus
    build actually runs (the MinHash path of Penedo et al.'s
    RefinedWeb / Lee et al. 2107.06499 pipelines): MinHash-LSH
    near-dup pairs → connected components → keep the min-doc_id
    canonical per cluster → per-source retention report.

    The exact-hash sibling is `corpus_filter_pipeline`; this one
    removes NEAR duplicates. *rows-only*: collision sets depend on the
    minhash seed family (deterministic across runs/partitionings, but
    not SQL-expressible); the composing operators are each
    property-tested, and the pipeline itself is tested end-to-end
    with planted near-dups (tests/test_dedup.py).

    Scale: every stage is the bucketed/star-contraction design of its
    operator — the extra work over the pieces is ONE |clusters|-sized
    anti-join + a |sources|-row agg."""
    from bireme_spark.operators.dedup import connected_components, minhash_lsh_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(d, "doc_id", "text", n=3, num_hashes=64, bands=16, tau=0.6)
    comp = connected_components(pairs)
    # non-canonical members (label ≠ own id) are the removals;
    # everything else (incl. docs in no pair at all) is retained
    drops = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    kept = d.join(drops, "doc_id", "left_anti")
    stats = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(
            kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_docs") - F.coalesce("n_kept", F.lit(0))).alias("n_removed"),
        )
    )
    return stats.orderBy("source")


QUERIES["corpus_fuzzy_dedup_pipeline"] = corpus_fuzzy_dedup_pipeline


def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: exact n-gram Jaccard pairs (τ=0.8) folded
    into connected components — each doc labeled with the min doc_id
    of its duplicate cluster."""
    from bireme_spark.operators.dedup import connected_components

    d = load_table(spark, sf_dir, "documents")
    # same max_df hot-shingle guard as dedup_ngram_jaccard: exact at
    # test scale (max observed df ≈ 25 at sf0.1), and keeps the pair
    # mining Σ bucket² bounded when one shingle goes hot at 100 TB
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, tau=0.8, max_df=_df_guard(d))
    return connected_components(pairs).orderBy("id")


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE pairs AS (
  -- exact n-gram Jaccard >= 0.8 pairs (same as dedup_ngram_jaccard)
  SELECT id_a, id_b FROM (
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b
    FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.8
  )
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT id, CAST(LEAST(id, MIN(dst)) AS BIGINT) AS component
FROM (SELECT src AS id, dst FROM reach
      UNION ALL
      SELECT DISTINCT src AS id, src AS dst FROM edges) t
GROUP BY id
ORDER BY id
"""

QUERIES["dedup_components"] = dedup_components
ORACLE["dedup_components"] = DEDUP_COMPONENTS_SQL


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the planted-duplicate embedding corpus: k-means
    cells bound the pair search, within-cell cosine ≥ τ prunes the
    higher id. Planted scalar-multiple copies have cosine exactly 1.0
    to their originals and share every centroid argmax (cosine to all
    centroids identical), so they are ALWAYS co-clustered and pruned
    — while the max cosine between distinct base vectors (≈0.6) stays
    under τ=0.8. The keep/remove set is therefore deterministic and
    the oracle is closed-form, even though cell ids themselves depend
    on the trained model."""
    from bireme_spark.operators.dedup import semantic_dedup

    corpus = _embeddings_with_dupes(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return semantic_dedup(corpus, "vec_id", "embedding", dim=64, tau=0.8, ncells=16).orderBy(
        "vec_id"
    )


DEDUP_SEMANTIC_SQL = """
WITH corpus AS (
  SELECT vec_id FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 FROM embeddings WHERE vec_id % 20 = 0
)
SELECT vec_id, vec_id < 1000000 AS kept
FROM corpus
ORDER BY vec_id
"""

QUERIES["dedup_semantic"] = dedup_semantic
ORACLE["dedup_semantic"] = DEDUP_SEMANTIC_SQL


def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold-tuning analytics: near-dup PAIR counts per Jaccard
    band (0.5–0.6, …, 0.9–1.0] from ONE pair-similarity pass — the
    curve that picks τ for a production dedup run (too low = false
    merges, too high = missed dups; the knee is data-dependent).

    Reuses the exact inverted-index pair miner at its lowest band
    edge (τ=0.5, same max_df hot-shingle guard), then bands map-side —
    sweeping five thresholds costs exactly one mining pass, not
    five."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, tau=0.5, max_df=_df_guard(d))
    band = F.least(F.floor(F.col("jaccard") * 10) / 10, F.lit(0.9))
    return (
        pairs.groupBy(band.alias("band_lo"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .withColumn("band_hi", F.round(F.col("band_lo") + 0.1, 1))
        .select(F.round("band_lo", 1).alias("band_lo"), "band_hi", "n_pairs")
        .orderBy("band_lo")
    )


DEDUP_SWEEP_SQL = """
WITH pairs AS (
  SELECT id_a, id_b, jaccard FROM (
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
      FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
    ),
    keep AS (
      SELECT s FROM sh GROUP BY s HAVING COUNT(*) BETWEEN 2 AND 100
    ),
    pruned AS (SELECT sh.* FROM sh JOIN keep USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
      FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           ROUND(c / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
    FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  )
  WHERE jaccard >= 0.5
)
SELECT ROUND(LEAST(FLOOR(jaccard * 10) / 10, 0.9), 1) AS band_lo,
       ROUND(LEAST(FLOOR(jaccard * 10) / 10, 0.9) + 0.1, 1) AS band_hi,
       CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY 1, 2
ORDER BY band_lo
"""

QUERIES["dedup_threshold_sweep"] = dedup_threshold_sweep
ORACLE["dedup_threshold_sweep"] = DEDUP_SWEEP_SQL


def dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup of a new ingest batch against the standing
    corpus (operators/dedup.py::incremental_jaccard_probe): corpus =
    docs with id % 10 ≠ 0; the batch = the id % 10 = 0 docs (novel
    content) plus planted exact copies of every corpus doc with
    id % 9 = 0 (shifted ids) — the probe must surface exactly the
    planted copies at Jaccard 1.0 plus whatever genuine near-dups
    the guard-free SQL oracle finds at τ ≥ 0.8.

    Scale story: only batch×corpus shingle-bucket candidates are
    formed — no corpus self-join — so a daily increment costs
    |batch|-proportional work against a reusable index instead of
    re-paying the full-corpus pair join."""
    from bireme_spark.operators.dedup import incremental_jaccard_probe

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.where(F.col("doc_id") % 10 != 0)
    novel = d.where(F.col("doc_id") % 10 == 0)
    planted = corpus.where(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    batch = novel.unionByName(planted)
    # max_df 100 ≈ 4× the max observed shingle df at sf0.1 — the
    # guard is in the plan but exact at test scale (same rationale
    # as dedup_ngram_jaccard).
    # guard scaled off the BASE table: corpus∪batch = all docs plus
    # the planted copies (corpus docs with id%9=0 ≈ 1/10 of the base)
    return incremental_jaccard_probe(
        corpus, batch, "doc_id", "text", n=3, tau=0.8,
        max_df=_df_guard(d, extra_frac=0.1),
    ).orderBy("batch_id", "match_id")


DEDUP_INCREMENTAL_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0
),
batch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT doc_id + 1000000, text FROM corpus WHERE doc_id % 9 = 0
),
cw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM corpus),
bw AS (SELECT doc_id, string_split(text, ' ') AS ws FROM batch),
csh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM cw, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
),
bsh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM bw, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
),
csizes AS (SELECT doc_id, count(*) AS n FROM csh GROUP BY doc_id),
bsizes AS (SELECT doc_id, count(*) AS n FROM bsh GROUP BY doc_id),
common AS (
  SELECT b.doc_id AS batch_id, c.doc_id AS match_id, count(*) AS x
  FROM bsh b JOIN csh c ON b.s = c.s
  GROUP BY 1, 2
)
SELECT batch_id, match_id,
       ROUND(x * 1.0 / (bs.n + cs.n - x), 6) AS jaccard
FROM common
JOIN bsizes bs ON bs.doc_id = batch_id
JOIN csizes cs ON cs.doc_id = match_id
WHERE x * 1.0 / (bs.n + cs.n - x) >= 0.8
ORDER BY batch_id, match_id
"""

QUERIES["dedup_incremental_probe"] = dedup_incremental_probe
ORACLE["dedup_incremental_probe"] = DEDUP_INCREMENTAL_SQL


def corpus_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship policy on exact-duplicate clusters: within each
    content cluster (md5(text) — the PK-hash grouping a 100 TB exact
    dedup already pays), keep the doc a curation pipeline would keep
    — longest text first, then lowest doc_id — and account for what
    deduplication saves (docs and chars dropped per cluster).
    Min-id canonicalization (``dedup_exact``) answers "which rows are
    duplicates"; survivorship answers the follow-up a training-data
    pipeline acts on: WHICH copy to keep when near-identical docs
    differ in quality metadata.

    Plan: one hash-agg on the content hash with ``max_by`` picking
    the survivor (map-side partial agg — no window sort, no
    per-cluster shuffle beyond the one grouping). Only multi-member
    clusters are reported."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    dupes = d.unionByName(
        d.where(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            "text",
            "n_chars",
        )
    )
    clusters = dupes.groupBy(F.md5("text").alias("h")).agg(
        F.max_by(
            F.struct(F.col("doc_id").alias("id")),
            F.struct(
                F.col("n_chars").alias("q"), (-F.col("doc_id")).alias("tie")
            ),
        )["id"].alias("survivor_id"),
        F.count(F.lit(1)).alias("n_members"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.max("n_chars").cast("bigint").alias("survivor_chars"),
    )
    return (
        clusters.where(F.col("n_members") > 1)
        .select(
            "survivor_id",
            "n_members",
            (F.col("n_members") - 1).cast("bigint").alias("n_dropped"),
            (F.col("total_chars") - F.col("survivor_chars")).alias("chars_saved"),
        )
        .orderBy("survivor_id")
    )


DEDUP_SURVIVORSHIP_SQL = """
WITH corpus AS (
  SELECT doc_id, text, n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text, n_chars FROM documents WHERE doc_id % 50 = 0
),
ranked AS (
  SELECT md5(text) AS h, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY md5(text)
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM corpus
),
clusters AS (
  SELECT h,
         MAX(CASE WHEN rn = 1 THEN doc_id END) AS survivor_id,
         COUNT(*) AS n_members,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         CAST(MAX(n_chars) AS BIGINT) AS survivor_chars
  FROM ranked GROUP BY h
)
SELECT survivor_id, n_members,
       CAST(n_members - 1 AS BIGINT) AS n_dropped,
       total_chars - survivor_chars AS chars_saved
FROM clusters WHERE n_members > 1
ORDER BY survivor_id
"""

QUERIES["corpus_dedup_survivorship"] = corpus_dedup_survivorship
ORACLE["corpus_dedup_survivorship"] = DEDUP_SURVIVORSHIP_SQL


def dedup_minhash_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH precision/recall evaluation, FULLY oracle-checked:
    an engine-portable MinHash family (minimum of the first-8-hex
    md5(seed:shingle) STRINGS — fixed-width lowercase hex, so string
    MIN == numeric MIN, no integer conversion anywhere) with 8 rows
    banded 4×2 is run over a deterministic 200-doc sample; its
    candidate pairs are scored against exact 3-shingle Jaccard ≥ 0.5
    ground truth (integer cross-multiplication, 2·|∩| ≥ |∪|). Unlike
    the production `dedup_minhash_lsh` (xxhash family, rows-only),
    every number here — candidates, truth, hits, precision/recall in
    exact integer ppm — is hash-checked against DuckDB running the
    SAME hashes.

    Scale design: the eval is SAMPLE-BOUNDED (top-200 by md5 order —
    constant work at any corpus size; the production path never does
    all-pairs). Shingling projects tokens to a NAMED column once,
    dedups per-doc map-side (array_distinct before explode), and
    every pair join carries ids only."""
    n_sample = 200
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sample = (
        d.orderBy(F.md5(F.concat(F.lit("s:"), F.col("doc_id").cast("string"))))
        .limit(n_sample)
        .select("doc_id", F.split("text", " ").alias("toks"))
    )
    sh = sample.select(
        "doc_id",
        F.array_distinct(
            F.expr(
                "transform(sequence(0, size(toks) - 3),"
                " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
            )
        ).alias("shingles"),
    ).where(F.size("toks") >= 3)
    # the 200-doc shingled sample is re-derived by every downstream
    # branch (signatures, bands, exact-Jaccard truth) — 8 corpus
    # scans without the cut. LAZY checkpoint A/B-WON at sf0.1
    # (lazy 0.67 / plain 0.75 / eager 0.91 min-of-3): the sample is
    # tiny, so cutting recompute pays but an extra eager job doesn't.
    sh = sh.localCheckpoint(eager=False)
    ds = sh.select(
        "doc_id", F.size("shingles").alias("sz"), F.explode("shingles").alias("sg")
    )
    # 8 portable minhash rows -> 4 bands x 2 rows
    mh = ds.groupBy("doc_id").agg(
        *[
            F.min(
                F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("sg"))), 1, 8)
            ).alias(f"h{i}")
            for i in range(8)
        ]
    )
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias("sig"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", "bs.band", "bs.sig")
    b2 = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("band_b"), F.col("sig").alias("sig_b")
    )
    cand = (
        bands.join(
            b2,
            (F.col("band") == F.col("band_b"))
            & (F.col("sig") == F.col("sig_b"))
            & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("a"), F.col("doc_b").alias("b"))
        .distinct()
    )
    ds2 = ds.select(
        F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), F.col("sg").alias("sg_b")
    )
    inter = (
        ds.join(ds2, (F.col("sg") == F.col("sg_b")) & (F.col("doc_id") < F.col("doc_b")))
        .groupBy(F.col("doc_id").alias("a"), F.col("doc_b").alias("b"), "sz", "sz_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    truth = inter.where(
        2 * F.col("inter") >= F.col("sz") + F.col("sz_b") - F.col("inter")
    ).select("a", "b")
    hit = cand.join(truth, ["a", "b"])
    counts = (
        cand.agg(F.count(F.lit(1)).alias("n_candidates"))
        .join(F.broadcast(truth.agg(F.count(F.lit(1)).alias("n_true"))), F.lit(True))
        .join(F.broadcast(hit.agg(F.count(F.lit(1)).alias("n_hit"))), F.lit(True))
    )
    return counts.select(
        "n_candidates",
        "n_true",
        "n_hit",
        F.expr(
            "CASE WHEN n_candidates = 0 THEN -1"
            " ELSE (n_hit * 1000000) DIV n_candidates END"
        ).alias("precision_ppm"),
        F.expr(
            "CASE WHEN n_true = 0 THEN -1 ELSE (n_hit * 1000000) DIV n_true END"
        ).alias("recall_ppm"),
    )


DEDUP_MINHASH_EVAL_SQL = """
WITH sample AS (
  SELECT doc_id, string_split(text, ' ') AS toks
  FROM documents
  ORDER BY md5('s:' || CAST(doc_id AS VARCHAR)) LIMIT 200
),
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(0, len(toks) - 3),
             i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
  FROM sample WHERE len(toks) >= 3
),
ds AS (
  SELECT doc_id, len(shingles) AS sz, unnest(shingles) AS sg FROM sh
),
mh AS (
  SELECT doc_id,
         MIN(substr(md5('0:' || sg), 1, 8)) AS h0,
         MIN(substr(md5('1:' || sg), 1, 8)) AS h1,
         MIN(substr(md5('2:' || sg), 1, 8)) AS h2,
         MIN(substr(md5('3:' || sg), 1, 8)) AS h3,
         MIN(substr(md5('4:' || sg), 1, 8)) AS h4,
         MIN(substr(md5('5:' || sg), 1, 8)) AS h5,
         MIN(substr(md5('6:' || sg), 1, 8)) AS h6,
         MIN(substr(md5('7:' || sg), 1, 8)) AS h7
  FROM ds GROUP BY 1
),
bands AS (
  SELECT doc_id, 0 AS band, h0 || h1 AS sig FROM mh
  UNION ALL SELECT doc_id, 1, h2 || h3 FROM mh
  UNION ALL SELECT doc_id, 2, h4 || h5 FROM mh
  UNION ALL SELECT doc_id, 3, h6 || h7 FROM mh
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id
),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, x.sz AS sz, y.sz AS sz_b,
         COUNT(*) AS inter
  FROM ds x JOIN ds y ON x.sg = y.sg AND x.doc_id < y.doc_id
  GROUP BY 1, 2, 3, 4
),
truth AS (
  SELECT a, b FROM inter WHERE 2 * inter >= sz + sz_b - inter
),
hit AS (SELECT cand.a, cand.b FROM cand JOIN truth ON truth.a = cand.a AND truth.b = cand.b),
counts AS (
  SELECT (SELECT COUNT(*) FROM cand) AS n_candidates,
         (SELECT COUNT(*) FROM truth) AS n_true,
         (SELECT COUNT(*) FROM hit) AS n_hit
)
SELECT n_candidates, n_true, n_hit,
       CASE WHEN n_candidates = 0 THEN -1
            ELSE (n_hit * 1000000) // n_candidates END AS precision_ppm,
       CASE WHEN n_true = 0 THEN -1 ELSE (n_hit * 1000000) // n_true END AS recall_ppm
FROM counts
"""

QUERIES["dedup_minhash_eval"] = dedup_minhash_eval
ORACLE["dedup_minhash_eval"] = DEDUP_MINHASH_EVAL_SQL


def corpus_boilerplate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (the C4/CCNet pipeline
    step BETWEEN quality filtering and doc-level dedup: headers,
    footers, navigation chrome repeat across many documents without
    making any PAIR of documents near-duplicates): 5-gram spans whose
    document frequency reaches GREATEST(3, n_docs DIV 100) — the
    threshold scales with the corpus (r8 lesson: a fixed cap
    calibrated at one SF silently misclassifies at 10×) and is
    computed IN-PLAN from a count aggregate, no driver-side count.
    Emits, per source: span positions, hot-span occurrences, the
    boilerplate fraction, and how many distinct hot spans hit the
    source.

    Engine-exact: all counts are integers; the fraction is one IEEE
    division, rounded 6dp.

    Scale: per-doc DISTINCT spans collapse map-side (array_distinct
    BEFORE the explode — never a post-explode shuffle distinct); the
    df aggregation is the only span-keyed shuffle; the hot-span set
    (df-filtered, tiny by Zipf) joins back to the occurrence stream
    and AQE picks the broadcast side at runtime."""
    # the documents parquet arrives as ONE partition — spread before
    # the per-row 5-gram transform (A/B at sf0.1: 2.85 vs 2.19s)
    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", "source", F.split("text", " ").alias("ws"))
    )
    spans = d.select(
        "doc_id",
        "source",
        F.expr(
            "transform(sequence(1, greatest(size(ws) - 4, 0)),"
            " i -> concat_ws(' ', slice(ws, i, 5)))"
        ).alias("sp"),
    )
    occ = spans.select(
        "doc_id", "source", F.explode("sp").alias("s")
    )
    per_doc = spans.select("doc_id", F.explode(F.array_distinct("sp")).alias("s"))
    thr = d.agg(
        F.greatest(F.lit(3), F.expr("count(1) DIV 100")).alias("thr")
    )
    hot = (
        per_doc.groupBy("s")
        .agg(F.count(F.lit(1)).alias("df"))
        .join(F.broadcast(thr))
        .where(F.col("df") >= F.col("thr"))
        .select("s")
    )
    marked = occ.join(hot.withColumn("is_hot", F.lit(1)), "s", "left")
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_spans"),
            F.sum(F.coalesce(F.col("is_hot"), F.lit(0))).cast("bigint").alias("n_boiler"),
            F.countDistinct(F.when(F.col("is_hot") == 1, F.col("s")))
            .cast("bigint")
            .alias("n_hot_spans"),
        )
        .withColumn(
            "boiler_frac",
            F.round(F.col("n_boiler").cast("double") / F.col("n_spans").cast("double"), 6),
        )
        .orderBy("source")
    )


CORPUS_BOILERPLATE_SQL = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
occ AS (
  SELECT doc_id, source,
         ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4] AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 4, 0))) AS i) t
),
per_doc AS (SELECT DISTINCT doc_id, s FROM occ),
thr AS (SELECT GREATEST(3, COUNT(*) // 100) AS thr FROM documents),
hot AS (
  SELECT s FROM per_doc GROUP BY s
  HAVING COUNT(*) >= (SELECT thr FROM thr)
),
marked AS (
  SELECT o.source, o.s, CASE WHEN h.s IS NULL THEN 0 ELSE 1 END AS is_hot
  FROM occ o LEFT JOIN hot h ON h.s = o.s
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(is_hot) AS BIGINT) AS n_boiler,
       CAST(COUNT(DISTINCT CASE WHEN is_hot = 1 THEN s END) AS BIGINT) AS n_hot_spans,
       ROUND(CAST(SUM(is_hot) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS boiler_frac
FROM marked GROUP BY source ORDER BY source
"""

QUERIES["corpus_boilerplate_spans"] = corpus_boilerplate_spans
ORACLE["corpus_boilerplate_spans"] = CORPUS_BOILERPLATE_SQL


def _lsh_scurve_expr(col: str, r: int, b: int) -> str:
    """S-curve P(detect | jaccard s) = 1 − (1 − s^r)^b for an
    (r rows × b bands) MinHash-LSH layout, generated as an EXPLICIT
    squaring chain (r and b are powers of two) so both engines
    execute the identical IEEE multiplication sequence — `pow()` is
    not correctly-rounded and would diverge by ulps."""
    import math as _math

    sr = col
    for _ in range(int(_math.log2(r))):
        sr = f"(({sr}) * ({sr}))"
    q = f"(1.0 - {sr})"
    for _ in range(int(_math.log2(b))):
        q = f"(({q}) * ({q}))"
    return f"(1.0 - {q})"


_LSH_CONFIGS = [(2, 32), (4, 16), (4, 8), (8, 4)]  # (rows r, bands b), r·b = sig size


def dedup_lsh_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH parameter advisor: for each candidate (rows r × bands b)
    MinHash layout, the EXPECTED recall on true near-dups (jaccard ≥
    0.7) and expected leak rate on the near-miss band (0.3 ≤ j <
    0.7), integrating the analytic S-curve P(s) = 1 − (1 − s^r)^b
    over the corpus's OWN observed pair-Jaccard distribution — the
    tuning decision (steepness vs signature budget) is
    data-dependent, so a production dedup run computes this table
    before committing to a layout, instead of trusting textbook
    curves drawn for uniform similarity.

    Engine determinism: pair Jaccards come from the exact
    inverted-index miner (ROUND 6 doubles); each P(s) is an explicit
    power-of-two squaring chain (identical IEEE sequence both
    engines) e6-rounded PER TERM before integer summation (never a
    float sum across shuffled rows); the final ppm means are integer
    DIVs with GREATEST(n, 1) guards (ANSI divide-by-zero rule).
    Pairs with j < 0.3 are excluded: their P(s) ≤ P(0.3) is
    negligible for every configured curve, and the cut keeps the
    mined pair set bounded — documented conservative bias (leak
    estimates read slightly HIGH).

    Scale: ONE mining pass at the band floor (τ=0.3, same
    corpus-scaled max_df hot-shingle guard as the dedup miners); all
    four configs ride the same projection map-side (no per-config
    re-scan); the final table is 4 rows."""
    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, "doc_id", "text", n=3, tau=0.3, max_df=_df_guard(d))
    p_cols = [
        F.expr(f"CAST(ROUND({_lsh_scurve_expr('jaccard', r, b)} * 1000000.0) AS BIGINT)").alias(
            f"p_{r}_{b}"
        )
        for r, b in _LSH_CONFIGS
    ]
    proj = pairs.select(F.col("jaccard"), *p_cols)
    is_true = F.col("jaccard") >= 0.7
    aggs = [
        F.sum(F.when(is_true, 1).otherwise(0)).cast("bigint").alias("n_true"),
        F.sum(F.when(~is_true, 1).otherwise(0)).cast("bigint").alias("n_false"),
    ]
    for r, b in _LSH_CONFIGS:
        aggs.append(
            F.sum(F.when(is_true, F.col(f"p_{r}_{b}")).otherwise(0))
            .cast("bigint")
            .alias(f"st_{r}_{b}")
        )
        aggs.append(
            F.sum(F.when(~is_true, F.col(f"p_{r}_{b}")).otherwise(0))
            .cast("bigint")
            .alias(f"sf_{r}_{b}")
        )
    one = proj.agg(*aggs)
    stack_args = ", ".join(
        f"{r}, {b}, st_{r}_{b}, sf_{r}_{b}" for r, b in _LSH_CONFIGS
    )
    return (
        one.select(
            "n_true",
            "n_false",
            F.expr(
                f"stack({len(_LSH_CONFIGS)}, {stack_args}) AS (rows_r, bands_b, st, sf)"
            ),
        )
        .select(
            F.col("rows_r").cast("int").alias("rows_r"),
            F.col("bands_b").cast("int").alias("bands_b"),
            F.col("n_true").alias("n_true_pairs"),
            F.col("n_false").alias("n_nearmiss_pairs"),
            F.expr(
                "CAST(COALESCE(st, 0) DIV GREATEST(n_true, 1) AS BIGINT)"
            ).alias("est_recall_ppm"),
            F.expr(
                "CAST(COALESCE(sf, 0) DIV GREATEST(n_false, 1) AS BIGINT)"
            ).alias("est_leak_ppm"),
        )
        .orderBy("rows_r", "bands_b")
    )


def _lsh_tuning_sql() -> str:
    per_cfg = []
    for r, b in _LSH_CONFIGS:
        p = _lsh_scurve_expr("jaccard", r, b)
        per_cfg.append(
            f"SELECT {r} AS rows_r, {b} AS bands_b,\n"
            f"  (SELECT CAST(COUNT(*) AS BIGINT) FROM scored WHERE is_true) AS n_true_pairs,\n"
            f"  (SELECT CAST(COUNT(*) AS BIGINT) FROM scored WHERE NOT is_true) AS n_nearmiss_pairs,\n"
            f"  CAST(COALESCE((SELECT SUM(CAST(ROUND({p} * 1000000.0) AS BIGINT)) FROM scored WHERE is_true), 0)\n"
            f"       // GREATEST((SELECT COUNT(*) FROM scored WHERE is_true), 1) AS BIGINT) AS est_recall_ppm,\n"
            f"  CAST(COALESCE((SELECT SUM(CAST(ROUND({p} * 1000000.0) AS BIGINT)) FROM scored WHERE NOT is_true), 0)\n"
            f"       // GREATEST((SELECT COUNT(*) FROM scored WHERE NOT is_true), 1) AS BIGINT) AS est_leak_ppm\n"
        )
    union = "\nUNION ALL\n".join(per_cfg)
    return f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i) t
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
keep AS (
  SELECT s FROM sh GROUP BY s
  HAVING COUNT(*) BETWEEN 2 AND (SELECT GREATEST(100, n_docs // 50) FROM nd)
),
pruned AS (SELECT sh.* FROM sh JOIN keep USING (s)),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
  FROM pruned a JOIN pruned b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  -- threshold on the RAW ratio (the Spark miner filters pre-round)
  SELECT ROUND(c / CAST(sa.n + sb.n - c AS DOUBLE), 6) AS jaccard
  FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
  WHERE c / CAST(sa.n + sb.n - c AS DOUBLE) >= 0.3
),
scored AS MATERIALIZED (
  SELECT jaccard, jaccard >= 0.7 AS is_true FROM pairs
)
{union}
ORDER BY rows_r, bands_b
"""


QUERIES["dedup_lsh_tuning"] = dedup_lsh_tuning
ORACLE["dedup_lsh_tuning"] = _lsh_tuning_sql()



# ---------------------------------------------------------------------------
# corpus_dedup_cluster_sizes — duplicate-cluster size distribution audit
# (round 10)
# ---------------------------------------------------------------------------


def corpus_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE DISTRIBUTION — the audit a dedup run
    reports before anyone deletes anything: how much of the corpus
    sits in clusters of 2, of 4, in the single largest cluster, and
    how many docs deduplication would actually remove (Σ(size−1)).
    Web-scale corpora are dominated by a heavy duplicate tail;
    training-mix decisions (hard-dedup vs soft-downweight, see
    corpus_soft_dedup_weight) hinge on exactly this histogram.

    Fixture plants a known cluster structure (stride-proof % keys,
    r9 rule): every doc_id % 50 == 0 gains one clone and every
    doc_id % 200 == 0 two more — sizes {1, 2, 4} with exact
    expected masses at every SF.

    Engine-exact: pure integer counts; corpus shares as integer ppm
    via DIV. Scale: one shuffle on the content hash (md5 — never the
    raw text) to cluster sizes, then a |distinct sizes|-row histogram;
    removable/ppm math on that tiny frame."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = (
        d.unionAll(
            d.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        .unionAll(
            d.where(F.col("doc_id") % 200 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        .unionAll(
            d.where(F.col("doc_id") % 200 == 0).select(
                (F.col("doc_id") + 3000000).alias("doc_id"), "text"
            )
        )
    )
    clusters = corpus.groupBy(F.md5("text").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("size")
    )
    hist = clusters.groupBy("size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        hist.withColumn("n_docs", (F.col("size") * F.col("n_clusters")).cast("bigint"))
        .withColumn("corpus_docs", F.sum("n_docs").over(wall).cast("bigint"))
        .select(
            F.col("size").cast("bigint").alias("cluster_size"),
            "n_clusters",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 DIV corpus_docs AS BIGINT)").alias("docs_ppm"),
            F.expr("CAST((size - 1) * n_clusters AS BIGINT)").alias("removable_docs"),
        )
        .orderBy("cluster_size")
    )


DEDUP_CLUSTER_SIZES_SQL = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 200 = 0
  UNION ALL
  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 200 = 0
),
clusters AS (
  SELECT md5(text) AS h, CAST(COUNT(*) AS BIGINT) AS size
  FROM corpus GROUP BY 1
),
hist AS (
  SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters FROM clusters GROUP BY 1
)
SELECT CAST(size AS BIGINT) AS cluster_size,
       n_clusters,
       CAST(size * n_clusters AS BIGINT) AS n_docs,
       CAST(size * n_clusters * 1000000
            // (SELECT SUM(size * n_clusters) FROM hist) AS BIGINT) AS docs_ppm,
       CAST((size - 1) * n_clusters AS BIGINT) AS removable_docs
FROM hist
ORDER BY cluster_size
"""

QUERIES["corpus_dedup_cluster_sizes"] = corpus_dedup_cluster_sizes
ORACLE["corpus_dedup_cluster_sizes"] = DEDUP_CLUSTER_SIZES_SQL


# ---------------------------------------------------------------------------
# dedup_survivor_quality_audit — who should survive a cluster?
# (round 10)
# ---------------------------------------------------------------------------

# stride-proof variant coins (md5 nibble — sf1 doc ids stride by 1e8,
# so `% k` residues are degenerate there; a hash nibble is uniform)
_SVQ_NIB = (
    "(CAST(position(substr(md5(concat('sv:', CAST(doc_id AS STRING))), 1, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT))"
)


def dedup_survivor_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor-selection audit for near-dup clusters: the naive
    min-id rule every exact/LSH dedup here uses (canonical_id =
    MIN(doc_id)) silently keeps the FIRST-crawled member, not the
    BEST one. This audit builds clusters with planted non-identical
    members — a DOUBLED variant (nibble < 2 of md5('sv:'‖id)) and a
    TRUNCATED-to-half variant (nibble in [2,4)) — scores every
    member with the house quality proxy (length term × stopword
    purity, fully integer at e12), and reports per variant kind how
    often min-id keeps a worse document and by how much. The planted
    direction is known (doubling raises the sub-400-token length
    term, truncation lowers it), so the property test can assert the
    audit FIRES, not just that engines agree (the r10
    quality_classifier constant-label lesson).

    Scale: one union of map-side variant projections, one cluster
    window, one 2-row agg — linear."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    doubled = d.where(F.expr(f"{_SVQ_NIB} < 2")).select(
        F.col("doc_id").alias("cluster_id"),
        F.expr("doc_id + 1000000").alias("member_id"),
        F.expr("concat(text, ' ', text)").alias("text"),
        F.lit("doubled").alias("variant_kind"),
    )
    truncated = d.where(F.expr(f"{_SVQ_NIB} >= 2 AND {_SVQ_NIB} < 4")).select(
        F.col("doc_id").alias("cluster_id"),
        F.expr("doc_id + 2000000").alias("member_id"),
        F.expr(
            "array_join(slice(split(text, ' '), 1, CAST("
            "GREATEST(CAST(size(split(text, ' ')) AS INT) DIV 2, 1) AS INT)), ' ')"
        ).alias("text"),
        F.lit("truncated").alias("variant_kind"),
    )
    originals = d.join(
        doubled.select(F.col("cluster_id").alias("doc_id")).union(
            truncated.select(F.col("cluster_id").alias("doc_id"))
        ),
        "doc_id",
    ).select(
        F.col("doc_id").alias("cluster_id"),
        F.col("doc_id").alias("member_id"),
        "text",
        F.lit(None).cast("string").alias("variant_kind"),
    )
    members = originals.unionByName(doubled).unionByName(truncated)
    q = members.select(
        "cluster_id",
        "member_id",
        F.expr("COALESCE(variant_kind, 'original')").alias("vk"),
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("nt"),
        F.expr(
            "CAST(size(filter(split(text, ' '), w -> w IN ('a', 'the'))) AS BIGINT)"
        ).alias("ns"),
    ).select(
        "cluster_id",
        "member_id",
        "vk",
        F.expr(
            "LEAST(CAST(1000000 AS BIGINT), nt * 2500)"
            " * (1000000 - ns * 1000000 DIV nt)"
        ).alias("q_e12"),
    )
    audit = q.select(
        "cluster_id",
        "vk",
        "q_e12",
        F.expr("MIN(member_id) OVER (PARTITION BY cluster_id)").alias("survivor_id"),
        F.col("member_id"),
        F.expr("MAX(q_e12) OVER (PARTITION BY cluster_id)").alias("q_max"),
    )
    surv = audit.where(F.col("member_id") == F.col("survivor_id"))
    kinds = audit.where(F.col("vk") != "original").select(
        "cluster_id", F.col("vk").alias("variant_kind")
    )
    return (
        surv.join(kinds, "cluster_id")
        .groupBy("variant_kind")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_clusters"),
            F.expr("CAST(SUM(CASE WHEN q_e12 < q_max THEN 1 ELSE 0 END) AS BIGINT)").alias(
                "n_suboptimal_survivor"
            ),
            F.expr("CAST(SUM(q_max - q_e12) DIV COUNT(*) AS BIGINT)").alias(
                "mean_quality_gap_e12"
            ),
            F.expr("CAST(MAX(q_max - q_e12) AS BIGINT)").alias("max_quality_gap_e12"),
        )
        .orderBy("variant_kind")
    )


DEDUP_SVQ_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents),
doubled AS (
  SELECT doc_id AS cluster_id, doc_id + 1000000 AS member_id,
         concat(text, ' ', text) AS text, 'doubled' AS vk
  FROM d WHERE {_SVQ_NIB} < 2
),
truncated AS (
  SELECT doc_id AS cluster_id, doc_id + 2000000 AS member_id,
         array_to_string(list_slice(string_split(text, ' '), 1,
           GREATEST(len(string_split(text, ' ')) // 2, 1)), ' ') AS text,
         'truncated' AS vk
  FROM d WHERE {_SVQ_NIB} >= 2 AND {_SVQ_NIB} < 4
),
originals AS (
  SELECT d.doc_id AS cluster_id, d.doc_id AS member_id, d.text, 'original' AS vk
  FROM d JOIN (SELECT cluster_id FROM doubled UNION ALL SELECT cluster_id FROM truncated) v
    ON d.doc_id = v.cluster_id
),
members AS (
  SELECT * FROM originals UNION ALL SELECT * FROM doubled UNION ALL SELECT * FROM truncated
),
q AS MATERIALIZED (
  SELECT cluster_id, member_id, vk,
         LEAST(CAST(1000000 AS BIGINT), CAST(len(string_split(text, ' ')) AS BIGINT) * 2500)
         * (1000000 - CAST(len(list_filter(string_split(text, ' '), w -> w IN ('a', 'the'))) AS BIGINT)
            * 1000000 // CAST(len(string_split(text, ' ')) AS BIGINT)) AS q_e12
  FROM members
),
audit AS (
  SELECT cluster_id, vk, q_e12,
         MIN(member_id) OVER (PARTITION BY cluster_id) AS survivor_id,
         member_id,
         MAX(q_e12) OVER (PARTITION BY cluster_id) AS q_max
  FROM q
),
surv AS (SELECT * FROM audit WHERE member_id = survivor_id),
kinds AS (SELECT cluster_id, vk AS variant_kind FROM audit WHERE vk <> 'original')
SELECT k.variant_kind,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(CASE WHEN s.q_e12 < s.q_max THEN 1 ELSE 0 END) AS BIGINT) AS n_suboptimal_survivor,
       CAST(SUM(s.q_max - s.q_e12) // COUNT(*) AS BIGINT) AS mean_quality_gap_e12,
       CAST(MAX(s.q_max - s.q_e12) AS BIGINT) AS max_quality_gap_e12
FROM surv s JOIN kinds k ON s.cluster_id = k.cluster_id
GROUP BY 1
ORDER BY k.variant_kind
"""

QUERIES["dedup_survivor_quality_audit"] = dedup_survivor_quality_audit
ORACLE["dedup_survivor_quality_audit"] = DEDUP_SVQ_SQL
