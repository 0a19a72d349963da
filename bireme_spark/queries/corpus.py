"""Corpus-management queries for training-data pipelines: dataset
statistics and deterministic sampling (SURVEY.md §2.C extensions).

Both are declarative single-shuffle plans: stats is a groupBy with
map-side partial aggregation; systematic sampling is one window rank
per stratum — reproducible (no RNG), which is what a 100 TB pipeline
actually wants (re-runs must pick the same documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.functions.text import quality_score, token_count
from bireme_spark.sources.tables import load_table

_STOP_SQL = "('a', 'the')"


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus statistics: doc count, token volume,
    char volume, mean quality. The first pass any data pipeline runs
    over a new crawl — one shuffle of ~|sources|×|langs| groups."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.round(F.avg("quality"), 6).alias("avg_quality"),
        )
        .orderBy("source", "lang")
    )


CORPUS_STATS_SQL = f"""
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       ROUND(AVG(
         least(1.0, len(string_split(text, ' ')) / 400.0)
         * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                / len(string_split(text, ' ')))
       ), 6) AS avg_quality
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


def corpus_sample_systematic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 1-in-10 systematic sample per source stratum:
    rank docs by id within each source, keep every 10th. Reproducible
    across runs and engines (no RNG seed drift); one shuffle on the
    stratum key. At 100 TB the window is per-stratum — strata are
    processed independently, so no global sort."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") - 1) % 10 == 0)
        .select("doc_id", "source", "lang", "n_chars")
        .orderBy("doc_id")
    )


CORPUS_SAMPLE_SQL = """
SELECT doc_id, source, lang, n_chars
FROM (SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents) t
WHERE (rn - 1) % 10 = 0
ORDER BY doc_id
"""


_CHUNK = 64
_STRIDE = 48


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-window chunking for training-data prep: 64-token chunks
    every 48 tokens (16-token overlap). Trailing windows that would
    add no new tokens beyond the previous chunk are suppressed.

    Pure map-side fan-out: one projected token array, explode of a
    `sequence()` of start offsets, slice per chunk — no shuffle, so at
    100 TB it scales with the scan. (Compare a join against a
    generated offsets table, which would shuffle everything.)"""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    e = t.select(
        "doc_id",
        "n",
        "toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n") - 1, F.lit(0)), F.lit(_STRIDE))
        ).alias("start"),
    ).where((F.col("start") == 0) | (F.col("start") + (_CHUNK - _STRIDE) < F.col("n")))
    chunk = F.slice("toks", F.col("start") + 1, F.lit(_CHUNK))
    return e.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("int").alias("chunk_id"),
        F.col("start").cast("int").alias("start_tok"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


DOC_CHUNKING_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
), e AS (
  SELECT doc_id, toks, n, unnest(range(0, n, {_STRIDE})) AS s FROM t
)
SELECT doc_id,
       CAST(s / {_STRIDE} AS INTEGER) AS chunk_id,
       CAST(s AS INTEGER) AS start_tok,
       CAST(len(toks[s+1:s+{_CHUNK}]) AS INTEGER) AS n_chunk_tokens,
       array_to_string(toks[s+1:s+{_CHUNK}], ' ') AS chunk_text
FROM e
WHERE s = 0 OR s + {_CHUNK - _STRIDE} < n
"""


def corpus_filter_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end retention pipeline — the composition a real corpus
    build runs: language gate (heuristic lang-id) → quality threshold
    → exact dedup by content hash (keep lowest doc_id). Filters are
    map-side and reach the scan; the only shuffle is the dedup window
    on md5(text), which at 100 TB is the same single PK-hash exchange
    as `dedup_exact`."""
    from bireme_spark.functions.text import lang_id, quality_score, token_count

    d = load_table(spark, sf_dir, "documents")
    kept = (
        d.withColumn("quality", quality_score(F.col("text")))
        .where((lang_id(F.col("text")) == "en") & (F.col("quality") >= 0.08))
        .withColumn("content_hash", F.md5(F.col("text")))
    )
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        kept.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            "source",
            "lang",
            token_count(F.col("text")).alias("n_tokens"),
            F.round("quality", 6).alias("quality"),
        )
    )


CORPUS_FILTER_SQL = f"""
WITH scored AS (
  SELECT doc_id, source, lang, text,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         least(1.0, len(string_split(text, ' ')) / 400.0)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                  / len(string_split(text, ' '))) AS quality,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
           / len(string_split(text, ' ')) AS stop_ratio
  FROM documents
), kept AS (
  SELECT *, md5(text) AS content_hash FROM scored
  WHERE stop_ratio > 0.03 AND quality >= 0.08
)
SELECT doc_id, source, lang, n_tokens, ROUND(quality, 6) AS quality
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
      FROM kept) t
WHERE rn = 1
"""


_TOKEN_BUDGET = 800


def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data selection under a token budget: per source stratum, rank
    docs by quality (best first) and keep docs while the running token
    total stays under the budget — how a training mix allocates a
    fixed token count across sources. One window per stratum (ordered
    cumsum), no global sort; each stratum fills independently, which
    is exactly the distributed behavior wanted at 100 TB."""
    from bireme_spark.functions.text import quality_score, token_count

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        F.round(quality_score(F.col("text")), 6).alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("quality"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") - F.col("n_tokens") < _TOKEN_BUDGET)
        .select("doc_id", "source", "n_tokens", "quality", F.col("cum_tokens").cast("bigint").alias("cum_tokens"))
    )


CORPUS_TOKEN_BUDGET_SQL = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         ROUND(least(1.0, len(string_split(text, ' ')) / 400.0)
           * (1.0 - CAST(len(list_filter(string_split(text, ' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                  / len(string_split(text, ' '))), 6) AS quality
  FROM documents
), ranked AS (
  SELECT *, CAST(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY quality DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, quality, cum_tokens
FROM ranked
WHERE cum_tokens - n_tokens < {_TOKEN_BUDGET}
"""


_PACK_LEN = 512  # training sequence length (tokens)


def doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training: documents are laid end-to-end
    (separator-free) into fixed ``_PACK_LEN``-token sequences, in
    deterministic doc_id order WITHIN each source stream — each
    packer works one stream, so the window sort is per-stratum, not
    global (a single global ordering would serialize the corpus
    through one partition at 100 TB). Emits each doc's span of pack
    sequences: a doc crossing a boundary is split across packs, the
    standard pretraining layout (GPT-style packed batches)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / _PACK_LEN).cast("int").alias("first_pack"),
        F.floor((cum - 1) / _PACK_LEN).cast("int").alias("last_pack"),
        (F.floor((cum - 1) / _PACK_LEN) - F.floor((cum - F.col("n_tokens")) / _PACK_LEN) + 1)
        .cast("int")
        .alias("n_packs_spanned"),
    ).orderBy("source", "doc_id")


DOC_PACKING_SQL = f"""
WITH t AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS INTEGER) AS n_tokens,
       CAST(FLOOR((cum - n_tokens) / {_PACK_LEN}) AS INTEGER) AS first_pack,
       CAST(FLOOR((cum - 1) / {_PACK_LEN}) AS INTEGER) AS last_pack,
       CAST(FLOOR((cum - 1) / {_PACK_LEN})
            - FLOOR((cum - n_tokens) / {_PACK_LEN}) + 1 AS INTEGER) AS n_packs_spanned
FROM c
ORDER BY source, doc_id
"""


_MIX_ALPHA_TARGET = 0.25  # overall downsample rate
_MIX_MOD = 100  # doc_ids are dense, so id mod 100 is uniform at any scale


def corpus_mix_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (α = 0.5): per-source sampling
    weight ∝ √n_s (mT5/UL2-style upweighting of small sources), with
    an overall 25% token... doc budget. Selection is a deterministic
    map-side rate filter — keep doc iff doc_id mod 100 falls under
    the source's keep-rate — NOT a per-source rank window: the counts
    aggregate is tiny and broadcast back, so the plan is one
    partial-agg shuffle of |sources| rows plus a pure scan filter.
    Reproducible across runs/engines, no RNG."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    # sqrt weights as e6-scaled INTEGERS summed exactly: the old
    # SUM(sqrt(n_s)) double fold was shuffle-order-dependent, and
    # with equal-sized sources keep_rate*MOD sits EXACTLY on the
    # FLOOR boundary (0.25*100) — one ulp of sum wobble flipped the
    # row count between runs (caught by a full-gate sf0.1 run in r6).
    # threshold = (MOD * n_total * s_i) DIV (4 * S * n_s) is pure
    # integer on both engines (alpha = 1/4), capped at MOD.
    sq = counts.select(
        "source",
        "n_s",
        F.expr("CAST(ROUND(SQRT(n_s) * 1000000, 0) AS BIGINT)").alias("s_e6"),
    )
    tot = sq.agg(
        F.sum("n_s").alias("n_total"), F.sum("s_e6").alias("sum_s_e6")
    )
    rates = sq.crossJoin(F.broadcast(tot)).select(
        "source",
        # threshold numerator is MOD * n_total * s_e6 ~ 1e2*1e9*3e10
        # at 1e9 docs — past BIGINT; run the integer division in
        # DECIMAL(38,0) (HUGEINT on DuckDB) like mahalanobis does
        F.expr(
            f"LEAST(CAST({_MIX_MOD} AS BIGINT),"
            f" CAST((CAST({_MIX_MOD} AS DECIMAL(38,0)) * n_total * s_e6)"
            f" DIV (CAST(4 AS DECIMAL(38,0)) * sum_s_e6 * n_s) AS BIGINT))"
        ).alias("thr"),
    )
    return (
        d.join(F.broadcast(rates), "source")
        .where(F.pmod(F.col("doc_id"), F.lit(_MIX_MOD)) < F.col("thr"))
        .select(
            "doc_id",
            "source",
            F.expr(f"CAST(thr AS DOUBLE) / {_MIX_MOD}").alias("keep_rate"),
        )
        .orderBy("source", "doc_id")
    )


CORPUS_MIX_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS n_s FROM documents GROUP BY source
), sq AS (
  SELECT source, n_s,
         CAST(ROUND(sqrt(n_s) * 1000000, 0) AS BIGINT) AS s_e6
  FROM counts
), tot AS (
  SELECT CAST(SUM(n_s) AS BIGINT) AS n_total,
         CAST(SUM(s_e6) AS BIGINT) AS sum_s_e6
  FROM sq
), rates AS (
  SELECT source,
         LEAST(CAST({_MIX_MOD} AS BIGINT),
               CAST((CAST({_MIX_MOD} AS HUGEINT) * n_total * s_e6)
                    // (CAST(4 AS HUGEINT) * sum_s_e6 * n_s) AS BIGINT)) AS thr
  FROM sq, tot
)
SELECT d.doc_id, d.source, CAST(r.thr AS DOUBLE) / {_MIX_MOD} AS keep_rate
FROM documents d JOIN rates r USING (source)
WHERE d.doc_id % {_MIX_MOD} < r.thr
ORDER BY source, doc_id
"""


_BENCH_MOD, _BENCH_REM = 50, 7  # every 50th doc plays the eval set
_CONTAM_N = 3


def corpus_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: which training documents
    contain n-grams from the held-out eval set (the decontamination
    pass of GPT-3 §C / PaLM §7 pipelines — n-gram collision against
    the benchmark). A deterministic 1-in-50 document slice plays the
    benchmark.

    Scale plan: the benchmark shingle set is tiny next to a 100 TB
    corpus, so it is broadcast — the training side is a map-side
    hash-probe on its exploded shingles (one shuffle on doc_id for
    the per-doc counts, none for the join). Shingling itself is
    map-side distinct arrays (operators/dedup.shingles)."""
    from bireme_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", n=_CONTAM_N)
    is_bench = (F.col("doc_id") % _BENCH_MOD) == _BENCH_REM
    bench = sh.where(is_bench).select("shingle").distinct()
    train = sh.where(~is_bench)
    hits = (
        train.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    totals = train.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    return (
        totals.join(hits, "doc_id")
        .select(
            "doc_id",
            F.col("n_shingles").cast("int").alias("n_shingles"),
            F.col("n_contaminated").cast("int").alias("n_contaminated"),
            F.round(
                F.col("n_contaminated") / F.col("n_shingles").cast("double"), 6
            ).alias("contaminated_frac"),
        )
        .orderBy("doc_id")
    )


CORPUS_CONTAMINATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {_CONTAM_N - 1}, 0)),
           i -> array_to_string(w[i:i+{_CONTAM_N - 1}], ' ')))) AS shingle
  FROM toks
), bench AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_BENCH_MOD} = {_BENCH_REM}
), train AS (
  SELECT * FROM sh WHERE doc_id % {_BENCH_MOD} <> {_BENCH_REM}
), tot AS (
  SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY doc_id
), hit AS (
  SELECT t.doc_id, COUNT(*) AS n_contaminated
  FROM train t JOIN bench b USING (shingle)
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       CAST(t.n_shingles AS INTEGER) AS n_shingles,
       CAST(h.n_contaminated AS INTEGER) AS n_contaminated,
       ROUND(h.n_contaminated / CAST(t.n_shingles AS DOUBLE), 6)
         AS contaminated_frac
FROM tot t JOIN hit h USING (doc_id)
ORDER BY doc_id
"""


def corpus_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10 by doc_id residue
    — re-runs assign every document identically, the property a
    100 TB pipeline needs so shards can be re-materialized) with
    per-split per-source doc/token counts for leakage auditing.

    Map-side split label + one hash aggregation; no RNG, no shuffle
    beyond the stats groupBy."""
    d = load_table(spark, sf_dir, "documents")
    r = F.col("doc_id") % 10
    split = (
        F.when(r <= 7, "train").when(r == 8, "val").otherwise("test").alias("split")
    )
    return (
        d.select(split, "source", token_count(F.col("text")).alias("n_tokens"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .orderBy("split", "source")
    )


CORPUS_SPLIT_SQL = """
SELECT CASE WHEN doc_id % 10 <= 7 THEN 'train'
            WHEN doc_id % 10 = 8 THEN 'val' ELSE 'test' END AS split,
       source, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY 1, 2 ORDER BY 1, 2
"""


def corpus_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle + shard layout: every doc gets a
    pseudorandom but REPRODUCIBLE position from md5(seed ‖ doc_id) —
    the same permutation on any engine at any cluster size — and a
    shard from the hash's first nibble (16 shards). This is how a
    100 TB trainer writes a shuffled epoch WITHOUT a global sort:
    shard = hash bucket (one shuffle), order within shard = local
    sort by the hash — per-shard O((N/shards)·log) sorts; a writer
    runs ``partitionBy(shard) + sortWithinPartitions(hx)``. A new
    seed ("epoch-1") is a fresh independent permutation; re-running
    the same seed re-materializes byte-identical shards (the
    resume/debug property RNG-based shuffles lack). The md5 hex is
    engine-portable, so the full layout is oracle-checked, not just
    row counts."""
    seed = "epoch-0"
    d = load_table(spark, sf_dir, "documents")
    hx = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    h = d.select("doc_id", hx.alias("hx"))
    shard = F.expr("CAST(locate(substring(hx, 1, 1), '0123456789abcdef') - 1 AS INT)")
    from pyspark.sql import Window

    w = Window.partitionBy(F.substring("hx", 1, 1)).orderBy("hx", "doc_id")
    return (
        h.select(
            "doc_id",
            shard.alias("shard"),
            F.row_number().over(w).alias("pos_in_shard"),
        )
        .orderBy("shard", "pos_in_shard")
    )


CORPUS_SHUFFLE_SHARD_SQL = """
WITH h AS (
  SELECT doc_id, md5(concat('epoch-0:', CAST(doc_id AS VARCHAR))) AS hx
  FROM documents
)
SELECT doc_id,
       CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS INTEGER) AS shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id)
            AS INTEGER) AS pos_in_shard
FROM h
ORDER BY shard, pos_in_shard
"""


def corpus_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al., arXiv:2302.03169): rank raw
    documents by importance weight log(p_target/p_raw) under hashed
    bigram-feature unigram models, where the target distribution is
    the ``lang='en'`` slice (the "high-quality domain" proxy). The
    top-100 by weight are the docs a training mix should up-sample.

    Determinism/portability: features hash via md5 (identical in both
    engines) into 256 buckets; the per-bucket log-ratio is rounded to
    6dp BEFORE the per-doc multiply-sum, and contributions are
    DECIMAL-summed, so doc weights are bit-identical; top-100 ties
    break by doc_id.

    Scale shape: the corpus is tokenized ONCE into (doc, bucket, tf) —
    one shuffle; both models (raw + target) are 256-row re-aggs of
    that frame; the ratio table is broadcast back onto it (no second
    corpus shuffle); final selection is a TakeOrdered top-k, no global
    sort exchange. At 100 TB only the 256-row model and the top-k
    cross the driver."""
    # NO repartition here: the (doc,bucket,tf) aggregate below is
    # consumed three times (raw model, target model, scoring join) and
    # identical subplans become one ReusedExchange — a prepended
    # round-robin shuffle costs more than the light tokenize saves
    # (interleaved A/B at sf0.1: 2.06s vs 2.90s min-of-4)
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split("text", " ").alias("toks")
    )
    bg = d.where(F.size("toks") >= 2).select(
        "doc_id",
        "lang",
        F.explode(
            F.expr("transform(sequence(1, size(toks)-1), i -> concat(toks[i-1], ' ', toks[i]))")
        ).alias("bg"),
    )
    feats = bg.select(
        "doc_id",
        "lang",
        F.conv(F.substring(F.md5("bg"), 1, 2), 16, 10).cast("int").alias("bucket"),
    )
    fd = feats.groupBy("doc_id", "lang", "bucket").agg(F.count(F.lit(1)).alias("tf"))
    raw_m = fd.groupBy("bucket").agg(F.sum("tf").alias("cr"))
    tgt_m = fd.where(F.col("lang") == "en").groupBy("bucket").agg(F.sum("tf").alias("ct"))
    # target ⊆ raw, so the raw model covers every occupied bucket;
    # +1/(N+256) add-one smoothing keeps empty target buckets finite
    model = (
        raw_m.join(tgt_m, "bucket", "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
        .crossJoin(F.broadcast(raw_m.agg(F.sum("cr").alias("R"))))
        .crossJoin(F.broadcast(tgt_m.agg(F.sum("ct").alias("T"))))
        .select(
            "bucket",
            F.round(
                F.log(
                    ((F.col("ct") + 1) / (F.col("T") + 256))
                    / ((F.col("cr") + 1) / (F.col("R") + 256))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("ratio"),
        )
    )
    scored = (
        fd.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_feats"),
            F.sum(F.col("tf") * F.col("ratio")).alias("w"),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("n_feats").cast("bigint").alias("n_feats"),
            F.round(F.col("w").cast("double"), 6).alias("dsir_weight"),
        )
        .orderBy(F.col("dsir_weight").desc(), "doc_id")
        .limit(100)
    )


CORPUS_DSIR_SQL = """
WITH d AS (
  SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
),
bg AS (
  SELECT doc_id, lang,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1])) AS bg
  FROM d WHERE len(toks) >= 2
),
feats AS (
  SELECT doc_id, lang,
         16 * (strpos('0123456789abcdef', substr(md5(bg), 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(md5(bg), 2, 1)) - 1) AS bucket
  FROM bg
),
fd AS (
  SELECT doc_id, lang, bucket, COUNT(*) AS tf FROM feats GROUP BY 1, 2, 3
),
raw_m AS (SELECT bucket, SUM(tf) AS cr FROM fd GROUP BY 1),
tgt_m AS (SELECT bucket, SUM(tf) AS ct FROM fd WHERE lang = 'en' GROUP BY 1),
tot AS (
  SELECT (SELECT SUM(cr) FROM raw_m) AS R, (SELECT SUM(ct) FROM tgt_m) AS T
),
model AS (
  SELECT raw_m.bucket,
         CAST(ROUND(LN(((COALESCE(tgt_m.ct, 0) + 1) / (tot.T + 256.0))
                       / ((raw_m.cr + 1) / (tot.R + 256.0))), 6)
              AS DECIMAL(18,6)) AS ratio
  FROM raw_m LEFT JOIN tgt_m USING (bucket) CROSS JOIN tot
),
scored AS (
  SELECT fd.doc_id, SUM(fd.tf) AS n_feats, SUM(fd.tf * model.ratio) AS w
  FROM fd JOIN model USING (bucket) GROUP BY 1
)
SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
       ROUND(CAST(w AS DOUBLE), 6) AS dsir_weight
FROM scored
ORDER BY dsir_weight DESC, doc_id
LIMIT 100
"""


QUERIES = {
    "corpus_dsir_select": corpus_dsir_select,
    "corpus_shuffle_shard": corpus_shuffle_shard,
    "corpus_train_val_split": corpus_train_val_split,
    "corpus_stats": corpus_stats,
    "corpus_contamination": corpus_contamination,
    "doc_packing": doc_packing,
    "corpus_mix_sampling": corpus_mix_sampling,
    "corpus_sample_systematic": corpus_sample_systematic,
    "doc_chunking": doc_chunking,
    "corpus_filter_pipeline": corpus_filter_pipeline,
    "corpus_token_budget_select": corpus_token_budget_select,
}

ORACLE = {
    "corpus_dsir_select": CORPUS_DSIR_SQL,
    "corpus_shuffle_shard": CORPUS_SHUFFLE_SHARD_SQL,
    "corpus_train_val_split": CORPUS_SPLIT_SQL,
    "corpus_stats": CORPUS_STATS_SQL,
    "corpus_contamination": CORPUS_CONTAMINATION_SQL,
    "doc_packing": DOC_PACKING_SQL,
    "corpus_mix_sampling": CORPUS_MIX_SQL,
    "corpus_sample_systematic": CORPUS_SAMPLE_SQL,
    "doc_chunking": DOC_CHUNKING_SQL,
    "corpus_filter_pipeline": CORPUS_FILTER_SQL,
    "corpus_token_budget_select": CORPUS_TOKEN_BUDGET_SQL,
}


def corpus_source_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-shift audit: KL divergence of each source's language
    mix from the corpus-wide mix, KL(source‖corpus) = Σ p·ln(p/q) —
    the per-source drift score a mixing pipeline watches when a crawl
    slice changes character.

    Exactness: p and q are ratios of integer counts; each term is
    rounded at 6dp and DECIMAL-summed (the entropy/logprob
    discipline). q > 0 wherever p > 0 by construction (the source's
    languages are a subset of the corpus's).

    Scale: ONE (source, lang) agg collapses the corpus; marginals
    re-aggregate those cells; everything after is |sources|×|langs|
    rows with broadcast-sized joins."""
    d = load_table(spark, sf_dir, "documents")
    # |sources|x|langs| cell table feeds FOUR branches: checkpoint so
    # the corpus collapses once (plan audit: 4 documents scans)
    cells = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    src_tot = cells.groupBy("source").agg(F.sum("c").alias("ns"))
    lang_tot = cells.groupBy("lang").agg(F.sum("c").alias("nl"))
    grand = cells.agg(F.sum("c").alias("N"))
    terms = (
        cells.join(src_tot, "source")
        .join(F.broadcast(lang_tot), "lang")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            F.round(
                (F.col("c") / F.col("ns"))
                * F.log((F.col("c") / F.col("ns")) / (F.col("nl") / F.col("N"))),
                6,
            )
            .cast("decimal(18,6)")
            .alias("kl_term"),
        )
    )
    return (
        terms.groupBy("source")
        .agg(F.round(F.sum("kl_term").cast("double"), 6).alias("kl_divergence"))
        .orderBy("source")
    )


CORPUS_SOURCE_KL_SQL = """
WITH cells AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
),
src_tot AS (SELECT source, SUM(c) AS ns FROM cells GROUP BY 1),
lang_tot AS (SELECT lang, SUM(c) AS nl FROM cells GROUP BY 1),
grand AS (SELECT SUM(c) AS N FROM cells),
terms AS (
  SELECT cells.source,
         CAST(ROUND((cells.c / CAST(s.ns AS DOUBLE))
                    * LN((cells.c / CAST(s.ns AS DOUBLE))
                         / (l.nl / CAST(g.N AS DOUBLE))), 6)
              AS DECIMAL(18,6)) AS kl_term
  FROM cells
  JOIN src_tot s USING (source)
  JOIN lang_tot l USING (lang)
  CROSS JOIN grand g
)
SELECT source, ROUND(CAST(SUM(kl_term) AS DOUBLE), 6) AS kl_divergence
FROM terms GROUP BY source
ORDER BY source
"""

QUERIES["corpus_source_kl"] = corpus_source_kl
ORACLE["corpus_source_kl"] = CORPUS_SOURCE_KL_SQL


def corpus_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced per-stratum downsampling (the eval-set builder): keep
    the k=10 docs per source with the smallest md5(doc_id) — a
    reproducible, engine-portable uniform draw that equalizes strata
    regardless of their raw sizes. Reports per-source stratum size,
    sampled count, and the exact character budget of the sample.

    Scale design: the hash is computed map-side and the per-stratum
    top-k is a row_number window on ONE source-key shuffle; the
    stratum-size agg reuses the same key. At 100 TB, pre-filtering on
    a hash prefix (h < threshold chosen from stratum counts) would
    cut the window's sort input by orders of magnitude — the top-k
    semantics are unchanged because md5 order is uniform; noted as
    the knob, not needed at test scale.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    picked = d.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= 10)
    samp = picked.groupBy("source").agg(
        F.count(F.lit(1)).alias("sampled_rows"),
        F.sum("n_chars").alias("sampled_chars"),
    )
    tot = d.groupBy("source").agg(F.count(F.lit(1)).alias("stratum_rows"))
    return (
        tot.join(samp, "source")
        .select("source", "stratum_rows", "sampled_rows", "sampled_chars")
        .orderBy("source")
    )


BALANCED_SAMPLE_SQL = """
WITH d AS (
  SELECT doc_id, source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
picked AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
    FROM d
  ) WHERE rn <= 10
),
samp AS (
  SELECT source, COUNT(*) AS sampled_rows,
         CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
  FROM picked GROUP BY 1
),
tot AS (SELECT source, COUNT(*) AS stratum_rows FROM d GROUP BY 1)
SELECT t.source, t.stratum_rows, s.sampled_rows, s.sampled_chars
FROM tot t JOIN samp s ON t.source = s.source
ORDER BY t.source
"""

QUERIES["corpus_balanced_sample"] = corpus_balanced_sample
ORACLE["corpus_balanced_sample"] = BALANCED_SAMPLE_SQL


def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity band filter (Wenzek et al. 2019): score
    every doc with the corpus unigram LM (`text_unigram_logprob`),
    cut the score distribution into terciles, and keep head+middle —
    reported as per-source band counts and the kept character budget,
    i.e. what the filter does to each source's contribution.

    Scale design: scoring is the one-tokenize-pass LM plan; the
    tercile boundaries come from a value→count histogram of the
    6dp-rounded scores (map-side-combined agg, CDF window on
    histogram-sized data, ONE broadcast boundary row) — never a
    global sort or ntile. Band assignment is a map-side expression;
    the doc-meta join is on the doc_id key. Scores are identical in
    both engines (rounded-term DECIMAL sums), so the exact CDF and
    boundaries are engine-portable.
    """
    from bireme_spark.queries.terms import text_unigram_logprob

    scored = text_unigram_logprob(spark, sf_dir).select("doc_id", "avg_nll")
    hist = scored.groupBy("avg_nll").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("avg_nll").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "tot", F.sum("cnt").over(Window.partitionBy())
    )
    cd = F.col("cum").cast("double") / F.col("tot").cast("double")
    third = F.lit(1.0) / F.lit(3.0)
    bounds = cum.agg(
        F.min(F.when(cd >= third, F.col("avg_nll"))).alias("b1"),
        F.min(F.when(cd >= F.lit(2.0) * third, F.col("avg_nll"))).alias("b2"),
    )
    meta = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    band = (
        F.when(F.col("avg_nll") <= F.col("b1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("b2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    labeled = (
        scored.join(meta, "doc_id")
        .join(F.broadcast(bounds))
        .withColumn("band", band)
    )
    return (
        labeled.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count(F.when(F.col("band") == "head", 1)).alias("n_head"),
            F.count(F.when(F.col("band") == "middle", 1)).alias("n_middle"),
            F.count(F.when(F.col("band") == "tail", 1)).alias("n_tail"),
            F.sum(F.when(F.col("band") != "tail", F.col("n_chars"))).alias("kept_chars"),
        )
        .orderBy("source")
    )


PERPLEXITY_FILTER_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
), model AS (
  SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
), total AS (
  SELECT SUM(cnt) AS total_tokens FROM model
), nll AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ROUND(tf.tf * -LN(CAST(model.cnt AS DOUBLE) / total.total_tokens), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tf JOIN model USING (token) CROSS JOIN total
), scored AS (
  SELECT doc_id, ROUND(CAST(SUM(nll) AS DOUBLE) / SUM(tf), 6) AS avg_nll
  FROM nll GROUP BY 1
), hist AS (
  SELECT avg_nll, COUNT(*) AS cnt FROM scored GROUP BY 1
), cum AS (
  SELECT avg_nll,
         CAST(SUM(cnt) OVER (ORDER BY avg_nll) AS DOUBLE)
           / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd
  FROM hist
), bounds AS (
  SELECT MIN(CASE WHEN cd >= CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE) THEN avg_nll END) AS b1,
         MIN(CASE WHEN cd >= 2.0 * (CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE)) THEN avg_nll END) AS b2
  FROM cum
), labeled AS (
  SELECT d.source, d.n_chars,
         CASE WHEN s.avg_nll <= b.b1 THEN 'head'
              WHEN s.avg_nll <= b.b2 THEN 'middle'
              ELSE 'tail' END AS band
  FROM scored s JOIN documents d USING (doc_id) CROSS JOIN bounds b
)
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(CASE WHEN band = 'head' THEN 1 END) AS n_head,
       COUNT(CASE WHEN band = 'middle' THEN 1 END) AS n_middle,
       COUNT(CASE WHEN band = 'tail' THEN 1 END) AS n_tail,
       CAST(SUM(CASE WHEN band <> 'tail' THEN n_chars END) AS BIGINT) AS kept_chars
FROM labeled GROUP BY 1 ORDER BY 1
"""

QUERIES["corpus_perplexity_filter"] = corpus_perplexity_filter
ORACLE["corpus_perplexity_filter"] = PERPLEXITY_FILTER_SQL


def corpus_ccnet_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end CCNet-style cleaning funnel with per-stage survivor
    accounting — the composition query a corpus team actually runs:
    (1) raw → (2) language filter (en) → (3) length rule
    [100, 10000] chars → (4) perplexity head+middle band (tercile cut
    of the corpus-LM score over stage-3 survivors) → (5) exact dedup
    on md5(text). Every stage reports docs + char budget, so nothing
    is dropped silently.

    Scale design: composes already-audited pieces — the one-tokenize
    LM scorer, the histogram-CDF tercile cut (broadcast boundary
    row), hash-groupBy dedup (identical text ⇒ identical n_chars, so
    the canonical char count needs no second join). Five one-row
    aggregates union driver-free; the raw corpus is scanned once per
    stage family, not once per stage.
    """
    from bireme_spark.queries.terms import text_unigram_logprob

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    )
    s2 = d.where(F.col("lang") == "en")
    s3 = s2.where(F.col("n_chars").between(100, 10000))
    scored = text_unigram_logprob(spark, sf_dir).select("doc_id", "avg_nll")
    # slim checkpoint of the stage-3 survivors (id, chars, md5, score
    # — text itself stays OUT so the materialization is metadata-thin)
    # collapses the LM-scorer lineage the tercile/band/dedup branches
    # were each re-running: the plan audit counted 19 documents scans;
    # A/B at sf0.1 1.57 vs 2.01s, equal values
    sc3 = (
        s3.select("doc_id", "n_chars", F.md5("text").alias("__h"))
        .join(scored, "doc_id")
        .localCheckpoint(eager=True)
    )
    hist = sc3.groupBy("avg_nll").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("avg_nll").rowsBetween(Window.unboundedPreceding, 0)
    cd = (
        F.sum("cnt").over(w).cast("double")
        / F.sum("cnt").over(Window.partitionBy()).cast("double")
    )
    b2 = hist.select("avg_nll", cd.alias("cd")).agg(
        F.min(
            F.when(F.col("cd") >= F.lit(2.0) * (F.lit(1.0) / F.lit(3.0)), F.col("avg_nll"))
        ).alias("b2")
    )
    s4 = sc3.join(F.broadcast(b2)).where(F.col("avg_nll") <= F.col("b2"))
    s5 = s4.groupBy("__h").agg(F.min("n_chars").alias("n_chars"))

    def stage(df, idx, name, chars_col="n_chars"):
        return df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(chars_col).alias("total_chars"),
        ).select(
            F.lit(idx).alias("stage"), F.lit(name).alias("stage_name"),
            "n_docs", "total_chars",
        )

    out = (
        stage(d, 1, "raw")
        .unionAll(stage(s2, 2, "lang_en"))
        .unionAll(stage(s3, 3, "length_rule"))
        .unionAll(stage(s4, 4, "perplexity_band"))
        .unionAll(stage(s5, 5, "exact_dedup"))
    )
    return out.orderBy("stage")


CCNET_FUNNEL_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
), model AS (
  SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
), total AS (SELECT SUM(cnt) AS total_tokens FROM model),
nll AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ROUND(tf.tf * -LN(CAST(model.cnt AS DOUBLE) / total.total_tokens), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tf JOIN model USING (token) CROSS JOIN total
),
scored AS (
  SELECT doc_id, ROUND(CAST(SUM(nll) AS DOUBLE) / SUM(tf), 6) AS avg_nll
  FROM nll GROUP BY 1
),
s2 AS (SELECT * FROM documents WHERE lang = 'en'),
s3 AS (SELECT * FROM s2 WHERE n_chars BETWEEN 100 AND 10000),
sc3 AS (SELECT s3.*, s.avg_nll FROM s3 JOIN scored s USING (doc_id)),
hist AS (SELECT avg_nll, COUNT(*) AS cnt FROM sc3 GROUP BY 1),
cum AS (
  SELECT avg_nll,
         CAST(SUM(cnt) OVER (ORDER BY avg_nll) AS DOUBLE)
           / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd
  FROM hist
),
b AS (
  SELECT MIN(CASE WHEN cd >= 2.0 * (CAST(1 AS DOUBLE) / CAST(3 AS DOUBLE))
                  THEN avg_nll END) AS b2 FROM cum
),
s4 AS (SELECT sc3.* FROM sc3 CROSS JOIN b WHERE sc3.avg_nll <= b.b2),
s5 AS (SELECT md5(text) AS h, MIN(n_chars) AS n_chars FROM s4 GROUP BY 1)
SELECT stage, stage_name, n_docs, total_chars FROM (
  SELECT 1 AS stage, 'raw' AS stage_name, COUNT(*) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM documents
  UNION ALL
  SELECT 2, 'lang_en', COUNT(*), CAST(SUM(n_chars) AS BIGINT) FROM s2
  UNION ALL
  SELECT 3, 'length_rule', COUNT(*), CAST(SUM(n_chars) AS BIGINT) FROM s3
  UNION ALL
  SELECT 4, 'perplexity_band', COUNT(*), CAST(SUM(n_chars) AS BIGINT) FROM s4
  UNION ALL
  SELECT 5, 'exact_dedup', COUNT(*), CAST(SUM(n_chars) AS BIGINT) FROM s5
) ORDER BY stage
"""

QUERIES["corpus_ccnet_funnel"] = corpus_ccnet_funnel
ORACLE["corpus_ccnet_funnel"] = CCNET_FUNNEL_SQL


_BLOOM_BITS = 65536  # m = 2^16
_BLOOM_SALTS = ("b0:", "b1:", "b2:")  # k = 3 hash functions


def _bloom_pos(salt: str, col):
    """16-bit Bloom position: md5_number_lower-parity 64-bit hash of
    (salt ‖ shingle) mod 2^16 — bit-identical in Spark and DuckDB
    (the checksum operator's cross-engine trick)."""
    from bireme_spark.operators.checksum import row_hash64

    return (row_hash64(F.concat(F.lit(salt), col)) % _BLOOM_BITS).cast("int")


def corpus_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter contamination PREFILTER — the scale pattern when
    even the broadcast benchmark shingle set is too big for every
    executor (billions of eval n-grams): compress it to an m-bit
    Bloom bitset (m = 2¹⁶, k = 3 here), flag any training doc with a
    shingle whose k positions are all set, and report the screen's
    quality against the exact join: Bloom guarantees ZERO false
    negatives (every truly contaminated doc is flagged — the property
    that makes a prefilter sound), and the false-positive count is
    the price of the compression.

    Engine parity: positions are md5_number_lower-parity hashes mod
    2¹⁶, so the oracle rebuilds the identical filter as a distinct
    (salt, position) table and probes it with joins — the whole
    screen is value-checked, not rows-only. The Spark plan probes
    with a broadcast of the ≤3·2¹⁶-row position table (at real scale:
    a bitset in a pandas-UDF closure — same semantics, fewer bytes);
    flags aggregate per doc with no extra shuffle beyond the per-doc
    count."""
    from bireme_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    is_bench = (F.col("doc_id") % _BENCH_MOD) == _BENCH_REM
    # one shingle pass, persisted: bitset build, bloom probe and the
    # exact comparison all read it (a first cut with four separate
    # .count() actions recomputed the shingle lineage each time —
    # 9.3s → 4.6s at sf0.1)
    sh = shingles(d, "doc_id", "text", n=_CONTAM_N).persist()
    try:
        bench = sh.where(is_bench).select("shingle").distinct()
        bits = None
        for i, salt in enumerate(_BLOOM_SALTS):
            part = bench.select(
                F.lit(i).alias("hi"), _bloom_pos(salt, F.col("shingle")).alias("pos")
            )
            bits = part if bits is None else bits.unionByName(part)
        bits = bits.distinct()

        train = sh.where(~is_bench)
        # r10 opt: probe the filter on the DISTINCT-shingle histogram
        # (the parts_fuzzy_match house pattern) — the 3 md5 position
        # hashes and the 3 broadcast position joins run per distinct
        # shingle, not per (doc, shingle) row; doc membership joins
        # back once on the (small) flagged-shingle set
        probe = train.select("shingle").distinct()
        for i, salt in enumerate(_BLOOM_SALTS):
            probe = probe.withColumn(f"p{i}", _bloom_pos(salt, F.col("shingle")))
        flagged = probe
        for i in range(len(_BLOOM_SALTS)):
            hit = bits.where(F.col("hi") == i).select(
                F.col("pos").alias(f"p{i}"), F.lit(1).alias(f"h{i}")
            )
            flagged = flagged.join(F.broadcast(hit), f"p{i}", "left")
        all_hit = None
        for i in range(len(_BLOOM_SALTS)):
            c = F.col(f"h{i}").isNotNull()
            all_hit = c if all_hit is None else (all_hit & c)
        bloom_sh = flagged.where(all_hit).select("shingle")
        bloom_docs = (
            train.join(bloom_sh, "shingle")  # size-based broadcast via AQE
            .select("doc_id")
            .distinct()
            .withColumn("bloom", F.lit(1))
        )
        exact_docs = (
            train.join(F.broadcast(bench), "shingle")
            .select("doc_id")
            .distinct()
            .withColumn("exact", F.lit(1))
        )
        # ONE action: every count from a single per-doc flag frame
        summary = (
            train.select("doc_id")
            .distinct()
            .join(bloom_docs, "doc_id", "left")
            .join(exact_docs, "doc_id", "left")
            .agg(
                F.count(F.lit(1)).alias("n_train_docs"),
                F.sum(F.coalesce(F.col("bloom"), F.lit(0))).alias("n_bloom"),
                F.sum(F.coalesce(F.col("exact"), F.lit(0))).alias("n_exact"),
                F.sum(
                    F.when(
                        F.col("exact").isNotNull() & F.col("bloom").isNull(), 1
                    ).otherwise(0)
                ).alias("n_missed"),
            )
            .select(
                F.col("n_train_docs").cast("bigint"),
                F.col("n_bloom").cast("bigint").alias("n_bloom_flagged"),
                F.col("n_exact").cast("bigint").alias("n_exact_contaminated"),
                (F.col("n_bloom") - F.col("n_exact")).cast("bigint").alias(
                    "n_false_positive"
                ),
                F.col("n_missed").cast("bigint").alias("n_false_negative"),
            )
        )
        return summary.localCheckpoint(eager=True)
    finally:
        sh.unpersist()


CORPUS_BLOOM_SQL = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         array_to_string(ws[i:i+{_CONTAM_N - 1}], ' ') AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - {_CONTAM_N - 1}, 0))) AS i) t
),
bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {_BENCH_MOD} = {_BENCH_REM}
),
bits AS (
  SELECT DISTINCT hi, pos FROM (
    SELECT 0 AS hi, CAST(md5_number_lower('b0:' || s) % {_BLOOM_BITS} AS INTEGER) AS pos FROM bench
    UNION ALL
    SELECT 1, CAST(md5_number_lower('b1:' || s) % {_BLOOM_BITS} AS INTEGER) FROM bench
    UNION ALL
    SELECT 2, CAST(md5_number_lower('b2:' || s) % {_BLOOM_BITS} AS INTEGER) FROM bench
  )
),
train AS (SELECT doc_id, s FROM sh WHERE doc_id % {_BENCH_MOD} <> {_BENCH_REM}),
bloom_docs AS (
  SELECT DISTINCT doc_id FROM train
  WHERE CAST(md5_number_lower('b0:' || s) % {_BLOOM_BITS} AS INTEGER)
          IN (SELECT pos FROM bits WHERE hi = 0)
    AND CAST(md5_number_lower('b1:' || s) % {_BLOOM_BITS} AS INTEGER)
          IN (SELECT pos FROM bits WHERE hi = 1)
    AND CAST(md5_number_lower('b2:' || s) % {_BLOOM_BITS} AS INTEGER)
          IN (SELECT pos FROM bits WHERE hi = 2)
),
exact_docs AS (
  SELECT DISTINCT t.doc_id FROM train t JOIN bench b ON t.s = b.s
)
SELECT (SELECT COUNT(DISTINCT doc_id) FROM train) AS n_train_docs,
       (SELECT COUNT(*) FROM bloom_docs) AS n_bloom_flagged,
       (SELECT COUNT(*) FROM exact_docs) AS n_exact_contaminated,
       (SELECT COUNT(*) FROM bloom_docs) - (SELECT COUNT(*) FROM exact_docs)
         AS n_false_positive,
       (SELECT COUNT(*) FROM exact_docs e
        WHERE e.doc_id NOT IN (SELECT doc_id FROM bloom_docs)) AS n_false_negative
FROM (SELECT 1)
"""

QUERIES["corpus_bloom_prefilter"] = corpus_bloom_prefilter
ORACLE["corpus_bloom_prefilter"] = CORPUS_BLOOM_SQL


def corpus_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum scheduling for pretraining (Bengio et al. 2009
    curriculum learning, as data teams apply it): assign every
    document a phase by length tercile (short→long = easy→hard
    proxy) crossed with an English/non-English track, and emit each
    phase's doc count and token/char budgets — the schedule table a
    training launcher consumes to order data loading.

    Engine-exact: terciles use the histogram-CDF house pattern on
    the INTEGER n_chars value histogram (never a global ntile sort):
    bucket(v) = ((cdf≤(v) − 1)·3) DIV total + 1, all integer, so
    same-valued docs land in the same phase on both engines; budgets
    are integer sums.

    Scale: one value-histogram agg (histogram-sized CDF window,
    broadcast back), one tokenize for budgets, one 6-row rollup —
    no raw-row sort at any scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.filter(F.split("text", " "), lambda w: w != "")).alias("tokens"),
    )
    hist = d.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    buckets = hist.select(
        "n_chars",
        F.expr(
            "((sum(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - 1) * 3)"
            " DIV (sum(c) OVER ()) + 1"
        ).alias("phase"),
    )
    j = d.join(F.broadcast(buckets), "n_chars")
    return (
        j.groupBy(
            "phase",
            F.when(F.col("lang") == "en", "en").otherwise("other").alias("track"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("token_budget"),
            F.sum("n_chars").alias("char_budget"),
        )
        .orderBy("phase", "track")
    )


CORPUS_CURRICULUM_SQL = """
WITH d AS (
  SELECT doc_id, lang, n_chars,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS tokens
  FROM documents
),
hist AS (SELECT n_chars, COUNT(*) AS c FROM d GROUP BY 1),
buckets AS (
  SELECT n_chars,
         ((SUM(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - 1) * 3)
           // (SUM(c) OVER ()) + 1 AS phase
  FROM hist
)
SELECT CAST(b.phase AS BIGINT) AS phase,
       CASE WHEN d.lang = 'en' THEN 'en' ELSE 'other' END AS track,
       COUNT(*) AS n_docs,
       CAST(SUM(d.tokens) AS BIGINT) AS token_budget,
       CAST(SUM(d.n_chars) AS BIGINT) AS char_budget
FROM d JOIN buckets b ON b.n_chars = d.n_chars
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["corpus_curriculum_schedule"] = corpus_curriculum_schedule
ORACLE["corpus_curriculum_schedule"] = CORPUS_CURRICULUM_SQL


def corpus_mixing_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights (the multilingual/
    multi-source sampling rule from mT5/XLM-R: p_i ∝ c_i^τ, τ=0.7) —
    the table a data loader consumes to up-sample small sources
    without drowning the big ones; reports raw share, τ-share, and
    the boost factor per source, at three temperatures (1.0, 0.7,
    0.5) so the flattening is visible.

    Engine-exact: c^τ = EXP(τ·LN(c)) rounded 6dp per source
    (transcendental discipline); shares are DECIMAL-sum ratios (one
    IEEE division each); boost = τ-share/raw-share, a second
    identical division. The per-τ normalizer is a broadcast scalar.

    Scale: one source-cardinality agg; everything else is
    source-count-sized."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    taus = spark.range(1).select(
        F.explode(
            F.array(F.lit("1.0"), F.lit("0.7"), F.lit("0.5"))
        ).alias("tau")
    )
    pw = counts.crossJoin(F.broadcast(taus)).select(
        "source",
        "c",
        "tau",
        F.expr(
            "CAST(ROUND(EXP(CAST(tau AS DOUBLE) * LN(CAST(c AS DOUBLE))), 6)"
            " AS DECIMAL(28,6))"
        ).alias("p"),
    )
    wsum = Window.partitionBy("tau")
    tot = pw.select(
        "source",
        "c",
        "tau",
        "p",
        F.sum("p").over(wsum).alias("z"),
        F.sum("c").over(wsum).alias("n"),
    )
    share_raw = F.expr("c * 1000000 DIV n")
    share_tau = (F.col("p").cast("double") / F.col("z").cast("double"))
    return tot.select(
        "source",
        F.col("tau").alias("temperature"),
        F.col("c").alias("n_docs"),
        share_raw.alias("raw_share_ppm"),
        share_tau.alias("tau_share"),
        (share_tau * F.col("n").cast("double") / F.col("c").cast("double")).alias(
            "boost"
        ),
    ).orderBy("temperature", "source")


CORPUS_MIXING_SQL = """
WITH counts AS (SELECT source, COUNT(*) AS c FROM documents GROUP BY 1),
pw AS (
  SELECT source, c, tau,
         CAST(ROUND(EXP(CAST(tau AS DOUBLE) * LN(CAST(c AS DOUBLE))), 6)
              AS DECIMAL(28,6)) AS p
  FROM counts, (SELECT UNNEST(['1.0', '0.7', '0.5']) AS tau) t
),
tot AS (
  SELECT source, c, tau, p,
         SUM(p) OVER (PARTITION BY tau) AS z,
         SUM(c) OVER (PARTITION BY tau) AS n
  FROM pw
)
SELECT source, tau AS temperature, c AS n_docs,
       CAST(c * 1000000 // n AS BIGINT) AS raw_share_ppm,
       CAST(p AS DOUBLE) / CAST(z AS DOUBLE) AS tau_share,
       CAST(p AS DOUBLE) / CAST(z AS DOUBLE) * CAST(n AS DOUBLE) / CAST(c AS DOUBLE)
         AS boost
FROM tot ORDER BY temperature, source
"""

QUERIES["corpus_mixing_temperature"] = corpus_mixing_temperature
ORACLE["corpus_mixing_temperature"] = CORPUS_MIXING_SQL


def corpus_span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCK-ALIGNED span-corruption planning (the T5 span-corruption
    objective, Raffel 2020, in its block-aligned form: documents are
    tiled into length-3 token blocks and each block is corrupted
    independently with p = 0.15 — alignment makes the mask plan pure
    relational algebra with NO sequential greedy): per source, span
    count, corrupted-token count (partial tail blocks clamp), total
    tokens, and the achieved corruption rate — the numbers that size
    sentinel vocabulary and encoder/decoder lengths for a T5-style
    pretraining run.

    Engine-exact: block coins are md5-residue draws (engine-portable
    hex, residue < 3 of 20 ≈ 15%); corrupted counts are integer
    clamps against doc length; the rate is truncating integer ppm.

    Scale: one tokenize collapses to BLOCK STARTS map-side (q ≡ 1
    mod 3 — the coin is only evaluated on 1/3 of positions), one doc
    rollup, one source rollup — all map-side-combinable, no Python,
    no windows at all."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", "source", F.posexplode(F.split("text", " ")).alias("p", "w")
        )
        .where(F.col("w") != "")
        .select("doc_id", "source", (F.col("p") + 1).alias("q"))
    )
    wl = Window.partitionBy("doc_id")
    blocks = toks.select(
        "doc_id", "source", "q", F.max("q").over(wl).alias("len")
    ).where((F.col("q") % 3) == 1)
    coin = (
        F.expr(
            "locate(substring(md5(concat('span:', CAST(doc_id AS STRING), ':',"
            " CAST(q AS STRING))), 1, 1), '0123456789abcdef') - 1"
        )
        % 20
        < 3
    ).cast("int")
    spans = blocks.select(
        "doc_id",
        "source",
        "len",
        coin.alias("s"),
        (coin * F.least(F.lit(3), F.col("len") - F.col("q") + 1)).alias("covered"),
    )
    per_doc = spans.groupBy("doc_id", "source").agg(
        F.sum("s").alias("n_spans"),
        F.sum("covered").alias("n_corrupted"),
        F.max("len").alias("n_tokens"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_spans").alias("total_spans"),
            F.sum("n_corrupted").alias("total_corrupted"),
            F.sum("n_tokens").alias("total_tokens"),
            F.expr(
                "SUM(n_corrupted) * 1000000 DIV SUM(n_tokens)"
            ).alias("corruption_ppm"),
        )
        .orderBy("source")
    )


CORPUS_SPAN_CORRUPTION_SQL = """
WITH toks AS (
  SELECT doc_id, source, q
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       UNNEST(range(1, len(ws) + 1)) AS t(q)
  WHERE ws[q] <> ''
),
blocks AS (
  SELECT doc_id, source, q, MAX(q) OVER (PARTITION BY doc_id) AS len
  FROM toks QUALIFY q % 3 = 1
),
spans AS (
  SELECT doc_id, source, len,
         CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(concat('span:', CAST(doc_id AS VARCHAR), ':',
                                             CAST(q AS VARCHAR))), 1, 1)) - 1) % 20 < 3
              THEN 1 ELSE 0 END AS s,
         CASE WHEN (strpos('0123456789abcdef',
                           substr(md5(concat('span:', CAST(doc_id AS VARCHAR), ':',
                                             CAST(q AS VARCHAR))), 1, 1)) - 1) % 20 < 3
              THEN LEAST(3, len - q + 1) ELSE 0 END AS covered
  FROM blocks
),
per_doc AS (
  SELECT doc_id, source, SUM(s) AS n_spans, SUM(covered) AS n_corrupted,
         MAX(len) AS n_tokens
  FROM spans GROUP BY 1, 2
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_spans) AS BIGINT) AS total_spans,
       CAST(SUM(n_corrupted) AS BIGINT) AS total_corrupted,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_corrupted) * 1000000 // SUM(n_tokens) AS BIGINT) AS corruption_ppm
FROM per_doc GROUP BY 1 ORDER BY 1
"""

QUERIES["corpus_span_corruption_plan"] = corpus_span_corruption_plan
ORACLE["corpus_span_corruption_plan"] = CORPUS_SPAN_CORRUPTION_SQL


def corpus_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-triplet mining for embedding training (anchor,
    positive, hard negative): for each sampled anchor doc, the
    positive is the SAME-source doc nearest in length and the hard
    negative the DIFFERENT-source doc nearest in length — "similar
    surface, different provenance" is the classic cheap hard-negative
    heuristic. Pairing is BLOCKED on length-16 buckets (candidates
    from the anchor's bucket ±1, the blocking both engines share) so
    the candidate join never goes quadratic — the same
    blocking-before-pairing discipline as the LSH dedup family.

    Engine-exact: distances are integer |Δn_chars|; nearest breaks
    ties on (diff ASC, doc_id ASC) row_number; anchors with no
    in-block candidate drop on both engines identically.

    Scale: anchors are a deterministic 10% residue sample; the
    blocked join is |anchors|·(block population) — bucket width
    tunes the trade; at 100 TB add a bucket-count cap like the LSH
    max_df guard."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    anchors = d.where(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("aid"),
        F.col("source").alias("asrc"),
        F.col("n_chars").alias("alen"),
        F.expr("n_chars DIV 16").alias("ab"),
    )
    cands = d.select(
        F.col("doc_id").alias("cid"),
        F.col("source").alias("csrc"),
        F.col("n_chars").alias("clen"),
        F.explode(
            F.array(
                F.expr("n_chars DIV 16 - 1"),
                F.expr("n_chars DIV 16"),
                F.expr("n_chars DIV 16 + 1"),
            )
        ).alias("cb"),
    )
    j = anchors.join(cands, (F.col("ab") == F.col("cb")) & (F.col("aid") != F.col("cid")))
    scored = j.select(
        "aid", "asrc", "alen", "cid", "csrc",
        F.abs(F.col("alen") - F.col("clen")).alias("diff"),
    )
    wpos = Window.partitionBy("aid").orderBy(F.col("diff").asc(), F.col("cid").asc())
    pos = (
        scored.where(F.col("asrc") == F.col("csrc"))
        .withColumn("rn", F.row_number().over(wpos))
        .where(F.col("rn") == 1)
        .select("aid", F.col("cid").alias("pos_id"), F.col("diff").alias("pos_diff"))
    )
    neg = (
        scored.where(F.col("asrc") != F.col("csrc"))
        .withColumn("rn", F.row_number().over(wpos))
        .where(F.col("rn") == 1)
        .select("aid", F.col("cid").alias("neg_id"), F.col("diff").alias("neg_diff"))
    )
    return (
        anchors.select("aid", "asrc", "alen")
        .join(pos, "aid")
        .join(neg, "aid")
        .select(
            F.col("aid").alias("anchor_id"),
            F.col("asrc").alias("source"),
            F.col("alen").alias("anchor_len"),
            "pos_id",
            "pos_diff",
            "neg_id",
            "neg_diff",
        )
        .orderBy("anchor_id")
    )


CORPUS_CONTRASTIVE_SQL = """
WITH d AS (SELECT doc_id, source, n_chars FROM documents),
anchors AS (
  SELECT doc_id AS aid, source AS asrc, n_chars AS alen,
         n_chars // 16 AS ab
  FROM d WHERE doc_id % 10 = 0
),
cands AS (
  SELECT doc_id AS cid, source AS csrc, n_chars AS clen,
         UNNEST([n_chars // 16 - 1, n_chars // 16, n_chars // 16 + 1]) AS cb
  FROM d
),
j AS (
  SELECT a.aid, a.asrc, a.alen, c.cid, c.csrc,
         ABS(a.alen - c.clen) AS diff
  FROM anchors a JOIN cands c ON a.ab = c.cb AND a.aid <> c.cid
),
pos AS (
  SELECT aid, cid AS pos_id, diff AS pos_diff FROM (
    SELECT aid, cid, diff,
           ROW_NUMBER() OVER (PARTITION BY aid ORDER BY diff ASC, cid ASC) AS rn
    FROM j WHERE asrc = csrc
  ) q WHERE rn = 1
),
neg AS (
  SELECT aid, cid AS neg_id, diff AS neg_diff FROM (
    SELECT aid, cid, diff,
           ROW_NUMBER() OVER (PARTITION BY aid ORDER BY diff ASC, cid ASC) AS rn
    FROM j WHERE asrc <> csrc
  ) q WHERE rn = 1
)
SELECT a.aid AS anchor_id, a.asrc AS source, a.alen AS anchor_len,
       pos.pos_id, CAST(pos.pos_diff AS BIGINT) AS pos_diff,
       neg.neg_id, CAST(neg.neg_diff AS BIGINT) AS neg_diff
FROM anchors a JOIN pos ON pos.aid = a.aid JOIN neg ON neg.aid = a.aid
ORDER BY anchor_id
"""

QUERIES["corpus_contrastive_pairs"] = corpus_contrastive_pairs
ORACLE["corpus_contrastive_pairs"] = CORPUS_CONTRASTIVE_SQL


def corpus_soft_dedup_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup (duplicate-aware sampling weights — the SlimPajama/
    DataComp alternative to hard removal): instead of dropping
    near-duplicates, each doc is down-weighted by 1/|cluster| so a
    page mirrored N times contributes one page's worth of training
    mass. Clusters come from an 8-word prefix fingerprint over the
    corpus with PLANTED mutated copies (every 4th doc re-ingested
    with an appended tail, every 12th twice — members differ in
    length, so weighting is not just dedup-and-count). Per source:
    docs, clusters, raw token mass, effective (weighted) token mass,
    and the redundancy share that soft-dedup reclaims.

    Scale design: fingerprint = ONE map-side md5 of a bounded prefix
    (no shingling, no pair mining); cluster sizes = one groupBy on
    the fingerprint; weights join back fingerprint-partitioned. The
    whole pipeline is two shuffles on hash keys at any corpus size.

    Determinism: effective mass is per-doc exact integer
    ``tokens·1e6 DIV csize`` summed as BIGINT (never a double sum of
    rationals); redundancy is integer ppm."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = d.where(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        "source",
        F.concat("text", F.lit(" planted dup tail alpha beta")).alias("text"),
    )
    planted2 = d.where(F.col("doc_id") % 12 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        "source",
        F.concat("text", F.lit(" second planted tail gamma")).alias("text"),
    )
    corpus = d.unionByName(planted).unionByName(planted2)
    toks = corpus.select(
        "doc_id",
        "source",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))").cast("bigint").alias(
            "n_tokens"
        ),
        F.md5(F.expr("array_join(slice(split(text, ' '), 1, 8), ' ')")).alias("fp"),
    )
    csize = toks.groupBy("fp").agg(F.count(F.lit(1)).cast("bigint").alias("csize"))
    weighted = toks.join(csize, "fp").select(
        "source",
        "n_tokens",
        "csize",
        F.expr("n_tokens * 1000000 DIV csize").alias("eff_e6"),
    )
    return (
        weighted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.countDistinct("csize").cast("bigint").alias("n_cluster_sizes"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("eff_e6").cast("bigint").alias("effective_tokens_e6"),
        )
        .select(
            "source",
            "n_docs",
            "n_cluster_sizes",
            "n_tokens",
            "effective_tokens_e6",
            F.expr(
                "(n_tokens * 1000000 - effective_tokens_e6) DIV n_tokens"
            ).alias("redundancy_ppm"),
        )
        .orderBy("source")
    )


SOFT_DEDUP_SQL = """
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, source, text || ' planted dup tail alpha beta'
  FROM documents WHERE doc_id % 4 = 0
  UNION ALL
  SELECT doc_id + 2000000, source, text || ' second planted tail gamma'
  FROM documents WHERE doc_id % 12 = 0
),
toks AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT)
           AS n_tokens,
         md5(array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')) AS fp
  FROM corpus
),
csize AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS csize FROM toks GROUP BY 1
),
weighted AS (
  SELECT source, n_tokens, csize, n_tokens * 1000000 // csize AS eff_e6
  FROM toks JOIN csize USING (fp)
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT csize) AS BIGINT) AS n_cluster_sizes,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(eff_e6) AS BIGINT) AS effective_tokens_e6,
       CAST((SUM(n_tokens) * 1000000 - SUM(eff_e6)) // SUM(n_tokens) AS BIGINT)
         AS redundancy_ppm
FROM weighted
GROUP BY source
ORDER BY source
"""

QUERIES["corpus_soft_dedup_weight"] = corpus_soft_dedup_weight
ORACLE["corpus_soft_dedup_weight"] = SOFT_DEDUP_SQL


# ---------------------------------------------------------------------------
# corpus_validation_leakage — n-gram leakage across the train/val split
# ---------------------------------------------------------------------------

_LEAK_N = 5  # shingle width: long enough that overlap means leakage


def corpus_validation_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split leakage audit: which validation documents share
    5-gram shingles with the TRAIN split (doc_id % 10 rule of
    ``corpus_train_val_split``) — the check that the held-out loss
    actually measures generalization, run per source so a leaky
    upstream is attributable (the split-level complement of
    ``corpus_contamination``'s benchmark screen).

    Scale: shingling is the map-side array pass of
    ``operators/dedup.shingles``; the probe is a shingle-keyed
    semi-join (shuffle co-partitioned on the shingle hash, never a
    broadcast of the 80% train side); the rollup is |sources| rows.
    With a standing corpus the train shingle set is exactly the
    incremental-probe index of ``dedup_incremental_probe``."""
    from bireme_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    # split BEFORE shingling: the two scans read DISJOINT row sets
    # (one logical pass over the corpus), instead of shingling once
    # and filtering the exploded stream twice
    train_sh = (
        shingles(d.where((F.col("doc_id") % 10) <= 7), "doc_id", "text", n=_LEAK_N)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    val_sh = shingles(d.where((F.col("doc_id") % 10) == 8), "doc_id", "text", n=_LEAK_N)
    # ONE pass over the val shingles: left join the train set and
    # count totals + hits in the same aggregation
    per_doc = (
        val_sh.join(train_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_leaked"),
        )
    )
    src = d.select("doc_id", "source")
    return (
        per_doc.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_val_docs"),
            F.sum((F.col("n_leaked") > 0).cast("int")).cast("bigint").alias(
                "n_leaky_docs"
            ),
            F.sum("n_sh").cast("bigint").alias("val_shingles"),
            F.sum("n_leaked").cast("bigint").alias("leaked_shingles"),
            F.expr(
                "CAST(SUM(n_leaked) * 1000000 DIV SUM(n_sh) AS BIGINT)"
            ).alias("leak_ppm"),
        )
        .orderBy("source")
    )


CORPUS_VALIDATION_LEAKAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           generate_series(1, greatest(len(w) - {_LEAK_N - 1}, 0)),
           i -> array_to_string(w[i:i+{_LEAK_N - 1}], ' ')))) AS shingle
  FROM toks
), train AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % 10 <= 7
), val AS (
  SELECT * FROM sh WHERE doc_id % 10 = 8
), tot AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM val GROUP BY doc_id
), hit AS (
  SELECT v.doc_id, COUNT(*) AS n_leaked
  FROM val v JOIN train t USING (shingle)
  GROUP BY v.doc_id
), per_doc AS (
  SELECT t.doc_id, t.n_sh, COALESCE(h.n_leaked, 0) AS n_leaked
  FROM tot t LEFT JOIN hit h USING (doc_id)
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_val_docs,
       CAST(SUM(CASE WHEN p.n_leaked > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_docs,
       CAST(SUM(p.n_sh) AS BIGINT) AS val_shingles,
       CAST(SUM(p.n_leaked) AS BIGINT) AS leaked_shingles,
       CAST(SUM(p.n_leaked) * 1000000 // SUM(p.n_sh) AS BIGINT) AS leak_ppm
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.source ORDER BY d.source
"""

QUERIES["corpus_validation_leakage"] = corpus_validation_leakage
ORACLE["corpus_validation_leakage"] = CORPUS_VALIDATION_LEAKAGE_SQL


def corpus_mix_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-min-fair token allocation across corpus sources under a
    global training budget (waterfilling) — the mix planner that caps
    every oversized domain at a common water level λ while letting
    small domains keep everything they have: allocate min(cap_i, λ)
    with λ chosen so the total hits the budget (B = half the corpus
    here). The standard alternative to temperature mixing
    (corpus_mixing_temperature) when the requirement is "no source
    may dominate, small sources are never scaled down".

    CLOSED-FORM, not iterative: with caps sorted ascending, source r
    is saturated iff c_r·(n−r) + prefix_r ≤ B (the condition is
    monotone in r — proof in source), so one cumulative window
    computes the saturated set, λ = (B − Σ_sat caps) DIV n_unsat,
    and the allocation in a second projection. Pure integer; the
    only rows past the per-source agg are |sources|.

    Scale: one corpus scan to (source, token-count) grain; the
    waterfill itself runs on the |sources|-row table."""
    d = load_table(spark, sf_dir, "documents")
    caps = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("cap_tokens")
    )
    wsort = Window.orderBy("cap_tokens", "source").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = (
        caps.withColumn("prefix", F.sum("cap_tokens").over(wsort).cast("bigint"))
        .withColumn("r", F.row_number().over(Window.orderBy("cap_tokens", "source")))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("total", F.max("prefix").over(wall))
        .withColumn("budget", F.expr("total DIV 2"))
        .withColumn(
            "saturated",
            F.expr("cap_tokens * (n - r) + prefix <= budget"),
        )
    )
    lvl = (
        ranked.withColumn(
            "n_sat", F.sum(F.when(F.col("saturated"), 1).otherwise(0)).over(wall)
        )
        .withColumn(
            "p_sat",
            F.sum(F.when(F.col("saturated"), F.col("cap_tokens")).otherwise(0)).over(
                wall
            ),
        )
        .withColumn(
            "water_level",
            F.expr("CAST((budget - p_sat) DIV GREATEST(n - n_sat, 1) AS BIGINT)"),
        )
    )
    return lvl.select(
        "source",
        "cap_tokens",
        F.expr(
            "CAST(CASE WHEN saturated THEN cap_tokens ELSE water_level END AS BIGINT)"
        ).alias("allocated_tokens"),
        F.col("saturated"),
        F.col("water_level"),
        F.col("budget").cast("bigint").alias("budget_tokens"),
    ).orderBy("source")


CORPUS_WATERFILL_SQL = """
WITH caps AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS cap_tokens
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, cap_tokens,
         SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix,
         ROW_NUMBER() OVER (ORDER BY cap_tokens, source) AS r,
         COUNT(*) OVER () AS n,
         SUM(cap_tokens) OVER () AS total
  FROM caps
),
flagged AS (
  SELECT *, total // 2 AS budget,
         cap_tokens * (n - r) + prefix <= total // 2 AS saturated
  FROM ranked
),
lvl AS (
  SELECT *,
         SUM(CASE WHEN saturated THEN 1 ELSE 0 END) OVER () AS n_sat,
         SUM(CASE WHEN saturated THEN cap_tokens ELSE 0 END) OVER () AS p_sat
  FROM flagged
)
SELECT source, cap_tokens,
       CAST(CASE WHEN saturated THEN cap_tokens
                 ELSE (budget - p_sat) // GREATEST(n - n_sat, 1) END AS BIGINT)
         AS allocated_tokens,
       saturated,
       CAST((budget - p_sat) // GREATEST(n - n_sat, 1) AS BIGINT) AS water_level,
       CAST(budget AS BIGINT) AS budget_tokens
FROM lvl
ORDER BY source
"""

QUERIES["corpus_mix_waterfill"] = corpus_mix_waterfill
ORACLE["corpus_mix_waterfill"] = CORPUS_WATERFILL_SQL


# ---------------------------------------------------------------------------
# corpus_rejection_sampling — distribution matching by rejection (round 10)
# ---------------------------------------------------------------------------


def corpus_rejection_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rejection sampling that reshapes the candidate pool's LENGTH
    distribution to match a reference source ('src0') — the
    distribution-matching primitive between DSIR (importance
    weighting toward a target LM) and balanced_sample (per-class
    caps): accept candidate docs with probability min(1, t(b)/s(b))
    per length bucket b = n_chars DIV 100, so the surviving corpus
    has the reference's length profile without ever reweighting
    (e.g. matching a web crawl to wikipedia's document-length shape
    before mixing).

    Engine-exact: bucket shares are integer counts; the acceptance
    probability is the integer cross-product LEAST(t_cnt·s_total,
    s_cnt·t_total) and the coin is the first 5 md5 nibbles of the
    doc id (20 bits) — accept iff coin·(s_cnt·t_total) <
    1048576·(t_cnt·s_total)-capped — no float anywhere; the coin
    depends only on doc_id, so the decision is reproducible at any
    partitioning.

    Scale: two count aggs (|buckets| cells) broadcast back over one
    corpus scan; emitted per-bucket audit is bucket-sized."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.expr("CAST(n_chars DIV 100 AS INT)").alias("b")
    )
    tgt = d.where(F.col("source") == "src0").groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("t_cnt")
    )
    cand = d.where(F.col("source") != "src0")
    src = cand.groupBy("b").agg(F.count(F.lit(1)).cast("bigint").alias("s_cnt"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rates = (
        src.join(tgt, "b", "left")
        .select(
            "b",
            "s_cnt",
            F.coalesce("t_cnt", F.lit(0)).cast("bigint").alias("t_cnt"),
            F.sum("s_cnt").over(wall).cast("bigint").alias("s_tot"),
            F.sum(F.coalesce("t_cnt", F.lit(0))).over(wall).cast("bigint").alias("t_tot"),
        )
    )
    coin = (
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 5), 16, 10) AS BIGINT)"
    )
    accepted = (
        cand.join(F.broadcast(rates), "b")
        .where(
            F.expr(
                f"{coin} * (s_cnt * t_tot)"
                f" < 1048576 * LEAST(t_cnt * s_tot, s_cnt * t_tot)"
            )
        )
        .groupBy("b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("kept"))
    )
    return (
        rates.join(accepted, "b", "left")
        .select(
            "b",
            "s_cnt",
            "t_cnt",
            F.coalesce("kept", F.lit(0)).cast("bigint").alias("kept"),
            F.expr("CAST(t_cnt * 1000000 DIV GREATEST(t_tot, 1) AS BIGINT)").alias(
                "target_share_ppm"
            ),
            F.expr(
                "CAST(COALESCE(kept, 0) * 1000000"
                " DIV GREATEST(SUM(COALESCE(kept, 0)) OVER (), 1) AS BIGINT)"
            ).alias("kept_share_ppm"),
        )
        .orderBy("b")
    )


CORPUS_REJECTION_SQL = """
WITH d AS (
  SELECT doc_id, source, CAST(n_chars // 100 AS INTEGER) AS b FROM documents
),
tgt AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS t_cnt FROM d WHERE source = 'src0' GROUP BY 1
),
src AS (
  SELECT b, CAST(COUNT(*) AS BIGINT) AS s_cnt FROM d WHERE source <> 'src0' GROUP BY 1
),
rates AS (
  SELECT s.b, s.s_cnt, CAST(COALESCE(t.t_cnt, 0) AS BIGINT) AS t_cnt,
         CAST(SUM(s.s_cnt) OVER () AS BIGINT) AS s_tot,
         CAST(SUM(COALESCE(t.t_cnt, 0)) OVER () AS BIGINT) AS t_tot
  FROM src s LEFT JOIN tgt t ON t.b = s.b
),
accepted AS (
  SELECT d.b, CAST(COUNT(*) AS BIGINT) AS kept
  FROM d JOIN rates r ON r.b = d.b
  WHERE d.source <> 'src0'
    AND (16 * 16 * 16 * 16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
       + 16 * 16 * 16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)
       + 16 * 16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1)
       + 16 * (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)
       + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) - 1))
        * (r.s_cnt * r.t_tot)
      < 1048576 * LEAST(r.t_cnt * r.s_tot, r.s_cnt * r.t_tot)
  GROUP BY 1
)
SELECT r.b, r.s_cnt, r.t_cnt,
       CAST(COALESCE(a.kept, 0) AS BIGINT) AS kept,
       CAST(r.t_cnt * 1000000 // GREATEST(r.t_tot, 1) AS BIGINT) AS target_share_ppm,
       CAST(COALESCE(a.kept, 0) * 1000000
            // GREATEST(SUM(COALESCE(a.kept, 0)) OVER (), 1) AS BIGINT) AS kept_share_ppm
FROM rates r LEFT JOIN accepted a ON a.b = r.b
ORDER BY r.b
"""

QUERIES["corpus_rejection_sampling"] = corpus_rejection_sampling
ORACLE["corpus_rejection_sampling"] = CORPUS_REJECTION_SQL


# ---------------------------------------------------------------------------
# corpus_context_length_budget — context-window utilization planning
# (round 10)
# ---------------------------------------------------------------------------


def corpus_context_length_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window budget planning — the table a pretraining run
    reads before fixing max_seq_len: for candidate windows W, what
    share of documents fits whole, what share of tokens survives
    truncation at one-doc-per-sequence, how much of each sequence is
    padding, and how many sequences packing-free training would
    consume (Σ ceil(len/W)). Candidate windows are SELF-CALIBRATED
    in-plan to the corpus (p50, 2·p50, 4·p50 of whitespace-token
    lengths via the histogram-CDF house pattern) — fixed windows
    calibrated at one SF would degenerate at another (r9 0-row
    lesson; here the length distribution is SF-invariant so the
    windows are too).

    Engine-exact: pure integer token counts, ppm via DIV, ceil as
    (len + W - 1) DIV W. Scale: one token-count scan, a |distinct
    lengths|-row CDF, a 3-window × corpus broadcast join folded to 3
    rows."""
    from bireme_spark.functions import text as T

    d = load_table(spark, sf_dir, "documents").select(
        T.token_count(F.col("text")).cast("bigint").alias("len")
    )
    hist = d.groupBy("len").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcdf = Window.orderBy("len").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = hist.withColumn("cum", F.sum("c").over(wcdf).cast("bigint")).withColumn(
        "n", F.sum("c").over(wall).cast("bigint")
    )
    p50 = cdf.agg(
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 50, F.col("len"))).alias("p50")
    )
    wins = p50.select(
        F.explode(
            F.array(F.col("p50"), F.col("p50") * 2, F.col("p50") * 4)
        ).alias("window_tokens")
    )
    j = hist.crossJoin(F.broadcast(wins))
    return (
        j.groupBy("window_tokens")
        .agg(
            F.sum("c").cast("bigint").alias("n_docs"),
            F.sum(F.col("len") * F.col("c")).cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("len") <= F.col("window_tokens"), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("docs_fitting"),
            F.sum(F.least(F.col("len"), F.col("window_tokens")) * F.col("c"))
            .cast("bigint")
            .alias("tokens_kept"),
            F.sum(
                F.expr("(len + window_tokens - 1) DIV window_tokens * c")
            )
            .cast("bigint")
            .alias("sequences_needed"),
        )
        .select(
            F.col("window_tokens").cast("bigint").alias("window_tokens"),
            "n_docs",
            "n_tokens",
            F.expr("CAST(docs_fitting * 1000000 DIV n_docs AS BIGINT)").alias(
                "docs_fitting_ppm"
            ),
            F.expr("CAST(tokens_kept * 1000000 DIV n_tokens AS BIGINT)").alias(
                "tokens_kept_ppm"
            ),
            F.expr(
                "CAST((n_docs * window_tokens - tokens_kept) * 1000000"
                " DIV (n_docs * window_tokens) AS BIGINT)"
            ).alias("padding_waste_ppm"),
            "sequences_needed",
        )
        .orderBy("window_tokens")
    )


CONTEXT_BUDGET_SQL = """
WITH lens AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS len FROM documents
),
hist AS (
  SELECT len, CAST(COUNT(*) AS BIGINT) AS c FROM lens GROUP BY 1
),
cdf AS (
  SELECT len, c,
         CAST(SUM(c) OVER (ORDER BY len ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM hist
),
p AS (
  SELECT MIN(CASE WHEN cum * 100 >= n * 50 THEN len END) AS p50 FROM cdf
),
wins AS (
  SELECT p50 * m AS window_tokens FROM p, (VALUES (1), (2), (4)) v(m)
),
agg AS (
  SELECT w.window_tokens,
         CAST(SUM(h.c) AS BIGINT) AS n_docs,
         CAST(SUM(h.len * h.c) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN h.len <= w.window_tokens THEN h.c ELSE 0 END)
              AS BIGINT) AS docs_fitting,
         CAST(SUM(LEAST(h.len, w.window_tokens) * h.c) AS BIGINT) AS tokens_kept,
         CAST(SUM((h.len + w.window_tokens - 1) // w.window_tokens * h.c)
              AS BIGINT) AS sequences_needed
  FROM hist h CROSS JOIN wins w
  GROUP BY 1
)
SELECT CAST(window_tokens AS BIGINT) AS window_tokens,
       n_docs, n_tokens,
       CAST(docs_fitting * 1000000 // n_docs AS BIGINT) AS docs_fitting_ppm,
       CAST(tokens_kept * 1000000 // n_tokens AS BIGINT) AS tokens_kept_ppm,
       CAST((n_docs * window_tokens - tokens_kept) * 1000000
            // (n_docs * window_tokens) AS BIGINT) AS padding_waste_ppm,
       sequences_needed
FROM agg
ORDER BY window_tokens
"""

QUERIES["corpus_context_length_budget"] = corpus_context_length_budget
ORACLE["corpus_context_length_budget"] = CONTEXT_BUDGET_SQL


# ---------------------------------------------------------------------------
# corpus_source_leakage_matrix — cross-source 8-gram leakage provenance
# (round 10)
# ---------------------------------------------------------------------------


def corpus_source_leakage_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-SOURCE 8-gram leakage matrix — the provenance question
    behind corpus_validation_leakage, asked between every pair of
    ingest sources: how many of source A's distinct shingles also
    appear in source B (mirrors, syndication, scraper overlap)? The
    source-granular form of text_crossdoc_spans; pairs whose leak
    share is high get merged or deduped BEFORE mixing weights are
    chosen. Natural signal on this corpus (probed: 76-137 shared
    8-grams per source pair) — no plant needed.

    Engine-exact: distinct (shingle, source) inverted index, one
    equi-join on shingle (fan-out bounded by |sources|² per shingle
    — never all-pairs over docs), integer counts and ppm DIV.

    Scale: the index is one shuffle; the join key is the shingle
    with per-source-distinct rows, so a hot shingle contributes at
    most |sources| rows per side. Zero-leak pairs are emitted (the
    audit must show clean pairs as clean) via the totals cross."""
    from bireme_spark.operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    sh = (
        shingles(d, "doc_id", "text", n=8)
        .join(d.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    totals = sh.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    a = sh.select(F.col("source").alias("src_a"), "shingle")
    b = sh.select(F.col("source").alias("src_b"), "shingle")
    leaked = (
        a.join(b, "shingle")
        .where(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("leaked"))
    )
    grid = (
        totals.select(F.col("source").alias("src_a"), F.col("n_shingles").alias("shingles_a"))
        .crossJoin(F.broadcast(totals.select(F.col("source").alias("src_b"))))
        .where(F.col("src_a") != F.col("src_b"))
    )
    return (
        grid.join(leaked, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            "shingles_a",
            F.coalesce("leaked", F.lit(0)).cast("bigint").alias("leaked"),
            F.expr(
                "CAST(COALESCE(leaked, 0) * 1000000 DIV shingles_a AS BIGINT)"
            ).alias("leak_ppm"),
        )
        .orderBy("src_a", "src_b")
    )


SOURCE_LEAKAGE_SQL = """
WITH w AS (
  SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT source, array_to_string(ws[i:i+7], ' ') AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i) t
),
totals AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_shingles FROM sh GROUP BY 1
),
leaked AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS leaked
  FROM sh a JOIN sh b ON a.s = b.s AND a.source <> b.source
  GROUP BY 1, 2
)
SELECT ta.source AS src_a, tb.source AS src_b,
       ta.n_shingles AS shingles_a,
       CAST(COALESCE(l.leaked, 0) AS BIGINT) AS leaked,
       CAST(COALESCE(l.leaked, 0) * 1000000 // ta.n_shingles AS BIGINT) AS leak_ppm
FROM totals ta
CROSS JOIN totals tb
LEFT JOIN leaked l ON l.src_a = ta.source AND l.src_b = tb.source
WHERE ta.source <> tb.source
ORDER BY 1, 2
"""

QUERIES["corpus_source_leakage_matrix"] = corpus_source_leakage_matrix
ORACLE["corpus_source_leakage_matrix"] = SOURCE_LEAKAGE_SQL


# ---------------------------------------------------------------------------
# corpus_pack_contamination_audit — cross-doc attention contamination of
# packed sequences (round 10)
# ---------------------------------------------------------------------------


def corpus_pack_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention contamination of the doc_packing
    layout: causal attention without document masking lets tokens
    attend across doc boundaries inside a packed sequence; the
    contamination factor 1 − Σ_d seg_d² / L² per pack (share of
    token PAIRS that cross a boundary) is the number that decides
    whether packing needs attention masks or separator re-chunking.
    Reported per source: packs, mean docs per pack, split-doc share,
    and the token-pair contamination ppm.

    Engine-exact: doc→pack segment lengths come from the SAME
    per-source cumulative layout doc_packing emits (min/max clamp of
    the cumsum against pack edges — exact integers); Σseg and Σseg²
    per pack are integer sums; ppm via DIV. The final (ragged) pack
    of each source is included with its true shorter length.

    Scale: the pack explode is bounded by n_packs_spanned (≤
    len/PACK+1 per doc); everything downstream is |packs|-sized."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    lay = t.select(
        "source",
        "doc_id",
        "n",
        (F.sum("n").over(w) - F.col("n")).alias("lo"),
        F.sum("n").over(w).alias("hi"),
    )
    segs = lay.select(
        "source",
        "doc_id",
        F.expr(f"explode(sequence(CAST(lo DIV {_PACK_LEN} AS INT),"
               f" CAST((hi - 1) DIV {_PACK_LEN} AS INT)))").alias("pack"),
        "lo",
        "hi",
    ).select(
        "source",
        "doc_id",
        "pack",
        F.expr(
            f"LEAST(hi, CAST(pack + 1 AS BIGINT) * {_PACK_LEN})"
            f" - GREATEST(lo, CAST(pack AS BIGINT) * {_PACK_LEN})"
        ).alias("seg"),
    )
    packs = segs.groupBy("source", "pack").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_in_pack"),
        F.sum("seg").cast("bigint").alias("l"),
        F.sum(F.expr("CAST(seg AS DECIMAL(38,0)) * seg")).alias("sseg2"),
    )
    return (
        packs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_packs"),
            F.sum("docs_in_pack").cast("bigint").alias("doc_slots"),
            F.sum(F.when(F.col("docs_in_pack") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("shared_packs"),
            F.sum(F.expr("CAST(l AS DECIMAL(38,0)) * l")).alias("sl2"),
            F.sum("sseg2").alias("sseg2"),
        )
        .select(
            "source",
            "n_packs",
            F.expr("CAST(doc_slots * 1000 DIV n_packs AS BIGINT)").alias(
                "docs_per_pack_x1000"
            ),
            F.expr("CAST(shared_packs * 1000000 DIV n_packs AS BIGINT)").alias(
                "shared_pack_ppm"
            ),
            F.expr(
                "CAST((sl2 - sseg2) * 1000000 DIV sl2 AS BIGINT)"
            ).alias("contamination_ppm"),
        )
        .orderBy("source")
    )


PACK_CONTAMINATION_SQL = f"""
WITH t AS (
  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
lay AS (
  SELECT source, doc_id, n,
         SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS lo,
         SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) AS hi
  FROM t
),
segs AS (
  SELECT source, doc_id, p.pack,
         LEAST(hi, (p.pack + 1) * {_PACK_LEN})
           - GREATEST(lo, p.pack * {_PACK_LEN}) AS seg
  FROM lay, LATERAL (SELECT unnest(generate_series(CAST(lo // {_PACK_LEN} AS BIGINT),
                                   CAST((hi - 1) // {_PACK_LEN} AS BIGINT))) AS pack) p
),
packs AS (
  SELECT source, pack,
         CAST(COUNT(*) AS BIGINT) AS docs_in_pack,
         CAST(SUM(seg) AS BIGINT) AS l,
         CAST(SUM(CAST(seg AS HUGEINT) * seg) AS HUGEINT) AS sseg2
  FROM segs GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_packs,
       CAST(SUM(docs_in_pack) * 1000 // COUNT(*) AS BIGINT) AS docs_per_pack_x1000,
       CAST(SUM(CASE WHEN docs_in_pack > 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS shared_pack_ppm,
       CAST((SUM(CAST(l AS HUGEINT) * l) - SUM(sseg2)) * 1000000
            // SUM(CAST(l AS HUGEINT) * l) AS BIGINT) AS contamination_ppm
FROM packs
GROUP BY 1
ORDER BY 1
"""

QUERIES["corpus_pack_contamination_audit"] = corpus_pack_contamination_audit
ORACLE["corpus_pack_contamination_audit"] = PACK_CONTAMINATION_SQL


# ---------------------------------------------------------------------------
# corpus_epoch_repetition_plan — data-constrained epoch planner
# (round 10)
# ---------------------------------------------------------------------------


def corpus_epoch_repetition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch planner (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"): split a training
    budget of 8× the corpus's tokens UNIFORMLY across sources, and
    for each source report how many epochs that implies and how many
    tokens of it are still WORTH anything — repeated data decays with
    the paper's fitted half-life R*≈15, so effective tokens are
    U + U·R*·(1 − e^{−(E−1)/R*}). The utility/waste columns are what
    a mixing planner reads before deciding to up-weight a small
    source past its useful repetition ceiling (this is the epoch-axis
    complement of corpus_mixing_temperature's weight axis).

    Determinism: token counts and budget shares are exact integers;
    epochs are integer ppm (DIV); the ONE transcendental (exp) is
    evaluated once per source on a ppm-quantized argument with every
    literal CAST AS DOUBLE and the result rounded to whole tokens —
    measure-zero tie risk, engine-identical otherwise.

    Scale: one tokenize-count scan + a |sources| agg; the plan math
    runs on the |sources|-row frame."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.size(F.split("text", " ")).cast("bigint").alias("toks")
    )
    per = d.groupBy("source").agg(F.expr("CAST(SUM(toks) AS BIGINT)").alias("u"))
    tot = per.agg(
        F.expr("CAST(SUM(u) AS BIGINT)").alias("u_all"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_src"),
    )
    plan = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "u",
        F.expr("(u_all * 8) DIV n_src").alias("budget_tokens"),
        F.expr("CAST(CAST((u_all * 8) DIV n_src AS DECIMAL(38,0)) * 1000000 DIV u AS BIGINT)").alias("epochs_ppm"),
    )
    neff = (
        "CASE WHEN epochs_ppm <= 1000000 THEN budget_tokens ELSE "
        "CAST(ROUND(CAST(u AS DOUBLE) * (CAST(1 AS DOUBLE) + CAST(15 AS DOUBLE)"
        " * (CAST(1 AS DOUBLE) - EXP(-(CAST(epochs_ppm AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        " - CAST(1 AS DOUBLE)) / CAST(15 AS DOUBLE))))) AS BIGINT) END"
    )
    return plan.select(
        "source",
        F.col("u").alias("source_tokens"),
        "budget_tokens",
        "epochs_ppm",
        F.expr(neff).alias("effective_tokens"),
        F.expr(f"CAST(CAST(({neff}) AS DECIMAL(38,0)) * 1000000 DIV budget_tokens AS BIGINT)").alias("utility_ppm"),
        F.expr(f"budget_tokens - ({neff})").alias("wasted_tokens"),
    ).orderBy("source")


_CORPUS_EPOCH_NEFF = (
    "CASE WHEN epochs_ppm <= 1000000 THEN budget_tokens ELSE "
    "CAST(ROUND(CAST(u AS DOUBLE) * (CAST(1 AS DOUBLE) + CAST(15 AS DOUBLE)"
    " * (CAST(1 AS DOUBLE) - EXP(-(CAST(epochs_ppm AS DOUBLE) / CAST(1000000 AS DOUBLE)"
    " - CAST(1 AS DOUBLE)) / CAST(15 AS DOUBLE))))) AS BIGINT) END"
)

CORPUS_EPOCH_SQL = f"""
WITH per AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS u
  FROM documents GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(u) AS BIGINT) AS u_all, CAST(COUNT(*) AS BIGINT) AS n_src FROM per
),
plan AS (
  SELECT source, u,
         CAST((u_all * 8) // n_src AS BIGINT) AS budget_tokens,
         CAST(CAST((u_all * 8) // n_src AS HUGEINT) * 1000000 // u AS BIGINT) AS epochs_ppm
  FROM per, tot
)
SELECT source,
       u AS source_tokens,
       budget_tokens,
       epochs_ppm,
       {_CORPUS_EPOCH_NEFF} AS effective_tokens,
       CAST(CAST(({_CORPUS_EPOCH_NEFF}) AS HUGEINT) * 1000000 // budget_tokens AS BIGINT) AS utility_ppm,
       CAST(budget_tokens - ({_CORPUS_EPOCH_NEFF}) AS BIGINT) AS wasted_tokens
FROM plan
ORDER BY source
"""

QUERIES["corpus_epoch_repetition_plan"] = corpus_epoch_repetition_plan
ORACLE["corpus_epoch_repetition_plan"] = CORPUS_EPOCH_SQL


# ---------------------------------------------------------------------------
# corpus_cluster_aware_split — leakage-free train/val/test assignment
# (round 10)
# ---------------------------------------------------------------------------

_CAS_CLONE_NIB = (
    "(CAST(position(substr(md5(concat('cs:', CAST(doc_id AS STRING))), 1, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT))"
)
_CAS_SPLIT_NIB = (
    "(CAST(position(substr(md5(concat('sp:', CAST(canonical_id AS STRING))), 1, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT))"
)


def corpus_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster-aware train/val/test split: assign every
    member of an exact-dup cluster to the SAME split by hashing the
    cluster CANONICAL id (nibble < 13 → train ≈ 81%, = 13 → val,
    ≥ 14 → test) — the construction that makes
    corpus_validation_leakage's finding impossible by design, where
    the naive per-member hash leaks every straddling cluster into
    both sides of the eval. The corpus plants clones (md5 coin
    'cs:', ~1/8 of docs, id + 1e6) so straddling is possible, and
    the output carries BOTH counts: the naive split's straddling
    clusters (what you'd have shipped) and the aware split's (zero,
    computed — not asserted).

    Determinism/scale notes: every coin and the split itself are
    md5-nibble hashes (the sf1 1e8 id strides make `% 10` splits
    degenerate — this is the stride-proof form); one content-hash
    shuffle for canonicals, map-side split labels, one stats agg."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = d.where(F.expr(f"{_CAS_CLONE_NIB} < 2")).select(
        F.expr("doc_id + 1000000").alias("doc_id"), "text"
    )
    corpus = d.unionByName(clones)
    wtxt = Window.partitionBy(F.md5("text"))
    members = corpus.select(
        "doc_id",
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_tokens"),
        F.min("doc_id").over(wtxt).alias("canonical_id"),
    )
    labeled = members.select(
        "doc_id",
        "n_tokens",
        "canonical_id",
        F.expr(
            f"CASE WHEN {_CAS_SPLIT_NIB} < 13 THEN 'train'"
            f" WHEN {_CAS_SPLIT_NIB} = 13 THEN 'val' ELSE 'test' END"
        ).alias("split"),
        F.expr(
            "CASE WHEN (CAST(position(substr(md5(concat('sp:', CAST(doc_id AS STRING))), 1, 1)"
            " IN '0123456789abcdef') - 1 AS BIGINT)) < 13 THEN 'train'"
            " WHEN (CAST(position(substr(md5(concat('sp:', CAST(doc_id AS STRING))), 1, 1)"
            " IN '0123456789abcdef') - 1 AS BIGINT)) = 13 THEN 'val' ELSE 'test' END"
        ).alias("naive_split"),
    ).localCheckpoint(eager=True)
    straddle = labeled.groupBy("canonical_id").agg(
        F.expr("CAST(COUNT(DISTINCT split) AS BIGINT)").alias("aware_splits"),
        F.expr("CAST(COUNT(DISTINCT naive_split) AS BIGINT)").alias("naive_splits"),
    )
    scal = straddle.agg(
        F.expr("CAST(SUM(CASE WHEN aware_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "aware_straddling_clusters"
        ),
        F.expr("CAST(SUM(CASE WHEN naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "naive_straddling_clusters"
        ),
    )
    tot = labeled.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_total"))
    return (
        labeled.groupBy("split")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("n_tokens"),
            F.expr("CAST(COUNT(DISTINCT canonical_id) AS BIGINT)").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(scal))
        .select(
            "split",
            "n_docs",
            "n_tokens",
            "n_clusters",
            F.expr("n_docs * 1000000 DIV n_total").alias("doc_share_ppm"),
            "naive_straddling_clusters",
            "aware_straddling_clusters",
        )
        .orderBy("split")
    )


CORPUS_CAS_SQL = f"""
WITH d AS (SELECT doc_id, text FROM documents),
clones AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM d WHERE {_CAS_CLONE_NIB} < 2
),
corpus AS (SELECT * FROM d UNION ALL SELECT * FROM clones),
members AS MATERIALIZED (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id
  FROM corpus
),
labeled AS MATERIALIZED (
  SELECT doc_id, n_tokens, canonical_id,
         CASE WHEN {_CAS_SPLIT_NIB} < 13 THEN 'train'
              WHEN {_CAS_SPLIT_NIB} = 13 THEN 'val' ELSE 'test' END AS split,
         CASE WHEN (CAST(position(substr(md5(concat('sp:', CAST(doc_id AS VARCHAR))), 1, 1)
              IN '0123456789abcdef') - 1 AS BIGINT)) < 13 THEN 'train'
              WHEN (CAST(position(substr(md5(concat('sp:', CAST(doc_id AS VARCHAR))), 1, 1)
              IN '0123456789abcdef') - 1 AS BIGINT)) = 13 THEN 'val' ELSE 'test' END AS naive_split
  FROM members
),
straddle AS (
  SELECT canonical_id,
         CAST(COUNT(DISTINCT split) AS BIGINT) AS aware_splits,
         CAST(COUNT(DISTINCT naive_split) AS BIGINT) AS naive_splits
  FROM labeled GROUP BY 1
),
scal AS (
  SELECT CAST(SUM(CASE WHEN aware_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS aware_straddling_clusters,
         CAST(SUM(CASE WHEN naive_splits > 1 THEN 1 ELSE 0 END) AS BIGINT) AS naive_straddling_clusters
  FROM straddle
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM labeled)
SELECT l.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(l.n_tokens) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT l.canonical_id) AS BIGINT) AS n_clusters,
       CAST(COUNT(*) * 1000000 // t.n_total AS BIGINT) AS doc_share_ppm,
       s.naive_straddling_clusters,
       s.aware_straddling_clusters
FROM labeled l, tot t, scal s
GROUP BY l.split, t.n_total, s.naive_straddling_clusters, s.aware_straddling_clusters
ORDER BY l.split
"""

QUERIES["corpus_cluster_aware_split"] = corpus_cluster_aware_split
ORACLE["corpus_cluster_aware_split"] = CORPUS_CAS_SQL


# ---------------------------------------------------------------------------
# corpus_sampling_ess_audit — effective sample size of length-rebalance
# importance weights, per source.


def corpus_sampling_ess_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size ESS = (Σw)²/Σw² (Kong 1992) of truncated
    importance weights that rebalance the corpus toward a UNIFORM
    length-bucket target — per source. DSIR/mix-sampling assign the
    weights; ESS is the audit that says whether resampling will
    DEGENERATE (a source whose docs sit in globally-rare buckets gets
    a few huge weights — ESS collapses, and a sampled epoch is
    effectively a handful of documents). ess_frac ≈ 1 ⇒ reweighting
    is nearly free; ess_frac ≪ 1 ⇒ clip or re-bucket first.

    Determinism: everything is exact integer arithmetic on the
    (source × length-bucket) histogram — bucket = LEAST(n_chars DIV
    50, 11); w_b = LEAST(N·1000 DIV c_b, 10⁶) (truncated IS, the
    standard tail clip, which also keeps Σw² n-independent-bounded:
    w ≤ 10⁶ ⇒ (Σw)²·10⁶ ≤ n²·10¹⁸ — inside DECIMAL(38,0) through
    ~10⁹ docs per source); both ESS emissions are single truncating
    integer DIVs. No doubles anywhere.

    Scale: ONE documents scan (n_chars only — column-pruned) into
    ≤|sources|·12 cells; weights, folds, and the ESS close are all
    histogram-sized."""
    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    cells = d.groupBy(
        "source", F.expr("LEAST(n_chars DIV 50, 11)").alias("b")
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    wb = Window.partitionBy("b")
    wall = Window.partitionBy()
    wtd = cells.select(
        "source",
        "b",
        "c",
        F.expr(
            "CAST(LEAST(SUM(c) OVER () * 1000 DIV SUM(c) OVER (PARTITION BY b),"
            " 1000000) AS BIGINT)"
        ).alias("w"),
    )
    agg = wtd.groupBy("source").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(CAST(c AS DECIMAL(38,0)) * w) AS DECIMAL(38,0))").alias("s1"),
        F.expr("CAST(SUM(CAST(c AS DECIMAL(38,0)) * w * w) AS DECIMAL(38,0))").alias("s2"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.expr("CAST(s1 * s1 * 1000 DIV s2 AS BIGINT)").alias("ess_x1000"),
        F.expr("CAST(s1 * s1 * 1000000 DIV (n_docs * s2) AS BIGINT)").alias("ess_frac_ppm"),
    ).orderBy("source")


CORPUS_ESS_SQL = """
WITH cells AS (
  SELECT source, LEAST(n_chars // 50, 11) AS b, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2
),
wtd AS (
  SELECT source, b, c,
         CAST(LEAST(SUM(c) OVER () * 1000 // SUM(c) OVER (PARTITION BY b),
                    1000000) AS BIGINT) AS w
  FROM cells
),
agg AS (
  SELECT source,
         CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(c AS HUGEINT) * w) AS HUGEINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * w * w) AS HUGEINT) AS s2
  FROM wtd GROUP BY 1
)
SELECT source, n_docs,
       CAST(s1 * s1 * 1000 // s2 AS BIGINT) AS ess_x1000,
       CAST(s1 * s1 * 1000000 // (n_docs * s2) AS BIGINT) AS ess_frac_ppm
FROM agg
ORDER BY source
"""

QUERIES["corpus_sampling_ess_audit"] = corpus_sampling_ess_audit
ORACLE["corpus_sampling_ess_audit"] = CORPUS_ESS_SQL


# ---------------------------------------------------------------------------
# corpus_chunk_boundary_audit — how often fixed-size chunking cuts
# mid-word / mid-sentence, per chunk size.


def corpus_chunk_boundary_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-boundary quality audit for fixed-size character chunking
    (the doc_chunking strategy): for chunk sizes {128, 256, 512},
    what fraction of interior chunk boundaries land on a CLEAN break
    (the char ending the chunk or the one starting the next is a
    space or sentence-final punctuation) vs cutting mid-word —
    the retrieval-quality number that decides whether a RAG pipeline
    needs sentence-aware chunking or can keep cheap fixed windows.

    Determinism: pure integer/string — boundary positions are
    multiples of the chunk size strictly inside the doc (1-indexed
    substr on both engines), the clean-break predicate is an IN-list
    over one-char substrings, counts close with one truncating DIV.

    Scale: ONE documents scan fanned by ≤ len/128 ≤ a few boundary
    probes per doc against a broadcast 3-row size list; each probe is
    two substr(text, pos, 1) lookups — no tokenization, no explode of
    content; the aggregate is 3 rows."""
    d = load_table(spark, sf_dir, "documents").select("text", "n_chars")
    sizes = spark.range(0, 3).select(
        F.expr("CAST(element_at(array(128, 256, 512), CAST(id + 1 AS INT)) AS INT)").alias("k")
    )
    probes = (
        d.crossJoin(F.broadcast(sizes))
        .select(
            "k",
            F.expr("CAST(n_chars DIV k AS INT)").alias("nb"),
            "text",
            "n_chars",
        )
        .where(F.col("nb") >= 1)
        .select(
            "k",
            F.explode(F.expr("sequence(1, nb)")).alias("b"),
            "text",
            "n_chars",
        )
        .where(F.expr("b * k < n_chars"))
        .select(
            "k",
            F.expr(
                "CASE WHEN substr(text, b * k, 1) IN (' ', '.', '!', '?', CHR(10))"
                " OR substr(text, b * k + 1, 1) IN (' ', '.', '!', '?', CHR(10))"
                " THEN 1 ELSE 0 END"
            ).alias("clean"),
        )
    )
    return (
        probes.groupBy(F.col("k").alias("chunk_size"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_boundaries"),
            F.expr("CAST(SUM(clean) AS BIGINT)").alias("n_clean"),
        )
        .select(
            "chunk_size",
            "n_boundaries",
            "n_clean",
            F.expr("CAST(n_clean * 1000000 DIV n_boundaries AS BIGINT)").alias("clean_break_ppm"),
        )
        .orderBy("chunk_size")
    )


CORPUS_CHUNK_BOUNDARY_SQL = """
WITH sizes AS (SELECT UNNEST([128, 256, 512]) AS k),
probes AS (
  SELECT s.k,
         CASE WHEN substr(d.text, b.b * s.k, 1) IN (' ', '.', '!', '?', CHR(10))
              OR substr(d.text, b.b * s.k + 1, 1) IN (' ', '.', '!', '?', CHR(10))
              THEN 1 ELSE 0 END AS clean
  FROM documents d
  JOIN sizes s ON d.n_chars >= s.k
  CROSS JOIN LATERAL (SELECT UNNEST(generate_series(1, CAST(d.n_chars // s.k AS INTEGER))) AS b) b
  WHERE b.b * s.k < d.n_chars
)
SELECT CAST(k AS INTEGER) AS chunk_size,
       CAST(COUNT(*) AS BIGINT) AS n_boundaries,
       CAST(SUM(clean) AS BIGINT) AS n_clean,
       CAST(SUM(clean) * 1000000 // COUNT(*) AS BIGINT) AS clean_break_ppm
FROM probes
GROUP BY 1 ORDER BY 1
"""

QUERIES["corpus_chunk_boundary_audit"] = corpus_chunk_boundary_audit
ORACLE["corpus_chunk_boundary_audit"] = CORPUS_CHUNK_BOUNDARY_SQL
