"""Corpus vocabulary / term-weighting ops: top-k vocabulary with
cumulative coverage, and per-document TF-IDF keyword extraction —
the tokenizer-vocab and relevance-scoring passes of a training-data
pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.sources.tables import load_table

VOCAB_K = 200
TFIDF_K = 3


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K vocabulary by corpus frequency with cumulative coverage
    share (what fraction of all tokens the first r vocab entries
    explain — the curve a tokenizer-vocab-size decision reads).

    Scale shape: tokens explode map-side from a projected token
    array; one (token) hash-agg with map-side combine produces the
    term counts; the top-K selection is TakeOrdered (per-partition
    top-K then a K-row driver merge — never a global sort exchange).
    Only the K selected rows pass through the single-partition
    ranking window, which is safe because K is a constant; the
    corpus-total token count joins back as a broadcast scalar."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("token")).where(F.col("token") != "")
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total_tokens"))
    topk = counts.orderBy(F.col("cnt").desc(), "token").limit(VOCAB_K)
    w = Window.orderBy(F.col("cnt").desc(), "token").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        topk.withColumn("rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "token")))
        .withColumn("cum_cnt", F.sum("cnt").over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "token",
            "cnt",
            F.round(F.col("cum_cnt").cast("double") / F.col("total_tokens"), 6).alias(
                "cum_share"
            ),
        )
        .orderBy("rank")
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, COUNT(*) AS cnt FROM toks WHERE token <> '' GROUP BY 1
), topk AS (
  SELECT token, cnt FROM counts ORDER BY cnt DESC, token LIMIT {VOCAB_K}
), ranked AS (
  SELECT token, cnt,
         CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS INTEGER) AS rank,
         SUM(cnt) OVER (ORDER BY cnt DESC, token
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
  FROM topk
)
SELECT rank, token, CAST(cnt AS BIGINT) AS cnt,
       ROUND(CAST(cum_cnt AS DOUBLE)
             / (SELECT CAST(SUM(cnt) AS DOUBLE) FROM counts), 6) AS cum_share
FROM ranked ORDER BY rank
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k terms by smoothed TF-IDF
    (idf = ln((1+N)/(1+df)) + 1, the sklearn formulation).

    Scale shape: term frequencies come from one (doc, token)
    hash-agg over the map-side token explode; document frequencies
    reuse that aggregate (count per token — a second, smaller
    shuffle); N is a broadcast scalar. The df table joins back on
    token (shuffle join on both sides' natural key), then a per-doc
    window takes the top k. Ranking compares ROUNDED tfidf (6dp,
    token tiebreak) so both engines rank identically even at double
    ulp differences."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            F.round(
                F.col("tf")
                * (
                    F.log((F.lit(1) + F.col("n_docs")) / (F.lit(1) + F.col("df")))
                    + F.lit(1.0)
                ),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_K)
        .select("doc_id", "rank", "token", "tf", "tfidf")
        .orderBy("doc_id", "rank")
    )


TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (
  SELECT COUNT(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.token, CAST(tf.tf AS BIGINT) AS tf,
         ROUND(tf.tf * (LN((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0), 6) AS tfidf
  FROM tf JOIN df USING (token) CROSS JOIN n
), ranked AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, token) AS INTEGER) AS rank
  FROM scored
)
SELECT doc_id, rank, token, tf, tfidf
FROM ranked WHERE rank <= {TFIDF_K}
ORDER BY doc_id, rank
"""


def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality score: per-document average
    negative log-probability under the corpus's own unigram model
    (high = unusual token mix; the cheap stand-in for the KenLM
    perplexity filter of Wenzek et al. 2019).

    Scale shape: one (doc, token) tf aggregation feeds both the
    unigram model (token-level re-agg) and the per-doc scoring join —
    the raw corpus is tokenized exactly once. The model join is on
    token (both sides shuffle on their natural key); the corpus total
    is a broadcast scalar. Per-doc sums of tf·ln(p) are double —
    both engines agg the same ~6dp-rounded terms, and the final score
    rounds at 6dp."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    model = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("total_tokens"))
    scored = (
        tf.join(model, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tf",
            # per-term contribution rounded BEFORE the per-doc sum so
            # both engines add identical addends (ln ulp differences
            # can't leak into the sum)
            F.round(
                F.col("tf") * -F.log(F.col("cnt") / F.col("total_tokens")), 6
            )
            .cast("decimal(18,6)")  # exact sum — shuffle-order-proof
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum("nll").cast("double") / F.sum("tf"), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


UNIGRAM_LOGPROB_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
), model AS (
  SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
), total AS (
  SELECT SUM(cnt) AS total_tokens FROM model
), scored AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ROUND(tf.tf * -LN(CAST(model.cnt AS DOUBLE) / total.total_tokens), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tf JOIN model USING (token) CROSS JOIN total
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(nll) AS DOUBLE) / SUM(tf), 6) AS avg_nll
FROM scored GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "vocab_coverage": vocab_coverage,
    "tfidf_top_terms": tfidf_top_terms,
    "text_unigram_logprob": text_unigram_logprob,
}

ORACLE = {
    "vocab_coverage": VOCAB_COVERAGE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "text_unigram_logprob": UNIGRAM_LOGPROB_SQL,
}


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score with add-α smoothing: per-doc average
    negative log P(w2|w1), P = (c(w1,w2)+α)/(c(w1·)+α·V) — one step up
    the Markov ladder from text_unigram_logprob, catching scrambled
    or stitched text whose unigram mix looks normal.

    Scale shape mirrors the unigram scorer: bigrams are generated
    map-side from the split array (no self-join), ONE (doc,w1,w2)
    aggregation feeds both the model re-aggs and the scoring join;
    context counts come from the bigram counts themselves (no second
    corpus pass); V and α·V ride in a broadcast scalar. Per-term
    contributions are rounded then DECIMAL-summed, so the per-doc
    fold is shuffle-order-proof."""
    alpha = 0.5
    d = load_table(spark, sf_dir, "documents")
    bg = d.select(
        "doc_id", F.split("text", " ").alias("__ws")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, greatest(size(__ws) - 2, -1)),"
                " i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2").where((F.col("w1") != "") & (F.col("w2") != ""))
    tf = bg.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    model = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("c12"))
    ctx = model.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = model.select("w2").distinct().agg(F.count(F.lit(1)).alias("v"))
    scored = (
        tf.join(model, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "tf",
            F.round(
                F.col("tf")
                * -F.log(
                    (F.col("c12") + F.lit(alpha))
                    / (F.col("c1") + F.lit(alpha) * F.col("v"))
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum("nll").cast("double") / F.sum("tf"), 6).alias("avg_nll"),
        )
        .orderBy("doc_id")
    )


BIGRAM_LOGPROB_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i) t
  WHERE ws[i] <> '' AND ws[i + 1] <> ''
), tf AS (
  SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3
), model AS (
  SELECT w1, w2, SUM(tf) AS c12 FROM tf GROUP BY 1, 2
), ctx AS (
  SELECT w1, SUM(c12) AS c1 FROM model GROUP BY 1
), vocab AS (
  SELECT COUNT(DISTINCT w2) AS v FROM model
), scored AS (
  SELECT tf.doc_id, tf.tf,
         CAST(ROUND(tf.tf * -LN((model.c12 + 0.5) / (ctx.c1 + 0.5 * vocab.v)), 6)
              AS DECIMAL(18,6)) AS nll
  FROM tf JOIN model USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN vocab
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       ROUND(CAST(SUM(nll) AS DOUBLE) / SUM(tf), 6) AS avg_nll
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["text_bigram_logprob"] = text_bigram_logprob
ORACLE["text_bigram_logprob"] = BIGRAM_LOGPROB_SQL


_BPE_ROUNDS = 3
_BPE_TOPK = 10


def tokenizer_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training — the merge-candidate loop
    (Sennrich et al. 2015). Each round counts adjacent symbol pairs
    over the current word segmentation (weighted by word frequency),
    emits the top-10 candidates, and applies the #1 merge before the
    next round. Three rounds are materialized.

    Merge semantics: greedy leftmost non-overlapping replace within
    each word — for immediately repeated symbols ("l l l") only the
    first pair merges per scan, exactly what per-word scanning BPE
    implementations do; both engines' replace() share that contract,
    so counts are integer-exact and hash-identical.

    Scale shape: the corpus collapses to the word-frequency table in
    ONE token shuffle; every later round runs on vocab-sized data
    (distinct words), never re-touching the corpus — the property
    that makes BPE training tractable at 100 TB. The only driver-side
    data is the merge table itself (one pair per round: the model, as
    in the IVF/PQ centroid collects)."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "seq",
            F.concat_ws(
                " ",
                F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
            ),
        )
        .select("cnt", "seq")
    )
    base_words = words.persist()
    words = base_words
    try:
        out = None
        for rnd in range(1, _BPE_ROUNDS + 1):
            # single-symbol words carry no pairs — and Spark's
            # sequence(1, 0) counts DOWN, so they must not reach it
            sp = words.select("cnt", F.split("seq", " ").alias("sp")).where(
                F.size("sp") >= 2
            )
            pairs = sp.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sp)-1), i -> concat(sp[i-1], ' ', sp[i]))"
                    )
                ).alias("pair"),
            )
            counted = pairs.groupBy("pair").agg(F.sum("cnt").alias("cnt"))
            w_rank = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
            top = (
                counted.withColumn("rnk", F.row_number().over(w_rank))
                .where(F.col("rnk") <= _BPE_TOPK)
                .select(
                    F.lit(rnd).alias("rnd"),
                    "pair",
                    F.col("cnt").cast("bigint").alias("cnt"),
                    F.col("rnk").cast("int").alias("rnk"),
                )
            )
            # eager 30-row checkpoint: the round's result is computed
            # exactly once, the returned plan reads these checkpoints
            # (not the word-table lineage that the finally unpersists),
            # and the merge pair comes from the same materialization
            top = top.localCheckpoint(eager=True)
            out = top if out is None else out.unionByName(top)
            if rnd < _BPE_ROUNDS:
                # the merge table is THE model — one pair crosses the driver
                best = top.where(F.col("rnk") == 1).first()
                merged = best["pair"].replace(" ", "")
                words = words.select(
                    "cnt",
                    F.trim(
                        F.replace(
                            F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                            F.lit(" " + best["pair"] + " "),
                            F.lit(" " + merged + " "),
                        )
                    ).alias("seq"),
                )
        return out.orderBy("rnd", "rnk")
    finally:
        base_words.unpersist()


def _bpe_round_sql(i: int) -> str:
    """One BPE round: pair counts p{i} over segmentation s{i-1}, top-1
    merge t{i}, next segmentation s{i}."""
    return f"""
p{i} AS MATERIALIZED (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT cnt,
           unnest(list_transform(generate_series(1, len(sp) - 1),
                                 j -> sp[j] || ' ' || sp[j+1])) AS pair
    FROM (SELECT cnt, string_split(seq, ' ') AS sp FROM s{i - 1})
  ) GROUP BY 1
),
t{i} AS (SELECT pair FROM p{i} ORDER BY cnt DESC, pair LIMIT 1),
s{i} AS (
  SELECT cnt,
         trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM t{i}) || ' ',
                      ' ' || replace((SELECT pair FROM t{i}), ' ', '') || ' ')) AS seq
  FROM s{i - 1}
)"""


TOKENIZER_BPE_SQL = f"""
WITH words AS (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
s0 AS (
  SELECT cnt,
         array_to_string(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), ' ') AS seq
  FROM words
),{",".join(_bpe_round_sql(i) for i in range(1, _BPE_ROUNDS + 1))}
SELECT CAST(rnd AS INTEGER) AS rnd, pair, cnt, CAST(rnk AS INTEGER) AS rnk
FROM (
  {" UNION ALL ".join(
    f"SELECT {i} AS rnd, pair, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS rnk FROM p{i}"
    for i in range(1, _BPE_ROUNDS + 1)
  )}
)
WHERE rnk <= {_BPE_TOPK}
ORDER BY rnd, rnk
"""

QUERIES["tokenizer_bpe_pairs"] = tokenizer_bpe_pairs
ORACLE["tokenizer_bpe_pairs"] = TOKENIZER_BPE_SQL


_ZIPF_K = 200


def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health distribution check: fit Zipf's law to the top-200
    vocabulary by log-log OLS (ln freq ≈ intercept + slope·ln rank;
    natural text gives slope ≈ −1, and a synthetic/degenerate corpus
    shows up as a bad fit or shallow slope before any downstream
    metric notices).

    Exactness: ranks/counts are integers; ln values are rounded at
    6dp and the OLS sufficient statistics DECIMAL-accumulate over the
    200-row vocab (order-proof), with the closed-form combination in
    identical double expressions on both engines.

    Scale: ONE token shuffle builds the term counts; top-K is
    TakeOrdered; the regression runs on K rows."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "token")
        .limit(_ZIPF_K)
    )
    ranked = counts.withColumn(
        "rank", F.row_number().over(Window.orderBy(F.col("cnt").desc(), "token"))
    )
    x = F.round(F.log(F.col("rank").cast("double")), 6).cast("decimal(18,6)")
    y = F.round(F.log(F.col("cnt").cast("double")), 6).cast("decimal(18,6)")
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return stats.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


TEXT_ZIPF_SQL = f"""
WITH counts AS (
  SELECT token, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
  WHERE token <> '' GROUP BY 1
  ORDER BY cnt DESC, token LIMIT {_ZIPF_K}
),
ranked AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank FROM counts
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(rank AS DOUBLE)), 6) AS DECIMAL(18,6)) AS x,
         CAST(ROUND(LN(CAST(cnt AS DOUBLE)), 6) AS DECIMAL(18,6)) AS y
  FROM ranked
),
stats AS (
  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_terms,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM stats
"""

QUERIES["text_zipf_fit"] = text_zipf_fit
ORACLE["text_zipf_fit"] = TEXT_ZIPF_SQL


def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING with the trained merge table — the serving half
    of ``tokenizer_bpe_pairs`` (train merges → tokenize the corpus):
    per document, the token count after applying the learned merges
    in rank order, plus the chars-per-token compression ratio a
    tokenizer evaluation reports.

    Scale shape (the part that matters at 100 TB): documents are
    NEVER character-segmented row by row — the corpus collapses to
    per-(doc, word) counts in one token shuffle, each DISTINCT word
    is encoded exactly once on the vocab-sized table (the learned
    merges are plan literals → a JVM replace chain in whole-stage
    codegen), and one join on the word key weights the encoded
    lengths back to documents. Encoding work is O(|vocab|), not
    O(corpus); with a production-sized merge table the replace chain
    becomes a Pandas-UDF per-word loop over ranked merges — same
    vocab-sized frame, different kernel.

    The merges come from the SAME training loop the oracle re-derives
    in SQL (greedy leftmost non-overlapping replace, ties by pair
    text), so the whole train→encode path is value-checked."""
    merges = [
        r["pair"]
        for r in tokenizer_bpe_pairs(spark, sf_dir)
        .where(F.col("rnk") == 1)
        .orderBy("rnd")
        .collect()
    ]
    d = load_table(spark, sf_dir, "documents")
    doc_words = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    vocab = doc_words.select("w").distinct().withColumn(
        "seq",
        F.concat_ws(
            " ", F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))")
        ),
    )
    for pair in merges:
        vocab = vocab.withColumn(
            "seq",
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                    F.lit(" " + pair + " "),
                    F.lit(" " + pair.replace(" ", "") + " "),
                )
            ),
        )
    enc = vocab.select("w", F.size(F.split("seq", " ")).alias("n_tok"))
    return (
        doc_words.join(enc, "w")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.sum(F.col("c") * F.length("w")).cast("bigint").alias("n_chars"),
            F.sum(F.col("c") * F.col("n_tok")).cast("bigint").alias("n_tokens"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_chars",
            "n_tokens",
            F.round(
                F.col("n_chars").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("doc_id")
    )


def _bpe_apply_round_sql(i: int) -> str:
    """One oracle BPE round with the word carried through: pair
    counts over v{i-1}, top-1 merge, next segmentation v{i}."""
    return f"""
q{i} AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT cnt,
           unnest(list_transform(generate_series(1, len(sp) - 1),
                                 j -> sp[j] || ' ' || sp[j+1])) AS pair
    FROM (SELECT cnt, string_split(seq, ' ') AS sp FROM v{i - 1})
  ) GROUP BY 1
),
u{i} AS (SELECT pair FROM q{i} ORDER BY cnt DESC, pair LIMIT 1),
v{i} AS (
  SELECT w, cnt,
         trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM u{i}) || ' ',
                      ' ' || replace((SELECT pair FROM u{i}), ' ', '') || ' ')) AS seq
  FROM v{i - 1}
)"""


TOKENIZER_BPE_APPLY_SQL = f"""
WITH words AS (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
v0 AS (
  SELECT w, cnt,
         array_to_string(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), ' ') AS seq
  FROM words
),{",".join(_bpe_apply_round_sql(i) for i in range(1, _BPE_ROUNDS + 1))},
enc AS (
  SELECT w, len(string_split(seq, ' ')) AS n_tok FROM v{_BPE_ROUNDS}
),
dw AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1, 2
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_words,
       CAST(SUM(c * length(w)) AS BIGINT) AS n_chars,
       CAST(SUM(c * n_tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(SUM(c * length(w)) AS DOUBLE) / CAST(SUM(c * n_tok) AS DOUBLE), 6)
         AS chars_per_token
FROM dw JOIN enc USING (w)
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["tokenizer_bpe_apply"] = tokenizer_bpe_apply
ORACLE["tokenizer_bpe_apply"] = TOKENIZER_BPE_APPLY_SQL


def text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval (Robertson-Spärck Jones, k1=1.2 b=0.75)
    for the fixed query {join, hash, scan}: idf = ln((N−df+0.5)/
    (df+0.5)), per-term score tf·(k1+1) / (tf + k1·(1−b+b·len/
    avglen)) — the ranking function real search engines run, beside
    the tf-idf top-terms profile already in §2.C.

    Engine-exact: tf/df/len/N are integers and len/avglen is computed
    as len·N/S (one bigint product, one IEEE division); each
    per-term contribution is rounded at 6dp and the ≤3 terms
    DECIMAL-sum (the entropy/logprob discipline — Spark's Math.log
    and DuckDB's std::log may differ in the last ulp, which 6dp
    rounding absorbs). Top-20 ordered by the exact decimal score,
    doc_id tie-break.

    Scale design: ONE tokenize pass (named column), conditional-sum
    pivot gives the (doc × 3-term) tf columns in the same length agg
    — no per-term scans, no explode-join; df and corpus stats are
    broadcast 1-row aggregates."""
    terms = ["join", "hash", "scan"]
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    tf = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            # single-arg closure: a 2-param lambda would be read by
            # PySpark as the (element, index) filter form
            F.size(F.filter("toks", (lambda term: lambda w: w == F.lit(term))(t))).alias(
                f"tf_{t}"
            )
            for t in terms
        ],
    )
    stats = tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("bigint").alias("total_len"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("int")).cast("bigint").alias(f"df_{t}")
            for t in terms
        ],
    )
    j = tf.join(F.broadcast(stats), F.lit(True))
    contribs = []
    for t in terms:
        idf = F.log(
            (F.col("n_docs") - F.col(f"df_{t}") + 0.5) / (F.col(f"df_{t}") + 0.5)
        )
        denom = F.col(f"tf_{t}") + 1.2 * (
            0.25 + 0.75 * (F.col("dl") * F.col("n_docs")) / F.col("total_len")
        )
        contribs.append(
            F.round(idf * (F.col(f"tf_{t}") * 2.2) / denom, 6).cast("decimal(18,6)")
        )
    scored = j.select(
        "doc_id",
        sum(contribs[1:], contribs[0]).alias("score"),
    )
    return (
        scored.select("doc_id", F.col("score").cast("double").alias("bm25"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
    )


TEXT_BM25_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tf AS (
  SELECT doc_id, len(toks) AS dl,
         len(list_filter(toks, w -> w = 'join')) AS tf_join,
         len(list_filter(toks, w -> w = 'hash')) AS tf_hash,
         len(list_filter(toks, w -> w = 'scan')) AS tf_scan
  FROM d
),
stats AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_len,
         CAST(SUM(CASE WHEN tf_join > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_join,
         CAST(SUM(CASE WHEN tf_hash > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_hash,
         CAST(SUM(CASE WHEN tf_scan > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_scan
  FROM tf
),
scored AS (
  SELECT doc_id,
         CAST(ROUND(LN((n_docs - df_join + 0.5) / (df_join + 0.5))
               * (tf_join * 2.2)
               / (tf_join + 1.2 * (0.25 + 0.75 * (dl * n_docs) / total_len)), 6)
              AS DECIMAL(18,6))
       + CAST(ROUND(LN((n_docs - df_hash + 0.5) / (df_hash + 0.5))
               * (tf_hash * 2.2)
               / (tf_hash + 1.2 * (0.25 + 0.75 * (dl * n_docs) / total_len)), 6)
              AS DECIMAL(18,6))
       + CAST(ROUND(LN((n_docs - df_scan + 0.5) / (df_scan + 0.5))
               * (tf_scan * 2.2)
               / (tf_scan + 1.2 * (0.25 + 0.75 * (dl * n_docs) / total_len)), 6)
              AS DECIMAL(18,6)) AS score
  FROM tf, stats
)
SELECT doc_id, CAST(score AS DOUBLE) AS bm25
FROM scored
ORDER BY score DESC, doc_id ASC
LIMIT 20
"""

QUERIES["text_bm25_search"] = text_bm25_search
ORACLE["text_bm25_search"] = TEXT_BM25_SQL


def _llr_term_sql(k: str, r: str, c: str) -> str:
    """One Dunning G² cell: k·ln(k·N/(R·C)), 6dp-rounded into DECIMAL
    (transcendental discipline), zero when the cell is empty. The
    SAME string feeds Spark (F.expr) and the DuckDB oracle, so the
    arithmetic cannot drift between engines."""
    return (
        f"CASE WHEN {k} > 0 THEN "
        f"CAST(ROUND({k} * LN((CAST({k} AS DOUBLE) * n) / (CAST({r} AS DOUBLE) * {c})), 6)"
        f" AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END"
    )


def text_collocations_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining by Dunning's log-likelihood ratio (Dunning
    1993): for each adjacent word pair, G² = 2·Σ k_ij ln(k_ij N /
    R_i C_j) over the 2×2 contingency of (first word, second word)
    across all bigram slots — the sparse-safe alternative to PMI for
    "which word pairs travel together" (PMI over-rewards rare pairs;
    G² is χ²-calibrated). Top-20 collocations with k11 ≥ 5.

    Engine-exact: the four cell terms are generated from ONE shared
    SQL string (ln of integer-ratio arguments, 6dp-rounded into
    DECIMAL per cell), so G² = 2·(exact decimal sum of 4 cells)
    hash-matches; ranking ties break on the word pair.

    Scale: bigrams generate map-side from the split array (no
    self-join); ONE (w1,w2) agg is the only corpus-sized shuffle —
    marginals and N re-aggregate from it (bigram-vocabulary-sized),
    and the candidate join carries only k11 ≥ 5 pairs."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(F.split("text", " ").alias("__ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(__ws) - 2, -1)),"
                    " i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("k11"))
    r1 = model.groupBy("w1").agg(F.sum("k11").alias("c1"))
    c1 = model.groupBy("w2").agg(F.sum("k11").alias("c2"))
    tot = model.agg(F.sum("k11").alias("n"))
    cells = (
        model.where(F.col("k11") >= 5)
        .join(r1, "w1")
        .join(c1, "w2")
        .crossJoin(F.broadcast(tot))
        .withColumn("k12", F.col("c1") - F.col("k11"))
        .withColumn("k21", F.col("c2") - F.col("k11"))
        .withColumn("k22", F.col("n") - F.col("c1") - F.col("k21"))
    )
    g2 = (
        (
            F.expr(_llr_term_sql("k11", "c1", "c2"))
            + F.expr(_llr_term_sql("k12", "c1", "(n - c2)"))
            + F.expr(_llr_term_sql("k21", "(n - c1)", "c2"))
            + F.expr(_llr_term_sql("k22", "(n - c1)", "(n - c2)"))
        ).cast("decimal(18,6)")
        * 2
    ).cast("double")
    return (
        cells.select(
            "w1", "w2", F.col("k11").alias("pair_count"), g2.alias("g2_llr")
        )
        .orderBy(F.col("g2_llr").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(20)
    )


def _collocations_sql() -> str:
    t11 = _llr_term_sql("k11", "c1", "c2")
    t12 = _llr_term_sql("k12", "c1", "(n - c2)")
    t21 = _llr_term_sql("k21", "(n - c1)", "c2")
    t22 = _llr_term_sql("k22", "(n - c1)", "(n - c2)")
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
bg AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ws))) AS t(i)
  WHERE ws[i] <> '' AND ws[i + 1] <> ''
),
model AS (SELECT w1, w2, COUNT(*) AS k11 FROM bg GROUP BY 1, 2),
r1 AS (SELECT w1, CAST(SUM(k11) AS BIGINT) AS c1 FROM model GROUP BY 1),
cc AS (SELECT w2, CAST(SUM(k11) AS BIGINT) AS c2 FROM model GROUP BY 1),
tot AS (SELECT CAST(SUM(k11) AS BIGINT) AS n FROM model),
cells AS (
  SELECT m.w1, m.w2, m.k11, r1.c1, cc.c2, tot.n,
         r1.c1 - m.k11 AS k12, cc.c2 - m.k11 AS k21,
         tot.n - r1.c1 - (cc.c2 - m.k11) AS k22
  FROM model m JOIN r1 USING (w1) JOIN cc USING (w2) CROSS JOIN tot
  WHERE m.k11 >= 5
)
SELECT w1, w2, CAST(k11 AS BIGINT) AS pair_count,
       CAST(CAST({t11} + {t12} + {t21} + {t22} AS DECIMAL(18,6)) * 2 AS DOUBLE) AS g2_llr
FROM cells
ORDER BY g2_llr DESC, w1 ASC, w2 ASC
LIMIT 20
"""


QUERIES["text_collocations_llr"] = text_collocations_llr
ORACLE["text_collocations_llr"] = _collocations_sql()


def text_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph (adjacent-pair edges weighted
    by corpus count), 5 unrolled damped iterations, top-10 words —
    the unsupervised keyword baseline; the graph-centrality sibling
    of tfidf_top_terms (frequency-based) and text_collocations_llr
    (pair-association-based).

    Engine-exact: the iterative-DECIMAL-update discipline (the
    pagerank/logreg house rule) — each incoming contribution
    pr(v)·w(v,u)/wdeg(v) is 6dp-rounded into a DECIMAL sum, and the
    damped update re-rounds to 6dp, so all 5 iterations are
    bit-identical; ranking ties break on the word.

    Scale: one (w1,w2) corpus shuffle builds the edge list; each
    iteration is one vocabulary-sized edge agg (map-side-combined) —
    the synchronous PageRank superstep plan, no driver loop."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select(F.split("text", " ").alias("__ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(__ws) - 2, -1)),"
                    " i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .where((F.col("w1") != "") & (F.col("w2") != "") & (F.col("w1") != F.col("w2")))
    )
    und = bg.unionByName(
        bg.select(F.col("w2").alias("w1"), F.col("w1").alias("w2"))
    )
    edges = und.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("wt"))
    wdeg = edges.groupBy("w1").agg(F.sum("wt").alias("wdeg"))
    # r10 opt: checkpoint the edge base ONCE — the 5-iteration loop
    # reads e (and nodes, derived from it) every superstep, and the
    # lazy plan re-derived the full corpus bigram shuffle per reader
    # (the HyperANF multi-reader rule). n crosses the driver as one
    # scalar literal (the spectral_bisection precedent) — the
    # per-iteration broadcast crossJoins fold away; ROUND(1/n) on the
    # literal is the identical double.
    e = (
        edges.join(wdeg, "w1")
        .select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "wt", "wdeg")
        .localCheckpoint(eager=True)
    )
    nodes = e.select(F.col("src").alias("w")).distinct()
    n_lit = nodes.count()
    pr = nodes.select(
        "w",
        F.expr(
            f"CAST(ROUND(1.0 / CAST({n_lit} AS DOUBLE), 6) AS DECIMAL(18,6))"
        ).alias("pr"),
    )
    for _ in range(5):
        contrib = (
            e.join(pr.withColumnRenamed("w", "src"), "src")
            .select(
                F.col("dst").alias("w"),
                F.expr(
                    "CAST(ROUND(CAST(pr AS DOUBLE) * wt / wdeg, 6) AS DECIMAL(18,6))"
                ).alias("c"),
            )
            .groupBy("w")
            .agg(F.sum("c").alias("inflow"))
        )
        pr = nodes.join(contrib, "w", "left").select(
            "w",
            F.expr(
                f"CAST(ROUND(0.15 / CAST({n_lit} AS DOUBLE)"
                " + 0.85 * CAST(COALESCE(inflow, 0) AS DOUBLE), 6)"
                " AS DECIMAL(18,6))"
            ).alias("pr"),
        )
    return (
        pr.select("w", F.col("pr").cast("double").alias("textrank"))
        .orderBy(F.col("textrank").desc(), F.col("w").asc())
        .limit(10)
    )


def _textrank_sql() -> str:
    iters = []
    prev = "pr0"
    for t in (1, 2, 3, 4, 5):
        iters.append(
            f"""c{t} AS (
  SELECT e.dst AS w,
         SUM(CAST(ROUND(CAST(p.pr AS DOUBLE) * e.wt / e.wdeg, 6)
                  AS DECIMAL(18,6))) AS inflow
  FROM e JOIN {prev} p ON p.w = e.src
  GROUP BY 1
),
pr{t} AS (
  SELECT nodes.w,
         CAST(ROUND(0.15 / CAST(nn.n AS DOUBLE)
                    + 0.85 * CAST(COALESCE(c{t}.inflow, 0) AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS pr
  FROM nodes LEFT JOIN c{t} ON c{t}.w = nodes.w CROSS JOIN nn
)"""
        )
        prev = f"pr{t}"
    body = ",\n".join(iters)
    return f"""
WITH toks AS (
  SELECT string_split(text, ' ') AS ws FROM documents
),
bgd AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ws))) AS t(i)
  WHERE ws[i] <> '' AND ws[i + 1] <> '' AND ws[i] <> ws[i + 1]
),
und AS (SELECT w1, w2 FROM bgd UNION ALL SELECT w2, w1 FROM bgd),
edges AS (SELECT w1, w2, COUNT(*) AS wt FROM und GROUP BY 1, 2),
wdeg AS (SELECT w1, CAST(SUM(wt) AS BIGINT) AS wdeg FROM edges GROUP BY 1),
e AS (
  SELECT edges.w1 AS src, edges.w2 AS dst, edges.wt, wdeg.wdeg
  FROM edges JOIN wdeg USING (w1)
),
nodes AS (SELECT DISTINCT src AS w FROM e),
nn AS (SELECT COUNT(*) AS n FROM nodes),
pr0 AS (
  SELECT w, CAST(ROUND(1.0 / CAST(nn.n AS DOUBLE), 6) AS DECIMAL(18,6)) AS pr
  FROM nodes CROSS JOIN nn
),
{body}
SELECT w, CAST(pr AS DOUBLE) AS textrank
FROM pr5
ORDER BY textrank DESC, w ASC
LIMIT 10
"""


QUERIES["text_textrank_keywords"] = text_textrank_keywords
ORACLE["text_textrank_keywords"] = _textrank_sql()


def text_good_turing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good–Turing frequency smoothing (Gale & Sampson 1995):
    from the corpus frequency-of-frequencies table N_r, the adjusted
    counts r* = (r+1)·N_{r+1}/N_r for low r and the unseen-mass
    estimate P₀ = N₁/N — the classical answer to "how much
    probability belongs to words we have never seen", which the
    add-α smoothing in the LM scorers assumes away. Emits the ten
    LOWEST-frequency N_r rows with r* plus the rarest-class mass
    (on a natural corpus the lowest class IS r=1, the unseen-mass
    numerator; the synthetic corpus's floor sits higher).

    Engine-exact: N_r and N are integers from two stacked aggs
    (tf → freq-of-freqs); r* and P₀ are integer-ppm cross-ratios —
    zero floating point.

    Scale: one tokenize + one word tf agg (corpus-sized, map-side-
    combined) + one freq-of-freqs agg (vocabulary-sized); the
    smoothing table is ≤10 rows."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    tf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("r"))
    fof = tf.groupBy("r").agg(F.count(F.lit(1)).alias("nr"))
    w = Window.orderBy("r")
    tot = fof.agg(F.sum(F.col("r") * F.col("nr")).alias("n_tokens"))
    tab = (
        fof.select(
            "r",
            "nr",
            F.lead("nr", 1).over(w).alias("nr1"),
            F.lead("r", 1).over(w).alias("rnext"),
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 10)
        .crossJoin(F.broadcast(tot))
    )
    return tab.select(
        "r",
        "nr",
        F.expr(
            "CASE WHEN rnext = r + 1 AND nr1 IS NOT NULL"
            " THEN (r + 1) * nr1 * 1000000 DIV nr ELSE NULL END"
        ).alias("r_star_micro"),
        F.expr(
            "CASE WHEN rk = 1 THEN nr * 1000000 DIV n_tokens ELSE NULL END"
        ).alias("rarest_mass_ppm"),
    ).orderBy("r")


TEXT_GOOD_TURING_SQL = """
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents
),
tf AS (SELECT w, COUNT(*) AS r FROM toks WHERE w <> '' GROUP BY 1),
fof AS (SELECT r, COUNT(*) AS nr FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(r * nr) AS BIGINT) AS n_tokens FROM fof),
tab AS (
  SELECT r, nr,
         LEAD(nr, 1) OVER (ORDER BY r) AS nr1,
         LEAD(r, 1) OVER (ORDER BY r) AS rnext,
         ROW_NUMBER() OVER (ORDER BY r) AS rk
  FROM fof
)
SELECT CAST(t.r AS BIGINT) AS r, t.nr,
       CASE WHEN t.rnext = t.r + 1 AND t.nr1 IS NOT NULL
            THEN CAST((t.r + 1) * t.nr1 * 1000000 // t.nr AS BIGINT) END
         AS r_star_micro,
       CASE WHEN t.rk = 1 THEN CAST(t.nr * 1000000 // tot.n_tokens AS BIGINT) END
         AS rarest_mass_ppm
FROM tab t CROSS JOIN tot
WHERE t.rk <= 10
ORDER BY r
"""

QUERIES["text_good_turing"] = text_good_turing
ORACLE["text_good_turing"] = TEXT_GOOD_TURING_SQL


def text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram probabilities (Kneser & Ney
    1995; the smoothing every production n-gram LM for data-quality
    scoring actually ships): P(w2|w1) = max(c12−D,0)/c1 +
    D·N1+(w1,·)/c1 · N1+(·,w2)/N1+(··), D = 0.75 — the continuation
    half is what add-α smoothing (text_bigram_logprob) lacks: a word
    seen in many CONTEXTS gets backoff mass, a burst word doesn't.
    Emits the top-40 bigrams with their counts, continuation fan-ins/
    fan-outs, and the KN probability.

    Scale design: one map-side bigram explode → ONE (w1,w2) count agg
    feeds everything — contexts, fan-out N1+(w1,·), fan-in N1+(·,w2),
    and the bigram-type total — all re-aggregations of the model
    table (bigram-vocabulary-sized), never a second corpus pass; the
    type total broadcasts.

    Determinism: every input to the probability is an exact integer
    count; D=0.75 is binary-exact; the arithmetic chain is identical
    IEEE ops on both engines, quantized with FLOOR(p·1e9) — no
    transcendental, no ROUND ties."""
    d = load_table(spark, sf_dir, "documents")
    bg = (
        d.select("doc_id", F.split("text", " ").alias("__ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, greatest(size(__ws) - 2, -1)),"
                    " i -> struct(__ws[i] AS w1, __ws[i + 1] AS w2))"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .where((F.col("w1") != "") & (F.col("w2") != ""))
    )
    model = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = model.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("fanout"),
    )
    cont = model.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("fanin"))
    nb = model.agg(F.count(F.lit(1)).cast("bigint").alias("n_bigram_types"))
    top = (
        model.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nb))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            "c1",
            "fanout",
            "fanin",
            F.expr(
                "CAST(FLOOR((GREATEST(c12 - 0.75, 0.0) / c1"
                " + 0.75 * fanout / c1 * (CAST(fanin AS DOUBLE) / n_bigram_types))"
                " * 1e9) AS BIGINT)"
            ).alias("kn_p_e9"),
        )
    )
    return top.orderBy(F.col("c12").desc(), "w1", "w2").limit(40)


KNESER_NEY_SQL = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), bg AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 1, 0))) AS i) t
  WHERE ws[i] <> '' AND ws[i + 1] <> ''
), model AS MATERIALIZED (
  SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2
), ctx AS (
  SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS fanout
  FROM model GROUP BY 1
), cont AS (
  SELECT w2, CAST(COUNT(*) AS BIGINT) AS fanin FROM model GROUP BY 1
), nb AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM model
)
SELECT model.w1, model.w2, CAST(model.c12 AS BIGINT) AS c12,
       ctx.c1, ctx.fanout, cont.fanin,
       CAST(FLOOR((GREATEST(model.c12 - 0.75, 0.0) / ctx.c1
            + 0.75 * ctx.fanout / ctx.c1
              * (CAST(cont.fanin AS DOUBLE) / nb.n_bigram_types)) * 1e9) AS BIGINT)
         AS kn_p_e9
FROM model JOIN ctx USING (w1) JOIN cont USING (w2) CROSS JOIN nb
ORDER BY c12 DESC, model.w1, model.w2
LIMIT 40
"""

QUERIES["text_kneser_ney"] = text_kneser_ney
ORACLE["text_kneser_ney"] = KNESER_NEY_SQL


# ---------------------------------------------------------------------------
# text_ndcg_eval — nDCG@10 of a TF-density ranking vs graded relevance
# ---------------------------------------------------------------------------

_NDCG_TERMS = ("join", "hash", "scan")
# 1e6 / log2(rank+1) for ranks 1..10, precomputed ONCE in exact
# integers and shared verbatim by both engines — no transcendental
# ever runs inside either query
_NDCG_W_E6 = (
    1000000, 630930, 500000, 430677, 386853,
    356207, 333333, 315465, 301030, 289065,
)
_NDCG_W_CASE = (
    "CASE rn " + " ".join(f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W_E6))
    + " ELSE 0 END"
)


def text_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality harness: nDCG@10 (Järvelin-Kekäläinen 2002)
    of a term-frequency-DENSITY ranking against graded relevance
    labels derived from raw term frequency (rel 2 at tf>=3, rel 1 at
    tf>=1) for three fixed queries — the eval loop a training-data
    pipeline runs on its retrieval index (the scoring half is
    ``text_bm25_search``; this is the judged-quality half).

    All-integer: the ranking key is tf*1e6 DIV dl (exact), position
    discounts are precomputed e6 integers, gains 2^rel-1 are {1,3},
    so DCG and ideal-DCG are exact BIGINT dot products; the single
    IEEE division happens once per query at the close.

    Scale: one tokenize pass gives all three tf columns (the bm25
    conditional-sum shape), matches are STACKed long and ranked per
    query; at real index scale the rank-10 cut is a per-query
    TakeOrdered, not a global sort."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    tf = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter("toks", (lambda term: lambda w: w == F.lit(term))(t))).alias(
                f"tf_{t}"
            )
            for t in _NDCG_TERMS
        ],
    )
    stack_expr = "stack({n}, {body}) AS (term, tf)".format(
        n=len(_NDCG_TERMS),
        body=", ".join(f"'{t}', tf_{t}" for t in _NDCG_TERMS),
    )
    long = tf.select("doc_id", "dl", F.expr(stack_expr)).where(F.col("tf") > 0)
    scored = long.select(
        "term",
        "doc_id",
        F.expr("tf * 1000000 DIV dl").alias("score_e6"),
        F.expr("CASE WHEN tf >= 3 THEN 2 ELSE 1 END").alias("rel"),
    )
    w_rank = Window.partitionBy("term").orderBy(
        F.col("score_e6").desc(), F.col("doc_id")
    )
    w_ideal = Window.partitionBy("term").orderBy(F.col("rel").desc(), F.col("doc_id"))
    ranked = scored.select(
        "term",
        "rel",
        F.row_number().over(w_rank).alias("rn"),
        F.row_number().over(w_ideal).alias("rn_ideal"),
    )
    gains = ranked.select(
        "term",
        "rel",
        F.expr(f"CASE WHEN rn <= 10 THEN (POW(2, rel) - 1) * ({_NDCG_W_CASE}) ELSE 0 END")
        .cast("bigint")
        .alias("dcg_part"),
        F.expr(
            "CASE WHEN rn_ideal <= 10 THEN (POW(2, rel) - 1) * ("
            + _NDCG_W_CASE.replace("CASE rn ", "CASE rn_ideal ")
            + ") ELSE 0 END"
        )
        .cast("bigint")
        .alias("idcg_part"),
    )
    return (
        gains.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rel"),
            F.sum((F.col("rel") == 2).cast("int")).cast("bigint").alias("n_hi"),
            F.sum("dcg_part").cast("bigint").alias("dcg_e6"),
            F.sum("idcg_part").cast("bigint").alias("idcg_e6"),
        )
        .select(
            "term",
            "n_rel",
            "n_hi",
            "dcg_e6",
            "idcg_e6",
            F.expr(
                "ROUND(CAST(dcg_e6 AS DOUBLE) / idcg_e6, 6)"
            ).alias("ndcg_at_10"),
        )
        .orderBy("term")
    )


def _ndcg_sql() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, dl, '{t}' AS term, tf_{t} AS tf FROM tf" for t in _NDCG_TERMS
    )
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}" for t in _NDCG_TERMS
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tf AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM d
),
long_ AS (
  SELECT * FROM ({unions}) WHERE tf > 0
),
scored AS (
  SELECT term, doc_id, tf * 1000000 // dl AS score_e6,
         CASE WHEN tf >= 3 THEN 2 ELSE 1 END AS rel
  FROM long_
),
ranked AS (
  SELECT term, rel,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY score_e6 DESC, doc_id) AS rn,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY rel DESC, doc_id) AS rn_ideal
  FROM scored
),
gains AS (
  SELECT term, rel,
         CAST(CASE WHEN rn <= 10
                   THEN (CAST(POW(2, rel) AS BIGINT) - 1) * ({_NDCG_W_CASE})
                   ELSE 0 END AS BIGINT) AS dcg_part,
         CAST(CASE WHEN rn_ideal <= 10
                   THEN (CAST(POW(2, rel) AS BIGINT) - 1)
                        * ({_NDCG_W_CASE.replace("CASE rn ", "CASE rn_ideal ")})
                   ELSE 0 END AS BIGINT) AS idcg_part
  FROM ranked
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS n_rel,
       CAST(SUM(CASE WHEN rel = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
       CAST(SUM(dcg_part) AS BIGINT) AS dcg_e6,
       CAST(SUM(idcg_part) AS BIGINT) AS idcg_e6,
       ROUND(CAST(SUM(dcg_part) AS DOUBLE) / SUM(idcg_part), 6) AS ndcg_at_10
FROM gains GROUP BY term ORDER BY term
"""


QUERIES["text_ndcg_eval"] = text_ndcg_eval
ORACLE["text_ndcg_eval"] = _ndcg_sql()


# ---------------------------------------------------------------------------
# tokenizer_vocab_pruning — coverage loss across vocabulary budgets
# ---------------------------------------------------------------------------

_PRUNE_KS = (100, 200, 400)


def tokenizer_vocab_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-budget sweep: token and type coverage of the top-k
    frequency-ranked words at k = 100/200/400 — the pruning curve a
    tokenizer team reads before fixing a vocab size (coverage is
    concave in k; the knee is the budget). The sweep complement of
    the single-k ``vocab_coverage``.

    All-integer: ranks are row_numbers over (freq DESC, word), and
    both coverages are ppm floor-divisions of exact BIGINT token
    counts.

    Scale: the corpus collapses ONCE to the word-frequency table
    (the BPE-training shape); the sweep is three conditional sums
    over that table in ONE aggregate — no per-k scans."""
    d = load_table(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = wf.select(
        "w",
        "freq",
        F.row_number().over(Window.orderBy(F.col("freq").desc(), F.col("w"))).alias(
            "rnk"
        ),
    )
    agg = ranked.agg(
        F.sum("freq").cast("bigint").alias("total_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("total_types"),
        *[
            F.sum(F.when(F.col("rnk") <= k, F.col("freq")))
            .cast("bigint")
            .alias(f"cov_{k}")
            for k in _PRUNE_KS
        ],
    )
    rows = agg.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("vocab_k"),
                        F.col(f"cov_{k}").alias("in_vocab_tokens"),
                        F.col("total_tokens").alias("total_tokens"),
                        F.col("total_types").alias("total_types"),
                    )
                    for k in _PRUNE_KS
                ]
            )
        ).alias("r")
    ).select("r.*")
    return rows.select(
        F.col("vocab_k").cast("int").alias("vocab_k"),
        "in_vocab_tokens",
        "total_tokens",
        F.expr("CAST(in_vocab_tokens * 1000000 DIV total_tokens AS BIGINT)").alias(
            "coverage_ppm"
        ),
        F.expr("CAST(total_tokens - in_vocab_tokens AS BIGINT)").alias("oov_tokens"),
        "total_types",
    ).orderBy("vocab_k")


def _vocab_pruning_sql() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS vocab_k, cov_{k} AS in_vocab_tokens,"
        " total_tokens, total_types FROM agg"
        for k in _PRUNE_KS
    )
    covs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN rnk <= {k} THEN freq END) AS BIGINT) AS cov_{k}"
        for k in _PRUNE_KS
    )
    return f"""
WITH wf AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
ranked AS (
  SELECT w, freq,
         ROW_NUMBER() OVER (ORDER BY freq DESC, w) AS rnk
  FROM wf
),
agg AS (
  SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens,
         CAST(COUNT(*) AS BIGINT) AS total_types,
         {covs}
  FROM ranked
)
SELECT CAST(vocab_k AS INTEGER) AS vocab_k, in_vocab_tokens, total_tokens,
       CAST(in_vocab_tokens * 1000000 // total_tokens AS BIGINT) AS coverage_ppm,
       CAST(total_tokens - in_vocab_tokens AS BIGINT) AS oov_tokens,
       total_types
FROM ({unions})
ORDER BY vocab_k
"""


QUERIES["tokenizer_vocab_pruning"] = tokenizer_vocab_pruning
ORACLE["tokenizer_vocab_pruning"] = _vocab_pruning_sql()


_UNI_L = 10  # word-length cap for the segmentation DP (corpus max: 8)
_UNI_PMAX = 4  # max piece length
_UNI_TOP = 48  # frequency-ranked vocab size (single chars always kept)


def tokenizer_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (Kudo 2018; the SentencePiece
    family — the OTHER major subword algorithm next to the suite's
    BPE trainer): candidate pieces are all substrings (len ≤ 4) of
    the corpus words, the vocab keeps the top-48 by occurrence-
    weighted frequency plus every single character (closure — any
    word stays segmentable), initial piece probabilities come from
    those frequencies, and ONE EM step re-estimates them: the E-step
    Viterbi-segments every distinct word under the current costs
    (min total −ln p, ties → longer last piece, then lexicographic),
    the M-step re-normalizes usage counts. Emits the vocabulary with
    init/final probabilities and usage counts.

    Engine-exact: frequencies, probabilities (ppm, truncating DIV)
    and usages are integers; the one transcendental (piece cost
    −ln p) rounds to e6 BIGINT (the house transcendental rule); the
    DP is pure integer minimization with a total-order tie-break, so
    the segmentation is identical in both engines (oracle: a
    generated chained-MATERIALIZED-CTE DP, one level per position).

    Scale: the corpus collapses to the distinct-word histogram in ONE
    token shuffle (the BPE-trainer property — later stages never
    re-touch the corpus); candidate/freq aggs are map-side combined;
    the vocab is model-sized (collected like IVF centroids); the
    per-word Viterbi is embarrassingly parallel and runs as ONE
    Arrow pass over the word histogram (mapInPandas — a sequential
    DP no built-in expresses); usage counting is a piece-keyed agg
    on path-sized data."""
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where((F.col("w") != "") & (F.length("w") <= _UNI_L))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    occ = words.select(
        "w",
        "cnt",
        F.explode(F.expr("sequence(1, length(w))")).alias("i"),
    ).select(
        "w",
        "cnt",
        "i",
        F.explode(
            F.expr(f"sequence(1, least({_UNI_PMAX}, length(w) - i + 1))")
        ).alias("l"),
    ).select(F.expr("substr(w, i, l)").alias("piece"), "cnt")
    freq = occ.groupBy("piece").agg(F.sum("cnt").cast("bigint").alias("freq"))
    top = freq.orderBy(F.desc("freq"), F.asc("piece")).limit(_UNI_TOP)
    chars = freq.where(F.length("piece") == 1)
    vocab = top.unionByName(chars).distinct()
    tot = vocab.agg(F.sum("freq").alias("tot"))
    vcost = vocab.join(F.broadcast(tot)).select(
        "piece",
        "freq",
        F.expr("freq * 1000000 DIV tot").cast("bigint").alias("init_prob_ppm"),
        F.expr(
            "CAST(ROUND(-LN((freq * 1000000 DIV tot) / 1000000.0) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("cost_e6"),
    )
    model = {r["piece"]: int(r["cost_e6"]) for r in vcost.collect()}

    def segment(batches):
        import pandas as pd  # noqa: F811

        for pdf in batches:
            out_w, out_cnt, out_piece = [], [], []
            for w, cnt in zip(pdf["w"], pdf["cnt"]):
                n = len(w)
                # best[k] = (cost, last_l, last_piece) with tie-break
                # (cost asc, l desc, piece asc) — identical to the
                # oracle's window order
                best = [None] * (n + 1)
                best[0] = (0, 0, "")
                for k in range(1, n + 1):
                    cand = []
                    for l in range(1, min(_UNI_PMAX, k) + 1):
                        p = w[k - l : k]
                        c = model.get(p)
                        if c is not None and best[k - l] is not None:
                            cand.append((best[k - l][0] + c, -l, p))
                    if cand:
                        tot_c, negl, p = min(cand)
                        best[k] = (tot_c, -negl, p)
                pos = n
                while pos > 0 and best[pos] is not None:
                    _, l, p = best[pos]
                    out_w.append(w)
                    out_cnt.append(int(cnt))
                    out_piece.append(p)
                    pos -= l
            yield pd.DataFrame({"w": out_w, "cnt": out_cnt, "piece": out_piece})

    used = words.mapInPandas(segment, "w string, cnt long, piece string")
    usage = used.groupBy("piece").agg(F.sum("cnt").cast("bigint").alias("usage_count"))
    utot = usage.agg(F.sum("usage_count").alias("ut"))
    out = (
        vcost.join(usage, "piece", "left")
        .na.fill({"usage_count": 0})
        .join(F.broadcast(utot))
        .select(
            "piece",
            "freq",
            "init_prob_ppm",
            F.col("usage_count").cast("bigint").alias("usage_count"),
            F.expr("usage_count * 1000000 DIV ut").cast("bigint").alias(
                "final_prob_ppm"
            ),
        )
    )
    w40 = Window.orderBy(
        F.desc("usage_count"), F.desc("freq"), F.asc("piece")
    )
    return (
        out.withColumn("rank", F.row_number().over(w40))
        .where(F.col("rank") <= 40)
        .select("rank", "piece", "freq", "init_prob_ppm", "usage_count", "final_prob_ppm")
        .orderBy("rank")
    )


def _unigram_oracle_sql() -> str:
    """Generated chained-CTE twin of the mapInPandas DP: one
    MATERIALIZED level per position (best cost + argmin choice with
    the (cost, l DESC, piece) tie-break), then a ≤L-step walk
    reconstructs each word's optimal path for usage counting."""
    L, PMAX, TOP = _UNI_L, _UNI_PMAX, _UNI_TOP
    lvls = []
    for k in range(1, L + 1):
        prevs = []
        for l in range(1, min(PMAX, k) + 1):
            src = "best0" if k - l == 0 else f"ch{k - l}"
            prevs.append(
                f"SELECT c.w, c.l, c.piece, p.cost + c.cost_e6 AS tot\n"
                f"  FROM cand c JOIN {src} p ON p.w = c.w AND c.k = {k} AND c.l = {l}"
            )
        body = "\nUNION ALL ".join(prevs)
        lvls.append(
            f"ch{k} AS MATERIALIZED (\n"
            f"  SELECT w, {k} AS pos, l, piece, tot AS cost FROM (\n"
            f"    SELECT *, ROW_NUMBER() OVER (PARTITION BY w"
            f" ORDER BY tot ASC, l DESC, piece ASC) AS rn FROM ({body})\n"
            f"  ) WHERE rn = 1)"
        )
    walk = ["wk0 AS (SELECT w, cnt, length(w) AS pos FROM words)"]
    for s in range(1, L + 1):
        walk.append(
            f"wk{s} AS MATERIALIZED (\n"
            f"  SELECT k.w, k.cnt, c.piece, k.pos - c.l AS pos\n"
            f"  FROM wk{s - 1} k JOIN choice c ON c.w = k.w AND c.pos = k.pos\n"
            f"  WHERE k.pos > 0)"
        )
    choice_union = "\nUNION ALL ".join(
        f"SELECT w, pos, l, piece FROM ch{k}" for k in range(1, L + 1)
    )
    used_union = "\nUNION ALL ".join(
        f"SELECT cnt, piece FROM wk{s}" for s in range(1, L + 1)
    )
    levels_sql = ",\n".join(lvls)
    walk_sql = ",\n".join(walk)
    return f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks
  WHERE w <> '' AND length(w) <= {L} GROUP BY w
),
occ AS (
  SELECT substr(w, i, l) AS piece, cnt
  FROM words,
       LATERAL (SELECT unnest(generate_series(1, length(w))) AS i) t1,
       LATERAL (SELECT unnest(generate_series(1, LEAST({PMAX}, length(w) - i + 1))) AS l) t2
),
freq AS (SELECT piece, CAST(SUM(cnt) AS BIGINT) AS freq FROM occ GROUP BY piece),
topv AS (
  SELECT piece, freq FROM freq
  ORDER BY freq DESC, piece ASC LIMIT {TOP}
),
vocab AS (
  SELECT DISTINCT piece, freq FROM (
    SELECT * FROM topv UNION ALL SELECT piece, freq FROM freq WHERE length(piece) = 1
  )
),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS tot FROM vocab),
vcost AS (
  SELECT piece, freq,
         CAST(freq * 1000000 // tot AS BIGINT) AS init_prob_ppm,
         CAST(ROUND(-LN((freq * 1000000 // tot) / 1000000.0) * 1000000, 0)
              AS BIGINT) AS cost_e6
  FROM vocab, tot
),
cand AS MATERIALIZED (
  SELECT d.w, d.i + d.l - 1 AS k, d.l, d.piece, v.cost_e6
  FROM (
    SELECT w, i, l, substr(w, i, l) AS piece
    FROM words,
         LATERAL (SELECT unnest(generate_series(1, length(w))) AS i) t1,
         LATERAL (SELECT unnest(generate_series(1, LEAST({PMAX}, length(w) - i + 1))) AS l) t2
  ) d JOIN vcost v ON v.piece = d.piece
),
best0 AS (SELECT w, CAST(0 AS BIGINT) AS cost FROM words),
{levels_sql},
choice AS MATERIALIZED ({choice_union}),
{walk_sql},
usage AS (
  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS usage_count
  FROM ({used_union}) GROUP BY piece
),
utot AS (SELECT CAST(SUM(usage_count) AS BIGINT) AS ut FROM usage),
outv AS (
  SELECT v.piece, v.freq, v.init_prob_ppm,
         COALESCE(u.usage_count, 0) AS usage_count
  FROM vcost v LEFT JOIN usage u ON u.piece = v.piece
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY usage_count DESC, freq DESC, piece ASC)
            AS INTEGER) AS rank,
       piece, freq, init_prob_ppm, usage_count,
       CAST(usage_count * 1000000 // ut AS BIGINT) AS final_prob_ppm
FROM outv, utot
QUALIFY rank <= 40
ORDER BY rank
"""


QUERIES["tokenizer_unigram_train"] = tokenizer_unigram_train
ORACLE["tokenizer_unigram_train"] = _unigram_oracle_sql()


# ---------------------------------------------------------------------------
# tokenizer_wordpiece_train — likelihood-scored merges (round 10)
# ---------------------------------------------------------------------------

_WP_ROUNDS = 3
_WP_TOPK = 10


def tokenizer_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WordPiece tokenizer training (Schuster & Nakajima
    2012; the BERT tokenizer): same merge loop as BPE but candidates
    are scored by LIKELIHOOD GAIN score(a,b) = count(ab) /
    (count(a)·count(b)) — the pair whose merge most increases corpus
    likelihood under a unigram model — instead of raw frequency, so
    rare-but-strongly-bound pairs beat frequent-but-independent ones
    (the practical difference between the two vocabularies). Three
    rounds, top-10 candidates each, merge #1 applied between rounds.

    Engine-exact: scores are integer parts-per-trillion —
    count(ab)·10¹² DIV (count(a)·count(b)) with the product lifted to
    DECIMAL(38,0)/HUGEINT before multiplying (r8 overflow rule) — so
    ranking needs no float compare anywhere; tie-break on pair text.

    Scale shape = tokenizer_bpe_pairs: ONE corpus token shuffle to
    the word-frequency table; every round is vocab-sized (pair +
    unigram counts over distinct-word segmentations); only the merge
    table (one pair/round) crosses the driver."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "seq",
            F.concat_ws(
                " ",
                F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
            ),
        )
        .select("cnt", "seq")
    )
    base_words = words.persist()
    words = base_words
    try:
        out = None
        for rnd in range(1, _WP_ROUNDS + 1):
            sp_all = words.select("cnt", F.split("seq", " ").alias("sp"))
            unigrams = (
                sp_all.select("cnt", F.explode("sp").alias("sym"))
                .groupBy("sym")
                .agg(F.sum("cnt").cast("bigint").alias("uc"))
            )
            sp = sp_all.where(F.size("sp") >= 2)
            pairs = sp.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(sp)-1), i -> concat(sp[i-1], ' ', sp[i]))"
                    )
                ).alias("pair"),
            )
            counted = pairs.groupBy("pair").agg(F.sum("cnt").cast("bigint").alias("cnt"))
            scored = (
                counted.withColumn("l", F.expr("split(pair, ' ')[0]"))
                .withColumn("r", F.expr("split(pair, ' ')[1]"))
                .join(unigrams.select(F.col("sym").alias("l"), F.col("uc").alias("lc")), "l")
                .join(unigrams.select(F.col("sym").alias("r"), F.col("uc").alias("rc")), "r")
                .withColumn(
                    "score_ppt",
                    F.expr(
                        "CAST(CAST(cnt AS DECIMAL(38,0)) * 1000000000000"
                        " DIV (CAST(lc AS DECIMAL(38,0)) * rc) AS BIGINT)"
                    ),
                )
            )
            w_rank = Window.orderBy(F.col("score_ppt").desc(), F.col("pair").asc())
            top = (
                scored.withColumn("rnk", F.row_number().over(w_rank))
                .where(F.col("rnk") <= _WP_TOPK)
                .select(
                    F.lit(rnd).alias("rnd"),
                    "pair",
                    F.col("cnt").cast("bigint").alias("cnt"),
                    "score_ppt",
                    F.col("rnk").cast("int").alias("rnk"),
                )
            )
            top = top.localCheckpoint(eager=True)  # BPE round discipline
            out = top if out is None else out.unionByName(top)
            if rnd < _WP_ROUNDS:
                best = top.where(F.col("rnk") == 1).first()
                merged = best["pair"].replace(" ", "")
                words = words.select(
                    "cnt",
                    F.trim(
                        F.replace(
                            F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                            F.lit(" " + best["pair"] + " "),
                            F.lit(" " + merged + " "),
                        )
                    ).alias("seq"),
                )
        return out.orderBy("rnd", "rnk")
    finally:
        base_words.unpersist()


def _wp_round_sql(i: int) -> str:
    return f"""
u{i} AS MATERIALIZED (
  SELECT sym, CAST(SUM(cnt) AS BIGINT) AS uc
  FROM (SELECT cnt, unnest(string_split(seq, ' ')) AS sym FROM ws{i - 1})
  GROUP BY 1
),
p{i} AS MATERIALIZED (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT cnt,
           unnest(list_transform(generate_series(1, len(sp) - 1),
                                 j -> sp[j] || ' ' || sp[j+1])) AS pair
    FROM (SELECT cnt, string_split(seq, ' ') AS sp FROM ws{i - 1})
  ) GROUP BY 1
),
sc{i} AS MATERIALIZED (
  SELECT p.pair, p.cnt,
         CAST(CAST(p.cnt AS HUGEINT) * 1000000000000
              // (CAST(ul.uc AS HUGEINT) * ur.uc) AS BIGINT) AS score_ppt
  FROM p{i} p
  JOIN u{i} ul ON ul.sym = string_split(p.pair, ' ')[1]
  JOIN u{i} ur ON ur.sym = string_split(p.pair, ' ')[2]
),
t{i} AS MATERIALIZED (SELECT pair FROM sc{i} ORDER BY score_ppt DESC, pair LIMIT 1),
ws{i} AS MATERIALIZED (
  SELECT cnt,
         trim(replace(' ' || seq || ' ',
                      ' ' || (SELECT pair FROM t{i}) || ' ',
                      ' ' || replace((SELECT pair FROM t{i}), ' ', '') || ' ')) AS seq
  FROM ws{i - 1}
)"""


TOKENIZER_WP_SQL = f"""
WITH words AS (
  SELECT w, COUNT(*) AS cnt
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY 1
),
ws0 AS MATERIALIZED (
  SELECT cnt,
         array_to_string(list_transform(generate_series(1, length(w)),
                                        i -> substr(w, i, 1)), ' ') AS seq
  FROM words
),{",".join(_wp_round_sql(i) for i in range(1, _WP_ROUNDS + 1))}
SELECT CAST(rnd AS INTEGER) AS rnd, pair, cnt, score_ppt, CAST(rnk AS INTEGER) AS rnk
FROM (
  {" UNION ALL ".join(
    f"SELECT {i} AS rnd, pair, cnt, score_ppt,"
    f" ROW_NUMBER() OVER (ORDER BY score_ppt DESC, pair) AS rnk FROM sc{i}"
    for i in range(1, _WP_ROUNDS + 1)
  )}
)
WHERE rnk <= {_WP_TOPK}
ORDER BY rnd, rnk
"""

QUERIES["tokenizer_wordpiece_train"] = tokenizer_wordpiece_train
ORACLE["tokenizer_wordpiece_train"] = TOKENIZER_WP_SQL


# ---------------------------------------------------------------------------
# corpus_vocab_coverage_curve — vocab-size planning anchors (round 10)
# ---------------------------------------------------------------------------


def corpus_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocab-size planning curve: how many word types (ranked by
    frequency) cover 50 / 90 / 99 / 99.9% of all token occurrences,
    and each tier's type-share of the full vocabulary — the table a
    tokenizer-budget decision reads (vocab_coverage answers coverage
    OF a given list; this finds the SIZE needed for a target).
    Head/tail mass in one pass: the frequency histogram's CDF over
    counts DESCENDING.

    FULLY INTEGER: term counts, a (count value)-level histogram CDF
    (types and tokens cumulated over distinct frequency values — the
    rank boundary never splits a tie block ambiguously because the
    answer is reported AT block granularity: the smallest type
    count whose cumulative token mass reaches the target). Scale:
    one tokenize shuffle to term counts, then a |distinct
    frequencies|-row CDF."""
    d = load_table(spark, sf_dir, "documents")
    terms = d.select(F.explode(F.split("text", " ")).alias("w")).groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("f")
    )
    fhist = terms.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("types"))
    wdesc = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = (
        fhist.withColumn("cum_types", F.sum("types").over(wdesc).cast("bigint"))
        .withColumn(
            "cum_tokens", F.sum(F.expr("f * types")).over(wdesc).cast("bigint")
        )
        .withColumn("total_types", F.sum("types").over(wall).cast("bigint"))
        .withColumn(
            "total_tokens", F.sum(F.expr("f * types")).over(wall).cast("bigint")
        )
    )
    targets = spark.range(1).select(
        F.explode(
            F.array(F.lit(500), F.lit(900), F.lit(990), F.lit(999))
        ).alias("pm")
    )
    j = cdf.crossJoin(F.broadcast(targets))
    return (
        j.groupBy("pm")
        .agg(
            F.max("total_types").alias("total_types"),
            F.max("total_tokens").alias("total_tokens"),
            F.min(
                F.when(
                    F.col("cum_tokens") * 1000 >= F.col("total_tokens") * F.col("pm"),
                    F.col("cum_types"),
                )
            ).alias("types_needed"),
        )
        .select(
            F.col("pm").cast("bigint").alias("coverage_permille"),
            "total_types",
            "total_tokens",
            F.col("types_needed").cast("bigint").alias("types_needed"),
            F.expr("CAST(types_needed * 1000000 DIV total_types AS BIGINT)").alias(
                "vocab_share_ppm"
            ),
        )
        .orderBy("coverage_permille")
    )


VOCAB_CURVE_SQL = """
WITH terms AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS f
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  GROUP BY 1
),
fhist AS (
  SELECT f, CAST(COUNT(*) AS BIGINT) AS types FROM terms GROUP BY 1
),
cdf AS (
  SELECT f, types,
         CAST(SUM(types) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_types,
         CAST(SUM(f * types) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum_tokens,
         CAST(SUM(types) OVER () AS BIGINT) AS total_types,
         CAST(SUM(f * types) OVER () AS BIGINT) AS total_tokens
  FROM fhist
),
targets AS (SELECT pm FROM (VALUES (500), (900), (990), (999)) v(pm))
SELECT CAST(pm AS BIGINT) AS coverage_permille,
       MAX(total_types) AS total_types,
       MAX(total_tokens) AS total_tokens,
       CAST(MIN(CASE WHEN cum_tokens * 1000 >= total_tokens * pm
                THEN cum_types END) AS BIGINT) AS types_needed,
       CAST(MIN(CASE WHEN cum_tokens * 1000 >= total_tokens * pm
                THEN cum_types END) * 1000000 // MAX(total_types) AS BIGINT)
         AS vocab_share_ppm
FROM cdf CROSS JOIN targets
GROUP BY 1
ORDER BY 1
"""

QUERIES["corpus_vocab_coverage_curve"] = corpus_vocab_coverage_curve
ORACLE["corpus_vocab_coverage_curve"] = VOCAB_CURVE_SQL


# ---------------------------------------------------------------------------
# text_mrr_eval — MRR / MAP@10 retrieval eval (round 10)
# ---------------------------------------------------------------------------


def text_mrr_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR and MAP@10 for the same tf-density ranking and query set
    as text_ndcg_eval, under BINARY relevance (relevant ⇔ tf ≥ 3,
    the nDCG harness's high grade) — the rank-position half of the
    retrieval eval suite: nDCG grades the whole list, MRR asks "how
    deep is the first good hit", MAP averages precision at every
    good hit. The relevance bar is deliberately STRICTER than the
    retrieval predicate (tf ≥ 1), so rank 1 is not relevant by
    construction and the metrics are informative.

    All-integer: reciprocal rank is 1e6 DIV rank; AP@10 is the
    integer mean of e6 precision terms (Σ(hits@k·1e6 DIV k) DIV
    min(R,10) over relevant ranks k ≤ 10); recall@10 is ppm.

    Scale: identical plan shape to text_ndcg_eval — one tokenize
    pass, STACKed per-query candidates, per-query windows; the
    rank-10 cut is a per-query TakeOrdered at index scale."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    tf = d.select(
        "doc_id",
        F.size("toks").alias("dl"),
        *[
            F.size(F.filter("toks", (lambda term: lambda w: w == F.lit(term))(t))).alias(
                f"tf_{t}"
            )
            for t in _NDCG_TERMS
        ],
    )
    stack_expr = "stack({n}, {body}) AS (term, tf)".format(
        n=len(_NDCG_TERMS),
        body=", ".join(f"'{t}', tf_{t}" for t in _NDCG_TERMS),
    )
    long = tf.select("doc_id", "dl", F.expr(stack_expr)).where(F.col("tf") > 0)
    scored = long.select(
        "term",
        "doc_id",
        F.expr("tf * 1000000 DIV dl").alias("score_e6"),
        F.expr("CASE WHEN tf >= 3 THEN 1 ELSE 0 END").alias("rel"),
    )
    w_rank = Window.partitionBy("term").orderBy(F.col("score_e6").desc(), F.col("doc_id"))
    ranked = scored.select("term", "rel", F.row_number().over(w_rank).alias("rn"))
    w_cum = (
        Window.partitionBy("term").orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = ranked.withColumn("hits", F.sum("rel").over(w_cum))
    agg = cum.groupBy("term").agg(
        F.expr("CAST(SUM(rel) AS BIGINT)").alias("n_relevant"),
        F.expr("CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT)").alias("first_rel_rank"),
        F.expr(
            "CAST(SUM(CASE WHEN rel = 1 AND rn <= 10 THEN hits * 1000000 DIV rn ELSE 0 END)"
            " AS BIGINT)"
        ).alias("ap_num_e6"),
        F.expr("CAST(SUM(CASE WHEN rel = 1 AND rn <= 10 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "hits_at_10"
        ),
    )
    return agg.select(
        "term",
        "n_relevant",
        "first_rel_rank",
        F.expr("1000000 DIV first_rel_rank").alias("rr_e6"),
        F.expr("ap_num_e6 DIV GREATEST(LEAST(n_relevant, 10), 1)").alias("ap_at_10_e6"),
        F.expr("hits_at_10 * 1000000 DIV GREATEST(n_relevant, 1)").alias("recall_at_10_ppm"),
    ).orderBy("term")


def _mrr_sql() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT doc_id, dl, '{t}' AS term, tf_{t} AS tf FROM tf" for t in _NDCG_TERMS
    )
    cols = ",\n         ".join(
        f"len(list_filter(toks, w -> w = '{t}')) AS tf_{t}" for t in _NDCG_TERMS
    )
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
tf AS (
  SELECT doc_id, len(toks) AS dl,
         {cols}
  FROM d
),
long AS ({unions}),
scored AS (
  SELECT term, doc_id, tf * 1000000 // dl AS score_e6,
         CASE WHEN tf >= 3 THEN 1 ELSE 0 END AS rel
  FROM long WHERE tf > 0
),
ranked AS (
  SELECT term, rel,
         ROW_NUMBER() OVER (PARTITION BY term ORDER BY score_e6 DESC, doc_id) AS rn
  FROM scored
),
cum AS (
  SELECT term, rel, rn,
         SUM(rel) OVER (PARTITION BY term ORDER BY rn ROWS UNBOUNDED PRECEDING) AS hits
  FROM ranked
),
agg AS (
  SELECT term,
         CAST(SUM(rel) AS BIGINT) AS n_relevant,
         CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT) AS first_rel_rank,
         CAST(SUM(CASE WHEN rel = 1 AND rn <= 10 THEN hits * 1000000 // rn ELSE 0 END) AS BIGINT) AS ap_num_e6,
         CAST(SUM(CASE WHEN rel = 1 AND rn <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10
  FROM cum GROUP BY 1
)
SELECT term, n_relevant, first_rel_rank,
       CAST(1000000 // first_rel_rank AS BIGINT) AS rr_e6,
       CAST(ap_num_e6 // GREATEST(LEAST(n_relevant, 10), 1) AS BIGINT) AS ap_at_10_e6,
       CAST(hits_at_10 * 1000000 // GREATEST(n_relevant, 1) AS BIGINT) AS recall_at_10_ppm
FROM agg
ORDER BY term
"""


QUERIES["text_mrr_eval"] = text_mrr_eval
ORACLE["text_mrr_eval"] = _mrr_sql()


# ---------------------------------------------------------------------------
# tokenizer_oov_rate_matrix — cross-source vocabulary transfer
# (round 10)
# ---------------------------------------------------------------------------


def tokenizer_oov_rate_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source OOV transfer matrix: tokenize once, build each
    source's top-500 term vocabulary, and measure every source's
    out-of-vocabulary token share under every OTHER source's
    vocabulary — the planning table for "can one tokenizer serve the
    whole mix, and which source pays for it" (the pairwise sibling
    of vocab_coverage; text_source_vocab_overlap compares the
    vocabularies themselves, this measures the TOKEN MASS the
    mismatch costs).

    Engine-exact: term counts are integers; vocab rank ties break
    (count DESC, term ASC); OOV is an integer-ppm DIV. Scale: ONE
    tokenize shuffle to (source, term) counts; the vocab is a
    window-rank over that vocab-sized frame; the transfer join fans
    each (source, term) row out to ≤ |sources| vocab hits against a
    broadcast ≤ |sources|·500-row vocab table."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("term")
    )
    tc = (
        d.groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    wv = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("term"))
    vocab = (
        tc.withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= 500)
        .select(F.col("source").alias("vocab_source"), "term")
    )
    totals = tc.groupBy("source").agg(F.expr("CAST(SUM(cnt) AS BIGINT)").alias("total_tokens"))
    covered = (
        tc.join(F.broadcast(vocab), "term")
        .groupBy("source", "vocab_source")
        .agg(F.expr("CAST(SUM(cnt) AS BIGINT)").alias("covered_tokens"))
    )
    grid = totals.select("source", "total_tokens").crossJoin(
        vocab.select("vocab_source").distinct()
    )
    return (
        grid.join(covered, ["source", "vocab_source"], "left")
        .select(
            "source",
            "vocab_source",
            F.expr("COALESCE(covered_tokens, CAST(0 AS BIGINT))").alias("covered_tokens"),
            "total_tokens",
            F.expr(
                "(total_tokens - COALESCE(covered_tokens, 0)) * 1000000 DIV total_tokens"
            ).alias("oov_ppm"),
        )
        .orderBy("source", "vocab_source")
    )


TOKENIZER_OOV_SQL = """
WITH toks AS (
  SELECT source, UNNEST(string_split(text, ' ')) AS term FROM documents
),
tc AS MATERIALIZED (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY 1, 2
),
vocab AS MATERIALIZED (
  SELECT source AS vocab_source, term FROM (
    SELECT source, term,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY cnt DESC, term) AS rn
    FROM tc
  ) WHERE rn <= 500
),
totals AS (
  SELECT source, CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM tc GROUP BY 1
),
covered AS (
  SELECT t.source, v.vocab_source, CAST(SUM(t.cnt) AS BIGINT) AS covered_tokens
  FROM tc t JOIN vocab v ON t.term = v.term
  GROUP BY 1, 2
)
SELECT g.source, g.vocab_source,
       COALESCE(c.covered_tokens, CAST(0 AS BIGINT)) AS covered_tokens,
       g.total_tokens,
       CAST((g.total_tokens - COALESCE(c.covered_tokens, 0)) * 1000000 // g.total_tokens
            AS BIGINT) AS oov_ppm
FROM (SELECT t.source, t.total_tokens, v.vocab_source
      FROM totals t CROSS JOIN (SELECT DISTINCT vocab_source FROM vocab) v) g
LEFT JOIN covered c ON g.source = c.source AND g.vocab_source = c.vocab_source
ORDER BY g.source, g.vocab_source
"""

QUERIES["tokenizer_oov_rate_matrix"] = tokenizer_oov_rate_matrix
ORACLE["tokenizer_oov_rate_matrix"] = TOKENIZER_OOV_SQL
