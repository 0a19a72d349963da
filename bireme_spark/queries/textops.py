"""Text-analysis queries over the documents corpus (SURVEY.md §2.C)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.functions import text as T
from bireme_spark.sources.tables import load_table

_STOP_SQL = "('a','the')"


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).alias("n_tokens"),
        T.regex_token_count(F.col("text")).alias("n_regex_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


TEXT_TOKEN_COUNT_SQL = """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
       CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_regex_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_measured
FROM documents
"""


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.stopword_count(F.col("text")).alias("n_stopwords"),
        F.round(T.stopword_ratio(F.col("text")), 6).alias("stopword_ratio"),
        F.round(T.avg_token_len(F.col("text")), 6).alias("avg_token_len"),
        F.round(T.quality_score(F.col("text")), 6).alias("quality"),
    )


TEXT_QUALITY_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text,' '), x -> x IN {_STOP_SQL})) AS INTEGER) AS n_stopwords,
         CAST(len(string_split(text,' ')) AS DOUBLE) AS n_tokens,
         CAST(length(text) AS DOUBLE) AS n_chars
  FROM documents
)
SELECT doc_id, n_stopwords,
       ROUND(n_stopwords / n_tokens, 6) AS stopword_ratio,
       ROUND((n_chars - (n_tokens - 1)) / n_tokens, 6) AS avg_token_len,
       ROUND(LEAST(1.0, n_tokens / 400.0) * (1.0 - n_stopwords / n_tokens), 6) AS quality
FROM t
"""


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        T.lang_id(F.col("text")).alias("predicted_lang"),
    )


TEXT_LANG_ID_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN CAST(len(list_filter(string_split(text,' '), x -> x IN {_STOP_SQL})) AS DOUBLE)
                 / len(string_split(text,' ')) > 0.03
            THEN 'en' ELSE 'unk' END AS predicted_lang
FROM documents
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


DOC_FINGERPRINT_SQL = """
SELECT doc_id,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
         (acc, c) -> (acc * 31 + c) % 1000000007
       ) AS fingerprint
FROM documents
"""


def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: fraction of duplicate tokens /
    bigrams / trigrams per document (Rae et al. 2021 §A1.1 use
    duplicate n-gram fractions as a quality filter).

    Entirely map-side JVM: n-grams are built with slice+zip_with over
    a single projected token array — no explode, no shuffle, so the
    plan is a pure scan→project at any corpus scale. The token array
    is projected to a named column once (never re-split inside a
    lambda)."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split(F.col("text"), " ").alias("toks")).withColumn(
        "n", F.size("toks")
    )
    nm1 = F.greatest(F.col("n") - 1, F.lit(0))
    nm2 = F.greatest(F.col("n") - 2, F.lit(0))
    g = t.withColumn(
        "bigrams",
        F.zip_with(
            F.slice("toks", F.lit(1), nm1),
            F.slice("toks", F.lit(2), nm1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).withColumn(
        "trigrams",
        F.zip_with(
            F.slice("bigrams", F.lit(1), nm2),
            F.slice("toks", F.lit(3), nm2),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )

    def dup_frac(arr: str):
        n = F.size(arr)
        return F.when(
            n > 0, F.round((n - F.size(F.array_distinct(arr))) / n.cast("double"), 6)
        )

    return g.select(
        "doc_id",
        F.col("n").cast("int").alias("n_tokens"),
        dup_frac("toks").alias("dup_token_frac"),
        dup_frac("bigrams").alias("dup_bigram_frac"),
        dup_frac("trigrams").alias("dup_trigram_frac"),
        (
            (F.coalesce(dup_frac("toks"), F.lit(0.0)) > 0.6)
            | (F.coalesce(dup_frac("bigrams"), F.lit(0.0)) > 0.2)
        ).alias("repetitive"),
    )


TEXT_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n
  FROM documents
), g AS (
  SELECT doc_id, n, toks,
         list_transform(list_zip(toks[1:n-1], toks[2:n]),
                        s -> s[1] || ' ' || s[2]) AS bigrams,
         list_transform(list_zip(toks[1:n-2], toks[2:n-1], toks[3:n]),
                        s -> s[1] || ' ' || s[2] || ' ' || s[3]) AS trigrams
  FROM t
), f AS (
  SELECT doc_id, CAST(n AS INTEGER) AS n_tokens,
         ROUND((n - len(list_distinct(toks)))
               / CAST(NULLIF(n, 0) AS DOUBLE), 6) AS dup_token_frac,
         ROUND((len(bigrams) - len(list_distinct(bigrams)))
               / CAST(NULLIF(len(bigrams), 0) AS DOUBLE), 6) AS dup_bigram_frac,
         ROUND((len(trigrams) - len(list_distinct(trigrams)))
               / CAST(NULLIF(len(trigrams), 0) AS DOUBLE), 6) AS dup_trigram_frac
  FROM g
)
SELECT *,
       (COALESCE(dup_token_frac, 0) > 0.6 OR COALESCE(dup_bigram_frac, 0) > 0.2)
         AS repetitive
FROM f
"""


def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass (email / phone / IPv4), the pre-training
    redaction step every public-web corpus pipeline runs (e.g. C4 /
    CCNet postprocessing). Deterministic synthetic PII is injected
    per doc_id (the corpus itself is PII-free word soup), then
    counted and redacted with pure-JVM regexp expressions — the
    oracle builds the identical augmented text and patterns, so
    counts AND the full redacted string must hash-match."""
    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    email = F.when(
        did % 3 != 0,
        F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 2 == 0,
        F.concat(
            F.lit(" call +1 555 "), F.lpad((did % 10000).cast("string"), 4, "0")
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        did % 5 == 0,
        F.concat(F.lit(" from 10."), (did % 256).cast("string"), F.lit(".0.1")),
    ).otherwise(F.lit(""))
    t = d.select("doc_id", F.concat(F.col("text"), email, phone, ip).alias("aug"))
    return t.select(
        "doc_id",
        T.pii_count(F.col("aug"), T.PII_EMAIL).alias("n_emails"),
        T.pii_count(F.col("aug"), T.PII_PHONE).alias("n_phones"),
        T.pii_count(F.col("aug"), T.PII_IPV4).alias("n_ips"),
        T.redact_pii(F.col("aug")).alias("redacted"),
    )


TEXT_PII_SQL = rf"""
WITH t AS (
  SELECT doc_id, text
    || CASE WHEN doc_id % 3 <> 0
            THEN ' contact user' || doc_id || '@example.com' ELSE '' END
    || CASE WHEN doc_id % 2 = 0
            THEN ' call +1 555 ' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'
            ELSE '' END AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '{T.PII_EMAIL}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(aug, '{T.PII_PHONE}')) AS INTEGER) AS n_phones,
       CAST(len(regexp_extract_all(aug, '{T.PII_IPV4}')) AS INTEGER) AS n_ips,
       regexp_replace(regexp_replace(regexp_replace(aug,
         '{T.PII_EMAIL}', '<EMAIL>', 'g'),
         '{T.PII_PHONE}', '<PHONE>', 'g'),
         '{T.PII_IPV4}', '<IP>', 'g') AS redacted
FROM t
"""



def text_lang_id_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation over the corpus: confusion matrix of the
    language-ID heuristic against the ground-truth ``lang`` column,
    plus per-cell corpus share — the acceptance gate a data pipeline
    runs before trusting a filter model at 100 TB. One small-key
    aggregation on top of the map-side predictor (|langs|² cells
    cross the shuffle, never rows)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    pred = d.select("lang", T.lang_id(F.col("text")).alias("predicted_lang"))
    cells = pred.groupBy("lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n_docs"))
    # corpus total as a global window over the AGGREGATED cells
    # (≤ |langs|² rows — a safe single-partition window at any corpus
    # size; no driver-side count, query stays lazy/declarative)
    total = F.sum("n_docs").over(Window.partitionBy())
    return cells.withColumn(
        "share", F.round(F.col("n_docs") / total.cast("double"), 6)
    ).orderBy("lang", "predicted_lang")


TEXT_LANG_ID_EVAL_SQL = f"""
WITH pred AS ({TEXT_LANG_ID_SQL}),
tot AS (SELECT COUNT(*) AS n FROM pred)
SELECT lang, predicted_lang, COUNT(*) AS n_docs,
       ROUND(COUNT(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6) AS share
FROM pred
GROUP BY lang, predicted_lang
ORDER BY lang, predicted_lang
"""

QUERIES = {
    "text_lang_id_eval": text_lang_id_eval,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "doc_fingerprint": doc_fingerprint,
    "text_repetition": text_repetition,
    "text_pii_redact": text_pii_redact,
}

ORACLE = {
    "text_lang_id_eval": TEXT_LANG_ID_EVAL_SQL,
    "text_pii_redact": TEXT_PII_SQL,
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "text_repetition": TEXT_REPETITION_SQL,
}


def text_crossdoc_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-span fractions: per doc, the share of
    its distinct 8-gram shingles that also occur in at least one
    OTHER document — the n-gram-granularity form of exact substring
    dedup (Lee et al. 2022, arXiv:2107.06499; the suffix-array pass
    there finds char-exact spans, this finds word-8-gram-exact ones).
    Docs with a high shared fraction are boilerplate/mirror
    candidates that near-dup *pair* mining misses when no single
    partner passes τ.

    Plan: one shingle shuffle (the inverted index the Jaccard miner
    already uses) annotated with a doc-frequency window, then one
    doc_id aggregation. No self-join at all — cost is linear in total
    shingles, so this runs BEFORE pair mining at 100 TB to shrink the
    candidate space."""
    from pyspark.sql import Window

    from bireme_spark.operators.dedup import shingles

    sh = shingles(load_table(spark, sf_dir, "documents"), "doc_id", "text", n=8)
    ann = sh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("shingle")))
    return (
        ann.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df") >= 2).cast("bigint")).alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_shingles"), 6).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_CROSSDOC_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(ws[i:i+7], ' ') AS s
  FROM w, LATERAL (SELECT unnest(generate_series(1, greatest(len(ws) - 7, 0))) AS i) t
),
ann AS (
  SELECT doc_id, COUNT(*) OVER (PARTITION BY s) AS df FROM sh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       ROUND(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS dup_frac
FROM ann
GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["text_crossdoc_spans"] = text_crossdoc_spans
ORACLE["text_crossdoc_spans"] = TEXT_CROSSDOC_SQL


_GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _gopher_measures(d: DataFrame) -> DataFrame:
    """The five Gopher rule measures as map-side columns over a frame
    carrying ``text`` + a pre-split ``ws`` token array — shared by
    text_gopher_rules and the quality_classifier label so the rule
    battery cannot drift between them."""
    return d.select(
        *d.columns,
        F.size("ws").alias("n_words"),
        (F.length(F.regexp_replace(F.col("text"), " ", "")) / F.size("ws")).alias(
            "mean_word_len"
        ),
        (
            (
                F.regexp_count(F.col("text"), F.lit("#"))
                + F.regexp_count(F.col("text"), F.lit("\\.\\.\\."))
            )
            / F.size("ws")
        ).alias("symbol_ratio"),
        (
            F.size(F.filter(F.col("ws"), lambda w: w.rlike("[a-z]"))) / F.size("ws")
        ).alias("alpha_frac"),
        F.size(
            F.array_intersect(
                F.col("ws"), F.array(*[F.lit(s) for s in _GOPHER_STOPWORDS])
            )
        ).alias("n_stop_present"),
    )


def _gopher_keep() -> "F.Column":
    """The conjunctive keep over _gopher_measures columns."""
    return (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("n_stop_present") >= 2)
    )


def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021, §A1.1.1) as
    one map-side pass: per-doc word count, mean word length,
    symbol-to-word ratio, alphabetic-word fraction and stopword
    presence, each with its pass flag and the conjunctive keep.

    All JVM higher-order / regexp expressions inside whole-stage
    codegen — no shuffle at all except the final presentation sort;
    at 100 TB this is a pure scan whose output feeds the retention
    filter directly (compare corpus_filter_pipeline)."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    d = _gopher_measures(d.select("doc_id", "text", ws.alias("ws")))
    passes = _gopher_keep()
    return d.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 6).alias("mean_word_len"),
        F.round("symbol_ratio", 6).alias("symbol_ratio"),
        F.round("alpha_frac", 6).alias("alpha_frac"),
        "n_stop_present",
        passes.alias("keep"),
    ).orderBy("doc_id")


TEXT_GOPHER_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
), m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         length(replace(text, ' ', '')) * 1.0 / len(ws) AS mean_word_len,
         (length(text) - length(replace(text, '#', ''))
          + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)) * 1.0 / len(ws)
           AS symbol_ratio,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(ws) AS alpha_frac,
         len(list_intersect(ws, ['the','be','to','of','and','that','have','with']))
           AS n_stop_present
  FROM t
)
SELECT doc_id, CAST(n_words AS INTEGER) AS n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       ROUND(alpha_frac, 6) AS alpha_frac,
       CAST(n_stop_present AS INTEGER) AS n_stop_present,
       (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
         AND symbol_ratio < 0.1 AND alpha_frac >= 0.8 AND n_stop_present >= 2 AS keep
FROM m
ORDER BY doc_id
"""

QUERIES["text_gopher_rules"] = text_gopher_rules
ORACLE["text_gopher_rules"] = TEXT_GOPHER_SQL


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus quality classifier (GPT-3 §2.2 / LLaMA pattern): train a
    logistic-regression filter on cheap per-doc features against the
    Gopher keep flag as the curated label (classifier distillation of
    the rule battery), then score every document.

    Gate surface (VERDICT r9 item 8 — converted from rows-only): one
    audit row whose corpus counts the DuckDB oracle recomputes from
    the SAME Gopher-keep SQL (n_docs, n_pos) plus a planted AUC floor
    the trained scorer must clear — an AUC regression flips
    auc_meets_floor on the Spark side only → hash MISMATCH. The
    per-doc scored frame stays available via
    ``quality_classifier_scores`` (and the trainer is additionally
    property-tested: tests/test_classifier.py — deterministic
    re-train, loss decrease, planted-separable accuracy).

    The TRAINING label is the four Gopher rules that are live on this
    corpus (word count, mean word length, symbol ratio, alpha
    fraction); the stopword-presence rule is excluded because the
    synthetic vocabulary contains no English stopwords — with it the
    label is constant-0 at every SF and the distillation is
    degenerate (r10 audit find: the pre-conversion classifier had
    silently trained on an all-reject label). text_gopher_rules
    still reports the full 5-rule battery.

    Scale shape: the feature battery is CPU-heavy per-row work, so
    the single-partition test parquet is spread first (CLAUDE.md
    rule), then persisted once; each of the 15 GD iterations is one
    scalar agg whose d+1 DECIMAL gradient sums are the only driver
    data (operators/classifier.py). AUC is the Mann-Whitney rank
    statistic: one rank window over the |corpus| scored rows + one
    agg — no pairwise joins. Label = the FULL 5-rule Gopher keep via
    the shared _gopher_measures/_gopher_keep exprs (no drift from
    text_gopher_rules)."""
    scored = quality_classifier_scores(spark, sf_dir)
    # Mann-Whitney AUC via the histogram-CDF house pattern: collapse
    # to the distinct-score histogram (scores are 6dp-rounded), CDF
    # window over histogram-sized data, tie-averaged ranks in exact
    # integers (×2 trick) — never a global rank over raw rows.
    hist = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("label").cast("bigint").alias("p"),
    )
    wcdf = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.select(
        "c",
        "p",
        F.coalesce(F.sum("c").over(wcdf), F.lit(0)).alias("cum_before"),
    )
    # ranks of a tie group are cum_before+1 .. cum_before+c; 2·avg =
    # 2·cum_before + c + 1
    agg = ranked.agg(
        F.sum("c").cast("bigint").alias("n_docs"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("p") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("bigint")
        .alias("possum2x"),
    ).first()
    n, npos = agg["n_docs"], agg["n_pos"]
    nneg = n - npos
    floor = QUALITY_AUC_FLOOR_PPM
    if npos == 0 or nneg == 0:
        # single-class corpus: AUC undefined → vacuous pass (and the
        # oracle's n_pos row catches a label-pipeline regression)
        meets = True
    else:
        # AUC·2·npos·nneg = possum2x − npos(npos+1) — integer-exact
        auc_ppm = (agg["possum2x"] - npos * (npos + 1)) * 1_000_000 // (2 * npos * nneg)
        meets = auc_ppm >= floor
    return spark.createDataFrame(
        [(int(n), int(npos), int(floor), bool(meets))],
        "n_docs bigint, n_pos bigint, auc_floor_ppm bigint, auc_meets_floor boolean",
    )


def _classifier_label() -> "F.Column":
    """The live-rule training label (see quality_classifier): the
    Gopher battery minus the stopword-presence term, which is
    constant-false on this synthetic vocabulary."""
    return (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") >= 0.8)
    )


def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc scored frame (the user surface): (doc_id, label,
    score, pred)."""
    from bireme_spark.operators.classifier import logreg_score, logreg_train

    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    ws = F.split(F.col("text"), " ")
    m = _gopher_measures(d.select("doc_id", "text", ws.alias("ws")))
    feats = m.select(
        "doc_id",
        (F.col("n_words") / 100.0).alias("f_nwords"),
        (F.col("mean_word_len") / 10.0).alias("f_wordlen"),
        F.col("symbol_ratio").alias("f_symbol"),
        F.col("alpha_frac").alias("f_alpha"),
        (F.col("n_stop_present") / 8.0).alias("f_stop"),
        _classifier_label().cast("int").alias("label"),
    )
    cols = ["f_nwords", "f_wordlen", "f_symbol", "f_alpha", "f_stop"]
    feats = feats.persist()
    try:
        w = logreg_train(feats, cols, "label", iters=15, lr=1.0)
        # materialize from cache: the returned plan must survive the
        # unpersist below without re-running the feature battery
        scored_base = feats.localCheckpoint(eager=True)
    finally:
        feats.unpersist()
    score = logreg_score(scored_base, cols, w)
    return scored_base.select(
        "doc_id",
        F.col("label"),
        F.round(score, 6).alias("score"),
        (score >= 0.5).cast("int").alias("pred"),
    ).orderBy("doc_id")


# AUC floor the gate asserts: measured 0.99995-1.0 at every tier
# (the 4-rule label is nearly separable in its own features); 0.90
# leaves regression headroom while any real trainer/feature bug
# (constant scores → AUC 0.5) lands far below.
QUALITY_AUC_FLOOR_PPM = 900_000

QUALITY_CLASSIFIER_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
), m AS (
  SELECT len(ws) AS n_words,
         length(replace(text, ' ', '')) * 1.0 / len(ws) AS mean_word_len,
         (length(text) - length(replace(text, '#', ''))
          + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)) * 1.0 / len(ws)
           AS symbol_ratio,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(ws) AS alpha_frac
  FROM t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN (n_words BETWEEN 50 AND 100000)
                      AND (mean_word_len BETWEEN 3.0 AND 10.0)
                      AND symbol_ratio < 0.1 AND alpha_frac >= 0.8
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       CAST(900000 AS BIGINT) AS auc_floor_ppm,
       TRUE AS auc_meets_floor
FROM m
"""

QUERIES["quality_classifier"] = quality_classifier
ORACLE["quality_classifier"] = QUALITY_CLASSIFIER_SQL


_BLOCKLIST = ("dup", "crash", "leak")


def text_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety/blocklist filtering — the word-list screen every corpus
    pipeline runs before training (C4's badwords pass): per-doc
    occurrence count and distinct-term count against a blocklist,
    plus the keep flag (zero hits).

    Scale: the blocklist is a literal array in the plan (a lexicon
    would broadcast); matching is map-side JVM higher-order exprs
    (filter + array_intersect on the projected token array) inside
    whole-stage codegen — a pure scan, no shuffle, same shape as
    text_gopher_rules."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.split(F.col("text"), " ")
    bl = F.array(*[F.lit(t) for t in _BLOCKLIST])
    d = d.select("doc_id", ws.alias("ws"))
    return (
        d.select(
            "doc_id",
            F.size(F.filter(F.col("ws"), lambda w: F.array_contains(bl, w))).alias(
                "n_hits"
            ),
            F.size(F.array_intersect(F.col("ws"), bl)).alias("n_terms_hit"),
        )
        .withColumn("keep", (F.col("n_hits") == 0))
        .orderBy("doc_id")
    )


_BL_SQL_LIST = "[" + ", ".join(f"'{t}'" for t in _BLOCKLIST) + "]"

TEXT_BLOCKLIST_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
)
SELECT doc_id,
       CAST(len(list_filter(ws, w -> list_contains({_BL_SQL_LIST}, w))) AS INTEGER) AS n_hits,
       CAST(len(list_intersect(ws, {_BL_SQL_LIST})) AS INTEGER) AS n_terms_hit,
       len(list_filter(ws, w -> list_contains({_BL_SQL_LIST}, w))) = 0 AS keep
FROM t
ORDER BY doc_id
"""

QUERIES["text_blocklist_filter"] = text_blocklist_filter
ORACLE["text_blocklist_filter"] = TEXT_BLOCKLIST_SQL


def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal novelty score (memorization/freshness curation
    metric): the fraction of each document's distinct trigrams that
    FIRST appear in that document (no earlier doc_id contains them).
    Early docs score ~1; verbatim re-posts score ~0 — the longitudinal
    complement of text_crossdoc_spans.

    Scale: per-doc shingles dedupe map-side (array_distinct before
    explode); ONE (shingle) shuffle computes the global first-seer
    via min(doc_id) as a window on that same exchange; the per-doc
    novelty fold is a second, doc-keyed agg. Linear in total
    shingles — no self-join."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("ws"))
    n = F.size("ws")
    sh = t.where(n >= 3).select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(ws)-2),"
                    " i -> concat(ws[i-1], ' ', ws[i], ' ', ws[i+1]))"
                )
            )
        ).alias("s"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("s")
    marked = sh.withColumn("first_doc", F.min("doc_id").over(w))
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn(
            "novel_frac", F.round(F.col("n_novel") / F.col("n_shingles"), 6)
        )
        .orderBy("doc_id")
    )


CORPUS_NOVELTY_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(generate_series(1, len(ws) - 2),
                               i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
  FROM t WHERE len(ws) >= 3
),
marked AS (
  SELECT doc_id, s, MIN(doc_id) OVER (PARTITION BY s) AS first_doc FROM sh
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novel_frac
FROM marked GROUP BY doc_id
ORDER BY doc_id
"""

QUERIES["corpus_ngram_novelty"] = corpus_ngram_novelty
ORACLE["corpus_ngram_novelty"] = CORPUS_NOVELTY_SQL


def text_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth curve: cumulative distinct
    vocabulary after each decile of the corpus (docs in doc_id
    order) — sublinear growth is healthy; a linear curve means
    unbounded noise (OCR garbage, random strings).

    Scale design: "distinct tokens in every prefix" is NOT computed
    per prefix (quadratic) — each token contributes ONCE at its
    FIRST-occurrence doc (min doc_id per token, one token-key agg);
    bucketing first-occurrences by corpus decile and one cumulative
    window over the 10-row histogram yields every prefix count
    exactly. Token totals ride the same tokenize pass.
    """
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar for decile edges (driver-side model)
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    decile = (F.floor((F.col("doc_id")) * 10 / F.lit(n_docs)) + 1).cast("int")
    first = toks.groupBy("token").agg(F.min("doc_id").alias("first_doc"))
    vocab_by_dec = (
        first.select((F.floor(F.col("first_doc") * 10 / F.lit(n_docs)) + 1).cast("int").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("new_vocab"))
    )
    tokens_by_dec = (
        toks.select(decile.alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        tokens_by_dec.join(vocab_by_dec, "decile", "left")
        .select(
            "decile",
            F.sum("n_tokens").over(w).alias("cum_tokens"),
            F.sum(F.coalesce("new_vocab", F.lit(0))).over(w).alias("cum_vocab"),
        )
        .orderBy("decile")
    )


HEAPS_LAW_SQL = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
tok AS (SELECT doc_id, token FROM toks WHERE token <> ''),
first AS (SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY 1),
vocab_by_dec AS (
  SELECT CAST(FLOOR(first_doc * 10.0 / n.n_docs) + 1 AS INTEGER) AS decile,
         COUNT(*) AS new_vocab
  FROM first CROSS JOIN n GROUP BY 1
),
tokens_by_dec AS (
  SELECT CAST(FLOOR(doc_id * 10.0 / n.n_docs) + 1 AS INTEGER) AS decile,
         COUNT(*) AS n_tokens
  FROM tok CROSS JOIN n GROUP BY 1
)
SELECT t.decile,
       CAST(SUM(t.n_tokens) OVER (ORDER BY t.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
       CAST(SUM(COALESCE(v.new_vocab, 0)) OVER (ORDER BY t.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
FROM tokens_by_dec t LEFT JOIN vocab_by_dec v ON t.decile = v.decile
ORDER BY t.decile
"""

QUERIES["text_heaps_law"] = text_heaps_law
ORACLE["text_heaps_law"] = HEAPS_LAW_SQL


def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving-average type-token ratio (MATTR, Covington & McFall
    2010), window W=20: per document, the mean over all 20-token
    windows of (distinct tokens in window)/20 — the length-unbiased
    lexical-diversity measure (plain TTR shrinks with doc length, so
    corpus filters that threshold on it systematically bias against
    long docs). Reported per source as integer-ppm distribution
    stats.

    Engine-exact AND O(tokens): instead of materializing the
    tokens×W window expansion, each token's contribution is counted
    in closed form — token at position q with previous same-word
    occurrence q' is the window-first occurrence for exactly the
    windows p ∈ [max(q−W+1, q'+1, 1), min(q, L−W+1)] — so Σ(window
    distinct counts) is ONE lag window + an integer-clamp sum, and
    MATTR is emitted as truncating integer ppm (DIV == //), never a
    divided double.

    Scale: tokenize once, one (doc,word) lag partition, one doc agg,
    one source agg — all map-side-combinable; no W-fold fan-out at
    any scale."""
    W = 20
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", "source", F.posexplode(F.split("text", " ")).alias("p", "w"))
        .select("doc_id", "source", (F.col("p") + 1).alias("q"), "w")
        .where(F.col("w") != "")
    )
    wlen = Window.partitionBy("doc_id")
    wprev = Window.partitionBy("doc_id", "w").orderBy("q")
    t = toks.select(
        "doc_id",
        "source",
        "q",
        F.max("q").over(wlen).alias("len"),
        F.coalesce(F.lag("q").over(wprev), F.lit(0)).alias("prev"),
    ).where(F.col("len") >= W)
    contrib = F.greatest(
        F.lit(0),
        F.least(F.col("q"), F.col("len") - W + 1)
        - F.greatest(F.col("q") - W + 1, F.col("prev") + 1, F.lit(1))
        + 1,
    )
    per_doc = t.groupBy("doc_id", "source").agg(
        F.sum(contrib).alias("sd"), F.max("len").alias("len")
    )
    ppm = F.expr(f"sd * 1000000 DIV ({W} * (len - {W} + 1))")
    docs = per_doc.select("source", ppm.alias("mattr_ppm"))
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("mattr_ppm").alias("avg_mattr_ppm"),
            F.min("mattr_ppm").alias("min_mattr_ppm"),
            F.max("mattr_ppm").alias("max_mattr_ppm"),
        )
        .orderBy("source")
    )


TEXT_MATTR_SQL = """
WITH toks AS (
  SELECT doc_id, source, ws[q] AS w, q
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       UNNEST(range(1, len(ws) + 1)) AS t(q)
  WHERE ws[q] <> ''
),
t AS (
  SELECT doc_id, source, q,
         MAX(q) OVER (PARTITION BY doc_id) AS len,
         COALESCE(LAG(q) OVER (PARTITION BY doc_id, w ORDER BY q), 0) AS prev
  FROM toks
),
per_doc AS (
  SELECT doc_id, source,
         SUM(GREATEST(0, LEAST(q, len - 19) - GREATEST(q - 19, prev + 1, 1) + 1)) AS sd,
         MAX(len) AS len
  FROM t WHERE len >= 20
  GROUP BY 1, 2
),
docs AS (
  SELECT source, sd * 1000000 // (20 * (len - 19)) AS mattr_ppm FROM per_doc
)
SELECT source, COUNT(*) AS n_docs,
       AVG(mattr_ppm) AS avg_mattr_ppm,
       CAST(MIN(mattr_ppm) AS BIGINT) AS min_mattr_ppm,
       CAST(MAX(mattr_ppm) AS BIGINT) AS max_mattr_ppm
FROM docs GROUP BY 1 ORDER BY 1
"""

QUERIES["text_mattr_diversity"] = text_mattr_diversity
ORACLE["text_mattr_diversity"] = TEXT_MATTR_SQL


def text_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive-Bayes language classifier trained and
    evaluated on the corpus (add-one smoothing; McCallum & Nigam
    1998): P(lang|doc) ∝ P(lang)·Π P(w|lang)^tf — the one-pass
    counting classifier that needs no gradient loop (contrast
    quality_classifier's logistic GD), and the standard fast lang-id
    / topic-routing baseline for corpus pipelines. Reports per-class
    self-classification accuracy as integer ppm plus the confusion
    diagonal.

    Engine-exact: log-likelihood weights ln((c+1)/(T+V)) and log
    priors are 6dp-rounded DECIMALs (transcendental discipline);
    per-doc scores are exact DECIMAL dot products (integer tf ×
    decimal weight), and argmax breaks ties on lang ASC via
    row_number — no floats in the ranking path.

    Scale: ONE tokenize + one (doc,word) tf agg (corpus-sized, both
    map-side-combinable); the model is vocab×langs (model-sized,
    broadcast); scoring joins tf to the model on the word hash.
    Nothing driver-sided."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", "lang", F.explode(F.split("text", " ")).alias("w"))
        .where(F.col("w") != "")
    )
    tf = toks.groupBy("doc_id", "lang", "w").agg(F.count(F.lit(1)).alias("tf"))
    clw = tf.groupBy("lang", "w").agg(F.sum("tf").alias("c"))
    tl = clw.groupBy("lang").agg(F.sum("c").alias("t"))
    words = clw.select("w").distinct()
    vocab = words.agg(F.count(F.lit(1)).alias("v"))
    dl = d.groupBy("lang").agg(F.count(F.lit(1)).alias("d_l"))
    dtot = d.agg(F.count(F.lit(1)).alias("d_tot"))
    dense = (
        tl.crossJoin(F.broadcast(words))
        .join(clw, ["lang", "w"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cand"),
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("t") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("lw"),
        )
    )
    prior = dl.crossJoin(F.broadcast(dtot)).select(
        F.col("lang").alias("cand"),
        F.round(
            F.log(F.col("d_l").cast("double") / F.col("d_tot").cast("double")), 6
        )
        .cast("decimal(18,6)")
        .alias("lp"),
    )
    scores = (
        tf.join(dense, "w")
        .groupBy("doc_id", "lang", "cand")
        .agg(F.sum(F.col("tf") * F.col("lw")).alias("ll"))
        .join(prior, "cand")
        .select("doc_id", "lang", "cand", (F.col("ll") + F.col("lp")).alias("score"))
    )
    wr = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cand").asc())
    pred = scores.withColumn("rn", F.row_number().over(wr)).where(F.col("rn") == 1)
    return (
        pred.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("cand") == F.col("lang"), 1).otherwise(0)).alias(
                "n_correct"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_correct",
            F.expr("n_correct * 1000000 DIV n_docs").alias("accuracy_ppm"),
        )
        .orderBy("lang")
    )


TEXT_NAIVE_BAYES_SQL = """
WITH toks AS (
  SELECT doc_id, lang, UNNEST(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, lang, w, COUNT(*) AS tf FROM toks WHERE w <> '' GROUP BY 1, 2, 3
),
clw AS (SELECT lang, w, SUM(tf) AS c FROM tf GROUP BY 1, 2),
tl AS (SELECT lang, SUM(c) AS t FROM clw GROUP BY 1),
words AS (SELECT DISTINCT w FROM clw),
vocab AS (SELECT COUNT(*) AS v FROM words),
dl AS (SELECT lang, COUNT(*) AS d_l FROM documents GROUP BY 1),
dtot AS (SELECT COUNT(*) AS d_tot FROM documents),
dense AS (
  SELECT tl.lang AS cand, words.w,
         CAST(ROUND(LN(CAST(COALESCE(clw.c, 0) + 1 AS DOUBLE)
                       / CAST(tl.t + vocab.v AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lw
  FROM tl CROSS JOIN words
  LEFT JOIN clw ON clw.lang = tl.lang AND clw.w = words.w
  CROSS JOIN vocab
),
prior AS (
  SELECT dl.lang AS cand,
         CAST(ROUND(LN(CAST(dl.d_l AS DOUBLE) / CAST(dtot.d_tot AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS lp
  FROM dl CROSS JOIN dtot
),
scores AS (
  SELECT tf.doc_id, tf.lang, d.cand, SUM(tf.tf * d.lw) + MAX(p.lp) AS score
  FROM tf JOIN dense d ON d.w = tf.w
  JOIN prior p ON p.cand = d.cand
  GROUP BY 1, 2, 3
),
pred AS (
  SELECT doc_id, lang, cand FROM (
    SELECT doc_id, lang, cand,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rn
    FROM scores
  ) t WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN cand = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(SUM(CASE WHEN cand = lang THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS accuracy_ppm
FROM pred GROUP BY 1 ORDER BY 1
"""

QUERIES["text_naive_bayes"] = text_naive_bayes
ORACLE["text_naive_bayes"] = TEXT_NAIVE_BAYES_SQL


def text_word_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word burstiness by Fano factor (Church & Gale 1995): for each
    vocabulary word, variance-to-mean ratio of its per-document count
    across ALL documents (zeros included) — bursty content words
    (Fano ≫ 1, clumping into few docs) versus evenly-spread function
    words (Fano ≈ 1, Poisson-like); the signal behind burstiness-
    aware TF weighting and stopword induction. Top-20 burstiest
    words with corpus count ≥ 100.

    Engine-exact: Fano = (D·Σtf² − T²)/(D·T) over integer sufficient
    statistics (zero docs contribute nothing to Σtf or Σtf², so only
    occurrence rows are touched) — emitted as truncating integer ppm
    (DIV == //), ties on the word.

    Scale: ONE tokenize + one (doc,word) tf agg + one word agg —
    all map-side-combinable; D rides in a broadcast scalar."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dtot = d.agg(F.count(F.lit(1)).alias("n_docs"))
    per_w = (
        tf.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("n_docs_with"),
            F.sum("tf").alias("t"),
            F.sum(F.col("tf") * F.col("tf")).alias("t2"),
        )
        .where(F.col("t") >= 100)
        .crossJoin(F.broadcast(dtot))
    )
    return (
        per_w.select(
            "w",
            F.col("t").alias("corpus_count"),
            "n_docs_with",
            F.expr("(n_docs * t2 - t * t) * 1000000 DIV (n_docs * t)").alias(
                "fano_ppm"
            ),
        )
        .orderBy(F.col("fano_ppm").desc(), F.col("w").asc())
        .limit(20)
    )


TEXT_BURSTINESS_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks WHERE w <> '' GROUP BY 1, 2
),
dtot AS (SELECT COUNT(*) AS n_docs FROM documents),
per_w AS (
  SELECT w, COUNT(*) AS n_docs_with,
         CAST(SUM(tf) AS BIGINT) AS t,
         CAST(SUM(tf * tf) AS BIGINT) AS t2
  FROM tf GROUP BY 1 HAVING CAST(SUM(tf) AS BIGINT) >= 100
)
SELECT w, t AS corpus_count, n_docs_with,
       CAST((d.n_docs * t2 - t * t) * 1000000 // (d.n_docs * t) AS BIGINT) AS fano_ppm
FROM per_w CROSS JOIN dtot d
ORDER BY fano_ppm DESC, w ASC
LIMIT 20
"""

QUERIES["text_word_burstiness"] = text_word_burstiness
ORACLE["text_word_burstiness"] = TEXT_BURSTINESS_SQL


# ---------------------------------------------------------------------------
# text_quality_calibration — reliability of the quality score vs Gopher keep
# ---------------------------------------------------------------------------


def text_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram of the cheap quality score against the
    Gopher keep flag: decile-bin the score, compare each bin's mean
    predicted quality with its empirical keep rate, and emit the
    per-bin |gap| — the Expected Calibration Error decomposition
    (Guo et al. 2017) a pipeline runs before trusting a scalar
    score as a retention probability. Reuses the EXACT production
    rules (``_gopher_measures``/``_gopher_keep`` and
    ``functions.text.quality_score``) so the audit cannot drift from
    the filters it audits.

    Determinism: the score is one IEEE chain over exact integers
    (identical both engines); bin = FLOOR(q*10) (bit-deterministic
    on identical doubles); all bin stats are integer ppm via DIV.

    Scale: one map-side pass + a 10-row aggregate; no shuffle
    beyond it."""
    d = load_table(spark, sf_dir, "documents")
    m = _gopher_measures(
        d.select("doc_id", "text", F.split("text", " ").alias("ws"))
    ).select(
        "doc_id",
        _gopher_keep().cast("int").alias("keep"),
        T.quality_score(F.col("text")).alias("q"),
    )
    binned = m.select(
        F.expr("LEAST(9, CAST(FLOOR(q * 10) AS INT))").alias("bin"),
        "keep",
        F.expr("CAST(FLOOR(q * 1000000) AS BIGINT)").alias("q_e6"),
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("keep").cast("bigint").alias("n_keep"),
            F.sum("q_e6").alias("q_sum_e6"),
        )
        .select(
            "bin",
            "n_docs",
            F.expr("CAST(q_sum_e6 DIV n_docs AS BIGINT)").alias("mean_pred_ppm"),
            F.expr("CAST(n_keep * 1000000 DIV n_docs AS BIGINT)").alias(
                "keep_rate_ppm"
            ),
            F.expr(
                "CAST(ABS(q_sum_e6 DIV n_docs - n_keep * 1000000 DIV n_docs)"
                " AS BIGINT)"
            ).alias("abs_gap_ppm"),
        )
        .orderBy("bin")
    )


TEXT_QUALITY_CALIBRATION_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
), m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         length(replace(text, ' ', '')) * 1.0 / len(ws) AS mean_word_len,
         (length(text) - length(replace(text, '#', ''))
          + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT)) * 1.0 / len(ws)
           AS symbol_ratio,
         len(list_filter(ws, w -> regexp_matches(w, '[a-z]'))) * 1.0 / len(ws) AS alpha_frac,
         len(list_intersect(ws, ['the','be','to','of','and','that','have','with']))
           AS n_stop_present,
         CAST(len(list_filter(ws, x -> x IN {_STOP_SQL})) AS DOUBLE) AS n_stop,
         CAST(len(ws) AS DOUBLE) AS n_tokens
  FROM t
), s AS (
  SELECT CASE WHEN (n_words BETWEEN 50 AND 100000)
                   AND (mean_word_len BETWEEN 3.0 AND 10.0)
                   AND symbol_ratio < 0.1 AND alpha_frac >= 0.8
                   AND n_stop_present >= 2 THEN 1 ELSE 0 END AS keep,
         LEAST(1.0, n_tokens / 400.0) * (1.0 - n_stop / n_tokens) AS q
  FROM m
), b AS (
  SELECT LEAST(9, CAST(FLOOR(q * 10) AS INTEGER)) AS bin, keep,
         CAST(FLOOR(q * 1000000) AS BIGINT) AS q_e6
  FROM s
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q_e6) // COUNT(*) AS BIGINT) AS mean_pred_ppm,
       CAST(SUM(keep) * 1000000 // COUNT(*) AS BIGINT) AS keep_rate_ppm,
       CAST(ABS(SUM(q_e6) // COUNT(*) - SUM(keep) * 1000000 // COUNT(*))
            AS BIGINT) AS abs_gap_ppm
FROM b GROUP BY bin ORDER BY bin
"""

QUERIES["text_quality_calibration"] = text_quality_calibration
ORACLE["text_quality_calibration"] = TEXT_QUALITY_CALIBRATION_SQL


# ---------------------------------------------------------------------------
# text_rake_keywords — stopword-delimited phrase keyword extraction
# ---------------------------------------------------------------------------


def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): phrases are
    maximal stopword-free token runs (the house stoplist delimits),
    each content word scores degree/frequency where degree sums the
    lengths of every phrase containing it — words that live in long
    multi-word phrases outrank bare frequent words. Top-20 by exact
    integer score (degree*1e6 DIV freq), min frequency 3.

    Exactness: phrase ids are cumulative stopword counts (per-doc
    prefix window over exact integers); degree/freq are integer
    sums; the score is integer floor-division — nothing floats.

    Scale: ONE tokenize pass, one per-doc window (co-partitioned
    with the explode's doc_id shuffle), one word-level agg; top-20
    is a TakeOrdered, never a global sort."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("ws")
    )
    toks = d.select(
        "doc_id", F.posexplode("ws").alias("pos", "tok")
    ).select(
        "doc_id", "pos", "tok", F.col("tok").isin("a", "the").cast("int").alias("stop")
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ph = toks.select(
        "doc_id", "tok", "stop", F.sum("stop").over(w).alias("phrase_id")
    ).where(F.col("stop") == 0)
    plen = ph.groupBy("doc_id", "phrase_id").agg(
        F.count(F.lit(1)).alias("phrase_len")
    )
    occ = ph.join(plen, ["doc_id", "phrase_id"])
    scored = occ.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq"),
        F.sum("phrase_len").cast("bigint").alias("degree"),
    )
    return (
        scored.where(F.col("freq") >= 3)
        .select(
            F.col("tok").alias("word"),
            "freq",
            "degree",
            F.expr("degree * 1000000 DIV freq").alias("score_e6"),
        )
        .orderBy(F.col("score_e6").desc(), F.col("word"))
        .limit(20)
    )


TEXT_RAKE_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id,
         CAST(generate_subscripts(ws, 1) AS INTEGER) AS pos,
         unnest(ws) AS tok
  FROM t
),
marked AS (
  SELECT doc_id, pos, tok,
         CASE WHEN tok IN ('a', 'the') THEN 1 ELSE 0 END AS stop
  FROM toks
),
ph AS (
  SELECT doc_id, tok, stop,
         SUM(stop) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM marked
),
content AS (SELECT doc_id, tok, phrase_id FROM ph WHERE stop = 0),
plen AS (
  SELECT doc_id, phrase_id, COUNT(*) AS phrase_len
  FROM content GROUP BY 1, 2
),
occ AS (
  SELECT c.tok, p.phrase_len
  FROM content c JOIN plen p USING (doc_id, phrase_id)
),
scored AS (
  SELECT tok AS word, CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(phrase_len) AS BIGINT) AS degree
  FROM occ GROUP BY 1
)
SELECT word, freq, degree,
       CAST(degree * 1000000 // freq AS BIGINT) AS score_e6
FROM scored WHERE freq >= 3
ORDER BY score_e6 DESC, word
LIMIT 20
"""

QUERIES["text_rake_keywords"] = text_rake_keywords
ORACLE["text_rake_keywords"] = TEXT_RAKE_SQL


# ---------------------------------------------------------------------------
# corpus_length_bias_audit — does the filter battery bias against length?
# ---------------------------------------------------------------------------


def corpus_length_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bias audit of the Gopher keep rule: per length decile
    (n_chars, REFERENCE deciles via the house histogram-CDF), the
    empirical keep rate and its lift vs the corpus-wide rate — the
    selection-bias check a pipeline runs before trusting a filter
    battery (a length-correlated filter silently skews the training
    distribution; Gopher's own 50-word floor SHOULD show up in
    decile 0, which is the point).

    All-integer: deciles cut on the n_chars value histogram (bounded
    by the value range), keep rates and lifts in ppm via DIV.

    Scale: one map-side keep-flag pass collapses to (n_chars, keep)
    cells; the CDF window runs on the value histogram; the rollup is
    10 rows."""
    d = load_table(spark, sf_dir, "documents")
    m = _gopher_measures(
        d.select("doc_id", "text", F.split("text", " ").alias("ws"), "n_chars")
    ).select("n_chars", _gopher_keep().cast("int").alias("keep"))
    cells = m.groupBy("n_chars", "keep").agg(F.count(F.lit(1)).alias("cnt"))
    vals = cells.groupBy("n_chars").agg(F.sum("cnt").alias("vcnt"))
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    binned = vals.select(
        "n_chars",
        F.sum("vcnt").over(w).alias("cum"),
        F.sum("vcnt").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n_tot"),
    ).select("n_chars", F.expr("(cum - 1) * 10 DIV n_tot").alias("bin"))
    j = cells.join(binned, "n_chars")
    tot = j.agg(
        F.sum("cnt").alias("g_n"), F.sum(F.expr("keep * cnt")).alias("g_keep")
    )
    return (
        j.groupBy("bin")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            F.sum(F.expr("keep * cnt")).cast("bigint").alias("n_keep"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("bin").cast("int").alias("decile"),
            "n_docs",
            "min_chars",
            "max_chars",
            F.expr("CAST(n_keep * 1000000 DIV n_docs AS BIGINT)").alias(
                "keep_rate_ppm"
            ),
            # GREATEST(...,1): a corpus where NOTHING passes the keep
            # (sf0.001 does this) must yield lift 0, not divide-by-zero
            F.expr(
                "CAST((n_keep * 1000000 DIV n_docs) * 1000000"
                " DIV GREATEST(g_keep * 1000000 DIV g_n, 1) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy("decile")
    )


CORPUS_LENGTH_BIAS_SQL = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS ws, n_chars FROM documents
), m AS (
  SELECT n_chars,
         CASE WHEN (len(ws) BETWEEN 50 AND 100000)
                   AND (length(replace(text, ' ', '')) * 1.0 / len(ws)
                        BETWEEN 3.0 AND 10.0)
                   AND ((length(text) - length(replace(text, '#', ''))
                         + CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT))
                        * 1.0 / len(ws)) < 0.1
                   AND (len(list_filter(ws, w -> regexp_matches(w, '[a-z]')))
                        * 1.0 / len(ws)) >= 0.8
                   AND len(list_intersect(ws,
                        ['the','be','to','of','and','that','have','with'])) >= 2
              THEN 1 ELSE 0 END AS keep
  FROM t
),
cells AS (SELECT n_chars, keep, COUNT(*) AS cnt FROM m GROUP BY 1, 2),
vals AS (SELECT n_chars, SUM(cnt) AS vcnt FROM cells GROUP BY 1),
binned AS (
  SELECT n_chars,
         (SUM(vcnt) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) - 1) * 10
           // (SUM(vcnt) OVER ()) AS bin
  FROM vals
),
j AS (SELECT c.*, b.bin FROM cells c JOIN binned b USING (n_chars)),
tot AS (
  SELECT SUM(cnt) AS g_n, SUM(keep * cnt) AS g_keep FROM j
)
SELECT CAST(bin AS INTEGER) AS decile,
       CAST(SUM(cnt) AS BIGINT) AS n_docs,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars,
       CAST(SUM(keep * cnt) * 1000000 // SUM(cnt) AS BIGINT) AS keep_rate_ppm,
       CAST((SUM(keep * cnt) * 1000000 // SUM(cnt)) * 1000000
            // GREATEST(MAX(g_keep) * 1000000 // MAX(g_n), 1) AS BIGINT) AS lift_ppm
FROM j, tot
GROUP BY bin ORDER BY decile
"""

QUERIES["corpus_length_bias_audit"] = corpus_length_bias_audit
ORACLE["corpus_length_bias_audit"] = CORPUS_LENGTH_BIAS_SQL


_BURROWS_K = 15


def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta (Burrows 2002) between document sources: the
    standard stylometric / authorship-attribution distance — for the
    K=15 most frequent corpus words, each source's rate standardizes
    across sources and Delta(s1, s2) = mean_w |z1 − z2|. Emits the 10
    most similar source pairs (smallest Delta) — the duplicate-origin
    / sockpuppet screen a provenance audit runs on a training corpus.

    Engine-exact: per-source word rates are integer ppm (cnt·1e6 DIV
    total tokens) on a full source×word grid (missing cells = 0);
    the per-word spread stays the INTEGER n·Σf² − (Σf)² so
    |z1 − z2| = |f1 − f2|·n / sqrt(D_w) is one IEEE sqrt + division
    of identical integers per term, e6-rounded per term (the
    transcendental discipline; sqrt of an irrational never ties);
    Delta_e6 is an integer DIV-mean of the K terms.

    Scale: one tokenize pass → (source, word) counts; the grid is
    |sources|·K cells; pair formation is grid², bounded by the
    source cardinality, never by corpus size."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    counts = d.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    top = (
        counts.groupBy("tok").agg(F.sum("c").alias("cc"))
        .orderBy(F.desc("cc"), F.asc("tok"))
        .limit(_BURROWS_K)
        .select("tok")
    )
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            F.expr("COALESCE(c, 0) * 1000000 DIV tot").alias("f"),
        )
    )
    stats = grid.groupBy("tok").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("f").alias("sf"),
        F.sum(F.expr("f * f")).alias("sff"),
    )
    g = grid.join(stats, "tok")
    a = g.select(
        F.col("source").alias("sa"), "tok", F.col("f").alias("fa"), "n", "sf", "sff"
    )
    b = g.select(F.col("source").alias("sb"), F.col("tok").alias("tok2"), F.col("f").alias("fb"))
    terms = (
        a.join(b, (a.tok == b.tok2) & (a.sa < b.sb))
        .select(
            "sa",
            "sb",
            F.expr(
                "CAST(ROUND(ABS(fa - fb) * CAST(n AS DOUBLE)"
                " / SQRT(CAST(n * sff - sf * sf AS DOUBLE)) * 1000000, 0) AS BIGINT)"
            ).alias("t_e6"),
        )
    )
    return (
        terms.groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(F.expr(f"CAST(SUM(t_e6) DIV {_BURROWS_K} AS BIGINT)").alias("delta_e6"))
        .orderBy(F.asc("delta_e6"), "source_a", "source_b")
        .limit(10)
    )


TEXT_BURROWS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
),
totals AS (SELECT source, SUM(c) AS tot FROM counts GROUP BY 1),
top AS (
  SELECT tok FROM counts GROUP BY tok
  ORDER BY SUM(c) DESC, tok LIMIT {_BURROWS_K}
),
grid AS (
  SELECT t.source, w.tok, COALESCE(c.c, 0) * 1000000 // t.tot AS f
  FROM totals t CROSS JOIN top w
  LEFT JOIN counts c ON c.source = t.source AND c.tok = w.tok
),
stats AS (
  SELECT tok, COUNT(*) AS n, SUM(f) AS sf, SUM(f * f) AS sff FROM grid GROUP BY 1
),
terms AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(ROUND(ABS(a.f - b.f) * CAST(s.n AS DOUBLE)
              / SQRT(CAST(s.n * s.sff - s.sf * s.sf AS DOUBLE)) * 1000000, 0)
              AS BIGINT) AS t_e6
  FROM grid a
  JOIN grid b ON a.tok = b.tok AND a.source < b.source
  JOIN stats s ON s.tok = a.tok
)
SELECT sa AS source_a, sb AS source_b,
       CAST(SUM(t_e6) // {_BURROWS_K} AS BIGINT) AS delta_e6
FROM terms GROUP BY 1, 2
ORDER BY delta_e6 ASC, source_a, source_b
LIMIT 10
"""

QUERIES["text_burrows_delta"] = text_burrows_delta
ORACLE["text_burrows_delta"] = TEXT_BURROWS_SQL


def text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence of each source's word distribution
    from the corpus distribution — the symmetric, bounded (≤ ln 2)
    drift score a corpus-curation pipeline tracks per provider: a
    source whose JSD jumps is feeding different text than the rest
    (the distributional sibling of text_burrows_delta's stylometric
    z-profile). One row per source, ascending JSD.

    Engine-exact: both distributions are integer ppm (cnt·1e6 DIV
    total); every p·ln(p/m) term (m the midpoint) e6-rounds before
    the exact BIGINT sum (the entropy-family discipline); zero-count
    words contribute only their q-side term. JSD_e6 = (Σp + Σq) DIV 2.

    Scale: one tokenize pass → (source, word) counts; the term table
    is |sources|·|vocab| cells on the full grid."""
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    counts = d.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    corpus = counts.groupBy("tok").agg(F.sum("c").alias("cc"))
    ctot = corpus.agg(F.sum("cc").alias("ct"))
    grid = (
        totals.crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(ctot))
        .join(counts, ["source", "tok"], "left")
        .select(
            "source",
            "tot",
            F.expr("COALESCE(c, 0) * 1000000 DIV tot").alias("p_ppm"),
            F.expr("cc * 1000000 DIV ct").alias("q_ppm"),
        )
    )
    terms = grid.select(
        "source",
        "tot",
        F.expr(
            "CASE WHEN p_ppm > 0 THEN CAST(ROUND((p_ppm / 1000000.0)"
            " * LN(CAST(2 AS DOUBLE) * p_ppm / (p_ppm + q_ppm)) * 1000000, 0)"
            " AS BIGINT) ELSE 0 END"
        ).alias("tp_e6"),
        F.expr(
            "CASE WHEN q_ppm > 0 THEN CAST(ROUND((q_ppm / 1000000.0)"
            " * LN(CAST(2 AS DOUBLE) * q_ppm / (p_ppm + q_ppm)) * 1000000, 0)"
            " AS BIGINT) ELSE 0 END"
        ).alias("tq_e6"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("tot").cast("bigint").alias("n_tokens"),
            F.expr("CAST((SUM(tp_e6) + SUM(tq_e6)) DIV 2 AS BIGINT)").alias("jsd_e6"),
        )
        .orderBy("jsd_e6", "source")
    )


TEXT_JSD_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
),
counts AS (
  SELECT source, tok, COUNT(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
),
totals AS (SELECT source, SUM(c) AS tot FROM counts GROUP BY 1),
corpus AS (SELECT tok, SUM(c) AS cc FROM counts GROUP BY 1),
ctot AS (SELECT SUM(cc) AS ct FROM corpus),
grid AS (
  SELECT t.source, t.tot,
         COALESCE(c.c, 0) * 1000000 // t.tot AS p_ppm,
         w.cc * 1000000 // x.ct AS q_ppm
  FROM totals t CROSS JOIN corpus w CROSS JOIN ctot x
  LEFT JOIN counts c ON c.source = t.source AND c.tok = w.tok
),
terms AS (
  SELECT source, tot,
         CASE WHEN p_ppm > 0 THEN CAST(ROUND((p_ppm / 1000000.0)
              * LN(CAST(2 AS DOUBLE) * p_ppm / (p_ppm + q_ppm)) * 1000000, 0)
              AS BIGINT) ELSE 0 END AS tp_e6,
         CASE WHEN q_ppm > 0 THEN CAST(ROUND((q_ppm / 1000000.0)
              * LN(CAST(2 AS DOUBLE) * q_ppm / (p_ppm + q_ppm)) * 1000000, 0)
              AS BIGINT) ELSE 0 END AS tq_e6
  FROM grid
)
SELECT source, CAST(MAX(tot) AS BIGINT) AS n_tokens,
       CAST((SUM(tp_e6) + SUM(tq_e6)) // 2 AS BIGINT) AS jsd_e6
FROM terms GROUP BY source
ORDER BY jsd_e6, source
"""

QUERIES["text_js_divergence"] = text_js_divergence
ORACLE["text_js_divergence"] = TEXT_JSD_SQL


def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch–Kincaid readability per source (Kincaid et al. 1975;
    the length/complexity screen a curation pipeline runs next to
    text_quality_score): per doc, words = whitespace tokens,
    syllables = vowel-group runs ('[aeiou]+' matches — the standard
    dictionary-free heuristic), sentences = 1 (the corpus is
    unpunctuated single-segment text; the formula degrades to
    words-per-doc as sentence length, documented precondition).
    Emits per-source doc counts, mean words, mean syllables/word and
    the mean FK grade, plus how many docs land in the 'hard' band
    (grade > 14).

    Engine-exact: word/syllable counts are integers (regexp_count vs
    len(regexp_extract_all) — same regex, same semantics); each
    per-doc ratio and grade rounds to 6dp BEFORE the per-source
    DECIMAL sum (the house Σ-of-doubles discipline); final means are
    one IEEE division each.

    Scale: one projection computes both counts map-side; ONE source-
    key aggregation; no window, no shuffle beyond the group-by."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "source",
        T.token_count(F.col("text")).alias("w"),
        F.regexp_count(F.col("text"), F.lit("[aeiou]+")).alias("syl"),
    ).select(
        "source",
        "w",
        F.round(F.col("syl").cast("double") / F.col("w").cast("double"), 6).alias("spw"),
    )
    grade = F.round(
        F.lit(0.39) * F.col("w").cast("double")
        + F.lit(11.8) * F.col("spw")
        - F.lit(15.59),
        6,
    )
    per = per.withColumn("grade", grade)
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("w").cast("bigint").alias("total_words"),
            (
                F.sum(F.col("spw").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_syll_per_word"),
            (
                F.sum(F.col("grade").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_fk_grade"),
            F.sum(F.when(F.col("grade") > 14, 1).otherwise(0))
            .cast("bigint")
            .alias("n_hard_docs"),
        )
        .orderBy("source")
    )


TEXT_READABILITY_SQL = """
WITH per AS (
  SELECT source,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS w,
         CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER) AS syl
  FROM documents
),
g AS (
  SELECT source, w,
         ROUND(CAST(syl AS DOUBLE) / CAST(w AS DOUBLE), 6) AS spw
  FROM per
),
sc AS (
  SELECT source, w, spw,
         ROUND(0.39 * CAST(w AS DOUBLE) + 11.8 * spw - 15.59, 6) AS grade
  FROM g
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(w) AS BIGINT) AS total_words,
       CAST(SUM(CAST(spw AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_syll_per_word,
       CAST(SUM(CAST(grade AS DECIMAL(28,6))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_fk_grade,
       CAST(SUM(CASE WHEN grade > 14 THEN 1 ELSE 0 END) AS BIGINT) AS n_hard_docs
FROM sc GROUP BY source ORDER BY source
"""

QUERIES["text_readability"] = text_readability
ORACLE["text_readability"] = TEXT_READABILITY_SQL


def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language (tokens emitted per whitespace
    word — the multilingual-tokenizer audit metric: fertility ≫ 1
    means a language pays more sequence length per word, skewing
    mixing ratios and effective epochs): BPE-ish regex tokens
    ('[a-z]+' alphabetic runs) over whitespace words, aggregated per
    `lang`, with the doc-level p95 fertility as the tail indicator.

    Engine-exact: both counts are integers from the same regex; the
    corpus fertility is ONE IEEE division of exact BIGINT sums; the
    p95 is an exact order statistic over e6-quantized per-doc
    fertilities (histogram-CDF, min value with cum ≥ 0.95·n — never
    an interpolating percentile).

    Scale: one map-side projection; one lang-key agg; the CDF window
    runs on the (lang, fertility_e6) histogram, not raw docs."""
    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        T.token_count(F.col("text")).alias("w"),
        T.regex_token_count(F.col("text")).alias("t"),
    ).withColumn(
        "f_e6",
        F.expr("CAST(t AS BIGINT) * 1000000 DIV CAST(w AS BIGINT)"),
    )
    hist = per.groupBy("lang", "f_e6").agg(F.count(F.lit(1)).alias("cnt"))
    wcum = Window.partitionBy("lang").orderBy("f_e6")
    wtot = Window.partitionBy("lang")
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(wcum.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("tot", F.sum("cnt").over(wtot))
    p95 = cum.where(F.col("cum") * 20 >= F.col("tot") * 19).groupBy("lang").agg(
        F.min("f_e6").alias("p95_fertility_e6")
    )
    agg = per.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("total_words"),
        F.sum("t").cast("bigint").alias("total_tokens"),
    )
    return (
        agg.join(p95, "lang")
        .select(
            "lang",
            "n_docs",
            "total_words",
            "total_tokens",
            F.round(
                F.col("total_tokens").cast("double") / F.col("total_words").cast("double"),
                6,
            ).alias("fertility"),
            "p95_fertility_e6",
        )
        .orderBy("lang")
    )


TEXT_FERTILITY_SQL = """
WITH per AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
         CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS t
  FROM documents
),
q AS (SELECT lang, w, t, t * 1000000 // w AS f_e6 FROM per),
hist AS (SELECT lang, f_e6, COUNT(*) AS cnt FROM q GROUP BY 1, 2),
cum AS (
  SELECT lang, f_e6,
         SUM(cnt) OVER (PARTITION BY lang ORDER BY f_e6
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY lang) AS tot
  FROM hist
),
p95 AS (
  SELECT lang, MIN(f_e6) AS p95_fertility_e6
  FROM cum WHERE cum * 20 >= tot * 19 GROUP BY lang
),
agg AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS total_words,
         CAST(SUM(t) AS BIGINT) AS total_tokens
  FROM q GROUP BY lang
)
SELECT a.lang, a.n_docs, a.total_words, a.total_tokens,
       ROUND(CAST(a.total_tokens AS DOUBLE) / CAST(a.total_words AS DOUBLE), 6) AS fertility,
       p.p95_fertility_e6
FROM agg a JOIN p95 p ON p.lang = a.lang
ORDER BY a.lang
"""

QUERIES["text_tokenizer_fertility"] = text_tokenizer_fertility
ORACLE["text_tokenizer_fertility"] = TEXT_FERTILITY_SQL


def text_yule_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yule's characteristic K (Yule 1944, "The Statistical Study of
    Literary Vocabulary") per corpus source — the classic
    length-invariant lexical-richness statistic a curation pipeline
    tracks per domain: K = 10^4 * (S2 - N) / N^2 with N = token
    count and S2 = sum over types of m^2 (m = type frequency). High
    K = repetitive vocabulary (template/boilerplate sources); low K
    = rich vocabulary. Length-invariance makes it comparable across
    sources with wildly different volumes, unlike raw TTR.

    Engine-exact: N and S2 are integers; K is emitted as integer
    e6-scaled ppm via one DECIMAL(38,0) division (10^10 * (S2 - N)
    DIV N^2) — no floating point anywhere. At 100 TB a source can
    hold ~1e12 tokens: N^2 ~ 1e24 and the scaled numerator ~1e34
    both fit DECIMAL(38,0), and the quotient is re-CAST to BIGINT
    (its true magnitude is K*1e6 <= ~1e9).

    Scale: one tokenize pass -> (source, token) count agg (map-side
    combined) -> per-source 3-scalar agg. No joins, no windows; the
    per-type table is vocabulary-sized, not corpus-sized."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    freq = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("m"))
    dec = "decimal(38,0)"
    agg = freq.groupBy("source").agg(
        F.sum("m").cast(dec).alias("n_tok"),
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.sum(F.col("m").cast(dec) * F.col("m").cast(dec)).cast(dec).alias("s2"),
    )
    k_e6 = F.expr(
        "CAST((CAST(s2 AS DECIMAL(38,0)) - n_tok) * CAST(10000000000 AS DECIMAL(38,0))"
        " DIV (n_tok * n_tok) AS BIGINT)"
    )
    return agg.select(
        "source",
        F.col("n_tok").cast("bigint").alias("n_tokens"),
        "n_types",
        k_e6.alias("yule_k_e6"),
    ).orderBy("source")


TEXT_YULE_K_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
),
freq AS (
  SELECT source, token, COUNT(*) AS m FROM toks WHERE token <> '' GROUP BY 1, 2
),
agg AS (
  SELECT source,
         CAST(SUM(m) AS HUGEINT) AS n_tok,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(CAST(m AS HUGEINT) * m) AS HUGEINT) AS s2
  FROM freq GROUP BY 1
)
SELECT source,
       CAST(n_tok AS BIGINT) AS n_tokens,
       n_types,
       CAST((s2 - n_tok) * 10000000000 // (n_tok * n_tok) AS BIGINT) AS yule_k_e6
FROM agg
ORDER BY source
"""

QUERIES["text_yule_k"] = text_yule_k
ORACLE["text_yule_k"] = TEXT_YULE_K_SQL


def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-unigram Shannon entropy per document, rolled up per
    source — the compressibility prior quality filters use alongside
    repetition ratios (near-zero entropy = padding/repeated glyphs;
    abnormally high = base64/binary spill inside "text"): H =
    Σ_c (cnt_c/n)·ln(n/cnt_c) in e6-scaled nats.

    Engine determinism: one e6-rounded ln PER DISTINCT (doc, char)
    term (the bounded-alphabet table, ≤ ~60 terms/doc — the per-term
    transcendental rule), then the entropy is an exact integer dot
    product DIV n; per-source means are SUM DIV n_docs (never a
    rounded mean).

    Scale: chars explode once (the same cost class as the token
    ops), ONE (doc, char)-keyed shuffle, then doc- and source-grain
    aggs. Empty docs are excluded before sequence() (it counts down
    from 1 to 0)."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", F.length("text").alias("n")
    ).where(F.col("n") >= 1)
    # the test parquet is ONE row group — spread the scan so the char
    # explode (the CPU-heavy stage) runs on every core (house rule)
    d = d.repartition(spark.sparkContext.defaultParallelism)
    chars = d.select(
        "doc_id",
        "source",
        "n",
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substr(text, i, 1))")
        ).alias("ch"),
    )
    counts = chars.groupBy("doc_id", "source", "n", "ch").agg(
        F.count(F.lit(1)).alias("c")
    )
    term = counts.select(
        "doc_id",
        "source",
        "n",
        "c",
        F.round(F.log(F.col("n").cast("double") / F.col("c").cast("double")) * 1e6)
        .cast("bigint")
        .alias("lnterm_e6"),
    )
    per_doc = term.groupBy("doc_id", "source", "n").agg(
        F.sum(F.expr("c * lnterm_e6")).cast("bigint").alias("dot")
    ).select("source", F.expr("CAST(dot DIV n AS BIGINT)").alias("ent_e6"))
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("ent_e6").cast("bigint").alias("sum_ent"),
            F.min("ent_e6").alias("min_ent_e6"),
            F.max("ent_e6").alias("max_ent_e6"),
        )
        .select(
            "source",
            "n_docs",
            F.expr("CAST(sum_ent DIV n_docs AS BIGINT)").alias("mean_ent_e6"),
            "min_ent_e6",
            "max_ent_e6",
        )
        .orderBy("source")
    )


TEXT_CHAR_ENTROPY_SQL = """
WITH d AS (
  SELECT doc_id, source, text, length(text) AS n FROM documents WHERE length(text) >= 1
),
chars AS (
  SELECT doc_id, source, n, unnest(string_split(text, '')) AS ch FROM d
),
counts AS (
  SELECT doc_id, source, n, ch, COUNT(*) AS c FROM chars GROUP BY 1, 2, 3, 4
),
term AS (
  SELECT doc_id, source, n, c,
         CAST(ROUND(ln(CAST(n AS DOUBLE) / c) * 1000000) AS BIGINT) AS lnterm_e6
  FROM counts
),
per_doc AS (
  SELECT source, CAST(CAST(SUM(c * lnterm_e6) AS HUGEINT) // n AS BIGINT) AS ent_e6
  FROM term GROUP BY doc_id, source, n
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(CAST(SUM(ent_e6) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_ent_e6,
       CAST(MIN(ent_e6) AS BIGINT) AS min_ent_e6,
       CAST(MAX(ent_e6) AS BIGINT) AS max_ent_e6
FROM per_doc
GROUP BY 1
ORDER BY source
"""

QUERIES["text_char_entropy"] = text_char_entropy
ORACLE["text_char_entropy"] = TEXT_CHAR_ENTROPY_SQL


def text_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending-term screen: terms whose count in the corpus's LAST
    month exceeds their own history by a 3σ Poisson bound — the
    vocabulary-drift monitor a continuously-ingesting corpus runs to
    catch topic shifts, spam campaigns, and scraper loops before
    they skew the token distribution. Emits the top 20 by absolute
    excess with min-support guards (≥ 3 prior months, ≥ 10 prior
    occurrences).

    FULLY INTEGER: with prior months P and prior total S, the
    Poisson trigger c > S/P + 3·√(S/P) becomes the cross-multiplied
    pair (cP − S) > 0 AND (cP − S)² > 9·S·P — no sqrt, no division
    (the WECO/p-chart discipline applied to the term table); the
    emitted excess is (cP − S) DIV P ppm-free integer.

    Scale: one tokenize pass to the (term, month) grain, per-term
    prior aggregation (vocabulary-sized), top-20 via ORDER/LIMIT on
    the flagged survivors only. Documents carry no timestamps, so
    the month key derives deterministically from doc_id (DIV-bucket
    pseudo-months) — the operator contract is the screen, not the
    calendar; doc_id % 12 keeps the bucketing stride-proof (a
    DIV-by-corpus-size key collapsed under the sf1 fixture's 1e8 id
    strides — the r8 stride lesson, caught by the sf1 tier). The
    stationary synthetic vocabulary would never trigger, so a
    deterministic burst is PLANTED (the dedup-copies pattern): the
    lowest-id doc's text re-enters month 11 n_docs DIV 20 times,
    corpus-scaled IN-PLAN — its distinctive terms must trend at
    every SF while common words stay sub-3σ."""
    d = load_table(spark, sf_dir, "documents")
    nd = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("ndocs"),
        F.min("doc_id").cast("bigint").alias("d0"),
    )
    base = d.select(
        F.expr("CAST(doc_id % 12 AS BIGINT)").alias("m"), "text"
    )
    burst = (
        d.crossJoin(F.broadcast(nd))
        .where(F.col("doc_id") == F.col("d0"))
        .select(
            F.lit(11).cast("bigint").alias("m"),
            "text",
            # cap mirrors the oracle's static series bound so both
            # engines share the same replica count at EVERY SF (r9
            # ADVICE: an uncapped Spark sequence vs the oracle's 1e6
            # series silently diverges past ~20M docs)
            F.explode(
                F.sequence(
                    F.lit(1),
                    F.expr("CAST(LEAST(GREATEST(ndocs DIV 20, 1), 1000000) AS INT)"),
                )
            ).alias("rep"),
        )
        .select("m", "text")
    )
    toks = (
        base.unionByName(burst)
        .select("m", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
    )
    cells = toks.groupBy("term", "m").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    last = cells.where(F.col("m") == 11).select("term", F.col("c").alias("c_last"))
    prior = (
        cells.where(F.col("m") < 11)
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("p_months"),
            F.sum("c").cast("bigint").alias("s_prior"),
        )
        .where((F.col("p_months") >= 3) & (F.col("s_prior") >= 10))
    )
    j = last.join(prior, "term")
    flagged = j.where(
        F.expr(
            "c_last * p_months - s_prior > 0 AND"
            " (c_last * p_months - s_prior) * (c_last * p_months - s_prior)"
            " > 9 * s_prior * p_months"
        )
    )
    return (
        flagged.select(
            "term",
            "c_last",
            "p_months",
            "s_prior",
            F.expr("CAST((c_last * p_months - s_prior) DIV p_months AS BIGINT)").alias(
                "excess_count"
            ),
        )
        .orderBy(F.desc("excess_count"), "term")
        .limit(20)
    )


TEXT_TRENDING_SQL = """
WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndocs,
                   CAST(MIN(doc_id) AS BIGINT) AS d0 FROM documents),
base AS (
  SELECT CAST(doc_id % 12 AS BIGINT) AS m, text FROM documents
),
burst AS (
  -- DuckDB's generate_series rejects lateral column bounds: use a
  -- static 1e6-row series filtered to the in-plan replica count.
  -- The Spark side applies the SAME LEAST(..., 1e6) cap so both
  -- engines share one bound at every SF.
  SELECT CAST(11 AS BIGINT) AS m, d.text
  FROM documents d, nd, generate_series(1, 1000000) g(rep)
  WHERE d.doc_id = nd.d0 AND g.rep <= LEAST(GREATEST(nd.ndocs // 20, 1), 1000000)
),
toks AS (
  SELECT m, unnest(string_split(text, ' ')) AS term
  FROM (SELECT m, text FROM base UNION ALL SELECT m, text FROM burst)
),
cells AS (
  SELECT term, m, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE term <> '' GROUP BY 1, 2
),
last AS (SELECT term, c AS c_last FROM cells WHERE m = 11),
prior AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS p_months,
         CAST(SUM(c) AS BIGINT) AS s_prior
  FROM cells WHERE m < 11 GROUP BY 1
  HAVING COUNT(*) >= 3 AND SUM(c) >= 10
)
SELECT l.term, l.c_last, p.p_months, p.s_prior,
       CAST((l.c_last * p.p_months - p.s_prior) // p.p_months AS BIGINT) AS excess_count
FROM last l JOIN prior p ON p.term = l.term
WHERE l.c_last * p.p_months - p.s_prior > 0
  AND (l.c_last * p.p_months - p.s_prior) * (l.c_last * p.p_months - p.s_prior)
      > 9 * p.s_prior * p.p_months
ORDER BY excess_count DESC, l.term
LIMIT 20
"""

QUERIES["text_trending_terms"] = text_trending_terms
ORACLE["text_trending_terms"] = TEXT_TRENDING_SQL


def text_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair vocabulary overlap: Jaccard of each source's
    TOP-100 terms (by frequency, deterministic (count DESC, term)
    tie-break) for every source pair — the provenance audit that
    flags mirror/scrape duplicates between whole SOURCES (doc-level
    dedup never sees them) and conversely surfaces outlier domains
    whose vocabulary shares nothing with the rest. Top-10 most
    overlapping pairs.

    Engine-exact: top-100 membership is an integer rank window with
    a total tie order; the pairwise intersection is an equi-join
    count over the ≤|sources|·100-row membership table (model-sized);
    Jaccard is integer ppm via DIV on |A∪B| = |A| + |B| − |A∩B|,
    carrying each source's ACTUAL top-list size (r9 ADVICE: a
    literal 200 inflates Jaccard for a source with < 100 distinct
    terms).

    Scale: one tokenize pass to (source, term) counts; everything
    after runs on |sources|·100 rows."""
    d = load_table(spark, sf_dir, "documents")
    # spread the one-row-group scan before the tokenize explode
    d = d.repartition(spark.sparkContext.defaultParallelism)
    freq = (
        d.select("source", F.explode(F.split("text", " ")).alias("term"))
        .where(F.col("term") != "")
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), "term")
    top = (
        freq.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 100)
        .select("source", "term")
        .localCheckpoint(eager=True)
    )
    sizes = top.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n_top"))
    a = top.select(F.col("source").alias("s1"), "term")
    b = top.select(F.col("source").alias("s2"), "term")
    inter = (
        a.join(b, "term")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
        .join(sizes.select(F.col("source").alias("s1"), F.col("n_top").alias("n1")), "s1")
        .join(sizes.select(F.col("source").alias("s2"), F.col("n_top").alias("n2")), "s2")
    )
    wtop = Window.orderBy(F.desc("inter"), "s1", "s2")
    return (
        inter.withColumn(
            "jaccard_ppm",
            F.expr("CAST(inter * 1000000 DIV (n1 + n2 - inter) AS BIGINT)"),
        )
        .withColumn("rk", F.row_number().over(wtop))
        .where(F.col("rk") <= 10)
        .select(
            F.col("rk").cast("int").alias("rank"),
            F.col("s1").alias("source_a"),
            F.col("s2").alias("source_b"),
            F.col("inter").alias("shared_terms"),
            "jaccard_ppm",
        )
        .orderBy("rank")
    )


TEXT_SOURCE_OVERLAP_SQL = """
WITH freq AS (
  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM (SELECT source, unnest(string_split(text, ' ')) AS term FROM documents)
  WHERE term <> '' GROUP BY 1, 2
),
top AS (
  SELECT source, term FROM (
    SELECT source, term,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, term) AS rk
    FROM freq
  ) WHERE rk <= 100
),
sizes AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_top FROM top GROUP BY 1
),
inter AS (
  SELECT a.source AS s1, b.source AS s2, CAST(COUNT(*) AS BIGINT) AS inter
  FROM top a JOIN top b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY i.inter DESC, i.s1, i.s2) AS INTEGER) AS rank,
       i.s1 AS source_a, i.s2 AS source_b, i.inter AS shared_terms,
       CAST(i.inter * 1000000 // (sa.n_top + sb.n_top - i.inter) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.source = i.s1
JOIN sizes sb ON sb.source = i.s2
QUALIFY rank <= 10
ORDER BY rank
"""

QUERIES["text_source_vocab_overlap"] = text_source_vocab_overlap
ORACLE["text_source_vocab_overlap"] = TEXT_SOURCE_OVERLAP_SQL


# ---------------------------------------------------------------------------
# text_ocr_artifact_screen — OCR-noise detection with a planted segment
# (round 10)
# ---------------------------------------------------------------------------


def text_ocr_artifact_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR-artifact screen — the curation filter that catches scanned
    /OCR'd uploads by their signature digit-for-letter substitutions
    (l→1, o→0) inside otherwise-alphabetic words. The fixture corpus
    is digit-free by construction (probed, r9 rule), so the screen's
    power is demonstrated on an in-plan PLANTED segment: docs with
    doc_id % 9 == 0 are re-ingested through a translate(l→1, o→0)
    corruption, and detection must separate the segments EXACTLY —
    zero false positives on the organic side, full recall on the
    planted side (asserted in the property test).

    Per segment: docs, docs flagged (≥1 mixed alnum token), flagged
    ppm, mean mixed-token rate ppm, and the corpus-wide top offender
    count. Pure integer: token counts via regexp arrays projected to
    named columns BEFORE any reuse (r4 transform rule), ppm via DIV.

    Scale: one pass per segment branch (a union of filtered scans —
    the r5 lesson: branches projecting different transforms can beat
    one exploded scan), |2|-row output."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    organic = d.select(F.lit("organic").alias("segment"), "doc_id", "text")
    planted = d.where(F.col("doc_id") % 9 == 0).select(
        F.lit("planted_ocr").alias("segment"),
        "doc_id",
        F.translate("text", "lo", "10").alias("text"),
    )
    seg = organic.unionAll(planted)
    scored = seg.select(
        "segment",
        "doc_id",
        F.size(F.expr(r"regexp_extract_all(text, '[a-z0-9]+', 0)")).cast("bigint").alias(
            "n_tokens"
        ),
        F.size(
            F.expr(r"regexp_extract_all(text, '[a-z]*[0-9][a-z0-9]*[a-z][a-z0-9]*|[a-z]+[0-9][a-z0-9]*', 0)")
        )
        .cast("bigint")
        .alias("n_mixed"),
    )
    return (
        scored.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_mixed") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("flagged_docs"),
            F.sum("n_tokens").cast("bigint").alias("n_tokens"),
            F.sum("n_mixed").cast("bigint").alias("n_mixed"),
            F.max("n_mixed").cast("bigint").alias("max_mixed_in_doc"),
        )
        .select(
            "segment",
            "n_docs",
            "flagged_docs",
            F.expr("CAST(flagged_docs * 1000000 DIV n_docs AS BIGINT)").alias(
                "flagged_ppm"
            ),
            F.expr("CAST(n_mixed * 1000000 DIV GREATEST(n_tokens, 1) AS BIGINT)").alias(
                "mixed_token_ppm"
            ),
            "max_mixed_in_doc",
        )
        .orderBy("segment")
    )


OCR_SCREEN_SQL = """
WITH seg AS (
  SELECT 'organic' AS segment, doc_id, text FROM documents
  UNION ALL
  SELECT 'planted_ocr', doc_id, translate(text, 'lo', '10')
  FROM documents WHERE doc_id % 9 = 0
),
scored AS (
  SELECT segment, doc_id,
         CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(text,
              '[a-z]*[0-9][a-z0-9]*[a-z][a-z0-9]*|[a-z]+[0-9][a-z0-9]*'))
              AS BIGINT) AS n_mixed
  FROM seg
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_mixed > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
       CAST(SUM(CASE WHEN n_mixed > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS flagged_ppm,
       CAST(SUM(n_mixed) * 1000000 // GREATEST(SUM(n_tokens), 1) AS BIGINT)
         AS mixed_token_ppm,
       CAST(MAX(n_mixed) AS BIGINT) AS max_mixed_in_doc
FROM scored
GROUP BY 1
ORDER BY 1
"""

QUERIES["text_ocr_artifact_screen"] = text_ocr_artifact_screen
ORACLE["text_ocr_artifact_screen"] = OCR_SCREEN_SQL


# ---------------------------------------------------------------------------
# text_unicode_hygiene_screen — invisible/control character screen
# (round 10)
# ---------------------------------------------------------------------------


def text_unicode_hygiene_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode hygiene screen — the curation filter that catches
    zero-width characters (U+200B/200C/FEFF: copy-paste artifacts,
    SEO spam, tokenizer poison), raw control bytes, and U+FFFD
    replacement chars (mojibake) before they reach a tokenizer. The
    fixture corpus is clean ASCII (probed), so the screen's power is
    demonstrated on in-plan PLANTED segments: docs with doc_id % 11
    == 0 get a zero-width space injected at every word boundary, and
    docs with doc_id % 13 == 0 get a U+FFFD appended — detection
    must separate all three segments exactly (property-tested).

    Per segment: docs, flagged docs (any suspect char), flagged ppm,
    suspect chars per million chars. Pure integer counts (length
    minus cleaned length — no regex needed for the counting path).

    Scale: one pass per segment branch, |3|-row output."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    zws = "​"
    seg = (
        d.select(F.lit("organic").alias("segment"), "doc_id", "text")
        .unionAll(
            d.where(F.col("doc_id") % 11 == 0).select(
                F.lit("planted_zero_width").alias("segment"),
                "doc_id",
                F.regexp_replace("text", " ", " " + zws).alias("text"),
            )
        )
        .unionAll(
            d.where(F.col("doc_id") % 13 == 0).select(
                F.lit("planted_mojibake").alias("segment"),
                "doc_id",
                F.concat("text", F.lit("�")).alias("text"),
            )
        )
    )
    suspects = "​‌﻿�"
    scored = seg.select(
        "segment",
        (F.length("text")).cast("bigint").alias("n_chars"),
        (
            F.length("text")
            - F.length(F.translate("text", suspects, ""))
        )
        .cast("bigint")
        .alias("n_suspect"),
    )
    return (
        scored.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("n_suspect") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("flagged_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.sum("n_suspect").cast("bigint").alias("n_suspect"),
        )
        .select(
            "segment",
            "n_docs",
            "flagged_docs",
            F.expr("CAST(flagged_docs * 1000000 DIV n_docs AS BIGINT)").alias(
                "flagged_ppm"
            ),
            F.expr(
                "CAST(n_suspect * 1000000 DIV GREATEST(n_chars, 1) AS BIGINT)"
            ).alias("suspect_char_ppm"),
        )
        .orderBy("segment")
    )


UNICODE_HYGIENE_SQL = """
WITH seg AS (
  SELECT 'organic' AS segment, doc_id, text FROM documents
  UNION ALL
  SELECT 'planted_zero_width', doc_id, replace(text, ' ', ' ​')
  FROM documents WHERE doc_id % 11 = 0
  UNION ALL
  SELECT 'planted_mojibake', doc_id, text || '�'
  FROM documents WHERE doc_id % 13 = 0
),
scored AS (
  SELECT segment,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text)
              - length(replace(replace(replace(replace(text,
                    '​', ''), '‌', ''), '﻿', ''), '�', ''))
              AS BIGINT) AS n_suspect
  FROM seg
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_suspect > 0 THEN 1 ELSE 0 END) AS BIGINT) AS flagged_docs,
       CAST(SUM(CASE WHEN n_suspect > 0 THEN 1 ELSE 0 END) * 1000000 // COUNT(*)
            AS BIGINT) AS flagged_ppm,
       CAST(SUM(n_suspect) * 1000000 // GREATEST(SUM(n_chars), 1) AS BIGINT)
         AS suspect_char_ppm
FROM scored
GROUP BY 1
ORDER BY 1
"""

QUERIES["text_unicode_hygiene_screen"] = text_unicode_hygiene_screen
ORACLE["text_unicode_hygiene_screen"] = UNICODE_HYGIENE_SQL
