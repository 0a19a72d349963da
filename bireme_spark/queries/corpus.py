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


QUERIES = {
    "corpus_stats": corpus_stats,
    "corpus_sample_systematic": corpus_sample_systematic,
}

ORACLE = {
    "corpus_stats": CORPUS_STATS_SQL,
    "corpus_sample_systematic": CORPUS_SAMPLE_SQL,
}
