"""Text-analysis queries over the documents corpus (SURVEY.md §2.C)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


QUERIES = {
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_lang_id": text_lang_id,
    "doc_fingerprint": doc_fingerprint,
}

ORACLE = {
    "text_token_count": TEXT_TOKEN_COUNT_SQL,
    "text_quality_score": TEXT_QUALITY_SQL,
    "text_lang_id": TEXT_LANG_ID_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
}
