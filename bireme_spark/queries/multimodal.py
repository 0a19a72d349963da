"""Multimodal plumbing query (SURVEY.md §2.C): binary payload +
metadata → Arrow-batched feature extraction. Oracle-checked because
the stub features are deterministic byte statistics; the codec call
itself is a marked stub (no media libs in this container)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.operators.multimodal import attach_binary_payload, extract_features
from bireme_spark.sources.tables import load_table


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = attach_binary_payload(d, "doc_id", "text")
    feats = extract_features(packed)
    return feats.select(
        "doc_id", "n_bytes", "head_byte", F.round("mean_byte", 6).alias("mean_byte")
    )


MULTIMODAL_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS head_byte,
       ROUND(list_aggregate(list_transform(string_split(text, ''), c -> ascii(c)), 'avg'), 6)
         AS mean_byte
FROM documents
"""


QUERIES = {"multimodal_decode": multimodal_decode}
ORACLE = {"multimodal_decode": MULTIMODAL_SQL}
