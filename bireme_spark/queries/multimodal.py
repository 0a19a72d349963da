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


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing over the packed corpus: every 2nd
    256-byte pseudo-frame per document (the fan-out happens inside
    the Arrow batch). Frame geometry is deterministic byte math, so
    it oracle-checks exactly."""
    from bireme_spark.operators.multimodal import sample_frames

    d = load_table(spark, sf_dir, "documents")
    packed = attach_binary_payload(d, "doc_id", "text")
    return (
        sample_frames(packed, every_n=2)
        .select("doc_id", "frame_idx", "n_frame_bytes")
        .orderBy("doc_id", "frame_idx")
    )


FRAME_SAMPLE_SQL = """
SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
       CAST(least(256, octet_length(encode(text)) - i * 256) AS INTEGER) AS n_frame_bytes
FROM documents,
     LATERAL (SELECT unnest(generate_series(0,
                CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT) - 1, 2)) AS i) t
WHERE octet_length(encode(text)) > 0
ORDER BY doc_id, frame_idx
"""

QUERIES["multimodal_frame_sample"] = multimodal_frame_sample
ORACLE["multimodal_frame_sample"] = FRAME_SAMPLE_SQL
