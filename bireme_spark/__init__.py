"""bireme_spark — a PySpark-native engine with the query and
data-processing capabilities of HashDataInc/bireme (CDC incremental
sync + warehouse analytics), rebuilt Spark-first.

Reference (read-only, studied for semantics only):
/root/reference — Java CDC sync engine (Maxwell/Debezium → Kafka →
DELETE+COPY into Greenplum). This package re-expresses every
capability on the Spark DataFrame / SQL / Structured Streaming stack
and adds large-scale training-data pipeline operators (dedup,
similarity search, text analysis, multimodal plumbing).
"""

__version__ = "0.1.0"
