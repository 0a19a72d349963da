"""Pipeline configuration — the Spark twin of bireme's
config.properties / <source>.properties pair (``Config.java:60-300``).

Bireme's knobs map onto Structured Streaming options:

| bireme (Config.java)        | here                                  |
| --------------------------- | ------------------------------------- |
| data.source / <name>.type   | ``SourceConfig.name`` / ``kind``      |
| <name>.kafka.server/topic   | ``kafka_server`` / ``kafka_topic``    |
| batch_size (RowCache)       | ``max_events_per_trigger``            |
| merge_interval (RowCache)   | ``trigger_interval``                  |
| table-map file              | ``table_map`` dict                    |
| loader_conn_size / pools    | (Spark scheduler — not needed)        |
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class SourceConfig:
    name: str
    kind: str  # "maxwell" | "debezium" | "file"
    kafka_server: str | None = None
    kafka_topic: str | None = None
    kafka_groupid: str = "bireme"
    path: str | None = None  # file source (tests / replay)
    table_map: dict[str, str] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    sources: list[SourceConfig]
    target_dir: str
    checkpoint_dir: str
    trigger_interval: str = "10 seconds"  # bireme merge_interval default 10s
    max_events_per_trigger: int | None = 50_000  # bireme batch_size-ish
    # JDBC warehouse target (the Greenplum role; versioned parquet is
    # the dependency-free default). When set, the pipeline merges via
    # sinks.jdbc.JdbcMergeSink instead of parquet versions.
    target_jdbc_url: str | None = None
    target_table: str | None = None
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    # PK-hash bucket count of the parquet sink layout: a micro-batch
    # rewrites only the buckets containing changed keys. Size so one
    # bucket ≈ a comfortable rewrite unit at the target scale.
    num_buckets: int = 16

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "PipelineConfig":
        """Parse the flat properties format bireme uses."""
        names = [s.strip() for s in props.get("data.source", "").split(",") if s.strip()]
        sources = []
        for n in names:
            table_map = {
                k.removeprefix(f"{n}.table."): v
                for k, v in props.items()
                if k.startswith(f"{n}.table.")
            }
            sources.append(
                SourceConfig(
                    name=n,
                    kind=props.get(f"{n}.type", "maxwell"),
                    kafka_server=props.get(f"{n}.kafka.server"),
                    kafka_topic=props.get(f"{n}.kafka.topic"),
                    kafka_groupid=props.get(f"{n}.kafka.groupid", "bireme"),
                    path=props.get(f"{n}.path"),
                    table_map=table_map,
                )
            )
        return cls(
            sources=sources,
            target_dir=props["target.dir"],
            checkpoint_dir=props["checkpoint.dir"],
            trigger_interval=props.get("merge.interval", "10 seconds"),
            max_events_per_trigger=int(props["batch.size"]) if "batch.size" in props else None,
            num_buckets=int(props.get("target.buckets", 16)),
        )
