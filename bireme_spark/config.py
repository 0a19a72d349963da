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

import os
from dataclasses import dataclass, field


def load_properties(path: str) -> dict[str, str]:
    """Parse a Java ``.properties`` file (the reference's config
    format, ``Config.java:60-300``): ``#``/``!`` comments, ``=`` or
    ``:`` separators, backslash line continuations, trimmed values."""
    props: dict[str, str] = {}
    with open(path, encoding="utf-8") as f:
        pending = ""
        for raw in f:
            line = pending + raw.strip()
            pending = ""
            if not line or line[0] in "#!":
                continue
            if line.endswith("\\"):
                pending = line[:-1]
                continue
            for sep in ("=", ":"):
                if sep in line:
                    k, _, v = line.partition(sep)
                    props[k.strip()] = v.strip()
                    break
    return props


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
    # StateServer twin (state.server.addr/port in the reference etc)
    state_server_addr: str | None = None
    state_server_port: int | None = None
    # `serve` daemon extras: the reference discovers the target schema
    # from the live database (GetPrimaryKeys.java); a file/parquet
    # deployment declares it in the properties instead —
    # ``target.schema = k BIGINT, v STRING`` + ``target.key = k``.
    # Multi-table deployments (one pipeline syncing a whole binlog
    # topic) declare one pair PER MAPPED TARGET:
    # ``table.public.orders.schema = ...`` / ``table.public.orders.key = ...``.
    target_schema_ddl: str | None = None
    key_fields: tuple[str, ...] = ()
    table_schemas: dict[str, tuple[str, tuple[str, ...]]] = field(default_factory=dict)

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "PipelineConfig":
        """Parse the flat properties format bireme uses — accepts both
        the reference's own spellings (``data_source``, millisecond
        ``merge.interval``, ``merge.batch.size``, ``target.url/user/
        passwd``, ``state.server.*``; ``Config.java:60-300``) and this
        repo's file-sink keys (``target.dir``, ``checkpoint.dir``)."""
        src_list = props.get("data_source", props.get("data.source", ""))
        names = [s.strip() for s in src_list.split(",") if s.strip()]
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
        interval = props.get("merge.interval", "10 seconds")
        if interval.isdigit():  # reference units: milliseconds
            interval = f"{interval} milliseconds"
        batch = props.get("merge.batch.size", props.get("batch.size"))
        jdbc_props = {}
        if "target.user" in props:
            jdbc_props["user"] = props["target.user"]
        if "target.passwd" in props:
            jdbc_props["password"] = props["target.passwd"]
        return cls(
            sources=sources,
            target_dir=props.get("target.dir", ""),
            checkpoint_dir=props.get("checkpoint.dir", ""),
            trigger_interval=interval,
            max_events_per_trigger=int(batch) if batch else None,
            target_jdbc_url=props.get("target.url"),
            jdbc_properties=jdbc_props,
            num_buckets=int(props.get("target.buckets", 16)),
            state_server_addr=props.get("state.server.addr"),
            state_server_port=(
                int(props["state.server.port"]) if "state.server.port" in props else None
            ),
            target_schema_ddl=props.get("target.schema"),
            key_fields=tuple(
                k.strip() for k in props.get("target.key", "").split(",") if k.strip()
            ),
            table_schemas={
                t: (
                    props[f"table.{t}.schema"],
                    tuple(
                        k.strip()
                        for k in props.get(f"table.{t}.key", "").split(",")
                        if k.strip()
                    ),
                )
                for t in {
                    k[len("table.") : -len(".schema")]
                    for k in props
                    if k.startswith("table.") and k.endswith(".schema")
                }
            },
        )

    @classmethod
    def from_properties_file(cls, config_path: str) -> "PipelineConfig":
        """Load a reference-style deployment: ``config.properties``
        plus one ``<source>.properties`` table-map file per data
        source in the same directory (``Config.java`` reads exactly
        this pair; the map lines are ``src.db_table = tgt.table``)."""
        props = load_properties(config_path)
        cfg = cls.from_properties(props)
        etc = os.path.dirname(os.path.abspath(config_path))
        for src in cfg.sources:
            map_path = os.path.join(etc, f"{src.name}.properties")
            if not src.table_map and os.path.isfile(map_path):
                src.table_map = {
                    f"{src.name}.{k}": v for k, v in load_properties(map_path).items()
                }
        return cfg
