"""Protocol-level Kafka fake: executes the option dict built by
``kafka_reader_options`` with the same semantics the real Spark Kafka
source applies, against an in-memory broker.

The sandbox has no broker and no spark-sql-kafka jar, so the option
dict is the deployment seam. Asserting its literal keys (the old
test) cannot catch a key whose NAME is right but whose semantics
drifted — or a renamed key that the real source would silently
ignore. This interpreter is deliberately STRICT: every option must be
one the Spark Kafka source defines, `kafka.`-prefixed options must be
real consumer properties from the reference's createConsumer set
(KafkaPipeLine.java:198-207), and the read path executes
startingOffsets / maxOffsetsPerTrigger / failOnDataLoss /
enable.auto.commit the way the source documents them. A drifted key
or value fails the test suite instead of surfacing on a cluster.

Semantics mirrored from the public Spark docs
(structured-streaming-kafka-integration):

- exactly one of ``subscribe`` / ``subscribePattern`` / ``assign``;
- ``startingOffsets``: earliest | latest (JSON per-partition form is
  out of scope for the fake and rejected explicitly);
- ``maxOffsetsPerTrigger``: total per-trigger record cap (the real
  source splits it proportionally across partitions; the fake
  enforces the total in sorted-partition order — same invariant,
  simpler split);
- ``failOnDataLoss``: reading an offset below the broker's retained
  log-start either raises (true) or resumes from the retained start
  (false);
- the source NEVER commits to the consumer group — progress lives in
  the checkpoint (mirrored: the fake records group commits and the
  contract test asserts none happen).
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Consumer properties the reference's createConsumer actually sets
# (KafkaPipeLine.java:198-207) — the closed set a `kafka.`-prefixed
# option may name. A new knob belongs here AND in the reference table
# inside kafka_reader_options' docstring.
REFERENCE_CONSUMER_PROPS = frozenset(
    {
        "bootstrap.servers",
        "group.id",
        "session.timeout.ms",
        "enable.auto.commit",
        "key.deserializer",
        "value.deserializer",
    }
)

# Non-prefixed options the Spark Kafka source defines (subset we use;
# the fake rejects anything outside it — strictness IS the test).
SOURCE_OPTIONS = frozenset(
    {
        "subscribe",
        "subscribepattern",
        "assign",
        "startingoffsets",
        "maxoffsetspertrigger",
        "failondataloss",
    }
)


class OptionDriftError(ValueError):
    """An option key/value the real Kafka source would not accept (or
    would silently ignore) — the drift the seam test exists to catch."""


@dataclass
class FakeBroker:
    """topic → partition → list of (offset, value); log_start models
    retention (offsets below it are expired/deleted)."""

    logs: dict[str, dict[int, list[tuple[int, str]]]] = field(default_factory=dict)
    log_start: dict[tuple[str, int], int] = field(default_factory=dict)
    group_commits: list[tuple[str, str, int, int]] = field(default_factory=list)

    def produce(self, topic: str, partition: int, value: str) -> int:
        part = self.logs.setdefault(topic, {}).setdefault(partition, [])
        offset = part[-1][0] + 1 if part else 0
        part.append((offset, value))
        return offset

    def expire_below(self, topic: str, partition: int, offset: int) -> None:
        """Retention kicked in: drop records below ``offset``."""
        part = self.logs[topic][partition]
        self.logs[topic][partition] = [(o, v) for o, v in part if o >= offset]
        self.log_start[(topic, partition)] = offset

    def start_offset(self, topic: str, partition: int) -> int:
        return self.log_start.get((topic, partition), 0)

    def end_offset(self, topic: str, partition: int) -> int:
        part = self.logs.get(topic, {}).get(partition, [])
        return part[-1][0] + 1 if part else self.start_offset(topic, partition)

    def commit(self, group: str, topic: str, partition: int, offset: int) -> None:
        self.group_commits.append((group, topic, partition, offset))


class FakeKafkaSource:
    """Interprets a Spark-Kafka-source option dict against a
    FakeBroker; ``pull_batch`` is one micro-batch's worth of reads
    from the checkpointed positions (held here, NOT on the broker —
    the source's documented behavior)."""

    def __init__(self, broker: FakeBroker, options: dict[str, str]) -> None:
        self.broker = broker
        self.consumer_props: dict[str, str] = {}
        source_opts: dict[str, str] = {}
        for key, val in options.items():
            if key.startswith("kafka."):
                prop = key[len("kafka.") :]
                if prop not in REFERENCE_CONSUMER_PROPS:
                    raise OptionDriftError(f"unknown consumer property {prop!r}")
                self.consumer_props[prop] = val
            elif key.lower() in SOURCE_OPTIONS:
                source_opts[key.lower()] = val
            else:
                raise OptionDriftError(f"unknown kafka source option {key!r}")

        if "bootstrap.servers" not in self.consumer_props:
            raise OptionDriftError("kafka.bootstrap.servers is required")
        subs = [k for k in ("subscribe", "subscribepattern", "assign") if k in source_opts]
        if len(subs) != 1:
            raise OptionDriftError(f"exactly one subscribe mode required, got {subs}")
        if subs[0] != "subscribe":
            raise OptionDriftError(f"fake models topic-list subscribe only, got {subs[0]}")
        self.topic = source_opts["subscribe"]
        if self.topic not in broker.logs:
            raise OptionDriftError(f"unknown topic {self.topic!r}")

        starting = source_opts.get("startingoffsets", "latest")
        if starting not in ("earliest", "latest"):
            raise OptionDriftError(f"startingOffsets must be earliest|latest, got {starting!r}")
        cap = source_opts.get("maxoffsetspertrigger")
        if cap is not None and (not cap.isdigit() or int(cap) <= 0):
            raise OptionDriftError(f"maxOffsetsPerTrigger must be a positive int, got {cap!r}")
        self.max_per_trigger = int(cap) if cap else None
        fol = source_opts.get("failondataloss", "true")
        if fol not in ("true", "false"):
            raise OptionDriftError(f"failOnDataLoss must be true|false, got {fol!r}")
        self.fail_on_data_loss = fol == "true"
        if self.consumer_props.get("enable.auto.commit", "false") != "false":
            raise OptionDriftError("the Spark source requires enable.auto.commit=false")

        # checkpoint positions: per partition, next offset to read
        self.positions = {
            p: (broker.start_offset(self.topic, p) if starting == "earliest"
                else broker.end_offset(self.topic, p))
            for p in broker.logs[self.topic]
        }

    def pull_batch(self) -> list[tuple[int, int, str]]:
        """One micro-batch: [(partition, offset, value)]; advances the
        checkpointed positions, commits NOTHING to the broker group."""
        out: list[tuple[int, int, str]] = []
        budget = self.max_per_trigger
        for p in sorted(self.positions):
            pos = self.positions[p]
            log_start = self.broker.start_offset(self.topic, p)
            if pos < log_start:
                if self.fail_on_data_loss:
                    raise RuntimeError(
                        f"data loss: offset {pos} below log start {log_start} "
                        f"for {self.topic}-{p}"
                    )
                pos = log_start  # resume from earliest retained
            for off, val in self.broker.logs[self.topic][p]:
                if off < pos:
                    continue
                if budget is not None and budget <= 0:
                    break
                out.append((p, off, val))
                pos = off + 1
                if budget is not None:
                    budget -= 1
            self.positions[p] = pos
        return out
