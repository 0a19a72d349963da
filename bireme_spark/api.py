"""User-facing facade: the one import a consumer of this engine
needs. Wraps session bootstrap, table registration, the query
registry, and ad-hoc SQL behind a single ``Engine`` object — the
Spark-native replacement for the reference's daemon entry point
(``bireme/Bireme.java`` wires config → pipelines; here the "wiring"
is just a SparkSession + a warehouse directory).

    from bireme_spark.api import Engine

    eng = Engine.local(sf_dir="/data/tpch")      # or Engine(spark, sf_dir)
    eng.query("q1_pricing_summary").show()        # any registry query
    eng.sql("SELECT COUNT(*) FROM lineitem")      # ad-hoc over registered views
    eng.tables()                                  # available base tables
    eng.queries()                                 # every operator by name
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bireme_spark import registry
from bireme_spark.sources.tables import TABLES, load_table

_ALL_TABLES = tuple(TABLES)


class Engine:
    """A SparkSession bound to a warehouse directory, with every
    registry operator and the base tables one call away."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self._views_registered = False

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "bireme-spark", cpus: int | None = None) -> "Engine":
        from bireme_spark.session import get_spark

        if cpus is not None:
            import os

            if SparkSession.getActiveSession() is not None:
                import warnings

                warnings.warn(
                    "Engine.local(cpus=...) has no effect: a SparkSession "
                    "already exists and getOrCreate() will reuse it. Stop "
                    "the session first to change the core count.",
                    stacklevel=2,
                )
            os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
        return cls(get_spark(app_name), sf_dir)

    # -- tables ---------------------------------------------------------
    def tables(self) -> tuple[str, ...]:
        return tuple(_ALL_TABLES)

    def table(self, name: str) -> DataFrame:
        if name not in _ALL_TABLES:
            raise KeyError(f"unknown table {name!r}; have {_ALL_TABLES}")
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Expose every base table as a temp view for ad-hoc SQL."""
        for t in _ALL_TABLES:
            self.table(t).createOrReplaceTempView(t)
        self._views_registered = True

    # -- queries --------------------------------------------------------
    def queries(self) -> tuple[str, ...]:
        return tuple(sorted(registry.queries()))

    def query(self, name: str) -> DataFrame:
        qs = registry.queries()
        if name not in qs:
            raise KeyError(f"unknown query {name!r}; see Engine.queries()")
        return qs[name](self.spark, self.sf_dir)

    def oracle_sql(self, name: str) -> str | None:
        """The ANSI-SQL twin used by the correctness gate (None for
        rows-only operators)."""
        return registry.oracle_sql().get(name)

    def sql(self, text: str) -> DataFrame:
        if not self._views_registered:
            self.register_views()
        return self.spark.sql(text)
