"""Distributed PageRank over a directed edge list — the centrality
pass data-curation pipelines run on the kNN graph to pick
representative documents (high-rank = endorsed by many neighbors) or
down-weight redundant clusters.

Spark-first shape: the classic power iteration as DataFrame joins —
edges shuffle ONCE onto their src partitioning and stay there (the
rank table, |nodes| rows, is the small side every round); per-round
lineage is truncated with localCheckpoint like the star-contraction
loop in operators/dedup.py. The dangling-mass scalar folds in as a
one-row broadcast aggregate — no per-round driver round-trips.

Determinism: ranks live in DECIMAL(28,14); contributions divide by
integer out-degree at a fixed scale and DECIMAL-sum, so the rank
vector is bit-identical at any partitioning — re-runs reproduce the
selection exactly (the property corpus curation needs).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_R = "decimal(28,14)"


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Power-iteration PageRank; returns (id, rank double).

    ``edges`` is directed; dangling nodes (no out-edges) redistribute
    their mass uniformly, so total rank mass stays 1 (up to the
    14-dp rounding of each round).
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:  # pragma: no cover - guard
        return nodes.select("id", F.lit(0.0).alias("rank"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges carry their out-degree from the start; this frame is the
    # big side and is partitioned/persisted once
    ed = (
        e.join(outdeg, "src")
        .select("src", "dst", "deg")
        .repartition(F.col("src"))
        .persist()
    )
    ed.count()

    d = Decimal(str(damping))
    base = (Decimal(1) - d) / n
    dd = F.lit(d).cast("decimal(6,4)")
    # the dangling NODE SET is static — only its rank mass changes per
    # round. Materialize the id list once so the per-round aggregate
    # joins two small cached frames instead of re-deriving outdeg
    # (and its whole edges lineage — for a kNN-graph input that is the
    # entire LSH build) every iteration.
    dang_ids = nodes.join(outdeg.withColumnRenamed("src", "id"), "id", "left_anti").persist()
    has_dangling = dang_ids.count() > 0
    ranks = nodes.select("id", F.lit(Decimal(1) / n).cast(_R).alias("r")).persist()
    for _ in range(iters):
        # mass parked on dangling nodes this round — a one-row
        # broadcast aggregate, no driver round-trip per iteration
        dangling = F.broadcast(
            ranks.join(dang_ids, "id", "left_semi").agg(
                F.coalesce(F.sum("r"), F.lit(0)).cast(_R).alias("dm")
            )
        )
        contrib = (
            ed.join(ranks.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("r") / F.col("deg")).cast(_R).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").cast(_R).alias("in_mass"))
        )
        nr = nodes.join(contrib.withColumnRenamed("dst", "id"), "id", "left")
        if has_dangling:
            nr = nr.crossJoin(dangling).select(
                "id",
                (
                    F.lit(base).cast(_R)
                    + dd * (F.col("dm") / F.lit(n))
                    + dd * F.coalesce(F.col("in_mass"), F.lit(0).cast(_R))
                )
                .cast(_R)
                .alias("r"),
            )
        else:  # no dangling mass: skip the per-round aggregate entirely
            nr = nr.select(
                "id",
                (
                    F.lit(base).cast(_R)
                    + dd * F.coalesce(F.col("in_mass"), F.lit(0).cast(_R))
                )
                .cast(_R)
                .alias("r"),
            )
        new_ranks = nr.localCheckpoint(eager=True)
        ranks.unpersist()
        ranks = new_ranks
    out = ranks.select("id", F.col("r").cast("double").alias("rank"))
    nodes.unpersist()
    ed.unpersist()
    dang_ids.unpersist()
    return out
