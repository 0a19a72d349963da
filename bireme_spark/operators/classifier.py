"""Distributed logistic-regression trainer for corpus quality
classifiers (the GPT-3 §2.2 / LLaMA / CCNet pattern: train a cheap
linear model on curated-vs-raw labels, score the whole corpus, keep
the high-scoring tail).

Spark-first shape: full-batch gradient descent where each iteration
is ONE aggregation over the (persisted, narrow) feature frame — the
d+1 gradient sums are the only data crossing the driver, exactly like
the IVF/PQ centroid collects. No MLlib dependency, no RDDs, no Python
in the data path: the sigmoid/gradient expressions are JVM codegen.

Determinism: per-row gradient contributions are rounded to 9dp and
DECIMAL-summed, so the weight trajectory is bit-identical regardless
of shuffle/partition order — re-training on the same corpus yields
the same model (the reproducibility a data-pipeline gate needs).

At 100 TB: iters full passes over the corpus; the feature projection
is a handful of doubles per doc, so each pass is a column-pruned scan
+ a map-side-combined scalar agg. Minibatching = add a deterministic
hash filter per iteration; unnecessary at d ≤ dozens.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(weights: Sequence[float], feature_cols: Sequence[str]):
    z = F.lit(float(weights[0]))  # bias
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_train(
    features: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 15,
    lr: float = 1.0,
) -> list[float]:
    """Train w (bias first) by full-batch GD on log-loss. ``features``
    should be persisted by the caller when iters > 1 — every iteration
    re-scans it."""
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    n = None
    for _ in range(iters):
        z = _dot(w, feature_cols)
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        err = p - F.col(label_col).cast("double")
        aggs = [
            F.sum(F.round(err * g, 9).cast("decimal(28,9)")).alias(f"g{i}")
            for i, g in enumerate([F.lit(1.0), *[F.col(c) for c in feature_cols]])
        ]
        row = features.agg(F.count(F.lit(1)).alias("n"), *aggs).collect()[0]
        n = row["n"]
        if not n:  # pragma: no cover - guard
            raise ValueError("logreg_train: empty feature frame")
        w = [wi - lr * float(row[f"g{i}"]) / n for i, wi in enumerate(w)]
    return w


def logreg_score(
    features: DataFrame, feature_cols: Sequence[str], weights: Sequence[float]
):
    """Sigmoid score column for the trained model — pure JVM expr."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_dot(weights, feature_cols)))


def log_loss(
    features: DataFrame, feature_cols: Sequence[str], label_col: str, weights: Sequence[float]
) -> float:
    """Mean log-loss of a model over the feature frame (one agg)."""
    p = logreg_score(features, feature_cols, weights)
    eps = 1e-12
    y = F.col(label_col).cast("double")
    ll = y * F.log(p + eps) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - p + eps)
    return -float(features.agg(F.avg(ll)).collect()[0][0])


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
