"""Property tests for the distributed logistic-regression trainer —
the rows-only contract behind the ``quality_classifier`` gate query.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bireme_spark.operators.classifier import log_loss, logreg_score, logreg_train


def _planted(spark, n=400, sep=3.0):
    """Linearly separable two-cluster data: label 1 at (+sep, +sep),
    label 0 at (-sep, -sep), deterministic pseudo-noise from the id."""
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 2).cast("int").alias("label"),
    )
    noise1 = (F.hash(F.col("id"), F.lit(1)) % 1000) / 1000.0
    noise2 = (F.hash(F.col("id"), F.lit(2)) % 1000) / 1000.0
    sign = F.when(F.col("label") == 1, 1.0).otherwise(-1.0)
    return df.select(
        "id",
        "label",
        (sign * F.lit(sep) + noise1).alias("x1"),
        (sign * F.lit(sep) + noise2).alias("x2"),
    )


class TestLogregTrain:
    def test_loss_decreases(self, spark):
        df = _planted(spark).persist()
        try:
            w0 = [0.0, 0.0, 0.0]
            w = logreg_train(df, ["x1", "x2"], "label", iters=10, lr=0.5)
            assert log_loss(df, ["x1", "x2"], "label", w) < log_loss(
                df, ["x1", "x2"], "label", w0
            )
        finally:
            df.unpersist()

    def test_separable_accuracy(self, spark):
        df = _planted(spark).persist()
        try:
            w = logreg_train(df, ["x1", "x2"], "label", iters=20, lr=0.5)
            pred = (logreg_score(df, ["x1", "x2"], w) >= 0.5).cast("int")
            acc = df.select(
                F.avg((pred == F.col("label")).cast("double")).alias("a")
            ).collect()[0]["a"]
            assert acc >= 0.95
        finally:
            df.unpersist()

    def test_deterministic_retrain(self, spark):
        # DECIMAL gradient sums ⇒ identical weights across runs and
        # partitionings — the reproducibility contract.
        df = _planted(spark).persist()
        df8 = _planted(spark).repartition(8).persist()
        try:
            w1 = logreg_train(df, ["x1", "x2"], "label", iters=5, lr=0.5)
            w2 = logreg_train(df8, ["x1", "x2"], "label", iters=5, lr=0.5)
            assert w1 == w2
        finally:
            df.unpersist()
            df8.unpersist()

    def test_gate_query_shape(self, spark, sf_dir):
        """r10 shape: gate row = AUC audit; per-doc scores live in
        quality_classifier_scores (with a BALANCED live-rule label —
        the old full-Gopher label was constant-0 on this corpus)."""
        from bireme_spark.queries.textops import (
            quality_classifier,
            quality_classifier_scores,
        )

        out = quality_classifier(spark, sf_dir)
        audit = out.collect()[0]
        assert out.columns == ["n_docs", "n_pos", "auc_floor_ppm", "auc_meets_floor"]
        assert audit.n_docs == 500
        assert 0 < audit.n_pos < audit.n_docs, "label must split the corpus"
        assert audit.auc_meets_floor

        scored = quality_classifier_scores(spark, sf_dir)
        rows = scored.collect()
        assert len(rows) == 500
        assert scored.columns == ["doc_id", "label", "score", "pred"]
        # scores are probabilities; predictions agree with the 0.5 cut
        assert all(0.0 <= r.score <= 1.0 for r in rows)
        assert all(r.pred == int(r.score >= 0.5) for r in rows)
        # the distilled model must beat always-predict-majority
        maj = max(
            sum(r.label for r in rows), len(rows) - sum(r.label for r in rows)
        ) / len(rows)
        acc = sum(int(r.pred == r.label) for r in rows) / len(rows)
        assert acc >= maj - 0.05
