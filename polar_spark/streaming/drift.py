"""Continuously-maintained distribution-drift monitor: the PSI bucket
counts of queries/quality.drift_psi_length_buckets kept fresh as a
foreachBatch sink.

Bucket counts are plain additive tallies, so the drift monitor joins
the sketch/LM/DSIR/BM25 family of exactly-mergeable epoch stores: each
micro-batch lands an O(|buckets|) partial under an ``ep=`` partition
(idempotent retry, purge-on-lineage-reset inherited), and the live PSI
reads the summed counts — stream-built ≡ one-shot BIT-identical, so the
law query carries the batch query's full value-hash oracle.

This is the 100 TB operational shape: the ingest path lands tiny bucket
partials beside the topic; the drift dashboard (or an alerting job)
computes PSI from O(epochs · buckets) stored rows — never re-scanning
corpus history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.streaming.sketches import _EpochPartialSink


class StreamingDrift(_EpochPartialSink):
    """Per-bucket slice-count partials maintained per micro-batch.

    ``bucket_expr`` / ``p_pred`` / ``q_pred`` are SQL strings defining
    the bucketing and the two compared slices (reference P, current Q).
    """

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        bucket_expr: str = "n_chars DIV 50",
        p_pred: str = "doc_id % 2 = 0",
        q_pred: str = "doc_id % 2 = 1",
    ):
        super().__init__(spark, store_path)
        self.bucket_expr = bucket_expr
        self.p_pred = p_pred
        self.q_pred = q_pred

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                F.expr(self.bucket_expr).alias("bucket"),
                F.expr(f"CASE WHEN {self.p_pred} THEN 1 ELSE 0 END").alias("_p"),
                F.expr(f"CASE WHEN {self.q_pred} THEN 1 ELSE 0 END").alias("_q"),
            )
            .groupBy("bucket")
            .agg(F.sum("_p").alias("cp0"), F.sum("_q").alias("cq0"))
        )

    def _fold(self, stored: DataFrame) -> DataFrame:
        return stored.groupBy("bucket").agg(
            F.sum("cp0").alias("cp0"), F.sum("cq0").alias("cq0")
        )

    def counts(self) -> DataFrame:
        """Summed raw bucket counts over all epochs (pre-smoothing)."""
        stored = self._stored()
        if stored is None:
            return self.spark.createDataFrame(
                [], "bucket bigint, cp0 bigint, cq0 bigint"
            )
        return self._fold(stored)

    def psi(self) -> DataFrame:
        """The live PSI table — identical arithmetic to the batch query
        (add-one smoothing, exact-integer ln_nano terms)."""
        from polar_spark.functions.ln_portable import ln_nano_expr

        b = self.counts().select(
            "bucket",
            (F.col("cp0") + 1).alias("cp"),
            (F.col("cq0") + 1).alias("cq"),
        )
        tot = b.agg(
            F.sum("cp").cast("long").alias("np"),
            F.sum("cq").cast("long").alias("nq"),
        )
        lp = ln_nano_expr("cp * nq", "spark")
        lq = ln_nano_expr("cq * np", "spark")
        return b.crossJoin(F.broadcast(tot)).select(
            "bucket",
            F.col("cp").cast("long").alias("cp"),
            F.col("cq").cast("long").alias("cq"),
            F.expr(
                f"CAST((cp * nq - cq * np) * (({lp}) - ({lq})) AS BIGINT)"
            ).alias("psi_term_scaled"),
        )
