"""Continuously-trained bigram LM: the quality-scoring model of
functions/lm.py maintained as a foreachBatch sink.

Bigram counts are additive (the same linearity that makes count-min
mergeable), so a stream of documents can keep the LM fresh
incrementally: each micro-batch writes its own vocabulary²-bounded
count partial under an ``ep=<tag>`` partition (idempotent retry, purge
on lineage reset — all inherited from the sketch store), and the live
LM is the sum over partials, merged at READ time over
O(epochs · vocab²) rows — never the raw stream.

This is the 100 TB shape for CCNet-style filtering of a growing corpus:
the ingest path lands count partials beside the topic; any scorer
materializes the current LM with one small merge and scores new
documents against it — no stateful streaming query, no re-scan of
history. Stream-trained and one-shot-trained models are BIT-identical
(count linearity), so the law query inherits the batch query's full
value-hash DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.functions.lm import score_bigram_nll, train_bigram_counts
from polar_spark.streaming.sketches import _EpochPartialSink


class StreamingBigramLM(_EpochPartialSink):
    """Bigram-count LM maintained per micro-batch of documents."""

    def __init__(self, spark: SparkSession, store_path: str, text_col: str = "text"):
        super().__init__(spark, store_path)
        self.text_col = text_col

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return train_bigram_counts(batch_df, self.text_col)

    def _fold(self, stored: DataFrame) -> DataFrame:
        return stored.groupBy("w1", "w2").agg(F.sum("c2").alias("c2"))

    def counts(self) -> DataFrame:
        """The live LM state: bigram counts summed over all epochs —
        bit-identical to one-shot training on everything ingested."""
        stored = self._stored()
        if stored is None:
            return self.spark.createDataFrame(
                [], "w1 string, w2 string, c2 bigint"
            )
        return self._fold(stored)

    def score(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> DataFrame:
        """Score documents against the CURRENT model (functions/lm.py
        semantics, including the stupid-backoff branch)."""
        return score_bigram_nll(docs, self.counts(), id_col, text_col)
