"""Continuously-maintained DSIR model: the hashed-ngram importance
model of functions/dsir.py kept fresh as a foreachBatch sink.

Bucket counts are additive (the same linearity as count-min / the
bigram LM), so a stream of documents maintains the target/raw
multinomials incrementally: each micro-batch writes its own m-bounded
(bucket, cq, cp) partial under an ``ep=<tag>`` partition (idempotent
retry, purge on lineage reset — inherited from the sketch store), and
the live model is the sum over partials, merged at READ time over
O(epochs · m) rows — never the raw stream.

This is the 100 TB shape for importance-weighted selection over a
growing corpus: ingest lands count partials beside the topic; any
selector materializes the current model with one tiny merge and scores
candidate documents against it. Stream-built and one-shot models are
BIT-identical (count linearity), so the law query inherits the batch
query's full value-hash DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from polar_spark.functions.dsir import bucket_counts, score_against_counts
from polar_spark.streaming.sketches import _EpochPartialSink


class StreamingDSIR(_EpochPartialSink):
    """DSIR bucket-count model maintained per micro-batch of documents.

    ``target`` is an SQL boolean expression string (e.g.
    ``"lang = 'en'"``) rather than a Column so the sink can be
    constructed before any SparkSession exists (module-import safety,
    same rule as queries/sketch_stream._SPLITS)."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        target: str,
        m: int = 4096,
        id_col: str = "doc_id",
    ):
        super().__init__(spark, store_path)
        self.target = target
        self.m = m
        self.id_col = id_col

    def _target_col(self) -> Column:
        return F.expr(self.target)

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return bucket_counts(batch_df, self._target_col(), self.m, self.id_col)

    def _fold(self, stored: DataFrame) -> DataFrame:
        return stored.groupBy("bucket").agg(
            F.sum("cq").alias("cq"), F.sum("cp").alias("cp")
        )

    def counts(self) -> DataFrame:
        """The live model state: bucket counts summed over all epochs —
        bit-identical to one-shot counting over everything ingested."""
        stored = self._stored()
        if stored is None:
            return self.spark.createDataFrame([], "bucket bigint, cq bigint, cp bigint")
        return self._fold(stored)

    def score(self, docs: DataFrame) -> DataFrame:
        """Score documents against the CURRENT model (functions/dsir.py
        semantics; buckets the model never saw contribute 0)."""
        return score_against_counts(docs, self.counts(), self.m, self.id_col)
