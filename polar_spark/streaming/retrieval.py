"""Continuously-maintained retrieval statistics: the BM25 stats table
of functions/retrieval.py kept fresh as a foreachBatch sink.

Document frequency, doc count, and token totals are all additive over
disjoint document sets (each doc lands in exactly one micro-batch), so
the inverted-index statistics a ranked-retrieval serving path needs
can be maintained exactly like the sketch/LM/DSIR sinks: per-epoch
partials under ``ep=<tag>`` partitions (idempotent retry, purge on
lineage reset — inherited from the sketch store), merged at READ time
over O(epochs · vocab) rows — never the raw stream.

This is the 100 TB shape for serving search over a growing corpus:
ingest lands vocabulary-bounded stats partials beside the topic; a
query scores its term-filtered posting trickle against the current
merged table (functions/retrieval.bm25_topk_from_stats) — no re-scan
of history, no stateful streaming query. Stream-built ≡ one-shot
BIT-identically (count additivity), so the law query inherits the
batch BM25 query's full value-hash DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from polar_spark.functions.retrieval import (
    STATS_SCHEMA,
    corpus_term_stats,
    merge_term_stats,
)
from polar_spark.streaming.sketches import _EpochPartialSink


class StreamingCorpusStats(_EpochPartialSink):
    """BM25 corpus statistics maintained per micro-batch of documents."""

    def __init__(
        self,
        spark: SparkSession,
        store_path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        super().__init__(spark, store_path)
        self.id_col = id_col
        self.text_col = text_col

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        return corpus_term_stats(batch_df, self.id_col, self.text_col)

    def _fold(self, stored: DataFrame) -> DataFrame:
        return merge_term_stats(stored)

    def stats(self) -> DataFrame:
        """The live stats table: per-term df rows plus the NULL-term
        corpus row, summed over all epochs — bit-identical to a
        one-shot ``corpus_term_stats`` over everything ingested."""
        stored = self._stored()
        if stored is None:
            return self.spark.createDataFrame([], STATS_SCHEMA)
        return self._fold(stored)
