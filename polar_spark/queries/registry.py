from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB ANSI SQL; None → driver runs rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}

# The driver's per-round CORRECTNESS pass samples the first ~50 entries of
# queries(). Registration order follows module import order, which left the
# tail of the registry permanently unsampled. SAMPLE_HEAD lists queries that
# have never appeared in a driver sample (VERDICT r3) — query_map() emits
# them first so the next sample covers them; everything else follows in
# registration order.
SAMPLE_HEAD: tuple[str, ...] = (
    # Round-7 rotation (VERDICT r6 next #5): lead with DRIVER-EVIDENCE
    # AGE — the ~50-slot sample should refresh the queries whose last
    # driver-green is oldest. Two exceptions head the list: the
    # produce/poll request-path rewrite (r7) must re-prove its two law
    # queries (VERDICT r6 next #1 'Done' condition), and the handful of
    # queries whose implementation changed this round close the head.
    # Ages computed from CORRECTNESS_r0{1..6}.json (last hash/rows-green
    # round per query).
    "ingest_partition_offset",   # r7-changed: produce_rows/stamped files
    "consume_poll_window",       # r7-changed: arrow poll serving
    # --- new late-r7: the six adapted dwarfs completing the TPC-H 22 ---
    "q2_min_cost_supplier",
    "q11_important_parts",
    "q12_late_lines_by_status",
    "q16_supplier_cnt_by_part",
    "q20_excess_qty_suppliers",
    "q21_waiting_suppliers",
    # --- new late-r7: DSIR data selection (scores + Gumbel resample) ---
    "dsir_importance_scores",
    "dsir_resample_select",
    # --- new late-r7: bottom-k quantile sketch (batch + merge law) ---
    "sketch_quantiles_by_type",
    "sketch_qs_stream_vs_batch",
    "dsir_stream_vs_batch",
    "kmeans_lloyd_quantized",
    "bm25_topk_docs",            # new r7: never driver-sampled
    "er_fuzzy_name_pairs",       # new r7: never driver-sampled
    "bm25_stream_vs_batch",      # new r7: never driver-sampled
    "pagerank_event_graph",      # new r7: never driver-sampled
    "hybrid_rrf_retrieval",      # new r7: never driver-sampled
    "lm_bigram_nll_score",       # new r7: never driver-sampled
    "weighted_sample_per_source",  # new r7: never driver-sampled
    "lm_stream_vs_batch",          # new r7: never driver-sampled
    # --- last driver evidence r0-r1 (rows-only entries aged r0) ---
    "knn_ivf_trained",
    "knn_ivfpq_stored",
    "knn_pq_adc",
    "semdedup_incremental",      # r7-changed too: checkpoint trace
    "argmax_top_event",
    "distinct_aggregates",
    "grouping_sets_mix",
    "pagination_offset_limit",   # r7-changed too: global_rank trace
    "scalar_function_breadth",
    "sql_exists_subquery",
    # --- last driver evidence r2 ---
    "dedup_embedding_cosine",
    "embedding_lsh_buckets",
    "embedding_norm_stats",
    "multimodal_blob_meta",
    "multimodal_frame_sample",
    "multimodal_resize",
    # --- last driver evidence r3 ---
    "chunk_documents_sliding",
    "dedup_exact_canonical",
    "dedup_keep_list",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_ngram_jaccard",
    "doc_fingerprint_rolling",
    "funnel_click_to_purchase",
    "gapfill_hourly_locf",
    "json_payload_extract",
    "knn_bruteforce_dot",
    "knn_ivf_probe",
    "knn_label_vote",
    "lang_id_heuristic",
    "pipeline_training_data_prep",
    "rollup_time_multires",
    "session_windows_30m",
    "sketch_cm_heavy_hitters",
    "sketch_kmv_distinct_users",
    "sketch_kmv_merged_months",
    "text_quality_stats",
    "text_regexp_extract_stats",
    "text_repetition_stats",
    "text_word_diversity",
    "token_count_bpe_ish",
    "window_sliding_1h_30m",
    "window_tumbling_hourly",
    # --- r7 implementation changes (re-prove post-change) ---
    "dedup_simhash",             # groups persist (was localCheckpoint)
    "customer_rfm_segments",     # global_rank trace instrumentation
    "customer_rfm_segments_approx",
    "equidepth_hist_doc_lengths",  # ntile_bounds decimal division
    "consume_reset_latest",
    "dedup_redelivered_events",
)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _ordered() -> list[QuerySpec]:
    head = [QUERIES[n] for n in SAMPLE_HEAD if n in QUERIES]
    tail = [s for n, s in QUERIES.items() if n not in SAMPLE_HEAD]
    return head + tail


def query_map() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {s.name: s.fn for s in _ordered()}


def oracle_map() -> dict[str, str]:
    return {s.name: s.oracle for s in _ordered() if s.oracle is not None}
