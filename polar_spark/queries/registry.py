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
    # Round-11 rotation (VERDICT r10 ask #5): (a) the queries this
    # round's changes touch — the NEW stored-index semdedup, the salted
    # recall ground truth, the LSH sink whose greedy is now
    # driver-bounded, and the consume flow behind the segment-cache
    # steal-tombstone fix; then (b) the ~44 OLDEST-driver-evidence
    # entries (last sampled r4-r7 — stateful trio, curation family,
    # multimodal, breadth queries) so cumulative driver evidence
    # refreshes oldest-first.
    "semdedup_lsh_stored",  # NEW r11 — partition-local stored-index verify
    "semdedup_recall_lsh_vs_exact",  # r11: salted pair generation
    "semdedup_lsh_incremental",  # r11: sink greedy now driver-bounded
    "consume_poll_window",  # r11: steal-tombstone in the segment cache
    "consume_log_start_jump",  # r11: consume flow re-proof
    # oldest driver evidence (r4)
    "quantiles_order_prices",
    "quota_downsample_per_source",
    "retention_cohort_daily",
    "skew_salted_agg",
    "skew_salted_join",
    "split_train_eval_deterministic",
    "sql_correlated_scalar_subquery",
    "sql_not_in_null_aware",
    "stateful_dedup_builtin",
    "stateful_dedup_stream",
    "stream_join_click_purchase",
    "text_redact_numbers",
    "window_function_breadth",
    # oldest driver evidence (r5)
    "debounce_repeated_events",
    "event_rate_anomaly",
    "impute_group_median",
    "outlier_iqr_by_type",
    "profile_table_stats",
    "referential_integrity_audit",
    "scd2_user_type_intervals",
    "session_entry_exit_paths",
    "top_event_transitions",
    # oldest driver evidence (r6)
    "binary_frame_roundtrip",
    "bpe_pair_merge_counts",
    "consume_seek_timestamp",
    "customer_rfm_segments",
    "customer_rfm_segments_approx",
    "dup_span_detect",
    "equidepth_hist_doc_lengths",
    "equidepth_hist_doc_lengths_approx",
    "knn_ivfpq_recall_law",
    "knn_pq_recall_law",
    "multimodal_audio_energy",
    "ndjson_roundtrip",
    "pivot_user_cohort_events",
    "q13_order_count_dist",
    "q4_priority_late_ship",
    "sketch_cm_stream_vs_batch",
    "stateful_offset_assign",
    # oldest driver evidence (r7)
    "argmax_top_event",
    "chunk_documents_sliding",
    "dedup_exact_canonical",
    "dedup_minhash_lsh",
    "distinct_aggregates",
    "doc_fingerprint_rolling",
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
