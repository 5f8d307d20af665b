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
    # Round-5 rotation (VERDICT r4 ask #2): the 50 names sampled green in
    # CORRECTNESS_r04.json are pruned from the head; what remains is the 18
    # never-driver-sampled entries — 15 oracle-checked first, rows-only
    # last — followed by round-5 additions as they land. With ~50 sample
    # slots this head finally fits, so after round 5 every registry query
    # has at least one driver-green CORRECTNESS row.
    "knn_hard_negatives",
    "top_event_transitions",
    "profile_table_stats",
    "event_rate_anomaly",
    "scd2_user_type_intervals",
    "tfidf_top_terms_per_source",
    "impute_group_median",
    "outlier_iqr_by_type",
    "referential_integrity_audit",
    "session_entry_exit_paths",
    "equidepth_hist_doc_lengths",
    "orders_monthly_revenue_growth",
    "priority_share_by_month",
    "debounce_repeated_events",
    "customer_rfm_segments",
    # round-5 additions (oracle-checked)
    "equidepth_hist_doc_lengths_approx",
    "customer_rfm_segments_approx",
    "sketch_cm_stream_vs_batch",
    "sketch_kmv_stream_vs_batch",
    # rows-only (no SQL oracle) entries go last: if the sample cut lands
    # mid-head it drops the weakest checks first.
    "knn_pq_adc",
    "knn_ivfpq_stored",
    "semdedup_incremental",
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
