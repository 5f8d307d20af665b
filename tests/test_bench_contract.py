"""The driver keeps only the last 2,000 chars of bench.py's output and
parses the trailing JSON line (BENCH_r04 was recorded `parsed: null`
because the r4 single-line report grew to ~3 KB). These tests pin the
summary-line contract: valid JSON, required keys, and a hard 1,500-char
cap even with a worst-case payload."""

import json

import bench


def _fake_inputs(n_queries: int):
    timings = {f"extremely_long_query_name_number_{i:03d}": 123.456 for i in range(n_queries)}
    for k in (
        "q1_pricing_summary",
        "q8_market_share",
        "dedup_minhash_verified",
        "dedup_simhash",
        "knn_ivf_probe",
        "text_quality_stats",
        "session_windows_30m",
        "ingest_events",
        "consume_events",
    ):
        timings[k] = 1.234
    extra = {
        "ingest_msgs_per_sec": 774199,
        "ingest_unkeyed_msgs_per_sec": 855021,
        "consume_msgs_per_sec": 2400123,
        "produce_latency_ms_p50": 557.2,
        "poll_latency_ms_p50": 438.9,
        "scale10_queries": {k: 9.87 for k in list(timings)[:25]},
        "scale10_ratio": {k: 1.0 + i * 0.1 for i, k in enumerate(list(timings)[:25])},
    }
    return timings, extra


def test_summary_line_is_parseable_and_bounded():
    timings, extra = _fake_inputs(60)
    line = bench.summary_line(timings, extra, 0.1, sum(timings.values()))
    assert len(line) <= 1500
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "suite_seconds"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert isinstance(parsed["queries"], dict) and parsed["queries"]
    ex = parsed["extra"]
    assert ex["n_queries"] == len(timings)
    assert ex["ingest_msgs_per_sec"] == 774199
    assert ex["scale10_worst_ratio"] == max(extra["scale10_ratio"].values())


def test_summary_line_sheds_queries_rather_than_overflow(monkeypatch):
    # force the cap below the subset-bearing size to prove the shed
    # branch produces a smaller, still-valid line
    timings, extra = _fake_inputs(10)
    full = bench.summary_line(timings, extra, 0.1, 1.0)
    monkeypatch.setattr(bench, "SUMMARY_MAX_CHARS", len(full) - 1)
    shed = bench.summary_line(timings, extra, 0.1, 1.0)
    assert len(shed) < len(full)
    assert json.loads(shed)["queries"] == {}


def test_summary_line_tolerates_missing_extras():
    line = bench.summary_line({"q1_pricing_summary": 0.5}, {}, None, 0.5)
    parsed = json.loads(line)
    assert parsed["extra"]["scale10_worst_ratio"] is None
    assert parsed["extra"]["ingest_msgs_per_sec"] is None
