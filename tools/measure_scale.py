"""Isolated 1x-vs-10x scale measurement for any registry query.

The in-suite bench ratios (`scale10_ratio` in bench.py's output) divide
a 10x time taken mid-suite by an sf0.1 anchor taken at MAXIMUM warmth
(best-of-N, ~40 queries into a fully JIT-warm, memory-pressured
process). That context inflates ratios for cheap queries: the anchor is
at its floor while the 10x point carries the suite's GC/pool state.
This tool measures both points the same way — one fresh process, both
corpora page-warmed, best-of-3 per point — which is the apples-to-
apples number a capacity planner wants. `tools/measure_kmv_scale.py`
is the phase-level deep dive of the same discrepancy for the KMV
sketch (full query tracks a bare scan+md5; the anchor's warmth moves
the ratio, not the 10x cost).

Representative committed run (2026-08-14, local[32], sf0.1 anchors):

    query                      1x      10x     ratio   (in-suite read)
    sketch_kmv_distinct_users  0.865   2.668   3.08    (~4.7)
    dup_span_detect            0.551   1.475   2.68    (~4.8)

Both are join-free / single-corpus-shuffle plans whose 10x cost is
scan-linear row work; the in-suite ratios overstate them by the
anchor-warmth asymmetry above.

Usage: python tools/measure_scale.py [query ...]
       (default: sketch_kmv_distinct_users dup_span_detect)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = ["sketch_kmv_distinct_users", "dup_span_detect"]


def best(f, n: int = 3) -> float:
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        b = min(b, time.perf_counter() - t0)
    return round(b, 3)


def main() -> None:
    import bench
    from polar_spark.queries import QUERIES
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table

    names = sys.argv[1:] or DEFAULT_QUERIES
    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = tempfile.mkdtemp(prefix="scale_10x_")
    try:
        bench._build_scaled_corpus(spark, dst)
        for d in (sf, dst):  # page-warm both corpora
            for t in ("events", "documents", "lineitem", "orders"):
                load_table(spark, d, t).count()
        out: dict[str, dict[str, float]] = {}
        for name in names:
            fn = QUERIES[name].fn
            t1 = best(lambda: fn(spark, sf).count())
            t10 = best(lambda: fn(spark, dst).count())
            out[name] = {"1x": t1, "10x": t10, "ratio": round(t10 / t1, 2)}
        print(json.dumps(out, indent=1))
    finally:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
