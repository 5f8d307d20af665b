"""Decade sweep for IVF coarse ASSIGNMENT with nlist grown as √n —
flat nearest-centroid vs two-level (super-cell routed, exact).

The r10 semdedup analysis stated the term this tool measures: flat
assignment is O(n·nlist), so growing nlist as √n (the standard IVF
sizing) makes ingest assignment O(n^1.5) — per-VECTOR cost grows
√10 ≈ 3.16× per decade. Two-level assignment
(functions/similarity.ivf_cell_twolevel) routes each vector through
~√nlist super-cells plus the members of the few super-cells that
survive a triangle-inequality bound, so per-vector cost grows like
n^0.25 per decade (≈1.8×) — and the results are EXACT (equality
asserted per factor, not assumed; tests/test_operators.py pins the
tie law).

Each point records per-vector µs for both paths, the flat/two-level
speedup, a bare-scan control, and the mismatch count (must be 0).

Usage: python tools/measure_ivf_assign_decades.py [factors...]
Env:   SPARK_GRAFT_SF_DIR    base corpus (default /root/testdata/sf0.1)
       POLAR_IVF_REPORT      output (default DECADES_r11_ivf_assign.json)
"""
from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_FACTORS = [2, 20, 200]
# flat at 2000x IS the quadratic — include it only when explicitly asked
FLAT_MAX_FACTOR = int(os.environ.get("POLAR_IVF_FLAT_MAX", "200"))


def main() -> None:
    import bench
    from pyspark.sql import functions as F

    from polar_spark.functions.similarity import (
        ivf_cell,
        ivf_cell_twolevel,
        quantize,
    )
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table

    factors = [int(a) for a in sys.argv[1:]] or DEFAULT_FACTORS
    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = os.environ.get(
        "POLAR_IVF_REPORT", os.path.join(REPO, "DECADES_r11_ivf_assign.json")
    )
    n_base = load_table(spark, sf, "embeddings").count()

    if os.path.exists(report):  # merge-resume: keep completed factors
        with open(report) as fh:
            out: dict = json.load(fh)
        out.setdefault("points", {})
    else:
        out = {
            "base_sf_dir": sf,
            "nlist_rule": "isqrt(n)",
            "points": {},
        }

    def timed(f, runs: int = 2):
        best, val = float("inf"), None
        for _ in range(runs):
            t0 = time.perf_counter()
            val = f()
            best = min(best, time.perf_counter() - t0)
        return best, val

    base_flat = base_two = base_scan = None
    b = out["points"].get("2x")
    if b:
        base_two = b["two_us_per_vec"]
        base_flat = b.get("flat_us_per_vec")
        base_scan = b["scan_s"]
    for factor in factors:
        if f"{factor}x" in out["points"]:
            continue  # merge-resume: factor already measured
        n = n_base * factor
        nlist = max(4, math.isqrt(n))
        dst = tempfile.mkdtemp(prefix=f"ivf_assign_{factor}x_")
        try:
            bench._build_scaled_corpus(
                spark, dst, factor=factor, tables=("embeddings",),
                emb_mode="signs",
            )
            spark.catalog.clearCache()
            qv = (
                load_table(spark, dst, "embeddings")
                .repartition(32, "vec_id")
                .select("vec_id", quantize("embedding").alias("v"))
                .persist()
            )
            qv.count()  # materialize once so assignment time is pure
            cents = [
                (r["vec_id"], r["v"])
                for r in qv.filter(F.col("vec_id") < nlist).collect()
            ]
            scan_s, _ = timed(
                lambda: qv.selectExpr("sum(size(v))").count()
            )

            def run(assign):
                return (
                    qv.select(assign("v", cents).alias("cell"))
                    .agg(F.sum("cell"))
                    .collect()[0][0]
                )

            two_s, two_sum = timed(lambda: run(ivf_cell_twolevel))
            rec = {
                "n": n,
                "nlist": nlist,
                "scan_s": round(scan_s, 3),
                "two_s": round(two_s, 3),
                "two_us_per_vec": round(two_s / n * 1e6, 3),
            }
            if factor <= FLAT_MAX_FACTOR:
                flat_s, flat_sum = timed(lambda: run(ivf_cell))
                mism = (
                    qv.select(
                        ivf_cell("v", cents).alias("a"),
                        ivf_cell_twolevel("v", cents).alias("b"),
                    )
                    .filter(F.col("a") != F.col("b"))
                    .count()
                )
                rec.update(
                    {
                        "flat_s": round(flat_s, 3),
                        "flat_us_per_vec": round(flat_s / n * 1e6, 3),
                        "speedup": round(flat_s / two_s, 2),
                        "mismatches": mism,
                        "sums_equal": bool(flat_sum == two_sum),
                    }
                )
            if base_two:
                rec["two_us_ratio"] = round(
                    rec["two_us_per_vec"] / base_two, 2
                )
                rec["scan_ratio"] = round(scan_s / max(base_scan, 1e-9), 2)
                if "flat_us_per_vec" in rec and base_flat:
                    rec["flat_us_ratio"] = round(
                        rec["flat_us_per_vec"] / base_flat, 2
                    )
            else:
                base_two = rec["two_us_per_vec"]
                base_flat = rec.get("flat_us_per_vec")
                base_scan = scan_s
            qv.unpersist()
            out["points"][f"{factor}x"] = rec
            print(json.dumps({f"{factor}x": rec}), flush=True)
            with open(report, "w") as fh:
                json.dump(out, fh, indent=1)
        finally:
            shutil.rmtree(dst, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
