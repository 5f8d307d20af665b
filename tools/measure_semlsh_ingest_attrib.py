"""Stored-LSH ingest cost attribution (VERDICT r11 ask #6).

The 2000x sweep's ingest per-decade ratios were 2.4x / 12.5x / 3.9x
(DECADES_r11_semlsh_stored.json) — the middle decade (20x -> 200x)
exceeds the 10x row growth. Two candidate terms:

1. the OPERATING POINT: lsh_operating_point grows bands x planes with
   the corpus (17x16=272 planes at 40k rows -> 23x19=437 at 400k), so
   ingest work per row — one (batch x dims)(dims x bands.planes)
   matmul plus bands exploded rows written — grows by
   437/272 = 1.61x (matmul) and 23/17 = 1.35x (write volume) on top
   of the 10x rows;
2. bucketBy WRITE FAN-OUT: each write task emits one file per
   (band, bpre) hash bucket it touches, so more buckets could mean
   more small-file overhead per task.

Method: at the decade's two endpoints (factors 20 and 200, signs
corpus), time write_semlsh_index under a small variant matrix —
operating-point bands/planes vs the SMALL point's bands/planes pinned,
and num_buckets 32 vs 256 — and compare each measured ratio against
the work-term predictions. If the pinned-bands 200x run lands at ~10x
the 20x anchor, the middle decade's excess IS the operating point
(inherent: recall at fixed tau needs n^rho more planes), not a write
pathology; if the 256-bucket run diverges from the 32-bucket one, the
fan-out term is real and needs a fix.

Usage: python tools/measure_semlsh_ingest_attrib.py
Env:   SPARK_GRAFT_SF_DIR    base corpus (default /root/testdata/sf0.1)
       POLAR_ATTRIB_REPORT   output (default INGEST_ATTRIB_r12.json)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAU = 0.95


def main() -> None:
    import bench
    from polar_spark.functions.similarity import lsh_operating_point, quantize
    from polar_spark.session import get_spark
    from polar_spark.sources.semlsh_index import write_semlsh_index
    from polar_spark.sources.tables import load_table

    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = os.environ.get(
        "POLAR_ATTRIB_REPORT", os.path.join(REPO, "INGEST_ATTRIB_r12.json")
    )
    n_base = load_table(spark, sf, "embeddings").count()

    b20, r20 = lsh_operating_point(n_base * 20, TAU, 0.95)
    b200, r200 = lsh_operating_point(n_base * 200, TAU, 0.95)
    variants = [
        # (label, factor, bands, planes, num_buckets)
        ("f20_op32", 20, b20, r20, 32),           # sweep's 20x point
        ("f200_op32", 200, b200, r200, 32),       # sweep's 200x point
        ("f200_pinned32", 200, b20, r20, 32),     # operating point pinned
        ("f200_op256", 200, b200, r200, 256),     # bucket fan-out probe
        ("f20_op256", 20, b20, r20, 256),
    ]
    out: dict = {
        "tau": TAU,
        "n_base": n_base,
        "op_20x": [b20, r20],
        "op_200x": [b200, r200],
        "points": {},
    }

    corpora: dict[int, str] = {}
    try:
        for factor in sorted({v[1] for v in variants}):
            dst = tempfile.mkdtemp(prefix=f"attrib_c{factor}_")
            bench._build_scaled_corpus(
                spark, dst, factor=factor, tables=("embeddings",),
                emb_mode="signs",
            )
            # page-warm so the first timed variant isn't a cold read
            load_table(spark, dst, "embeddings").selectExpr(
                "sum(size(embedding)) as s"
            ).count()
            corpora[factor] = dst

        for label, factor, bands, r, nb in variants:
            qv = (
                load_table(spark, corpora[factor], "embeddings")
                .repartition(32, "vec_id")
                .select("vec_id", quantize("embedding").alias("v"))
            )
            store = tempfile.mkdtemp(prefix=f"attrib_s_{label}_")
            table = f"attrib_{label}"
            try:
                t0 = time.perf_counter()
                write_semlsh_index(
                    qv, table, dims=64, bands=bands, planes_per_band=r,
                    path=os.path.join(store, "t"), num_buckets=nb,
                )
                ingest_s = time.perf_counter() - t0
                du = subprocess.run(
                    ["du", "-sb", store], capture_output=True, text=True
                ).stdout.split()[0]
                nfiles = sum(
                    len(fs) for _, _, fs in os.walk(store)
                )
                rec = {
                    "factor": factor, "bands": bands, "planes": r,
                    "num_buckets": nb, "ingest_s": round(ingest_s, 3),
                    "store_bytes": int(du), "files": nfiles,
                }
                out["points"][label] = rec
                print(json.dumps({label: rec}), flush=True)
            finally:
                spark.sql(f"DROP TABLE IF EXISTS {table}")
                shutil.rmtree(store, ignore_errors=True)
    finally:
        for d in corpora.values():
            shutil.rmtree(d, ignore_errors=True)

    p = out["points"]
    if {"f20_op32", "f200_op32", "f200_pinned32", "f200_op256"} <= set(p):
        anchor = p["f20_op32"]["ingest_s"]
        out["ratios"] = {
            "measured_op": round(p["f200_op32"]["ingest_s"] / anchor, 2),
            "measured_pinned": round(
                p["f200_pinned32"]["ingest_s"] / anchor, 2
            ),
            "bucket256_vs_32_at_200x": round(
                p["f200_op256"]["ingest_s"] / p["f200_op32"]["ingest_s"], 2
            ),
            "predicted_rows_only": 10.0,
            "predicted_rows_x_matmul": round(
                10.0 * (b200 * r200) / (b20 * r20), 2
            ),
            "predicted_rows_x_writevol": round(10.0 * b200 / b20, 2),
        }
    with open(report, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
