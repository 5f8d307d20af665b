"""The 2000×/4M-vector point the r10 shuffle-verify form could not
reach (DECADES_r10_semdedup.json ``note_2000x``): banded-LSH semantic
dedup over the MATERIALIZED (band, bucket) store
(sources/semlsh_index), where verification is partition-local and no
vector payload crosses a query-time shuffle.

Per factor this records:

- ``ingest_s`` — the one-time layout write (explode + bucketBy; narrow,
  shuffle-free) and the store's on-disk size;
- ``query_s`` — the stored partition-local verify (best of 2);
- ``scan_s`` — the bare-scan control separating host drift from query
  growth;
- ``n_drops`` — value check: the signs corpus plants one cos≈1 twin per
  even/odd replica pair, so the TRUE drop count is exactly n/2; and at
  factors where the r10 shuffle form also ran, equality with its
  committed counts is the cross-form law at scale (bit-identity is the
  sf-small pytest law, tests/test_semlsh_index.py).

Factors 20/200 share the r10 sweep's corpora parameters so the two
artifacts are directly comparable; 2000× is the new point. Bucket
count scales with the factor so a read task's local sort stays
~0.5 GB.

Usage: python tools/measure_semlsh_stored.py [factors...]
Env:   SPARK_GRAFT_SF_DIR     base corpus (default /root/testdata/sf0.1)
       POLAR_SEMLSH_REPORT    output (default DECADES_r11_semlsh_stored.json)
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

BASE_FACTOR = 2
DEFAULT_FACTORS = [20, 200, 2000]
TAU_SQ_PCT = 9025  # τ = 0.95 (SemDeDup's published threshold)


def main() -> None:
    import bench
    from polar_spark.functions.similarity import lsh_operating_point, quantize
    from polar_spark.session import get_spark
    from polar_spark.sources.semlsh_index import (
        semdedup_lsh_drop_ids_stored,
        write_semlsh_index,
    )
    from polar_spark.sources.tables import load_table

    factors = [int(a) for a in sys.argv[1:]] or DEFAULT_FACTORS
    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = os.environ.get(
        "POLAR_SEMLSH_REPORT",
        os.path.join(REPO, "DECADES_r11_semlsh_stored.json"),
    )
    n_base = load_table(spark, sf, "embeddings").count()

    if os.path.exists(report):  # merge-resume: keep completed factors
        with open(report) as fh:
            prior = json.load(fh)
        out: dict = prior
        out.setdefault("stored", {})
        # base record for ratio math
        base_rec = out["stored"].get(f"{BASE_FACTOR}x")
    else:
        base_rec = None
        out = {
            "tau": 0.95,
            "base_sf_dir": sf,
            "base_factor": BASE_FACTOR,
            "corpus": "signs derivation (planted even/odd cos~1 twins; "
            "true drops = n/2 by construction)",
            "stored": {},
        }

    def scan(d: str) -> int:
        return (
            load_table(spark, d, "embeddings")
            .selectExpr("sum(size(embedding)) as s")
            .count()
        )

    base = base_rec
    for factor in [BASE_FACTOR] + factors:
        if f"{factor}x" in out["stored"]:
            continue  # merge-resume: factor already measured
        n = n_base * factor
        bands, r = lsh_operating_point(n, 0.95, 0.95)
        num_buckets = 32 if factor <= 200 else 256
        dst = tempfile.mkdtemp(prefix=f"semlsh_stored_{factor}x_")
        store_path = tempfile.mkdtemp(prefix=f"semlsh_idx_{factor}x_")
        table = f"semlsh_sweep_{factor}x"
        try:
            bench._build_scaled_corpus(
                spark, dst, factor=factor, tables=("embeddings",),
                emb_mode="signs",
            )
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            sq = scan(dst)  # doubles as page-warm
            scan_s = time.perf_counter() - t0

            # the derived corpus lands as ONE file/row-group (the build
            # explodes a single-partition source), so without this the
            # whole explode+write would run in one task — repartition
            # first so ingest parallelizes like any multi-file corpus
            qv = (
                load_table(spark, dst, "embeddings")
                .repartition(32, "vec_id")
                .select("vec_id", quantize("embedding").alias("v"))
            )
            t0 = time.perf_counter()
            write_semlsh_index(
                qv, table, dims=64, bands=bands, planes_per_band=r,
                path=os.path.join(store_path, "t"),
                num_buckets=num_buckets,
            )
            ingest_s = time.perf_counter() - t0
            du = subprocess.run(
                ["du", "-sb", store_path], capture_output=True, text=True
            ).stdout.split()[0]

            times, cnt = [], 0
            for _ in range(2):
                t0 = time.perf_counter()
                cnt = semdedup_lsh_drop_ids_stored(
                    spark, table, TAU_SQ_PCT
                ).count()
                times.append(time.perf_counter() - t0)
            rec = {
                "n": n,
                "bands": bands,
                "planes_per_band": r,
                "num_buckets": num_buckets,
                "ingest_s": round(ingest_s, 3),
                "store_bytes": int(du),
                "query_s": round(min(times), 3),
                "first_s": round(times[0], 3),
                "scan_s": round(scan_s, 3),
                "n_drops": cnt,
                "expected_drops": n // 2,
                "drops_exact": cnt == n // 2,
            }
            if base:
                rec["query_ratio"] = round(rec["query_s"] / base["query_s"], 2)
                rec["ingest_ratio"] = round(
                    rec["ingest_s"] / base["ingest_s"], 2
                )
                rec["scan_ratio"] = round(
                    rec["scan_s"] / max(base["scan_s"], 1e-9), 2
                )
            else:
                base = rec
            out["stored"][f"{factor}x"] = rec
            print(json.dumps({f"stored {factor}x": rec}), flush=True)
            with open(report, "w") as fh:
                json.dump(out, fh, indent=1)
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            shutil.rmtree(dst, ignore_errors=True)
            shutil.rmtree(store_path, ignore_errors=True)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
