"""Decade sweep for SemDeDup: fixed-codebook k-means cells vs
scale-adaptive banded sign-LSH cells.

The k-means-cell form (functions/similarity.semdedup_drop_ids with the
registry's 16-vector codebook) bounds pair work to O(Σ|cell|²) — but a
FIXED codebook means cell sizes grow with the corpus, so Σ|cell|² is
n²/16 no matter how the work is spread; and growing the codebook with
n makes nearest-centroid assignment the n·nlist quadratic instead (the
reason faiss assigns through an ANN index over the centroids). The
banded-LSH form (semdedup_lsh_drop_ids with the per-scale operating
point from lsh_operating_point) replaces both terms with the textbook
n^(1+ρ) bound — ρ ≈ 0.15 at SemDeDup's published τ = 0.95.

Corpus: the `signs` embeddings derivation (bench._build_scaled_corpus
emb_mode="signs") — replica pairs share a Murmur3-keyed coordinate
sign-flip pattern with a one-quantum epsilon on the odd twin, so every
even/odd replica pair is a planted cosine≈1 near-dup (TRUE output
grows linearly with the corpus) while cross-pattern pairs stay
near-orthogonal and directions spread across orthants (the default
`shift` derivation crowds one orthant at high factors and would
measure a degenerate hot bucket instead of scaling). Twins need
replica PAIRS, so the sweep's baseline is the 2× derived corpus and
every larger factor is even — all points share one dup-density regime.

Both variants run at τ = 0.95 over the same corpora; each point
records the scan control (a bare sum() over the same table) so "query
grew" is separable from "the host slowed". The k-means series stops at
20× — its 20× point already shuffles ~5e7 vector-carrying pairs; a
200× point would be ~5e9 (the quadratic is the finding, not a thing to
soak the host with).

Usage: python tools/measure_semdedup_decades.py
Env:   SPARK_GRAFT_SF_DIR  base corpus (default /root/testdata/sf0.1)
       POLAR_SEMDEDUP_REPORT  output path (default
       DECADES_r10_semdedup.json)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_FACTOR = 2
KMEANS_FACTORS = [6, 20]
LSH_FACTORS = [20, 200]
TAU_SQ_PCT = 9025  # τ = 0.95 (SemDeDup's published threshold)


def timed(f, n: int = 2) -> tuple[float, float, int]:
    """(first_s, best_s, result_count) over n runs."""
    times, cnt = [], 0
    for _ in range(n):
        t0 = time.perf_counter()
        cnt = f()
        times.append(time.perf_counter() - t0)
    return round(times[0], 3), round(min(times), 3), cnt


def main() -> None:
    import bench
    from polar_spark.functions.similarity import (
        lsh_operating_point,
        quantize,
        semdedup_drop_ids,
        semdedup_lsh_drop_ids,
    )
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table

    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    report = os.environ.get(
        "POLAR_SEMDEDUP_REPORT", os.path.join(REPO, "DECADES_r10_semdedup.json")
    )

    def qv_of(d: str):
        return load_table(spark, d, "embeddings").select(
            "vec_id", quantize("embedding").alias("v")
        )

    def scan(d: str) -> int:
        return (
            load_table(spark, d, "embeddings")
            .selectExpr("sum(size(embedding)) as s")
            .count()
        )

    def kmeans_run(d: str) -> int:
        qv = qv_of(d)
        cents = [
            (r["vec_id"], r["v"])
            for r in qv.orderBy("vec_id").limit(16).collect()
        ]
        return semdedup_drop_ids(qv, cents, tau_sq_pct=TAU_SQ_PCT).count()

    def lsh_run(d: str, n: int) -> int:
        bands, r = lsh_operating_point(n, 0.95, 0.95)
        return semdedup_lsh_drop_ids(
            qv_of(d),
            dims=64,
            bands=bands,
            planes_per_band=r,
            tau_sq_pct=TAU_SQ_PCT,
        ).count()

    n_base = load_table(spark, sf, "embeddings").count()
    out: dict = {
        "tau": 0.95,
        "base_sf_dir": sf,
        "base_factor": BASE_FACTOR,
        "base_n": n_base * BASE_FACTOR,
        "corpus": "signs derivation (planted even/odd cos~1 twins; "
        "true output linear by construction)",
        "kmeans16": {},
        "lsh_adaptive": {},
    }

    def measure(factor: int, k1: float | None, l1: float | None, s1: float | None):
        dst = tempfile.mkdtemp(prefix=f"semdedup_{factor}x_")
        try:
            bench._build_scaled_corpus(
                spark, dst, factor=factor, tables=("embeddings",),
                emb_mode="signs",
            )
            spark.catalog.clearCache()
            sq = timed(lambda: scan(dst))[1]  # doubles as page-warm
            tag = f"{factor}x"
            kq = lq = None
            if factor == BASE_FACTOR or factor in KMEANS_FACTORS:
                tf, tq, tc = timed(lambda: kmeans_run(dst))
                rec = {"query_s": tq, "first_s": tf, "scan_s": sq, "n_drops": tc}
                if k1:
                    rec["query_ratio"] = round(tq / k1, 2)
                    rec["scan_ratio"] = round(sq / s1, 2)
                out["kmeans16"][tag] = rec
                kq = tq
                print(json.dumps({f"kmeans {tag}": rec}), flush=True)
            if factor == BASE_FACTOR or factor in LSH_FACTORS:
                n = n_base * factor
                bands, r = lsh_operating_point(n, 0.95, 0.95)
                tf, tq, tc = timed(lambda: lsh_run(dst, n))
                rec = {
                    "query_s": tq, "first_s": tf, "scan_s": sq,
                    "n_drops": tc, "bands": bands, "planes_per_band": r,
                }
                if l1:
                    rec["query_ratio"] = round(tq / l1, 2)
                    rec["scan_ratio"] = round(sq / s1, 2)
                out["lsh_adaptive"][tag] = rec
                lq = tq
                print(json.dumps({f"lsh {tag}": rec}), flush=True)
            return kq, lq, sq
        finally:
            shutil.rmtree(dst, ignore_errors=True)

    k1, l1, s1 = measure(BASE_FACTOR, None, None, None)
    for factor in sorted(set(KMEANS_FACTORS + LSH_FACTORS)):
        measure(factor, k1, l1, s1)

    with open(report, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
