"""Multi-decade scale sweep for a registry query over one fact table.

Builds per-factor replicated corpora (each replica a distinct row —
bench._build_scaled_corpus's per-table derivations) and measures, at
every factor, (a) the query and (b) a bare sum()-scan of the same
table — the control that separates "the query scales like the scan"
from "the query has a superlinear term".

Notable shapes this measures honestly:
- events + sketch_kmv_distinct_users: user_id values repeat across
  replicas, so distinct cardinality stays FIXED while rows grow — the
  dup-heavy regime where the KMV prefilter must get out of the way
  (functions/sketches.py).
- embeddings + knn_ivf_stored_cells: each decade re-materializes its
  own IVF cell store, so the point includes index build + probe — the
  full stored-cell lifecycle, not just the probe.

One fresh process, every corpus page-warmed by its own scan control
run, best-of-2 per point (the expensive top factor too — decades are
minutes, a 2× wall cost buys retry-noise immunity at the point that
matters most).

Usage: python tools/measure_decades.py [query] [factor ...] [--table=T]
       [--salt=N]  (defaults: sketch_kmv_distinct_users 10 100 1000
       --table=events --salt=4; use --salt=1 for simhash-radius-safe,
       output-linear document replicas)

Representative committed runs live in SURVEY.md §14.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def runs(f, n: int = 2) -> tuple[float, float]:
    """(first, best) over n runs. Reporting BOTH matters for queries
    with one-time per-corpus state (the IVF stored-cell path
    materializes its cell store on first touch): `first` carries
    build+probe, `best` the steady-state probe — folding them into one
    best-of-n silently drops the build cost from the record."""
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        times.append(time.perf_counter() - t0)
    return round(times[0], 3), round(min(times), 3)


def best(f, n: int = 2) -> float:
    return runs(f, n)[1]


def main() -> None:
    import bench
    from polar_spark.queries import QUERIES
    from polar_spark.session import get_spark
    from polar_spark.sources.tables import load_table

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    table = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--table=")),
        "events",
    )
    # --tables=a,b: replicate SEVERAL fact tables per decade (queries
    # that join two scaled facts, e.g. hybrid retrieval over documents
    # AND embeddings); the scan control still probes --table
    tables = tuple(
        next(
            (
                a.split("=", 1)[1].split(",")
                for a in sys.argv[1:]
                if a.startswith("--tables=")
            ),
            [table],
        )
    )
    # --salt=N: documents-derivation salt density (1 = every word —
    # the simhash-calibrated, output-linear variant; default 4 = the
    # minhash-calibrated one). See bench._build_scaled_corpus.
    salt = int(next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--salt=")),
        "4",
    ))
    name = args[0] if args else "sketch_kmv_distinct_users"
    factors = [int(a) for a in args[1:]] or [10, 100, 1000]
    fn = QUERIES[name].fn
    spark = get_spark()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    probes = {
        "events": "sum(value) as s",
        "documents": "sum(octet_length(text)) as s",
        "embeddings": "sum(size(embedding)) as s",
        "lineitem": "sum(l_extendedprice) as s",
        "orders": "sum(o_totalprice) as s",
    }

    def scan(d: str) -> None:
        load_table(spark, d, table).selectExpr(probes[table]).count()

    out: dict[str, dict[str, float]] = {}
    qf1, q1 = runs(lambda: fn(spark, sf).count())
    s1 = best(lambda: scan(sf))
    out["1x"] = {"query_s": q1, "first_s": qf1, "scan_s": s1}
    for factor in factors:
        dst = tempfile.mkdtemp(prefix=f"decade_{factor}x_")
        try:
            bench._build_scaled_corpus(
                spark, dst, factor=factor, tables=tables,
                doc_salt_every=salt,
            )
            spark.catalog.clearCache()
            sq = best(lambda: scan(dst))  # doubles as the page-warm
            tqf, tq = runs(lambda: fn(spark, dst).count())
            out[f"{factor}x"] = {
                "query_s": tq,
                "first_s": tqf,
                "scan_s": sq,
                "query_ratio": round(tq / q1, 2),
                "first_ratio": round(tqf / qf1, 2) if qf1 else None,
                "scan_ratio": round(sq / s1, 2),
            }
            print(json.dumps({f"{factor}x": out[f"{factor}x"]}), flush=True)
        finally:
            shutil.rmtree(dst, ignore_errors=True)
    print(json.dumps({"query": name, "decades": out}, indent=1))


if __name__ == "__main__":
    main()
