"""Dup-storm greedy: driver work must stay bounded past the pair cap
(VERDICT r11 ask #4).

The r11 bounded greedy capped driver MEMORY but still collected every
range's pairs and looped in driver Python — O(total pairs) driver TIME.
The r12 form resolves each id range on an EXECUTOR (one
single-partition mapInPandas per range) and collects only the range's
NEW drop ids, so driver Python does O(ranges + drops) work.

This tool measures exactly that split on synthetic storm batches whose
verified-pair volume is a chosen multiple of the cap:

- ``wall_s`` — end-to-end _greedy_drops time;
- ``driver_cpu_s`` — the driver process's CPU time across the call
  (time.process_time): the r11 form's driver_cpu tracked wall 1:1
  (the drain loop ran here); the r12 form's must be a small fraction
  (job orchestration + drop-id collection only);
- ``matches_reference`` — drop set ≡ the unbounded sequential loop.

Corpus shape: ids in clusters of CLUSTER near-dups each; every
within-cluster pair is "verified", so drops = all but each cluster
minimum and pair volume = k·c·(c−1)/2, scaled by cluster count.

Usage: python tools/measure_greedy_storm.py [pair_multiples...]
Env:   POLAR_GREEDY_REPORT (default GREEDY_STORM_r12.json)
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CAP = 100_000
CLUSTER = 200  # 19,900 pairs per cluster


def main() -> None:
    from pyspark.sql import functions as F

    from polar_spark.session import get_spark
    from polar_spark.streaming.dedup import _greedy_drops

    spark = get_spark()
    report = os.environ.get(
        "POLAR_GREEDY_REPORT", os.path.join(REPO, "GREEDY_STORM_r12.json")
    )
    multiples = [int(a) for a in sys.argv[1:]] or [10, 40]
    out: dict = {"cap": CAP, "cluster": CLUSTER, "points": []}

    for mult in multiples:
        per_cluster = CLUSTER * (CLUSTER - 1) // 2
        k = max(1, (CAP * mult) // per_cluster)
        n = k * CLUSTER
        ids = spark.range(n).select(
            F.col("id").alias("id_a"), (F.col("id") / CLUSTER).cast("long").alias("c")
        )
        pairs = (
            ids.join(
                ids.select(F.col("id_a").alias("id_b"), "c"), "c"
            )
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .persist()
        )
        total = pairs.count()

        t0w, t0c = time.perf_counter(), time.process_time()
        dropped = _greedy_drops(spark, pairs, set(), cap=CAP)
        wall = time.perf_counter() - t0w
        cpu = time.process_time() - t0c

        # reference: the unbounded sequential loop over all pairs
        rows = pairs.collect()
        ref: set[int] = set()
        partners: dict[int, list[int]] = {}
        for r in rows:
            partners.setdefault(r["id_b"], []).append(r["id_a"])
        for b in sorted(partners):
            if b in ref:
                continue
            if any(a not in ref for a in partners[b]):
                ref.add(b)
        pairs.unpersist()

        pt = {
            "pair_multiple_of_cap": mult,
            "pairs": total,
            "ids": n,
            "ranges": -(-total // CAP),
            "wall_s": round(wall, 3),
            "driver_cpu_s": round(cpu, 3),
            "driver_cpu_frac": round(cpu / wall, 3),
            "drops": len(dropped),
            "expected_drops": n - k,  # all but each cluster minimum
            "matches_reference": dropped == ref,
        }
        out["points"].append(pt)
        print(json.dumps(pt), flush=True)
        with open(report, "w") as fh:
            json.dump(out, fh, indent=1)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
