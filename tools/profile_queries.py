"""Per-query profile: best-of-2 wall time + Spark job/stage counts.

Usage: python tools/profile_queries.py [name ...]   (default: bench HEADLINE)

For each query, runs fn(spark, SF_DIR).count() twice inside a dedicated
job group and reports: best seconds, first-run seconds (codegen/compile
cost), number of jobs, and number of stages (run 2 — the steady state).
High job counts flag construction-time collects / eager persists; a
large run1-run2 gap flags codegen/broadcast compile overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("POLAR_ORACLE_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from polar_spark.queries import QUERIES
    from polar_spark.session import get_spark

    import bench

    names = sys.argv[1:] or bench.HEADLINE
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(app_name="polar_profile", shuffle_partitions=cpus)
    sc = spark.sparkContext
    bench._warmup(spark)

    out = {}
    for name in names:
        fn = QUERIES[name].fn
        times = []
        jobs_per_run = []
        stages_per_run = []
        for r in range(2):
            group = f"prof_{name}_{r}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, SF_DIR).count()
            times.append(time.perf_counter() - t0)
            sc.setJobGroup(None, None)
            tracker = sc.statusTracker()
            ids = tracker.getJobIdsForGroup(group)
            jobs_per_run.append(len(ids))
            n_stages = 0
            for jid in ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    n_stages += len(info.stageIds)
            stages_per_run.append(n_stages)
        out[name] = {
            "best_sec": round(min(times), 3),
            "run1_sec": round(times[0], 3),
            "jobs_run2": jobs_per_run[1],
            "stages_run2": stages_per_run[1],
        }
        print(
            f"{out[name]['best_sec']:7.3f}s  run1={out[name]['run1_sec']:7.3f}s "
            f"jobs={out[name]['jobs_run2']:3d} stages={out[name]['stages_run2']:3d}  {name}",
            flush=True,
        )
    spark.stop()
    path = os.environ.get("POLAR_PROFILE_OUT")
    if path:
        with open(path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
