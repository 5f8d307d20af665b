"""Child process for the two-engine contention test (NOT a pytest
module — driven by tests/test_service_e2e.py via subprocess).

argv: <root> <role> <tag>

Roles (each builds its OWN SparkSession + PolarEngine facade over the
SHARED store root — two full engines in separate processes, the
multi-broker shape the flock/ledger contracts claim to support):

  writer <tag>    produce 10 acked batches x 200 uniquely-valued
                  records, compacting the topic after every third batch
                  (produce-vs-produce offset reservation, compact-vs-
                  produce copy-on-write, compact-vs-compact mutex all
                  contend across processes). Appends "ACK <n>" per
                  durable batch to <tag>.log.
  consumer <tag>  register consumer <tag> in group g_<tag> and
                  poll/commit until 4000 records are served (2 writers
                  x 2000) or 240 s pass — runs CONCURRENTLY with the
                  writers, so polls race mid-compaction file swaps.
                  Appends one "REC <value>" line per served record and
                  exits 0 only on the full count.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOPIC = "contend"
N_BATCHES = 10
BATCH = 200
EXPECT = 2 * N_BATCHES * BATCH


def main() -> None:
    root, role, tag = sys.argv[1], sys.argv[2], sys.argv[3]

    from polar_spark.api import PolarEngine
    from polar_spark.session import get_spark

    spark = get_spark(
        app_name=f"contend_{tag}", master="local[4]", shuffle_partitions=4
    )
    eng = PolarEngine(spark, os.path.join(root, "store"))
    log = open(os.path.join(root, f"{tag}.log"), "a")

    def emit(lines: list[str]) -> None:
        log.write("".join(f"{ln}\n" for ln in lines))
        log.flush()
        os.fsync(log.fileno())

    if role == "writer":
        for b in range(N_BATCHES):
            vals = [f"{tag}:{b}:{i}" for i in range(BATCH)]
            eng.produce_rows(TOPIC, vals, key=f"k{b % 5}")
            emit([f"ACK {b}"])
            if b % 3 == 2:
                eng.catalog.compact(TOPIC)
        return

    # consumer role: poll concurrently with the writers until all
    # records from both writers have been served to THIS group
    eng.register(tag, f"g_{tag}", [TOPIC])
    seen = 0
    deadline = time.time() + 240
    while seen < EXPECT and time.time() < deadline:
        out = eng.poll(tag, max_records=500)
        res = out.get(TOPIC)
        recs = []
        if res is not None:
            for it in res.items():
                recs.extend(r[2] for r in it["records"])
            eng.commit(tag)
            res.release()
        if recs:
            emit([f"REC {v}" for v in recs])
            seen += len(recs)
        else:
            time.sleep(0.2)
    sys.exit(0 if seen == EXPECT else 3)


if __name__ == "__main__":
    main()
