"""Child process for the consumer-side SIGKILL chaos test (NOT a pytest
module — driven by tests/test_chaos_kill.py via subprocess).

argv: <root> <phase> [...]

Phases:
  prep                       create the catalog and produce the corpus
                             (8 acked batches x 250 uniquely-valued
                             records, keyed across partitions)
  consume <log> <kp> <when>  register group ``chaos_g`` and poll/commit
                             in bounded chunks, appending one
                             ``SERVED <value>`` line per record and one
                             ``COMMIT <n>`` marker per committed poll to
                             <log>. At poll number ``kp``, SIGKILL
                             OURSELVES ``before`` the offset-ledger
                             commit (records served, ledger behind — the
                             redelivery window) or ``after`` it (ledger
                             advanced, the app-level ack never written).
                             kp=-1 = no kill: drain to the tail and exit
                             0.

The kill is a raw SIGKILL — no goodbye(), no atexit: the restarted
incarnation must re-register over the dead one's registration and
resume from the COMMITTED offsets (the reference's failover consume
path, internal/test/integration/roundtrip_test.go:121-213).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOPIC = "chaos"
GROUP = "chaos_g"
POLL_MAX = 200


def main() -> None:
    root, phase = sys.argv[1], sys.argv[2]

    from polar_spark.session import get_spark
    from polar_spark.topics import TopicCatalog

    spark = get_spark(app_name=f"chaos_consume_{phase}", shuffle_partitions=4)
    cat = TopicCatalog(spark, os.path.join(root, "cat"))

    if phase == "prep":
        from polar_spark.produce import Producer

        prod = Producer(cat)
        for b in range(8):
            df = spark.createDataFrame(
                [(f"k{i % 7}", f"b{b}:{i}") for i in range(250)],
                "k string, v string",
            )
            prod.produce(df, TOPIC, key_col="k", value_col="v")
        return

    log_path = os.path.join(root, sys.argv[3])
    kill_poll = int(sys.argv[4])
    when = sys.argv[5] if len(sys.argv) > 5 else "before"

    from polar_spark.consume import EARLIEST, ConsumerGroup

    g = ConsumerGroup(cat, GROUP)
    g.register(TOPIC, EARLIEST)

    log = open(log_path, "a")

    def emit(lines: list[str]) -> None:
        log.write("".join(f"{ln}\n" for ln in lines))
        log.flush()
        os.fsync(log.fileno())

    n_poll = 0
    while True:
        res = g.poll(TOPIC, max_records=POLL_MAX)
        rows = res.df.collect()
        if not rows:
            break
        n_poll += 1
        # the serve is durable in the log BEFORE any commit decision —
        # exactly the order an application processes records in
        emit([f"SERVED {r['value']}" for r in rows])
        if n_poll == kill_poll and when == "before":
            os.kill(os.getpid(), 9)  # served, never committed
        g.commit(TOPIC, res.positions)
        if n_poll == kill_poll and when == "after":
            os.kill(os.getpid(), 9)  # committed, app ack never written
        emit([f"COMMIT {n_poll}"])


if __name__ == "__main__":
    main()
