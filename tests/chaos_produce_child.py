"""Child process for the produce-path SIGKILL chaos test (NOT a pytest
module — driven by tests/test_chaos_kill.py via subprocess).

Produces a sequence of small keyed batches to one topic, appending a
line ``ACK <batch_id> <n_records>`` to <root>/acks.log (flushed +
fsynced) after each produce() returns — the ack point. The parent
SIGKILLs this process once enough acks have landed, so the kill falls
inside a later batch's reserve→write→validate→publish window at a
nondeterministic point. Record values embed the batch id and row index
(``b<batch>:<i>``) so the parent can count per-batch delivery exactly.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    root = sys.argv[1]
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    rows_per_batch = int(sys.argv[3]) if len(sys.argv) > 3 else 500

    from polar_spark.produce import Producer
    from polar_spark.session import get_spark
    from polar_spark.topics import TopicCatalog

    spark = get_spark(app_name="chaos_produce", shuffle_partitions=4)
    cat = TopicCatalog(spark, os.path.join(root, "cat"))
    prod = Producer(cat)

    ack = open(os.path.join(root, "acks.log"), "a", buffering=1)
    for b in range(n_batches):
        df = spark.createDataFrame(
            [(f"k{i % 7}", f"b{b}:{i}") for i in range(rows_per_batch)],
            "k string, v string",
        )
        prod.produce(df, "chaos", key_col="k", value_col="v")
        ack.write(f"ACK {b} {rows_per_batch}\n")
        ack.flush()
        os.fsync(ack.fileno())


if __name__ == "__main__":
    main()
