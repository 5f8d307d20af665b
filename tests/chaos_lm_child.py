"""Child process for the mid-epoch SIGKILL chaos test (NOT a pytest
module — driven by tests/test_chaos_kill.py via subprocess).

Phases (argv[2]):
  prep                    build the 5-file source corpus + the batch-twin
                          expected bigram counts
  run <kill_epoch> <when> start StreamingBigramLM over the corpus with
                          maxFilesPerTrigger=1 and SIGKILL OURSELVES at
                          ``kill_epoch``, either ``before`` the epoch
                          ledger append (partial parquet written, ledger
                          behind — the torn-write window) or ``after``
                          it (ledger ahead of the stream's commit log —
                          the at-least-once replay window). -1 = no kill:
                          run to completion and write verdict.json
                          comparing the live LM to the batch twin.

The kill is a raw SIGKILL (no atexit, no JVM shutdown hooks) — the
crash-vs-graceful-stop distinction VERDICT r8 ask #6 calls out: the
checkpoint WAL has seen the batch, the commit log has not.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    root, phase = sys.argv[1], sys.argv[2]
    src = os.path.join(root, "src")

    from polar_spark.session import get_spark

    spark = get_spark(app_name=f"chaos_{phase}", shuffle_partitions=4)

    if phase == "prep":
        from polar_spark.functions.lm import train_bigram_counts
        from polar_spark.sources.tables import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        docs.repartition(5).write.mode("overwrite").parquet(src)
        train_bigram_counts(spark.read.parquet(src), "text").write.mode(
            "overwrite"
        ).parquet(os.path.join(root, "want"))
        return

    kill_epoch = int(sys.argv[3])
    when = sys.argv[4] if len(sys.argv) > 4 else "before"

    import polar_spark.streaming.dedup as sd
    from polar_spark.streaming.lm import StreamingBigramLM

    if kill_epoch >= 0:
        orig_record = sd.EpochLedger.record

        def record(self, key: str, epoch: int, force: bool = False) -> None:
            if epoch == kill_epoch and when == "before":
                os.kill(os.getpid(), 9)
            orig_record(self, key, epoch, force)
            if epoch == kill_epoch and when == "after":
                os.kill(os.getpid(), 9)

        sd.EpochLedger.record = record

    lm = StreamingBigramLM(spark, os.path.join(root, "store"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = lm.start(stream, checkpoint_dir=os.path.join(root, "cp"))
    q.awaitTermination(300)

    got = lm.counts()
    want = spark.read.parquet(os.path.join(root, "want"))
    diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    with open(os.path.join(root, "verdict.json"), "w") as f:
        json.dump(
            {"diff": diff, "got": got.count(), "want": want.count()}, f
        )


if __name__ == "__main__":
    main()
