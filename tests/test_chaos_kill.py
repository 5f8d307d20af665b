"""Mid-epoch SIGKILL chaos test (r9 VERDICT ask #6).

The epoch ledger's idempotency was proven via in-process REPLAY; this
test proves the harder property: a driver process SIGKILLed in the
middle of a foreachBatch epoch — in BOTH halves of the commit window —
restarts from the checkpoint with no loss and no double-count.

The two kill points bracket the exactly-once protocol:
  before-ledger  the epoch's count partial is on disk but the ledger
                 never recorded it (torn write). Restart must re-run
                 the epoch and OVERWRITE the same ``ep=`` partition —
                 counting it once, not twice.
  after-ledger   the ledger recorded the epoch but the stream's commit
                 log did not (the WAL-saw-it window — exactly what a
                 graceful stop can never produce). Restart replays the
                 epoch; apply_batch must return False and leave the
                 store untouched.

Either failure mode, if mishandled, shows up as a bigram-count diff
against the one-shot batch twin — counts are additive, so a single
double-applied epoch is visible.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "chaos_lm_child.py")


def _run(root: str, *args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, CHILD, root, *args],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )


@pytest.mark.parametrize(
    "sink,when",
    [
        ("lm", "before"),
        ("lm", "after"),
        ("neardup", "before"),
        ("neardup", "after"),
        ("semdedup", "before"),
        ("semdedup", "after"),
    ],
)
def test_sigkill_mid_epoch_restart_no_loss_no_double(tmp_path, sink, when):
    root = str(tmp_path)
    prep = _run(root, "prep", sink)
    assert prep.returncode == 0, prep.stderr[-2000:]

    # phase 1: stream with a SIGKILL landing inside epoch 2's commit
    # window (5 single-file micro-batches, so the kill is mid-stream)
    crashed = _run(root, "run", sink, "2", when)
    assert crashed.returncode == -signal.SIGKILL, (
        crashed.returncode,
        crashed.stderr[-2000:],
    )
    assert not os.path.exists(os.path.join(root, "verdict.json"))

    # phase 2: fresh process, same checkpoint — runs the remainder and
    # writes the verdict
    done = _run(root, "run", sink, "-1")
    assert done.returncode == 0, done.stderr[-2000:]
    with open(os.path.join(root, "verdict.json")) as f:
        v = json.load(f)
    assert v["want"] > 0
    assert v["got"] == v["want"]
    assert v["diff"] == 0, v  # no loss, no double-count — bit-identical


def test_sigkill_mid_produce_no_dup_no_wedge(spark, tmp_path):
    """Produce-path chaos (beyond the simulated dead-pid tests): a real
    producer PROCESS is SIGKILLed somewhere inside a batch's
    reserve→write→validate→publish window. Afterwards:

    - every ACKED batch is served exactly once (produce() returning is
      the durability ack);
    - the killed in-flight batch may be absent or partially present
      (at-least-once, never acked) but NO record is served twice;
    - the reservation queue is not wedged: a fresh producer publishes
      past the dead reservation (pid-liveness skip) and its batch is
      served."""
    import time

    from polar_spark.consume import EARLIEST, ConsumerGroup
    from polar_spark.produce import Producer
    from polar_spark.topics import TopicCatalog

    root = str(tmp_path)
    child = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tests", "chaos_produce_child.py"),
         root, "40", "500"],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        cwd=REPO,
    )
    acks_path = os.path.join(root, "acks.log")
    deadline = time.time() + 300
    while time.time() < deadline:
        try:
            with open(acks_path) as f:
                n = sum(1 for _ in f)
        except FileNotFoundError:
            n = 0
        if n >= 5:
            break
        time.sleep(0.05)
    else:
        child.kill()
        raise AssertionError("child never produced 5 batches")
    child.send_signal(signal.SIGKILL)
    child.wait(30)
    assert child.returncode == -signal.SIGKILL

    with open(acks_path) as f:
        acked = [int(line.split()[1]) for line in f if line.startswith("ACK")]
    assert len(acked) >= 5

    # fresh "producer process" (this test's session): must publish past
    # the dead producer's in-flight reservation, not wedge behind it
    cat = TopicCatalog(spark, os.path.join(root, "cat"))
    prod = Producer(cat)
    after = spark.createDataFrame(
        [(f"k{i % 7}", f"post:{i}") for i in range(100)], "k string, v string"
    )
    prod.produce(after, "chaos", key_col="k", value_col="v")

    g = ConsumerGroup(cat, "chaos_g")
    g.register("chaos", EARLIEST)
    from collections import Counter

    seen: Counter = Counter()
    for _ in range(200):
        res = g.poll("chaos")
        rows = res.df.collect()
        if not rows:
            break
        seen.update(r["value"] for r in rows)
        g.commit("chaos", res.positions)

    # acked batches: exactly once, complete
    for b in acked:
        vals = [v for v in seen if v.startswith(f"b{b}:")]
        assert len(vals) == 500, (b, len(vals))
        assert all(seen[v] == 1 for v in vals)
    # NOTHING is served twice — including any torn in-flight batch
    dup = {v: c for v, c in seen.items() if c > 1}
    assert not dup, dict(list(dup.items())[:5])
    # the post-crash batch made it through
    assert sum(1 for v in seen if v.startswith("post:")) == 100
