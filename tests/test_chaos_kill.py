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
