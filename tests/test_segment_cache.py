"""_SegmentCache steal-or-join: the stolen-prefetch tombstone.

A serving read that steals a merely-QUEUED prefetch must leave the
inflight entry in place (marked STOLEN) until its own read completes,
so that (a) a concurrent prefetch() cannot re-register the path and
submit the duplicate background parse the cache exists to kill, (b) a
concurrent load() joins the server's read via the event instead of
parsing again, and (c) the stolen entry's event IS eventually set."""

from __future__ import annotations

import threading

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture()
def seg_file(tmp_path):
    p = str(tmp_path / "seg.parquet")
    pq.write_table(pa.Table.from_pandas(pd.DataFrame({"a": [1, 2, 3]})), p)
    return p


def _cache():
    from polar_spark.consume import _SegmentCache

    return _SegmentCache(cap_bytes=1 << 20)


def test_steal_tombstone_blocks_duplicate_prefetch(seg_file):
    c = _cache()
    reads = []
    gate = threading.Event()
    real = c._read_direct

    def slow_read(path, cols):
        reads.append(path)
        gate.wait(timeout=5.0)
        return real(path, cols)

    c._read_direct = slow_read
    # a queued (not yet started) prefetch entry, as prefetch() creates
    ev = threading.Event()
    c._inflight[seg_file] = [c._QUEUED, ev]

    out = {}
    t = threading.Thread(
        target=lambda: out.setdefault("t", c.load(seg_file, ["a"]))
    )
    t.start()
    # wait until the serving read has stolen the entry and is parsing
    for _ in range(500):
        if reads:
            break
        threading.Event().wait(0.01)
    assert reads == [seg_file]
    with c._lock:
        assert c._inflight[seg_file][0] == c._STOLEN

    # the race from ADVICE r10: a concurrent prefetch() mid-steal must
    # see the tombstone and register nothing
    c.prefetch([seg_file], ["a"])
    with c._lock:
        assert c._inflight[seg_file][0] == c._STOLEN  # not re-queued

    # a second load() must JOIN (no second parse), not steal/read again
    t2 = threading.Thread(
        target=lambda: out.setdefault("t2", c.load(seg_file, ["a"]))
    )
    t2.start()
    threading.Event().wait(0.05)
    assert reads == [seg_file]  # still exactly one parse in flight

    gate.set()
    t.join(timeout=5.0)
    t2.join(timeout=5.0)
    assert out["t"].num_rows == 3 and out["t2"].num_rows == 3
    assert reads == [seg_file]  # one parse total
    assert ev.is_set()  # stolen entry's event was set on completion
    assert seg_file not in c._inflight  # tombstone cleared


def test_steal_event_set_even_when_read_fails(seg_file, tmp_path):
    c = _cache()
    ev = threading.Event()
    c._inflight[seg_file] = [c._QUEUED, ev]

    def boom(path, cols):
        raise OSError("disk gone")

    c._read_direct = boom
    with pytest.raises(OSError):
        c.load(seg_file, ["a"])
    assert ev.is_set()
    assert seg_file not in c._inflight
