"""Live binary produce ingest: TCP listener → spool → streaming query.

The reference accepts produce requests on a raw TCP socket: an accept
loop reads framed messages off each connection, validates them, hands
records to the producer, and acks (internal/producing/binary_server.go:
21-118; frame layout docs/developer/NETWORK_FORMATS.md:34-59). The
Spark-first mapping splits that into the two roles Spark gives us:

- **edge**: :class:`BinaryIngestServer` — a thin accept loop that reads
  self-delimiting frames (header carries body_len) off each connection,
  acks each one, and spools the raw bytes one-file-per-frame into a
  directory. It does NO parsing beyond the header: validation (CRC,
  opcode) stays in ``decode_produce_frames`` on the executors, like the
  reference keeps CRC checks in the data path.
- **ingest**: :func:`start_binary_ingest` — a running Structured
  Streaming query ``readStream.format("binaryFile")`` over the spool →
  ``decode_produce_frames`` → ``Producer.produce`` inside the
  idempotent ``foreachBatch`` epoch ledger (streaming/ingest.py). The
  spool directory is the socket-to-cluster handoff the reference gets
  from its in-process channel; on a real cluster it would be a DFS path
  written by many edge listeners.

Throughput shape: frames batch records (``n_records`` per frame), the
binaryFile source batches files per trigger, and decoding is
Arrow-batched on executors — the accept loop only ever moves bytes.

Ack wire format (ours): ``version u8 | stream_id u16 | status u8`` per
received frame; status 0 = spooled, 1 = bad header, 2 = body too large,
3 = unsupported opcode. EVERY non-control frame is answered with this
fixed-size ack (control frames — startup/heartbeat — get control-frame
replies), so a producer's fixed-size ack loop never desynchronizes.
Like the frame codec this is format-shaped after the reference, NOT
byte-compatible.
"""

from __future__ import annotations

import os
import socket
import struct
import threading
import time
import uuid

from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from polar_spark.sources.frames import (
    _HEADER,
    FRAME_VERSION,
    OP_HEARTBEAT,
    OP_PRODUCE,
    OP_READY,
    OP_STARTUP,
    encode_control_frame,
)
from polar_spark.streaming.ingest import StreamingProducer
from polar_spark.topics import TopicCatalog

_ACK = struct.Struct(">BHB")  # version, stream_id, status
ACK_OK = 0
ACK_BAD_HEADER = 1
ACK_TOO_LARGE = 2
ACK_UNSUPPORTED = 3

# body_len arrives as an UNTRUSTED u32 off the wire: bound it before
# allocating, or one client frame could pin ~4 GiB of edge memory. The
# reference coalesces produce groups to ~2 MiB (MaxGroupSize); frames
# batch records, so allow a few coalesced groups plus per-record
# overhead — anything larger is a protocol error, not data.
MAX_FRAME_BODY_BYTES = 4 * 1024 * 1024


def _read_exact(conn: socket.socket, n: int) -> bytes | None:
    """Read exactly ``n`` bytes into a pre-sized buffer (recv_into — no
    O(n²) bytes concatenation on large frames)."""
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = conn.recv_into(view[got:])
        if r == 0:
            return None
        got += r
    return bytes(buf)


class BinaryIngestServer:
    """Accept-loop edge for framed binary produce (one thread per
    connection, like the reference's per-conn goroutine)."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1", port: int = 0):
        self.spool_dir = spool_dir
        os.makedirs(spool_dir, exist_ok=True)
        self._sock = socket.create_server((host, port))
        self.host, self.port = self._sock.getsockname()[:2]
        self._threads: list[threading.Thread] = []
        self._stop = threading.Event()

    def start(self) -> "BinaryIngestServer":
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def _accept_loop(self) -> None:
        self._sock.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _addr = self._sock.accept()
            except TimeoutError:
                continue
            except OSError:
                return
            t = threading.Thread(target=self._serve, args=(conn,), daemon=True)
            t.start()
            # prune finished connection threads so a long-lived listener
            # doesn't leak one entry per historical connection
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _serve(self, conn: socket.socket) -> None:
        """Connection protocol, mirroring the reference's handler loop
        (internal/producing/binary_server.go:21-118): a startup(1) frame
        is answered with ready(2); heartbeat(6) frames are answered in
        kind; produce(4) frames are spooled and acked; any other opcode
        gets a fixed-size unsupported ack and the connection stays open
        (framing is intact — an invalid header or an over-bound
        body_len is unrecoverable and closes the connection)."""
        with conn:
            while not self._stop.is_set():
                head = _read_exact(conn, _HEADER.size)
                if head is None:
                    return
                version, _flags, stream_id, op, body_len = _HEADER.unpack(head)
                if version != FRAME_VERSION:
                    # unrecoverable: framing is lost without a valid header
                    conn.sendall(_ACK.pack(FRAME_VERSION, stream_id, ACK_BAD_HEADER))
                    return
                if body_len > MAX_FRAME_BODY_BYTES:
                    # untrusted u32: refuse BEFORE reading/allocating the
                    # body; skipping it would still stream the attacker's
                    # bytes, so close — the client must reconnect
                    conn.sendall(_ACK.pack(FRAME_VERSION, stream_id, ACK_TOO_LARGE))
                    return
                rest = _read_exact(conn, body_len + 4)  # body + crc32
                if rest is None:
                    return
                if op == OP_STARTUP:
                    conn.sendall(encode_control_frame(OP_READY, stream_id))
                    continue
                if op == OP_HEARTBEAT:
                    conn.sendall(encode_control_frame(OP_HEARTBEAT, stream_id))
                    continue
                if op != OP_PRODUCE:
                    # fixed-size ack with a distinct status — NOT a control
                    # frame: a producer's ack loop reads _ACK-sized acks,
                    # and a 13-byte control frame here would desynchronize
                    # it after one unexpected opcode (ADVICE r3)
                    conn.sendall(_ACK.pack(FRAME_VERSION, stream_id, ACK_UNSUPPORTED))
                    continue
                # spool atomically: write tmp then rename, so the
                # binaryFile source never lists a half-written frame
                name = f"{time.time_ns()}_{uuid.uuid4().hex}.frame"
                tmp = os.path.join(self.spool_dir, f".{name}.tmp")
                with open(tmp, "wb") as f:
                    f.write(head + rest)
                os.rename(tmp, os.path.join(self.spool_dir, name))
                conn.sendall(_ACK.pack(FRAME_VERSION, stream_id, ACK_OK))

    def stop(self) -> None:
        self._stop.set()
        self._sock.close()


def _read_control(conn: socket.socket) -> int | None:
    """Read one empty-body control frame; returns its opcode."""
    head = _read_exact(conn, _HEADER.size)
    if head is None:
        return None
    _v, _f, _sid, op, body_len = _HEADER.unpack(head)
    if _read_exact(conn, body_len + 4) is None:  # body (empty) + crc
        return None
    return op


def send_frames(
    host: str, port: int, frames: list[bytes], handshake: bool = False
) -> list[tuple[int, int]]:
    """Client helper: send frames over one connection, collect acks as
    (stream_id, status) — the reference client's write/ack loop.

    ``handshake=True`` performs the reference's startup→ready exchange
    before producing (binary_server.go connection setup) and raises if
    the server does not answer ready."""
    acks = []
    with socket.create_connection((host, port)) as conn:
        if handshake:
            conn.sendall(encode_control_frame(OP_STARTUP))
            if _read_control(conn) != OP_READY:
                raise ConnectionError("binary server did not answer ready")
        for fr in frames:
            conn.sendall(fr)
            raw = _read_exact(conn, _ACK.size)
            if raw is None:
                break
            _v, sid, status = _ACK.unpack(raw)
            acks.append((sid, status))
    return acks


def start_binary_ingest(
    catalog: TopicCatalog,
    spool_dir: str,
    topic: str,
    checkpoint_dir: str | None = None,
    trigger_seconds: float | None = None,
) -> StreamingQuery:
    """Run the spool → decode → produce pipeline as a streaming query.

    Frames land in the topic with the frame's embedded key/timestamp via
    the same idempotent epoch-ledger produce as every other streaming
    sink; corrupt frames (bad CRC) are dropped executor-side by
    ``decode_produce_frames``. Arrival is content-ordered on
    (timestamp, record_idx, value): spool files carry no cross-file
    order Spark preserves, so offsets follow record time — deterministic
    under retry AND yields the reference's per-key ordering when a
    producer timestamps its records monotonically."""
    from polar_spark.sources.frames import decode_produce_frames

    spark = catalog.spark
    raw = (
        spark.readStream.format("binaryFile")
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
        .option("pathGlobFilter", "*.frame")
        .load(spool_dir)
        .select(F.col("content").alias("frame"))
    )
    decoded = decode_produce_frames(raw)
    return StreamingProducer(catalog).start(
        decoded,
        topic,
        key_col="key",
        value_col="value",
        ts_col="timestamp",
        checkpoint_dir=checkpoint_dir,
        trigger_seconds=trigger_seconds,
        arrival_cols=["timestamp", "record_idx", "value"],
    )
