"""Binary framed produce codec — the reference's wire-protocol ingest
path (op #2 in SURVEY.md §2.1) re-expressed as Spark column transforms.

The reference accepts produce requests over a framed TCP protocol:
header {version, flags, streamId, opcode, bodyLength} + CRC, opcode
produce=4 carrying a partition key and record payloads
(internal/producing/binary_server.go:21-118, opcodes
internal/producing/binary_messages.go:23-28, wire layout
docs/developer/NETWORK_FORMATS.md:34-59). In the Spark mapping there is
no TCP listener — framed bytes arrive as a BINARY column (captured
streams, framed files, socket-source payloads) and ingest is::

    frames → decode_produce_frames → Producer.produce

Frame layout (ours, big-endian like the reference's formats —
docs/developer/FILE_FORMATS.md:3 — but NOT byte-compatible; this is a
new engine, not a port):

    version  u8     (1)
    flags    u8     (0)
    stream_id u16
    opcode   u8     (4 = produce)
    body_len u32
    body     bytes  = key_len u16 | key utf-8 | n_records u16 |
                      repeat{ ts_micros i64 | val_len u32 | val utf-8 }
    crc32    u32    of body (zlib.crc32)

Frames are parsed with ``mapInPandas`` — variable-length iterative
parsing is genuinely imperative per-partition logic (the (b) case of the
custom-operator ladder), Arrow-batched, no shuffle: each task decodes
its own partition's blobs. Corrupt frames (bad CRC / short buffer) are
dropped, matching the reference's CRC-validate-and-skip recovery
(internal/data/segment_reader.go chunk validation).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FRAME_VERSION = 1
# reference opcode table (internal/producing/binary_messages.go:23-28)
OP_STARTUP = 1
OP_READY = 2
OP_ERROR = 3
OP_PRODUCE = 4
OP_PRODUCE_RESPONSE = 5
OP_HEARTBEAT = 6
_HEADER = struct.Struct(">BBHBI")  # version, flags, stream_id, opcode, body_len


def encode_control_frame(opcode: int, stream_id: int = 0, flags: int = 0) -> bytes:
    """Empty-body control frame (startup/ready/error/heartbeat) — header
    + zero-length body + CRC of the empty body."""
    header = _HEADER.pack(FRAME_VERSION, flags, stream_id, opcode, 0)
    return header + struct.pack(">I", zlib.crc32(b"") & 0xFFFFFFFF)

DECODED_SCHEMA = (
    "stream_id int, record_idx int, timestamp timestamp, key string, value string"
)


def encode_frame(
    stream_id: int,
    key: str,
    records: list[tuple[int, str]],
    flags: int = 0,
) -> bytes:
    """One produce frame for ``records`` = [(ts_micros, value), ...]."""
    kb = key.encode()
    body = struct.pack(">H", len(kb)) + kb + struct.pack(">H", len(records))
    for ts_micros, value in records:
        vb = value.encode()
        body += struct.pack(">qI", ts_micros, len(vb)) + vb
    header = _HEADER.pack(FRAME_VERSION, flags, stream_id, OP_PRODUCE, len(body))
    return header + body + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)


def decode_frame(buf: bytes) -> tuple[int, str, list[tuple[int, str]]] | None:
    """Parse one frame; None on truncation, bad CRC, or foreign opcode."""
    if len(buf) < _HEADER.size:
        return None
    version, _flags, stream_id, opcode, body_len = _HEADER.unpack_from(buf, 0)
    end = _HEADER.size + body_len
    if version != FRAME_VERSION or opcode != OP_PRODUCE or len(buf) < end + 4:
        return None
    body = buf[_HEADER.size : end]
    (crc,) = struct.unpack_from(">I", buf, end)
    if zlib.crc32(body) & 0xFFFFFFFF != crc:
        return None
    pos = 0
    (key_len,) = struct.unpack_from(">H", body, pos)
    pos += 2
    key = body[pos : pos + key_len].decode()
    pos += key_len
    (n_records,) = struct.unpack_from(">H", body, pos)
    pos += 2
    records = []
    for _ in range(n_records):
        ts_micros, val_len = struct.unpack_from(">qI", body, pos)
        pos += 12
        records.append((ts_micros, body[pos : pos + val_len].decode()))
        pos += val_len
    return stream_id, key, records


def encode_produce_frames(
    df: DataFrame,
    key_col: str,
    value_col: str,
    ts_col: str,
    stream_id_col: str | None = None,
) -> DataFrame:
    """(frame BINARY) rows — one produce frame per input record (the
    multi-record-per-frame path is covered by :func:`encode_frame`
    directly). Arrow-batched, no shuffle."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids = (
                pdf[stream_id_col].astype("int64")
                if stream_id_col
                else pd.Series([0] * len(pdf))
            )
            frames = [
                encode_frame(
                    int(sid) & 0xFFFF,
                    str(key),
                    [(int(ts.value // 1000), str(val))],
                )
                for sid, key, val, ts in zip(
                    sids, pdf[key_col], pdf[value_col], pdf[ts_col]
                )
            ]
            yield pd.DataFrame({"frame": frames})

    return df.mapInPandas(encode, schema="frame binary")


def decode_produce_frames(df: DataFrame, frames_col: str = "frame") -> DataFrame:
    """Framed bytes → produce records (stream_id, record_idx, timestamp,
    key, value); invalid frames dropped. Feed the result to
    ``Producer.produce`` to complete the binary ingest path."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sids, idxs, tss, keys, vals = [], [], [], [], []
            for buf in pdf[frames_col]:
                parsed = decode_frame(bytes(buf))
                if parsed is None:
                    continue
                stream_id, key, records = parsed
                for i, (ts_micros, value) in enumerate(records):
                    sids.append(stream_id)
                    idxs.append(i)
                    tss.append(pd.Timestamp(ts_micros, unit="us"))
                    keys.append(key)
                    vals.append(value)
            # explicit dtypes: an empty batch must not infer float64 and
            # break the Arrow cast to the declared schema
            yield pd.DataFrame(
                {
                    "stream_id": pd.Series(sids, dtype="int32"),
                    "record_idx": pd.Series(idxs, dtype="int32"),
                    "timestamp": pd.Series(tss, dtype="datetime64[ns]"),
                    "key": pd.Series(keys, dtype="object"),
                    "value": pd.Series(vals, dtype="object"),
                }
            )

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# Consumer poll response marshal (docs/developer/NETWORK_FORMATS.md:5-32)
# ---------------------------------------------------------------------------
#
# The reference's binary consumer API returns poll items as
#   items_len u16 | repeat{ token i64 | range_idx u8 | version u32 |
#                           topic_len u8 | topic | start_offset i64 |
#                           payload_len i32 | compressed records }
# with the payload being the chunk's record stream
#   repeat{ ts_micros i64 | body_len u32 | body }
# compressed with zstd (docs/developer/FILE_FORMATS.md:9-37). This
# container has no python zstd binding, so the codec is gated behind an
# import-try: zstandard when available, zlib otherwise (same framing,
# different compressor — flagged in the item flags byte we do NOT have,
# so the codec choice is a process-level constant, not per-item).
# Like the produce frames above this is format-shaped after the
# reference, NOT byte-compatible.

_ITEM_HEAD = struct.Struct(">qBI")  # token, range_idx, version
_RECORD_HEAD = struct.Struct(">qI")  # ts_micros, body_len


def _compressor():
    try:
        import zstandard as zstd

        c = zstd.ZstdCompressor()
        d = zstd.ZstdDecompressor()
        return c.compress, d.decompress
    except ImportError:  # container has no zstd binding
        return zlib.compress, zlib.decompress


def encode_poll_response(items: list[dict]) -> bytes:
    """Marshal poll items to the reference's binary response shape.

    Each item: ``{token, range_idx, version, topic, start_offset,
    records: [(ts_micros, body_bytes), ...]}``."""
    compress, _ = _compressor()
    out = [struct.pack(">H", len(items))]
    for it in items:
        payload = b"".join(
            _RECORD_HEAD.pack(int(ts), len(body)) + body
            for ts, body in it["records"]
        )
        comp = compress(payload)
        topic = it["topic"].encode()
        out.append(
            _ITEM_HEAD.pack(int(it["token"]), int(it["range_idx"]), int(it["version"]))
            + struct.pack(">B", len(topic))
            + topic
            + struct.pack(">q", int(it["start_offset"]))
            + struct.pack(">i", len(comp))
            + comp
        )
    return b"".join(out)


def decode_poll_response(buf: bytes) -> list[dict]:
    """Inverse of :func:`encode_poll_response`."""
    _, decompress = _compressor()
    (n_items,) = struct.unpack_from(">H", buf, 0)
    pos = 2
    items = []
    for _ in range(n_items):
        token, range_idx, version = _ITEM_HEAD.unpack_from(buf, pos)
        pos += _ITEM_HEAD.size
        (tlen,) = struct.unpack_from(">B", buf, pos)
        pos += 1
        topic = buf[pos : pos + tlen].decode()
        pos += tlen
        (start_offset,) = struct.unpack_from(">q", buf, pos)
        pos += 8
        (plen,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        payload = decompress(buf[pos : pos + plen])
        pos += plen
        records = []
        rpos = 0
        while rpos < len(payload):
            ts, blen = _RECORD_HEAD.unpack_from(payload, rpos)
            rpos += _RECORD_HEAD.size
            records.append((ts, payload[rpos : rpos + blen]))
            rpos += blen
        items.append(
            {
                "token": token,
                "range_idx": range_idx,
                "version": version,
                "topic": topic,
                "start_offset": start_offset,
                "records": records,
            }
        )
    return items
