"""Property-based tests for the binary frame codec (hypothesis)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from polar_spark.sources.frames import decode_frame, encode_frame

records = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2**62),
        st.text(max_size=200),
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(
    stream_id=st.integers(min_value=0, max_value=0xFFFF),
    key=st.text(max_size=100),
    recs=records,
)
def test_frame_roundtrip_identity(stream_id, key, recs):
    buf = encode_frame(stream_id, key, recs)
    parsed = decode_frame(buf)
    assert parsed == (stream_id, key, recs)


@settings(max_examples=100, deadline=None)
@given(
    recs=records,
    flip=st.integers(min_value=0, max_value=10**9),
)
def test_corrupted_body_never_decodes(recs, flip):
    buf = bytearray(encode_frame(1, "k", recs))
    body_len = len(buf) - 9 - 4
    if body_len == 0:
        return  # nothing to corrupt in the body
    pos = 9 + (flip % body_len)
    bit = 1 << (flip % 8)
    buf[pos] ^= bit
    assert decode_frame(bytes(buf)) is None  # CRC catches every body flip


@pytest.mark.codec
def test_poll_response_codec_roundtrip_active_mode():
    """Chunk codec round-trip in whichever mode the host provides: with
    `zstandard` importable the poll-response payload compresses with
    real zstd (the reference's at-rest codec, docs/developer/
    FILE_FORMATS.md:9-37); without it the zlib fallback serves. Run
    `pytest -m codec` on a zstd-equipped host to certify the real mode;
    this container certifies the fallback."""
    from polar_spark.sources.frames import (
        _compressor,
        decode_poll_response,
        encode_poll_response,
    )

    try:
        import zstandard  # noqa: F401

        has_zstd = True
    except ImportError:
        has_zstd = False

    compress, decompress = _compressor()
    payload = b"polar" * 1000 + bytes(range(256))
    assert decompress(compress(payload)) == payload
    if has_zstd:
        # zstd frame magic: the real codec is actually in the path
        assert compress(b"x" * 100)[:4] == b"\x28\xb5\x2f\xfd"
    else:
        # zlib header: the documented fallback is in the path
        assert compress(b"x" * 100)[0] == 0x78

    items = [
        {
            "token": 3, "range_idx": 0, "version": 1, "topic": "t",
            "start_offset": 41,
            "records": [(1700000000000000, b"body-a"), (1700000000000001, b"")],
        }
    ]
    back = decode_poll_response(encode_poll_response(items))
    assert back == [
        {
            "token": 3, "range_idx": 0, "version": 1, "topic": "t",
            "start_offset": 41,
            "records": [(1700000000000000, b"body-a"), (1700000000000001, b"")],
        }
    ]
