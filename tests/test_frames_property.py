"""Property-based tests for the binary frame codec (hypothesis)."""

from __future__ import annotations

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
