"""Fuzzing the stdlib media decoders: corrupt bytes in a 100 TB
corpus must degrade to None (digest-fake fallback), never crash an
executor task. No Spark session needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bytewax_spark.functions import multimodal as mm

garbage = st.binary(max_size=200)
# garbage wearing valid magic bytes — exercises the parsers past the
# signature check, where the crash surface actually is
png_ish = st.binary(max_size=120).map(lambda b: b"\x89PNG\r\n\x1a\n" + b)
bmp_ish = st.binary(max_size=120).map(lambda b: b"BM" + b)
wav_ish = st.binary(max_size=120).map(lambda b: b"RIFF" + b[:4] + b"WAVE" + b[4:])
jpg_ish = st.binary(max_size=120).map(lambda b: b"\xff\xd8" + b)


@settings(max_examples=200, deadline=None)
@given(garbage | png_ish | bmp_ish)
def test_decode_image_never_crashes(b):
    out = mm.decode_image(b)
    assert out is None or (isinstance(out, tuple) and len(out) == 4)


@settings(max_examples=200, deadline=None)
@given(garbage | wav_ish)
def test_decode_wav_never_crashes(b):
    out = mm.decode_wav(b)
    assert out is None or (isinstance(out, tuple) and len(out) == 3)


@settings(max_examples=200, deadline=None)
@given(garbage | jpg_ish)
def test_jpeg_dimensions_never_crashes(b):
    out = mm.jpeg_dimensions(b)
    assert out is None or (isinstance(out, tuple) and len(out) == 2)


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=0, max_value=255),
)
def test_image_roundtrip_property(w, h, v):
    """encode -> decode is identity on dims and uniform pixel level
    for both formats, for every size/level."""
    px = [(v, v, v)] * (w * h)
    for enc in (mm.encode_png, mm.encode_bmp):
        got = mm.decode_image(enc(w, h, px))
        assert got is not None
        assert (got[1], got[2]) == (w, h)
        assert all(p == float(v) for p in got[3])
