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


# --- MP4 (ISO-BMFF) container ------------------------------------------


def test_mp4_roundtrip_exact():
    from bytewax_spark.functions import multimodal as mm

    for w, h, d in ((16, 16, 1000), (640, 360, 5500), (4095, 2159, 123456)):
        m = mm.parse_mp4_meta(mm.encode_mp4(w, h, d))
        assert m == {
            "brand": "isom",
            "timescale": 1000,
            "duration_ms": d,
            "n_tracks": 1,
            "width": w,
            "height": h,
        }


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_mp4_parser_never_raises_on_fuzz(junk):
    from bytewax_spark.functions import multimodal as mm

    assert mm.parse_mp4_meta(junk) is None or isinstance(
        mm.parse_mp4_meta(junk), dict
    )


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=200), st.binary(min_size=0, max_size=40))
def test_mp4_truncation_and_splice_never_raise(cut, splice):
    from bytewax_spark.functions import multimodal as mm

    b = mm.encode_mp4(320, 240, 2000)
    mm.parse_mp4_meta(b[:cut])
    mm.parse_mp4_meta(b[:cut] + splice + b[cut:])


def test_ahash64_matches_integer_reference(spark):
    from bytewax_spark.functions import multimodal as mm

    vals = [(7 + 16 * x + 4 * y) % 256 for y in range(8) for x in range(8)]
    b = mm.encode_bmp(8, 8, [(v,) * 3 for v in vals])
    got = mm.ahash64(b)
    tot = sum(vals)
    bits = 0
    for i, p in enumerate(vals):
        if p * 64 > tot:
            bits |= 1 << i
    if bits >= 1 << 63:
        bits -= 1 << 64
    assert got == bits


def test_ahash64_brightness_shift_small_hamming(spark):
    from bytewax_spark.functions import multimodal as mm

    vals = [(16 * x + 4 * y) % 256 for y in range(8) for x in range(8)]
    a = mm.ahash64(mm.encode_bmp(8, 8, [(v,) * 3 for v in vals]))
    # +2 brightness everywhere: means shift with pixels -> same bits
    b = mm.ahash64(
        mm.encode_bmp(8, 8, [(min(v + 2, 255),) * 3 for v in vals])
    )
    ham = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert ham <= 4


def test_ahash64_different_images_far_apart(spark):
    from bytewax_spark.functions import multimodal as mm

    grad = mm.ahash64(
        mm.encode_bmp(8, 8, [((16 * x) % 256,) * 3 for y in range(8) for x in range(8)])
    )
    checker = mm.ahash64(
        mm.encode_bmp(
            8, 8,
            [((x + y) % 2 * 255,) * 3 for y in range(8) for x in range(8)],
        )
    )
    ham = bin((grad ^ checker) & ((1 << 64) - 1)).count("1")
    assert ham >= 16


def test_ahash64_none_on_garbage(spark):
    from bytewax_spark.functions import multimodal as mm

    assert mm.ahash64(b"not an image") is None
    assert mm.ahash64(b"") is None


def test_image_ahash_larger_image_blocks(spark):
    from bytewax_spark.functions import multimodal as mm

    # 16x16: each 2x2 block averages; a flat image has hash 0
    flat = mm.ahash64(mm.encode_bmp(16, 16, [(100,) * 3] * 256))
    assert flat == 0  # no block strictly exceeds the mean


# pure-Python aHash properties (no Spark session)

def test_ahash64_property_decode_roundtrip_determinism():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bytewax_spark.functions import multimodal as mm

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 12),
        st.integers(1, 12),
        st.integers(0, 2**32 - 1),
    )
    def run(w, h, seed):
        import random

        rng = random.Random(seed)
        px = [(rng.randrange(256),) * 3 for _ in range(w * h)]
        b = mm.encode_bmp(w, h, px)
        a1, a2 = mm.ahash64(b), mm.ahash64(bytes(b))
        assert a1 == a2  # pure function of the bytes
        assert a1 is None or -(2**63) <= a1 < 2**63

    run()


def test_ahash64_property_constant_image_is_zero():
    from bytewax_spark.functions import multimodal as mm

    for w, h, v in [(8, 8, 0), (8, 8, 255), (5, 9, 100), (16, 8, 7)]:
        b = mm.encode_bmp(w, h, [(v,) * 3] * (w * h))
        assert mm.ahash64(b) == 0  # no block strictly beats the mean


def test_ahash64_property_inversion_flips_nonzero_hashes():
    from bytewax_spark.functions import multimodal as mm

    vals = [(16 * x + 8 * y) % 256 for y in range(8) for x in range(8)]
    a = mm.ahash64(mm.encode_bmp(8, 8, [(v,) * 3 for v in vals]))
    inv = mm.ahash64(
        mm.encode_bmp(8, 8, [(255 - v,) * 3 for v in vals])
    )
    # inverting intensities inverts every strict comparison except
    # exact-mean blocks: bright bits become dark bits
    au = a & ((1 << 64) - 1)
    iu = inv & ((1 << 64) - 1)
    assert au & iu == 0  # disjoint bit sets


def test_hamming_neighbor_pairs_on_image_hashes(spark):
    from bytewax_spark.functions.dedup import hamming_neighbor_pairs

    # signed-bit fingerprints: -1 differs from -2 in 1 bit; 0 is far
    df = spark.createDataFrame(
        [(1, -1), (2, -2), (3, 0)], "id long, fp long"
    )
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neighbor_pairs(df, "fp", "id", bits=64, max_hamming=2).collect()
    }
    assert pairs == {(1, 2): 1}


def test_hamming_neighbor_pairs_matches_brute_force(spark):
    import itertools
    import random

    from bytewax_spark.functions.dedup import hamming_neighbor_pairs

    rng = random.Random(7)
    fps = []
    base = rng.getrandbits(63)
    for i in range(20):
        fp = base
        for _ in range(rng.randrange(0, 10)):
            fp ^= 1 << rng.randrange(64)
        if fp >= 1 << 63:
            fp -= 1 << 64
        fps.append((i, fp))
    df = spark.createDataFrame(fps, "id long, fp long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_neighbor_pairs(df, "fp", "id", bits=64, max_hamming=5).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(fps, 2):
        h = bin((a ^ b) & ((1 << 64) - 1)).count("1")
        if h <= 5:
            want[(min(i, j), max(i, j))] = h
    assert got == want
