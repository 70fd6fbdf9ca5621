"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, plus the decode/feature/resize/frame-sample plumbing.

Decode tiers, best available first:

1. **Header metadata — pure Catalyst** (:func:`media_header_meta`):
   PNG / BMP / GIF / WAV headers live at fixed offsets, so format,
   width, height, channels and sample rate parse as JVM ``substring``
   + base-16 ``conv`` expressions — whole-stage codegen, no Python at
   all. At 100 TB this is THE path for "what's in this blob" audits:
   header sniffing at scan speed.
2. **Real pixel decode — stdlib only** (PNG through ``zlib`` inflate +
   scanline unfilter; uncompressed 24-bit BMP through ``struct``):
   used by :func:`decode_image_features` when PIL is absent, and by
   :func:`encode_png`/:func:`encode_bmp` to build real test bytes.
3. **Heavy codecs** (PIL, ffmpeg — NOT in this container) behind
   import-tries; undecodable bytes fall back to a deterministic
   digest fake (documented, test-covered) so pipelines never lose the
   Spark plumbing contract.

Scale posture: media bytes are the dominant I/O — operators here never
shuffle the binary column. Decode/feature steps are ``mapInPandas``
(per-partition, Arrow-batched); anything that must reshuffle (e.g.
grouping frames by video) moves only ids + features. Set
``spark.sql.files.maxPartitionBytes`` so a partition of blobs fits the
executor (128 MiB default is right for ~1 MiB images; drop to 32 MiB
for video chunks).
"""

from __future__ import annotations

import hashlib
import struct as _struct
import zlib as _zlib
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "encode_mp4",
    "parse_mp4_meta",
    "video_metadata",
    "media_table",
    "media_header_meta",
    "encode_png",
    "encode_bmp",
    "encode_wav",
    "decode_image",
    "decode_wav",
    "decode_audio_features",
    "jpeg_dimensions",
    "ahash64",
    "decode_image_features",
    "image_ahash",
    "resize_images",
    "sample_frames",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# the media column convention: opaque bytes + typed metadata struct
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_table(spark, rows: list[tuple]) -> DataFrame:
    """Build a media DataFrame from (id, kind, bytes, meta-dict) rows."""
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)


# --- tier 1: Catalyst-only header parsing -------------------------------


def _u8(c: Column, pos: int) -> Column:
    """Unsigned byte at 1-indexed ``pos`` as a bigint expression."""
    return F.conv(F.hex(F.substring(c, pos, 1)), 16, 10).cast("bigint")


def _be32(c: Column, pos: int) -> Column:
    return F.conv(F.hex(F.substring(c, pos, 4)), 16, 10).cast("bigint")


def _le16(c: Column, pos: int) -> Column:
    return _u8(c, pos) + _u8(c, pos + 1) * 256


def _le32(c: Column, pos: int) -> Column:
    return (
        _u8(c, pos)
        + _u8(c, pos + 1) * 256
        + _u8(c, pos + 2) * 65536
        + _u8(c, pos + 3) * 16777216
    )


def media_header_meta(content: Column | str) -> Column:
    """Parse PNG / BMP / GIF / WAV headers as PURE Catalyst expressions
    — ``struct(format, width, height, channels, sample_rate)``, nulls
    for fields a format lacks or for unrecognized bytes.

    These formats keep their geometry at fixed offsets (PNG IHDR
    big-endian at 17/21; BMP BITMAPINFOHEADER little-endian at 19/23;
    GIF logical screen at 7/9; canonical WAV fmt chunk at 23/25), so
    the whole parse is ``substring`` + hex ``conv`` arithmetic inside
    whole-stage codegen: no UDF, no Python, runs at scan speed over
    100 TB of blobs. JPEG (variable-position SOF marker) needs the
    scanning decoder in :func:`decode_image`, not this path.

    BMP height is signed (negative = top-down rows); the expression
    reports magnitude."""
    c = F.col(content) if isinstance(content, str) else content
    is_png = F.hex(F.substring(c, 1, 8)) == _PNG_SIG.hex().upper()
    is_bmp = F.substring(c, 1, 2).cast("string") == "BM"
    is_gif = F.substring(c, 1, 6).cast("string").isin("GIF87a", "GIF89a")
    is_wav = (F.substring(c, 1, 4).cast("string") == "RIFF") & (
        F.substring(c, 9, 8).cast("string") == "WAVEfmt "
    )
    bmp_h_raw = _le32(c, 23)
    bmp_h = F.when(bmp_h_raw >= F.lit(1 << 31), F.lit(1 << 32) - bmp_h_raw).otherwise(
        bmp_h_raw
    )
    null_i = F.lit(None).cast("int")
    branch = lambda png, bmp, gif, wav: (  # noqa: E731
        F.when(is_png, png)
        .when(is_bmp, bmp)
        .when(is_gif, gif)
        .when(is_wav, wav)
        .otherwise(null_i)
    )
    return F.struct(
        F.when(is_png, F.lit("png"))
        .when(is_bmp, F.lit("bmp"))
        .when(is_gif, F.lit("gif"))
        .when(is_wav, F.lit("wav"))
        .otherwise(F.lit(None).cast("string"))
        .alias("format"),
        branch(_be32(c, 17), _le32(c, 19), _le16(c, 7), null_i)
        .cast("int")
        .alias("width"),
        branch(_be32(c, 21), bmp_h, _le16(c, 9), null_i).cast("int").alias("height"),
        branch(
            # PNG color type -> channel count; BMP bpp/8; GIF paletted=1
            F.when(_u8(c, 26) == 0, 1)
            .when(_u8(c, 26) == 2, 3)
            .when(_u8(c, 26) == 4, 2)
            .when(_u8(c, 26) == 6, 4)
            .otherwise(null_i),
            (_le16(c, 29) / 8).cast("int"),
            F.lit(1),
            _le16(c, 23),
        )
        .cast("int")
        .alias("channels"),
        F.when(is_wav, _le32(c, 25)).otherwise(null_i).cast("int").alias("sample_rate"),
    )


# --- tier 2: real stdlib encoders/decoders ------------------------------


def encode_png(width: int, height: int, pixels_rgb: list[tuple[int, int, int]]) -> bytes:
    """Minimal real PNG writer (8-bit RGB, filter 0, one IDAT) —
    stdlib only; produces bytes any PNG reader accepts."""

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            _struct.pack(">I", len(data))
            + tag
            + data
            + _struct.pack(">I", _zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    raw = b"".join(
        b"\x00"
        + bytes(c for px in pixels_rgb[y * width : (y + 1) * width] for c in px)
        for y in range(height)
    )
    ihdr = _struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", _zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def encode_bmp(width: int, height: int, pixels_rgb: list[tuple[int, int, int]]) -> bytes:
    """Minimal real BMP writer (BITMAPINFOHEADER, 24-bit, bottom-up)."""
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        b"".join(
            bytes((b_, g, r)) for (r, g, b_) in pixels_rgb[y * width : (y + 1) * width]
        )
        + pad
        for y in reversed(range(height))
    )
    file_header = _struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 54)
    dib = _struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return file_header + dib + body


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Minimal real WAV writer (PCM 16-bit)."""
    data = b"".join(_struct.pack("<h", s) for s in samples)
    fmt = _struct.pack("<HHIIHH", 1, channels, sample_rate, sample_rate * channels * 2, channels * 2, 16)
    return (
        b"RIFF"
        + _struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + _struct.pack("<I", 16)
        + fmt
        + b"data"
        + _struct.pack("<I", len(data))
        + data
    )


def _decode_png_pixels(b: bytes) -> tuple[str, int, int, list[float]] | None:
    """Real PNG decode, stdlib only: walk chunks, inflate IDAT,
    unfilter scanlines (filters 0-4), return grayscale pixels.
    Supports the common web subset: 8-bit, non-interlaced, gray /
    RGB / RGBA."""
    if b[:8] != _PNG_SIG:
        return None
    pos, idat = 8, b""
    w = h = ct = None
    while pos + 8 <= len(b):
        ln = int.from_bytes(b[pos : pos + 4], "big")
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        if tag == b"IHDR":
            w, h, bitd, ct, _comp, _filt, inter = _struct.unpack(">IIBBBBB", data)
            if bitd != 8 or inter != 0 or ct not in (0, 2, 6):
                return None
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        return None
    raw = _zlib.decompress(idat)
    nch = {0: 1, 2: 3, 6: 4}[ct]
    stride = w * nch
    prev = bytearray(stride)
    out: list[float] = []
    pos = 0
    for _y in range(h):
        filt = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        for i in range(stride):
            a = line[i - nch] if i >= nch else 0
            up = prev[i]
            ul = prev[i - nch] if i >= nch else 0
            if filt == 1:
                line[i] = (line[i] + a) & 255
            elif filt == 2:
                line[i] = (line[i] + up) & 255
            elif filt == 3:
                line[i] = (line[i] + (a + up) // 2) & 255
            elif filt == 4:
                p = a + up - ul
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - ul)
                pred = a if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                line[i] = (line[i] + pred) & 255
        prev = line
        for x in range(w):
            px = line[x * nch : x * nch + nch]
            out.append(float(px[0]) if nch == 1 else (px[0] + px[1] + px[2]) / 3.0)
    return ("png", w, h, out)


def _decode_bmp_pixels(b: bytes) -> tuple[str, int, int, list[float]] | None:
    """Real BMP decode, stdlib only: BITMAPINFOHEADER, uncompressed
    24-bit, bottom-up or top-down."""
    if b[:2] != b"BM" or len(b) < 54:
        return None
    off = _struct.unpack("<I", b[10:14])[0]
    hsz = _struct.unpack("<I", b[14:18])[0]
    if hsz < 40:
        return None
    w, h_signed = _struct.unpack("<ii", b[18:26])
    bpp = _struct.unpack("<H", b[28:30])[0]
    comp = _struct.unpack("<I", b[30:34])[0]
    if bpp != 24 or comp != 0:
        return None
    h = abs(h_signed)
    stride = ((w * 3 + 3) // 4) * 4
    rows = []
    for y in range(h):
        base = off + y * stride
        rows.append(
            [
                (b[base + 3 * x] + b[base + 3 * x + 1] + b[base + 3 * x + 2]) / 3.0
                for x in range(w)
            ]
        )
    if h_signed > 0:
        rows.reverse()  # stored bottom-up
    return ("bmp", w, h, [v for row in rows for v in row])


def jpeg_dimensions(b: bytes) -> tuple[int, int] | None:
    """(width, height) from a JPEG's SOF marker — the one common
    format whose geometry is NOT at a fixed offset (markers must be
    walked), hence Python rather than :func:`media_header_meta`'s
    Catalyst expressions. Pure stdlib; no pixel decode (that needs a
    real DCT codec). Corrupt bytes → None, never an exception."""
    try:
        b = bytes(b or b"")
    except Exception:
        return None
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # no-payload markers
            pos += 2
            continue
        seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
        # SOF0..SOF15 carry geometry (skip DHT 0xC4, DAC 0xCC)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > len(b):
                return None
            h = int.from_bytes(b[pos + 5 : pos + 7], "big")
            w = int.from_bytes(b[pos + 7 : pos + 9], "big")
            return (w, h)
        pos += 2 + seg_len
    return None


def decode_wav(b: bytes) -> tuple[int, int, list[int]] | None:
    """(sample_rate, channels, PCM16 samples) via stdlib chunk walk,
    or None for non-WAV / non-PCM16 / corrupt bytes."""
    try:
        return _decode_wav_inner(b)
    except Exception:
        return None


def _decode_wav_inner(b: bytes) -> tuple[int, int, list[int]] | None:
    b = bytes(b or b"")
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    rate = nch = None
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        ln = int.from_bytes(b[pos + 4 : pos + 8], "little")
        if tag == b"fmt ":
            fmt, nch, rate = _struct.unpack("<HHI", b[pos + 8 : pos + 16])
            bits = _struct.unpack("<H", b[pos + 22 : pos + 24])[0]
            if fmt != 1 or bits != 16:
                return None
        elif tag == b"data" and rate is not None:
            data = b[pos + 8 : pos + 8 + ln]
            n = len(data) // 2
            return (rate, nch, list(_struct.unpack(f"<{n}h", data[: n * 2])))
        pos += 8 + ln + (ln & 1)
    return None


def decode_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """WAV content → (sample_rate, channels, n_samples, duration_ms,
    rms, peak) — REAL stdlib PCM decode inside ``mapInPandas``;
    non-WAV bytes yield nulls. Media bytes stay in their partition;
    only scalar features emerge."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
            T.StructField("peak", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        import math

        for pdf in batches:
            feats = []
            for b in pdf[content_col]:
                w = decode_wav(b)
                if w is None:
                    feats.append((None,) * 6)
                    continue
                rate, nch, samples = w
                n = len(samples)
                frames = n // max(1, nch)
                rms = math.sqrt(sum(s * s for s in samples) / n) if n else 0.0
                peak = max((abs(s) for s in samples), default=0)
                feats.append((rate, nch, n, frames * 1000 // rate, rms, peak))
            cols = ["sample_rate", "channels", "n_samples", "duration_ms", "rms", "peak"]
            yield pdf.assign(**dict(zip(cols, map(list, zip(*feats)))))

    return df.mapInPandas(run, schema=out_schema)


def decode_image(b: bytes) -> tuple[str, int, int, list[float]] | None:
    """(format, width, height, grayscale pixels row-major) via the
    pure-stdlib decoders, or None for unsupported OR CORRUPT bytes —
    a malformed blob in a 100 TB corpus must degrade to None (callers
    fall back to the digest fake), never kill the executor task."""
    if not b:
        return None
    try:
        return _decode_png_pixels(bytes(b)) or _decode_bmp_pixels(bytes(b))
    except Exception:
        return None


def _fake_pixels(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode: n pseudo-channel means
    derived from the content digest. Replaced by a real decoder when
    PIL is importable."""
    d = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in d[:n]]


def _bucket_means(px: list[float], n: int) -> list[float]:
    """n contiguous bucket means of a pixel list, normalized to [0,1]."""
    step = max(1, len(px) // n)
    return [
        sum(px[i : i + step]) / (255.0 * min(step, len(px) - i))
        for i in range(0, len(px), step)
    ][:n]


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """content → fixed-size feature vector (``array<double>``).

    Decode tiers per blob: PIL when importable (any format, resized
    16x16); else the REAL stdlib decoder (:func:`decode_image` — PNG
    via zlib inflate + unfilter, 24-bit BMP) with features as bucketed
    grayscale means; else the deterministic digest fake (same
    schema/batch shape), so undecodable bytes still flow."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except Exception:
            have_pil = False

        def feats(b):
            if have_pil:
                import io

                from PIL import Image

                try:
                    img = Image.open(io.BytesIO(b)).convert("L").resize((16, 16))
                    return _bucket_means(list(img.getdata()), n_features)
                except Exception:
                    pass
            real = decode_image(b)
            if real is not None:
                return _bucket_means(real[3], n_features)
            return _fake_pixels(b, n_features)

        for pdf in batches:
            yield pdf.assign(features=[feats(b) for b in pdf["content"]])

    return df.mapInPandas(run, schema=out_schema)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """content → resized content (stub decode: passthrough bytes with
    updated meta; real path requires PIL)."""
    out_schema = df.schema

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        try:
            import io

            from PIL import Image

            def rz(b):
                try:
                    img = Image.open(io.BytesIO(b)).resize((width, height))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    return buf.getvalue()
                except Exception:
                    return b  # undecodable bytes pass through unchanged

            decode = rz
        except Exception:
            decode = None
        for pdf in batches:
            if decode is not None:
                pdf = pdf.assign(content=[decode(b) for b in pdf["content"]])
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"], meta["height"] = width, height
            pdf = pdf.assign(meta=meta.to_dict("records"))
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → one row per sampled frame timestamp.

    Real frame extraction needs ffmpeg (absent) — raises
    ``NotImplementedError`` per frame decode; the row expansion,
    schema and batch shape (the Spark-side contract) are real and
    tested via ``frame_ts`` computed from ``meta.duration_ms``."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for _, row in pdf.iterrows():
                dur = (row["meta"] or {}).get("duration_ms") or 0
                for ts in range(0, int(dur), every_ms):
                    # real decoder would seek+extract here; mark the stub
                    # deterministically instead of raising so plumbing is testable
                    tag = _struct.pack(">qq", int(row["media_id"]), ts)
                    out_rows.append((int(row["media_id"]), ts, tag))
            yield pd.DataFrame(out_rows, columns=["media_id", "frame_ts_ms", "frame"])

    return df.mapInPandas(run, schema=out_schema)


# --- tier 4: real MP4 (ISO-BMFF) container metadata ----------------------


def encode_mp4(
    width: int, height: int, duration_ms: int, timescale: int = 1000
) -> bytes:
    """Minimal REAL ISO-BMFF file: ftyp + moov(mvhd + trak(tkhd)) +
    free, every box spec-shaped (big-endian size + fourcc), geometry
    in tkhd 16.16 fixed point, duration in mvhd units of
    ``timescale``. No media samples — the metadata container a
    frame-extraction pipeline reads before touching mdat."""

    def box(tag: bytes, payload: bytes) -> bytes:
        return _struct.pack(">I", 8 + len(payload)) + tag + payload

    matrix = _struct.pack(
        ">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
    )
    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"
        + _struct.pack(">II", 0, 0)  # ctime, mtime
        + _struct.pack(">II", timescale, dur)
        + _struct.pack(">i", 0x00010000)  # rate 1.0
        + _struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10
        + matrix
        + b"\x00" * 24
        + _struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07"  # v0, enabled|in-movie|in-preview
        + _struct.pack(">II", 0, 0)
        + _struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + _struct.pack(">I", dur)
        + b"\x00" * 8
        + _struct.pack(">hhh", 0, 0, 0)
        + b"\x00" * 2
        + matrix
        + _struct.pack(">II", width << 16, height << 16),
    )
    ftyp = box(b"ftyp", b"isom" + _struct.pack(">I", 0x200) + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd)) + box(b"free", b"")


def parse_mp4_meta(b: bytes) -> dict | None:
    """Walk a real ISO-BMFF box tree → ``{brand, timescale,
    duration_ms, n_tracks, width, height}`` or None for non-MP4 /
    corrupt bytes (never raises — fuzz-tested like the other
    decoders). Handles mvhd/tkhd version 0 and 1 and 64-bit box
    sizes; geometry comes from the FIRST track's tkhd (16.16 → int)."""
    try:
        return _parse_mp4_inner(bytes(b or b""))
    except Exception:
        return None


def _boxes(b: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(b[pos : pos + 4], "big")
        tag = b[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(b[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield tag, pos + hdr, pos + size
        pos += size


def _parse_mp4_inner(b: bytes) -> dict | None:
    brand = None
    timescale = duration = None
    n_tracks = 0
    width = height = None
    found_moov = False
    for tag, s, e in _boxes(b, 0, len(b)):
        if tag == b"ftyp" and e - s >= 4:
            brand = b[s : s + 4].decode("latin1")
        elif tag == b"moov":
            found_moov = True
            for t2, s2, e2 in _boxes(b, s, e):
                if t2 == b"mvhd" and e2 - s2 >= 20:
                    ver = b[s2]
                    if ver == 1:
                        timescale = int.from_bytes(b[s2 + 20 : s2 + 24], "big")
                        duration = int.from_bytes(b[s2 + 24 : s2 + 32], "big")
                    else:
                        timescale = int.from_bytes(b[s2 + 12 : s2 + 16], "big")
                        duration = int.from_bytes(b[s2 + 16 : s2 + 20], "big")
                elif t2 == b"trak":
                    n_tracks += 1
                    if width is None:
                        for t3, s3, e3 in _boxes(b, s2, e2):
                            if t3 == b"tkhd" and e3 - s3 >= 8:
                                width = int.from_bytes(b[e3 - 8 : e3 - 4], "big") >> 16
                                height = int.from_bytes(b[e3 - 4 : e3], "big") >> 16
    if not found_moov or brand is None or not timescale:
        return None
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
    }


def video_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """MP4 content → (brand, duration_ms, n_tracks, width, height)
    columns via ``mapInPandas`` — REAL container parsing on real
    bytes; non-MP4 content yields nulls. Same posture as the other
    media kernels: bytes never shuffle, only scalars emerge."""
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("brand", T.StringType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("n_tracks", T.IntegerType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for raw in pdf[content_col]:
                m = parse_mp4_meta(raw)
                if m is None:
                    rows.append((None, None, None, None, None))
                else:
                    rows.append(
                        (m["brand"], m["duration_ms"], m["n_tracks"], m["width"], m["height"])
                    )
            cols = ["brand", "duration_ms", "n_tracks", "width", "height"]
            yield pdf.assign(**dict(zip(cols, map(list, zip(*rows)))))

    return df.mapInPandas(run, schema=out_schema)


def ahash64(b: bytes) -> int | None:
    """64-bit average hash (aHash — the classic perceptual image
    fingerprint): decode to grayscale, map pixels onto an 8×8 grid,
    set bit ``by·8 + bx`` when the block's mean intensity exceeds the
    image mean. All comparisons are EXACT integer cross-products of
    3×-intensity sums (``S_block · N > T · n_block``) — no float
    division anywhere, so any engine or oracle replays the bits.
    Returns a signed int64 (two's complement) or None when the bytes
    don't decode. Near-duplicate images differ in a few bits —
    feed the hashes to ``dedup.simhash_neighbor_pairs``-style
    Hamming banding for pair generation."""
    d = decode_image(bytes(b)) if b else None
    if d is None:
        return None
    _, w, h, px = d
    if w < 1 or h < 1:
        return None
    i3 = [int(round(p * 3)) for p in px]  # exact r+g+b per pixel
    total = sum(i3)
    n = w * h
    s = [0] * 64
    cnt = [0] * 64
    for y in range(h):
        by = y * 8 // h
        base = y * w
        for x in range(w):
            bx = x * 8 // w
            idx = by * 8 + bx
            s[idx] += i3[base + x]
            cnt[idx] += 1
    bits = 0
    for idx in range(64):
        if s[idx] * n > total * cnt[idx] and cnt[idx] > 0:
            bits |= 1 << idx
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def image_ahash(df: DataFrame, content_col: str = "content") -> DataFrame:
    """content → perceptual ``ahash`` int64 column (:func:`ahash64`
    per blob; NULL for undecodable bytes). The dedup key for
    near-duplicate IMAGES: exact groupBy on the hash catches re-
    encodes of the same frame; Hamming-neighbor banding catches
    crops/brightness shifts. Arrow-batched mapInPandas — binary
    never shuffles, only the int64 leaves the scan."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("ahash", T.LongType(), True)]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            yield pdf.assign(
                ahash=pd.array(
                    [ahash64(b) for b in pdf[content_col]], dtype="Int64"
                )
            )

    return df.mapInPandas(run, schema=out_schema)
