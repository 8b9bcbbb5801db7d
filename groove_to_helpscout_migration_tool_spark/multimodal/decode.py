"""Multimodal decode / feature-extract plumbing over BINARY columns.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs (the reference's attachment handling generalized: bytes +
filename/mime/size/hash, TicketProcessor.php:288-312). The Spark-side
plumbing -- schemas, Arrow batching via mapInPandas, partition sizing,
early binary drop -- is real and tested; the codec step itself is
STUBBED (image/audio libs are not in this container): decode_images
raises NotImplementedError unless ``fake=True``, which produces a
deterministic fake decode so the pipeline shape is testable end-to-end.

Scale: binary columns make rows heavy; callers repartition so a batch of
rows fits executor memory (spark.sql.files.maxPartitionBytes analog for
in-flight Arrow batches), and metadata-only consumers never touch the
binary column thanks to Catalyst column pruning -- keep payloads in a
separate column, never inside a struct with hot metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("mime", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("phash", T.StringType()),
])

AUDIO_FEAT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("duration_sec", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"%PDF", "application/pdf"),
    (b"RIFF", "audio/wav"),
]


def sniff_mime(data: "F.Column") -> "F.Column":
    """P13 content-based MIME sniff from magic bytes -- JVM-side hex
    prefix match, no UDF (TicketProcessor.php:296-298 parity)."""
    prefix = F.upper(F.hex(F.substring(data, 1, 4)))
    expr = F.when(data.isNull(), F.lit(None).cast("string"))
    for magic, mime in _MAGIC:
        expr = expr.when(prefix.startswith(magic.hex().upper()[: 8]), F.lit(mime))
    return expr.otherwise(F.lit("application/octet-stream"))


def decode_images(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Decode image binaries -> metadata rows (width/height/phash).

    Arrow-batched mapInPandas; the real decoder would call PIL/cv2 per
    batch. ``fake=True`` derives deterministic pseudo-dimensions from
    the bytes so tests exercise the full distributed path.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable in this environment; "
                    "pass fake=True for the deterministic test decoder"
                )
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[data_col]):
                b = bytes(data) if data is not None else b""
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "mime": "image/png" if b[:4] == b"\x89PNG" else "application/octet-stream",
                        "width": 1 + (len(b) % 512),
                        "height": 1 + (sum(b[:16]) % 512) if b else 1,
                        "n_bytes": len(b),
                        "phash": b[:8].hex() if b else "",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(run, schema=IMAGE_META_SCHEMA)


def extract_audio_features(
    df: DataFrame, id_col: str = "doc_id", data_col: str = "payload", fake: bool = False
) -> DataFrame:
    """Audio binary -> (duration, rms). Same contract as decode_images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio codecs unavailable; pass fake=True for the test path"
                )
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[data_col]):
                b = bytes(data) if data is not None else b""
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_bytes": len(b),
                        "duration_sec": round(len(b) / 16000.0, 6),
                        "rms": round((sum(b[:64]) / max(1, len(b[:64]))) / 255.0, 6),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEAT_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(run, schema=AUDIO_FEAT_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    data_col: str = "payload",
    every_n: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Video binary -> one row per sampled frame (1:N mapInPandas fan-out,
    the multimodal analog of the S5 message explosion)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video codecs unavailable; pass fake=True for the test path"
                )
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[data_col]):
                b = bytes(data) if data is not None else b""
                n_frames = max(1, len(b) // 32)
                for idx in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": idx,
                            "frame": b[idx * 32 : (idx + 1) * 32],
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(run, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resized", T.BinaryType()),
])


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    data_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image binary -> resized binary at (width, height). Same contract
    as decode_images: Arrow-batched mapInPandas, codec stubbed (the real
    decoder is PIL's resize per batch); ``fake=True`` emits a
    deterministic byte-slice standing in for the resized payload, sized
    width*height/64 so output volume scales with the target dims the way
    a real thumbnail stage would."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = max(1, width * height // 64)
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image codecs unavailable; pass fake=True for the test path"
                )
            rows = []
            for doc_id, data in zip(pdf[id_col], pdf[data_col]):
                b = bytes(data) if data is not None else b""
                out = (b * (target // max(1, len(b)) + 1))[:target] if b else b"\x00" * target
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "width": width,
                        "height": height,
                        "resized": out,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, data_col).mapInPandas(run, schema=RESIZED_SCHEMA)
