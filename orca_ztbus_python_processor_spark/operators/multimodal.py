"""Multimodal column plumbing (SURVEY.md §2.11 X4): image/audio/video
as opaque ``binary`` payloads with typed metadata, processed through
Arrow-batched ``mapInPandas`` pipelines.

The decode step itself is STUBBED — the image/audio libraries are not
in this container — behind ``decoder=`` hooks: the default
deterministic fake decoder exercises the real Spark plumbing (schema,
partitioning, Arrow batch shapes, UDF signatures) end-to-end; passing
``decoder="real"`` raises NotImplementedError with the intended
integration point documented.

Scale: payloads never leave the executor that scanned them — the
mapInPandas stages are map-only (no shuffle); feature extraction
reduces each blob to a small fixed-width vector before any wide
operation. Partition sizing: keep ``maxPartitionBytes`` at/below
128 MB so a partition of blobs fits executor memory.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, "
    "width int, height int, format string, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id long, width int, height int, format string, "
    "payload_bytes long, checksum long, brightness double"
)

_FORMATS = ["png", "jpeg", "webp"]


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media corpus: each document's text bytes act
    as an opaque payload; metadata is derived from a stable hash. This
    is the ingest shape a real pipeline would get from
    ``spark.read.format("binaryFile")``."""
    h = F.abs(F.xxhash64("text"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        (h % 1920 + 16).cast("int").alias("width"),
        (h % 1080 + 16).cast("int").alias("height"),
        F.element_at(
            F.array(*[F.lit(x) for x in _FORMATS]), (h % 3 + 1).cast("int")
        ).alias("format"),
        (h % 240 + 1).cast("int").alias("n_frames"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for an image decode + feature extraction:
    checksum and mean-byte 'brightness' play the role of decoded pixel
    statistics."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "width": pdf["width"],
            "height": pdf["height"],
            "format": pdf["format"],
            "payload_bytes": payloads.map(len).astype("int64"),
            "checksum": payloads.map(lambda b: zlib.crc32(bytes(b))).astype("int64"),
            "brightness": payloads.map(
                lambda b: (sum(bytes(b)) / len(b)) if len(b) else 0.0
            ),
        }
    )


def extract_features(media: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``decoder="real"`` marks where PIL/libvips/ffmpeg decode would go
    (not available in this container).
    """
    if decoder == "real":
        raise NotImplementedError(
            "real image/audio decode requires PIL/libvips/ffmpeg; wire the "
            "decode into _fake_decode_batch's position — the Spark plumbing "
            "(schema, Arrow batches, map-only stage) is identical"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 24) -> DataFrame:
    """Video-frame sampling PLAN: explode n_frames into sampled frame
    indices (the decode of each frame is the stubbed step). Map-only;
    at scale the sampled index list drives a ranged decode."""
    return media.select(
        "media_id",
        "format",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
