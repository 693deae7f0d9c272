"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or an object-store URI for >~1 MB payloads so the
row stays small); typed metadata travels in a sibling struct; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so each task
processes whole record batches without JVM↔Python per-row cost.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so ``decode_images`` dispatches to a clearly-marked
deterministic stub — the Spark-side contract (schema, batch iteration,
partition sizing) is real and tested; swap ``_decode_batch_stub`` for a
real decoder in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_size", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
        StructField("content_digest", StringType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, id_col: str, text_col: str, media_type: str = "image"
) -> DataFrame:
    """Build a multimodal-shaped table from the documents fixture:
    payload = utf-8 bytes of the text (stand-in for real media bytes),
    metadata struct alongside. Schema matches what a real
    image/audio ingest would produce."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(text_col)).cast("bigint").alias("byte_size"),
        ).alias("meta"),
    )


def _decode_batch_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """DETERMINISTIC FAKE DECODER (container has no image/audio libs).

    Real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # not installed
        raise NotImplementedError("real codec goes here")

    The fake derives plausible dimensions from the payload digest so
    the full pipeline (schema, batching, downstream joins) is testable
    and reproducible.
    """
    sizes = pdf["payload"].map(len)
    digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "byte_size": sizes.astype("int64"),
            "width": (sizes % 640 + 16).astype("int64"),
            "height": (sizes % 480 + 16).astype("int64"),
            "n_frames": (sizes % 24 + 1).astype("int64"),
            "content_digest": digests,
        }
    )


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_images(
    multimodal: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize via mapInPandas — STUB TRANSFORM (no PIL in container):
    real impl would be ``img.resize((target_w, target_h))``; the stub
    truncates/pads the payload deterministically so byte-level goldens
    hold. Spark-side contract (schema, Arrow batching, partition
    preservation) is real."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = target_w * target_h // 64  # fake byte budget
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": pdf["payload"].map(
                        lambda b: bytes(b)[:n].ljust(n, b"\x00")
                    ),
                }
            )

    return multimodal.mapInPandas(gen, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(multimodal: DataFrame, every_n: int = 8) -> DataFrame:
    """Frame sampling via mapInPandas — STUB DECODER (no ffmpeg): the
    fake treats each 64-byte payload chunk as a 'frame' and emits every
    ``every_n``-th one (1→N row fan-out, the real shape of video
    sampling). Real impl: seek+decode keyframes with PyAV/ffmpeg."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                n_frames = max(1, len(raw) // 64)
                for k in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(k)
                    digests.append(
                        hashlib.md5(raw[k * 64 : (k + 1) * 64]).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_digest": digests}
            )

    return multimodal.mapInPandas(gen, FRAME_SCHEMA)


def decode_media(multimodal: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Each partition streams record batches through Python once —
    the correct shape for CPU-heavy per-item work; at scale pair with
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound batch
    memory for large payloads.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            flat = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": pdf["payload"],
                    "media_type": pdf["meta"].map(lambda m: m["media_type"]),
                }
            )
            yield _decode_batch_stub(flat)

    return multimodal.mapInPandas(gen, DECODED_SCHEMA)
