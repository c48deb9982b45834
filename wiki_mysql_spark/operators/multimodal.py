"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata.
The Spark-side machinery — schema, partition-friendly layout, Arrow-batched
``mapInPandas`` feature extraction — is real and tested; the actual
image/audio DECODE is stubbed (the codec libraries are not in this
environment) behind :func:`decode_image`, which raises ``NotImplementedError``
unless a deterministic fake decoder is requested.

At 100 TB the rules encoded here:
  * keep payload bytes in their own column so column pruning skips them for
    metadata-only queries (parquet reads only requested columns);
  * metadata (length, magic, checksums) computed natively where possible;
  * per-batch Python (mapInPandas) only for genuine byte-level work, sized
    by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

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

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_hex", StringType()),
    ]
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary payload column (here: UTF-8 bytes of the
    text — a stand-in for image/audio bytes with identical plumbing)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Typed metadata over the binary column, fully native (no Python):
    byte length and a lowercase hex 'magic' prefix."""
    return docs.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("head_hex"),
    )


def extract_features(docs: DataFrame) -> DataFrame:
    """Arrow-batched byte-level feature extraction via mapInPandas —
    the real multimodal hot path shape (decode/resize/frame-sample would
    slot in here); features chosen to be independently checkable."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: bytes(b[:4]).hex()),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    STUB: real decoding needs an image codec library that is not available
    in this environment. With ``fake=True`` a deterministic fake is returned
    (derived from the byte length) so downstream plumbing is testable.
    """
    if fake:
        return (len(payload) % 64 + 1, len(payload) % 48 + 1)
    raise NotImplementedError(
        "image decoding requires a codec library (e.g. Pillow); "
        "wire it in here — the Spark-side plumbing (binary column, "
        "mapInPandas batching, schema) is already in place"
    )


def resize_image(payload: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """Resize an image payload. STUB (no codec library in this environment);
    ``fake=True`` returns a deterministic truncation/padding of the bytes so
    batch plumbing is testable end-to-end."""
    if fake:
        target = max(1, width * height)
        return (payload * (target // max(1, len(payload)) + 1))[:target]
    raise NotImplementedError(
        "image resize requires a codec library (e.g. Pillow); the "
        "mapInPandas plumbing below is ready for it"
    )


def resize_images(
    docs: DataFrame, *, width: int = 8, height: int = 8, fake: bool = True
) -> DataFrame:
    """Batch resize over the binary column (decode->resize->re-encode shape)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("n_bytes", LongType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf["payload"].map(
                lambda b: resize_image(bytes(b), width, height, fake=fake)
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": out,
                    "n_bytes": out.map(len).astype("int64"),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(_resize, schema)


def sample_frames(
    docs: DataFrame, *, n_frames: int = 4, fake: bool = True
) -> DataFrame:
    """Frame sampling for video-shaped payloads: one output row per sampled
    frame (the 1->N explode shape of multimodal preprocessing). The fake
    'decoder' slices the payload into n equal chunks deterministically."""
    if not fake:
        raise NotImplementedError("video decoding requires a codec library")
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * step : (i + 1) * step])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return docs.select("doc_id", "payload").mapInPandas(_sample, schema)


def decode_image_features(docs: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas wrapper around decode_image (fake-decoder default, since
    no codec ships in this environment)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(lambda b: decode_image(bytes(b), fake=fake))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d[0]).astype("int64"),
                    "height": dims.map(lambda d: d[1]).astype("int64"),
                }
            )

    return docs.select("doc_id", "payload").mapInPandas(_decode, schema)
