"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns + typed metadata.
The Spark-side machinery — schema, partition-friendly layout, Arrow-batched
``mapInPandas`` feature extraction — is real and tested. Decoding is REAL
for 24-bit BMP (a pure numpy/struct codec below — no external library
needed): :func:`decode_image` sniffs the ``BM`` magic and parses/round-trips
actual pixels; :func:`resize_image` nearest-neighbor-resamples real BMPs.
PNG — a genuinely COMPRESSED format — is also REAL as of round 3: DEFLATE
comes from the stdlib ``zlib`` module, so :func:`encode_png` /
:func:`decode_png` below implement the container + all five scanline
filters with no external library. JPEG/video still need a codec library
that is not in this environment (checked again round 3: no Pillow) and
raise ``NotImplementedError`` — the ``fake=`` deterministic stand-ins keep
that plumbing testable.

At 100 TB the rules encoded here:
  * keep payload bytes in their own column so column pruning skips them for
    metadata-only queries (parquet reads only requested columns);
  * metadata (length, magic, checksums) computed natively where possible;
  * per-batch Python (mapInPandas) only for genuine byte-level work, sized
    by spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
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


# ---------------------------------------------------------------------------
# real codec: 24-bit uncompressed BMP (pure struct/numpy — format is public:
# 14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, BGR rows bottom-up,
# each row zero-padded to a 4-byte boundary)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB")
    row_size = (w * 3 + 3) & ~3
    data_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + data_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, row_size), dtype=np.uint8)
    rows[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode a 24-bit uncompressed BMP to an (h, w, 3) uint8 RGB array."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flipped = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flipped else img


# ---------------------------------------------------------------------------
# real codec: PNG (a genuinely COMPRESSED format — DEFLATE via the stdlib
# zlib module, so no external codec library is needed after all). 8-bit
# greyscale / RGB / RGBA, no interlace; the decoder implements all five
# scanline filter types (None/Sub/Up/Average/Paeth) and the encoder can
# apply any of them, so round-trip tests exercise the full filter matrix.
# ---------------------------------------------------------------------------


def encode_png(pixels: "np.ndarray", *, filter_type: int | None = 0) -> bytes:
    """Encode a uint8 array ((h, w) grey, (h, w, 3) RGB or (h, w, 4) RGBA)
    as a PNG. ``filter_type`` picks the scanline filter (0-4); ``None``
    cycles ``row % 5`` so every filter appears — handy for decoder tests."""
    if pixels.ndim == 2:
        color_type, bpp = 0, 1
        flat = pixels
    elif pixels.ndim == 3 and pixels.shape[2] in (3, 4):
        color_type = {3: 2, 4: 6}[pixels.shape[2]]
        bpp = pixels.shape[2]
        flat = pixels.reshape(pixels.shape[0], -1)
    else:
        raise ValueError("expected (h,w), (h,w,3) or (h,w,4) uint8")
    h, w = pixels.shape[0], pixels.shape[1]
    flat = flat.astype(np.uint8)
    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        row = flat[y]
        ft = (y % 5) if filter_type is None else filter_type
        raw.append(ft)
        raw.extend(_png_filter_row(row, prev, ft, bpp).tobytes())
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(
            b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        )
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """Decode an 8-bit non-interlaced PNG (grey/RGB/RGBA, filters 0-4) to a
    uint8 array of shape (h, w[, channels])."""
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (size,), ctype = struct.unpack_from(">I", payload, pos), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + CRC
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _, _, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in (0, 2, 6):
        raise NotImplementedError(
            "only 8-bit non-interlaced grey/RGB/RGBA PNG supported"
        )
    bpp = {0: 1, 2: 3, 6: 4}[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ft = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1)
        prev = _png_unfilter_row(row, prev, ft, bpp)
        out[y] = prev
    return out if color_type == 0 else out.reshape(h, w, bpp)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_filter_row(
    row: "np.ndarray", prev: "np.ndarray", ft: int, bpp: int
) -> "np.ndarray":
    """Apply PNG scanline filter ``ft`` (spec §6: a=left, b=up, c=up-left;
    all arithmetic mod 256, which uint8 wraparound gives for free)."""
    r = row.astype(np.int32)
    a = np.concatenate([np.zeros(bpp, np.int32), r[:-bpp]])
    b = prev.astype(np.int32)
    c = np.concatenate([np.zeros(bpp, np.int32), b[:-bpp]])
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - a
    elif ft == 2:
        out = r - b
    elif ft == 3:
        out = r - (a + b) // 2
    elif ft == 4:
        out = r - _paeth(a, b, c)
    else:
        raise ValueError(f"bad filter type {ft}")
    return (out % 256).astype(np.uint8)


def _png_unfilter_row(
    row: "np.ndarray", prev: "np.ndarray", ft: int, bpp: int
) -> "np.ndarray":
    """Invert a scanline filter. None/Up vectorize whole-row; Sub is a
    per-channel prefix sum (cumsum); only Average/Paeth genuinely recur on
    the just-reconstructed left pixel and run per-pixel (rows are short —
    one scanline — and this is the decode hot loop only for filtered
    data)."""
    if ft == 0:
        return row.copy()
    if ft == 2:
        return ((row.astype(np.int32) + prev) % 256).astype(np.uint8)
    if ft == 1:
        # Sub's recurrence out[i] = row[i] + out[i-bpp] is a per-channel
        # prefix sum — vectorized instead of the per-pixel loop below
        return (
            np.cumsum(row.reshape(-1, bpp).astype(np.int64), axis=0) % 256
        ).astype(np.uint8).reshape(-1)
    out = np.zeros_like(row)
    for i in range(len(row)):
        a = int(out[i - bpp]) if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ft == 3:
            rec = row[i] + (a + b) // 2
        elif ft == 4:
            rec = row[i] + int(_paeth(np.int32(a), np.int32(b), np.int32(c)))
        else:
            raise ValueError(f"bad filter type {ft}")
        out[i] = rec % 256
    return out


def _paeth(a: "np.ndarray", b: "np.ndarray", c: "np.ndarray") -> "np.ndarray":
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


# ---------------------------------------------------------------------------
# real codec: 16-bit PCM WAV (RIFF header + raw samples — also library-free)
# ---------------------------------------------------------------------------


def encode_wav(samples: "np.ndarray", *, rate: int = 8000) -> bytes:
    """Encode int16 PCM samples ((n,) mono or (n, ch)) as a WAV file."""
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    data = samples.astype("<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH", b"fmt ", 16, 1, ch, rate, rate * ch * 2, ch * 2, 16
        )
        + struct.pack("<4sI", b"data", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Decode a 16-bit PCM WAV to (sample_rate, channels, samples[n, ch])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    # walk the chunk list (fmt / data may be preceded by others, e.g. LIST)
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            fmt_code, ch, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError("only 16-bit PCM WAV supported")
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    return rate, ch, samples.reshape(-1, ch)


def audio_features(payload: bytes) -> tuple[int, int, int, float]:
    """(sample_rate, channels, n_frames, rms) from a real WAV decode."""
    rate, ch, samples = decode_wav(payload)
    x = samples.astype(np.float64)
    rms = float(np.sqrt(np.mean(x * x))) if samples.size else 0.0
    return rate, ch, samples.shape[0], rms


def decode_image(payload: bytes, *, fake: bool = False) -> tuple[int, int]:
    """Decode an image payload to (width, height).

    REAL for BMP (``BM`` magic — header parse, validated against full pixel
    round-trips in tests). Compressed codecs need a library that is not in
    this environment; ``fake=True`` returns a deterministic length-derived
    stand-in so that plumbing stays testable.
    """
    if fake:
        return (len(payload) % 64 + 1, len(payload) % 48 + 1)
    if payload[:2] == b"BM":
        w, h = struct.unpack_from("<ii", payload, 18)
        return (w, abs(h))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack_from(">II", payload, 16)  # IHDR is always first
        return (w, h)
    raise NotImplementedError(
        "only BMP and PNG decode natively; JPEG/video need a codec library "
        "(e.g. Pillow) — wire it in here, the Spark-side plumbing "
        "(binary column, mapInPandas batching, schema) is already in place"
    )


def resize_image(payload: bytes, width: int, height: int, *, fake: bool = False) -> bytes:
    """Resize an image payload to (width, height).

    REAL for BMP: decode, nearest-neighbor resample via numpy fancy
    indexing, re-encode. ``fake=True`` returns a deterministic
    truncation/padding of the bytes (non-BMP plumbing tests)."""
    if fake:
        target = max(1, width * height)
        return (payload * (target // max(1, len(payload)) + 1))[:target]
    if payload[:2] != b"BM":
        raise NotImplementedError(
            "only BMP resizes natively; compressed codecs need a library"
        )
    img = decode_bmp(payload)
    h, w, _ = img.shape
    yi = (np.arange(height) * h) // height
    xi = (np.arange(width) * w) // width
    return encode_bmp(img[yi][:, xi])


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
