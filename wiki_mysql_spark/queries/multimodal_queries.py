"""Multimodal plumbing as oracle-checked queries: the native metadata path
and the Arrow/mapInPandas feature path must both reproduce what DuckDB
computes over the same bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_features,
    extract_features,
    payload_metadata,
)
from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import (
    load_table,
    map_in_pandas_spread,
    spread_small_scan,
)


def _payload_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The Arrow feature path ships payload bytes through Python workers; a
    # single-partition scan would serialize all of that on one core.
    return attach_binary_payload(
        spread_small_scan(
            load_table(spark, sf_dir, "documents"), heavy_rows=True
        )
    )


@query(
    "multimodal_metadata",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native (no-Python) metadata over a binary payload column — the path
    that must stay pruned-scan-fast at 100 TB (payload column untouched)."""
    return payload_metadata(_payload_docs(spark, sf_dir))


@query(
    "multimodal_features_arrow",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           lower(hex(encode(substr(text, 1, 4)))) AS head_hex
    FROM documents
    """,
)
def multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same features computed through the Arrow-batched mapInPandas hot
    path — proves the multimodal batch plumbing (schema, batching, binary
    round-trip) is byte-correct, not just the native expressions."""
    return extract_features(_payload_docs(spark, sf_dir))


@query(
    "multimodal_decode_stub",
    """
    -- the fake decoder is deterministic length arithmetic
    -- (operators/multimodal.py decode_image fake=True), so the oracle
    -- recomputes it exactly: width = len % 64 + 1, height = len % 48 + 1
    SELECT doc_id,
           (octet_length(encode(text)) % 64 + 1)::BIGINT AS width,
           (octet_length(encode(text)) % 48 + 1)::BIGINT AS height
    FROM documents
    """,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake image-decode (real codec stubbed behind
    NotImplementedError) exercising the decode-shaped mapInPandas plumbing;
    the fake's size arithmetic is oracled exactly like the real BMP codec's."""
    return decode_image_features(_payload_docs(spark, sf_dir), fake=True)


@query(
    "multimodal_frame_sample",
    """
    -- documents.text is ASCII, so char arithmetic == byte arithmetic
    -- (DuckDB has no 3-arg substr over BLOBs)
    SELECT doc_id, f.i::BIGINT AS frame_idx,
           CASE WHEN length(text) // 4 > 0
                THEN length(substr(text, (f.i * (length(text) // 4))::INT + 1,
                                   (length(text) // 4)::INT))
                ELSE length(substr(text, f.i::INT + 1, 1)) END::BIGINT AS frame_bytes
    FROM documents, (SELECT unnest(range(4)) AS i) f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (1 payload -> N frame rows via mapInPandas) — the
    video-preprocessing explode shape; frame byte-lengths are checked against
    arithmetic the oracle can compute."""
    from wiki_mysql_spark.operators.multimodal import sample_frames

    frames = sample_frames(_payload_docs(spark, sf_dir), n_frames=4, fake=True)
    return frames.select(
        "doc_id", "frame_idx", F.octet_length("frame").cast("long").alias("frame_bytes")
    )


@query(
    "multimodal_decode_bmp",
    """
    -- the builder makes a ((len % 16) + 1) x ((len % 12) + 1) 24-bit BMP
    -- from each doc's bytes; the oracle recomputes the REAL codec's header
    -- arithmetic: 54-byte headers + rows padded to 4 bytes, bottom-up.
    SELECT doc_id,
           ((octet_length(encode(text)) % 16) + 1)::BIGINT AS width,
           ((octet_length(encode(text)) % 12) + 1)::BIGINT AS height,
           (54 + (((((octet_length(encode(text)) % 16) + 1) * 3 + 3) // 4) * 4)
               * ((octet_length(encode(text)) % 12) + 1))::BIGINT AS n_bmp_bytes
    FROM documents
    """,
)
def multimodal_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: each document's bytes become the pixels
    of an actual 24-bit BMP (pure numpy/struct codec in
    `operators/multimodal.py`), which the real decoder then parses back —
    width/height from the header, total size validating the encoder's
    row-padding math. No fake path anywhere; the oracle recomputes the BMP
    format arithmetic independently."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import LongType, StructField, StructType

    from wiki_mysql_spark.operators.multimodal import decode_image, encode_bmp

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_bmp_bytes", LongType()),
        ]
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                w, h = (len(b) % 16) + 1, (len(b) % 12) + 1
                need = w * h * 3
                pix = np.frombuffer(
                    (b * (need // max(1, len(b)) + 1))[:need] if b else b"\0" * need,
                    dtype=np.uint8,
                ).reshape(h, w, 3)
                bmp = encode_bmp(pix)
                dw, dh = decode_image(bmp)  # REAL decode, no fake flag
                ids.append(doc_id)
                ws.append(dw)
                hs.append(dh)
                ns.append(len(bmp))
            yield pd.DataFrame(
                {"doc_id": ids, "width": ws, "height": hs, "n_bmp_bytes": ns}
            )

    return map_in_pandas_spread(
        _payload_docs(spark, sf_dir).select("doc_id", "payload"),
        _roundtrip,
        schema,
    )


@query(
    "multimodal_decode_png",
    """
    -- the builder tiles each doc's CHARACTER codepoints (mod 256) into the
    -- pixels of a REAL compressed PNG (DEFLATE via stdlib zlib; scanline
    -- filters cycle 0-4), then the real decoder reconstructs them. The
    -- whole construction is character-domain on BOTH engines (length /
    -- substr / ascii are char-indexed here), so it stays exact even for
    -- non-ASCII text — unlike byte-domain arithmetic, where char-indexed
    -- substr with byte-derived indices would diverge.
    SELECT doc_id,
           ((length(text) % 16) + 1)::BIGINT AS width,
           ((length(text) % 12) + 1)::BIGINT AS height,
           (CASE WHEN length(text) = 0 THEN 0
                ELSE list_sum(list_transform(
                       range((((length(text) % 16) + 1)
                              * ((length(text) % 12) + 1)
                              * 3)::BIGINT),
                       i -> ascii(substr(text,
                                         ((i % length(text)) + 1)::INT,
                                         1)) % 256))
           END)::BIGINT AS pixel_sum,
           TRUE AS roundtrip_exact
    FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)
    """,
)
def multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **compressed** image decode end-to-end: each document's bytes
    become the pixels of an actual PNG (DEFLATE from the stdlib ``zlib`` —
    container + all five scanline filters implemented in
    ``operators/multimodal.py``, filters cycling per row so every filter
    type runs in production), which the real decoder then parses back —
    width/height from IHDR, ``pixel_sum`` over the reconstructed (i.e.
    inflated + unfiltered) pixels, and a Spark-side pixel-exact comparison
    against the pre-compression input. The oracle recomputes the builder
    arithmetic independently, so a decoder that inflates or unfilters wrong
    changes ``pixel_sum``/``roundtrip_exact`` and fails the hash. Pixels
    come from CHARACTER codepoints (mod 256), matching the char-indexed
    oracle for any text, ASCII or not."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from wiki_mysql_spark.operators.multimodal import decode_png, encode_png

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("pixel_sum", LongType()),
            StructField("roundtrip_exact", BooleanType()),
        ]
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in
                   ("doc_id", "width", "height", "pixel_sum", "roundtrip_exact")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = text or ""
                n = len(s)
                w, h = (n % 16) + 1, (n % 12) + 1
                need = w * h * 3
                if n:
                    # codepoints mod 256, vectorized (utf-32-le = one u4
                    # per character), tiled to the pixel count
                    codes = (
                        np.frombuffer(s.encode("utf-32-le"), dtype="<u4") % 256
                    ).astype(np.uint8)
                    reps = need // n + 1
                    pix = np.tile(codes, reps)[:need]
                else:
                    pix = np.zeros(need, dtype=np.uint8)
                pix = pix.reshape(h, w, 3)
                png = encode_png(pix, filter_type=None)  # cycle all 5 filters
                dec = decode_png(png)  # REAL inflate + unfilter
                out["doc_id"].append(doc_id)
                out["width"].append(dec.shape[1])
                out["height"].append(dec.shape[0])
                out["pixel_sum"].append(int(dec.astype(np.int64).sum()))
                out["roundtrip_exact"].append(bool((dec == pix).all()))
            yield pd.DataFrame(out)

    return map_in_pandas_spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        _roundtrip,
        schema,
    )


@query(
    "multimodal_decode_wav",
    """
    -- the builder turns each doc's bytes into ((len % 50) + 1) * 8 int16
    -- samples at 8 kHz; the oracle recomputes the REAL codec's header
    -- arithmetic: 44-byte RIFF/fmt/data framing + 2 bytes per sample.
    SELECT doc_id,
           8000::BIGINT AS sample_rate,
           (((octet_length(encode(text)) % 50) + 1) * 8)::BIGINT AS n_frames,
           (44 + 2 * (((octet_length(encode(text)) % 50) + 1) * 8))::BIGINT
               AS n_wav_bytes,
           round((((octet_length(encode(text)) % 50) + 1) * 8) / 8.0, 3) + 0
               AS duration_ms
    FROM documents
    """,
)
def multimodal_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end: each document's bytes become 16-bit PCM
    samples of an actual WAV file (RIFF codec in `operators/multimodal.py`),
    which the real chunk-walking decoder parses back — sample rate and frame
    count from the headers, total size validating the encoder's framing. The
    oracle recomputes the WAV format arithmetic independently."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from wiki_mysql_spark.operators.multimodal import decode_wav, encode_wav

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sample_rate", LongType()),
            StructField("n_frames", LongType()),
            StructField("n_wav_bytes", LongType()),
            StructField("duration_ms", DoubleType()),
        ]
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "sample_rate", "n_frames",
                                   "n_wav_bytes", "duration_ms")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = ((len(b) % 50) + 1) * 8
                raw = (b * (2 * n // max(1, len(b)) + 1))[: 2 * n] if b else b"\0" * (2 * n)
                wav = encode_wav(np.frombuffer(raw, dtype="<i2"), rate=8000)
                rate, ch, samples = decode_wav(wav)  # REAL decode
                assert ch == 1
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_frames"].append(samples.shape[0])
                out["n_wav_bytes"].append(len(wav))
                out["duration_ms"].append(round(samples.shape[0] * 1000.0 / rate, 3))
            yield pd.DataFrame(out)

    return map_in_pandas_spread(
        _payload_docs(spark, sf_dir).select("doc_id", "payload"),
        _roundtrip,
        schema,
    )


@query(
    "multimodal_decode_jpeg",
    """
    -- the builder tiles each doc's CHARACTER codepoints (mod 256) into the
    -- pixels of a REAL baseline JPEG (DCT + quantization + Huffman, pure
    -- numpy/stdlib codec in operators/multimodal.py), then the real
    -- decoder reconstructs them. JPEG is LOSSY, so the oracle checks the
    -- exactly-recomputable facts: dimensions and pixel count from the
    -- builder arithmetic, plus tolerance flags that the Spark side
    -- computes from the actual decoded pixels (a decoder with broken
    -- Huffman/dequant/IDCT blows the 12-levels bound immediately).
    SELECT doc_id,
           ((length(text) % 16) + 1)::BIGINT AS width,
           ((length(text) % 12) + 1)::BIGINT AS height,
           (((length(text) % 16) + 1) * ((length(text) % 12) + 1) * 3)::BIGINT
               AS n_pixels,
           CASE doc_id % 4 WHEN 0 THEN '444' WHEN 1 THEN '422'
                          WHEN 2 THEN '420' ELSE 'prog' END AS subsampling,
           TRUE AS within_tolerance,
           TRUE AS mean_err_small
    FROM (SELECT doc_id, coalesce(text, '') AS text FROM documents)
    """,
)
def multimodal_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL **lossy compressed** image decode end-to-end: each document's
    character codepoints become the pixels of an actual baseline JPEG
    (quality 95; spec-derived codec: DCT, Annex-K quantization, zigzag,
    DC DPCM, canonical Huffman, byte stuffing — ``operators/multimodal.py``
    ``encode_jpeg``/``decode_jpeg``), which the real decoder then parses
    back. The subsampling layout cycles by doc_id — 4:4:4, 4:2:2, and
    4:2:0 (the layout virtually every camera/web JPEG ships) — so the
    sampled-MCU interleave and chroma upsampling paths are exercised on
    the fixture corpus, not just in unit tests; a fourth cycle position
    round-trips PROGRESSIVE (SOF2) encoding — spectral selection +
    successive approximation scans, decoded by the Annex-G scan machine
    (bit-identical to baseline by construction, so it shares the 4:4:4
    tolerance). Dimensions/pixel count
    are oracle-exact; reconstruction quality is asserted as tolerance
    booleans computed from the decoded pixels: RGB max |err| <= 48 and
    mean |err| <= 12 at 4:4:4; for subsampled layouts the same bounds on
    the LUMA plane (what subsampling preserves by design — chroma on
    noise-like input loses information BY SPEC, that's the point of
    4:2:0). A broken Huffman/dequant/IDCT/interleave lands far outside
    either bound."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from wiki_mysql_spark.operators.multimodal import (
        _rgb_to_ycbcr,
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("n_pixels", LongType()),
            StructField("subsampling", StringType()),
            StructField("within_tolerance", BooleanType()),
            StructField("mean_err_small", BooleanType()),
        ]
    )

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "width", "height", "n_pixels",
                                   "subsampling", "within_tolerance",
                                   "mean_err_small")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = text or ""
                n = len(s)
                w, h = (n % 16) + 1, (n % 12) + 1
                need = w * h * 3
                if n:
                    codes = (
                        np.frombuffer(s.encode("utf-32-le"), dtype="<u4") % 256
                    ).astype(np.uint8)
                    pix = np.tile(codes, need // n + 1)[:need]
                else:
                    pix = np.zeros(need, dtype=np.uint8)
                pix = pix.reshape(h, w, 3)
                mode = ("444", "422", "420", "prog")[int(doc_id) % 4]
                if mode == "prog":
                    enc = encode_jpeg_progressive(pix, quality=95)
                else:
                    enc = encode_jpeg(pix, quality=95, subsampling=mode)
                dec = decode_jpeg(enc)
                if mode in ("444", "prog"):
                    err = np.abs(dec.astype(np.int64) - pix.astype(np.int64))
                else:
                    err = np.abs(
                        _rgb_to_ycbcr(dec)[..., 0] - _rgb_to_ycbcr(pix)[..., 0]
                    )
                out["doc_id"].append(doc_id)
                out["width"].append(dec.shape[1])
                out["height"].append(dec.shape[0])
                out["n_pixels"].append(int(dec.size))
                out["subsampling"].append(mode)
                out["within_tolerance"].append(bool(err.max() <= 48))
                out["mean_err_small"].append(bool(err.mean() <= 12.0))
            yield pd.DataFrame(out)

    return map_in_pandas_spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        _roundtrip,
        schema,
    )


@query(
    "multimodal_decode_video",
    """
    -- the builder tiles each doc's character codepoints into FOUR
    -- 8x8-RGB frames of a REAL MJPEG AVI (RIFF container + per-frame
    -- baseline JPEG), then the real container+codec chain decodes it.
    -- Container facts (frame count, fps, dims) are exactly recomputable;
    -- reconstruction quality is a tolerance boolean from the decoded
    -- pixels (JPEG frames are lossy by spec).
    SELECT doc_id,
           4::BIGINT AS n_frames,
           10::BIGINT AS fps,
           8::BIGINT AS width,
           8::BIGINT AS height,
           TRUE AS within_tolerance
    FROM documents
    """,
)
def multimodal_decode_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode end-to-end: each document becomes a 4-frame MJPEG
    AVI (RIFF container from the public spec + the baseline-JPEG codec,
    all pure numpy/stdlib — ``operators/multimodal.py``
    ``encode_avi_mjpeg``/``decode_avi_mjpeg``), which the real
    chunk-walking decoder parses back: frame count and fps from the
    container headers, dims and pixels from the per-frame JPEG decode.
    The oracle recomputes the container arithmetic; a broken RIFF walk,
    Huffman table, or IDCT breaks the frame count or blows the 48-level
    tolerance."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator
    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StructField,
        StructType,
    )

    from wiki_mysql_spark.operators.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_frames", LongType()),
            StructField("fps", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("within_tolerance", BooleanType()),
        ]
    )
    w = h = 8
    k = 4

    def _roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("doc_id", "n_frames", "fps", "width",
                                   "height", "within_tolerance")}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                s = text or ""
                need = k * w * h * 3
                if s:
                    codes = (
                        np.frombuffer(s.encode("utf-32-le"), dtype="<u4") % 256
                    ).astype(np.uint8)
                    pix = np.tile(codes, need // len(s) + 1)[:need]
                else:
                    pix = np.zeros(need, dtype=np.uint8)
                frames = list(pix.reshape(k, h, w, 3))
                fps, dec = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=10))
                errs = [
                    np.abs(d.astype(np.int64) - f.astype(np.int64)).max()
                    for d, f in zip(dec, frames)
                ]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(len(dec))
                out["fps"].append(fps)
                out["width"].append(dec[0].shape[1])
                out["height"].append(dec[0].shape[0])
                out["within_tolerance"].append(bool(max(errs) <= 48))
            yield pd.DataFrame(out)

    return map_in_pandas_spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"),
        _roundtrip,
        schema,
    )
