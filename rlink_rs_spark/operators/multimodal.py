"""Multimodal column plumbing: image/audio/video payloads as opaque
``binary`` columns with a typed metadata struct, processed in Arrow batches
via mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_stub=True`` produces deterministic fake features; passing False
raises NotImplementedError at the exact point a real decoder (PIL,
torchaudio, ffmpeg) would plug in. Everything Spark-side -- schema,
partitioning, UDF signature, Arrow batch shape -- is real and tested.

At 100 TB: payloads stay columnar in parquet (binary column, never
collected); mapInPandas streams Arrow batches so peak memory is one batch,
not one partition; feature extraction parallelizes per input split with no
shuffle. Repartition upstream only if payload sizes are skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# metadata struct carried alongside every payload
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),  # extracted embedding
        T.StructField("decode_ok", T.BooleanType(), False),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the
    multimodal path is exercisable on the fixture tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake feature vector: md5-expanded bytes -> [0,1) floats.
    Stands in for a real decoder + encoder forward pass. The counter suffix
    is printable (':0', ':1', ...) so a SQL oracle can mirror the expansion
    with plain string md5."""
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.md5(payload + f":{counter}".encode()).digest()
        out.extend(b / 256.0 for b in h)  # [0, 1): 255 -> 0.996..., never 1.0
        counter += 1
    return out[:dim]


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract payloads via mapInPandas (Arrow-batched;
    the only Python hop in the multimodal path). n_bytes/content_hash are
    JVM built-ins (octet_length/md5) computed BEFORE the Python stage --
    only the decode itself crosses the Arrow boundary."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/torchaudio/ffmpeg -- "
                    "not available in this container; use decode_stub=True"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["n_bytes"],
                    "content_hash": pdf["content_hash"],
                    "feature": payloads.map(
                        lambda b: _fake_decode(bytes(b), dim) if b is not None else None
                    ),
                    "decode_ok": payloads.notna(),
                }
            )

    staged = media.select(
        "media_id",
        "payload",
        F.coalesce(F.octet_length("payload"), F.lit(0)).alias("n_bytes"),
        F.md5("payload").alias("content_hash"),
    )
    return staged.mapInPandas(op, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
        T.StructField("resized", T.BooleanType(), False),
    ]
)


def resize(
    media: DataFrame,
    target_width: int,
    target_height: int,
    decode_stub: bool = True,
) -> DataFrame:
    """Image-resize plumbing via mapInPandas: payload -> decoded pixels ->
    scaled -> re-encoded payload, with meta.width/height rewritten to the
    target. The pixel transform is STUBBED (no image libs in this
    container): the stub passes the payload through unchanged but performs
    the full schema/meta rewrite; decode_stub=False raises at the exact
    seam where PIL's Image.resize would plug in. Arrow-batched, no
    shuffle -- resize parallelizes per input split like extract_features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires PIL/opencv -- not available "
                    "in this container; use decode_stub=True"
                )
            metas = pdf["meta"].map(
                lambda m: {**(m or {}), "width": target_width, "height": target_height}
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: bytes unchanged
                    "meta": metas,
                    "resized": pdf["payload"].notna(),
                }
            )

    return media.mapInPandas(op, RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled timestamp
    (real decoder would attach the frame payload; stub attaches offsets).
    Pure Spark explode -- no Python."""
    n_frames = F.greatest(F.lit(1), (F.col("meta.duration_ms") / every_ms).cast("int"))
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select("media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("offset_ms"))


# ---------------------------------------------------------------------------
# REAL dependency-free codecs (round 14): the decode seam stops being a
# stub for formats whose byte layout needs no external library. P6 PPM
# (binary RGB image) and RIFF/WAVE PCM16 are parsed with numpy alone, so
# decode -> transform -> re-encode runs for real in this container; the
# PIL/ffmpeg seam above remains for COMPRESSED formats (jpeg/mp4).

import struct

import numpy as np


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """Binary P6 PPM from an (H, W, 3) uint8 array."""
    h, w, c = pixels.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> "np.ndarray":
    """REAL P6 PPM decode: parse magic/dims/maxval header tokens (with
    comment lines), then view the raster as (H, W, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    # header = 4 whitespace-separated tokens (magic, w, h, maxval), with
    # optional '#' comment lines; raster starts after ONE whitespace byte
    tokens: list[bytes] = []
    i = 0
    while len(tokens) < 4:
        while payload[i : i + 1].isspace():
            i += 1
        if i >= len(payload):
            raise ValueError("truncated PPM header")
        if payload[i : i + 1] == b"#":
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j >= len(payload):
            raise ValueError("truncated PPM header")
        tokens.append(payload[i:j])
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = int(tokens[1]), int(tokens[2]), int(tokens[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: "np.ndarray") -> bytes:
    """REAL (dependency-free) PNG encode of an (H, W, 3) uint8 array:
    8-bit RGB (color type 2), non-interlaced, filter-0 scanlines, one
    zlib IDAT -- stdlib zlib + struct only. A COMPRESSED-format encoder,
    shrinking the PIL seam (multimodal.py:98) to JPEG/MP3/MP4."""
    import zlib

    h, w, c = pixels.shape
    assert c == 3
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    px = pixels.astype(np.uint8)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """REAL PNG decode for 8-bit RGB non-interlaced images: chunk walk
    with CRC32 verification, zlib inflate, and ALL FIVE scanline
    unfilters (None/Sub/Up/Average/Paeth, the full spec set -- any
    conforming encoder's output decodes, not just our own filter-0).
    None/Sub/Up are vectorized (Sub is a per-lane wrapping cumsum);
    Average/Paeth are inherently sequential per byte and kept exact."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    i, idat, w, h = 8, b"", None, None
    while i + 12 <= len(payload):
        (size,) = struct.unpack(">I", payload[i : i + 4])
        ctype = payload[i + 4 : i + 8]
        body = payload[i + 8 : i + 8 + size]
        if len(body) != size or i + 12 + size > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[i + 8 + size : i + 12 + size])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError("PNG chunk CRC mismatch")
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("only 8-bit RGB non-interlaced PNG supported")
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        i += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR or IDAT chunk")
    raw = zlib.decompress(idat)
    stride, bpp = w * 3, 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(raw, np.uint8, stride, base + 1)
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: per-lane wrapping cumulative sum
            cur = np.add.accumulate(
                line.reshape(w, bpp), axis=0, dtype=np.uint8
            ).ravel()
        elif ftype == 2:  # Up (uint8 addition wraps mod 256)
            cur = line + prev
        elif ftype == 3:  # Average
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, 3)


def resize_nearest(pixels: "np.ndarray", out_w: int, out_h: int) -> "np.ndarray":
    """Nearest-neighbor resize (the real pixel transform behind resize()):
    index mapping src = floor(dst * in/out), pure numpy fancy indexing."""
    in_h, in_w = pixels.shape[:2]
    ys = (np.arange(out_h) * in_h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * in_w // out_w).astype(np.int64)
    return pixels[ys][:, xs]


def encode_wav_pcm16(samples: "np.ndarray", rate: int = 16000) -> bytes:
    """RIFF/WAVE mono PCM16 from an int16 sample array."""
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes) -> tuple["np.ndarray", int]:
    """REAL RIFF/WAVE decode: walk the chunk list, parse the fmt chunk
    (PCM16 mono only), return (samples int16 array, sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, rate, data = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if (fmt_tag, channels, bits) != (1, 1, 16):
                raise ValueError("only mono PCM16 supported")
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    return np.frombuffer(data, dtype="<i2"), rate
