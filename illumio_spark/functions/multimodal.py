"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns; decode / feature
extraction / resize / frame-sample run as Arrow-batched pandas functions
over ``mapInPandas``. The decode itself is a deterministic fake here (the
codec libraries aren't in this container — see STUB notes), but the
Spark-side plumbing is real and tested: schema contracts, batch shapes,
partition-parallel execution.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, types as T

DECODE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def decode_meta(df: DataFrame) -> DataFrame:
    """binary payload → typed metadata, one Arrow batch at a time.

    STUB: a real deployment would call PIL/ffmpeg here; this container has
    neither, so dimensions are a deterministic function of the byte length
    (keeps the oracle checkable)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(lambda b: len(b) if b is not None else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n.astype("Int64"),
                    "fake_width": (n % 640).astype("Int32"),
                    "fake_height": (n % 480).astype("Int32"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Video-style frame sampling stub: slice the payload every N bytes.

    Demonstrates the 1→many mapInPandas shape (UDTF-style explode) a real
    frame sampler needs; a real codec would seek keyframes instead."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i, off in enumerate(range(0, len(payload), every_n_bytes)):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(bytes(payload[off : off + every_n_bytes]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL header parsing — pure byte inspection, no codec libraries needed.
# Pixel/sample decode for png/wav is REAL too (stdlib zlib/struct, below);
# only gif/jpeg entropy decode remains NotImplementedError.
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


def _parse_header(b: bytes):
    """(format, width, height, sample_rate, channels) from magic bytes.

    Real container-header parsing: PNG IHDR, GIF logical screen descriptor,
    JPEG SOF segment walk, WAV fmt chunk. Unknown formats → ('unknown',
    None, ...) — routed like a dead letter by callers that care."""
    import struct

    n = len(b)
    if n >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return "png", w, h, None, None
    if n >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", b[6:10])
        return "gif", w, h, None, None
    if n >= 4 and b[:2] == b"\xff\xd8":
        # JPEG: walk segments to the first SOF0/1/2 frame header
        i = 2
        while i + 9 < n:
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return "jpeg", w, h, None, None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None, None, None
    if n >= 36 and b[:4] == b"RIFF" and b[8:12] == b"WAVE" and b[12:16] == b"fmt ":
        channels = struct.unpack("<H", b[22:24])[0]
        sample_rate = struct.unpack("<I", b[24:28])[0]
        return "wav", None, None, sample_rate, channels
    return "unknown", None, None, None, None


def media_meta(df: DataFrame) -> DataFrame:
    """binary payload → sniffed format + REAL header metadata.

    Expects (doc_id, payload); the header walk is per-row Python over the
    first bytes only — at 100 TB this stays cheap because it never touches
    the payload body (no decode, no copy) and runs partition-parallel."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                _parse_header(bytes(p)) if p is not None else (None,) * 5
                for p in pdf["payload"]
            ]
            fmt, w, h, sr, ch = (list(x) for x in zip(*parsed)) if parsed else ([],) * 5
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": fmt,
                    "width": pd.array(w, dtype="Int32"),
                    "height": pd.array(h, dtype="Int32"),
                    "sample_rate": pd.array(sr, dtype="Int32"),
                    "channels": pd.array(ch, dtype="Int32"),
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else None
                    ).astype("Int64"),
                }
            )

    return df.mapInPandas(run, schema=MEDIA_META_SCHEMA)


# ---------------------------------------------------------------------------
# REAL pixel/sample codecs — pure stdlib (zlib + struct), no PIL/ffmpeg.
# PNG: 8-bit grayscale encode/decode with all five scanline filters.
# WAV: PCM16 encode/decode. gif/jpeg entropy decode stays NotImplementedError
# (needs LZW/DCT codec libraries this container doesn't have).
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return struct.pack(">I", len(body)) + tag + body + struct.pack(
        ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png_gray8(width: int, height: int, values, row_filter=None) -> bytes:
    """Minimal REAL PNG encoder: 8-bit grayscale, zlib-compressed IDAT,
    correct CRCs; `row_filter(y) -> 0..4` picks the scanline filter (default
    cycles through all five so decoders must implement every unfilter)."""
    import struct
    import zlib

    assert len(values) == width * height
    rf = row_filter if row_filter is not None else (lambda y: y % 5)
    raw = bytearray()
    prior = [0] * width
    for y in range(height):
        row = [int(v) & 0xFF for v in values[y * width : (y + 1) * width]]
        ft = rf(y)
        raw.append(ft)
        for x in range(width):
            left = row[x - 1] if x else 0
            up, ul = prior[x], (prior[x - 1] if x else 0)
            if ft == 0:
                f = row[x]
            elif ft == 1:
                f = row[x] - left
            elif ft == 2:
                f = row[x] - up
            elif ft == 3:
                f = row[x] - ((left + up) >> 1)
            else:
                f = row[x] - _paeth(left, up, ul)
            raw.append(f & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_gray8(b: bytes) -> list[int]:
    """REAL PNG decode for 8-bit grayscale: chunk walk, IDAT inflate,
    scanline unfilter (all five filter types). Raises on other color types /
    bit depths (out of scope for this engine's fixtures)."""
    import struct
    import zlib

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    i, width, height, idat = 8, None, None, bytearray()
    while i + 8 <= len(b):
        (length,) = struct.unpack(">I", b[i : i + 4])
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            width, height, depth, ctype = struct.unpack(">IIBB", body[:10])
            if depth != 8 or ctype != 0:
                raise NotImplementedError("only 8-bit grayscale PNG supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        i += 12 + length
    raw = zlib.decompress(bytes(idat))
    out: list[int] = []
    prior = [0] * width
    for y in range(height):
        ft = raw[y * (width + 1)]
        line = raw[y * (width + 1) + 1 : (y + 1) * (width + 1)]
        row: list[int] = []
        for x in range(width):
            left = row[x - 1] if x else 0
            up, ul = prior[x], (prior[x - 1] if x else 0)
            if ft == 0:
                v = line[x]
            elif ft == 1:
                v = line[x] + left
            elif ft == 2:
                v = line[x] + up
            elif ft == 3:
                v = line[x] + ((left + up) >> 1)
            elif ft == 4:
                v = line[x] + _paeth(left, up, ul)
            else:
                raise ValueError(f"bad PNG filter type {ft}")
            row.append(v & 0xFF)
        out.extend(row)
        prior = row
    return out


def encode_wav_pcm16(samples, sample_rate: int, channels: int = 1) -> bytes:
    """REAL WAV/PCM16 encoder: RIFF + fmt + data chunks (samples are
    interleaved int16 values; len(samples) must be a channel multiple)."""
    import struct

    data = struct.pack(f"<{len(samples)}h", *[int(s) for s in samples])
    fmt = struct.pack(
        "<IHHIIHH", 16, 1, channels, sample_rate,
        sample_rate * channels * 2, channels * 2, 16,
    )
    return (
        b"RIFF" + struct.pack("<I", 20 + len(fmt) + len(data)) + b"WAVE"
        + b"fmt " + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def decode_wav_pcm16(b: bytes) -> list[int]:
    """REAL WAV decode: chunk walk to `data`, unpack interleaved int16 PCM."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    while i + 8 <= len(b):
        tag = b[i : i + 4]
        (length,) = struct.unpack("<I", b[i + 4 : i + 8])
        if tag == b"fmt ":
            audio_fmt, _ch, _sr = struct.unpack("<HHI", b[i + 8 : i + 16])
            if audio_fmt != 1:
                raise NotImplementedError("only PCM WAV supported")
        elif tag == b"data":
            body = b[i + 8 : i + 8 + length]
            return list(struct.unpack(f"<{length // 2}h", body[: length // 2 * 2]))
        i += 8 + length + (length & 1)
    raise ValueError("WAV data chunk not found")


def decode_values(b: bytes) -> tuple[str, list[int] | None]:
    """(format, decoded values) — REAL decode for png (pixels) and wav (PCM
    samples). gif/jpeg entropy decode needs codec libraries (LZW/DCT) not in
    this container and stays NotImplementedError; unknown formats → None."""
    fmt = _parse_header(bytes(b))[0]
    if fmt == "png":
        return "png", decode_png_gray8(bytes(b))
    if fmt == "wav":
        return "wav", decode_wav_pcm16(bytes(b))
    if fmt in ("gif", "jpeg"):
        raise NotImplementedError(
            f"{fmt} pixel decode needs a codec library (LZW/DCT) not in this container"
        )
    return "unknown", None


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_format", T.StringType(), True),
        T.StructField("n_values", T.LongType(), True),
        T.StructField("val_sum", T.LongType(), True),
        T.StructField("val_mean", T.DoubleType(), True),
    ]
)


def decode_stats(df: DataFrame) -> DataFrame:
    """(doc_id, payload) → per-payload decoded-value statistics, one Arrow
    batch at a time — the feature-extraction shape a training-data pipeline
    runs over image/audio columns (decode stays partition-parallel and never
    leaves the executor)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ns, sums, means = [], [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    fmts.append(None), ns.append(None), sums.append(None), means.append(None)
                    continue
                fmt, vals = decode_values(bytes(payload))
                fmts.append(fmt)
                if vals is None:
                    ns.append(None), sums.append(None), means.append(None)
                else:
                    s = int(sum(vals))
                    ns.append(len(vals)), sums.append(s)
                    means.append(round(s / len(vals), 6) if vals else None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_format": fmts,
                    "n_values": pd.array(ns, dtype="Int64"),
                    "val_sum": pd.array(sums, dtype="Int64"),
                    "val_mean": pd.array(means, dtype="Float64"),
                }
            )

    return df.mapInPandas(run, schema=DECODE_STATS_SCHEMA)


def embed_stub(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub: binary payload → fixed-dim float vector.

    STUB: a real vision/audio model would run here (torch not in
    container). The fake embedding is a deterministic byte-histogram
    projection so tests can assert shape + determinism. For TEXT columns
    no stub is needed — operators/similarity.hashing_embed is a REAL
    (feature-hashing) embedder whose output feeds lsh_topk /
    lsh_neardup_pairs end-to-end."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
                norm = np.linalg.norm(hist)
                feats.append((hist / norm if norm else hist).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(run, schema=schema)
