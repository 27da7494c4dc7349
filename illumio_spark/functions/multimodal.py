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
# Only pixel/sample decode (decode_pixels below) remains a stub.
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


def decode_pixels(df: DataFrame) -> DataFrame:
    """STUB — pixel/sample decode requires codec libraries (PIL/ffmpeg)
    that are not in this container. The surrounding plumbing (schema,
    batching, 1→many shapes) is real and tested; swap this body for the
    actual decoder in a real deployment."""
    raise NotImplementedError(
        "pixel/sample decode needs PIL/ffmpeg — not available in this container; "
        "see media_meta/frame_sample/embed_stub for the working plumbing"
    )


def embed_stub(df: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction stub: payload → fixed-dim float vector.

    STUB: a real model would run here (torch not in container). The fake
    embedding is a deterministic byte-histogram projection so tests can
    assert shape + determinism."""
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
