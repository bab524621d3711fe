"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Two tiers:

- **Real codecs** (bottom of this file): RIFF/WAV audio (stdlib wave),
  uncompressed 24bpp BMP images, and RIFF/AVI video with DIB frames
  (stdlib struct + numpy) — genuine container formats synthesized,
  decoded/demuxed, and resized end-to-end with no external libraries.
  These prove the plumbing carries real kernels.
- **Stubs** (clearly marked below): generic decode/resize/frame-sample over
  arbitrary payloads, where a compressed codec (JPEG/H.264) would need
  PIL/ffmpeg the container lacks. The Spark-side contract — schema, Arrow
  batching with bounded sizes, map-only execution — is identical to the
  real tier, so swapping a stub body for PIL/torchaudio is a one-function
  change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

# Schema contract for decoded media features.
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Model a multimodal table: treat the utf-8 bytes of `text_col` as the
    opaque binary payload (the testdata has no real media files)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").cast(BinaryType()).alias("payload"),
    )


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decode kernel — deterministic fake standing in for a real codec.

    A real implementation would be e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # NotImplementedError here
        return resize_and_embed(img)

    The fake emits 4 "features" derived from byte statistics so the full
    pipeline (including downstream numeric ops) is exercisable.
    """
    n = len(payload)
    if n == 0:
        return [0.0, 0.0, 0.0, 0.0]
    s = sum(payload)
    return [float(n), float(s % 256), float(payload[0]), float(payload[-1])]


def decode_media(df: DataFrame, *, batch_rows: int = 1024) -> DataFrame:
    """Binary payloads → feature rows via Arrow-batched mapInPandas.

    Batch size is bounded so a partition of large payloads can't blow
    executor memory; output conforms to MEDIA_FEATURES_SCHEMA. This is the
    real plumbing a codec plugs into.
    """
    import pandas as pd

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                payloads = chunk["payload"]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "n_bytes": payloads.map(len).astype("int64"),
                        "checksum": payloads.map(lambda b: sum(b) % (1 << 31)).astype(
                            "int64"
                        ),
                        "features": payloads.map(_fake_decode),
                    }
                )

    return df.mapInPandas(decode_batches, MEDIA_FEATURES_SCHEMA)


# Schema contract for resized payloads (binary → binary transformation).
RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("orig_bytes", LongType()),
        StructField("new_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def resize_media(
    df: DataFrame, *, target_bytes: int = 1024, batch_rows: int = 1024
) -> DataFrame:
    """Binary → binary transformation plumbing (the image-resize /
    audio-downsample shape): payload in, smaller payload out, metadata
    alongside. The STUB kernel truncates to ``target_bytes`` (a real
    implementation decodes, resizes, re-encodes); the contract that matters
    at scale is binary columns through Arrow in BOTH directions, bounded
    batches, map-only."""
    import pandas as pd

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                resized = chunk["payload"].map(
                    lambda b: bytes(b[:target_bytes])
                )
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "orig_bytes": chunk["payload"].map(len).astype("int64"),
                        "new_bytes": resized.map(len).astype("int64"),
                        "first_byte": resized.map(
                            lambda b: b[0] if b else -1
                        ).astype("int64"),
                        "last_byte": resized.map(
                            lambda b: b[-1] if b else -1
                        ).astype("int64"),
                        "payload": resized,
                    }
                )

    return df.mapInPandas(run, RESIZED_SCHEMA)


# Schema contract for sampled frames (video/audio segmentation analog).
FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
    ]
)


def sample_frames(
    df: DataFrame, *, frame_bytes: int = 64, every_k: int = 4, batch_rows: int = 1024
) -> DataFrame:
    """Fixed-size frame segmentation + every-k-th sampling over binary
    payloads — the video/audio frame-sample plumbing shape.

    Unlike decode_media (1 row → 1 row), this is the 1 → N expansion path: a
    single payload yields one output row per sampled frame, built inside the
    Arrow batch (pandas-side explode, never a Python UDF per row). A real
    codec replaces the byte-slice "frame decode" with keyframe extraction;
    the distributed contract — bounded batches, typed schema, map-only (no
    shuffle) — is the part that must be right at 100 TB.
    """
    import pandas as pd

    def frame_batches(batches) -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = {
                    "media_id": [],
                    "frame_index": [],
                    "n_bytes": [],
                    "first_byte": [],
                    "last_byte": [],
                }
                for mid, payload in zip(chunk["media_id"], chunk["payload"]):
                    n = len(payload)
                    n_frames = -(-n // frame_bytes)  # ceil
                    for fi in range(0, n_frames, every_k):
                        frame = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                        out["media_id"].append(mid)
                        out["frame_index"].append(fi)
                        out["n_bytes"].append(len(frame))
                        out["first_byte"].append(frame[0])
                        out["last_byte"].append(frame[-1])
                yield pd.DataFrame(out).astype("int64")

    return df.mapInPandas(frame_batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio modality: RIFF/WAV synthesis + decode with the stdlib `wave`
# module — no external codecs required, so this path is NOT a stub: real
# container format, real codec parse, real DSP features.

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        StructField("rms", DoubleType()),
        StructField("peak", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)

_WAV_SR = 16000
_WAV_AMP = 0.5


def wav_params(media_id: int) -> tuple[int, int]:
    """Deterministic per-id synthesis parameters: (freq Hz, n_frames).
    Integer arithmetic throughout so any engine reproduces the counts
    exactly (50–125 ms at 16 kHz)."""
    return 200 + (media_id % 20) * 50, 800 + (media_id % 4) * 400


def synthesize_wav(media_id: int) -> bytes:
    """A genuine 16-bit PCM mono RIFF/WAV file: sine at wav_params(id)."""
    import io
    import math
    import struct
    import wave

    freq, n = wav_params(media_id)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_SR)
        frames = b"".join(
            struct.pack(
                "<h",
                int(_WAV_AMP * 32767 * math.sin(2 * math.pi * freq * i / _WAV_SR)),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def attach_wav_payload(df: DataFrame, id_col: str) -> DataFrame:
    """id column → (media_id, payload) with real WAV bytes (Arrow-batched)."""
    import pandas as pd

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids, "payload": ids.map(synthesize_wav)}
            )

    return df.mapInPandas(gen, schema)


def decode_wav_features(df: DataFrame, *, batch_rows: int = 1024) -> DataFrame:
    """WAV payloads → audio features via the stdlib codec: sample rate and
    frame count from the RIFF header, RMS / peak / zero-crossing count from
    the PCM samples. Same distributed contract as decode_media (bounded
    Arrow batches, map-only)."""
    import io
    import wave

    import numpy as np
    import pandas as pd

    def one(mid: int, payload: bytes) -> dict:
        with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
        zc = int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0
        return {
            "media_id": mid,
            "sample_rate": sr,
            "n_frames": n,
            "duration_ms": round(1000 * n / sr),
            "rms": float(np.sqrt(np.mean(x * x))) if n else 0.0,
            "peak": int(np.max(np.abs(x))) if n else 0,
            "zero_crossings": zc,
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    [one(m, p) for m, p in zip(chunk["media_id"], chunk["payload"])]
                )

    return df.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


# ---------------------------------------------------------------------------
# REAL image modality: uncompressed 24-bit BMP synthesis / decode / resize
# with stdlib struct + numpy — like the WAV path, NOT a stub: real container
# format (BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte row padding, BGR,
# bottom-up rows), real pixel math.

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def bmp_params(media_id: int) -> tuple[int, int]:
    """Deterministic (width, height) per id."""
    return 8 + (media_id % 5) * 4, 6 + (media_id % 3) * 4


def _bmp_pixel(media_id: int, x: int, y: int) -> tuple[int, int, int]:
    """Deterministic closed-form pixel so any engine can recompute channel
    statistics: r depends on x, g on y, b on x+y."""
    return (x * 37 + media_id) % 256, (y * 53) % 256, ((x + y) * 29) % 256


def synthesize_bmp(media_id: int) -> bytes:
    """A genuine uncompressed 24bpp BMP (bottom-up, padded rows)."""
    import struct

    w, h = bmp_params(media_id)
    row_len = (w * 3 + 3) & ~3
    img_size = row_len * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = _bmp_pixel(media_id, x, y)
            row += bytes((b, g, r))  # BGR order
        row += b"\x00" * (row_len - len(row))
        rows.append(bytes(row))
    return header + b"".join(rows)


def _decode_bmp(payload: bytes):
    """BMP bytes → (width, height, HxWx3 RGB ndarray)."""
    import struct

    import numpy as np

    assert payload[:2] == b"BM", "not a BMP payload"
    offset = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    assert bpp == 24, f"only 24bpp supported, got {bpp}"
    row_len = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_len * abs(h), offset=offset)
    rows = data.reshape(abs(h), row_len)[:, : w * 3].reshape(abs(h), w, 3)
    if h > 0:  # bottom-up → top-down
        rows = rows[::-1]
    return w, abs(h), rows[:, :, ::-1]  # BGR → RGB


def attach_bmp_payload(df: DataFrame, id_col: str) -> DataFrame:
    import pandas as pd

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids, "payload": ids.map(synthesize_bmp)}
            )

    return df.mapInPandas(gen, schema)


def decode_bmp_features(df: DataFrame, *, batch_rows: int = 1024) -> DataFrame:
    """BMP payloads → (dims, per-channel means) via the real decoder."""
    import pandas as pd

    def one(mid: int, payload: bytes) -> dict:
        w, h, px = _decode_bmp(bytes(payload))
        means = px.reshape(-1, 3).mean(axis=0)
        return {
            "media_id": mid,
            "width": w,
            "height": h,
            "mean_r": float(means[0]),
            "mean_g": float(means[1]),
            "mean_b": float(means[2]),
        }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    [one(m, p) for m, p in zip(chunk["media_id"], chunk["payload"])]
                )

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_bmp(
    df: DataFrame, *, scale: float = 0.5, batch_rows: int = 1024
) -> DataFrame:
    """REAL nearest-neighbor resize: decode → index-map → re-encode a valid
    BMP. Binary→binary through Arrow both ways (the resize_media contract
    with an actual kernel)."""
    import struct

    import numpy as np
    import pandas as pd

    def one(payload: bytes) -> bytes:
        w, h, px = _decode_bmp(bytes(payload))
        ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
        xs = (np.arange(ow) * (w / ow)).astype(int).clip(0, w - 1)
        ys = (np.arange(oh) * (h / oh)).astype(int).clip(0, h - 1)
        out = px[ys][:, xs]  # nearest neighbor
        row_len = (ow * 3 + 3) & ~3
        img_size = row_len * oh
        header = struct.pack(
            "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54
        ) + struct.pack(
            "<IiiHHIIiiII", 40, ow, oh, 1, 24, 0, img_size, 2835, 2835, 0, 0
        )
        body = bytearray()
        for y in range(oh - 1, -1, -1):
            row = out[y, :, ::-1].tobytes()  # RGB → BGR
            body += row + b"\x00" * (row_len - len(row))
        return header + bytes(body)

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].astype("int64"),
                        "payload": chunk["payload"].map(one),
                    }
                )

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# REAL video modality: RIFF/AVI container with uncompressed DIB ('00db')
# frames — stdlib struct only. Synthesis writes a spec-conformant AVI
# (hdrl/strl headers + movi chunk list); extraction walks the RIFF chunk
# tree and decodes every sampled frame's pixels. This upgrades the
# frame-sample path from byte-slicing stub to a real demuxer.

VIDEO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("mean_r", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_b", DoubleType()),
    ]
)


def avi_params(media_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) per id — small and even."""
    return 8 + (media_id % 3) * 4, 6 + (media_id % 2) * 4, 4 + media_id % 3


def _avi_frame_pixel(media_id: int, f: int, x: int, y: int) -> tuple[int, int, int]:
    return (
        (x * 37 + f * 11 + media_id) % 256,
        (y * 53 + f * 7) % 256,
        ((x + y) * 29 + f * 13) % 256,
    )


def synthesize_avi(media_id: int) -> bytes:
    """A genuine RIFF/AVI file: 'vids'/'DIB ' stream of uncompressed
    bottom-up BGR frames."""
    import struct

    w, h, n_frames = avi_params(media_id)
    row_len = (w * 3 + 3) & ~3
    frame_size = row_len * h

    frames = []
    for f in range(n_frames):
        body = bytearray()
        for y in range(h - 1, -1, -1):
            row = bytearray()
            for x in range(w):
                r, g, b = _avi_frame_pixel(media_id, f, x, y)
                row += bytes((b, g, r))
            row += b"\x00" * (row_len - len(row))
            body += row
        frames.append(bytes(body))

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        66666, frame_size, 0, 0x10, n_frames, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 15, 0, n_frames, frame_size, 0,
        frame_size, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 2835, 2835, 0, 0
    )

    def chunk(tag: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return tag + struct.pack("<I", len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    strl = list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf))
    hdrl = list_chunk(b"hdrl", chunk(b"avih", avih) + strl)
    movi = list_chunk(b"movi", b"".join(chunk(b"00db", fr) for fr in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_frames(payload: bytes):
    """RIFF walk: yields (width, height, frame_rgb ndarray) per 00db chunk."""
    import struct

    import numpy as np

    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI ", "not an AVI"
    w = h = None
    pos = 12
    end = 8 + struct.unpack_from("<I", payload, 4)[0]

    def walk(pos: int, end: int):
        nonlocal w, h
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            data_start = pos + 8
            if tag == b"LIST":
                walk(data_start + 4, data_start + size)
            elif tag == b"strf":
                w, h = struct.unpack_from("<ii", payload, data_start + 4)
            elif tag == b"00db":
                row_len = (w * 3 + 3) & ~3
                data = np.frombuffer(
                    payload, dtype=np.uint8, count=row_len * h, offset=data_start
                )
                rows = data.reshape(h, row_len)[:, : w * 3].reshape(h, w, 3)
                frames.append(rows[::-1, :, ::-1])  # bottom-up BGR → RGB
            pos = data_start + size + (size % 2)

    frames: list = []
    walk(pos, end)
    return w, h, frames


def attach_avi_payload(df: DataFrame, id_col: str) -> DataFrame:
    import pandas as pd

    schema = StructType(
        [StructField("media_id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            yield pd.DataFrame(
                {"media_id": ids, "payload": ids.map(synthesize_avi)}
            )

    return df.mapInPandas(gen, schema)


def extract_avi_frames(
    df: DataFrame, *, every_k: int = 2, batch_rows: int = 256
) -> DataFrame:
    """Real demux + per-sampled-frame pixel stats: 1 payload → N frame rows
    built inside the Arrow batch (same 1→N contract as sample_frames, with
    an actual container parser)."""
    import pandas as pd

    def rows_for(mid: int, payload: bytes):
        w, h, frames = _avi_frames(bytes(payload))
        for fi in range(0, len(frames), every_k):
            means = frames[fi].reshape(-1, 3).mean(axis=0)
            yield {
                "media_id": mid,
                "frame_index": fi,
                "width": w,
                "height": h,
                "mean_r": float(means[0]),
                "mean_g": float(means[1]),
                "mean_b": float(means[2]),
            }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                out = [
                    row
                    for m, p in zip(chunk["media_id"], chunk["payload"])
                    for row in rows_for(m, p)
                ]
                yield pd.DataFrame(out)

    return df.mapInPandas(run, VIDEO_FRAME_SCHEMA)
