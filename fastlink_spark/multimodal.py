"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract (schemas, batch iteration, partition sizing) is
REAL and tested. Decode is real too for the uncompressed container
formats that need no external libraries — P6 PPM and 24-bit BMP images
(pure NumPy byte parsing) and PCM WAV audio (stdlib ``wave``); the
compressed formats (jpeg/png/mp3/mp4) raise NotImplementedError because
no codec libraries ship in this container. ``deterministic_fake=True``
remains as a format-agnostic stand-in so tests can drive the full
distributed path with arbitrary payloads.

At 100TB: binary payloads dominate partition size — repartition by
``maxRecordsPerBatch``-friendly counts and keep
``spark.sql.files.maxPartitionBytes`` small for scans of mixed
media+metadata tables; never collect binaries to the driver.
"""

from __future__ import annotations

import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, content_hash long"
)

FEATURE_SCHEMA = "doc_id long, media_type string, n_bytes long, feature array<float>, ok boolean"


def with_media_metadata(df: DataFrame, id_col: str, bin_col: str, media_type: str) -> DataFrame:
    """Typed metadata columns over an opaque binary column (JVM-side)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.length(F.col(bin_col)).cast("long").alias("n_bytes"),
        F.xxhash64(F.col(bin_col)).alias("content_hash"),
        F.col(bin_col).alias("payload"),
    )


# ----------------------------------------------------------------- decoders

def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (h, w, 3) uint8. Pure byte parsing, no libs."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed; pixel data starts after ONE
    # whitespace byte following maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval (the spec's rule)
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n = w * h * 3
    # CRLF-writer tolerance (r5 review): a non-conforming '\r\n' after
    # maxval used to leave the '\n' inside the pixel data, silently
    # shifting every channel by one byte. The total length
    # disambiguates: skip extra leading whitespace until exactly n
    # pixel bytes remain (pixel values that happen to BE whitespace
    # bytes are safe — the loop only runs while there is surplus).
    while len(payload) - pos > n and payload[pos : pos + 1].isspace():
        pos += 1
    if len(payload) - pos < n:
        raise ValueError("truncated PPM pixel data")
    img = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return img.reshape(h, w, 3)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> (h, w, 3) uint8 RGB.
    Rows are stored bottom-up, 4-byte padded, BGR order."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        # ValueError (not NotImplementedError): a BMP variant this
        # decoder can't parse is per-ROW bad data — extract_features maps
        # it to an ok=False row instead of failing the whole task. Only
        # whole-FORMAT gaps (jpeg/png/... in _DECODERS) raise.
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, comp={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1]  # BGR -> RGB


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (samples float32 in [-1, 1] mono-mixed, sample_rate).
    stdlib wave module; 8/16/32-bit PCM."""
    import io

    with wave.open(io.BytesIO(payload), "rb") as wf:
        rate = wf.getframerate()
        nch = wf.getnchannels()
        width = wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        x = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
    else:
        # ValueError (not NotImplementedError): a WAV variant this
        # decoder doesn't cover (e.g. 24-bit PCM) is per-row bad data —
        # extract_features maps it to an ok=False row instead of
        # failing the task. NotImplementedError is reserved for whole
        # FORMATS that are stubbed (jpeg/png/mp3), same policy as BMP.
        raise ValueError(f"unsupported PCM sample width {width}")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure index arithmetic)."""
    h, w = img.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return img[ri][:, ci]


def image_feature(img: np.ndarray, dim: int) -> np.ndarray:
    """(h, w, 3) uint8 -> dim-length float32 feature: 8x8 grayscale
    thumbnail (nearest-neighbor) flattened, truncated/padded to dim,
    L2-normalized. Deterministic."""
    gray = img.astype(np.float32).mean(axis=2)
    side = max(int(np.sqrt(dim)), 1)
    thumb = resize_nearest(gray, side, side).reshape(-1)
    out = np.zeros(dim, dtype=np.float32)
    out[: min(dim, thumb.size)] = thumb[:dim]
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def audio_feature(samples: np.ndarray, dim: int) -> np.ndarray:
    """mono float samples -> dim-length RMS-energy envelope (equal
    frames), L2-normalized. Deterministic."""
    if samples.size == 0:
        return np.zeros(dim, dtype=np.float32)
    edges = (np.arange(dim + 1) * samples.size) // dim
    out = np.empty(dim, dtype=np.float32)
    for i in range(dim):
        seg = samples[edges[i] : max(edges[i + 1], edges[i] + 1)]
        out[i] = np.sqrt(np.mean(seg * seg))
    n = np.linalg.norm(out)
    return out / n if n > 0 else out


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic format-agnostic stand-in: histogram of byte values
    folded into `dim` buckets, L2-normalized."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


_DECODERS = {
    "image/ppm": lambda p, dim: image_feature(decode_ppm(p), dim),
    "image/bmp": lambda p, dim: image_feature(decode_bmp(p), dim),
    "audio/wav": lambda p, dim: audio_feature(decode_wav(p)[0], dim),
}


def extract_features(
    media: DataFrame,
    *,
    dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, n_bytes,
    payload). Real decode for image/ppm, image/bmp, audio/wav;
    compressed formats raise NotImplementedError (no codec libs in this
    container). Rows whose payload fails to parse come back ok=False
    (feature null) instead of failing the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p, mt in zip(pdf["payload"], pdf["media_type"]):
                if p is None:
                    feats.append(None)
                    continue
                if deterministic_fake:
                    feats.append(_fake_feature(p, dim).tolist())
                    continue
                dec = _DECODERS.get(mt)
                if dec is None:
                    raise NotImplementedError(
                        f"decode for media_type={mt!r} requires codec libraries "
                        "not present in this container (supported here: "
                        f"{sorted(_DECODERS)}; or pass deterministic_fake=True)"
                    )
                try:
                    feats.append(dec(bytes(p), dim).tolist())
                except (ValueError, EOFError, IndexError, wave.Error, struct.error):
                    # corrupt payload -> ok=False row, never a task
                    # failure: wave.Error covers malformed RIFF/WAV
                    # headers, struct.error truncated chunk tables,
                    # IndexError truncated PPM headers
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "feature": feats,
                    "ok": [f is not None for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx) rows for
    a fake frame count derived from n_bytes (real video container
    parsing needs codec libs — stubbed)."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") / every_n).cast("int") % 32, F.lit(0)))
        ).alias("frame_idx"),
    )
