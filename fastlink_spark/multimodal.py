"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract (schemas, batch iteration, partition sizing) is
REAL and tested; the actual media decode is STUBBED because no
image/audio libraries ship in this container — ``decode_image_stub``
raises NotImplementedError unless ``deterministic_fake=True``, which
produces a seed-free fake feature vector from the bytes (so tests can
assert the full distributed path end-to-end).

At 100TB: binary payloads dominate partition size — repartition by
``maxRecordsPerBatch``-friendly counts and keep
``spark.sql.files.maxPartitionBytes`` small for scans of mixed
media+metadata tables; never collect binaries to the driver.
"""

from __future__ import annotations

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


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder: histogram of byte
    values folded into `dim` buckets, L2-normalized."""
    arr = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    hist = np.bincount(arr % dim, minlength=dim).astype(np.float32)
    n = np.linalg.norm(hist)
    return hist / n if n > 0 else hist


def extract_features(
    media: DataFrame,
    *,
    dim: int = 16,
    deterministic_fake: bool = False,
) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, media_type, n_bytes,
    payload). Real decode is stubbed (no media libs in container)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present in "
                    "this container; pass deterministic_fake=True for the "
                    "plumbing-test path"
                )
            feats = [
                _fake_feature(p, dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
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
    a fake frame count derived from n_bytes (real decoder stubbed)."""
    return media.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest((F.col("n_bytes") / every_n).cast("int") % 32, F.lit(0)))
        ).alias("frame_idx"),
    )
