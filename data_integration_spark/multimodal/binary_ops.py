"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata structs.

The Spark-side mechanics are REAL and tested — schemas, Arrow batch shapes,
``mapInPandas`` partitioning, metadata propagation. The pixel/sample work
(actual JPEG/audio decoding) is STUBBED behind ``_HAS_CODECS``: the decode
libraries (PIL/av/soundfile) are not in this container, so the stub produces
a deterministic fake decode derived from the bytes — clearly marked, same
schema and batch flow as the real thing. Swapping in a real codec touches
ONLY ``_decode_bytes``.

Scale notes: binary payloads ride in parquet column chunks; mapInPandas
processes them in Arrow record batches (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``) — memory use is
per-batch, not per-partition. Feature extraction emits fixed-size
``array<float>`` columns ready for similarity/ann.py.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoders are optional — absent in this container
    from PIL import Image as _PIL_Image  # type: ignore[import-not-found]

    _HAS_CODECS = True
except ImportError:  # pragma: no cover — the shipped environment
    _PIL_Image = None
    _HAS_CODECS = False

DECODED_SCHEMA = (
    "item_id long, width int, height int, n_channels int, ok boolean"
)
FEATURE_DIM = 16
FEATURE_SCHEMA = f"item_id long, feature array<float>"
FRAME_SCHEMA = "item_id long, frame_index int, frame_sha string"


def attach_binary_metadata(
    df: DataFrame, binary_col: str, media_type: str
) -> DataFrame:
    """Typed metadata struct next to the payload: (media_type, n_bytes,
    sha256) — computed natively (no Python), usable for dedup/partition
    pruning without touching payload bytes again."""
    b = F.col(binary_col)
    return df.withColumn(
        f"{binary_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(b).alias("n_bytes"),
            F.sha2(b, 256).alias("sha256"),
        ),
    )


def _decode_bytes(payload: bytes) -> tuple[int, int, int]:
    """Decode one payload to (width, height, channels).

    Uses the real codec (PIL) when it is importable; otherwise a
    deterministic byte-hash fake with the same shape and failure modes
    (corrupt bytes raise inside the codec → callers map to ``ok=False``).
    """
    if _HAS_CODECS and _PIL_Image is not None:
        with _PIL_Image.open(io.BytesIO(payload)) as im:
            return int(im.width), int(im.height), len(im.getbands())
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 64, 16 + h[1] % 64, 3


def decode_images(
    df: DataFrame, id_col: str = "item_id", binary_col: str = "payload"
) -> DataFrame:
    """mapInPandas decode: binary → (dims, ok). Arrow-batched; one Python
    worker pass per batch, schema fixed up front."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf[id_col], pdf[binary_col]):
                try:
                    w, h, c = _decode_bytes(bytes(payload))
                    rows.append((item_id, w, h, c, True))
                except Exception:  # noqa: BLE001 — corrupt payloads yield ok=False
                    rows.append((item_id, 0, 0, 0, False))
            yield pd.DataFrame(
                rows, columns=["item_id", "width", "height", "n_channels", "ok"]
            )

    return df.select(
        F.col(id_col).alias("item_id"), F.col(binary_col)
    ).mapInPandas(decode, DECODED_SCHEMA)


def extract_features(
    df: DataFrame, id_col: str = "item_id", binary_col: str = "payload"
) -> DataFrame:
    """mapInPandas feature extraction: binary → fixed-dim float vector
    (deterministic byte-hash fake; a real model would run here). Output is
    ann.py-compatible (array<float>)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for item_id, payload in zip(pdf[id_col], pdf[binary_col]):
                h = hashlib.sha256(bytes(payload)).digest()
                vec = (
                    np.frombuffer(h[:FEATURE_DIM * 2], dtype=np.uint8)
                    .astype(np.float32)
                    .reshape(FEATURE_DIM, 2)
                    .mean(axis=1)
                    / 255.0
                )
                ids.append(item_id)
                feats.append(vec.tolist())
            yield pd.DataFrame({"item_id": ids, "feature": feats})

    return df.select(
        F.col(id_col).alias("item_id"), F.col(binary_col)
    ).mapInPandas(extract, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 1024,
    max_frames: int = 8,
    id_col: str = "item_id",
    binary_col: str = "payload",
) -> DataFrame:
    """Frame-sampling plumbing for video-shaped payloads: emits ≤max_frames
    (item, frame_index, frame_sha) rows per item — a mapInPandas UDTF shape
    (1 input row → N output rows)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for item_id, payload in zip(pdf[id_col], pdf[binary_col]):
                data = bytes(payload)
                for i in range(min(max_frames, max(1, len(data) // every_n_bytes))):
                    chunk = data[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows.append(
                        (item_id, i, hashlib.sha256(chunk).hexdigest()[:16])
                    )
            yield pd.DataFrame(rows, columns=["item_id", "frame_index", "frame_sha"])

    return df.select(
        F.col(id_col).alias("item_id"), F.col(binary_col)
    ).mapInPandas(sample, FRAME_SCHEMA)
