"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side machinery here is real and tested — schema, partitioning,
UDF signatures, batch shapes, error quarantine. The codec leaves are
STUBBED: this container has no image/audio libraries, so ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (seeded from the bytes) produces stable
"features" so the distributed plumbing can be exercised end-to-end.

Schema convention (one row per asset):
    asset_id: bigint, modality: string(image|audio|video), payload: binary,
    mime: string, width/height/duration_ms: nullable metadata, err: string

At 100 TB: payloads are large → ``spark.sql.files.maxPartitionBytes`` keeps
scan partitions bounded; feature extraction is per-row independent →
``mapInPandas`` with modest Arrow batch sizes (payload bytes dominate
memory, so cap ``maxRecordsPerBatch`` low for binary-heavy tables);
frame-sampling explodes one video row into N frame rows — an iterator UDF
yields incrementally, never materializing a whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id bigint, modality string, payload binary, mime string, "
    "width int, height int, duration_ms int, err string"
)

FEATURE_SCHEMA = "asset_id bigint, feature array<float>, feat_dim int, err string"
FRAME_SCHEMA = "asset_id bigint, frame_idx int, frame_payload binary, err string"


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Decode an image payload to an HxWx3 array.

    STUB: real decoding needs an image library absent from this container.
    ``fake=True`` returns a deterministic 8x8x3 array seeded by the payload
    digest — stable across executors/runs, good enough to exercise the
    distributed plumbing and tests.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library not present in this environment; "
            "run with fake=True for plumbing tests"
        )
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def resize_image(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy — no external libs)."""
    ys = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    xs = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ys][:, xs]


def extract_features(
    assets: DataFrame, feat_dim: int = 16, fake: bool = True
) -> DataFrame:
    """Decode → resize → mean-pool feature vector per asset, batched.

    Errors (undecodable payloads) land in the ``err`` column — the same
    inline quarantine channel the RDF parser uses."""

    def one(aid, payload):
        try:
            img = decode_image(bytes(payload), fake=fake)
            small = resize_image(img, 4, 4)
            feat = small.astype("float32").reshape(-1)[:feat_dim]
            feat = np.pad(feat, (0, max(0, feat_dim - feat.size)))
            return (aid, feat.tolist(), feat_dim, None)
        except Exception as e:  # quarantine, don't kill the job
            return (aid, None, None, f"decode error: {e}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # decoding is inherently per-asset; iterate over raw numpy buffers
            # (zip of .values) — no pandas Series boxing per row (iterrows)
            out = [one(a, p) for a, p in zip(pdf["asset_id"].values, pdf["payload"].values)]
            yield pd.DataFrame(out, columns=["asset_id", "feature", "feat_dim", "err"])

    return assets.select("asset_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video → frame rows (1 per ``every_ms``). The explode happens inside
    an iterator UDF — rows yielded incrementally, bounded memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            cols = zip(
                pdf["asset_id"].values, pdf["payload"].values, pdf["duration_ms"].values
            )
            for aid, payload, dur in cols:
                if not fake:
                    out.append((aid, None, None, "decode error: no video codec"))
                    continue
                n = max(1, int(dur or 0) // every_ms)
                base = bytes(payload)
                out.extend(
                    (aid, i, hashlib.sha256(base + i.to_bytes(4, "big")).digest()[:16], None)
                    for i in range(n)
                )
            yield pd.DataFrame(out, columns=["asset_id", "frame_idx", "frame_payload", "err"])

    return assets.where(F.col("modality") == "video").select(
        "asset_id", "payload", "duration_ms"
    ).mapInPandas(run, schema=FRAME_SCHEMA)


def synth_assets(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for plumbing tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                modality,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[modality],
                64 if modality == "image" else None,
                64 if modality == "image" else None,
                rng.randint(1000, 10000) if modality == "video" else None,
                None,
            )
        )
    return spark.createDataFrame(rows, ASSET_SCHEMA)
