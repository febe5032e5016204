"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extraction / frame-sampling plumbing.

The container ships no image/audio libraries, so the *decode* step is a
deterministic fake (clearly marked; a real deployment swaps
``_decode_bytes`` for PIL/ffmpeg) — but the Spark side is real and
tested: Arrow-batched ``mapInPandas`` over binary payloads, explicit
output schemas, one-to-many frame explosion, and embedding extraction
whose output feeds operators/ann directly.

Schema convention: ``(asset_id long, kind string, payload binary,
meta map<string,string>)``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

ASSET_SCHEMA = "asset_id long, kind string, payload binary, meta map<string,string>"

DECODE_SCHEMA = (
    "asset_id long, kind string, n_bytes int, sha256 string, "
    "width int, height int, mean_byte double"
)

FRAME_SCHEMA = "asset_id long, frame_no int, frame_bytes binary, frame_sha string"

EMBED_DIM = 16
EMBED_SCHEMA = f"asset_id long, embedding array<float>"


def _decode_bytes(payload: bytes) -> dict:
    """DETERMINISTIC FAKE decode — stands in for PIL/ffmpeg (not in this
    container).  Derives pseudo width/height from the payload header and
    byte statistics from the body; stable across runs and partitions."""
    if payload is None or len(payload) == 0:
        return {"n_bytes": 0, "sha256": hashlib.sha256(b"").hexdigest(),
                "width": 0, "height": 0, "mean_byte": 0.0}
    arr = np.frombuffer(payload, dtype=np.uint8)
    return {
        "n_bytes": int(arr.size),
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": int(arr[0]) + 1,
        "height": int(arr[min(1, arr.size - 1)]) + 1,
        "mean_byte": float(arr.mean()),
    }


def decode_assets(assets: DataFrame) -> DataFrame:
    """Binary → typed metadata via Arrow-batched mapInPandas."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                d = _decode_bytes(payload)
                rows.append({"asset_id": aid, "kind": kind, **d})
            yield pd.DataFrame(rows, columns=[
                "asset_id", "kind", "n_bytes", "sha256", "width", "height", "mean_byte"
            ])

    return assets.mapInPandas(fn, DECODE_SCHEMA)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """One-to-many frame sampling for 'video' payloads: split the payload
    into ``n_frames`` evenly spaced chunks (fake frames).  Demonstrates
    the fan-out batch shape: input row count != output row count."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, kind, payload in zip(pdf["asset_id"], pdf["kind"], pdf["payload"]):
                if kind != "video" or not payload:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(min(n_frames, len(payload))):
                    chunk = bytes(payload[i * step : (i + 1) * step])
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_no": i,
                            "frame_bytes": chunk,
                            "frame_sha": hashlib.sha256(chunk).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_no", "frame_bytes", "frame_sha"]
            )

    return assets.mapInPandas(fn, FRAME_SCHEMA)


def extract_embeddings(assets: DataFrame, dim: int = EMBED_DIM) -> DataFrame:
    """Deterministic fake feature extractor: seeded by the payload sha,
    emits a unit-norm float vector — output plugs into operators/ann."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                seed = int.from_bytes(
                    hashlib.sha256(payload or b"").digest()[:8], "big"
                )
                rng = np.random.Generator(np.random.PCG64(seed))
                v = rng.standard_normal(dim)
                v = (v / np.linalg.norm(v)).astype(np.float32)
                rows.append({"asset_id": aid, "embedding": v.tolist()})
            yield pd.DataFrame(rows, columns=["asset_id", "embedding"])

    return assets.mapInPandas(fn, EMBED_SCHEMA)
